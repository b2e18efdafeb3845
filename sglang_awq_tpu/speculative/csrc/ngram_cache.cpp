// N-gram draft cache, native implementation.
//
// Role model: the reference's pybind ngram cache
// (`python/sglang/srt/speculative/cpp_ngram/ngram.cpp`) — the draft lookup
// runs on the scheduler's critical path every decode step, so it must not
// pay Python dict/tuple overhead at large batch sizes.  C ABI + ctypes
// (pybind11 unavailable in the build image); same semantics as the Python
// NgramCache in ../ngram.py.

#include <cstdint>
#include <cstddef>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

struct KeyHash {
  size_t operator()(const std::vector<int32_t>& k) const {
    size_t h = 1469598103934665603ull;
    for (int32_t t : k) {
      h ^= static_cast<size_t>(t) + 0x9e3779b97f4a7c15ull;
      h *= 1099511628211ull;
    }
    return h;
  }
};

struct Slot {
  std::unordered_map<int32_t, int32_t> counts;
  int32_t best_tok = -1;
  int32_t best_count = 0;

  void add(int32_t tok) {
    int32_t c = ++counts[tok];
    if (c > best_count) {
      best_count = c;
      best_tok = tok;
    }
  }
};

struct Cache {
  int32_t n;
  size_t capacity;
  std::unordered_map<std::vector<int32_t>, Slot, KeyHash> map;
  std::deque<std::vector<int32_t>> fifo;  // insertion order for eviction

  Cache(int32_t n_, size_t cap) : n(n_), capacity(cap) {}
};

}  // namespace

extern "C" {

void* ng_create(int32_t n, int64_t capacity) {
  return new Cache(n, static_cast<size_t>(capacity));
}

void ng_destroy(void* h) { delete static_cast<Cache*>(h); }

void ng_update(void* h, const int32_t* tokens, int64_t len) {
  auto* c = static_cast<Cache*>(h);
  if (len <= c->n) return;
  std::vector<int32_t> key(c->n);
  for (int64_t i = 0; i + c->n < len; ++i) {
    key.assign(tokens + i, tokens + i + c->n);
    auto it = c->map.find(key);
    if (it == c->map.end()) {
      if (c->map.size() >= c->capacity && !c->fifo.empty()) {
        c->map.erase(c->fifo.front());
        c->fifo.pop_front();
      }
      it = c->map.emplace(key, Slot{}).first;
      c->fifo.push_back(key);
    }
    it->second.add(tokens[i + c->n]);
  }
}

// Draft up to k continuation tokens; returns the number written.
int64_t ng_draft(void* h, const int32_t* context, int64_t ctx_len, int32_t* out,
                 int64_t k) {
  auto* c = static_cast<Cache*>(h);
  if (ctx_len < c->n) return 0;
  std::vector<int32_t> key(context + ctx_len - c->n, context + ctx_len);
  int64_t written = 0;
  while (written < k) {
    auto it = c->map.find(key);
    if (it == c->map.end() || it->second.best_tok < 0) break;
    int32_t tok = it->second.best_tok;
    out[written++] = tok;
    key.erase(key.begin());
    key.push_back(tok);
  }
  return written;
}

int64_t ng_size(void* h) {
  return static_cast<int64_t>(static_cast<Cache*>(h)->map.size());
}

}  // extern "C"
