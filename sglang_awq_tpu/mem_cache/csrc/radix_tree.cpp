// High-performance page-granular radix tree over KV pages.
//
// Role model: the reference's pybind C++ radix tree
// (`python/sglang/srt/mem_cache/cpp_radix_tree/tree_v2.cpp` — O(tokens)
// match/insert without Python object overhead).  This is a from-scratch
// implementation of the SAME semantics as the Python RadixCache in
// ../radix_cache.py (page-aligned keys, lock refs, LRU leaf eviction),
// exposed through a C ABI consumed via ctypes (pybind11 is not available
// in the build image).
//
// Thread-unsafe by design: owned by the single scheduler thread.

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

using Key = std::vector<int32_t>;  // page_size token ids

struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = 1469598103934665603ull;
    for (int32_t t : k) {
      h ^= static_cast<size_t>(t) + 0x9e3779b97f4a7c15ull;
      h *= 1099511628211ull;
    }
    return h;
  }
};

struct Node {
  uint64_t id;
  Node* parent = nullptr;
  std::vector<Key> keys;       // page keys along this edge
  std::vector<int32_t> pages;  // page ids, same length as keys
  std::unordered_map<Key, Node*, KeyHash> children;  // keyed by first page key
  int64_t lock_ref = 0;
  uint64_t last_access = 0;

  bool evictable() const { return lock_ref == 0 && children.empty(); }
};

struct Tree {
  int32_t page_size;
  uint64_t next_id = 1;
  uint64_t tick = 0;
  int64_t total_pages = 0;
  Node* root;
  std::unordered_map<uint64_t, Node*> nodes;

  explicit Tree(int32_t ps) : page_size(ps) {
    root = new_node();
    root->lock_ref = 1;
  }

  Node* new_node() {
    auto* n = new Node();
    n->id = next_id++;
    nodes[n->id] = n;
    return n;
  }

  void free_node(Node* n) {
    nodes.erase(n->id);
    delete n;
  }

  ~Tree() {
    std::vector<Node*> stack = {root};
    while (!stack.empty()) {
      Node* n = stack.back();
      stack.pop_back();
      for (auto& kv : n->children) stack.push_back(kv.second);
      delete n;
    }
  }
};

std::vector<Key> page_keys(const Tree& t, const int32_t* tokens, int64_t n) {
  std::vector<Key> out;
  int64_t np = n / t.page_size;
  out.reserve(np);
  for (int64_t i = 0; i < np; ++i) {
    out.emplace_back(tokens + i * t.page_size, tokens + (i + 1) * t.page_size);
  }
  return out;
}

// Split node's edge at page index `at`; returns the new upper node.
Node* split_node(Tree& t, Node* node, size_t at) {
  Node* upper = t.new_node();
  upper->parent = node->parent;
  upper->keys.assign(node->keys.begin(), node->keys.begin() + at);
  upper->pages.assign(node->pages.begin(), node->pages.begin() + at);
  upper->lock_ref = node->lock_ref;
  upper->last_access = node->last_access;
  upper->children[node->keys[at]] = node;
  node->parent->children[upper->keys[0]] = upper;
  node->parent = upper;
  node->keys.erase(node->keys.begin(), node->keys.begin() + at);
  node->pages.erase(node->pages.begin(), node->pages.begin() + at);
  return upper;
}

}  // namespace

extern "C" {

void* rt_create(int32_t page_size) { return new Tree(page_size); }

void rt_destroy(void* h) { delete static_cast<Tree*>(h); }

void rt_reset(void* h) {
  auto* t = static_cast<Tree*>(h);
  int32_t ps = t->page_size;
  t->~Tree();
  new (t) Tree(ps);
}

// Longest cached page-aligned prefix.  Writes up to max_out page ids into
// pages_out; returns the number written; *node_out = last node id.
int64_t rt_match_prefix(void* h, const int32_t* tokens, int64_t n_tokens,
                        int32_t* pages_out, int64_t max_out,
                        uint64_t* node_out) {
  auto* t = static_cast<Tree*>(h);
  auto keys = page_keys(*t, tokens, n_tokens);
  Node* node = t->root;
  int64_t written = 0;
  size_t i = 0;
  while (i < keys.size()) {
    auto it = node->children.find(keys[i]);
    if (it == node->children.end()) break;
    Node* child = it->second;
    child->last_access = ++t->tick;
    size_t j = 0;
    while (j < child->keys.size() && i + j < keys.size() &&
           child->keys[j] == keys[i + j]) {
      ++j;
    }
    for (size_t k = 0; k < j && written < max_out; ++k) {
      pages_out[written++] = child->pages[k];
    }
    if (j < child->keys.size()) {
      child = split_node(*t, child, j);
      node = child;
      i += j;
      break;
    }
    i += j;
    node = child;
  }
  *node_out = node->id;
  return written;
}

// Insert the page-aligned prefix; tree takes ownership of non-duplicate
// pages.  Returns the count of LEADING pages already present (duplicates
// the caller must free).
int64_t rt_insert(void* h, const int32_t* tokens, int64_t n_tokens,
                  const int32_t* pages, int64_t n_pages) {
  auto* t = static_cast<Tree*>(h);
  auto keys = page_keys(*t, tokens, n_tokens);
  if (static_cast<int64_t>(keys.size()) > n_pages) keys.resize(n_pages);
  Node* node = t->root;
  size_t i = 0;
  int64_t dup = 0;
  while (i < keys.size()) {
    auto it = node->children.find(keys[i]);
    if (it == node->children.end()) {
      Node* fresh = t->new_node();
      fresh->parent = node;
      fresh->keys.assign(keys.begin() + i, keys.end());
      fresh->pages.assign(pages + i, pages + keys.size());
      fresh->last_access = ++t->tick;
      node->children[keys[i]] = fresh;
      t->total_pages += fresh->pages.size();
      return dup;
    }
    Node* child = it->second;
    child->last_access = ++t->tick;
    size_t j = 0;
    while (j < child->keys.size() && i + j < keys.size() &&
           child->keys[j] == keys[i + j]) {
      ++j;
    }
    dup += j;
    if (j < child->keys.size()) {
      child = split_node(*t, child, j);
    }
    i += j;
    node = child;
  }
  return dup;
}

void rt_lock(void* h, uint64_t node_id, int32_t delta) {
  auto* t = static_cast<Tree*>(h);
  auto it = t->nodes.find(node_id);
  if (it == t->nodes.end()) return;
  Node* n = it->second;
  while (n != nullptr && n != t->root) {
    n->lock_ref += delta;
    n = n->parent;
  }
}

// Evict up to want_pages LRU unlocked leaf pages.  Freed page ids are
// written to freed_out (caller returns them to its allocator).
int64_t rt_evict(void* h, int64_t want_pages, int32_t* freed_out,
                 int64_t max_out) {
  auto* t = static_cast<Tree*>(h);
  auto cmp = [](const std::pair<uint64_t, Node*>& a,
                const std::pair<uint64_t, Node*>& b) {
    return a.first > b.first;  // min-heap on last_access
  };
  std::priority_queue<std::pair<uint64_t, Node*>,
                      std::vector<std::pair<uint64_t, Node*>>, decltype(cmp)>
      heap(cmp);
  std::vector<Node*> stack;
  for (auto& kv : t->root->children) stack.push_back(kv.second);
  while (!stack.empty()) {
    Node* n = stack.back();
    stack.pop_back();
    for (auto& kv : n->children) stack.push_back(kv.second);
    if (n->evictable()) heap.emplace(n->last_access, n);
  }
  int64_t freed = 0;
  while (freed < want_pages && !heap.empty()) {
    Node* n = heap.top().second;
    heap.pop();
    if (!n->evictable()) continue;
    for (int32_t p : n->pages) {
      if (freed < max_out) freed_out[freed] = p;
      ++freed;
    }
    t->total_pages -= n->pages.size();
    Node* parent = n->parent;
    parent->children.erase(n->keys[0]);
    t->free_node(n);
    if (parent != t->root && parent->evictable()) {
      heap.emplace(parent->last_access, parent);
    }
  }
  return freed;
}

int64_t rt_evictable_pages(void* h) {
  auto* t = static_cast<Tree*>(h);
  int64_t total = 0;
  std::vector<Node*> stack;
  for (auto& kv : t->root->children) stack.push_back(kv.second);
  while (!stack.empty()) {
    Node* n = stack.back();
    stack.pop_back();
    for (auto& kv : n->children) stack.push_back(kv.second);
    if (n->lock_ref == 0) total += n->pages.size();
  }
  return total;
}

int64_t rt_protected_pages(void* h) {
  auto* t = static_cast<Tree*>(h);
  int64_t total = 0;
  std::vector<Node*> stack;
  for (auto& kv : t->root->children) stack.push_back(kv.second);
  while (!stack.empty()) {
    Node* n = stack.back();
    stack.pop_back();
    for (auto& kv : n->children) stack.push_back(kv.second);
    if (n->lock_ref > 0) total += n->pages.size();
  }
  return total;
}

int64_t rt_total_pages(void* h) { return static_cast<Tree*>(h)->total_pages; }

}  // extern "C"
