// sgl-gateway: minimal fleet gateway (reverse proxy) for sglang_awq_tpu.
//
// Role model: the reference's Rust model gateway (`sgl-model-gateway/src/`,
// 88k LoC) reduced to the serving-critical core the survey planned
// (SURVEY.md L0): round-robin load balancing over worker replicas, health
// checking, OpenAI API passthrough (bytes are streamed verbatim, so SSE
// works), and a small admin API:
//
//   GET  /gateway/health            liveness of the gateway itself
//   GET  /gateway/workers           JSON worker list + up/down state
//   POST /gateway/workers/add?url=host:port
//   POST /gateway/workers/remove?url=host:port
//
// Build: g++ -O2 -std=c++17 -pthread gateway.cpp -o sgl_gateway
// Run:   sgl_gateway --port 8080 --workers h1:30000,h2:30000
//
// Design: thread-per-connection (a gateway fronting model servers is
// bounded by model latency, not connection scaling); Connection: close on
// both legs keeps the proxy stateless per request.  Health prober runs on
// its own thread, marking workers down after consecutive failures and up
// again on success.

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <signal.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <climits>
#include <algorithm>
#include <chrono>
#include <cstring>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Worker {
  std::string host;
  int port;
  std::atomic<bool> up{true};
  std::atomic<int> fails{0};
  std::atomic<long> inflight{0};
  std::atomic<long> served{0};
  Worker(std::string h, int p) : host(std::move(h)), port(p) {}
};

std::mutex g_mu;
std::vector<Worker*> g_workers;
std::atomic<size_t> g_rr{0};
int g_health_interval_s = 5;
// routing policy (reference sgl-model-gateway/src/policies/): "rr"
// round-robin, "p2c" power-of-two-choices on inflight, "cache_aware"
// prompt-prefix affinity (same prefix -> same replica -> radix hits) with
// a load-imbalance escape hatch to p2c.
std::string g_policy = "rr";

int connect_to(const std::string& host, int port, int timeout_ms = 3000) {
  struct addrinfo hints {};
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  struct addrinfo* res = nullptr;
  std::string ps = std::to_string(port);
  if (getaddrinfo(host.c_str(), ps.c_str(), &hints, &res) != 0 || !res)
    return -1;
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd >= 0) {
    struct timeval tv {};
    tv.tv_sec = timeout_ms / 1000;
    tv.tv_usec = (timeout_ms % 1000) * 1000;
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
    if (connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
      close(fd);
      fd = -1;
    }
  }
  freeaddrinfo(res);
  return fd;
}

bool send_all(int fd, const char* buf, size_t n) {
  while (n) {
    ssize_t w = send(fd, buf, n, MSG_NOSIGNAL);
    if (w <= 0) return false;
    buf += w;
    n -= w;
  }
  return true;
}

// read an HTTP request (headers + Content-Length body) from fd
bool read_request(int fd, std::string& out) {
  char buf[16384];
  size_t header_end = std::string::npos;
  while (header_end == std::string::npos) {
    ssize_t r = recv(fd, buf, sizeof(buf), 0);
    if (r <= 0) return false;
    out.append(buf, r);
    header_end = out.find("\r\n\r\n");
    if (out.size() > (64u << 20)) return false;
  }
  size_t body_have = out.size() - (header_end + 4);
  size_t need = 0;
  {
    // parse content-length (case-insensitive)
    std::string lower;
    lower.reserve(header_end);
    for (size_t i = 0; i < header_end; i++) lower.push_back(tolower(out[i]));
    size_t p = lower.find("content-length:");
    if (p != std::string::npos) need = strtoul(lower.c_str() + p + 15, nullptr, 10);
  }
  while (body_have < need) {
    ssize_t r = recv(fd, buf, sizeof(buf), 0);
    if (r <= 0) return false;
    out.append(buf, r);
    body_have += r;
  }
  return true;
}

void simple_response(int fd, int code, const std::string& body,
                     const char* ctype = "application/json") {
  std::ostringstream ss;
  const char* status = code == 200   ? "OK"
                       : code == 404 ? "Not Found"
                       : code == 503 ? "Service Unavailable"
                                     : "Bad Request";
  ss << "HTTP/1.1 " << code << " " << status << "\r\nContent-Type: " << ctype
     << "\r\nContent-Length: " << body.size() << "\r\nConnection: close\r\n\r\n"
     << body;
  std::string s = ss.str();
  send_all(fd, s.data(), s.size());
}

Worker* pick_rr_locked() {
  size_t n = g_workers.size();
  for (size_t i = 0; i < n; i++) {
    Worker* w = g_workers[g_rr.fetch_add(1) % n];
    if (w->up.load()) return w;
  }
  return nullptr;
}

Worker* pick_p2c_locked() {
  size_t n = g_workers.size();
  Worker* a = g_workers[g_rr.fetch_add(1) % n];
  Worker* b = g_workers[g_rr.fetch_add(3) % n];
  if (!a->up.load()) return b->up.load() ? b : pick_rr_locked();
  if (!b->up.load()) return a;
  return a->inflight.load() <= b->inflight.load() ? a : b;
}

uint64_t fnv1a(const std::string& s) {
  uint64_t h = 1469598103934665603ull;
  for (unsigned char c : s) {
    h ^= c;
    h *= 1099511628211ull;
  }
  return h;
}

Worker* pick_worker(const std::string& affinity_key) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (g_workers.empty()) return nullptr;
  if (g_policy == "p2c") return pick_p2c_locked();
  if (g_policy == "cache_aware" && !affinity_key.empty()) {
    // prefix affinity: identical prompt prefixes land on one replica so
    // its radix tree accumulates the shared prefix; bail to p2c when the
    // preferred replica is overloaded vs the least-loaded one
    Worker* pref = g_workers[fnv1a(affinity_key) % g_workers.size()];
    long mn = LONG_MAX;
    for (Worker* w : g_workers)
      if (w->up.load()) mn = std::min(mn, w->inflight.load());
    if (pref->up.load() && mn != LONG_MAX &&
        pref->inflight.load() <= mn + 4)
      return pref;
    return pick_p2c_locked();
  }
  return pick_rr_locked();
}

std::string workers_json() {
  std::lock_guard<std::mutex> lk(g_mu);
  std::ostringstream ss;
  ss << "{\"workers\":[";
  for (size_t i = 0; i < g_workers.size(); i++) {
    Worker* w = g_workers[i];
    if (i) ss << ",";
    ss << "{\"url\":\"" << w->host << ":" << w->port << "\",\"up\":"
       << (w->up.load() ? "true" : "false")
       << ",\"inflight\":" << w->inflight.load()
       << ",\"served\":" << w->served.load() << "}";
  }
  ss << "]}";
  return ss.str();
}

bool parse_hostport(const std::string& s, std::string& host, int& port) {
  size_t c = s.rfind(':');
  if (c == std::string::npos) return false;
  host = s.substr(0, c);
  port = atoi(s.c_str() + c + 1);
  return port > 0;
}

void handle_admin(int fd, const std::string& method, const std::string& path) {
  if (path == "/gateway/health") {
    simple_response(fd, 200, "{\"status\":\"ok\"}");
    return;
  }
  if (path == "/gateway/workers" && method == "GET") {
    simple_response(fd, 200, workers_json());
    return;
  }
  const std::string add = "/gateway/workers/add?url=";
  const std::string rem = "/gateway/workers/remove?url=";
  if (method == "POST" && path.rfind(add, 0) == 0) {
    std::string host;
    int port;
    if (!parse_hostport(path.substr(add.size()), host, port)) {
      simple_response(fd, 400, "{\"error\":\"bad url\"}");
      return;
    }
    {
      std::lock_guard<std::mutex> lk(g_mu);
      g_workers.push_back(new Worker(host, port));
    }
    simple_response(fd, 200, workers_json());
    return;
  }
  if (method == "POST" && path.rfind(rem, 0) == 0) {
    std::string host;
    int port;
    parse_hostport(path.substr(rem.size()), host, port);
    {
      std::lock_guard<std::mutex> lk(g_mu);
      for (auto it = g_workers.begin(); it != g_workers.end(); ++it) {
        if ((*it)->host == host && (*it)->port == port) {
          g_workers.erase(it);  // leak the Worker: in-flight threads may hold it
          break;
        }
      }
    }
    simple_response(fd, 200, workers_json());
    return;
  }
  simple_response(fd, 404, "{\"error\":\"unknown gateway endpoint\"}");
}

void proxy_connection(int cfd) {
  std::string req;
  if (!read_request(cfd, req)) {
    close(cfd);
    return;
  }
  // request line
  size_t sp1 = req.find(' ');
  size_t sp2 = req.find(' ', sp1 + 1);
  if (sp1 == std::string::npos || sp2 == std::string::npos) {
    simple_response(cfd, 400, "{\"error\":\"bad request\"}");
    close(cfd);
    return;
  }
  std::string method = req.substr(0, sp1);
  std::string path = req.substr(sp1 + 1, sp2 - sp1 - 1);

  if (path.rfind("/gateway/", 0) == 0) {
    handle_admin(cfd, method, path);
    close(cfd);
    return;
  }

  // cache-affinity key: the first bytes of the prompt ("text" or
  // "input_ids") — enough to separate distinct prefixes, cheap to hash
  std::string akey;
  if (g_policy == "cache_aware") {
    size_t he = req.find("\r\n\r\n");
    if (he != std::string::npos) {
      for (const char* field : {"\"text\"", "\"input_ids\"", "\"prompt\"",
                                "\"messages\""}) {
        size_t p = req.find(field, he);
        if (p != std::string::npos) {
          akey = req.substr(p, std::min<size_t>(96, req.size() - p));
          break;
        }
      }
    }
  }

  // retry across workers on CONNECT failure (request not yet sent anywhere)
  for (int attempt = 0; attempt < 8; attempt++) {
    Worker* w = pick_worker(akey);
    if (!w) {
      simple_response(cfd, 503, "{\"error\":\"no healthy workers\"}");
      break;
    }
    int bfd = connect_to(w->host, w->port);
    if (bfd < 0) {
      if (w->fails.fetch_add(1) + 1 >= 2) w->up.store(false);
      continue;
    }
    // long generations: no recv timeout on the streaming leg
    struct timeval tv {};
    setsockopt(bfd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    w->inflight.fetch_add(1);
    // force Connection: close on the backend leg — keep-alive backends
    // would hold the socket open and wedge the streaming loop (and leak
    // this thread) after the response completes
    std::string breq = req;
    {
      size_t he = breq.find("\r\n\r\n");
      size_t line_end = breq.find("\r\n");
      if (he != std::string::npos && line_end != std::string::npos) {
        std::string head = breq.substr(0, he);
        std::string lower;
        lower.reserve(head.size());
        for (char c : head) lower.push_back(tolower(c));
        size_t cpos = lower.find("\r\nconnection:");
        if (cpos != std::string::npos) {
          size_t cend = head.find("\r\n", cpos + 2);
          head = head.substr(0, cpos) +
                 (cend == std::string::npos ? "" : head.substr(cend));
        }
        breq = head + "\r\nConnection: close" + breq.substr(he);
      }
    }
    bool ok = send_all(bfd, breq.data(), breq.size());
    char buf[65536];
    while (ok) {
      ssize_t r = recv(bfd, buf, sizeof(buf), 0);
      if (r <= 0) break;
      if (!send_all(cfd, buf, r)) break;
    }
    w->inflight.fetch_sub(1);
    w->served.fetch_add(1);
    w->fails.store(0);
    close(bfd);
    break;
  }
  close(cfd);
}

void health_loop() {
  const std::string probe =
      "GET /health HTTP/1.1\r\nHost: gw\r\nConnection: close\r\n\r\n";
  while (true) {
    std::vector<Worker*> snapshot;
    {
      std::lock_guard<std::mutex> lk(g_mu);
      snapshot = g_workers;
    }
    for (Worker* w : snapshot) {
      int fd = connect_to(w->host, w->port, 2000);
      bool ok = false;
      if (fd >= 0) {
        if (send_all(fd, probe.data(), probe.size())) {
          char buf[512];
          ssize_t r = recv(fd, buf, sizeof(buf) - 1, 0);
          if (r > 0) {
            buf[r] = 0;
            ok = strstr(buf, "200") != nullptr;
          }
        }
        close(fd);
      }
      if (ok) {
        w->fails.store(0);
        w->up.store(true);
      } else if (w->fails.fetch_add(1) + 1 >= 2) {
        w->up.store(false);
      }
    }
    std::this_thread::sleep_for(std::chrono::seconds(g_health_interval_s));
  }
}

}  // namespace

int main(int argc, char** argv) {
  int port = 8080;
  std::string workers_arg;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--workers" && i + 1 < argc) workers_arg = argv[++i];
    else if (a == "--policy" && i + 1 < argc) g_policy = argv[++i];
    else if (a == "--health-interval" && i + 1 < argc)
      g_health_interval_s = atoi(argv[++i]);
  }
  std::stringstream ss(workers_arg);
  std::string item;
  while (std::getline(ss, item, ',')) {
    std::string host;
    int p;
    if (parse_hostport(item, host, p)) g_workers.push_back(new Worker(host, p));
  }
  signal(SIGPIPE, SIG_IGN);

  int lfd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  struct sockaddr_in addr {};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = INADDR_ANY;
  addr.sin_port = htons(port);
  if (bind(lfd, (struct sockaddr*)&addr, sizeof(addr)) != 0 ||
      listen(lfd, 512) != 0) {
    fprintf(stderr, "sgl_gateway: cannot listen on %d\n", port);
    return 1;
  }
  fprintf(stderr, "sgl_gateway: listening on :%d with %zu workers\n", port,
          g_workers.size());
  std::thread(health_loop).detach();
  while (true) {
    int cfd = accept(lfd, nullptr, nullptr);
    if (cfd < 0) continue;
    std::thread(proxy_connection, cfd).detach();
  }
}
