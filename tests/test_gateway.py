"""C++ fleet gateway: round-robin, health, passthrough, admin API.

Reference role: sgl-model-gateway integration tests, against mock
backends (real engine passthrough is covered transitively — the gateway
streams bytes verbatim).
"""

import json
import socket
import subprocess
import threading
import time

import httpx
import pytest

from sglang_awq_tpu.gateway import ensure_binary


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


class MockBackend(threading.Thread):
    """Tiny HTTP server answering /health and echoing its port; /sse
    streams three SSE events."""

    def __init__(self, port):
        super().__init__(daemon=True)
        self.port = port
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", port))
        self.sock.listen(16)
        self.stopped = False

    def run(self):
        while not self.stopped:
            try:
                c, _ = self.sock.accept()
            except OSError:
                return
            try:
                req = c.recv(65536).decode("utf-8", "ignore")
                if req.startswith("GET /sse"):
                    c.sendall(
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/event-stream"
                        b"\r\nConnection: close\r\n\r\n"
                    )
                    for i in range(3):
                        c.sendall(f"data: chunk{i}\n\n".encode())
                        time.sleep(0.05)
                else:
                    body = json.dumps({"port": self.port}).encode()
                    c.sendall(
                        b"HTTP/1.1 200 OK\r\nContent-Type: application/json"
                        b"\r\nContent-Length: " + str(len(body)).encode()
                        + b"\r\nConnection: close\r\n\r\n" + body
                    )
            except OSError:
                pass
            finally:
                c.close()

    def stop(self):
        self.stopped = True
        try:
            self.sock.close()
        except OSError:
            pass


@pytest.fixture()
def gateway():
    b1, b2 = MockBackend(_free_port()), MockBackend(_free_port())
    b1.start()
    b2.start()
    gport = _free_port()
    binary = ensure_binary()
    proc = subprocess.Popen(
        [binary, "--port", str(gport), "--workers",
         f"127.0.0.1:{b1.port},127.0.0.1:{b2.port}",
         "--health-interval", "1"],
        stderr=subprocess.PIPE,
    )
    base = f"http://127.0.0.1:{gport}"
    for _ in range(50):
        try:
            httpx.get(base + "/gateway/health", timeout=2)
            break
        except Exception:
            time.sleep(0.1)
    yield base, b1, b2
    proc.kill()
    b1.stop()
    b2.stop()


def test_round_robin_and_admin(gateway):
    base, b1, b2 = gateway
    seen = set()
    for _ in range(6):
        r = httpx.post(base + "/v1/completions", json={"x": 1}, timeout=10)
        seen.add(r.json()["port"])
    assert seen == {b1.port, b2.port}

    w = httpx.get(base + "/gateway/workers", timeout=5).json()["workers"]
    assert len(w) == 2 and all(x["up"] for x in w)
    assert sum(x["served"] for x in w) >= 6


def test_failover_and_recovery(gateway):
    base, b1, b2 = gateway
    b1.stop()  # kill one backend
    time.sleep(2.5)  # health prober marks it down (interval 1s, 2 fails)
    ports = {
        httpx.post(base + "/generate", json={}, timeout=10).json()["port"]
        for _ in range(4)
    }
    assert ports == {b2.port}
    w = {x["url"]: x["up"] for x in
         httpx.get(base + "/gateway/workers", timeout=5).json()["workers"]}
    assert w[f"127.0.0.1:{b1.port}"] is False
    assert w[f"127.0.0.1:{b2.port}"] is True


def test_sse_passthrough(gateway):
    base, _, _ = gateway
    chunks = []
    with httpx.stream("GET", base + "/sse", timeout=15) as r:
        for line in r.iter_lines():
            if line.startswith("data: "):
                chunks.append(line[6:])
    assert chunks == ["chunk0", "chunk1", "chunk2"]


def test_add_remove_workers(gateway):
    base, b1, b2 = gateway
    r = httpx.post(
        base + f"/gateway/workers/remove?url=127.0.0.1:{b1.port}", timeout=5
    )
    assert len(r.json()["workers"]) == 1
    ports = {
        httpx.post(base + "/x", json={}, timeout=10).json()["port"]
        for _ in range(3)
    }
    assert ports == {b2.port}
    r = httpx.post(
        base + f"/gateway/workers/add?url=127.0.0.1:{b1.port}", timeout=5
    )
    assert len(r.json()["workers"]) == 2
    ports = set()
    for _ in range(6):
        ports.add(httpx.post(base + "/x", json={}, timeout=10).json()["port"])
    assert ports == {b1.port, b2.port}


@pytest.fixture()
def gateway_cache_aware():
    b1, b2 = MockBackend(_free_port()), MockBackend(_free_port())
    b1.start()
    b2.start()
    gport = _free_port()
    proc = subprocess.Popen(
        [ensure_binary(), "--port", str(gport), "--workers",
         f"127.0.0.1:{b1.port},127.0.0.1:{b2.port}",
         "--health-interval", "1", "--policy", "cache_aware"],
        stderr=subprocess.PIPE,
    )
    base = f"http://127.0.0.1:{gport}"
    for _ in range(50):
        try:
            httpx.get(base + "/gateway/health", timeout=2)
            break
        except Exception:
            time.sleep(0.1)
    yield base, b1, b2
    proc.kill()
    b1.stop()
    b2.stop()


def test_cache_aware_affinity(gateway_cache_aware):
    """Identical prompt prefixes route to ONE replica (radix affinity);
    distinct prefixes spread (reference sgl-model-gateway cache_aware)."""
    base, b1, b2 = gateway_cache_aware
    same = {
        httpx.post(base + "/generate",
                   json={"text": "shared prefix A", "max_new": 1},
                   timeout=5).json()["port"]
        for _ in range(6)
    }
    assert len(same) == 1, same  # all six landed on one backend
    spread = {
        httpx.post(base + "/generate",
                   json={"text": f"prefix {i} rotates", "max_new": 1},
                   timeout=5).json()["port"]
        for i in range(16)
    }
    assert spread == {b1.port, b2.port}, spread
