"""Fleet gateway launcher: builds (once) and runs the C++ reverse proxy.

Role model: the reference's Rust model gateway (`sgl-model-gateway/`)
reduced to the serving core — see csrc/gateway.cpp.

Usage:
    python -m sglang_awq_tpu.gateway --port 8080 \
        --workers host1:30000,host2:30000
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "gateway.cpp")


def ensure_binary() -> str:
    """Compile the gateway on first use -> path to the executable."""
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "sglang_awq_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    binary = os.path.join(cache, "sgl_gateway")
    src_mtime = os.path.getmtime(_SRC)
    if os.path.exists(binary) and os.path.getmtime(binary) >= src_mtime:
        return binary
    fd, tmp = tempfile.mkstemp(dir=cache, prefix="sgl_gateway_")
    os.close(fd)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-pthread", _SRC, "-o", tmp],
        check=True,
    )
    os.replace(tmp, binary)
    os.chmod(binary, 0o755)
    return binary


def main(argv=None):
    binary = ensure_binary()
    os.execv(binary, [binary] + (argv if argv is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
