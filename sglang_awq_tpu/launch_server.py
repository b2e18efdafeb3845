"""CLI launcher (reference `python/sglang/launch_server.py:12-26`).

    python -m sglang_awq_tpu.launch_server --model-path <dir> --port 30000
"""

from __future__ import annotations

import argparse

from sglang_awq_tpu.entrypoints.http_server import launch_server
from sglang_awq_tpu.server_args import ServerArgs


def main():
    parser = argparse.ArgumentParser(description="sglang_awq_tpu server")
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args()
    server_args = ServerArgs.from_cli_args(args)
    launch_server(server_args)


if __name__ == "__main__":
    main()
