"""CLI launcher (reference `python/sglang/launch_server.py:12-26`).

    python -m sglang_awq_tpu.launch_server --model-path <dir> --port 30000
"""

from __future__ import annotations

import argparse
import os


def _apply_platform_override():
    """SGLT_PLATFORM=cpu|tpu|axon forces the JAX backend.  Needed because
    a site-installed TPU plugin (e.g. the axon relay) re-registers itself
    over the JAX_PLATFORMS env var; the in-process config update wins."""
    plat = os.environ.get("SGLT_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main():
    _apply_platform_override()
    from sglang_awq_tpu.entrypoints.http_server import launch_server
    from sglang_awq_tpu.server_args import ServerArgs

    parser = argparse.ArgumentParser(description="sglang_awq_tpu server")
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args()
    server_args = ServerArgs.from_cli_args(args)
    launch_server(server_args)


if __name__ == "__main__":
    main()
