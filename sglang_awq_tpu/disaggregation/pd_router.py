"""PD router: fronts one prefill server + one decode server.

Role model: reference `srt/disaggregation` mini-lb.  /generate sends the
prompt to the PREFILL server (/pd/prefill), then hands the sampled first
token + exported KV to the DECODE server (/pd/receive) and pipes its SSE
stream back.  Requests that finish at prefill (EOS / 1-token) short-
circuit.  KV rides the binary PD frame by default (pd.frame_encode: raw
bytes, no base64 inflation); a prefill server answering JSON downgrades
the decode hop to JSON+base64 automatically.

    python -m sglang_awq_tpu.disaggregation.pd_router \
        --port 8080 --prefill http://h1:30000 --decode http://h2:30000
"""

from __future__ import annotations

import argparse
import json
import logging

from aiohttp import ClientSession, ClientTimeout, web

logger = logging.getLogger(__name__)


class PDRouter:
    def __init__(self, prefill_url: str, decode_url: str,
                 timeout: float = 600.0, binary: bool = True):
        self.prefill_url = prefill_url.rstrip("/")
        self.decode_url = decode_url.rstrip("/")
        self.binary = binary
        self.timeout = ClientTimeout(total=timeout)
        self.app = web.Application(client_max_size=256 * 1024 * 1024)
        self.app.router.add_post("/generate", self.generate)
        self.app.router.add_get("/health", self.health)

    async def health(self, request: web.Request) -> web.Response:
        async with ClientSession(timeout=self.timeout) as s:
            for url in (self.prefill_url, self.decode_url):
                async with s.get(url + "/health") as r:
                    if r.status != 200:
                        return web.Response(status=503, text=f"{url} down")
        return web.Response(text="OK")

    async def generate(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        stream = bool(body.get("stream", False))
        async with ClientSession(timeout=self.timeout) as s:
            preq = dict(body)
            preq["binary"] = self.binary
            async with s.post(self.prefill_url + "/pd/prefill",
                              json=preq) as r:
                if r.content_type == "application/octet-stream":
                    from sglang_awq_tpu.disaggregation.pd import frame_decode

                    pre, kv = frame_decode(await r.read())
                else:
                    pre, kv = await r.json(), None
            if pre["finished"]:
                return web.json_response(pre["finish_payload"])
            recv_body = {
                "prompt_ids": pre["prompt_ids"],
                "first_token": pre["first_token"],
                "transfer": pre["transfer"],
                "sampling_params": body.get("sampling_params"),
            }
            if kv is not None:
                from sglang_awq_tpu.disaggregation.pd import frame_encode

                recv_kwargs = dict(
                    data=frame_encode(recv_body, kv),
                    headers={"Content-Type": "application/octet-stream"},
                )
            else:
                recv_kwargs = dict(json=recv_body)
            async with s.post(self.decode_url + "/pd/receive",
                              **recv_kwargs) as r:
                if not stream:
                    last = None
                    async for line in r.content:
                        line = line.decode().strip()
                        if line.startswith("data: ") and line != "data: [DONE]":
                            last = json.loads(line[6:])
                    return web.json_response(last)
                resp = web.StreamResponse(
                    headers={"Content-Type": "text/event-stream",
                             "Cache-Control": "no-cache"}
                )
                await resp.prepare(request)
                async for chunk in r.content.iter_any():
                    await resp.write(chunk)
                await resp.write_eof()
                return resp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--prefill", required=True)
    ap.add_argument("--decode", required=True)
    args = ap.parse_args(argv)
    router = PDRouter(args.prefill, args.decode)
    web.run_app(router.app, port=args.port, print=None, access_log=None)


if __name__ == "__main__":
    main()
