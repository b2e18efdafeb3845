"""In-process Engine.

Role model: reference `Engine` (`python/sglang/srt/entrypoints/engine.py:184`
— generate/async_generate/encode + subprocess topology).  TPU variant: one
process; the scheduler runs on a daemon thread (device work releases the GIL
during jit execution), requests arrive via a queue, outputs fan out through
TokenizerManager subscriber queues (SURVEY.md §2.6 collapse of the 3-process
ZMQ topology).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Any, AsyncGenerator, Dict, Iterator, List, Optional, Union

import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.managers.scheduler import Scheduler
from sglang_awq_tpu.managers.tokenizer_manager import (
    GenerateReqInput,
    TokenizerManager,
)
from sglang_awq_tpu.model_executor.model_runner import ModelRunner
from sglang_awq_tpu.server_args import ServerArgs, set_global_server_args
from sglang_awq_tpu.utils import configure_logger

logger = logging.getLogger(__name__)


def _load_tokenizer(path: str):
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path, use_fast=True)
    except Exception as e:  # synthetic checkpoints have no tokenizer files
        logger.warning("no tokenizer loaded from %s (%s); input_ids only", path, e)
        return None


class Engine:
    def __init__(
        self,
        server_args: Optional[ServerArgs] = None,
        model_config: Optional[ModelConfig] = None,
        tensors: Optional[Dict[str, np.ndarray]] = None,
        tokenizer=None,
        draft_config: Optional[ModelConfig] = None,  # EAGLE draft (tests)
        draft_tensors: Optional[Dict[str, np.ndarray]] = None,
        **kwargs,
    ):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        set_global_server_args(server_args)
        configure_logger(server_args.log_level)
        self.server_args = server_args

        from sglang_awq_tpu.tracing import trace_init

        trace_init(
            server_args.enable_trace,
            server_args.oltp_traces_endpoint,
            service_name=server_args.served_model_name or "sglang_awq_tpu",
        )

        self._multihost = False
        if server_args.nnodes > 1:
            from sglang_awq_tpu.parallel.multihost import initialize_multihost

            self._multihost = initialize_multihost(
                server_args.dist_init_addr, server_args.nnodes,
                server_args.node_rank,
            )

        self.runner = ModelRunner(
            server_args, model_config=model_config, tensors=tensors,
            draft_config=draft_config, draft_tensors=draft_tensors,
        )
        if self._multihost:
            from sglang_awq_tpu.parallel.multihost import (
                MirroredRunner,
                is_host0,
                worker_loop,
            )

            if not is_host0():
                # non-host0 processes never return from here: they execute
                # host0's mirrored steps until STOP (reference engine.py
                # multi-node: rank 0 serves, other ranks run workers)
                worker_loop(self.runner)
                import sys

                sys.exit(0)
            self.runner = MirroredRunner(self.runner)
        self.scheduler = Scheduler(server_args, self.runner)
        if tokenizer is None and server_args.tokenizer_path:
            tokenizer = _load_tokenizer(server_args.tokenizer_path)
        self.tokenizer_manager = TokenizerManager(
            tokenizer,
            self.runner.model_config.eos_token_ids(),
            scheduler_submit=self._submit,
            scheduler_abort=self._abort_async,
            vocab_size=self.runner.model_config.vocab_size,
            mm_embed=self._make_mm_embed(),
        )

        self._in_queue: "queue.Queue" = queue.Queue()
        self._abort_queue: "queue.Queue" = queue.Queue()
        self._shutdown = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True, name="scheduler")
        self._thread.start()

    # ------------------------------------------------------------------
    # scheduler thread
    # ------------------------------------------------------------------

    def _submit(self, req):
        self._in_queue.put(req)

    def _abort_async(self, rid: str):
        self._abort_queue.put(rid)

    def _loop(self):
        sched = self.scheduler
        idle_sleep = 0.0005
        watchdog_timeout = self.server_args.watchdog_timeout
        while not self._shutdown.is_set():
            # watchdog (reference scheduler_runtime_checker_mixin.py:330): a
            # stuck batch must not wedge every client forever
            if (
                sched.has_work()
                and time.monotonic() - sched.last_progress_time > watchdog_timeout
            ):
                logger.error(
                    "watchdog: no progress for %.0fs with work pending; failing in-flight requests",
                    watchdog_timeout,
                )
                self._fail_all()
                sched.last_progress_time = time.monotonic()
            moved = False
            while True:
                try:
                    req = self._in_queue.get_nowait()
                except queue.Empty:
                    break
                if isinstance(req, _FlushSentinel):
                    req.fn()
                    moved = True
                    continue
                sched.add_request(req)
                if req.finished():  # rejected at admission (queue full)
                    from sglang_awq_tpu.managers.scheduler import ReqOutput

                    self.tokenizer_manager.on_output(ReqOutput(req, []))
                moved = True
            while True:
                try:
                    rid = self._abort_queue.get_nowait()
                except queue.Empty:
                    break
                sched.abort_request(rid)
                moved = True
            if sched.has_work():
                try:
                    outputs = sched.step()
                except Exception:
                    logger.exception("scheduler step failed; aborting in-flight reqs")
                    self._fail_all()
                    continue
                for out in outputs:
                    try:
                        self.tokenizer_manager.on_output(out)
                    except Exception:
                        logger.exception("output handling failed for %s", out.rid)
                        self._fail_one(out.rid)
            elif not moved:
                time.sleep(idle_sleep)  # IdleSleeper role (scheduler.py:2654)

    def _fail_one(self, rid: str):
        """Abort + resolve a single request whose output path failed."""
        self.scheduler.abort_request(rid)
        with self.tokenizer_manager.lock:
            st = self.tokenizer_manager.states.get(rid)
        if st is not None and not st.finished:
            st.finished = True
            st.out_queue.put(None)

    def _fail_all(self):
        from sglang_awq_tpu.managers.schedule_batch import FinishInfo, FinishReason
        from sglang_awq_tpu.managers.scheduler import ReqOutput

        sched = self.scheduler
        sched.drop_inflight()
        sched.running.clear()
        sched.waiting.clear()
        sched.chunked_req = None
        sched.tree.reset()
        sched.allocator.clear()
        # fail EVERY unfinished in-flight request, including one mid-step
        with self.tokenizer_manager.lock:
            states = list(self.tokenizer_manager.states.values())
        for st in states:
            if not st.finished:
                st.req.finish_info = FinishInfo(FinishReason.ABORT)
                self.tokenizer_manager.on_output(ReqOutput(st.req, []))

    # ------------------------------------------------------------------
    # public API (reference engine.py:264 generate / :346 async_generate)
    # ------------------------------------------------------------------

    def _make_mm_embed(self):
        """Image -> prompt-embedding hook for VLM models (reference
        mm_utils.embed_mm_inputs role): encode images through the model's
        vision tower and splice the projected features over the prompt's
        image-token runs, producing the input_embeds the engine already
        serves."""
        runner = self.runner
        if hasattr(runner.model, "mm_embed_prompt"):
            # model-owned intake (Qwen2.5-VL: ViT + mrope extras)
            def mm_embed_model(images, ids):
                return runner.model.mm_embed_prompt(
                    runner.params, runner.embed_tokens, images, ids
                )

            return mm_embed_model
        if not hasattr(runner.model, "encode_images"):
            return None
        import numpy as np

        from sglang_awq_tpu.multimodal.vision import (
            preprocess_image,
            preprocess_image_siglip,
        )

        # per-model pixel processor (reference srt/multimodal/processors/
        # registry role): the model names its recipe, intake stays shared
        prep = (preprocess_image_siglip
                if getattr(runner.model, "mm_preprocess", "clip") == "siglip"
                else preprocess_image)

        def mm_embed(images, ids):
            size = runner.model.vision.image_size
            pix = []
            for im in images:
                arr = np.asarray(im) if isinstance(im, (list, tuple)) else im
                if isinstance(arr, np.ndarray) and arr.ndim == 3 and \
                        arr.shape[0] == 3 and arr.shape[1] == size:
                    pix.append(np.asarray(arr, np.float32))
                else:
                    pix.append(prep(im, size))
            pixels = np.stack(pix)
            feats = runner.encode_images(pixels)  # [N, tok, H]
            tok = runner.model.image_token
            tpi = feats.shape[1]
            n_imgs = feats.shape[0]
            n_occ = sum(1 for t in ids if t == tok)
            if n_occ == n_imgs:
                # chat-template form: ONE placeholder per image — expand it
                # to tokens_per_image copies (HF processor role)
                expanded = []
                for t in ids:
                    expanded.extend([tok] * tpi if t == tok else [t])
                ids = expanded
            elif n_occ != n_imgs * tpi:
                raise ValueError(
                    f"prompt has {n_occ} image tokens; expected {n_imgs} "
                    f"placeholders or {n_imgs * tpi} expanded tokens"
                )
            txt = runner.embed_tokens(np.asarray(ids, np.int32))
            txt = np.asarray(txt, np.float32)
            pos = np.flatnonzero(np.asarray(ids) == tok)
            txt[pos] = feats.reshape(n_imgs * tpi, -1)
            if getattr(runner.model, "mm_bidirectional_spans", False):
                # per-image [start, end) ranges: Gemma3-mm image tokens
                # attend each other bidirectionally (extend spans)
                spans = [(int(pos[i * tpi]), int(pos[i * tpi] + tpi))
                         for i in range(n_imgs)]
                return txt, {"mm_spans": spans}
            return txt

        return mm_embed

    def generate(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params: Optional[Dict[str, Any]] = None,
        stream: bool = False,
        rid: Optional[str] = None,
        input_embeds=None,
        images: Optional[list] = None,
    ) -> Union[dict, Iterator[dict]]:
        gin = GenerateReqInput(
            text=prompt,
            input_ids=input_ids,
            input_embeds=input_embeds,
            images=images,
            sampling_params=sampling_params,
            stream=stream,
            rid=rid,
        )
        state = self.tokenizer_manager.create_request(gin)
        if stream:
            return self.tokenizer_manager.stream_responses(state)
        return self.tokenizer_manager.wait_response(state)

    def abort_request(self, rid: str):
        self._abort_async(rid)

    def flush_cache(self) -> bool:
        done = threading.Event()
        result = {}

        def _do():
            result["ok"] = self.scheduler.flush_cache()
            done.set()

        # run on the scheduler thread for safety
        self._in_queue.put(_FlushSentinel(_do))
        done.wait(timeout=30)
        return result.get("ok", False)

    def run_on_scheduler(self, fn, timeout: float = 600.0):
        """Execute fn on the scheduler thread (tree/pool mutations are
        scheduler-owned) and wait for completion."""
        import queue as _q

        done: "_q.Queue" = _q.Queue()

        def do():
            try:
                fn()
            finally:
                done.put(True)

        self._in_queue.put(_FlushSentinel(do))
        done.get(timeout=timeout)

    def save_weights_snapshot(self, path: str):
        """Pause-and-save native sharded snapshot (checkpoint/resume)."""
        import queue as _q

        done: "_q.Queue" = _q.Queue()

        def do():
            done.put(self.runner.save_snapshot(path))

        self._in_queue.put(_FlushSentinel(do))
        return done.get(timeout=600)

    def update_weights_from_disk(self, model_path: str):
        """Pause scheduling, reload weights, resume (reference engine.py:530)."""
        done = threading.Event()
        result = {}

        def _do():
            ok, msg = self.runner.update_weights_from_disk(model_path)
            result["ok"], result["msg"] = ok, msg
            done.set()

        self._in_queue.put(_FlushSentinel(_do))
        done.wait(timeout=600)
        return result.get("ok", False), result.get("msg", "timeout")

    def get_server_info(self) -> dict:
        mc = self.runner.model_config
        return {
            "model_path": mc.model_path,
            "architecture": mc.architecture,
            "context_length": mc.context_length,
            "is_quantized": mc.is_quantized,
            "max_total_tokens": self.runner.max_total_tokens,
            "page_size": self.runner.page_size,
            "waiting_queue_size": len(self.scheduler.waiting),
            "running_requests": len(self.scheduler.running),
            "version": __import__("sglang_awq_tpu").__version__,
        }

    def shutdown(self):
        self._shutdown.set()
        self._thread.join(timeout=5)
        if self._multihost and hasattr(self.runner, "stop_workers"):
            try:
                self.runner.stop_workers()
            except Exception:  # workers may already be gone
                logger.warning("stop_workers broadcast failed", exc_info=True)


class _FlushSentinel:
    """Queue item that executes a callback on the scheduler thread."""

    def __init__(self, fn):
        self.fn = fn
