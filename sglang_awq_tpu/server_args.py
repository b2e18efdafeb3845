"""Server arguments.

Role model: the reference's giant `ServerArgs` dataclass
(`python/sglang/srt/server_args.py:246`) — one typed config object, an argparse
mirror, validation, and a process-global accessor.  GPU-specific knobs (gpu-id
arithmetic, NCCL ports, CUDA-graph sizes) are replaced by TPU/mesh-native ones:
mesh axis sizes, jit bucket tables, and page sizes.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from typing import List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServerArgs:
    # --- model & load ---
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    trust_remote_code: bool = False
    # chat template override: a registered name (lang/chat_template.py),
    # a .jinja file, or a .json role-pair spec (reference --chat-template)
    chat_template: Optional[str] = None
    # fill-in-middle template for /v1/completions `suffix`
    # (lang/completion_template.py: deepseek_coder | star_coder | ...)
    completion_template: Optional[str] = None
    dtype: str = "bfloat16"  # activation dtype
    quantization: Optional[str] = None  # None => auto-detect from checkpoint
    context_length: Optional[int] = None  # None => model config default
    random_weights: bool = False  # skip checkpoint tensors; random init (bench)

    # --- memory & scheduling ---
    mem_fraction_static: float = 0.85
    max_total_tokens: Optional[int] = None  # KV pool size (tokens); None => auto
    max_running_requests: int = 256
    max_queued_requests: Optional[int] = None
    max_prefill_tokens: int = 8192
    chunked_prefill_size: int = 4096
    page_size: int = 16
    schedule_policy: str = "lpm"  # lpm | fcfs | lof | random
    schedule_conservativeness: float = 1.0
    disable_radix_cache: bool = False
    radix_cache_impl: str = "auto"  # auto | cpp | python
    enable_overlap_schedule: bool = True
    # run N decode steps per dispatch when the batch is stable (reference
    # --num-continuous-decode-steps; hides host/dispatch latency)
    num_continuous_decode_steps: int = 1
    stream_interval: int = 1
    watchdog_timeout: float = 300.0

    # --- parallelism (mesh) ---
    tp_size: int = 1
    dp_size: int = 1
    ep_size: int = 1
    nnodes: int = 1
    node_rank: int = 0
    dist_init_addr: Optional[str] = None

    # --- jit buckets (replaces cuda_graph_bs; SURVEY.md §A.5) ---
    decode_bs_buckets: Optional[List[int]] = None  # None => auto table
    prefill_token_buckets: Optional[List[int]] = None  # None => auto table
    # jit compilation cache dir ("" disables)
    jit_cache_dir: str = "~/.cache/sglang_awq_tpu/jit"
    # hybrid linear-attention models: recurrent-state checkpoint rows for
    # prefix caching (the mamba-radix role; 0 disables)
    hybrid_state_ckpts: int = 32
    # hybrid global/SWA models: keep SWA-layer KV in per-request page rings
    # (O(window) bytes) instead of the shared paged pool; set True to force
    # the single-pool layout (e.g. to keep radix prefix reuse)
    disable_swa_rings: bool = False

    # --- sampling defaults ---
    max_new_tokens_default: int = 128

    # --- server ---
    host: str = "127.0.0.1"
    port: int = 30000
    served_model_name: Optional[str] = None
    api_key: Optional[str] = None
    log_requests: bool = False
    log_level: str = "info"
    enable_metrics: bool = False
    skip_server_warmup: bool = False
    # request tracing (reference srt/tracing/trace.py): per-request root
    # span + stage slices, exported over OTLP/HTTP JSON when an endpoint
    # is set (flag spelling matches the reference's --oltp-traces-endpoint)
    enable_trace: bool = False
    oltp_traces_endpoint: Optional[str] = None

    # --- kv cache dtype: auto | bfloat16 | int8 | fp8_e4m3 ---
    kv_cache_dtype: str = "auto"

    # --- speculative / lora / grammar (wired in later phases) ---
    speculative_algorithm: Optional[str] = None
    speculative_num_draft_tokens: int = 4
    # EAGLE tree width: top-k candidates at the first draft step, each
    # continued greedily (reference --speculative-eagle-topk).  1 = chain.
    speculative_eagle_topk: int = 1
    # topk>1 tree topology: "scored" chooses the tree from per-level draft
    # scores within a static node budget (reference
    # build_tree_kernel_efficient role); "static" is the fixed
    # k-branch-roots-continued-greedily shape
    speculative_tree_mode: str = "scored"
    speculative_draft_model_path: Optional[str] = None
    # LoRA serving: list of name=path adapter specs loaded at startup
    lora_paths: Optional[List[str]] = None
    max_loras_per_batch: int = 4
    max_lora_rank: int = 32
    # tool-call output format: auto | llama3 | qwen25
    tool_call_parser: str = "auto"
    # separate <think> reasoning from content: deepseek-r1 | qwen3 | glm45
    reasoning_parser: Optional[str] = None
    # HiCache: host-memory KV tier behind the device radix cache
    enable_hierarchical_cache: bool = False
    disable_jump_forward: bool = False  # grammar forced-string fast path
    grpc_port: Optional[int] = None  # also serve gRPC (sglang.Engine)
    pp_size: int = 1  # pipeline-parallel stages (layer ranges)
    pp_microbatches: int = 0  # decode microbatches per step (0 = 2*pp)
    lm_head_dtype: str = "auto"  # "auto" (bf16) | "int8" (per-column scales)
    hicache_size_gb: float = 4.0
    # L3 persistent KV store behind the host tier: "posix://<dir>" (file
    # per page; prefix KV survives restarts).  Reference HiCacheStorage
    # backends (mooncake/3fs/...) slot in via the same factory.
    hicache_storage: Optional[str] = None
    grammar_backend: str = "none"
    lora_paths: Optional[List[str]] = None

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        self.check()

    def check(self):
        if self.page_size < 1:
            raise ValueError("page_size must be >= 1")
        if self.chunked_prefill_size % self.page_size != 0:
            # keep chunks page-aligned so radix keys stay page-aligned
            self.chunked_prefill_size = (
                (self.chunked_prefill_size + self.page_size - 1)
                // self.page_size
                * self.page_size
            )
        if self.max_prefill_tokens < self.chunked_prefill_size:
            self.max_prefill_tokens = self.chunked_prefill_size
        if self.tp_size < 1 or self.dp_size < 1 or self.ep_size < 1:
            raise ValueError("parallel sizes must be >= 1")

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser):
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            ftype = f.type
            if ftype in ("bool", bool):
                parser.add_argument(
                    name,
                    action="store_true" if not f.default else "store_false",
                    default=f.default,
                    dest=f.name,
                )
            elif ftype in ("Optional[List[str]]", "List[str]"):
                parser.add_argument(name, type=str, nargs="*", default=f.default, dest=f.name)
            elif ftype in ("Optional[List[int]]", "List[int]"):
                parser.add_argument(name, type=int, nargs="*", default=f.default, dest=f.name)
            elif ftype in ("Optional[int]", "int", int):
                parser.add_argument(name, type=int, default=f.default, dest=f.name)
            elif ftype in ("Optional[float]", "float", float):
                parser.add_argument(name, type=float, default=f.default, dest=f.name)
            else:
                parser.add_argument(name, type=str, default=f.default, dest=f.name)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        kwargs = {f.name: getattr(args, f.name) for f in dataclasses.fields(cls)}
        return cls(**kwargs)


_GLOBAL_SERVER_ARGS: Optional[ServerArgs] = None


def set_global_server_args(args: ServerArgs):
    global _GLOBAL_SERVER_ARGS
    _GLOBAL_SERVER_ARGS = args


def get_global_server_args() -> ServerArgs:
    global _GLOBAL_SERVER_ARGS
    if _GLOBAL_SERVER_ARGS is None:
        _GLOBAL_SERVER_ARGS = ServerArgs(model_path="")
    return _GLOBAL_SERVER_ARGS
