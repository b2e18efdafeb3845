"""End-to-end Engine tests (CPU, tiny HF-equivalent model).

Covers the continuous-batching stack: prefix cache reuse, chunked prefill,
concurrent requests, stop conditions, retraction, abort — against HF greedy
generation as ground truth (reference integration-test strategy, §4).
"""

import threading

import jax.numpy as jnp

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

TINY_CFG = dict(
    architectures=["LlamaForCausalLM"],
    vocab_size=512,
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    intermediate_size=448,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
)


@pytest.fixture(scope="module")
def engine_and_hf():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(**{k: v for k, v in TINY_CFG.items() if k != "architectures"})
    hf = LlamaForCausalLM(hf_cfg).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(TINY_CFG))
    sa = ServerArgs(
        model_path="tiny",
        page_size=8,
        max_total_tokens=2048,
        chunked_prefill_size=32,
        max_running_requests=8,
        watchdog_timeout=60,
    )
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    yield eng, hf
    eng.shutdown()


def hf_greedy(hf, ids, n):
    import torch

    with torch.no_grad():
        out = hf.generate(
            torch.tensor([ids]),
            max_new_tokens=n,
            do_sample=False,
            eos_token_id=None,
            pad_token_id=0,
        )
    return out[0][len(ids) :].tolist()


def test_single_greedy_matches_hf(engine_and_hf):
    eng, hf = engine_and_hf
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, 21).tolist()
    ref = hf_greedy(hf, prompt, 8)
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)
    assert out["meta_info"]["completion_tokens"] == 8
    assert out["meta_info"]["finish_reason"]["type"] == "length"


def test_long_prompt_chunked_prefill(engine_and_hf):
    eng, hf = engine_and_hf
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 500, 100).tolist()  # > chunked_prefill_size=32
    ref = hf_greedy(hf, prompt, 5)
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True},
    )
    assert out["output_ids"] == ref


def test_concurrent_and_prefix_cache(engine_and_hf):
    eng, hf = engine_and_hf
    rng = np.random.default_rng(2)
    base = rng.integers(3, 500, 40).tolist()
    prompts = [base + rng.integers(3, 500, 5).tolist() for _ in range(4)]
    refs = [hf_greedy(hf, p, 6) for p in prompts]

    results = [None] * 4

    def run(i):
        results[i] = eng.generate(
            input_ids=prompts[i],
            sampling_params={"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
        )

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i in range(4):
        assert results[i] is not None, f"req {i} hung"
        assert results[i]["output_ids"] == refs[i], f"req {i}"
    # at least one of the later requests should have hit the prefix cache
    cached = [r["meta_info"]["cached_tokens"] for r in results]
    assert max(cached) >= 32, cached


def test_stop_token(engine_and_hf):
    eng, hf = engine_and_hf
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 500, 10).tolist()
    ref = hf_greedy(hf, prompt, 16)
    stop_tok = ref[3]
    out = eng.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 16,
            "temperature": 0.0,
            "ignore_eos": True,
            "stop_token_ids": [stop_tok],
        },
    )
    assert out["output_ids"] == ref[:4]  # includes the matched stop token
    assert out["meta_info"]["finish_reason"]["type"] == "stop"


def test_streaming(engine_and_hf):
    eng, hf = engine_and_hf
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 500, 9).tolist()
    chunks = list(
        eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True},
            stream=True,
        )
    )
    assert len(chunks) >= 2
    assert chunks[-1]["finished"]
    assert len(chunks[-1]["output_ids"]) == 5


def test_sampling_determinism(engine_and_hf):
    eng, _ = engine_and_hf
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 500, 12).tolist()
    sp = {"max_new_tokens": 8, "temperature": 0.8, "top_p": 0.9, "seed": 42,
          "ignore_eos": True}
    a = eng.generate(input_ids=prompt, sampling_params=dict(sp))
    b = eng.generate(input_ids=prompt, sampling_params=dict(sp))
    assert a["output_ids"] == b["output_ids"]


def test_memory_invariant_after_load(engine_and_hf):
    eng, _ = engine_and_hf
    # after all requests completed, no pages may leak
    import time

    for _ in range(100):
        if not eng.scheduler.has_work():
            break
        time.sleep(0.05)
    eng.scheduler.check_memory()


def test_multi_step_decode_matches_single():
    """num_continuous_decode_steps > 1 must not change greedy outputs."""
    import torch

    from .utils import TINY_LLAMA_CFG as CFG2, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(CFG2))
    prompt = list(range(7, 30))
    outs = {}
    for k in (1, 4):
        sa = ServerArgs(
            model_path="tiny",
            page_size=8,
            max_total_tokens=1024,
            chunked_prefill_size=32,
            num_continuous_decode_steps=k,
        )
        e = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
        try:
            outs[k] = e.generate(
                input_ids=prompt,
                sampling_params={"max_new_tokens": 11, "temperature": 0.0,
                                 "ignore_eos": True},
            )["output_ids"]
        finally:
            e.shutdown()
    assert outs[1] == outs[4]
    assert len(outs[4]) == 11  # exact stop at max_new_tokens despite k=4 strips


def test_fp8_kv_cache_engine_close_to_hf():
    """fp8_e4m3 KV cache end to end: quantization noise moves logits, so we
    check token overlap against HF greedy rather than exact equality."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(**{k: v for k, v in TINY_CFG.items() if k != "architectures"})
    hf = LlamaForCausalLM(hf_cfg).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(TINY_CFG))
    sa = ServerArgs(
        model_path="tiny",
        page_size=8,
        max_total_tokens=1024,
        max_running_requests=4,
        watchdog_timeout=60,
        kv_cache_dtype="fp8_e4m3",
    )
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    try:
        assert eng.scheduler.runner.kv_spec.jdtype == jnp.float8_e4m3fn
        rng = np.random.default_rng(7)
        prompt = rng.integers(3, 500, 21).tolist()
        ref = hf_greedy(hf, prompt, 8)
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        got = out["output_ids"]
        assert len(got) == 8
        overlap = sum(a == b for a, b in zip(got, ref))
        assert overlap >= 5, (got, ref)
    finally:
        eng.shutdown()


def test_dfs_weight_policy_and_in_batch_dedup():
    """dfs-weight groups shared prefixes; a same-prefix batch-mate defers
    one round and then rides the radix cache (cached_tokens > 0)."""
    import threading

    from .utils import TINY_LLAMA_CFG as CFG2, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()

    mc = ModelConfig(model_path="", hf_config=dict(CFG2))
    sa = ServerArgs(
        model_path="tiny", page_size=8, max_total_tokens=2048,
        chunked_prefill_size=256, max_running_requests=8,
        schedule_policy="dfs-weight",
    )
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        rng = np.random.default_rng(9)
        base = rng.integers(3, 500, 40).tolist()
        prompts = [base + rng.integers(3, 500, 5).tolist() for _ in range(4)]
        refs, results = {}, {}
        sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}
        for i, p in enumerate(prompts):
            refs[i] = None

        def run(i):
            results[i] = eng.generate(input_ids=prompts[i],
                                      sampling_params=dict(sp))

        ts = [threading.Thread(target=run, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(i in results for i in range(4))
        cached = [results[i]["meta_info"]["cached_tokens"] for i in range(4)]
        # the deferred batch-mates ride the shared 40-token prefix
        assert max(cached) >= 32, cached
    finally:
        eng.shutdown()


def test_input_embeds_matches_token_prompt():
    """Passing the embedding rows of a token prompt through input_embeds
    must generate the same continuation (reference
    GenerateReqInput.input_embeds — the multimodal injection path)."""
    from .utils import TINY_LLAMA_CFG as CFG2, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(CFG2))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=1024,
                    chunked_prefill_size=32, max_running_requests=4)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        rng = np.random.default_rng(11)
        prompt = rng.integers(3, 500, 41).tolist()  # > 1 chunk
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        ref = eng.generate(input_ids=prompt,
                           sampling_params=dict(sp))["output_ids"]
        embed_w = np.asarray(
            eng.runner.params["embed"]["weight"], np.float32
        )
        embeds = embed_w[np.asarray(prompt)]
        out = eng.generate(input_embeds=embeds.tolist(),
                           sampling_params=dict(sp))["output_ids"]
        assert out == ref, (out, ref)
    finally:
        eng.shutdown()


def test_min_new_tokens_suppresses_eos():
    """EOS must be MASKED (not emitted) until min_new_tokens (reference
    min-token penalizer): a model whose argmax is always EOS generates
    exactly min_new non-EOS tokens + the final EOS."""
    from .utils import TINY_LLAMA_CFG as CFG2, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()
    t2 = {k: v.copy() for k, v in tensors.items()}
    t2["lm_head.weight"][2] += 50.0  # EOS (id 2) always wins argmax
    mc = ModelConfig(model_path="", hf_config=dict(CFG2))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32, max_running_requests=4)
    eng = Engine(server_args=sa, model_config=mc, tensors=t2, tokenizer=None)
    try:
        prompt = list(range(5, 20))
        out0 = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0},
        )
        assert out0["output_ids"] == [2]  # immediate EOS without min

        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "min_new_tokens": 4},
        )
        ids = out["output_ids"]
        assert len(ids) == 5, ids  # 4 forced non-EOS + the EOS
        assert all(t != 2 for t in ids[:4]), ids
        assert ids[-1] == 2
    finally:
        eng.shutdown()


def test_logit_bias_forces_token():
    """OpenAI logit_bias: a huge positive bias forces the token in both
    the prefill (bonus) sample and decode steps."""
    from .utils import TINY_LLAMA_CFG as CFG2, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(CFG2))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32, max_running_requests=4)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        out = eng.generate(
            input_ids=list(range(5, 20)),
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True,
                             "logit_bias": {77: 100.0}},
        )
        assert out["output_ids"] == [77, 77, 77, 77], out["output_ids"]
        # strong negative bias vetoes a token the model would pick
        base = eng.generate(
            input_ids=list(range(5, 20)),
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"][0]
        out2 = eng.generate(
            input_ids=list(range(5, 20)),
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                             "ignore_eos": True,
                             "logit_bias": {int(base): -100.0}},
        )
        assert out2["output_ids"][0] != base
    finally:
        eng.shutdown()


def test_lm_head_int8_logits_close():
    """--lm-head-dtype int8: per-column scales keep logits within ~1% and
    the greedy token stable on the tiny model."""
    import numpy as np

    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.model_executor.forward_batch import (
        ExtendBatchInput,
        SamplingRow,
    )
    from sglang_awq_tpu.model_executor.model_runner import ModelRunner
    from sglang_awq_tpu.server_args import ServerArgs

    from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 200, 17).tolist()
    T = len(prompt)
    ps = 8
    outs = {}
    for mode in ("auto", "int8"):
        mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
        sa = ServerArgs(model_path="tiny", page_size=ps,
                        max_total_tokens=512, chunked_prefill_size=64,
                        lm_head_dtype=mode)
        r = ModelRunner(sa, model_config=mc, tensors=tensors)
        pages = np.arange(8, dtype=np.int32)
        pos = np.arange(T, dtype=np.int32)
        ids0, lg = r.forward_extend_batch(
            ExtendBatchInput(
                tokens=np.asarray(prompt, np.int32),
                positions=pos,
                slots=pages[pos // ps] * ps + pos % ps,
                page_table=pages[None, :],
                kv_lens=np.asarray([T], np.int32),
                q_lens=np.asarray([T], np.int32),
                qb_base=np.asarray([0], np.int32),
                sampling=[SamplingRow()],
            ),
            want_logprobs=True,
        )
        outs[mode] = (int(ids0[0]), np.asarray(lg["top_logprobs"][0][:5]))
    assert outs["auto"][0] == outs["int8"][0]
    np.testing.assert_allclose(outs["auto"][1], outs["int8"][1], atol=0.05)


def test_flush_cache_deletes_old_pool():
    """/flush_cache must FREE the old pool's device buffers before the
    replacement allocates — both pools live across the alloc doubles KV
    HBM and ResourceExhausts at serving sizes (observed on a 7.5 GiB
    pool; the generate-after-flush path must also still work)."""
    import jax

    from tests.utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny-flush", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=2)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        out1 = eng.generate(
            input_ids=list(range(3, 20)),
            sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                             "ignore_eos": True})["output_ids"]
        old_leaves = jax.tree.leaves(eng.scheduler.runner.kv_cache)
        assert eng.flush_cache()
        assert all(leaf.is_deleted() for leaf in old_leaves)
        out2 = eng.generate(
            input_ids=list(range(3, 20)),
            sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                             "ignore_eos": True})["output_ids"]
        assert out2 == out1
    finally:
        eng.shutdown()
