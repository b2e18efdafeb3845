"""SmolLM3 causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/smollm3.py`.  The Llama
graph with NoPE: `no_rope_layers[l] == 0` layers skip rotary entirely
(every 4th layer by default).  TPU form: the rope table stacks a second
IDENTITY table (cos=1, sin=0 — rotation is a no-op) and the per-layer
hook selects between them inside the scan, so the traced layer body
stays uniform (no lax.cond).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class SmolLM3ForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        c = self.config
        hf = c.hf_config
        nr = hf.get("no_rope_layers")
        if nr is None:
            iv = int(hf.get("no_rope_layer_interval", 4) or 0)
            nr = [
                0 if (iv and (i + 1) % iv == 0) else 1
                for i in range(c.num_layers)
            ]
        # HF semantics: 1 = rope ON; index 1 selects the identity table
        self._rope_idx = tuple(0 if use else 1 for use in nr)

    def rope(self):
        tab = super().rope()  # [P, rot_dim]
        half = tab.shape[-1] // 2
        ident = jnp.concatenate(
            [jnp.ones_like(tab[:, :half]), jnp.zeros_like(tab[:, half:])],
            axis=-1,
        )
        return jnp.stack([tab, ident])  # [2, P, rot_dim]

    def _rope_for_layer(self, rope_tab, l):
        idx = jnp.asarray(np.asarray(self._rope_idx, np.int32))[l]
        return rope_tab[idx]
