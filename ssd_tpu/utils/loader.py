"""Checkpoint loading: HF safetensors -> stacked-layer param pytree.

Parity: /root/reference/ssd/utils/loader.py (safetensors with packed-module
fusion and EAGLE name remaps). Instead of fusing q/k/v and gate/up into packed
GPU matrices, layers are *stacked along a leading L axis* to match the
lax.scan transformer in ssd_tpu.models.transformer; XLA fuses the per-layer
projections on its own.
"""

from __future__ import annotations

import json
import os
from glob import glob

import jax.numpy as jnp
import numpy as np

from ssd_tpu.config import ModelConfig
from ssd_tpu.models.transformer import Arch


def _open_all_tensors(model_path: str) -> dict[str, jnp.ndarray]:
    """Load every tensor from all *.safetensors files in a checkpoint dir."""
    from safetensors import safe_open

    tensors: dict[str, jnp.ndarray] = {}
    files = sorted(glob(os.path.join(model_path, "*.safetensors")))
    assert files, f"no safetensors files found in {model_path}"
    for fn in files:
        with safe_open(fn, framework="flax") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)
    return tensors


def load_params(model_path: str, mc: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Load a Llama-3 / Qwen-3 family checkpoint into the stacked pytree."""
    arch = Arch.from_model_config(mc)
    t = _open_all_tensors(model_path)
    L = arch.num_layers

    def get(name: str) -> jnp.ndarray:
        return t[name].astype(dtype)

    def stack_t(fmt: str, transpose: bool = True) -> jnp.ndarray:
        """Stack a per-layer weight across layers; HF stores linear weights as
        [out, in], our forward computes x @ W so transpose to [in, out]."""
        ws = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            ws = [w.T for w in ws]
        return jnp.stack(ws, axis=0)

    layers = {
        "input_ln": stack_t("model.layers.{}.input_layernorm.weight", transpose=False),
        "wq": stack_t("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stack_t("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stack_t("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stack_t("model.layers.{}.self_attn.o_proj.weight"),
        "post_ln": stack_t("model.layers.{}.post_attention_layernorm.weight", transpose=False),
        "gate": stack_t("model.layers.{}.mlp.gate_proj.weight"),
        "up": stack_t("model.layers.{}.mlp.up_proj.weight"),
        "down": stack_t("model.layers.{}.mlp.down_proj.weight"),
    }
    if arch.use_qk_norm:
        layers["q_norm"] = stack_t("model.layers.{}.self_attn.q_norm.weight", transpose=False)
        layers["k_norm"] = stack_t("model.layers.{}.self_attn.k_norm.weight", transpose=False)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": layers,
        "final_ln": get("model.norm.weight"),
    }
    if arch.tie_embeddings or "lm_head.weight" not in t:
        params["lm_head"] = params["embed"]
    else:
        params["lm_head"] = get("lm_head.weight")
    return params
