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


def _open_all_tensors(model_path: str) -> dict[str, np.ndarray]:
    """Load every tensor from all *.safetensors files in a checkpoint dir —
    to HOST memory (framework="numpy"): the "flax" framework materializes
    every tensor on the default device, so a checkpoint load held the whole
    source-dtype checkpoint in HBM NEXT TO the converted params (a ~1.5x
    transient that OOMed the 3B-MoE geometry's load+prefill on one chip).
    Leaves upload one at a time inside the get() converters."""
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    files = sorted(glob(os.path.join(model_path, "*.safetensors")))
    assert files, f"no safetensors files found in {model_path}"
    for fn in files:
        with safe_open(fn, framework="numpy") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)
    return tensors


def load_params(model_path: str, mc: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Load a Llama-3 / Qwen-3 family checkpoint into the stacked pytree."""
    arch = Arch.from_model_config(mc)
    t = _open_all_tensors(model_path)
    L = arch.num_layers

    def get(name: str) -> jnp.ndarray:
        # Host-side dtype conversion (numpy + ml_dtypes), ONE upload of the
        # target-dtype bytes — never the source-dtype checkpoint copy.
        return jnp.asarray(np.asarray(t[name]).astype(dtype))

    def stack_t(fmt: str, transpose: bool = True) -> jnp.ndarray:
        """Stack a per-layer weight across layers; HF stores linear weights as
        [out, in], our forward computes x @ W so transpose to [in, out]."""
        ws = [np.asarray(t[fmt.format(i)]).astype(dtype) for i in range(L)]
        if transpose:
            ws = [w.T for w in ws]
        return jnp.asarray(np.stack(ws, axis=0))

    layers = {
        "input_ln": stack_t("model.layers.{}.input_layernorm.weight", transpose=False),
        "wq": stack_t("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stack_t("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stack_t("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stack_t("model.layers.{}.self_attn.o_proj.weight"),
        "post_ln": stack_t("model.layers.{}.post_attention_layernorm.weight", transpose=False),
    }
    if arch.num_experts:
        # Qwen3-MoE: router = mlp.gate [E, D] (transposed to [D, E]); expert
        # weights stack into [L, E, in, out].
        def stack_experts(proj: str) -> jnp.ndarray:
            return jnp.asarray(np.stack([
                np.stack([
                    np.asarray(
                        t[f"model.layers.{i}.mlp.experts.{e}.{proj}.weight"]
                    ).astype(dtype).T
                    for e in range(arch.num_experts)
                ], axis=0)
                for i in range(L)
            ], axis=0))

        layers["router"] = stack_t("model.layers.{}.mlp.gate.weight")
        layers["moe_gate"] = stack_experts("gate_proj")
        layers["moe_up"] = stack_experts("up_proj")
        layers["moe_down"] = stack_experts("down_proj")
    else:
        layers["gate"] = stack_t("model.layers.{}.mlp.gate_proj.weight")
        layers["up"] = stack_t("model.layers.{}.mlp.up_proj.weight")
        layers["down"] = stack_t("model.layers.{}.mlp.down_proj.weight")
    if arch.use_qk_norm:
        layers["q_norm"] = stack_t("model.layers.{}.self_attn.q_norm.weight", transpose=False)
        layers["k_norm"] = stack_t("model.layers.{}.self_attn.k_norm.weight", transpose=False)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": layers,
        "final_ln": get("model.norm.weight"),
    }
    if "d2t" in t:
        # Reduced draft vocab: lm_head is [Vd, D] over a subset of the target
        # vocab, d2t[i] the offset from draft slot i to its target token id
        # (the EAGLE-3 vocab-map convention, reference loader.py:64-183).
        # compute_logits scatters back to the full vocab with -inf elsewhere.
        assert "lm_head.weight" in t, "d2t requires an untied explicit lm_head"
        params["lm_head"] = get("lm_head.weight")
        params["d2t"] = jnp.asarray(np.asarray(t["d2t"]), jnp.int32)
        assert params["lm_head"].shape[0] == params["d2t"].shape[0], (
            "lm_head rows must match d2t length")
    elif arch.tie_embeddings or "lm_head.weight" not in t:
        params["lm_head"] = params["embed"]
    else:
        params["lm_head"] = get("lm_head.weight")
    return params


def load_eagle_params(
    model_path: str,
    mc: ModelConfig,
    d_model_target: int,
    num_eagle_layers: int,
    target_path: str | None = None,
    dtype=jnp.bfloat16,
) -> dict:
    """Load an EAGLE-3 draft checkpoint.

    Parity: /root/reference/ssd/utils/loader.py:64-183 — `midlayer.*` name
    remaps, `hidden_norm` -> conditioning norm, `d2t`/`t2d` vocab-map tensors,
    and borrowing `embed_tokens` from the target checkpoint when the draft
    ships without one (requires matching hidden sizes).
    """
    from ssd_tpu.models.eagle3 import EagleArch

    arch = EagleArch.from_model_config(mc, d_model_target, num_eagle_layers)
    t = _open_all_tensors(model_path)

    def get(name: str, transpose: bool = False) -> jnp.ndarray:
        w = np.asarray(t[name]).astype(dtype)
        return jnp.asarray(w.T if transpose else w)

    # EAGLE-3 checkpoints use either bare (`midlayer.`) or `model.`-prefixed
    # key layouts; resolve by probing.
    def key(*cands: str) -> str:
        for c in cands:
            if c in t:
                return c
        raise KeyError(f"none of {cands} in EAGLE checkpoint {sorted(t)[:8]}...")

    mid = "midlayer." if any(k.startswith("midlayer.") for k in t) else "model.midlayer."

    params = {
        "fc": get(key("fc.weight", "model.fc.weight"), transpose=True),
        "input_ln": get(key(mid + "input_layernorm.weight")),
        "cond_ln": get(key(mid + "hidden_norm.weight")),
        "post_ln": get(key(mid + "post_attention_layernorm.weight")),
        "wq": get(key(mid + "self_attn.q_proj.weight"), transpose=True),
        "wk": get(key(mid + "self_attn.k_proj.weight"), transpose=True),
        "wv": get(key(mid + "self_attn.v_proj.weight"), transpose=True),
        "wo": get(key(mid + "self_attn.o_proj.weight"), transpose=True),
        "gate": get(key(mid + "mlp.gate_proj.weight"), transpose=True),
        "up": get(key(mid + "mlp.up_proj.weight"), transpose=True),
        "down": get(key(mid + "mlp.down_proj.weight"), transpose=True),
        "final_ln": get(key("norm.weight", "model.norm.weight")),
        "lm_head": get(key("lm_head.weight", "model.lm_head.weight")),
    }
    if "d2t" in t:
        d2t = np.asarray(t["d2t"])
        if arch.draft_vocab_size == arch.vocab_size:
            # Full-vocab heads must map identically: eagle_logits skips the
            # per-step [T, V] scatter on that static condition.
            assert (d2t == 0).all(), (
                "EAGLE checkpoint with draft_vocab == vocab must carry an "
                "all-zero d2t (identity map)"
            )
        params["d2t"] = jnp.asarray(d2t, jnp.int32)
    else:
        assert arch.draft_vocab_size == arch.vocab_size, (
            "EAGLE checkpoint without d2t requires draft_vocab == target_vocab"
        )
        params["d2t"] = jnp.zeros((arch.draft_vocab_size,), jnp.int32)

    embed_key = next((k for k in t if "embed_tokens" in k), None)
    if embed_key is not None:
        params["embed"] = get(embed_key)
    else:
        assert target_path is not None, (
            "EAGLE checkpoint has no embed_tokens; need the target path to borrow it"
        )
        tt = _open_all_tensors(target_path)
        ek = next(k for k in tt if "embed_tokens" in k)
        assert tt[ek].shape[1] == arch.hidden_size, (
            f"target embedding width {tt[ek].shape[1]} != draft hidden {arch.hidden_size}"
        )
        params["embed"] = jnp.asarray(np.asarray(tt[ek]).astype(dtype))
    return params
