"""Weight-only int8 quantization (beyond reference).

Per-output-channel symmetric quantization: W[:, o] ~= q[:, o] * s[o] with
q int8 and s float32. The matmul computes (x @ q) * s — the convert(int8 ->
compute dtype) fuses into the matmul operand on XLA:TPU, so HBM reads the
int8 bytes: decode at small batch is weight-read-bound, making this a ~2x
throughput lever over bf16 weights. KV cache, norms, and the MoE router stay
unquantized; activations are untouched (weight-only).

Layout contract (consumed by models/transformer.py::_mm and compute_logits):
a quantized tensor named `name` is stored as int8 under `name` with a float32
sibling `name + "_scale"` holding the per-out-channel scales. Scales carry
the same leading stacking dims (layer, expert) as the weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Weight leaves quantized per layer-stack pytree. Scale axis = LAST dim (the
# matmul's out channels for [.., in, out] weights; the vocab row for the
# embedding/lm_head, which is used as take(embed)[row] and h @ lm_head.T).
_LAYER_WEIGHTS = ("wq", "wk", "wv", "wo", "gate", "up", "down",
                  "moe_gate", "moe_up", "moe_down")
_TOP_WEIGHTS = ("embed", "lm_head")


def _quantize_leaf(w: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization reducing over the contraction dim `axis`:
    one scale per remaining index (per out-channel, per leading stack dims —
    [L, in, out] -> s [L, out]; [L, E, in, out] -> s [L, E, out]; the
    embedding [V, D] with axis=1 -> s [V], one scale per vocab row)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(s, axis=axis)


def quantize_eagle_params(params: dict) -> dict:
    """Quantize an EAGLE-3 draft param dict (models/eagle3.py layout: flat,
    single layer; consumed by eagle3._emm / eagle_logits). The draft's
    full-vocab LM head is most of its per-step bytes, so this matters even
    though the draft is small next to the target."""
    out = dict(params)
    for name in ("wq", "wk", "wv", "wo", "gate", "up", "down", "fc"):
        q, s = _quantize_leaf(params[name], axis=params[name].ndim - 2)
        out[name] = q
        out[name + "_scale"] = s
    tied = params.get("lm_head") is params.get("embed")
    q, s = _quantize_leaf(params["embed"], axis=1)
    out["embed"], out["embed_scale"] = q, s
    if tied:
        out["lm_head"], out["lm_head_scale"] = q, s
    else:
        q, s = _quantize_leaf(params["lm_head"], axis=1)
        out["lm_head"], out["lm_head_scale"] = q, s
    return out


def quantize_params(params: dict) -> dict:
    """Quantize the matmul weights of a loaded param pytree in place-ish
    (returns a new dict; embedding and lm_head share storage when tied)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _LAYER_WEIGHTS:
        if name not in layers:
            continue
        w = layers[name]
        # Contraction dim is -2 ([.., in, out]); scale per out channel.
        q, s = _quantize_leaf(w, axis=w.ndim - 2)
        layers[name] = q
        layers[name + "_scale"] = s
    out["layers"] = layers

    tied = params.get("lm_head") is params.get("embed")
    # Embedding/lm_head: [V, D], one scale per vocab row (works for both the
    # row gather and h @ W.T).
    q, s = _quantize_leaf(params["embed"], axis=1)
    out["embed"], out["embed_scale"] = q, s
    if tied:
        out["lm_head"], out["lm_head_scale"] = q, s
    else:
        q, s = _quantize_leaf(params["lm_head"], axis=1)
        out["lm_head"], out["lm_head_scale"] = q, s
    return out
