"""EAGLE-3 single-layer draft model conditioned on target activations.

Parity: /root/reference/ssd/models/eagle3_draft_llama3.py —
 - `fc`: [len(eagle_layers)*D_target] -> D_draft projection of the target's
   tapped residual-stream activations (eagle3:256)
 - one decoder layer whose attention input is the 2D-wide concat of
   norm(token_embedding) and norm(conditioning_features) (eagle3:99-154); the
   conditioning features (NOT the token embeddings) form the residual stream
 - `compute_logits` maps the reduced draft vocab to the full target vocab via
   the `d2t` offset tensor, -inf elsewhere (eagle3:314-352)

Pure functions over a param dict, mirroring models/transformer.py. The draft
KV cache is the standard [1, Hkv, S, 2*hd] single-layer cache; callers apply
the EAGLE -1 position shift (draft position p stores canonical token p+1).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ssd_tpu.config import ModelConfig
from ssd_tpu.ops.layers import apply_rope, rms_norm, rope_cos_sin, silu_mul


@dataclass(frozen=True)
class EagleArch:
    vocab_size: int          # full target vocab
    draft_vocab_size: int    # reduced LM-head vocab
    hidden_size: int         # D_draft
    intermediate_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float
    rope_theta: float
    d_model_target: int
    num_eagle_layers: int

    @classmethod
    def from_model_config(cls, mc: ModelConfig, d_model_target: int,
                          num_eagle_layers: int = 3) -> "EagleArch":
        return cls(
            vocab_size=mc.vocab_size,
            draft_vocab_size=mc.draft_vocab_size or mc.vocab_size,
            hidden_size=mc.hidden_size,
            intermediate_size=mc.intermediate_size,
            num_heads=mc.num_attention_heads,
            num_kv_heads=mc.num_key_value_heads,
            head_dim=mc.head_dim_actual,
            rms_norm_eps=mc.rms_norm_eps,
            rope_theta=mc.rope_theta,
            d_model_target=d_model_target,
            num_eagle_layers=num_eagle_layers,
        )

    # Shared with Arch so ModelRunner sizing works unchanged.
    @property
    def num_layers(self) -> int:
        return 1


def init_eagle_params(arch: EagleArch, key: jax.Array, dtype=jnp.float32) -> dict:
    D, I = arch.hidden_size, arch.intermediate_size
    Hq, Hkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    Dt3 = arch.num_eagle_layers * arch.d_model_target
    keys = iter(jax.random.split(key, 16))

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    return {
        "embed": w(next(keys), (arch.vocab_size, D)),
        "fc": w(next(keys), (Dt3, D)),
        "input_ln": jnp.ones((D,), dtype),
        "cond_ln": jnp.ones((D,), dtype),
        "post_ln": jnp.ones((D,), dtype),
        "wq": w(next(keys), (2 * D, Hq * hd)),
        "wk": w(next(keys), (2 * D, Hkv * hd)),
        "wv": w(next(keys), (2 * D, Hkv * hd)),
        "wo": w(next(keys), (Hq * hd, D)),
        "gate": w(next(keys), (D, I)),
        "up": w(next(keys), (D, I)),
        "down": w(next(keys), (I, D)),
        "final_ln": jnp.ones((D,), dtype),
        "lm_head": w(next(keys), (arch.draft_vocab_size, D)),
        "d2t": jnp.zeros((arch.draft_vocab_size,), jnp.int32),
    }


def _emm(x: jnp.ndarray, params: dict, name: str) -> jnp.ndarray:
    """x @ params[name], transparently dequantizing int8 weight-only params
    (utils/quant.py layout; the eagle analogue of transformer._mm)."""
    w = params[name]
    y = x @ w.astype(x.dtype)
    s = params.get(name + "_scale")
    return y if s is None else y * s.astype(y.dtype)


def _compute_dtype(params: dict) -> jnp.dtype:
    w = params["fc"]
    return jnp.bfloat16 if w.dtype == jnp.int8 else w.dtype


def project_target_acts(params: dict, acts: jnp.ndarray) -> jnp.ndarray:
    """fc: [T, num_eagle_layers*D_target] -> [T, D_draft]."""
    return _emm(acts.astype(_compute_dtype(params)), params, "fc")


def eagle_forward(
    params: dict,
    kv_cache: jnp.ndarray,      # [1, Hkv, S, 2*hd] (K/V interleaved)
    input_ids: jnp.ndarray,     # [T]
    conditioning: jnp.ndarray,  # [T, D_draft] (already fc-projected or prenorm)
    positions: jnp.ndarray,     # [T] (EAGLE-shifted) rope positions
    attn_call,                  # (q, k, v, kv_layer) -> (o, kv_layer)
    arch: EagleArch,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One decoder layer; returns (prenorm hidden [T, D], updated cache).

    The prenorm output is both the next step's self-conditioning and the
    input to eagle_logits.
    """
    T = input_ids.shape[0]
    Hq, Hkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    eps = arch.rms_norm_eps

    tok = jnp.take(params["embed"], input_ids, axis=0).astype(
        _compute_dtype(params))
    if "embed_scale" in params:  # int8 weight-only (utils/quant.py)
        tok = tok * jnp.take(
            params["embed_scale"], input_ids, axis=0
        )[:, None].astype(tok.dtype)
    cond = conditioning.astype(tok.dtype)
    x = jnp.concatenate(
        [rms_norm(tok, params["input_ln"], eps),
         rms_norm(cond, params["cond_ln"], eps)],
        axis=-1,
    )  # [T, 2D]

    cos, sin = rope_cos_sin(positions, hd, arch.rope_theta)
    q = apply_rope(_emm(x, params, "wq").reshape(T, Hq, hd), cos, sin)
    k = apply_rope(_emm(x, params, "wk").reshape(T, Hkv, hd), cos, sin)
    v = _emm(x, params, "wv").reshape(T, Hkv, hd)
    # Layer slicing via tree ops: the cache is either the plain [1,...]
    # array or the int8 (data, scales) pytree (ops/attention.py).
    o, kv_layer = attn_call(
        q, k, v, jax.tree.map(lambda c: c[0], kv_cache)
    )
    kv_cache = jax.tree.map(lambda c, l: c.at[0].set(l), kv_cache, kv_layer)
    attn_out = _emm(o.reshape(T, Hq * hd), params, "wo")

    # Conditioning features are the residual stream (eagle3:151-153).
    resid = (attn_out.astype(jnp.float32) + cond.astype(jnp.float32)).astype(tok.dtype)
    h = rms_norm(resid, params["post_ln"], eps)
    mlp = _emm(
        silu_mul(_emm(h, params, "gate"), _emm(h, params, "up")),
        params, "down",
    )
    prenorm = (mlp.astype(jnp.float32) + resid.astype(jnp.float32)).astype(tok.dtype)
    return prenorm, kv_cache


def eagle_logits(params: dict, prenorm: jnp.ndarray, arch: EagleArch) -> jnp.ndarray:
    """final_norm -> draft LM head -> d2t scatter into the FULL target vocab
    with -inf elsewhere (eagle3:314-352). Returns [T, vocab_size] fp32.

    Full-vocab heads (draft_vocab == vocab) skip the scatter: d2t is the
    identity there (load_eagle_params zeroes/asserts it), and a [T, V]
    dynamic-index scatter at V=128k costs milliseconds PER DRAFT STEP on
    TPU — it was ~2/3 of the fused-EAGLE round time before this carve-out."""
    h = rms_norm(prenorm, params["final_ln"], arch.rms_norm_eps)
    logits = h.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32).T
    if "lm_head_scale" in params:  # int8 weight-only (utils/quant.py)
        logits = logits * params["lm_head_scale"].astype(jnp.float32)[None, :]
    if arch.draft_vocab_size == arch.vocab_size:
        return logits
    target_idx = jnp.arange(arch.draft_vocab_size, dtype=jnp.int32) + params["d2t"]
    T = logits.shape[0]
    full = jnp.full((T, arch.vocab_size), -jnp.inf, jnp.float32)
    return full.at[:, target_idx].set(logits)
