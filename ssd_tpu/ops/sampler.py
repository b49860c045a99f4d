"""Token sampling: temperature + gumbel-argmax, greedy fast path.

Parity: /root/reference/ssd/layers/sampler.py:14-36 — same semantics
(temp==0 rows take argmax; temp>0 rows sample softmax(logits/T), optionally
sampler_x-rescaled in tree mode). The reference seeds a global torch RNG
(sampler.py:6); here randomness flows through explicit JAX PRNG keys owned by
the model runner, which is both reproducible and multi-device safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ssd_tpu.ops.spec_math import apply_sampler_x_rescaling


def warp_top_probs(
    probs: jnp.ndarray,   # [..., V]
    top_p: jnp.ndarray,   # broadcastable [...] in (0, 1]; 1 = off
    top_k: jnp.ndarray,   # broadcastable [...] int; <= 0 = off
) -> jnp.ndarray:
    """Nucleus (top-p) + top-k filtering with renormalisation (beyond
    reference — the reference samples the full distribution). HF processor
    semantics: top-k filters FIRST, then top-p measures cumulative mass on
    the top-k-RENORMALISED survivors and keeps the smallest descending
    prefix reaching top_p (the first token is always kept). Rows with
    top_p == 1 and top_k <= 0 pass through numerically unchanged (mask
    all-true, renorm by the exact sum)."""
    V = probs.shape[-1]
    order = jnp.argsort(-probs, axis=-1)
    sorted_p = jnp.take_along_axis(probs, order, axis=-1)
    rank = jnp.arange(V).reshape((1,) * (probs.ndim - 1) + (V,))
    k = jnp.where(top_k[..., None] > 0, top_k[..., None], V)
    keep_k = rank < k
    kept = jnp.where(keep_k, sorted_p, 0.0)
    denom = jnp.clip(jnp.sum(kept, axis=-1, keepdims=True), min=1e-30)
    cum = jnp.cumsum(kept, axis=-1) / denom
    keep = keep_k & ((cum - kept / denom) < top_p[..., None])
    # Scatter the keep mask back to vocab order (cheaper than inverting the
    # permutation with a second sort).
    keep = jnp.put_along_axis(
        jnp.zeros_like(keep), order, keep, axis=-1, inplace=False
    )
    filtered = jnp.where(keep, probs, 0.0)
    return filtered / jnp.clip(
        jnp.sum(filtered, axis=-1, keepdims=True), min=1e-30
    )


@partial(jax.jit, static_argnames=("sampler_x", "fan_out", "is_tree"))
def sample(
    logits: jnp.ndarray,        # [B, V]
    temperatures: jnp.ndarray,  # [B]
    key: jax.Array,
    sampler_x: float | None = None,
    fan_out: int = 3,
    is_tree: bool = False,
    top_p: jnp.ndarray | None = None,   # [B]; None = off (no sort compiled)
    top_k: jnp.ndarray | None = None,   # [B]
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)

    t = jnp.clip(temperatures, min=1e-8)[:, None]
    probs = jax.nn.softmax(logits / t, axis=-1)
    if sampler_x is not None and is_tree:
        probs = apply_sampler_x_rescaling(probs, sampler_x, fan_out)
    if top_p is not None:
        probs = warp_top_probs(probs, top_p, top_k)

    # Exponential-race sampling (equivalent to gumbel-max on log probs):
    # argmax(probs / Exp(1)) ~ Categorical(probs). Mirrors reference
    # sampler.py:33-35.
    e = jax.random.exponential(key, probs.shape, dtype=jnp.float32)
    scores = probs / (e + 1e-10)
    sampled = jnp.argmax(scores, axis=-1)
    return jnp.where(temperatures == 0, greedy, sampled)
