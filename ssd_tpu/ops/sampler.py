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


@partial(jax.jit, static_argnames=("sampler_x", "fan_out", "is_tree"))
def sample(
    logits: jnp.ndarray,        # [B, V]
    temperatures: jnp.ndarray,  # [B]
    key: jax.Array,
    sampler_x: float | None = None,
    fan_out: int = 3,
    is_tree: bool = False,
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)

    t = jnp.clip(temperatures, min=1e-8)[:, None]
    probs = jax.nn.softmax(logits / t, axis=-1)
    if sampler_x is not None and is_tree:
        probs = apply_sampler_x_rescaling(probs, sampler_x, fan_out)

    # Exponential-race sampling (equivalent to gumbel-max on log probs):
    # argmax(probs / Exp(1)) ~ Categorical(probs). Mirrors reference
    # sampler.py:33-35.
    e = jax.random.exponential(key, probs.shape, dtype=jnp.float32)
    scores = probs / (e + 1e-10)
    sampled = jnp.argmax(scores, axis=-1)
    return jnp.where(temperatures == 0, greedy, sampled)
