"""Speculative-decoding verification: the exactness core.

Parity: /root/reference/ssd/utils/verify.py:5-181 — greedy argmax-compare;
p/q-ratio acceptance only on rows whose tokens truly came from q (cache hits in
async mode, all rows with jit_speculate); recovery sampled from
norm(max(0, p-q)) on adjusted rows, else from p; greedy recovery for temp==0.

Unlike the reference (host+GPU mixed, returns ragged Python lists), the kernel
here is a single jittable function with static shapes returning
(accept_len[B], recovery[B]); the host builds the ragged accepted suffixes from
tokens it already holds, so no [B,K+1,V] logits ever cross the device->host
boundary.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ssd_tpu.ops.spec_math import apply_sampler_x_rescaling


def _probs_with_greedy_onehot(logits: jnp.ndarray, temps: jnp.ndarray) -> jnp.ndarray:
    """softmax(logits/T) for T>0 rows; one-hot(argmax) for T==0 rows.

    logits: [B, S, V] (any float dtype; softmax computed in fp32), temps: [B].
    """
    V = logits.shape[-1]
    t = jnp.clip(temps, min=1e-8)[:, None, None]
    soft = jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), V, dtype=jnp.float32)
    return jnp.where((temps > 0)[:, None, None], soft, onehot)


def _categorical_from_probs(key, probs: jnp.ndarray) -> jnp.ndarray:
    """Sample an index per row from a probability vector (gumbel-max)."""
    logp = jnp.log(jnp.clip(probs, min=1e-30))
    g = jax.random.gumbel(key, probs.shape, dtype=probs.dtype)
    return jnp.argmax(jnp.where(probs > 0, logp + g, -jnp.inf), axis=-1)


@partial(jax.jit, static_argnames=("jit_speculate", "sampler_x", "async_fan_out"))
def verify(
    logits_p: jnp.ndarray,       # [B, K+1, V] target logits
    logits_q: jnp.ndarray,       # [B, K, V] draft logits
    speculations: jnp.ndarray,   # [B, K+1] = [recovery | draft tokens]
    temperatures_target: jnp.ndarray,  # [B]
    temperatures_draft: jnp.ndarray,   # [B]
    cache_hits: jnp.ndarray | None,    # [B] {0,1} or None
    key: jax.Array,
    jit_speculate: bool = False,
    sampler_x: float | None = None,
    async_fan_out: int | None = None,
    top_p: jnp.ndarray | None = None,  # [B]; warps BOTH p and q (the draft
    top_k: jnp.ndarray | None = None,  # [B];  sampled from its warped dist)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (accept_until[B] in [0,K], recovery_token[B]).

    The accepted suffix for row b is [speculations[b,0]] + draft_tokens[b,:accept_until[b]],
    assembled by the host.
    """
    B, Kp1, V = logits_p.shape
    K = Kp1 - 1
    draft_tokens = speculations[:, 1:]                    # [B, K]

    # --- greedy path ---
    preds_p = jnp.argmax(logits_p, axis=-1)               # [B, K+1]
    matches = draft_tokens == preds_p[:, :-1]             # [B, K]
    any_mismatch = jnp.any(~matches, axis=1)
    first_mismatch = jnp.argmax(~matches, axis=1)
    accept_greedy = jnp.where(any_mismatch, first_mismatch, K)
    batch_idx = jnp.arange(B)
    rec_greedy = preds_p[batch_idx, accept_greedy]

    # --- ratio acceptance (only rows whose tokens came from q) ---
    temps_t = temperatures_target
    temps_q = temperatures_draft
    base_ratio_rows = (temps_t > 0) | (temps_q > 0)
    if jit_speculate:
        ratio_rows = base_ratio_rows
    elif cache_hits is not None:
        ratio_rows = base_ratio_rows & cache_hits.astype(bool)
    else:
        ratio_rows = jnp.zeros_like(base_ratio_rows)

    probs_p = _probs_with_greedy_onehot(logits_p, temps_t)  # [B, K+1, V]
    probs_q = _probs_with_greedy_onehot(logits_q, temps_q)  # [B, K, V]
    if sampler_x is not None:
        assert async_fan_out is not None
        probs_q = apply_sampler_x_rescaling(probs_q, sampler_x, async_fan_out)
    if top_p is not None:
        # Rejection sampling is exact for ANY (p, q) pair as long as q is
        # the distribution the draft actually sampled from — both sides warp
        # with the request's top-p/top-k, so acceptance ratios, the
        # max(0, p - q) recovery, and the p-fallback all live in the warped
        # space. Order matters: the draft samples warp(rescale(softmax))
        # (ops/sampler.py applies sampler_x BEFORE the warp), so q here must
        # rescale first too. (Warping a greedy one-hot row is a no-op.)
        from ssd_tpu.ops.sampler import warp_top_probs

        probs_p = warp_top_probs(probs_p, top_p[:, None], top_k[:, None])
        probs_q = warp_top_probs(probs_q, top_p[:, None], top_k[:, None])

    gather_idx = draft_tokens[:, :, None]
    p_vals = jnp.take_along_axis(probs_p[:, :K, :], gather_idx, axis=2)[:, :, 0]
    q_vals = jnp.take_along_axis(probs_q, gather_idx, axis=2)[:, :, 0]
    accept_probs = jnp.clip(p_vals / (q_vals + 1e-10), max=1.0)

    key, k_accept, k_adj, k_p = jax.random.split(key, 4)
    rand = jax.random.uniform(k_accept, accept_probs.shape, dtype=jnp.float32)
    accepts = rand <= accept_probs
    rej_any = jnp.any(~accepts, axis=1)
    first_rej = jnp.argmax(~accepts, axis=1)
    accept_ratio = jnp.where(rej_any, first_rej, K)

    accept_until = jnp.where(ratio_rows, accept_ratio, accept_greedy)

    # --- recovery distribution ---
    p_fallback = probs_p[batch_idx, accept_until]         # [B, V]
    p_sum = jnp.sum(p_fallback, axis=1, keepdims=True)
    fallback_dist = p_fallback / jnp.clip(p_sum, min=1e-30)

    q_idx_safe = jnp.clip(accept_until, max=K - 1)
    q_slice = probs_q[batch_idx, q_idx_safe]              # [B, V]
    mask_adjust = (temps_t > 0) & (accept_until < K) & ratio_rows

    adj = jnp.clip(p_fallback - q_slice, min=0.0)
    sums = jnp.sum(adj, axis=1, keepdims=True)
    adj_norm = jnp.where(sums > 0, adj / jnp.clip(sums, min=1e-30), fallback_dist)

    rec_adjusted = _categorical_from_probs(k_adj, adj_norm)
    rec_from_p = _categorical_from_probs(k_p, fallback_dist)
    rec_ratio = jnp.where(mask_adjust, rec_adjusted, rec_from_p)

    rec_final = jnp.where(temps_t > 0, rec_ratio, rec_greedy)
    return accept_until, rec_final


def build_suffixes(
    speculations,           # [B, K+1] host ints ([recovery | draft tokens])
    accept_until,           # [B] host ints
) -> tuple[list[list[int]], None]:
    """Assemble ragged accepted suffixes on the host (reference verify.py:169-181)."""
    suffixes = []
    import numpy as np

    spec = np.asarray(speculations)
    acc = np.asarray(accept_until)
    for b in range(spec.shape[0]):
        n = int(acc[b])
        suffixes.append([int(spec[b, 0])] + [int(t) for t in spec[b, 1:1 + n]])
    return suffixes, None
