"""Pure speculative-decoding math: lookahead sizing, glue inputs, fork
selection, sampler_x rescaling, and the analytic tree-attention mask.

Parity:
- compute_megaspec_lookahead / glue ids / fork selection / sampler_x:
  /root/reference/ssd/utils/async_helpers/async_spec_helpers.py
- tree mask structure: /root/reference/ssd/engine/helpers/mask_helpers.py:12-21
  — but here the mask is *computed analytically* from four integers per row
  (prefix_len, depth, step, row index) instead of materialised as a packed
  bitmask, which is what lets the TPU tree-attention kernel skip the bitmask
  entirely.

Everything here is jittable jnp with static shapes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def compute_megaspec_lookahead(MQ_LEN: int, K: int) -> int:
    """KV slots a single async spec step may consume beyond the trunk:
    glue (K+1) + tree (K steps x MQ_LEN rows)."""
    return K + 1 + K * MQ_LEN


def make_glue_input_ids(draft_tokens: jnp.ndarray, rec_tokens: jnp.ndarray) -> jnp.ndarray:
    """[B,K] draft tokens + [B] recovery tokens -> flat [B*(K+1)] with the
    recovery token first per sequence."""
    assert draft_tokens.shape[0] == rec_tokens.shape[0]
    return jnp.concatenate([rec_tokens[:, None], draft_tokens], axis=1).reshape(-1)


def fan_index(fan_out_list: list[int]) -> np.ndarray:
    """Per-tree-row glue depth: row r descends from glue position fan_index[r].

    e.g. fan_out_list=[2,2] -> [0,0,1,1]. Length == MQ_LEN.
    """
    return np.repeat(np.arange(len(fan_out_list)), fan_out_list).astype(np.int32)


def _small_topk_indices(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact top-k indices of x [..., V] for SMALL static k: k sequential
    argmax+mask passes (cheap VPU max reductions) instead of lax.top_k's
    sort machinery — measured 6.0 -> 0.4 ms/round on the fused-async B=8
    fork over a 128k vocab (bench/fasync_diag.py). Tie order matches
    lax.top_k (both take the lower index first), so results are identical.
    Falls back to lax.top_k past k=8 where the pass count stops winning."""
    if k > 8:
        return jax.lax.top_k(x, k)[1]
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    rows = jnp.arange(flat.shape[0])
    idxs = []
    for _ in range(k):
        i = jnp.argmax(flat, axis=-1)
        idxs.append(i)
        flat = flat.at[rows, i].set(-jnp.inf)
    return jnp.stack(idxs, axis=-1).reshape(lead + (k,)).astype(jnp.int32)


def get_forked_recovery_tokens(
    logits: jnp.ndarray,           # [B, K+1, V] glue logits
    cache_hits: jnp.ndarray,       # [B] {0,1}
    returned_tokens: jnp.ndarray,  # [B, K+1] tokens already returned ([rec | spec])
    fan_out_list: list[int],
    fan_out_list_miss: list[int],
) -> jnp.ndarray:
    """Top-F fork tokens per glue depth, excluding the already-returned token.

    Returns [B, MQ_LEN] where MQ_LEN = sum(fan_out_list). Depth j of the tree
    gets fan_out_list[j] (hit) or fan_out_list_miss[j] (miss) forks.
    """
    B, Kp1, V = logits.shape
    K = Kp1 - 1
    assert len(fan_out_list) == Kp1

    # Exclude the token the draft already returned at each of the first K
    # depths (the last depth has no returned continuation).
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    first_k = logits[:, :-1, :].at[
        jnp.arange(B)[:, None], jnp.arange(K)[None, :], returned_tokens[:, 1:]
    ].set(neg_inf)
    logits = jnp.concatenate([first_k, logits[:, -1:, :]], axis=1)

    k_max = max(max(fan_out_list), max(fan_out_list_miss))
    topk_idx = _small_topk_indices(logits, k_max)  # [B, K+1, k_max]

    hit_counts = jnp.asarray(fan_out_list, dtype=jnp.int32)        # [K+1]
    miss_counts = jnp.asarray(fan_out_list_miss, dtype=jnp.int32)  # [K+1]
    counts_b = jnp.where(
        cache_hits.astype(bool)[:, None], hit_counts[None, :], miss_counts[None, :]
    )  # [B, K+1]

    ar = jnp.arange(k_max)
    mask = ar[None, None, :] < counts_b[:, :, None]  # [B, K+1, k_max]

    MQ_LEN = sum(fan_out_list)
    # Variable positions but a fixed count per row: stable-sort the "not
    # selected" flag so selected entries come first, preserving order.
    mask_flat = mask.reshape(B, -1)
    idx_flat = topk_idx.reshape(B, -1)
    order = jnp.argsort(~mask_flat, axis=1, stable=True)[:, :MQ_LEN]
    return jnp.take_along_axis(idx_flat, order, axis=1)  # [B, MQ_LEN]


def apply_sampler_x_rescaling(probs: jnp.ndarray, sampler_x: float, F: int) -> jnp.ndarray:
    """Boost the top-(F+1) probabilities by sampler_x, then renormalise.

    probs: [..., V]. Parity: async_spec_helpers.apply_sampler_x_rescaling.
    """
    topk_idx = _small_topk_indices(probs, F + 1)
    # Mark top-(F+1) positions via scatter along the last axis.
    flat = probs.reshape(-1, probs.shape[-1])
    flat_idx = topk_idx.reshape(-1, F + 1)
    rows = jnp.arange(flat.shape[0])[:, None]
    topf_mask = jnp.zeros(flat.shape, dtype=bool).at[rows, flat_idx].set(True)
    topf_mask = topf_mask.reshape(probs.shape)
    probs = jnp.where(topf_mask, probs * sampler_x, probs)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def tree_attention_mask(
    context_lens: jnp.ndarray,  # [B] attended context length at this step
    step: int,                  # tree-decode depth s (0-based)
    fan_idx_rows: jnp.ndarray,  # [B, MQ_LEN] glue depth per row (hit/miss resolved)
    K: int,
    MQ_LEN: int,
    ctx_pad: int,
) -> jnp.ndarray:
    """Boolean mask [B, MQ_LEN, ctx_pad]: True = attend.

    The attended context at step s is laid out (per sequence) as
      [ trunk prefix (prefix_len) | glue (K+1) | step-0 rows (MQ_LEN) | ... | step-s rows ]
    with prefix_len = context_lens - (K+1) - (step+1)*MQ_LEN. Row r attends to
    the whole prefix, glue positions 0..fan_idx[r], and its own column r within
    every completed tree step — the analytic form of reference
    mask_helpers.get_mask_iter_i.
    """
    prefix_len = context_lens - (K + 1) - (step + 1) * MQ_LEN  # [B]
    pos = jnp.arange(ctx_pad)[None, None, :]                    # [1,1,ctx]
    pfx = prefix_len[:, None, None]

    in_prefix = pos < pfx
    glue_off = pos - pfx
    in_glue = (glue_off >= 0) & (glue_off <= fan_idx_rows[:, :, None])

    tree_off = pos - pfx - (K + 1)
    row_ids = jnp.arange(MQ_LEN)[None, :, None]
    in_tree = (
        (tree_off >= 0)
        & (tree_off < (step + 1) * MQ_LEN)
        & (tree_off % MQ_LEN == row_ids)
    )
    within = pos < context_lens[:, None, None]
    return (in_prefix | in_glue | in_tree) & within
