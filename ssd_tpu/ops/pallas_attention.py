"""Pallas TPU kernels: paged flash attention over the block KV cache.

The TPU-native replacement for the reference's native attention surface
(SURVEY §2.2):
 - N2 (sgl_kernel flash attention: varlen prefill, paged decode, paged
   multi-query verify) -> `paged_attention` here, one flash-decoding kernel
   family parameterised by queries-per-sequence. Pages stream HBM -> VMEM via
   BlockSpec index maps driven by the scalar-prefetched block table; softmax
   is accumulated online in fp32 VMEM scratch.
 - N3 (FlashInfer paged tree attention with packed bitmask custom masks,
   /root/reference/ssd/engine/model_runner.py:159-206) -> `tree_attention`
   here. The reference materialises a [N, ctx] boolean mask and packs it to
   bits on the host every step (cudagraph_helpers.py:336-417); the mask is in
   fact fully determined by four integers per row (mask_helpers.py:12-21), so
   this kernel computes it analytically in-register from
   (context_len, fan_idx, step, row) — zero mask bytes move over HBM.

Layouts:
 - KV cache page block: kv_layer [2, Hkv, S, hd] with S = num_blocks *
   block_size flat slots; one (2, 1, block_size, hd) block per grid step, a
   contiguous (sublane, lane)-tiled page.
 - Queries are pre-grouped by KV head: q [B, Hkv, Q*G, hd] where G = Hq/Hkv,
   so each grid step owns all MXU rows that share one KV head's pages.

Grid: (B, Hkv, num_q_tiles, num_pages) — pages innermost so the online
softmax scratch carries across the page loop and resets per q-tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _regroup_q(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """[B, Q, Hq, hd] -> [B, Hkv, Q*G, hd] (rows that share a KV head)."""
    B, Q, Hq, hd = q.shape
    G = Hq // num_kv_heads
    q = q.reshape(B, Q, num_kv_heads, G, hd)
    return q.transpose(0, 2, 1, 3, 4).reshape(B, num_kv_heads, Q * G, hd)


def _ungroup_o(o: jnp.ndarray, Q: int) -> jnp.ndarray:
    """[B, Hkv, Q*G, hd] -> [B, Q, Hq, hd]."""
    B, Hkv, QG, hd = o.shape
    G = QG // Q
    o = o.reshape(B, Hkv, Q, G, hd)
    return o.transpose(0, 2, 1, 3, 4).reshape(B, Q, Hkv * G, hd)


def _flash_update(scores, mask, v, m_scr, l_scr, acc_scr):
    """One online-softmax accumulation step (all fp32)."""
    neg = jnp.float32(-1e30)
    s = jnp.where(mask, scores, neg)
    m_cur = jnp.max(s, axis=1, keepdims=True)                    # [R, 1]
    m_new = jnp.maximum(m_scr[:], m_cur)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)                 # [R, BS]
    alpha = jnp.exp(m_scr[:] - m_new)                            # [R, 1]
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new


def _paged_attn_kernel(
    # scalar prefetch
    bt_ref,      # [B, M] int32 block tables
    ctx_ref,     # [B] int32 attended lengths (incl. new tokens)
    qeff_ref,    # [B] int32 true queries per sequence (<= Q)
    # blocks
    q_ref,       # [1, 1, TQ, hd]
    kv_ref,      # [2, 1, BS, hd] page for (b, h)
    o_ref,       # [1, 1, TQ, hd]
    # scratch
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    Q: int,
    G: int,
    block_size: int,
):
    b, t, p = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    TQ = q_ref.shape[2]

    @pl.when(p == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    k = kv_ref[0, 0]
    v = kv_ref[1, 0]
    q = q_ref[0, 0]

    scores = jax.lax.dot(
        q.astype(jnp.float32), k.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    ) * scale                                                    # [TQ, BS]

    pos = p * block_size + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_size), 1
    )                                                            # [1, BS]
    row = t * TQ + jax.lax.broadcasted_iota(jnp.int32, (TQ, 1), 0)
    q_idx = row // G                                             # [TQ, 1]
    ctx = ctx_ref[b]
    qeff = qeff_ref[b]
    # Query i attends [0, ctx - qeff + i]; padding queries (i >= qeff) attend
    # a superset, their rows are discarded by the caller.
    limit = ctx - qeff + q_idx                                   # [TQ, 1]
    mask = (pos <= limit) & (pos < ctx)

    _flash_update(scores, mask, v.astype(jnp.float32), m_scr, l_scr, acc_scr)

    @pl.when(p == pl.num_programs(3) - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "ctx_pad", "scale", "interpret"),
)
def paged_attention(
    q: jnp.ndarray,             # [B, Q, Hq, hd]
    kv_layer: jnp.ndarray,      # [2, Hkv, S, hd]
    block_tables: jnp.ndarray,  # [B, M] int32
    context_lens: jnp.ndarray,  # [B]
    qeff: jnp.ndarray,          # [B] true queries per sequence
    block_size: int,
    ctx_pad: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal paged flash attention: Q=1 decode, Q=K+1 verify/glue, Q=S_pad
    prefill (with qeff = true new-token count)."""
    B, Q, Hq, hd = q.shape
    Hkv = kv_layer.shape[1]
    G = Hq // Hkv
    QG = Q * G
    TQ = min(QG, 512)
    num_q_tiles = pl.cdiv(QG, TQ)
    num_pages = max(1, ctx_pad // block_size)

    qg = _regroup_q(q, Hkv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, num_q_tiles, num_pages),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TQ, hd),
                lambda b, h, t, p, bt, ctx, qe: (b, h, t, 0),
            ),
            # Pages past a sequence's true length clamp to its last real page:
            # Pallas skips the DMA when the block index repeats across grid
            # steps, so ctx_pad overscan costs ~nothing (the mask already
            # zeroes those positions).
            pl.BlockSpec(
                (2, 1, block_size, hd),
                lambda b, h, t, p, bt, ctx, qe: (
                    0, h,
                    jnp.maximum(
                        bt[b, jnp.minimum(p, jnp.maximum(ctx[b] - 1, 0) // block_size)],
                        0,
                    ),
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TQ, hd),
            lambda b, h, t, p, bt, ctx, qe: (b, h, t, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _paged_attn_kernel, scale=scale, Q=Q, G=G, block_size=block_size
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qeff.astype(jnp.int32),
        qg,
        kv_layer,
    )
    return _ungroup_o(out, Q)


def _tree_attn_kernel(
    # scalar prefetch
    bt_ref,      # [B, M] int32
    ctx_ref,     # [B] int32 attended length at this step
    step_ref,    # [1] int32 tree depth s
    # blocks
    fan_ref,     # [1, MQ] int32 glue depth per tree row (VMEM: Mosaic only
                 #   allows scalar loads from SMEM, so this is a tensor input)
    q_ref,       # [1, 1, MQ*G, hd]
    kv_ref,      # [2, 1, BS, hd]
    o_ref,       # [1, 1, MQ*G, hd]
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    K: int,
    MQ: int,
    G: int,
    block_size: int,
):
    b, p = pl.program_id(0), pl.program_id(3)

    @pl.when(p == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    k = kv_ref[0, 0]
    v = kv_ref[1, 0]
    q = q_ref[0, 0]
    R = q.shape[0]  # MQ * G

    scores = jax.lax.dot(
        q.astype(jnp.float32), k.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    ) * scale

    pos = p * block_size + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_size), 1
    )                                                            # [1, BS]
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // G    # tree row r
    ctx = ctx_ref[b]
    step = step_ref[0]
    prefix = ctx - (K + 1) - (step + 1) * MQ

    # fan_idx per row: gather fan_ref[0, r] via compare-reduce (no vector
    # gather primitive on TPU).
    fan_row = jax.lax.broadcasted_iota(jnp.int32, (R, MQ), 1)
    fan_tbl = fan_ref[0, :][None, :]                             # [1, MQ]
    fan = jnp.sum(jnp.where(fan_row == row, fan_tbl, 0), axis=1, keepdims=True)

    in_prefix = pos < prefix
    glue_off = pos - prefix
    in_glue = (glue_off >= 0) & (glue_off <= fan)
    tree_off = pos - prefix - (K + 1)
    in_tree = (
        (tree_off >= 0)
        & (tree_off < (step + 1) * MQ)
        & (tree_off % MQ == row)
    )
    mask = (in_prefix | in_glue | in_tree) & (pos < ctx)

    _flash_update(scores, mask, v.astype(jnp.float32), m_scr, l_scr, acc_scr)

    @pl.when(p == pl.num_programs(3) - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("K", "block_size", "ctx_pad", "scale", "interpret"),
)
def tree_attention(
    q: jnp.ndarray,             # [B, MQ, Hq, hd]
    kv_layer: jnp.ndarray,      # [2, Hkv, S, hd]
    block_tables: jnp.ndarray,  # [B, M]
    context_lens: jnp.ndarray,  # [B]
    fan_idx_rows: jnp.ndarray,  # [B, MQ]
    step: jnp.ndarray,          # [] or [1] int32 (traced scan counter)
    K: int,
    block_size: int,
    ctx_pad: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged tree attention over N = B*MQ fork rows sharing trunk KV; the
    (prefix | glue-ancestors | own-column) mask is computed analytically."""
    B, MQ, Hq, hd = q.shape
    Hkv = kv_layer.shape[1]
    G = Hq // Hkv
    num_pages = max(1, ctx_pad // block_size)

    qg = _regroup_q(q, Hkv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, 1, num_pages),
        in_specs=[
            pl.BlockSpec(
                (1, MQ),
                lambda b, h, t, p, bt, ctx, st: (b, 0),
            ),
            pl.BlockSpec(
                (1, 1, MQ * G, hd),
                lambda b, h, t, p, bt, ctx, st: (b, h, 0, 0),
            ),
            # Same page-clamp trick as paged_attention: repeated block index
            # -> DMA skipped for pages past the true context.
            pl.BlockSpec(
                (2, 1, block_size, hd),
                lambda b, h, t, p, bt, ctx, st: (
                    0, h,
                    jnp.maximum(
                        bt[b, jnp.minimum(p, jnp.maximum(ctx[b] - 1, 0) // block_size)],
                        0,
                    ),
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, MQ * G, hd),
            lambda b, h, t, p, bt, ctx, st: (b, h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((MQ * G, 1), jnp.float32),
            pltpu.VMEM((MQ * G, 1), jnp.float32),
            pltpu.VMEM((MQ * G, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _tree_attn_kernel, scale=scale, K=K, MQ=MQ, G=G, block_size=block_size
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        jnp.atleast_1d(step).astype(jnp.int32),
        fan_idx_rows.astype(jnp.int32),
        qg,
        kv_layer,
    )
    return _ungroup_o(out, MQ)
