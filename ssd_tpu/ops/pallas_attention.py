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
 - KV cache page block: kv_layer [Hkv, S, 2*hd] (K/V interleaved on the
   minor axis; see ssd_tpu.ops.attention) — the 128-lane-aligned minor dim is
   what makes page DMAs expressible on TPU at head_dim 64.
 - Queries are pre-grouped by KV head AND zero-padded to [B, Hkv, Q*G, 2*hd]:
   [q | 0] dotted with [K | V] rows gives exactly q . K (the zero lanes kill
   the V half), and p @ [K | V] accumulates p . V in the upper lanes — so the
   kernels never lane-slice (which Mosaic cannot do below tile width), and the
   padding is free because hd=64 under-fills the 128-wide MXU anyway. The
   wrapper slices the V half of the output outside the kernel.

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
    """One online-softmax accumulation step.

    Softmax state is fp32; the p @ V dot runs in V's dtype (bf16 in
    production) with fp32 accumulation — fp32-INPUT matmuls cost several MXU
    passes per tile, so keeping the operands in the cache dtype is what lets
    the MXU run at full rate. Under the fp32 engine dtype (the exactness
    tests) the cast is a no-op and the arithmetic is unchanged."""
    neg = jnp.float32(-1e30)
    s = jnp.where(mask, scores, neg)
    m_cur = jnp.max(s, axis=1, keepdims=True)                    # [R, 1]
    m_new = jnp.maximum(m_scr[:], m_cur)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)                 # [R, BS]
    alpha = jnp.exp(m_scr[:] - m_new)                            # [R, 1]
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new


def _flash_update_batched(q3, kv3, mask, scale, m_scr, l_scr, acc_scr,
                          sk=None, sv=None, s8=False):
    """One online-softmax accumulation over a KV chunk, BATCHED over the
    leading dim — kv head (v2/tree2) or merged seq x kv-head (v3/tree3;
    Mosaic matmul allows a single batch dim). Shared by all double-buffered
    kernels so masking-law changes and numerics fixes land in one place.

    Dots run in the cache dtype with fp32 accumulation: the q.K products are
    exact either way, p is cast like every production flash kernel, and
    fp32-INPUT matmuls cost several MXU passes per tile. Under the fp32
    engine dtype (the exactness tests) the casts are no-ops.

    int8 KV (sk/sv [Nb, 1, bk] f32 per-position scales): kv3 arrives int8.
    s8=False (kv_quant="int8", bit-exact vs the jnp oracle): the chunk is
    cast to q's dtype in-register and the dequant folds into two
    LANE-ALIGNED multiplies — scores * sk after the q.K dot, p * sv before
    the p.V dot — so no transpose ever touches the scale vectors. The cast
    materializes every int8 element at compute width, which is why this
    path measured SLOWER than bf16 (PERF.md round 3).
    s8=True (kv_quant="int8_mxu"): the dots run NATIVELY s8 x s8 -> s32 on
    the MXU (2x int8 throughput on v5e, no cast): q is quantized in-register
    per row (max-abs / 127 — error of the same order as a bf16 cast), and p
    absorbs sv BEFORE its own per-row quantization so the per-position scale
    stays inside the contraction. Approximate (p carries ~1/254 absolute
    quantization) — the jnp oracle is the numerics control with a documented
    tolerance (tests/test_kv_quant.py)."""
    if sk is not None and s8:
        qf = q3.astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=2, keepdims=True),
                         1e-30) * (1.0 / 127.0)
        q_s8 = jnp.round(qf / qs).astype(jnp.int8)
        scores = jax.lax.dot_general(
            q_s8, kv3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (qs * scale) * sk
    else:
        if sk is not None:
            kv3 = kv3.astype(q3.dtype)
        scores = jax.lax.dot_general(
            q3, kv3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                            # [Nb, R, bk]
        if sk is not None:
            scores = scores * sk

    s3 = jnp.where(mask, scores, jnp.float32(-1e30))
    m_cur = jnp.max(s3, axis=2, keepdims=True)
    m_new = jnp.maximum(m_scr[:], m_cur)
    p = jnp.where(mask, jnp.exp(s3 - m_new), 0.0)
    alpha = jnp.exp(m_scr[:] - m_new)
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=2, keepdims=True)
    if sk is not None and s8:
        pq = p * sv                                          # [Nb, R, bk]
        ps = jnp.maximum(jnp.max(pq, axis=2, keepdims=True),
                         1e-30) * (1.0 / 127.0)
        p_s8 = jnp.round(pq / ps).astype(jnp.int8)
        acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
            p_s8, kv3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * ps
    else:
        if sv is not None:
            p = p * sv
        acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
            p.astype(kv3.dtype), kv3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    m_scr[:] = m_new


def _paged_attn_kernel(
    # scalar prefetch
    bt_ref,      # [B, M] int32 block tables
    ctx_ref,     # [B] int32 attended lengths (incl. new tokens)
    qeff_ref,    # [B] int32 true queries per sequence (<= Q)
    # blocks
    q_ref,       # [1, 1, TQ, 2*hd] ([q | 0] padded)
    kv_ref,      # [1, BS, 2*hd] page for (b, h)
    o_ref,       # [1, 1, TQ, 2*hd] (V half holds the result)
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

    ctx = ctx_ref[b]
    qeff = qeff_ref[b]
    # Causal early-exit: this q-tile's last row attends up to
    # ctx - qeff + last_q_idx; pages entirely above that (and pages past ctx)
    # contribute nothing — skip the flash update (their DMA is already
    # elided by the index-map clamp, which repeats the previous block index).
    tile_limit = jnp.minimum(ctx - qeff + ((t + 1) * TQ - 1) // G, ctx - 1)

    @pl.when(p * block_size <= tile_limit)
    def _():
        kv = kv_ref[0]
        q = q_ref[0, 0]

        # Operands stay in the cache dtype (MXU native rate); the product is
        # exact in the fp32 accumulator either way (bf16 x bf16 products have
        # 16-bit mantissas), so this loses nothing vs upcasting first.
        scores = jax.lax.dot_general(
            q, kv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                # [TQ, BS]

        pos = p * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_size), 1
        )                                                        # [1, BS]
        row = t * TQ + jax.lax.broadcasted_iota(jnp.int32, (TQ, 1), 0)
        q_idx = row // G                                         # [TQ, 1]
        # Query i attends [0, ctx - qeff + i]; padding queries (i >= qeff)
        # attend a superset, their rows are discarded by the caller.
        limit = ctx - qeff + q_idx                               # [TQ, 1]
        mask = (pos <= limit) & (pos < ctx)

        _flash_update(scores, mask, kv, m_scr, l_scr, acc_scr)

    @pl.when(p == pl.num_programs(3) - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "ctx_pad", "scale", "interpret", "tq"),
)
def paged_attention(
    q: jnp.ndarray,             # [B, Q, Hq, hd]
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd] (K/V interleaved)
    block_tables: jnp.ndarray,  # [B, M] int32
    context_lens: jnp.ndarray,  # [B]
    qeff: jnp.ndarray,          # [B] true queries per sequence
    block_size: int,
    ctx_pad: int,
    scale: float,
    interpret: bool = False,
    tq: int = 512,
) -> jnp.ndarray:
    """Causal paged flash attention: Q=1 decode, Q=K+1 verify/glue, Q=S_pad
    prefill (with qeff = true new-token count)."""
    B, Q, Hq, hd = q.shape
    Hkv = kv_layer.shape[0]
    G = Hq // Hkv
    QG = Q * G
    TQ = min(QG, tq)
    num_q_tiles = pl.cdiv(QG, TQ)
    num_pages = max(1, ctx_pad // block_size)

    qg = _regroup_q(q, Hkv)
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)  # [q | 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, num_q_tiles, num_pages),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TQ, 2 * hd),
                lambda b, h, t, p, bt, ctx, qe: (b, h, t, 0),
            ),
            # Pages past a sequence's true length — or past the q-tile's
            # CAUSAL limit (prefill: tile t's last row attends only up to
            # ctx - qeff + last_row) — clamp to the last needed page: Pallas
            # skips the DMA when the block index repeats across grid steps,
            # so both ctx_pad overscan and the upper causal triangle cost
            # ~nothing (the kernel also skips their flash update).
            pl.BlockSpec(
                (1, block_size, 2 * hd),
                lambda b, h, t, p, bt, ctx, qe: (
                    h,
                    jnp.maximum(
                        bt[b, jnp.minimum(
                            jnp.minimum(
                                p,
                                jnp.maximum(
                                    ctx[b] - qe[b] + ((t + 1) * TQ - 1) // G,
                                    0,
                                ) // block_size,
                            ),
                            jnp.maximum(ctx[b] - 1, 0) // block_size,
                        )],
                        0,
                    ),
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TQ, 2 * hd),
            lambda b, h, t, p, bt, ctx, qe: (b, h, t, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 2 * hd), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _paged_attn_kernel, scale=scale, Q=Q, G=G, block_size=block_size
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qeff.astype(jnp.int32),
        qp,
        kv_layer,
    )
    return _ungroup_o(out[..., hd:], Q)


# ---------------------------------------------------------------------------
# v2 decode/verify kernel: double-buffered multi-page DMA
# ---------------------------------------------------------------------------
#
# v1 above maps one PAGE per grid step through a BlockSpec, so a 2048-token
# context costs 32 grid steps of ~16KB DMAs per (seq, kv-head) — fixed
# per-step overhead dominates and the kernel runs far from the HBM roofline.
# v2 instead keeps the KV cache in HBM (memory_space=ANY) and hand-issues
# async copies for CHUNKS of pages into a double-buffered VMEM scratch: while
# chunk i is being reduced, chunk i+1 (possibly of the next (seq, head) pair)
# is already in flight. This is the standard TPU paged-attention pipelining
# scheme (cf. jax.experimental.pallas.ops.tpu.paged_attention, which this
# environment's version cannot run at head_dim 64).


def _v2_copy_chunk(kv_hbm_ref, kv_vmem, sem, bt_ref, b, chunk, C, bs):
    """Async-copy descriptor: pages [chunk*C, chunk*C+C) of sequence b into
    VMEM buffer kv_vmem ([C, Hkv, bs, 2*hd]). ONE strided copy per page moves
    every head's K and V — DMA issue count is the binding constraint at small
    page sizes, so copies are as coarse as the random page placement allows."""
    M = bt_ref.shape[1]
    copies = []
    for j in range(C):
        page = bt_ref[b, jnp.minimum(chunk * C + j, M - 1)]
        safe = jnp.maximum(page, 0)  # -1 (unallocated) clamps; masked anyway
        copies.append(
            pltpu.make_async_copy(
                kv_hbm_ref.at[:, pl.ds(safe * bs, bs), :],
                kv_vmem.at[:, j],
                sem,
            )
        )
    return copies


def _v2_wait_chunk(kv_hbm_ref, kv_vmem, sem, C, bs):
    """Wait-only descriptors: a DMA wait is keyed by (semaphore, byte count),
    not by the source address, so these use page 0 — sparing the scalar core
    the block-table loads + clamps of rebuilding the real descriptors (which
    showed up as per-grid-step overhead)."""
    for j in range(C):
        pltpu.make_async_copy(
            kv_hbm_ref.at[:, pl.ds(0, bs), :], kv_vmem.at[:, j], sem
        ).wait()


def _paged_attn_v2_kernel(
    # scalar prefetch
    bt_ref,      # [B, M] int32 page tables
    ctx_ref,     # [B] attended lengths
    qeff_ref,    # [B] true queries per sequence
    # in
    q_ref,       # [1, Hkv, QG, 2*hd] ([q | 0] padded; VMEM block for b)
    kv_hbm_ref,  # [Hkv, S, 2*hd] (ANY: stays in HBM; pages sliced from S)
    # out
    o_ref,       # [1, Hkv, QG, 2*hd] (V half holds the result)
    # scratch
    m_scr,       # [Hkv, QG, 1]
    l_scr,       # [Hkv, QG, 1]
    acc_scr,     # [Hkv, QG, 2*hd]
    kv_vmem,     # [2 bufs, Hkv, C, bs, 2*hd]
    sems,        # DMA semaphores [2]
    buf_ref,     # SMEM [1]: which buffer the CURRENT chunk lives in
    init_ref,    # SMEM [1]: 1 until the first grid step issued its copy
    *,
    scale: float,
    G: int,
    C: int,
    block_size: int,
    num_kv_heads: int,
):
    b, i = pl.program_id(0), pl.program_id(1)
    B = pl.num_programs(0)
    bk = C * block_size
    CP = pl.num_programs(1) * bk  # attended positions materialized (ctx_pad)
    hd2 = kv_vmem.shape[-1]
    # Ghost rows (padding) carry length 0; clamp to 1 so every b has exactly
    # one valid chunk and the prefetch pipeline stays in lockstep (their
    # masked output is all-zero and discarded by the caller). Clamp ABOVE to
    # CP as well: sync-SD/AR-multi-step context-limit overshoot can pass
    # context_lens > ctx_pad (the overshoot rows are ghost-slotted and
    # truncated by the host) — without the clamp the final-write guard never
    # fires and the prefetch walks a nonexistent chunk into the NEXT
    # sequence's first buffer.
    length = jnp.minimum(jnp.maximum(ctx_ref[b], 1), CP)

    @pl.when((b == 0) & (i == 0))
    def _():
        buf_ref[0] = 0
        init_ref[0] = 1

    def next_indices(b, i):
        """First valid (b, chunk) at or after (b, i): chunks past a
        sequence's length are skipped entirely (no DMA, no compute)."""
        return jax.lax.cond(
            i * bk < length, lambda: (b, i), lambda: (b + 1, 0)
        )

    @pl.when(i * bk < length)
    def _():
        buf = buf_ref[0]

        @pl.when(init_ref[0] == 1)
        def _():
            # Very first grid step: nothing in flight yet, start our own.
            for c in _v2_copy_chunk(kv_hbm_ref, kv_vmem.at[buf], sems.at[buf],
                                    bt_ref, b, i, C, block_size):
                c.start()
        init_ref[0] = 0

        @pl.when(i == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -1e30)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        # Prefetch the NEXT valid chunk into the other buffer.
        nb, ni = next_indices(b, i + 1)

        @pl.when(nb < B)
        def _():
            nxt = 1 - buf
            for c in _v2_copy_chunk(kv_hbm_ref, kv_vmem.at[nxt], sems.at[nxt],
                                    bt_ref, nb, ni, C, block_size):
                c.start()
            buf_ref[0] = nxt

        # Wait for this chunk, then reduce it (all heads at once).
        _v2_wait_chunk(kv_hbm_ref, kv_vmem.at[buf], sems.at[buf], C,
                       block_size)

        QG = q_ref.shape[2]
        pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, QG, 1), 1)
        q_idx = row // G
        # Causal limits use the TRUE context (an overshoot row's limit may
        # exceed CP; its excess positions are cut by the `pos < length`
        # bound — only ghost-slot positions ever fall there).
        limit = ctx_ref[b] - qeff_ref[b] + q_idx
        mask = (pos <= limit) & (pos < length)               # [1, QG, bk]

        # All heads reduced by one BATCHED dot (leading batch dim = kv head):
        # the online-softmax state lives in [Hkv, QG, *] scratch touched only
        # as whole refs (Mosaic cannot slice refs below tile granularity), and
        # the head-independent mask is computed once and broadcast.
        kv3 = kv_vmem[buf].reshape(num_kv_heads, bk, hd2)
        q3 = q_ref[0]                                        # [Hkv, QG, 2hd]
        _flash_update_batched(q3, kv3, mask, scale, m_scr, l_scr, acc_scr)

        @pl.when((i + 1) * bk >= length)
        def _():
            out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
            o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "ctx_pad", "scale", "pages_per_chunk",
                     "interpret"),
)
def paged_attention_v2(
    q: jnp.ndarray,             # [B, Q, Hq, hd]
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd] (K/V interleaved)
    block_tables: jnp.ndarray,  # [B, M] int32
    context_lens: jnp.ndarray,  # [B]
    qeff: jnp.ndarray,          # [B]
    block_size: int,
    ctx_pad: int,
    scale: float,
    pages_per_chunk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Double-buffered paged flash attention (decode / verify / glue)."""
    B, Q, Hq, hd = q.shape
    Hkv = kv_layer.shape[0]
    G = Hq // Hkv
    QG = Q * G
    max_pages = max(1, ctx_pad // block_size)
    C = min(pages_per_chunk, max_pages)
    num_chunks = pl.cdiv(max_pages, C)

    qg = _regroup_q(q, Hkv)
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)  # [q | 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, num_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, Hkv, QG, 2 * hd),
                lambda b, i, bt, ctx, qe: (b, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, QG, 2 * hd),
            lambda b, i, bt, ctx, qe: (b, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, QG, 1), jnp.float32),
            pltpu.VMEM((Hkv, QG, 1), jnp.float32),
            pltpu.VMEM((Hkv, QG, 2 * hd), jnp.float32),
            pltpu.VMEM((2, Hkv, C, block_size, 2 * hd), kv_layer.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _paged_attn_v2_kernel, scale=scale, G=G, C=C, block_size=block_size,
        num_kv_heads=Hkv,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qeff.astype(jnp.int32),
        qp,
        kv_layer,
    )
    return _ungroup_o(out[..., hd:], Q)


# ---------------------------------------------------------------------------
# v3 decode/verify kernel: multiple sequences per grid step
# ---------------------------------------------------------------------------
#
# Measured decomposition of v2 (bench/kernel_diag.py, v5e): an EMPTY grid
# step — no DMA, no compute — costs ~3 us, and with grid (B, chunks) that
# floor alone puts ctx-2048 batch-8 decode at ~30% of the HBM roofline.
# v3 therefore folds NB sequences into ONE grid step: grid
# (ceil(B/NB), chunks), each step DMAs NB sequences' chunk i and reduces all
# of them with one 2-batch-dim MXU call. Same double-buffered pipeline,
# NB x fewer fixed costs. The price: a chunk is skipped only when EVERY
# sequence in the group is past it (per-seq skip needs per-seq grid steps),
# so ragged groups over-copy; decode batches are length-homogeneous enough
# that fewer grid steps dominate.


def _v3_geometry(kv_layer, block_size: int, B: int, pages_per_chunk: int,
                 seqs_per_step: int, ctx_pad: int,
                 rows: int | None = None) -> tuple[int, int]:
    """(NB, C) for the batched-group kernels: the double-buffered KV scratch
    `2 * NB * C * page_bytes` must fit an ~8 MB budget (v5e VMEM is 16 MB,
    and the q/out blocks + fp32 softmax scratch need the rest). BOTH knobs
    shrink: C first, then NB — at hd=128 geometries a 256-token page is
    1 MB, so NB=8 alone would already claim the whole VMEM.

    `rows` (query rows per sequence, QG or MQ*G) tightens the budget for
    row-heavy callers: the in-kernel mask/softmax temporaries are ~4 f32
    arrays of [NB*Hkv, rows, C*bs] on the Mosaic stack — at the async tree's
    B=8, MQ*G=40 shape they alone exceed the whole VMEM unless C shrinks
    (measured: 'Scoped allocation ... exceeded scoped vmem limit')."""
    max_pages = max(1, ctx_pad // block_size)
    # int8 cache: the in-kernel cast to the compute dtype materializes a
    # SECOND (2-byte) copy of the chunk on the Mosaic stack, so budget each
    # int8 element at 3 bytes (1 data + 2 cast), not 1.
    eff_itemsize = (3 if kv_layer.dtype == jnp.int8
                    else kv_layer.dtype.itemsize)
    page_bytes = (kv_layer.shape[0] * block_size * kv_layer.shape[-1]
                  * eff_itemsize)
    NB = max(1, min(seqs_per_step, B))
    while NB > 1 and 2 * NB * page_bytes > (8 << 20):
        NB //= 2
    budget_pages = max(1, (8 << 20) // (2 * NB * page_bytes))
    C = max(1, min(pages_per_chunk, budget_pages, max_pages))
    if rows is not None:
        Hkv = kv_layer.shape[0]

        def footprint(NB_, C_):
            temps = 4 * NB_ * Hkv * rows * C_ * block_size * 4
            return 2 * NB_ * C_ * page_bytes + temps

        while C > 1 and footprint(NB, C) > (14 << 20):
            C //= 2
        while NB > 1 and footprint(NB, C) > (14 << 20):
            NB //= 2
    return NB, C


def _v3_copy_group(kv_hbm_ref, kv_vmem, sem, bt_ref, g, chunk, NB, C, bs):
    """Async-copy descriptors for chunk `chunk` of sequences
    [g*NB, g*NB+NB) into kv_vmem ([NB, Hkv, C, bs, 2*hd])."""
    B, M = bt_ref.shape
    copies = []
    for j in range(NB):
        b = jnp.minimum(g * NB + j, B - 1)
        for c in range(C):
            page = bt_ref[b, jnp.minimum(chunk * C + c, M - 1)]
            safe = jnp.maximum(page, 0)
            copies.append(
                pltpu.make_async_copy(
                    kv_hbm_ref.at[:, pl.ds(safe * bs, bs), :],
                    kv_vmem.at[j, :, c],
                    sem,
                )
            )
    return copies


def _v3_wait_group(kv_hbm_ref, kv_vmem, sem, NB, C, bs):
    """Wait-only descriptors (see _v2_wait_chunk)."""
    for j in range(NB):
        for c in range(C):
            pltpu.make_async_copy(
                kv_hbm_ref.at[:, pl.ds(0, bs), :], kv_vmem.at[j, :, c], sem
            ).wait()


def _paged_attn_v3_kernel(
    bt_ref, ctx_ref, qeff_ref, q_ref, kv_hbm_ref, o_ref,
    m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
):
    _paged_attn_v3_body(
        bt_ref, ctx_ref, qeff_ref, q_ref, None, kv_hbm_ref, o_ref,
        m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
    )


def _paged_attn_v3_kernel_i8(
    bt_ref, ctx_ref, qeff_ref, q_ref, s_ref, kv_hbm_ref, o_ref,
    m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
):
    """int8-KV variant: one extra VMEM input — the pre-gathered per-position
    scales block [NB, Hkv, 2, bk] (see ops/attention.py::gather_scales)."""
    _paged_attn_v3_body(
        bt_ref, ctx_ref, qeff_ref, q_ref, s_ref, kv_hbm_ref, o_ref,
        m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
    )


def _paged_attn_v3_body(
    # scalar prefetch
    bt_ref,      # [B, M] int32 page tables
    ctx_ref,     # [B] attended lengths
    qeff_ref,    # [B] true queries per sequence
    # in
    q_ref,       # [NB, Hkv, QG, 2*hd] ([q | 0] padded; VMEM block for group)
    s_ref,       # [NB, Hkv, 2, bk] f32 dequant scales | None (fp cache)
    kv_hbm_ref,  # [Hkv, S, 2*hd] (ANY; int8 when s_ref is set)
    # out
    o_ref,       # [NB, Hkv, QG, 2*hd]
    # scratch
    m_scr,       # [NB*Hkv, QG, 1]
    l_scr,       # [NB*Hkv, QG, 1]
    acc_scr,     # [NB*Hkv, QG, 2*hd]
    kv_vmem,     # [2 bufs, NB, Hkv, C, bs, 2*hd]
    sems,        # DMA semaphores [2]
    buf_ref,     # SMEM [1]
    init_ref,    # SMEM [1]
    *,
    scale: float,
    G: int,
    NB: int,
    C: int,
    block_size: int,
    num_kv_heads: int,
    s8: bool = False,
):
    g, i = pl.program_id(0), pl.program_id(1)
    NG = pl.num_programs(0)
    B = ctx_ref.shape[0]
    bk = C * block_size
    CP = pl.num_programs(1) * bk  # attended positions materialized (ctx_pad)
    hd2 = kv_vmem.shape[-1]

    def group_len(g):
        """Max attended length over the group, clamped to [1, CP]: >=1 so
        every group has one valid chunk and the pipeline stays in lockstep;
        <=CP so context-limit overshoot (context_lens > ctx_pad, see
        _paged_attn_v2_kernel) cannot starve the final write or desequence
        the prefetch."""
        m = jnp.int32(1)
        for j in range(NB):
            m = jnp.maximum(m, ctx_ref[jnp.minimum(g * NB + j, B - 1)])
        return jnp.minimum(m, CP)

    length = group_len(g)

    @pl.when((g == 0) & (i == 0))
    def _():
        buf_ref[0] = 0
        init_ref[0] = 1

    def next_indices(g, i):
        return jax.lax.cond(
            i * bk < group_len(g), lambda: (g, i), lambda: (g + 1, 0)
        )

    @pl.when(i * bk < length)
    def _():
        buf = buf_ref[0]

        @pl.when(init_ref[0] == 1)
        def _():
            for c in _v3_copy_group(kv_hbm_ref, kv_vmem.at[buf],
                                    sems.at[buf], bt_ref, g, i, NB, C,
                                    block_size):
                c.start()
        init_ref[0] = 0

        @pl.when(i == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -1e30)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        ng, ni = next_indices(g, i + 1)

        @pl.when(ng < NG)
        def _():
            nxt = 1 - buf
            for c in _v3_copy_group(kv_hbm_ref, kv_vmem.at[nxt],
                                    sems.at[nxt], bt_ref, ng, ni, NB, C,
                                    block_size):
                c.start()
            buf_ref[0] = nxt

        _v3_wait_group(kv_hbm_ref, kv_vmem.at[buf], sems.at[buf], NB, C,
                       block_size)

        QG = q_ref.shape[2]
        NBH = NB * num_kv_heads
        # Per-BATCH-ROW (seq x kv-head, merged: Mosaic matmul allows at most
        # ONE batch dim) lengths/qeff: built from SMEM scalars by broadcast
        # selects over a batch iota — no vector gather needed.
        bidx = jax.lax.broadcasted_iota(jnp.int32, (NBH, 1, 1), 0)
        seq_of = bidx // num_kv_heads                        # [NBH, 1, 1]
        lens = jnp.zeros((NBH, 1, 1), jnp.int32)
        qeffs = jnp.zeros((NBH, 1, 1), jnp.int32)
        for j in range(NB):
            b = jnp.minimum(g * NB + j, B - 1)
            lens = jnp.where(seq_of == j, ctx_ref[b], lens)
            qeffs = jnp.where(seq_of == j, qeff_ref[b], qeffs)

        pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, QG, 1), 1)
        # True-context causal limits; the position bound clamps to CP so
        # overshoot rows (ghost-slotted, host-truncated) stop at the
        # materialized positions (see _paged_attn_v2_kernel).
        limit = lens - qeffs + row // G                      # [NBH, QG, 1]
        mask = (pos <= limit) & (pos < jnp.minimum(lens, CP))  # [NBH,QG,bk]

        kv3 = kv_vmem[buf].reshape(NBH, bk, hd2)
        q3 = q_ref[:].reshape(NBH, QG, hd2)
        sk = sv = None
        if s_ref is not None:
            s3 = s_ref[:].reshape(NBH, 2, bk)
            sk, sv = s3[:, 0:1, :], s3[:, 1:2, :]
        _flash_update_batched(q3, kv3, mask, scale, m_scr, l_scr, acc_scr,
                              sk=sk, sv=sv, s8=s8)

        @pl.when((i + 1) * bk >= length)
        def _():
            out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
            o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_size", "ctx_pad", "scale",
                     "pages_per_chunk", "seqs_per_step", "interpret", "s8"),
)
def paged_attention_v3_padded(
    qp: jnp.ndarray,            # [B_pad, Hkv, QG, 2*hd] ([q | 0] grouped)
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd] (K/V interleaved)
    block_tables: jnp.ndarray,  # [B, M] int32
    context_lens: jnp.ndarray,  # [B]
    qeff: jnp.ndarray,          # [B]
    group_size: int,            # G = Hq // Hkv (rows per query position)
    block_size: int,
    ctx_pad: int,
    scale: float,
    pages_per_chunk: int = 8,
    seqs_per_step: int = 8,
    interpret: bool = False,
    s8: bool = False,
) -> jnp.ndarray:
    """The v3 kernel proper, on the pre-grouped [q | 0]-padded layout
    (returns the same layout; the V half holds the result). Split from the
    public wrapper so the kernel bench can chain calls WITHOUT re-paying the
    regroup/pad XLA glue per iteration — in production that glue is fused
    into the surrounding projections, so this is the honest kernel cost."""
    B = context_lens.shape[0]
    _, Hkv, QG, hd2 = qp.shape
    hd = hd2 // 2
    G = group_size
    int8 = isinstance(kv_layer, tuple)
    kv_data = kv_layer[0] if int8 else kv_layer
    max_pages = max(1, ctx_pad // block_size)
    NB, C = _v3_geometry(kv_data, block_size, B, pages_per_chunk,
                         seqs_per_step, ctx_pad, rows=QG)
    num_groups = pl.cdiv(B, NB)
    num_chunks = pl.cdiv(max_pages, C)
    bk = C * block_size

    q_spec = pl.BlockSpec(
        (NB, Hkv, QG, 2 * hd), lambda g, i, bt, ctx, qe: (g, 0, 0, 0)
    )
    in_specs = [q_spec]
    extra_in = []
    if int8:
        # Per-position dequant scales, pre-gathered in XLA ([B, Hkv, 2,
        # ctx_pad], ~6% of the int8 KV bytes) and blocked per (group, chunk).
        from ssd_tpu.ops.attention import gather_scales

        s = gather_scales(kv_layer, block_tables, block_size, ctx_pad)
        if num_groups * NB > B:
            s = jnp.pad(s, ((0, num_groups * NB - B), (0, 0), (0, 0), (0, 0)))
        in_specs.append(pl.BlockSpec(
            (NB, Hkv, 2, bk), lambda g, i, bt, ctx, qe: (g, 0, 0, i)
        ))
        extra_in.append(s)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_groups, num_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (NB, Hkv, QG, 2 * hd),
            lambda g, i, bt, ctx, qe: (g, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((NB * Hkv, QG, 1), jnp.float32),
            pltpu.VMEM((NB * Hkv, QG, 1), jnp.float32),
            pltpu.VMEM((NB * Hkv, QG, 2 * hd), jnp.float32),
            pltpu.VMEM((2, NB, Hkv, C, block_size, 2 * hd), kv_data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _paged_attn_v3_kernel_i8 if int8 else _paged_attn_v3_kernel,
        scale=scale, G=G, NB=NB, C=C,
        block_size=block_size, num_kv_heads=Hkv, s8=s8 and int8,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qeff.astype(jnp.int32),
        qp,
        *extra_in,
        kv_data,
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "ctx_pad", "scale", "pages_per_chunk",
                     "seqs_per_step", "interpret", "s8"),
)
def paged_attention_v3(
    q: jnp.ndarray,             # [B, Q, Hq, hd]
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd] (K/V interleaved)
    block_tables: jnp.ndarray,  # [B, M] int32
    context_lens: jnp.ndarray,  # [B]
    qeff: jnp.ndarray,          # [B]
    block_size: int,
    ctx_pad: int,
    scale: float,
    pages_per_chunk: int = 8,
    seqs_per_step: int = 8,
    interpret: bool = False,
    s8: bool = False,
) -> jnp.ndarray:
    """Batched-group double-buffered paged flash attention (decode/verify):
    the public [B, Q, Hq, hd] wrapper around paged_attention_v3_padded."""
    B, Q, Hq, hd = q.shape
    kv_data = kv_layer[0] if isinstance(kv_layer, tuple) else kv_layer
    Hkv = kv_data.shape[0]
    G = Hq // Hkv
    NB, _ = _v3_geometry(kv_data, block_size, B, pages_per_chunk,
                         seqs_per_step, ctx_pad,
                         rows=Q * G)  # must match the core's NB
    num_groups = pl.cdiv(B, NB)

    qg = _regroup_q(q, Hkv)
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)  # [q | 0]
    if B % NB:
        qp = jnp.pad(qp, ((0, num_groups * NB - B), (0, 0), (0, 0), (0, 0)))
    out = paged_attention_v3_padded(
        qp, kv_layer, block_tables, context_lens, qeff, G, block_size,
        ctx_pad, scale, pages_per_chunk=pages_per_chunk,
        seqs_per_step=seqs_per_step, interpret=interpret, s8=s8,
    )
    return _ungroup_o(out[:B, ..., hd:], Q)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "ctx_pad", "scale", "interpret"),
)
def paged_attention_prefill(
    q: jnp.ndarray,             # [B, S_pad, Hq, hd]
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd]
    block_tables: jnp.ndarray,  # [B, M] int32
    context_lens: jnp.ndarray,  # [B]
    qeff: jnp.ndarray,          # [B] true new-token count per sequence
    block_size: int,
    ctx_pad: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Prefill flash attention over the paged cache at LARGE KV tiles.

    The page-per-grid-step kernel is hopeless at prefill shapes: a 2k-token
    self-attention walks 16-KB pages through thousands of grid steps and runs
    ~400x off the MXU roofline (42 ms measured on the v5e vs ~0.1 ms of
    causal-triangle compute). Prefill is compute-bound, so instead: gather
    the paged context into a DENSE per-sequence layout once (one XLA gather,
    ~bytes-of-KV traffic), then run the same flash kernel with a synthetic
    identity block table at a 1024-token tile — each grid step streams a
    256 KB KV tile and feeds the MXU 1024-row dots, with the causal
    early-exit skipping the upper triangle. Replaces the reference's
    flash_attn_varlen_func prefill (/root/reference/ssd/layers/attention.py:90-93).
    """
    B = q.shape[0]
    # Page-granular gather (few indices, contiguous page copies) — an
    # element-granular row gather of the same bytes measured 4x slower.
    # Prefill is compute-bound, so the int8 cache dequantizes HERE (inside
    # the same fused gather) and the kernel below runs on fp values.
    from ssd_tpu.ops.attention import dense_pages

    n_pages = ctx_pad // block_size
    pages = block_tables[:, :n_pages]                         # [B, n_pages]
    dense = dense_pages(kv_layer, pages.reshape(-1), block_size)
    dense = dense.astype(q.dtype)
    # Largest pow-2 tile <= 512 dividing ctx_pad (ctx buckets are pow-2
    # multiples of the page size, but the max_model_len cap need not be).
    TK = 1
    while TK < 512 and ctx_pad % (TK * 2) == 0:
        TK *= 2
    nb = ctx_pad // TK
    ident = jnp.arange(B * nb, dtype=jnp.int32).reshape(B, nb)
    return paged_attention(
        q, dense, ident, context_lens, qeff, TK, ctx_pad, scale,
        interpret=interpret, tq=512,
    )


def paged_attention_best(
    q: jnp.ndarray,
    kv_layer: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    qeff: jnp.ndarray,
    block_size: int,
    ctx_pad: int,
    scale: float,
    interpret: bool | None = None,
    s8: bool = False,
) -> jnp.ndarray:
    """Route to the fastest applicable kernel: the double-buffered v2 for
    decode/verify/moderate prefill tiles, v1 (one page per grid step) for
    query tiles too large for v2's single-tile VMEM scratch. interpret=None
    auto-selects interpret mode off-TPU (e.g. engine runs forced onto CPU
    with use_pallas=True for kernel-path exactness checks)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Q, Hq, hd = q.shape
    int8 = isinstance(kv_layer, tuple)
    Hkv = (kv_layer[0] if int8 else kv_layer).shape[0]
    G = Hq // Hkv
    # The manual-DMA kernels need a 128-lane-aligned minor dim (2*hd), and
    # their single-tile scratch bounds the query rows, so route only small-Q
    # phases (decode / verify / glue) of >=64-head-dim models there;
    # everything else takes v1's BlockSpec page-per-step path (whose
    # pipelined DMAs have no lane-alignment constraint). Multi-sequence
    # batches take v3 (NB sequences per grid step — the ~3 us/grid-step
    # fixed cost dominates these shapes, see PERF.md); B=1 has nothing to
    # group and stays on v2. The int8 cache is implemented in v3 (which
    # handles B=1 as NB=1) and in the dense-gather prefill; the v1 fallback
    # shapes (hd < 64) take the jnp oracle with XLA-side dequant.
    if (Hkv * Q * G <= 512 and ctx_pad % block_size == 0
            and (2 * hd) % 128 == 0):
        if B > 1 or int8:
            return paged_attention_v3(
                q, kv_layer, block_tables, context_lens, qeff,
                block_size, ctx_pad, scale, interpret=interpret, s8=s8,
            )
        return paged_attention_v2(
            q, kv_layer, block_tables, context_lens, qeff,
            block_size, ctx_pad, scale, interpret=interpret,
        )
    if Q * G > 512 and ctx_pad % block_size == 0:
        # Prefill tiles: dense-gather + large-tile flash (compute-bound path).
        return paged_attention_prefill(
            q, kv_layer, block_tables, context_lens, qeff,
            block_size, ctx_pad, scale, interpret=interpret,
        )
    if int8:
        from ssd_tpu.ops import attention as att_oracle

        return att_oracle.paged_attention(
            q, kv_layer, block_tables, context_lens, block_size, ctx_pad,
            scale, qeff=qeff,
        )
    return paged_attention(
        q, kv_layer, block_tables, context_lens, qeff,
        block_size, ctx_pad, scale, interpret=interpret,
    )


def _tree_attn_v2_kernel(
    # scalar prefetch
    bt_ref,      # [B, M] int32 page tables
    ctx_ref,     # [B] attended length at this step
    step_ref,    # [1] int32 tree depth s
    # in
    fan_ref,     # [1, 1, MQ] int32 glue depth per tree row (VMEM tensor
                 #   input; 3D so the per-b block's minor-2 dims equal the
                 #   array's — Mosaic tiling constraint at B > 1)
    q_ref,       # [1, Hkv, MQ*G, 2*hd] ([q | 0] padded)
    kv_hbm_ref,  # [Hkv, S, 2*hd] (ANY)
    # out
    o_ref,       # [1, Hkv, MQ*G, 2*hd] (V half holds the result)
    # scratch
    m_scr, l_scr, acc_scr,   # [Hkv, MQ*G, *]
    kv_vmem,     # [2 bufs, Hkv, C, bs, 2*hd]
    sems, buf_ref, init_ref,
    *,
    scale: float,
    K: int,
    MQ: int,
    G: int,
    C: int,
    block_size: int,
    num_kv_heads: int,
):
    """tree_attention with the same double-buffered multi-page pipeline as
    _paged_attn_v2_kernel; only the mask differs (prefix | glue-ancestors |
    own tree column, computed analytically)."""
    b, i = pl.program_id(0), pl.program_id(1)
    B = pl.num_programs(0)
    bk = C * block_size
    CP = pl.num_programs(1) * bk
    hd2 = kv_vmem.shape[-1]
    # Clamp to [1, CP] like _paged_attn_v2_kernel (tree callers keep the
    # boundary finish so ctx > ctx_pad should not occur, but the pipeline
    # must never walk past its last chunk even if it does).
    length = jnp.minimum(jnp.maximum(ctx_ref[b], 1), CP)

    @pl.when((b == 0) & (i == 0))
    def _():
        buf_ref[0] = 0
        init_ref[0] = 1

    def next_indices(b, i):
        return jax.lax.cond(
            i * bk < length, lambda: (b, i), lambda: (b + 1, 0)
        )

    @pl.when(i * bk < length)
    def _():
        buf = buf_ref[0]

        @pl.when(init_ref[0] == 1)
        def _():
            for c in _v2_copy_chunk(kv_hbm_ref, kv_vmem.at[buf], sems.at[buf],
                                    bt_ref, b, i, C, block_size):
                c.start()
        init_ref[0] = 0

        @pl.when(i == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -1e30)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        nb, ni = next_indices(b, i + 1)

        @pl.when(nb < B)
        def _():
            nxt = 1 - buf
            for c in _v2_copy_chunk(kv_hbm_ref, kv_vmem.at[nxt], sems.at[nxt],
                                    bt_ref, nb, ni, C, block_size):
                c.start()
            buf_ref[0] = nxt

        # Wait-only descriptors (keyed by semaphore + byte count) — spares
        # the scalar core the block-table loads of rebuilding the real
        # descriptors, same as the paged v2 kernel.
        _v2_wait_chunk(kv_hbm_ref, kv_vmem.at[buf], sems.at[buf], C,
                       block_size)

        R = MQ * G
        pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1) // G  # tree row
        ctx = ctx_ref[b]
        step = step_ref[0]
        prefix = ctx - (K + 1) - (step + 1) * MQ

        # fan_idx per row: gather fan_ref[0, r] via compare-reduce (no vector
        # gather primitive on TPU).
        fan_row = jax.lax.broadcasted_iota(jnp.int32, (R, MQ), 1)
        fan_tbl = fan_ref[0, 0, :][None, :]
        fan = jnp.sum(
            jnp.where(fan_row == row[0], fan_tbl, 0), axis=1, keepdims=True
        )[None]                                              # [1, R, 1]

        in_prefix = pos < prefix
        glue_off = pos - prefix
        in_glue = (glue_off >= 0) & (glue_off <= fan)
        tree_off = pos - prefix - (K + 1)
        in_tree = (
            (tree_off >= 0)
            & (tree_off < (step + 1) * MQ)
            & (tree_off % MQ == row)
        )
        mask = (in_prefix | in_glue | in_tree) & (pos < ctx)  # [1, R, bk]

        kv3 = kv_vmem[buf].reshape(num_kv_heads, bk, hd2)
        q3 = q_ref[0]
        _flash_update_batched(q3, kv3, mask, scale, m_scr, l_scr, acc_scr)

        @pl.when((i + 1) * bk >= length)
        def _():
            out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
            o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("K", "block_size", "ctx_pad", "scale", "pages_per_chunk",
                     "interpret"),
)
def tree_attention_v2(
    q: jnp.ndarray,             # [B, MQ, Hq, hd]
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd] (K/V interleaved)
    block_tables: jnp.ndarray,  # [B, M]
    context_lens: jnp.ndarray,  # [B]
    fan_idx_rows: jnp.ndarray,  # [B, MQ]
    step: jnp.ndarray,
    K: int,
    block_size: int,
    ctx_pad: int,
    scale: float,
    pages_per_chunk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Double-buffered paged tree attention (see tree_attention)."""
    B, MQ, Hq, hd = q.shape
    Hkv = kv_layer.shape[0]
    G = Hq // Hkv
    max_pages = max(1, ctx_pad // block_size)
    C = min(pages_per_chunk, max_pages)
    num_chunks = pl.cdiv(max_pages, C)

    qg = _regroup_q(q, Hkv)
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, num_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, MQ),
                lambda b, i, bt, ctx, st: (b, 0, 0),
            ),
            pl.BlockSpec(
                (1, Hkv, MQ * G, 2 * hd),
                lambda b, i, bt, ctx, st: (b, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, MQ * G, 2 * hd),
            lambda b, i, bt, ctx, st: (b, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, MQ * G, 1), jnp.float32),
            pltpu.VMEM((Hkv, MQ * G, 1), jnp.float32),
            pltpu.VMEM((Hkv, MQ * G, 2 * hd), jnp.float32),
            pltpu.VMEM((2, Hkv, C, block_size, 2 * hd), kv_layer.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _tree_attn_v2_kernel, scale=scale, K=K, MQ=MQ, G=G, C=C,
        block_size=block_size, num_kv_heads=Hkv,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        jnp.atleast_1d(step).astype(jnp.int32),
        fan_idx_rows.astype(jnp.int32)[:, None, :],
        qp,
        kv_layer,
    )
    return _ungroup_o(out[..., hd:], MQ)


def _tree_attn_v3_kernel(
    bt_ref, ctx_ref, step_ref, fan_ref, q_ref, kv_hbm_ref, o_ref,
    m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
):
    _tree_attn_v3_body(
        bt_ref, ctx_ref, step_ref, fan_ref, q_ref, None, kv_hbm_ref, o_ref,
        m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
    )


def _tree_attn_v3_kernel_i8(
    bt_ref, ctx_ref, step_ref, fan_ref, q_ref, s_ref, kv_hbm_ref, o_ref,
    m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
):
    """int8-KV variant: + the pre-gathered scales block [NB, Hkv, 2, bk]."""
    _tree_attn_v3_body(
        bt_ref, ctx_ref, step_ref, fan_ref, q_ref, s_ref, kv_hbm_ref, o_ref,
        m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref, **kw,
    )


def _tree_attn_v3_body(
    # scalar prefetch
    bt_ref,      # [B, M] int32 page tables
    ctx_ref,     # [B] attended lengths
    step_ref,    # [1] int32 tree depth s
    # in
    fan_ref,     # [NB, 1, MQ] int32 glue depth per tree row
    q_ref,       # [NB, Hkv, MQ*G, 2*hd] ([q | 0] padded)
    s_ref,       # [NB, Hkv, 2, bk] f32 dequant scales | None (fp cache)
    kv_hbm_ref,  # [Hkv, S, 2*hd] (ANY; int8 when s_ref is set)
    # out
    o_ref,       # [NB, Hkv, MQ*G, 2*hd]
    # scratch
    m_scr, l_scr, acc_scr,   # [NB*Hkv, MQ*G, *]
    kv_vmem,     # [2 bufs, NB, Hkv, C, bs, 2*hd]
    sems, buf_ref, init_ref,
    *,
    scale: float,
    K: int,
    MQ: int,
    G: int,
    NB: int,
    C: int,
    block_size: int,
    num_kv_heads: int,
    s8: bool = False,
):
    """tree_attention with the NB-sequences-per-grid-step pipeline of
    _paged_attn_v3_kernel (the per-seq grid steps' fixed cost dominates the
    v2 tree kernel exactly as it did decode); only the mask differs."""
    g, i = pl.program_id(0), pl.program_id(1)
    NG = pl.num_programs(0)
    B = ctx_ref.shape[0]
    bk = C * block_size
    CP = pl.num_programs(1) * bk
    hd2 = kv_vmem.shape[-1]

    def group_len(g):
        m = jnp.int32(1)
        for j in range(NB):
            m = jnp.maximum(m, ctx_ref[jnp.minimum(g * NB + j, B - 1)])
        return jnp.minimum(m, CP)  # never walk past the last chunk

    length = group_len(g)

    @pl.when((g == 0) & (i == 0))
    def _():
        buf_ref[0] = 0
        init_ref[0] = 1

    def next_indices(g, i):
        return jax.lax.cond(
            i * bk < group_len(g), lambda: (g, i), lambda: (g + 1, 0)
        )

    @pl.when(i * bk < length)
    def _():
        buf = buf_ref[0]

        @pl.when(init_ref[0] == 1)
        def _():
            for c in _v3_copy_group(kv_hbm_ref, kv_vmem.at[buf],
                                    sems.at[buf], bt_ref, g, i, NB, C,
                                    block_size):
                c.start()
        init_ref[0] = 0

        @pl.when(i == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -1e30)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        ng, ni = next_indices(g, i + 1)

        @pl.when(ng < NG)
        def _():
            nxt = 1 - buf
            for c in _v3_copy_group(kv_hbm_ref, kv_vmem.at[nxt],
                                    sems.at[nxt], bt_ref, ng, ni, NB, C,
                                    block_size):
                c.start()
            buf_ref[0] = nxt

        _v3_wait_group(kv_hbm_ref, kv_vmem.at[buf], sems.at[buf], NB, C,
                       block_size)

        R = MQ * G
        NBH = NB * num_kv_heads
        bidx = jax.lax.broadcasted_iota(jnp.int32, (NBH, 1, 1), 0)
        seq_of = bidx // num_kv_heads                        # [NBH, 1, 1]
        lens = jnp.zeros((NBH, 1, 1), jnp.int32)
        for j in range(NB):
            b = jnp.minimum(g * NB + j, B - 1)
            lens = jnp.where(seq_of == j, ctx_ref[b], lens)

        pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1) // G  # tree row
        step = step_ref[0]
        prefix = lens - (K + 1) - (step + 1) * MQ            # [NBH, 1, 1]

        # fan per (merged batch row, tree row): per-seq compare-reduce over
        # the VMEM fan table, then a seq-select over the merged batch dim.
        fan_row = jax.lax.broadcasted_iota(jnp.int32, (R, MQ), 1)
        fan = jnp.zeros((NBH, R, 1), jnp.int32)
        for j in range(NB):
            fan_j = jnp.sum(
                jnp.where(fan_row == row[0], fan_ref[j, 0, :][None, :], 0),
                axis=1, keepdims=True,
            )[None]                                          # [1, R, 1]
            fan = jnp.where(seq_of == j, fan_j, fan)

        in_prefix = pos < prefix
        glue_off = pos - prefix
        in_glue = (glue_off >= 0) & (glue_off <= fan)
        tree_off = glue_off - (K + 1)
        in_tree = (
            (tree_off >= 0)
            & (tree_off < (step + 1) * MQ)
            & (tree_off % MQ == row)
        )
        mask = (in_prefix | in_glue | in_tree) & (pos < lens)  # [NBH, R, bk]

        kv3 = kv_vmem[buf].reshape(NBH, bk, hd2)
        q3 = q_ref[:].reshape(NBH, R, hd2)
        sk = sv = None
        if s_ref is not None:
            s3 = s_ref[:].reshape(NBH, 2, bk)
            sk, sv = s3[:, 0:1, :], s3[:, 1:2, :]
        _flash_update_batched(q3, kv3, mask, scale, m_scr, l_scr, acc_scr,
                              sk=sk, sv=sv, s8=s8)

        @pl.when((i + 1) * bk >= length)
        def _():
            out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
            o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("K", "block_size", "ctx_pad", "scale", "pages_per_chunk",
                     "seqs_per_step", "interpret", "s8"),
)
def tree_attention_v3(
    q: jnp.ndarray,             # [B, MQ, Hq, hd]
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd] (K/V interleaved)
    block_tables: jnp.ndarray,  # [B, M]
    context_lens: jnp.ndarray,  # [B]
    fan_idx_rows: jnp.ndarray,  # [B, MQ]
    step: jnp.ndarray,
    K: int,
    block_size: int,
    ctx_pad: int,
    scale: float,
    pages_per_chunk: int = 8,
    seqs_per_step: int = 8,
    interpret: bool = False,
    s8: bool = False,
) -> jnp.ndarray:
    """Batched-group double-buffered paged tree attention."""
    B, MQ, Hq, hd = q.shape
    int8 = isinstance(kv_layer, tuple)
    kv_data = kv_layer[0] if int8 else kv_layer
    Hkv = kv_data.shape[0]
    G = Hq // Hkv
    max_pages = max(1, ctx_pad // block_size)
    NB, C = _v3_geometry(kv_data, block_size, B, pages_per_chunk,
                         seqs_per_step, ctx_pad, rows=MQ * G)
    num_groups = pl.cdiv(B, NB)
    num_chunks = pl.cdiv(max_pages, C)
    bk = C * block_size

    qg = _regroup_q(q, Hkv)
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)
    fan3 = fan_idx_rows.astype(jnp.int32)[:, None, :]
    extra_in = []
    if int8:
        from ssd_tpu.ops.attention import gather_scales

        extra_in.append(gather_scales(kv_layer, block_tables, block_size,
                                      ctx_pad))
    if B % NB:
        pad = num_groups * NB - B
        qp = jnp.pad(qp, ((0, pad), (0, 0), (0, 0), (0, 0)))
        fan3 = jnp.pad(fan3, ((0, pad), (0, 0), (0, 0)))
        if int8:
            extra_in[0] = jnp.pad(
                extra_in[0], ((0, pad), (0, 0), (0, 0), (0, 0))
            )

    in_specs = [
        pl.BlockSpec(
            (NB, 1, MQ),
            lambda g, i, bt, ctx, st: (g, 0, 0),
        ),
        pl.BlockSpec(
            (NB, Hkv, MQ * G, 2 * hd),
            lambda g, i, bt, ctx, st: (g, 0, 0, 0),
        ),
    ]
    if int8:
        in_specs.append(pl.BlockSpec(
            (NB, Hkv, 2, bk), lambda g, i, bt, ctx, st: (g, 0, 0, i)
        ))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_groups, num_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (NB, Hkv, MQ * G, 2 * hd),
            lambda g, i, bt, ctx, st: (g, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((NB * Hkv, MQ * G, 1), jnp.float32),
            pltpu.VMEM((NB * Hkv, MQ * G, 1), jnp.float32),
            pltpu.VMEM((NB * Hkv, MQ * G, 2 * hd), jnp.float32),
            pltpu.VMEM((2, NB, Hkv, C, block_size, 2 * hd), kv_data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _tree_attn_v3_kernel_i8 if int8 else _tree_attn_v3_kernel,
        scale=scale, K=K, MQ=MQ, G=G, NB=NB, C=C,
        block_size=block_size, num_kv_heads=Hkv, s8=s8 and int8,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        jnp.atleast_1d(step).astype(jnp.int32),
        fan3,
        qp,
        *extra_in,
        kv_data,
    )
    return _ungroup_o(out[:B, ..., hd:], MQ)


def tree_attention_best(
    q, kv_layer, block_tables, context_lens, fan_idx_rows, step,
    K, block_size, ctx_pad, scale, interpret=None, s8=False,
):
    """Route to the pipelined manual-DMA tree kernels when their single-tile
    VMEM scratch fits (B>1: v3, NB sequences per grid step; B=1: v2); v1
    (page-per-grid-step) otherwise. interpret=None auto-selects interpret
    mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, MQ, Hq, hd = q.shape
    int8 = isinstance(kv_layer, tuple)
    Hkv = (kv_layer[0] if int8 else kv_layer).shape[0]
    G = Hq // Hkv
    if (Hkv * MQ * G <= 512 and ctx_pad % block_size == 0
            and (2 * hd) % 128 == 0):
        if B > 1 or int8:  # int8 is implemented in v3 (NB=1 covers B=1)
            return tree_attention_v3(
                q, kv_layer, block_tables, context_lens, fan_idx_rows, step,
                K, block_size, ctx_pad, scale, interpret=interpret, s8=s8,
            )
        return tree_attention_v2(
            q, kv_layer, block_tables, context_lens, fan_idx_rows, step,
            K, block_size, ctx_pad, scale, interpret=interpret,
        )
    if int8:
        from ssd_tpu.ops import attention as att_oracle

        return att_oracle.tree_attention(
            q, kv_layer, block_tables, context_lens, fan_idx_rows, step,
            K, block_size, ctx_pad, scale,
        )
    return tree_attention(
        q, kv_layer, block_tables, context_lens, fan_idx_rows, step,
        K, block_size, ctx_pad, scale, interpret=interpret,
    )


def _tree_attn_kernel(
    # scalar prefetch
    bt_ref,      # [B, M] int32
    ctx_ref,     # [B] int32 attended length at this step
    step_ref,    # [1] int32 tree depth s
    # blocks
    fan_ref,     # [1, 1, MQ] int32 glue depth per tree row (VMEM: Mosaic
                 #   only allows scalar loads from SMEM, so this is a tensor
                 #   input; 3D so the per-b block's minor-2 dims equal the
                 #   array's — tiling constraint at B > 1)
    q_ref,       # [1, 1, MQ*G, 2*hd] ([q | 0] padded)
    kv_ref,      # [1, BS, 2*hd]
    o_ref,       # [1, 1, MQ*G, 2*hd] (V half holds the result)
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

    kv = kv_ref[0]
    q = q_ref[0, 0]
    R = q.shape[0]  # MQ * G

    scores = jax.lax.dot_general(
        q, kv, (((1,), (1,)), ((), ())),
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
    fan_tbl = fan_ref[0, 0, :][None, :]                          # [1, MQ]
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

    _flash_update(scores, mask, kv, m_scr, l_scr, acc_scr)

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
    kv_layer: jnp.ndarray,      # [Hkv, S, 2*hd] (K/V interleaved)
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
    Hkv = kv_layer.shape[0]
    G = Hq // Hkv
    num_pages = max(1, ctx_pad // block_size)

    qg = _regroup_q(q, Hkv)
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)  # [q | 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, 1, num_pages),
        in_specs=[
            pl.BlockSpec(
                (1, 1, MQ),
                lambda b, h, t, p, bt, ctx, st: (b, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, MQ * G, 2 * hd),
                lambda b, h, t, p, bt, ctx, st: (b, h, 0, 0),
            ),
            # Same page-clamp trick as paged_attention: repeated block index
            # -> DMA skipped for pages past the true context.
            pl.BlockSpec(
                (1, block_size, 2 * hd),
                lambda b, h, t, p, bt, ctx, st: (
                    h,
                    jnp.maximum(
                        bt[b, jnp.minimum(p, jnp.maximum(ctx[b] - 1, 0) // block_size)],
                        0,
                    ),
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, MQ * G, 2 * hd),
            lambda b, h, t, p, bt, ctx, st: (b, h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((MQ * G, 1), jnp.float32),
            pltpu.VMEM((MQ * G, 1), jnp.float32),
            pltpu.VMEM((MQ * G, 2 * hd), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _tree_attn_kernel, scale=scale, K=K, MQ=MQ, G=G, block_size=block_size
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        jnp.atleast_1d(step).astype(jnp.int32),
        fan_idx_rows.astype(jnp.int32)[:, None, :],
        qp,
        kv_layer,
    )
    return _ungroup_o(out[..., hd:], MQ)


# ---------------------------------------------------------------------------
# Flat-packed ragged prefill kernel
# ---------------------------------------------------------------------------
#
# The grouped pow2-bucket prefill costs one DISPATCH per length bucket
# (~4.2 ms each over the tunneled runtime) plus <=2x pow2 padding per
# sequence. This kernel runs the WHOLE mixed-length batch as one program
# over a flat packed layout: all new tokens concatenated to [T_pad], every
# sequence's attended pages gathered into one contiguous run of a packed
# context stream [Cflat], and each token's attention window expressed as a
# half-open interval [row_lo, row_hi) of flat context indices — the interval
# encodes both the same-sequence restriction and causality, so the kernel
# mask is two compares (the TPU-native form of flash_attn_varlen_func's
# cu_seqlens contract, /root/reference/ssd/layers/attention.py:90-93).
# Per-(q-tile, kv-tile) work is skipped entirely outside
# [tile_lo, tile_hi) — scalar-prefetched per-tile interval hulls — so
# compute scales with sum(len_i * ctx_i), not the padded rectangle.


def _flat_prefill_kernel(
    # scalar prefetch
    tlo_ref,     # [nT] min row_lo per q-tile (flat ctx index)
    thi_ref,     # [nT] max row_hi per q-tile
    # blocks
    lo_ref,      # [1, TQ] per-row interval start
    hi_ref,      # [1, TQ] per-row interval end
    q_ref,       # [1, TQ, 2*hd] ([q | 0] padded rows of one kv head)
    kv_ref,      # [1, TK, 2*hd] packed context tile
    o_ref,       # [1, TQ, 2*hd]
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    TK: int,
):
    t, k = pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when((k * TK < thi_ref[t]) & ((k + 1) * TK > tlo_ref[t]))
    def _():
        kv = kv_ref[0]
        q = q_ref[0]
        scores = jax.lax.dot_general(
            q, kv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # [TQ, TK]
        col = k * TK + jax.lax.broadcasted_iota(jnp.int32, (1, TK), 1)
        lo = lo_ref[0][:, None]                              # [TQ, 1]
        hi = hi_ref[0][:, None]
        mask = (col >= lo) & (col < hi)
        _flash_update(scores, mask, kv, m_scr, l_scr, acc_scr)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "scale", "tq", "tk", "interpret"),
)
def flat_prefill_attention(
    q: jnp.ndarray,          # [T_pad, Hq, hd] flat new tokens
    kv_layer: jnp.ndarray,   # [Hkv, S, 2*hd] (paged, K/V interleaved)
    flat_pages: jnp.ndarray, # [P_pad] page ids, per-seq runs concatenated
    row_lo: jnp.ndarray,     # [T_pad] flat-context interval start per token
    row_hi: jnp.ndarray,     # [T_pad] interval end (padding rows: lo==hi==0)
    block_size: int,
    scale: float,
    tq: int = 1024,
    tk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-dispatch ragged prefill over the packed page stream (see module
    comment). Returns [T_pad, Hq, hd]; padding rows are zero.

    Tile defaults from the round-5 on-chip sweep at the 1B T=2048 geometry
    (bench/prefill_tile_sweep.py): tq/tk 1024/512 = 1.370 ms/call vs the
    round-2 default 512/512's 1.552 (tk=2048 exceeds the scoped VMEM)."""
    from ssd_tpu.ops.attention import dense_pages

    T, Hq, hd = q.shape
    Hkv = (kv_layer[0] if isinstance(kv_layer, tuple) else kv_layer).shape[0]
    G = Hq // Hkv
    TG = T * G
    # Pack the attended pages densely: one XLA page-granular gather (the
    # int8 cache dequantizes inside it — prefill is compute-bound).
    dense = dense_pages(kv_layer, flat_pages, block_size).astype(q.dtype)
    Cflat = dense.shape[1]

    TQ = min(tq, TG)
    while TG % TQ:
        TQ //= 2
    TK = min(tk, Cflat)
    while Cflat % TK:
        TK //= 2
    nT, nK = TG // TQ, Cflat // TK

    # Rows that share a kv head are grouped like the other kernels; the
    # per-ROW intervals are the per-token ones repeated G times, reordered
    # to (Hkv, T*G) so the block for (h, t) is rows [t*TQ, (t+1)*TQ).
    qg = _regroup_q(q[None], Hkv)[0]                         # [Hkv, TG, hd]
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)  # [q | 0]
    lo_rows = jnp.repeat(row_lo, G)[None]                    # [1, TG]
    hi_rows = jnp.repeat(row_hi, G)[None]
    # Per-q-tile interval hulls for the skip test (rows of ALL kv heads at
    # tile t are the same tokens, so one table serves every head).
    tlo = jnp.min(lo_rows.reshape(nT, TQ), axis=1)
    thi = jnp.max(hi_rows.reshape(nT, TQ), axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Hkv, nT, nK),
        in_specs=[
            pl.BlockSpec((1, TQ), lambda h, t, k, tlo, thi: (0, t)),
            pl.BlockSpec((1, TQ), lambda h, t, k, tlo, thi: (0, t)),
            pl.BlockSpec((1, TQ, 2 * hd),
                         lambda h, t, k, tlo, thi: (h, t, 0)),
            # Clamp the kv-tile index into the q-tile's needed range: tiles
            # outside repeat a neighbour's index, so their DMA is skipped
            # (the kernel also skips their flash update).
            pl.BlockSpec(
                (1, TK, 2 * hd),
                lambda h, t, k, tlo, thi: (
                    h,
                    jnp.clip(k, tlo[t] // TK,
                             jnp.maximum(thi[t] - 1, 0) // TK),
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec((1, TQ, 2 * hd),
                               lambda h, t, k, tlo, thi: (h, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 2 * hd), jnp.float32),
        ],
    )
    kernel = functools.partial(_flat_prefill_kernel, scale=scale, TK=TK)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, TG, 2 * hd), q.dtype),
        interpret=interpret,
    )(
        tlo.astype(jnp.int32),
        thi.astype(jnp.int32),
        lo_rows.astype(jnp.int32),
        hi_rows.astype(jnp.int32),
        qp,
        dense,
    )
    return _ungroup_o(out[None, ..., hd:], T)[0]
