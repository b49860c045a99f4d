"""Diagnostic decomposition of the v2 paged-attention kernel's grid-step cost.

The production kernel (`ssd_tpu/ops/pallas_attention.py::paged_attention_v2`)
sits ~8-10x off the HBM roofline at ctx 2048 and the residual is a per-grid-
step fixed cost (PERF.md). This bench runs STRIPPED variants of the same
pipeline to attribute that cost:

  full     — the production kernel body (DMA + flash reduce)
  dma      — DMA pipeline only: copies + waits, no compute at all
  compute  — flash reduce only on whatever is resident in VMEM (no DMA)
  empty    — grid + scalar bookkeeping only (no DMA, no compute)

  python -m bench.kernel_diag --ctx 2048 --batch 8 --block 256 --ppc 2

All variants share grid (B, num_chunks) and the scalar-prefetch signature so
Mosaic's per-step launch work is identical; differences isolate the stage.
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssd_tpu.ops.pallas_attention import (
    _regroup_q,
    _v2_copy_chunk,
    _v2_wait_chunk,
)


def _diag_kernel(
    bt_ref, ctx_ref, qeff_ref,
    q_ref, kv_hbm_ref, o_ref,
    m_scr, l_scr, acc_scr, kv_vmem, sems, buf_ref, init_ref,
    *, scale, G, C, block_size, num_kv_heads, do_dma, do_compute,
):
    b, i = pl.program_id(0), pl.program_id(1)
    B = pl.num_programs(0)
    bk = C * block_size
    hd2 = kv_vmem.shape[-1]
    length = jnp.maximum(ctx_ref[b], 1)

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

        if do_dma:
            @pl.when(init_ref[0] == 1)
            def _():
                for c in _v2_copy_chunk(kv_hbm_ref, kv_vmem.at[buf],
                                        sems.at[buf], bt_ref, b, i, C,
                                        block_size):
                    c.start()
        init_ref[0] = 0

        @pl.when(i == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -1e30)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        nb, ni = next_indices(b, i + 1)

        if do_dma:
            @pl.when(nb < B)
            def _():
                nxt = 1 - buf
                for c in _v2_copy_chunk(kv_hbm_ref, kv_vmem.at[nxt],
                                        sems.at[nxt], bt_ref, nb, ni, C,
                                        block_size):
                    c.start()
                buf_ref[0] = nxt

            _v2_wait_chunk(kv_hbm_ref, kv_vmem.at[buf], sems.at[buf], C,
                           block_size)

        if do_compute:
            QG = q_ref.shape[2]
            pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
            row = jax.lax.broadcasted_iota(jnp.int32, (1, QG, 1), 1)
            q_idx = row // G
            limit = length - qeff_ref[b] + q_idx
            mask = (pos <= limit) & (pos < length)

            kv3 = kv_vmem[buf].reshape(num_kv_heads, bk, hd2)
            q3 = q_ref[0]
            scores = jax.lax.dot_general(
                q3, kv3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale

            s3 = jnp.where(mask, scores, jnp.float32(-1e30))
            m_cur = jnp.max(s3, axis=2, keepdims=True)
            m_new = jnp.maximum(m_scr[:], m_cur)
            p = jnp.where(mask, jnp.exp(s3 - m_new), 0.0)
            alpha = jnp.exp(m_scr[:] - m_new)
            l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=2, keepdims=True)
            acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
                p.astype(kv3.dtype), kv3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            m_scr[:] = m_new

        @pl.when((i + 1) * bk >= length)
        def _():
            out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
            o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "ctx_pad", "scale", "ppc", "do_dma",
                     "do_compute", "interpret"),
)
def diag_attention(q, kv_layer, block_tables, context_lens, qeff,
                   block_size, ctx_pad, scale, ppc, do_dma, do_compute,
                   interpret=False):
    B, Q, Hq, hd = q.shape
    Hkv = kv_layer.shape[0]
    G = Hq // Hkv
    QG = Q * G
    max_pages = max(1, ctx_pad // block_size)
    C = min(ppc, max_pages)
    num_chunks = pl.cdiv(max_pages, C)

    qg = _regroup_q(q, Hkv)
    qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, num_chunks),
        in_specs=[
            pl.BlockSpec((1, Hkv, QG, 2 * hd),
                         lambda b, i, bt, ctx, qe: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hkv, QG, 2 * hd),
                               lambda b, i, bt, ctx, qe: (b, 0, 0, 0)),
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
        _diag_kernel, scale=scale, G=G, C=C, block_size=block_size,
        num_kv_heads=Hkv, do_dma=do_dma, do_compute=do_compute,
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        qeff.astype(jnp.int32),
        qp,
        kv_layer,
    )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--q", type=int, default=1)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--kv-heads", type=int, default=8)
    p.add_argument("--hd", type=int, default=64)
    p.add_argument("--block", type=int, default=256)
    p.add_argument("--ppc", type=int, default=2)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--variants", default="full,dma,compute,empty")
    args = p.parse_args()

    B, Q, Hq, Hkv, hd = args.batch, args.q, args.heads, args.kv_heads, args.hd
    bs, ctx = args.block, args.ctx
    M = ctx // bs
    S = B * ctx + bs
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.normal(size=(Hkv, S, 2 * hd)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, Q, Hq, hd)), jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(B * M).reshape(B, M).astype(np.int32) + 1)
    ctx_lens = jnp.full((B,), ctx, jnp.int32)
    qeff = jnp.full((B,), Q, jnp.int32)
    scale = hd ** -0.5
    interp = jax.default_backend() != "tpu"

    flags = {"full": (True, True), "dma": (True, False),
             "compute": (False, True), "empty": (False, False),
             "glue": None}  # wrapper XLA ops only, no pallas_call at all
    kv_bytes = 2 * B * ctx * Hkv * hd * 2
    steps = B * ((M + args.ppc - 1) // args.ppc)
    print(f"devices: {jax.devices()}  grid steps/call: {steps}", flush=True)
    from ssd_tpu.ops.pallas_attention import _regroup_q as regroup

    for name in args.variants.split(","):
        n = Q * Hq * hd  # chain through q to defeat CSE (Hkv*QG*2hd == 2n)
        if name == "glue":
            # The wrapper's XLA ops alone (regroup + [q|0] pad + slice):
            # isolates surrounding-glue cost from the pallas_call itself.
            def body(qq):
                qg = regroup(qq, Hkv)
                qp = jnp.concatenate([qg, jnp.zeros_like(qg)], axis=-1)
                return (qp + kv[0, 0, 0]).reshape(B, -1)[:, :n].reshape(
                    B, Q, Hq, hd)
        else:
            do_dma, do_compute = flags[name]
            body = lambda qq: diag_attention(
                qq, kv, bt, ctx_lens, qeff, bs, ctx, scale, args.ppc,
                do_dma, do_compute, interpret=interp,
            ).reshape(B, -1)[:, :n].reshape(B, Q, Hq, hd)
        fn = jax.jit(lambda qq: jax.lax.fori_loop(
            0, args.iters, lambda i, acc: body(acc).astype(acc.dtype), qq))
        np.asarray(fn(q))  # compile + sync
        best = float("inf")
        for _ in range(3):  # min-of-3: the tunneled dispatch+readback cost
            t0 = time.perf_counter()  # varies run to run and only shrinks dt
            np.asarray(fn(q))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        dt = best
        print(f"[{name:7s}] {dt*1e3:.3f} ms/call  {dt*1e6/steps:.2f} us/step  "
              f"{kv_bytes/dt/1e9:.1f} GB/s-equiv", flush=True)


if __name__ == "__main__":
    main()
