"""Kernel roofline bench: achieved HBM bandwidth of the paged-attention
kernels vs the chip's peak (BASELINE.md gate 3: "speed-of-light per chip").

Small-batch decode attention is bandwidth-bound: per step it must read the
attended KV (2 * ctx * Hkv * hd * dtype bytes per sequence per layer-call)
and the query tiles. We time the standalone kernel over many chained
dispatches with a data readback (block_until_ready is unreliable over
tunneled runtimes) and report GB/s and % of peak.

  python -m bench.kernel_bench --ctx 2048 --batch 8 --heads 8 --kv-heads 8 \
      --hd 128 --block 256 --peak-gbs 819
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def parse_arguments():
    p = argparse.ArgumentParser(description="Paged attention kernel roofline")
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--q", type=int, default=1, help="queries per seq (1=decode, K+1=verify)")
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--kv-heads", type=int, default=8)
    p.add_argument("--hd", type=int, default=128)
    p.add_argument("--block", type=int, default=256)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--kv-quant", choices=["int8", "int8_mxu"], default=None,
                   help="int8 KV cache: kernels DMA int8 pages and dequant "
                        "in-register (ops/attention.py layout); int8_mxu "
                        "runs native s8 x s8 MXU dots instead of the cast")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="HBM peak GB/s (v5e=819, v5p=2765, v4=1228)")
    p.add_argument("--impl",
                   choices=["pallas", "pallas2", "pallas3", "prefill", "jnp",
                            "tree", "tree2", "tree3", "treejnp", "both",
                            "all"],
                   default="both")
    p.add_argument("--mq", type=int, default=8,
                   help="tree rows per sequence for the tree kernels")
    p.add_argument("--k", type=int, default=3,
                   help="speculation depth K for the tree kernels")
    p.add_argument("--nb", type=int, default=8,
                   help="sequences per grid step for the v3 kernel")
    p.add_argument("--reps", type=int, default=3,
                   help="timing repetitions (min is reported: tunnel "
                        "dispatch noise only inflates)")
    p.add_argument("--ppc", type=int, default=8,
                   help="pages per chunk for the v2 kernel")
    p.add_argument("--inloop", action="store_true",
                   help="chain iters inside ONE program (lax.fori_loop) so "
                        "per-iter time is pure device time, free of "
                        "per-dispatch host/tunnel overhead")
    p.add_argument("--raw", action="store_true",
                   help="pallas3 only: chain the kernel on the pre-grouped "
                        "[q|0]-padded layout, skipping the regroup/pad XLA "
                        "glue per iteration (the glue fuses into the "
                        "surrounding projections in production, so this is "
                        "the kernel-proper cost)")
    return p.parse_args()


def run_impl(impl, args):
    from ssd_tpu.ops import attention as att
    from ssd_tpu.ops import pallas_attention as patt

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, Q, Hq, Hkv, hd = args.batch, args.q, args.heads, args.kv_heads, args.hd
    bs, ctx = args.block, args.ctx
    M = ctx // bs
    S = B * ctx + bs
    rng = np.random.default_rng(0)
    # Generate the big operands ON the device: at ctx 16384 the KV pool is
    # ~269 MB, which the tunneled runtime's HTTP transfer rejects (413) if
    # materialized on the host and shipped.
    kv_key, q_key, qt_key = jax.random.split(jax.random.PRNGKey(0), 3)
    if args.kv_quant in ("int8", "int8_mxu"):
        kv = (
            jax.random.randint(kv_key, (Hkv, S, 2 * hd), -127, 128, jnp.int8),
            jax.random.uniform(kv_key, (Hkv, 2, S), jnp.float32, 0.005, 0.02),
        )
    else:
        kv = jax.random.normal(kv_key, (Hkv, S, 2 * hd), dt)
    q = jax.random.normal(q_key, (B, Q, Hq, hd), dt)
    bt = jnp.asarray(
        rng.permutation(B * M).reshape(B, M).astype(np.int32) + 1
    )
    ctx_lens = jnp.full((B,), ctx, jnp.int32)
    qeff = jnp.full((B,), Q, jnp.int32)
    scale = hd ** -0.5

    interp = jax.default_backend() != "tpu"  # CPU: interpret mode only
    if impl == "pallas":
        body = lambda qq: patt.paged_attention(
            qq, kv, bt, ctx_lens, qeff, bs, ctx, scale, interpret=interp)
    elif impl == "pallas2":
        body = lambda qq: patt.paged_attention_v2(
            qq, kv, bt, ctx_lens, qeff, bs, ctx, scale,
            pages_per_chunk=args.ppc, interpret=interp)
    elif impl == "pallas3" and args.raw:
        G = Hq // Hkv
        qg0 = patt._regroup_q(q, Hkv)
        qp0 = jnp.concatenate([qg0, jnp.zeros_like(qg0)], axis=-1)  # [q | 0]
        nb_eff, _ = patt._v3_geometry(
            kv[0] if isinstance(kv, tuple) else kv, bs, B, args.ppc,
            args.nb, ctx, rows=Q * G)
        if B % nb_eff:  # the core's BlockSpec needs B padded to NB groups
            pad = -B % nb_eff
            qp0 = jnp.pad(qp0, ((0, pad), (0, 0), (0, 0), (0, 0)))
        body_p = lambda qp: patt.paged_attention_v3_padded(
            qp, kv, bt, ctx_lens, qeff, G, bs, ctx, scale,
            pages_per_chunk=args.ppc, seqs_per_step=args.nb,
            interpret=interp, s8=args.kv_quant == "int8_mxu")
    elif impl == "pallas3":
        body = lambda qq: patt.paged_attention_v3(
            qq, kv, bt, ctx_lens, qeff, bs, ctx, scale,
            pages_per_chunk=args.ppc, seqs_per_step=args.nb,
            interpret=interp, s8=args.kv_quant == "int8_mxu")
    elif impl == "prefill":
        body = lambda qq: patt.paged_attention_prefill(
            qq, kv, bt, ctx_lens, qeff, bs, ctx, scale, interpret=interp)
    elif impl in ("tree", "tree2", "tree3", "treejnp"):
        # Tree shapes: Q rows are MQ tree forks at depth `step`; the mask is
        # (prefix | glue-ancestors | own column). ctx must cover the glue +
        # (step+1)*MQ tree slots.
        K, MQ = args.k, args.mq
        step = jnp.int32(K - 1)
        fan = jnp.asarray(
            np.tile(np.repeat(np.arange(K + 1), max(1, MQ // (K + 1)))[:MQ],
                    (B, 1)), jnp.int32)
        qt = jax.random.normal(qt_key, (B, MQ, Hq, hd), dt)
        if impl == "tree":
            body = lambda qq: patt.tree_attention(
                qq, kv, bt, ctx_lens, fan, step, K, bs, ctx, scale,
                interpret=interp)
        elif impl == "tree2":
            body = lambda qq: patt.tree_attention_v2(
                qq, kv, bt, ctx_lens, fan, step, K, bs, ctx, scale,
                interpret=interp)
        elif impl == "tree3":
            body = lambda qq: patt.tree_attention_v3(
                qq, kv, bt, ctx_lens, fan, step, K, bs, ctx, scale,
                seqs_per_step=args.nb, interpret=interp,
                s8=args.kv_quant == "int8_mxu")
        else:
            body = lambda qq: att.tree_attention(
                qq, kv, bt, ctx_lens, fan, step, K, bs, ctx, scale)
        q = qt  # the timed chain carries the tree-shaped queries
    else:
        body = lambda qq: att.paged_attention(
            qq, kv, bt, ctx_lens, bs, ctx, scale)

    if impl == "pallas3" and args.raw:
        # Raw mode: chain the padded-layout kernel directly — zero glue
        # between iterations, always in-loop.
        fn = jax.jit(lambda qp: jax.lax.fori_loop(
            0, args.iters, lambda i, acc: body_p(acc).astype(acc.dtype), qp0))
        np.asarray(fn(qp0))  # compile + sync
        dt_s = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(qp0))
            dt_s = min(dt_s, (time.perf_counter() - t0) / args.iters)
    elif args.inloop:
        # One dispatch, iters kernel invocations chained through q: measures
        # pure device time (the per-dispatch host/tunnel overhead is paid
        # once and subtracted out by the division).
        fn = jax.jit(lambda qq: jax.lax.fori_loop(
            0, args.iters, lambda i, acc: body(acc).astype(acc.dtype), qq))
        np.asarray(fn(q))  # compile + sync
        dt_s = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(q))
            dt_s = min(dt_s, (time.perf_counter() - t0) / args.iters)
    else:
        fn = jax.jit(body)
        np.asarray(fn(q))  # compile + sync
        dt_s = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = q
            for _ in range(args.iters):
                out = fn(out[:, :, :, :])  # chain via q to defeat CSE
            np.asarray(out)
            dt_s = min(dt_s, (time.perf_counter() - t0) / args.iters)

    itemsize = 2 if args.dtype == "bf16" else 4
    rows = args.mq if impl in ("tree", "tree2", "tree3", "treejnp") else Q
    kv_itemsize = 1 if args.kv_quant in ("int8", "int8_mxu") else itemsize
    scale_bytes = (
        # per-position f32 k/v scales: read once by the XLA gather and once
        # (gathered) by the kernel.
        2 * (2 * B * ctx * Hkv * 4) if args.kv_quant else 0
    )
    bytes_moved = (
        2 * B * ctx * Hkv * hd * kv_itemsize       # K+V read
        + 2 * B * rows * Hq * hd * itemsize        # q read + o write
        + scale_bytes
    )
    gbs = bytes_moved / dt_s / 1e9
    print(
        f"[{impl}{'' if impl != 'pallas2' else ':ppc' + str(args.ppc)}] "
        f"B={B} Q={Q} ctx={ctx} Hq/Hkv={Hq}/{Hkv} hd={hd} "
        f"{args.dtype}: {dt_s*1e3:.3f} ms, {gbs:.1f} GB/s "
        f"({100*gbs/args.peak_gbs:.1f}% of {args.peak_gbs:.0f} GB/s peak)",
        flush=True,
    )
    return gbs


def main():
    args = parse_arguments()
    print(f"devices: {jax.devices()}", flush=True)
    impls = {"both": ["pallas", "jnp"],
             "all": ["pallas", "pallas2", "pallas3", "prefill", "jnp",
                     "tree", "tree2", "tree3", "treejnp"]}.get(
        args.impl, [args.impl])
    for impl in impls:
        run_impl(impl, args)


if __name__ == "__main__":
    main()
