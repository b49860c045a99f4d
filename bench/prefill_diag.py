"""Prefill cost decomposition: where does the 2k-token TTFT go?

(r4 VERDICT item 3: decode got kernel-level roofline decompositions; the
76 ms TTFT at 2k tokens implies ~34% of the v5e MXU peak and nobody knew
which component ate the rest.)

Times R repetitions (one dispatch each variant, min-of-reps on-chip) of:

    full       the production flat-prefill program body
               (model_runner.flat_prefill_step: embed -> L x (norms, rope,
               qkv/o, flash prefill kernel, KV store, MLP) -> LM head gather
               -> sample)
    no_kernel  same, attention kernel replaced by identity (KV store kept)
    no_attn    same, kernel AND KV store skipped
    matmul     the pure stacked-matmul floor: qkv/o + MLP einsums only, no
               norms/rope/embed/head — the MXU speed-of-light for the
               model's FLOPs
    head       LM-head gather + sample alone ([B, D] @ [D, V])

so  kernel = full - no_kernel,  kv_store = no_kernel - no_attn,
    overhead (norms/rope/embed/sampler/scan glue) = no_attn - matmul - head
are measured, not guessed. Reports achieved TFLOP/s vs the bf16 MXU peak.

  python -m bench.prefill_diag --t 2048 --reps 5
  python -m bench.prefill_diag --tiny     # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=2048, help="prompt tokens")
    p.add_argument("--r", type=int, default=8, help="prefills per dispatch")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--tiny", action="store_true", help="CPU smoke geometry")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 MXU peak (v5e: 197 TFLOP/s)")
    p.add_argument("--variants", nargs="+",
                   default=["full", "no_kernel", "no_attn"])
    args = p.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.model_runner import flat_prefill_step
    from ssd_tpu.models.transformer import (
        Arch,
        compute_logits,
        forward_hidden,
        init_params,
    )
    from ssd_tpu.ops import attention as att
    from ssd_tpu.ops.layers import silu_mul
    from ssd_tpu.ops.sampler import sample

    if args.tiny:
        base = dict(model_type="llama", vocab_size=512, hidden_size=128,
                    intermediate_size=256, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2, head_dim=32,
                    max_position_embeddings=4096, rope_theta=500000.0,
                    rms_norm_eps=1e-5)
        args.t = min(args.t, 128)
    else:
        base = dict(model_type="llama", vocab_size=128256, hidden_size=2048,
                    intermediate_size=8192, num_hidden_layers=16,
                    num_attention_heads=32, num_key_value_heads=8,
                    head_dim=64, max_position_embeddings=4096,
                    rope_theta=500000.0, rms_norm_eps=1e-5)
    arch = Arch.from_model_config(ModelConfig(**base))
    dtype = jnp.bfloat16 if not args.tiny else jnp.float32
    params = init_params(arch, jax.random.PRNGKey(0), dtype)
    use_pallas = jax.default_backend() == "tpu"

    T, bs = args.t, 64
    n_pages = T // bs
    num_blocks = n_pages + 8
    kv0 = jnp.zeros((arch.num_layers, arch.num_kv_heads, num_blocks * bs,
                     2 * arch.head_dim), dtype)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        10, arch.vocab_size - 1, T).astype(np.int32))
    pos = jnp.arange(T, dtype=jnp.int32)
    slots = jnp.arange(T, dtype=jnp.int32)
    pages = jnp.arange(n_pages, dtype=jnp.int32)
    row_lo = jnp.zeros(T, jnp.int32)
    row_hi = pos + 1
    gather_idx = jnp.asarray([T - 1], jnp.int32)
    temps = jnp.ones(1, jnp.float32)
    scale = arch.head_dim ** -0.5
    R = args.r

    # --- variant bodies (each: one whole prefill; scanned R times).
    # params travel as a jit ARGUMENT (closing over them bakes the full
    # 2.5 GB of weights into the program as constants). ---

    def _make_body(name, p):
        # Every iteration must be GENUINELY different: with fixed inputs and
        # an untouched kv carry, the stripped variants' whole forward is
        # loop-invariant and XLA hoists it OUT of the R-scan (measured "639
        # TFLOP/s"). Rotating the token ids per iteration defeats hoisting
        # at zero cost to the byte/FLOP accounting.
        def ids_at(i):
            return (ids + i) % arch.vocab_size

        def body_full(kv, i, key):
            toks, _, kv = flat_prefill_step(
                p, kv, ids_at(i), pos, slots, pages, row_lo, row_hi,
                gather_idx, temps, key,
                arch=arch, block_size=bs, use_pallas=use_pallas,
            )
            return kv, toks

        def _stripped(kv, i, key, keep_store):
            def attn_call(q, k, v, kv_layer):
                if keep_store:
                    kv_layer = att.store_kv(kv_layer, k, v, slots)
                return q, kv_layer

            hidden, kv = forward_hidden(p, kv, ids_at(i), pos, attn_call,
                                        arch)
            logits = compute_logits(p, hidden, arch, gather_idx=gather_idx)
            # With identity attention the graph is ROW-WISE, so a
            # last-row-only output lets XLA slice the whole network down to
            # one token (measured "256 TFLOP/s"); summing hidden keeps every
            # row live at negligible cost.
            return kv, (sample(logits, temps, key),
                        hidden.astype(jnp.float32).sum())

        def body_matmul(x, i, key):
            # Pure projection/MLP chain over the stacked layers — the matmul
            # floor at the same shapes (carry the [T, D] activations so XLA
            # cannot dead-code any layer).
            def layer(h, lp):
                q = h @ lp["wq"]
                k = h @ lp["wk"]
                v = h @ lp["wv"]
                o = (q + jnp.pad(k, ((0, 0), (0, q.shape[1] - k.shape[1])))
                     + jnp.pad(v, ((0, 0), (0, q.shape[1] - v.shape[1]))))
                h = o @ lp["wo"]
                h = silu_mul(h @ lp["gate"], h @ lp["up"]) @ lp["down"]
                return h, None

            x, _ = jax.lax.scan(layer, x + i * 1e-6, p["layers"])
            return x, x[0, :1]

        def body_head(h, i, key):
            logits = compute_logits(p, h + i * 1e-6, arch,
                                    gather_idx=gather_idx)
            return h, sample(logits, temps, key)

        return {"full": body_full,
                "no_kernel": lambda kv, i, key: _stripped(kv, i, key, True),
                "no_attn": lambda kv, i, key: _stripped(kv, i, key, False),
                "matmul": body_matmul, "head": body_head}[name]

    @partial(jax.jit, static_argnames=("name",), donate_argnames=("carry0",))
    def run_R(p, carry0, key, *, name):
        body = _make_body(name, p)

        def step(c, i):
            c, out = body(c, i, jax.random.fold_in(key, i))
            return c, out

        carry, outs = jax.lax.scan(step, carry0, jnp.arange(R))
        # Return a probe of the final carry: without it XLA dead-code
        # eliminates the KV-store chain AND the k/v projections feeding it
        # in the stripped variants (measured: "118% of MXU peak").
        return outs, carry.reshape(-1)[:2]

    def carry_for(name):
        if name == "matmul":
            return jnp.asarray(np.random.default_rng(1).standard_normal(
                (T, arch.hidden_size)) * 0.02, dtype)
        if name == "head":
            return jnp.asarray(np.random.default_rng(1).standard_normal(
                (T, arch.hidden_size)) * 0.02, dtype)
        return kv0

    # FLOPs per prefill (matmuls only; attention matmuls counted separately).
    D, I, L = arch.hidden_size, arch.intermediate_size, arch.num_layers
    proj = D * (arch.num_heads * arch.head_dim * 2
                + arch.num_kv_heads * arch.head_dim * 2)
    mlp = 3 * D * I
    flops_layers = 2 * T * L * (proj + mlp)
    flops_head = 2 * 1 * D * arch.vocab_size
    # Causal flash attention: 2 matmuls of ~T^2/2 * hd per head.
    flops_attn = 2 * L * arch.num_heads * (T * T) * arch.head_dim
    flops = {"full": flops_layers + flops_head + flops_attn,
             "no_kernel": flops_layers + flops_head,
             "no_attn": flops_layers + flops_head,
             "matmul": flops_layers, "head": flops_head}

    results = {}
    for name in args.variants:
        key = jax.random.PRNGKey(3)
        np.asarray(run_R(params, carry_for(name), key, name=name)[1])  # compile+sync
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            # The tiny carry probe is the readback: it completes only after
            # the whole executable (tunnel discipline: np.asarray, not
            # block_until_ready).
            np.asarray(run_R(params, carry_for(name), key, name=name)[1])
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / R
        tf = flops[name] / (best / R) / 1e12
        results[name] = round(ms, 3)
        print(f"[{name:9s}] {ms:8.3f} ms/prefill  {tf:6.1f} TFLOP/s "
              f"({100 * tf / args.peak_tflops:.0f}% of MXU peak)", flush=True)

    out = {"metric": "prefill_decomposition_ms", "t": T, **results}
    floor_ms = flops["no_attn"] / (args.peak_tflops * 1e12) * 1e3
    out["matmul_floor_ms"] = round(floor_ms, 3)
    if all(k in results for k in ("full", "no_kernel", "no_attn")):
        out["kernel_ms"] = round(results["full"] - results["no_kernel"], 3)
        out["kv_store_ms"] = round(
            results["no_kernel"] - results["no_attn"], 3)
        # Norms/rope/embed/sampler/scan glue + MXU inefficiency, vs the
        # speed-of-light for the projection/MLP/head FLOPs.
        out["non_matmul_ms"] = round(results["no_attn"] - floor_ms, 3)
        out["mxu_pct_full"] = round(
            100 * flops["full"] / (results["full"] / 1e3) / 1e12
            / args.peak_tflops, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
