"""Fused-async superstep cost decomposition: where does a round's time go?

Per round async_ssd_superstep (engine/async_fused.py) runs the draft's
glue + K-step tree build (5 draft forwards at MQ_LEN-wide queries, plus the
top-F fork selection over [B, K+1, V]), the target's K+1-query verify
forward + verify() math, and the in-program cache service (match + two
gathers). The byte budget per round is

    (K+1) * draft_bytes + target_bytes

— the same as sync fused SD (same forward count; the tree's extra cost is
query width, fork top-k, and the [B*MQ, K, V] tree-logits materialisation).
This tool times on-chip:

    full     the production async_ssd_superstep (R rounds)
    build    R rounds of glue+fork+tree alone (fixed glue ids)
    verify   R rounds of the target verify forward + verify() alone
    fork     R x get_forked_recovery_tokens on materialised glue logits
    sync     the sync sd_superstep at the same K/R (the comparison floor)

  python -m bench.fasync_diag --k 4 --rounds 32 --reps 3
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
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--f", type=int, default=2)
    p.add_argument("--rounds", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--ctx-pad", type=int, default=2048)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--tiny", action="store_true", help="CPU smoke geometry")
    p.add_argument("--peak-gbs", type=float, default=819.0)
    p.add_argument("--variants", nargs="+",
                   default=["full", "build", "verify", "fork", "sync"])
    args = p.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.async_fused import async_ssd_superstep
    from ssd_tpu.engine.draft_runner import tree_build_program
    from ssd_tpu.engine.fused_sd import sd_superstep
    from ssd_tpu.engine.model_runner import decode_step, slot_of
    from ssd_tpu.models.transformer import Arch, init_params
    from ssd_tpu.ops.spec_math import get_forked_recovery_tokens
    from ssd_tpu.ops.verify import verify

    if args.tiny:
        base = dict(model_type="llama", vocab_size=512, hidden_size=128,
                    intermediate_size=256, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=32,
                    max_position_embeddings=4096, rope_theta=500000.0,
                    rms_norm_eps=1e-5)
        Lt, Ld = 2, 1
    else:
        base = dict(model_type="llama", vocab_size=128256, hidden_size=2048,
                    intermediate_size=8192, num_attention_heads=32,
                    num_key_value_heads=8, head_dim=64,
                    max_position_embeddings=4096, rope_theta=500000.0,
                    rms_norm_eps=1e-5)
        Lt, Ld = 16, 4
    t_arch = Arch.from_model_config(ModelConfig(num_hidden_layers=Lt, **base))
    d_arch = Arch.from_model_config(ModelConfig(num_hidden_layers=Ld, **base))
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    use_pallas = jax.default_backend() == "tpu"
    t_params = init_params(t_arch, jax.random.PRNGKey(0), dtype)
    d_params = init_params(d_arch, jax.random.PRNGKey(1), dtype)

    K, R, F, B = args.k, args.rounds, args.f, args.batch
    fan = (F,) * (K + 1)
    MQ = sum(fan)
    bs = 64
    n_blocks = args.ctx_pad // bs + 8
    M = n_blocks

    def fresh_kv(arch):
        return jnp.zeros((arch.num_layers, arch.num_kv_heads, n_blocks * bs,
                          2 * arch.head_dim), dtype)

    rec0 = jnp.full((B,), 7, jnp.int32)
    n0 = jnp.full((B,), 128, jnp.int32)
    bt = jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (B, 1))
    temps = jnp.zeros(B, jnp.float32)
    key = jax.random.PRNGKey(5)
    V = t_arch.vocab_size

    sup_kw = dict(t_arch=t_arch, d_arch=d_arch, block_size=bs,
                  ctx_pad_t=args.ctx_pad, ctx_pad_d=args.ctx_pad, K=K,
                  use_pallas=use_pallas)

    def run_full():
        out = async_ssd_superstep(
            t_params, fresh_kv(t_arch), d_params, fresh_kv(d_arch),
            rec0, n0, bt, bt, temps, temps, key,
            MQ_LEN=MQ, R=R, fan_out_list=fan, fan_out_list_miss=fan,
            sampler_x=None, F=F, **sup_kw)
        return out[1]

    def run_sync():
        out = sd_superstep(
            t_params, fresh_kv(t_arch), d_params, fresh_kv(d_arch),
            rec0, n0, bt, bt, temps, temps, key, R=R,
            **{k: v for k, v in sup_kw.items()})
        return out[1]

    @jax.jit
    def run_build(d_p, dkv):
        glue = jnp.tile(jnp.arange(K + 1, dtype=jnp.int32)[None], (B, 1))

        def body(carry, r):
            dkv, n = carry
            host_out, spec_logits, _, dkv = tree_build_program(
                d_p, dkv, glue.reshape(-1), n, bt,
                jnp.ones(B, jnp.int32), temps, None, None,
                jax.random.fold_in(key, r),
                arch=d_arch, block_size=bs, ctx_pad=args.ctx_pad, K=K,
                MQ_LEN=MQ, fan_out_list=fan, fan_out_list_miss=fan,
                sampler_x=None, F=F, use_pallas=use_pallas)
            return (dkv, n + K + 1), host_out[:B]

        (_, _), outs = jax.lax.scan(body, (dkv, n0), jnp.arange(R))
        return outs

    @jax.jit
    def run_verify(t_p, tkv):
        spec = jnp.tile(jnp.arange(K + 1, dtype=jnp.int32)[None], (B, 1))
        logits_q = jnp.zeros((B, K, V), jnp.float32)
        b_idx = jnp.arange(B)

        def body(carry, r):
            tkv, n = carry
            pos = (n[:, None] + jnp.arange(K + 1)[None, :]).reshape(-1)
            slots = slot_of(bt, pos, jnp.repeat(b_idx, K + 1), bs)
            _, logits_p, _, tkv = decode_step(
                t_p, tkv, spec.reshape(-1), pos.astype(jnp.int32),
                slots, bt, (n + K + 1).astype(jnp.int32), temps,
                jax.random.fold_in(key, r),
                arch=t_arch, block_size=bs, ctx_pad=args.ctx_pad,
                q_len=K + 1, use_pallas=use_pallas)
            acc, recovery = verify(
                logits_p.reshape(B, K + 1, V), logits_q, spec, temps, temps,
                jnp.ones(B, jnp.int32), jax.random.fold_in(key, r + R))
            return (tkv, n + acc + 1), (acc, recovery)

        (_, _), outs = jax.lax.scan(body, (tkv, n0), jnp.arange(R))
        return outs

    @jax.jit
    def run_fork(glue_logits):
        returned = jnp.tile(jnp.arange(K + 1, dtype=jnp.int32)[None], (B, 1))

        def body(carry, r):
            forks = get_forked_recovery_tokens(
                carry, jnp.ones(B, jnp.int32), returned, list(fan), list(fan))
            carry = carry + forks.sum().astype(carry.dtype) * 1e-9
            return carry, forks

        _, outs = jax.lax.scan(body, glue_logits, jnp.arange(R))
        return outs

    def param_bytes(p):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(p))

    t_bytes, d_bytes = param_bytes(t_params), param_bytes(d_params)
    budget = {"full": (K + 1) * d_bytes + t_bytes,
              "sync": (K + 1) * d_bytes + t_bytes,
              "build": (K + 1) * d_bytes, "verify": t_bytes, "fork": 0}
    glue_logits0 = jax.random.normal(key, (B, K + 1, V), jnp.float32)
    runners = {
        "full": run_full, "sync": run_sync,
        "build": lambda: run_build(d_params, fresh_kv(d_arch)),
        "verify": lambda: run_verify(t_params, fresh_kv(t_arch)),
        "fork": lambda: run_fork(glue_logits0),
    }

    print(f"target {t_bytes/1e9:.2f} GB ({Lt}L), draft {d_bytes/1e9:.2f} GB "
          f"({Ld}L), K={K} F={F} MQ={MQ} R={R} B={B} "
          f"ctx_pad={args.ctx_pad}", flush=True)
    results = {}
    for name in args.variants:
        fn = runners[name]
        np.asarray(fn())  # compile + sync
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        ms_round = best * 1e3 / R
        results[name] = round(ms_round, 3)
        line = f"[{name:6s}] {ms_round:7.3f} ms/round"
        if budget[name]:
            gbs = budget[name] / (best / R) / 1e9
            line += (f"  {gbs:6.1f} GB/s vs {budget[name]/1e9:.2f} GB/round "
                     f"({100*gbs/args.peak_gbs:.0f}% of peak)")
        print(line, flush=True)
    if all(k in results for k in ("full", "build", "verify")):
        resid = results["full"] - results["build"] - results["verify"]
        print(json.dumps({"metric": "fasync_round_ms", **results,
                          "residual_ms": round(resid, 3)}))


if __name__ == "__main__":
    main()
