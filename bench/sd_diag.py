"""Fused-SD superstep cost decomposition: where does a round's time go?

Per round the superstep (engine/fused_sd.py) runs K+1 draft forwards (K chain
steps + the extra_write that persists the K-th token's KV) and one K+1-query
target verify forward. With the bench's quarter-cost draft construction the
byte budget per round is

    (K+1) * draft_bytes + target_bytes

where draft_bytes INCLUDES the full-vocab LM head (tied embeddings: the head
is ~0.52 GB of the 1B draft's ~1.01 GB — the chain pays it every step to
sample one token). This tool times three on-chip programs —

    full    the production sd_superstep (R rounds)
    draft   R rounds of the draft chain alone
    verify  R rounds of the target verify forward alone

— and reports ms/round plus the implied bandwidth against the byte budget, so
the residual (full - draft - verify = verify() math + sampler + scan glue) is
measured rather than guessed.

  python -m bench.sd_diag --k 4 --rounds 32 --reps 3
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def _param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--rounds", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--ctx-pad", type=int, default=2048)
    p.add_argument("--variants", nargs="+",
                   default=["full", "draft", "verify"])
    p.add_argument("--tiny", action="store_true", help="CPU smoke geometry")
    p.add_argument("--peak-gbs", type=float, default=819.0)
    p.add_argument("--eagle", action="store_true",
                   help="decompose the fused EAGLE superstep instead: the "
                        "1-layer conditioned draft chain (K+1 steps incl. "
                        "extra write) + the verify-with-taps forward")
    args = p.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.fused_sd import sd_superstep
    from ssd_tpu.engine.model_runner import chain_decode_step, decode_step, slot_of
    from ssd_tpu.models.transformer import Arch, init_params

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

    dt = jnp.bfloat16
    t_params = init_params(t_arch, jax.random.PRNGKey(0), dt)
    if args.eagle:
        from ssd_tpu.models.eagle3 import EagleArch, init_eagle_params

        d_arch = EagleArch.from_model_config(
            ModelConfig(num_hidden_layers=Lt, **base),
            d_model_target=base["hidden_size"], num_eagle_layers=3,
        )
        d_params = init_eagle_params(d_arch, jax.random.PRNGKey(1), dt)
        # Per chain step the draft STREAMS its layer + head; the embedding is
        # a row gather and fc runs once per round on the cond vector.
        d_stream = _param_bytes(
            {k: v for k, v in d_params.items() if k not in ("embed", "fc")}
        )
    else:
        d_params = init_params(d_arch, jax.random.PRNGKey(1), dt)
        d_stream = _param_bytes(d_params)
    t_bytes, d_bytes = _param_bytes(t_params), d_stream

    B, K, R = 1, args.k, args.rounds
    bs = 64
    M = args.ctx_pad // bs
    nblocks = M * B + 2

    def fresh_kv(arch):
        return jnp.zeros((arch.num_layers, arch.num_kv_heads,
                          nblocks * bs, 2 * arch.head_dim), dt)

    bt = jnp.asarray(np.arange(B * M, dtype=np.int32).reshape(B, M) + 1)
    rec0 = jnp.asarray(np.full(B, 7, np.int32))
    n0 = jnp.asarray(np.full(B, 128, np.int32))
    temps = jnp.zeros(B, jnp.float32)
    key = jax.random.PRNGKey(2)

    # R rounds of the draft chain alone: same shapes/advancement as the
    # superstep with full acceptance (n += K+1), no verify forward.
    @partial(jax.jit, static_argnames=("arch",), donate_argnames=("dkv",))
    def draft_only(d_params, dkv, rec0, n0, bt, temps, key, *, arch):
        def body(carry, r):
            dkv, rec, n = carry
            toks, _, dkv = chain_decode_step(
                d_params, dkv, rec, n, bt, n + 1, temps,
                jax.random.fold_in(key, r),
                arch=arch, block_size=bs, ctx_pad=args.ctx_pad, K=K,
                extra_write=True,
            )
            return (dkv, toks[:, -1], n + K + 1), toks[:, -1]
        (dkv, _, _), last = jax.lax.scan(body, (dkv, rec0, n0), jnp.arange(R))
        return last, dkv

    # R rounds of the EAGLE-conditioned chain alone (K+1 steps per round =
    # the superstep's count incl. the extra KV write).
    @partial(jax.jit, static_argnames=("arch",), donate_argnames=("dkv",))
    def eagle_draft_only(d_params, dkv, rec0, n0, bt, temps, key, *, arch):
        from ssd_tpu.engine.eagle_runner import eagle_chain_program

        A = arch.num_eagle_layers * arch.d_model_target
        acts = jnp.zeros((B, A), jnp.float32)

        def body(carry, r):
            dkv, rec, n = carry
            toks, _, _, dkv = eagle_chain_program(
                d_params, dkv, rec, acts, n - 1, bt, temps,
                jax.random.fold_in(key, r),
                arch=arch, block_size=bs, ctx_pad=args.ctx_pad, K=K + 1,
                sampler_x=None, F=2, use_pallas=False,
            )
            return (dkv, toks[:, -1], n + K + 1), toks[:, -1]
        (dkv, _, _), last = jax.lax.scan(body, (dkv, rec0, n0), jnp.arange(R))
        return last, dkv

    # R rounds of the target verify forward alone (fixed spec tokens).
    @partial(jax.jit, static_argnames=("arch", "eagle_layers"),
             donate_argnames=("tkv",))
    def verify_only(t_params, tkv, rec0, n0, bt, temps, key, *, arch,
                    eagle_layers=None):
        Kp1 = K + 1
        def body(carry, r):
            tkv, n = carry
            pos = (n[:, None] + jnp.arange(Kp1)[None, :]).reshape(-1)
            b_of = jnp.repeat(jnp.arange(B), Kp1)
            slots = slot_of(bt, pos, b_of, bs)
            spec = jnp.broadcast_to(rec0[:, None], (B, Kp1)).reshape(-1)
            toks, _, _, tkv = decode_step(
                t_params, tkv, spec.astype(jnp.int32), pos.astype(jnp.int32),
                slots, bt, (n + Kp1).astype(jnp.int32), temps,
                jax.random.fold_in(key, r),
                arch=arch, block_size=bs, ctx_pad=args.ctx_pad, q_len=Kp1,
                eagle_layers=eagle_layers,
            )
            return (tkv, n + Kp1), toks
        (tkv, _), toks = jax.lax.scan(body, (tkv, n0), jnp.arange(R))
        return toks, tkv

    eagle_layers = (
        (min(2, Lt - 1), Lt // 2, max(0, Lt - 3)) if args.eagle else None
    )

    def run_full():
        tkv, dkv = fresh_kv(t_arch), fresh_kv(d_arch)
        if args.eagle:
            from ssd_tpu.engine.fused_sd import eagle_sd_superstep

            A = d_arch.num_eagle_layers * d_arch.d_model_target
            out = eagle_sd_superstep(
                t_params, tkv, d_params, dkv, rec0,
                jnp.zeros((B, A), jnp.float32), n0, bt, bt, temps, temps,
                key, t_arch=t_arch, d_arch=d_arch, block_size=bs,
                ctx_pad_t=args.ctx_pad, ctx_pad_d=args.ctx_pad, K=K, R=R,
                eagle_layers=eagle_layers,
            )
            return out[1]
        specs, accs, recs, tkv, dkv = sd_superstep(
            t_params, tkv, d_params, dkv, rec0, n0, bt, bt, temps, temps, key,
            t_arch=t_arch, d_arch=d_arch, block_size=bs,
            ctx_pad_t=args.ctx_pad, ctx_pad_d=args.ctx_pad, K=K, R=R,
        )
        return accs

    def run_draft():
        dkv = fresh_kv(d_arch)
        fn = eagle_draft_only if args.eagle else draft_only
        last, dkv = fn(d_params, dkv, rec0, n0, bt, temps, key, arch=d_arch)
        return last

    def run_verify():
        tkv = fresh_kv(t_arch)
        toks, tkv = verify_only(t_params, tkv, rec0, n0, bt, temps, key,
                                arch=t_arch, eagle_layers=eagle_layers)
        return toks

    budget = {
        "full": (K + 1) * d_bytes + t_bytes,
        "draft": (K + 1) * d_bytes,
        "verify": t_bytes,
    }
    runners = {"full": run_full, "draft": run_draft, "verify": run_verify}

    d_desc = ("EAGLE 1L streamed (layer + head)" if args.eagle
              else f"{Ld}L incl. LM head")
    print(f"target {t_bytes/1e9:.2f} GB ({Lt}L), draft {d_bytes/1e9:.2f} GB "
          f"({d_desc}), K={K} R={R} ctx_pad={args.ctx_pad}",
          flush=True)
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
        gbs = budget[name] / (best / R) / 1e9
        results[name] = round(ms_round, 3)
        print(f"[{name:6s}] {ms_round:7.3f} ms/round  "
              f"{gbs:6.1f} GB/s vs {budget[name]/1e9:.2f} GB/round budget "
              f"({100*gbs/args.peak_gbs:.0f}% of peak)", flush=True)
    if all(k in results for k in ("full", "draft", "verify")):
        resid = results["full"] - results["draft"] - results["verify"]
        print(json.dumps({"metric": "sd_round_ms", **results,
                          "residual_ms": round(resid, 3)}))


if __name__ == "__main__":
    main()
