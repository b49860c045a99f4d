"""Fused multi-round synchronous speculative decoding.

One engine step of sync SD costs 2 dispatches + 2 host syncs per ~(accepted+1)
tokens (draft chain, then verify + readback). On hardware where the
host<->device round trip is expensive relative to a forward (any remote /
tunneled runtime; also just dispatch overhead at 1B scale), that sync is the
dominant cost — the reference pays it too (speculator_sync.py runs K+1 draft
dispatches, verifier.py one more, with a host sync between).

Here the ENTIRE round — draft chain (K-step lax.scan), target verify forward,
rejection-sampling verify() math, accepted-length bookkeeping — composes into
one XLA program, and `R` consecutive rounds run as an outer lax.scan with both
models' KV caches in the carry. One dispatch + one readback then yields
R * E[accepted+1] tokens: the speculative analogue of AR multi-step decoding
(model_runner.chain_decode_step), and a program the reference's
CUDA-graph-per-forward architecture cannot express.

Token-level semantics are identical to the unfused path: the same chain,
verify forward, and verify() math run with the same inputs, so greedy outputs
are token-exact vs unfused SD (and vs the HF reference). EOS / max-token
overshoot is truncated on the host and rolled back by the scheduler, exactly
like AR multi-step overshoot.

No reference counterpart (new capability); closest machinery:
/root/reference/ssd/engine/speculator_sync.py + verifier.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.engine.model_runner import (
    _f32,
    _key_from,
    chain_decode_step,
    decode_step,
    next_pow2,
    pack_i32,
    slot_of,
)
from ssd_tpu.models.transformer import Arch
from ssd_tpu.ops.verify import verify


@partial(
    jax.jit,
    static_argnames=("t_arch", "d_arch", "block_size", "ctx_pad_t",
                     "ctx_pad_d", "K", "R", "use_pallas"),
    donate_argnames=("target_kv", "draft_kv"),
)
def sd_superstep(
    t_params, target_kv,
    d_params, draft_kv,
    rec0,        # [B] int32 current recovery token per sequence
    n0,          # [B] int32 committed tokens per sequence (recovery NOT yet
                 #   appended; the chain writes it at position n0)
    bt_target,   # [B, M] int32
    bt_draft,    # [B, M] int32
    temps_t,     # [B] float32
    temps_d,     # [B] float32
    key,
    top_ps=None,  # [B] nucleus filter (Config.enable_top_sampling)
    top_ks=None,  # [B]
    *,
    t_arch: Arch,
    d_arch: Arch,
    block_size: int,
    ctx_pad_t: int,
    ctx_pad_d: int,
    K: int,
    R: int,
    use_pallas: bool = False,
):
    """R rounds of [draft-chain -> verify forward -> verify() -> advance].

    Returns (speculations [R, B, K+1], accept_until [R, B],
             recoveries [R, B], target_kv, draft_kv). Round r of sequence b
    contributed the suffix speculations[r, b, :accept_until[r, b] + 1]; its
    next recovery token is recoveries[r, b].
    """
    B = rec0.shape[0]
    Kp1 = K + 1
    V = t_arch.vocab_size

    def round_body(carry, r):
        tkv, dkv, rec, n = carry
        rkey = jax.random.fold_in(key, r)

        # --- draft chain: K tokens from the recovery token (one lax.scan) ---
        d_tokens, logits_q, dkv = chain_decode_step(
            d_params, dkv, rec, n, bt_draft, n + 1, temps_d,
            jax.random.fold_in(rkey, 1), top_ps, top_ks,
            arch=d_arch, block_size=block_size, ctx_pad=ctx_pad_d, K=K,
            use_pallas=use_pallas, extra_write=True,
        )
        spec = jnp.concatenate([rec[:, None], d_tokens], axis=1)  # [B, K+1]

        # --- target verify forward over [rec | d_1..d_K] ---
        pos = (n[:, None] + jnp.arange(Kp1)[None, :]).reshape(-1)
        b_of = jnp.repeat(jnp.arange(B), Kp1)
        slots = slot_of(bt_target, pos, b_of, block_size)
        _, logits_p, _, tkv = decode_step(
            t_params, tkv, spec.reshape(-1).astype(jnp.int32),
            pos.astype(jnp.int32), slots, bt_target,
            (n + Kp1).astype(jnp.int32), temps_t,
            jax.random.fold_in(rkey, 2),
            arch=t_arch, block_size=block_size, ctx_pad=ctx_pad_t, q_len=Kp1,
            use_pallas=use_pallas,
        )

        # --- rejection-sampling acceptance + recovery ---
        # cache_hits = all-ones: the chain tokens are real q samples, so
        # ratio acceptance applies and temp>0 emissions follow the target
        # distribution exactly (see speculator_sync.py — the reference
        # degrades sync sampling to greedy acceptance instead).
        acc, recovery = verify(
            logits_p.reshape(B, Kp1, V), logits_q, spec,
            temps_t, temps_d, jnp.ones((B,), jnp.int32),
            jax.random.fold_in(rkey, 3),
            top_p=top_ps, top_k=top_ks,
        )
        n_next = (n + acc + 1).astype(jnp.int32)
        out = (spec, acc.astype(jnp.int32), recovery.astype(jnp.int32))
        return (tkv, dkv, recovery.astype(jnp.int32), n_next), out

    (target_kv, draft_kv, _, _), (specs, accs, recs) = jax.lax.scan(
        round_body, (target_kv, draft_kv, rec0.astype(jnp.int32),
                     n0.astype(jnp.int32)), jnp.arange(R)
    )
    return specs, accs, recs, target_kv, draft_kv


@partial(
    jax.jit,
    static_argnames=("t_arch", "d_arch", "block_size", "ctx_pad_t",
                     "ctx_pad_d", "K", "R", "B_pad", "M_t", "M_d",
                     "use_pallas", "use_warp"),
    donate_argnames=("target_kv", "draft_kv"),
)
def sd_superstep_packed(
    t_params, target_kv, d_params, draft_kv, packed, *,
    t_arch: Arch, d_arch: Arch, block_size: int, ctx_pad_t: int,
    ctx_pad_d: int, K: int, R: int, B_pad: int, M_t: int, M_d: int,
    use_pallas: bool = False, use_warp: bool = False,
):
    """sd_superstep with its entire per-step metadata in one flat int32
    payload (the same <=1-upload-per-dispatch discipline as
    model_runner.decode_step_packed): [rec(B) | n0(B) | bt_t(B*M_t) |
    bt_d(B*M_d) | temps_t_bits(B) | temps_d_bits(B) |
    (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]."""
    B = B_pad
    o = 2 * B
    bt_t = packed[o:o + B * M_t].reshape(B, M_t)
    o += B * M_t
    bt_d = packed[o:o + B * M_d].reshape(B, M_d)
    o += B * M_d
    w_end = o + 2 * B
    warp = ((_f32(packed[w_end:w_end + B]),
             packed[w_end + B:w_end + 2 * B]) if use_warp else (None, None))
    seed_at = w_end + (2 * B if use_warp else 0)
    return sd_superstep(
        t_params, target_kv, d_params, draft_kv,
        packed[:B], packed[B:2 * B], bt_t, bt_d,
        _f32(packed[o:o + B]), _f32(packed[o + B:o + 2 * B]),
        _key_from(packed[seed_at]),
        warp[0], warp[1],
        t_arch=t_arch, d_arch=d_arch, block_size=block_size,
        ctx_pad_t=ctx_pad_t, ctx_pad_d=ctx_pad_d, K=K, R=R,
        use_pallas=use_pallas,
    )


def run_sd_superstep(target_runner, draft_runner, seqs, K: int, R: int):
    """Host driver: one dispatch, one readback, R rounds.

    Returns (suffixes list[B] of list[int] — accepted tokens + recovery per
    round, concatenated across rounds — and final recovery tokens list[B]).
    The caller truncates for EOS / max_new_tokens and commits via
    scheduler.postprocess_speculate. The whole superstep ships ONE packed
    int32 upload (via the runner's global-mesh upload path, so fused SD works
    under num_hosts > 1 where jit inputs must be global arrays)."""
    B = len(seqs)
    B_pad = next_pow2(B)
    rec = np.zeros(B_pad, np.int32)
    n0 = np.ones(B_pad, np.int32)
    temps_t = np.ones(B_pad, np.float32)
    temps_d = np.ones(B_pad, np.float32)
    bt_t = np.full((B_pad, target_runner.max_blocks), -1, np.int32)
    bt_d = np.full((B_pad, draft_runner.max_blocks), -1, np.int32)
    bt_t[:B] = target_runner._block_table_array(seqs, draft=False)
    bt_d[:B] = draft_runner._block_table_array(seqs, draft=True)
    for i, seq in enumerate(seqs):
        assert seq.recovery_token_id is not None
        rec[i] = seq.recovery_token_id
        n0[i] = seq.num_tokens
        temps_t[i] = seq.temperature
        temps_d[i] = (
            seq.draft_temperature
            if seq.draft_temperature is not None else seq.temperature
        )

    horizon = int(n0[:B].max()) + R * (K + 1) + 1
    ctx_pad_t = target_runner._ctx_bucket(horizon)
    ctx_pad_d = draft_runner._ctx_bucket(horizon)
    warp_parts = target_runner._warp_parts(seqs, B_pad)
    payload = target_runner._upload(pack_i32(
        rec, n0, bt_t, bt_d, temps_t, temps_d, *warp_parts,
        np.asarray([target_runner._next_seed()], np.int32),
    ))

    specs, accs, recs, target_runner.kv_cache, draft_runner.kv_cache = (
        sd_superstep_packed(
            target_runner.params, target_runner.kv_cache,
            draft_runner.params, draft_runner.kv_cache, payload,
            t_arch=target_runner.arch, d_arch=draft_runner.arch,
            block_size=target_runner.block_size,
            ctx_pad_t=ctx_pad_t, ctx_pad_d=ctx_pad_d, K=K, R=R,
            B_pad=B_pad, M_t=target_runner.max_blocks,
            M_d=draft_runner.max_blocks,
            use_pallas=target_runner.use_pallas,
            use_warp=target_runner.use_warp,
        )
    )
    # ONE host sync for the whole superstep.
    specs = np.asarray(specs)   # [R, B_pad, K+1]
    accs = np.asarray(accs)     # [R, B_pad]
    recs = np.asarray(recs)     # [R, B_pad]

    suffixes, final_rec, per_round_lens = [], [], []
    for b in range(B):
        out: list[int] = []
        lens = []
        for r in range(R):
            a = int(accs[r, b])
            out.extend(int(t) for t in specs[r, b, : a + 1])
            lens.append(a + 1)
        suffixes.append(out)
        per_round_lens.append(lens)
        final_rec.append(int(recs[R - 1, b]))
    return suffixes, final_rec, per_round_lens
