"""Fused asynchronous speculative decoding (one-dispatch exchanges).

The reference's async SSD hides the draft's tree build behind the target's
verify by running the draft on a SECOND GPU and overlapping the two via NCCL
p2p (/root/reference/ssd/engine/draft_runner.py:859-928). On a single chip —
or any deployment where draft and target share devices — that overlap does
not exist: the tree build serializes with the verify and the handshake costs
host round trips (the round-3/4 profiles in PERF.md measured the step as
~2 host RTTs + a serialized tree build).

TPU-native answer (VERDICT r4 item 1), two levels:

1. `async_exchange_packed` — ONE XLA program running the target's
   verify (K+1 multi-query forward + rejection-sampling verify()) AND the
   draft's whole next-step tree build (glue forward -> top-F fork -> K-step
   tree scan) back-to-back on disjoint KV donations. The speculation-tree
   cache service stays host-side (DraftRunner's tensor-keyed cache), but the
   per-exchange cost collapses to: one cache-gather dispatch + one fused
   dispatch + ONE packed readback. The separate draft-thread handshake, its
   tree-build dispatch, and its fork/spec readback RTT all disappear.

2. `async_ssd_superstep` — R whole exchanges in ONE program: the tree cache
   itself moves in-program (the match "(accepted_len-1, recovery) against the
   (fan_idx, fork_token) rows" is an argmax over MQ_LEN rows in the scan
   carry), so R rounds of [serve-from-tree -> verify -> rebuild tree] cost
   one upload, one dispatch, one readback — the async analogue of
   fused_sd.sd_superstep, and a program the reference's per-round NCCL
   handshake cannot express. Cache-miss rounds propose stale row-0 tokens
   (hits=0 masks ratio acceptance, so greedy outputs stay token-exact; the
   unfused path's miss rows are random tokens with the same property).

Token-level semantics are identical to the unfused async path: the same glue
/ fork / tree math (literally `tree_build_program`) and the same
`verify_step_packed` math run with the same inputs, so greedy outputs are
token-exact vs the unfused flagship (and vs the HF oracle).
"""

from __future__ import annotations

import os
from functools import partial
from time import perf_counter

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.engine.draft_runner import DraftRunner, SpecRequest, tree_build_program
from ssd_tpu.engine.model_runner import (
    _f32,
    _key_from,
    chain_decode_step,
    decode_step,
    pack_i32,
    slot_of,
)
from ssd_tpu.engine.step import FusedSpecDecodeStep
from ssd_tpu.engine.verifier import verify_step_packed
from ssd_tpu.models.transformer import Arch
from ssd_tpu.ops.spec_math import fan_index
from ssd_tpu.ops.verify import build_suffixes, verify


# ---------------------------------------------------------------------------
# Level 1: one fused exchange (verify(r) + tree-build(r+1) in one dispatch)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "t_arch", "d_arch", "block_size", "ctx_pad_t", "ctx_pad_d", "K",
        "MQ_LEN", "B_pad", "M_t", "M_d", "fan_out_list", "fan_out_list_miss",
        "sampler_x", "F", "jit_speculate", "use_pallas", "use_warp",
    ),
    donate_argnames=("target_kv", "draft_kv"),
)
def async_exchange_packed(
    t_params, target_kv, d_params, draft_kv, logits_q, packed, *,
    t_arch: Arch, d_arch: Arch, block_size: int, ctx_pad_t: int,
    ctx_pad_d: int, K: int, MQ_LEN: int, B_pad: int, M_t: int, M_d: int,
    fan_out_list: tuple[int, ...], fan_out_list_miss: tuple[int, ...],
    sampler_x: float | None, F: int, jit_speculate: bool = False,
    use_pallas: bool = False, use_warp: bool = False,
):
    """Target verify + draft tree build for the NEXT step's keys, fused.

    packed = [verify payload (verify_step_packed layout, seed included) |
              bt_d(B*M_d) | seed_d(1)]. The glue ids / base positions / hits
    / draft temps of the tree build are the verify payload's own ids /
    positions / hits / temps_q — the speculation IS the glue.

    Returns (packed_out int32 = [accept_until(B) | recovery(B) |
             fork_tokens(B*MQ) | spec_tokens(B*MQ*K)] — ONE device->host
             payload, spec_logits [B*MQ, K, V] (stays on device: the next
             cache), glue_logits [B, K+1, V] (invariant hook), target_kv,
             draft_kv)."""
    B = B_pad
    Kp1 = K + 1
    T = B * Kp1
    bt_end = 3 * T + B * M_t
    verify_len = bt_end + 4 * B + (2 * B if use_warp else 0) + 1

    v_out, target_kv = verify_step_packed(
        t_params, target_kv, logits_q, packed[:verify_len],
        arch=t_arch, block_size=block_size, ctx_pad=ctx_pad_t, K=K,
        B_pad=B, M=M_t, jit_speculate=jit_speculate, sampler_x=sampler_x,
        async_fan_out=(F if sampler_x is not None else None),
        use_pallas=use_pallas, eagle_layers=None, use_warp=use_warp,
        has_hits=True,
    )

    # Tree-build operands, sliced from the same payload.
    glue_ids = packed[:T]
    base = packed[T:2 * T].reshape(B, Kp1)[:, 0]       # rec position per row
    temps_q = _f32(packed[bt_end + 2 * B:bt_end + 3 * B])
    hits = packed[bt_end + 3 * B:bt_end + 4 * B]
    o = bt_end + 4 * B
    top_p = top_k = None
    if use_warp:
        top_p = _f32(packed[o:o + B])
        top_k = packed[o + B:o + 2 * B]
    od = verify_len
    bt_d = packed[od:od + B * M_d].reshape(B, M_d)
    key_d = _key_from(packed[od + B * M_d])

    host_out, spec_logits, glue_logits, draft_kv = tree_build_program(
        d_params, draft_kv, glue_ids, base, bt_d, hits, temps_q,
        top_p, top_k, key_d,
        arch=d_arch, block_size=block_size, ctx_pad=ctx_pad_d, K=K,
        MQ_LEN=MQ_LEN, fan_out_list=fan_out_list,
        fan_out_list_miss=fan_out_list_miss, sampler_x=sampler_x, F=F,
        use_pallas=use_pallas,
    )
    packed_out = jnp.concatenate([v_out, host_out])
    return packed_out, spec_logits, glue_logits, target_kv, draft_kv


class AsyncExchangeSpecDecodeStep(FusedSpecDecodeStep):
    """Async SSD with the fused exchange (Config.async_fused, spec_rounds=1):
    the DraftServer thread collapses into an inline DraftRunner — per decode
    step: host cache service (one gather dispatch on hit, or the packed
    jit-chain on miss) -> ONE fused verify+tree dispatch -> ONE readback ->
    host cache population. Greedy outputs token-exact vs the unfused async
    path; same METRICS keys."""

    def __init__(self, scheduler, target_runner, draft_runner: DraftRunner,
                 config, metrics: dict | None = None):
        super().__init__(scheduler, target_runner, draft_runner,
                         K=config.speculate_k, rounds=1, metrics=metrics)
        self.MQ_LEN = config.MQ_LEN
        self.fan_out_list = tuple(config.fan_out_list)
        self.fan_out_list_miss = tuple(config.fan_out_list_miss)
        self.sampler_x = config.sampler_x
        self.F = config.async_fan_out
        self.jit_speculate = config.jit_speculate

    def _spec_request(self, seqs) -> SpecRequest:
        B = len(seqs)
        dr = self.draft_runner
        keys = np.zeros((B, 3), dtype=np.int64)
        num_tokens = np.zeros(B, dtype=np.int64)
        temps = np.zeros(B, dtype=np.float32)
        bt = np.full((B, dr.max_blocks), -1, dtype=np.int32)
        for i, seq in enumerate(seqs):
            keys[i] = (seq.seq_id, seq.last_spec_step_accepted_len - 1,
                       seq.recovery_token_id)
            num_tokens[i] = seq.num_tokens
            temps[i] = (seq.draft_temperature
                        if seq.draft_temperature is not None
                        else seq.temperature)
            bt[i, :len(seq.draft_block_table)] = seq.draft_block_table
        tp = tk = None
        if dr.use_warp:
            tp = np.asarray([s.top_p for s in seqs], dtype=np.float32)
            tk = np.asarray([s.top_k for s in seqs], dtype=np.int32)
        return SpecRequest(cache_keys=keys, num_tokens=num_tokens,
                           block_tables=bt, temperatures=temps,
                           top_ps=tp, top_ks=tk)

    def decode(self, seqs) -> int:
        if not seqs:
            return 0
        runner, dr = self.target_runner, self.draft_runner
        K = self.K
        Kp1 = K + 1
        B = len(seqs)
        prof = os.environ.get("SSD_PROFILE", "0") == "1"
        t0 = perf_counter()
        saved = [(len(s.token_ids), s.num_tokens, s.last_token) for s in seqs]

        # --- host cache service (SpeculatorAsync.speculate, inlined) ---
        for seq in seqs:
            assert seq.recovery_token_id is not None
            seq.append_token(seq.recovery_token_id)
        req = self._spec_request(seqs)
        resp = dr.service(req)
        for i, seq in enumerate(seqs):
            for t in resp.tokens[i].tolist():
                seq.append_token(int(t))
        speculations = np.concatenate(
            [req.cache_keys[:, 2:3], resp.tokens], axis=1)  # [B, K+1]
        t1 = perf_counter()

        # --- fused exchange: verify + next tree in ONE dispatch ---
        (input_ids, positions, slot_map, bt_t, context_lens, temps_t,
         B_pad) = runner._prepare_multi_query(seqs, Kp1, draft=False)
        temps_q = np.ones(B_pad, dtype=np.float32)
        temps_q[:B] = req.temperatures
        hits_np = np.zeros(B_pad, dtype=np.int32)
        hits_np[:B] = resp.cache_hits
        bt_d = np.full((B_pad, dr.max_blocks), -1, dtype=np.int32)
        bt_d[:B] = req.block_tables
        ctx_pad_t = runner._ctx_bucket(int(context_lens.max()))
        base_max = int(req.num_tokens.max()) - 1
        ctx_pad_d = dr._ctx_bucket(base_max + 1 + Kp1 + K * self.MQ_LEN)

        payload = pack_i32(
            input_ids, positions, slot_map, bt_t, context_lens,
            temps_t, temps_q, hits_np, *runner._warp_parts(seqs, B_pad),
            np.int32([runner._next_seed()]),
            bt_d, np.int32([dr._next_seed()]),
        )
        (packed_out, spec_logits, glue_logits, runner.kv_cache,
         dr.kv_cache) = async_exchange_packed(
            runner.params, runner.kv_cache, dr.params, dr.kv_cache,
            resp.logits_q, runner._upload(payload),
            t_arch=runner.arch, d_arch=dr.arch,
            block_size=runner.block_size, ctx_pad_t=ctx_pad_t,
            ctx_pad_d=ctx_pad_d, K=K, MQ_LEN=self.MQ_LEN, B_pad=B_pad,
            M_t=runner.max_blocks, M_d=dr.max_blocks,
            fan_out_list=self.fan_out_list,
            fan_out_list_miss=self.fan_out_list_miss,
            sampler_x=self.sampler_x, F=self.F,
            jit_speculate=self.jit_speculate,
            use_pallas=runner.use_pallas, use_warp=runner.use_warp,
        )
        # ONE host readback for verify AND the next tree's token payload.
        out_np = np.asarray(packed_out)
        accept_until = out_np[:B_pad][:B]
        recovery_tokens = out_np[B_pad:2 * B_pad][:B].tolist()
        MQ = self.MQ_LEN
        fork_np = out_np[2 * B_pad:2 * B_pad + B_pad * MQ].reshape(
            B_pad, MQ)[:B]
        spec_np = out_np[2 * B_pad + B_pad * MQ:].reshape(B_pad, MQ, K)[:B]

        dr.reset_tree_cache()
        dr.populate_tree_cache(
            req.cache_keys[:, 0], hits_np[:B], fork_np, spec_np, spec_logits)
        dr._last_glue_logits = glue_logits
        t2 = perf_counter()

        new_suffixes, _ = build_suffixes(speculations, accept_until)
        for seq, (n_tok, nt, lt) in zip(seqs, saved):
            del seq.token_ids[n_tok:]
            seq.num_tokens = nt
            seq.last_token = lt
        self.scheduler.postprocess_speculate(seqs, new_suffixes,
                                             recovery_tokens)

        m = self.metrics
        m.setdefault("target_verify_times", []).append(t2 - t1)
        m.setdefault("accepted_suffix_lens_with_recovery", []).extend(
            [len(s) for s in new_suffixes])
        ch = np.asarray(resp.cache_hits)
        m.setdefault("cache_hits", []).append(float(ch.mean()))
        for i, n in enumerate(len(s) for s in new_suffixes):
            bucket = ("accepted_suffix_lens_on_hit" if ch[i] == 1
                      else "accepted_suffix_lens_on_miss")
            m.setdefault(bucket, []).append(n)
        if prof:
            print(
                f"[PROFILE fused-async] service={(t1-t0)*1000:.2f}ms "
                f"exchange={(t2-t1)*1000:.2f}ms "
                f"total={(perf_counter()-t0)*1000:.2f}ms",
                flush=True,
            )
        return sum(len(s) for s in new_suffixes)


# ---------------------------------------------------------------------------
# Level 2: R fused exchanges in ONE program (tree cache in the scan carry)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "t_arch", "d_arch", "block_size", "ctx_pad_t", "ctx_pad_d", "K",
        "MQ_LEN", "R", "fan_out_list", "fan_out_list_miss", "sampler_x", "F",
        "jit_speculate", "use_pallas",
    ),
    donate_argnames=("target_kv", "draft_kv"),
)
def async_ssd_superstep(
    t_params, target_kv,
    d_params, draft_kv,
    rec0,        # [B] int32 current recovery token per sequence
    n0,          # [B] int32 committed tokens (recovery NOT yet appended)
    bt_target,   # [B, M_t] int32
    bt_draft,    # [B, M_d] int32
    temps_t,     # [B] float32
    temps_d,     # [B] float32
    key,
    top_ps=None,
    top_ks=None,
    *,
    t_arch: Arch,
    d_arch: Arch,
    block_size: int,
    ctx_pad_t: int,
    ctx_pad_d: int,
    K: int,
    MQ_LEN: int,
    R: int,
    fan_out_list: tuple[int, ...],
    fan_out_list_miss: tuple[int, ...],
    sampler_x: float | None,
    F: int,
    jit_speculate: bool = False,
    use_pallas: bool = False,
):
    """R rounds of the async-SSD exchange with the speculation-tree cache in
    the scan carry: [tree build (all outcomes) -> verify -> serve next spec
    from the just-built tree]. The first round's speculation is primed by a
    real K-token chain (the unfused path's cache-miss jit-chain, once per
    superstep). Per-row carry: the SERVED row's K tokens + [K, V] q logits —
    the full [MQ, K, V] tree logits are transient within a round.

    Returns (speculations [R, B, K+1], accept_until [R, B], recoveries
    [R, B], cache_hits [R, B], target_kv, draft_kv)."""
    B = rec0.shape[0]
    Kp1 = K + 1
    V = t_arch.vocab_size
    b_idx = jnp.arange(B)
    fan_hit = jnp.asarray(fan_index(list(fan_out_list)))    # [MQ_LEN]
    fan_miss = jnp.asarray(fan_index(list(fan_out_list_miss)))

    # Prime: the first round's K draft tokens + q logits from a real chain.
    # extra_write=False: the round's glue forward rewrites all K+1 slots.
    spec0, logits_q0, draft_kv = chain_decode_step(
        d_params, draft_kv, rec0.astype(jnp.int32), n0.astype(jnp.int32),
        bt_draft, (n0 + 1).astype(jnp.int32), temps_d,
        jax.random.fold_in(key, R), top_ps, top_ks,
        arch=d_arch, block_size=block_size, ctx_pad=ctx_pad_d, K=K,
        sampler_x=sampler_x, fan_out=F, tree_sampling=True,
        use_pallas=use_pallas, extra_write=False,
    )

    def round_body(carry, r):
        tkv, dkv, rec, n, spec_toks, logits_q, hit = carry
        rkey = jax.random.fold_in(key, r)
        spec = jnp.concatenate([rec[:, None], spec_toks], axis=1)  # [B, K+1]

        # --- draft: glue + fork + K-step tree for EVERY verification
        # outcome of the current speculation (the SSD pre-speculation) ---
        host_out, spec_logits, _, dkv = tree_build_program(
            d_params, dkv, spec.reshape(-1), n, bt_draft, hit, temps_d,
            top_ps, top_ks, jax.random.fold_in(rkey, 1),
            arch=d_arch, block_size=block_size, ctx_pad=ctx_pad_d, K=K,
            MQ_LEN=MQ_LEN, fan_out_list=fan_out_list,
            fan_out_list_miss=fan_out_list_miss, sampler_x=sampler_x, F=F,
            use_pallas=use_pallas,
        )
        fork = host_out[:B * MQ_LEN].reshape(B, MQ_LEN)
        tree_toks = host_out[B * MQ_LEN:].reshape(B, MQ_LEN, K)

        # --- target verify forward + verify() ---
        pos = (n[:, None] + jnp.arange(Kp1)[None, :]).reshape(-1)
        slots = slot_of(bt_target, pos, jnp.repeat(b_idx, Kp1), block_size)
        _, logits_p, _, tkv = decode_step(
            t_params, tkv, spec.reshape(-1).astype(jnp.int32),
            pos.astype(jnp.int32), slots, bt_target,
            (n + Kp1).astype(jnp.int32), temps_t,
            jax.random.fold_in(rkey, 2),
            arch=t_arch, block_size=block_size, ctx_pad=ctx_pad_t,
            q_len=Kp1, use_pallas=use_pallas,
        )
        acc, recovery = verify(
            logits_p.reshape(B, Kp1, V), logits_q, spec,
            temps_t, temps_d, hit, jax.random.fold_in(rkey, 3),
            jit_speculate=jit_speculate, sampler_x=sampler_x,
            async_fan_out=(F if sampler_x is not None else None),
            top_p=top_ps, top_k=top_ks,
        )

        # --- in-program cache service: match (accepted_len-1, recovery)
        # against the tree's (fan_idx, fork_token) keys ---
        fan_rows = jnp.where(hit.astype(bool)[:, None],
                             fan_hit[None, :], fan_miss[None, :])
        match = (fan_rows == acc[:, None]) & (fork == recovery[:, None])
        hit_next = jnp.any(match, axis=1).astype(jnp.int32)
        idx = jnp.argmax(match, axis=1)
        spec_next = tree_toks[b_idx, idx].astype(jnp.int32)
        logits_q_next = spec_logits.reshape(B, MQ_LEN, K, V)[b_idx, idx]
        n_next = (n + acc + 1).astype(jnp.int32)
        out = (spec, acc.astype(jnp.int32), recovery.astype(jnp.int32), hit)
        return (tkv, dkv, recovery.astype(jnp.int32), n_next, spec_next,
                logits_q_next, hit_next), out

    hit0 = jnp.ones((B,), jnp.int32)  # the prime IS real q samples
    (target_kv, draft_kv, _, _, _, _, _), (specs, accs, recs, hits) = (
        jax.lax.scan(
            round_body,
            (target_kv, draft_kv, rec0.astype(jnp.int32),
             n0.astype(jnp.int32), spec0.astype(jnp.int32), logits_q0, hit0),
            jnp.arange(R),
        )
    )
    return specs, accs, recs, hits, target_kv, draft_kv


@partial(
    jax.jit,
    static_argnames=(
        "t_arch", "d_arch", "block_size", "ctx_pad_t", "ctx_pad_d", "K",
        "MQ_LEN", "R", "B_pad", "M_t", "M_d", "fan_out_list",
        "fan_out_list_miss", "sampler_x", "F", "jit_speculate", "use_pallas",
        "use_warp",
    ),
    donate_argnames=("target_kv", "draft_kv"),
)
def async_ssd_superstep_packed(
    t_params, target_kv, d_params, draft_kv, packed, *,
    t_arch: Arch, d_arch: Arch, block_size: int, ctx_pad_t: int,
    ctx_pad_d: int, K: int, MQ_LEN: int, R: int, B_pad: int, M_t: int,
    M_d: int, fan_out_list: tuple[int, ...],
    fan_out_list_miss: tuple[int, ...], sampler_x: float | None, F: int,
    jit_speculate: bool = False, use_pallas: bool = False,
    use_warp: bool = False,
):
    """async_ssd_superstep with one flat int32 payload (the sd_superstep
    layout): [rec(B) | n0(B) | bt_t(B*M_t) | bt_d(B*M_d) | temps_t_bits(B) |
    temps_d_bits(B) | (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]."""
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
    return async_ssd_superstep(
        t_params, target_kv, d_params, draft_kv,
        packed[:B], packed[B:2 * B], bt_t, bt_d,
        _f32(packed[o:o + B]), _f32(packed[o + B:o + 2 * B]),
        _key_from(packed[seed_at]), warp[0], warp[1],
        t_arch=t_arch, d_arch=d_arch, block_size=block_size,
        ctx_pad_t=ctx_pad_t, ctx_pad_d=ctx_pad_d, K=K, MQ_LEN=MQ_LEN, R=R,
        fan_out_list=fan_out_list, fan_out_list_miss=fan_out_list_miss,
        sampler_x=sampler_x, F=F, jit_speculate=jit_speculate,
        use_pallas=use_pallas,
    )


def run_async_ssd_superstep(target_runner, draft_runner, seqs, K: int,
                            R: int, *, MQ_LEN: int,
                            fan_out_list: tuple[int, ...],
                            fan_out_list_miss: tuple[int, ...],
                            sampler_x: float | None, F: int,
                            jit_speculate: bool):
    """Host driver: one packed upload, one dispatch, one readback for R
    async exchanges. Returns (suffixes, final_recs, per_round_lens,
    hits [R, B])."""
    from ssd_tpu.engine.fused_sd import _collect_rounds, _superstep_rows

    B, B_pad, rec, n0, temps_t, temps_d, bt_t, bt_d = _superstep_rows(
        seqs, target_runner, draft_runner)

    horizon_t = int(n0[:B].max()) + R * (K + 1) + 1
    horizon_d = horizon_t + (K + 1) + K * MQ_LEN
    ctx_pad_t = target_runner._ctx_bucket(horizon_t)
    ctx_pad_d = draft_runner._ctx_bucket(horizon_d)
    warp_parts = target_runner._warp_parts(seqs, B_pad)
    payload = target_runner._upload(pack_i32(
        rec, n0, bt_t, bt_d, temps_t, temps_d, *warp_parts,
        np.asarray([target_runner._next_seed()], np.int32),
    ))

    (specs, accs, recs, hits, target_runner.kv_cache,
     draft_runner.kv_cache) = async_ssd_superstep_packed(
        target_runner.params, target_runner.kv_cache,
        draft_runner.params, draft_runner.kv_cache, payload,
        t_arch=target_runner.arch, d_arch=draft_runner.arch,
        block_size=target_runner.block_size,
        ctx_pad_t=ctx_pad_t, ctx_pad_d=ctx_pad_d, K=K, MQ_LEN=MQ_LEN, R=R,
        B_pad=B_pad, M_t=target_runner.max_blocks,
        M_d=draft_runner.max_blocks, fan_out_list=tuple(fan_out_list),
        fan_out_list_miss=tuple(fan_out_list_miss), sampler_x=sampler_x,
        F=F, jit_speculate=jit_speculate,
        use_pallas=target_runner.use_pallas,
        use_warp=target_runner.use_warp,
    )
    # ONE host sync for the whole superstep.
    specs, accs, recs = np.asarray(specs), np.asarray(accs), np.asarray(recs)
    hits = np.asarray(hits)
    suffixes, final_rec, per_round_lens = _collect_rounds(
        specs, accs, recs, B, R)
    return suffixes, final_rec, per_round_lens, hits[:, :B]


class FusedAsyncSpecDecodeStep(FusedSpecDecodeStep):
    """Async SSD through the R-round superstep (Config.async_fused with
    spec_rounds > 1): the engine's fastest async configuration on shared
    devices. Reuses the fused-SD round ladder / EOS truncation machinery;
    adds the async cache-hit metrics from the in-program service."""

    def __init__(self, scheduler, target_runner, draft_runner, config,
                 metrics: dict | None = None):
        super().__init__(scheduler, target_runner, draft_runner,
                         K=config.speculate_k, rounds=config.spec_rounds,
                         metrics=metrics)
        self.MQ_LEN = config.MQ_LEN
        self.fan_out_list = tuple(config.fan_out_list)
        self.fan_out_list_miss = tuple(config.fan_out_list_miss)
        self.sampler_x = config.sampler_x
        self.F = config.async_fan_out
        self.jit_speculate = config.jit_speculate

    def _run_superstep(self, seqs, rounds: int):
        suffixes, final_recs, per_round_lens, hits = run_async_ssd_superstep(
            self.target_runner, self.draft_runner, seqs, self.K, rounds,
            MQ_LEN=self.MQ_LEN, fan_out_list=self.fan_out_list,
            fan_out_list_miss=self.fan_out_list_miss,
            sampler_x=self.sampler_x, F=self.F,
            jit_speculate=self.jit_speculate,
        )
        m = self.metrics
        for r in range(hits.shape[0]):
            m.setdefault("cache_hits", []).append(float(hits[r].mean()))
        for b in range(hits.shape[1]):
            for r, n in enumerate(per_round_lens[b]):
                bucket = ("accepted_suffix_lens_on_hit" if hits[r, b] == 1
                          else "accepted_suffix_lens_on_miss")
                m.setdefault(bucket, []).append(n)
        return suffixes, final_recs, per_round_lens
