"""Target-side verification.

Parity: /root/reference/ssd/engine/verifier.py — one multi-query forward over
the K+1 [recovery | spec] tokens per sequence, then rejection-sampling
verify(); tracks acceptance metrics.

TPU-native re-design: the verify forward AND the verify() rejection-sampling
math fuse into ONE jitted program (`verify_step_packed`) taking a single
packed int32 payload and the draft's [B,K,V] logits, and returning a single
packed int32 [accept_until | recovery] vector — so a full verification costs
one upload, one dispatch, and one host readback. The reference pays a
CUDA-graph replay plus a separate host-side verify() with its own transfers
(verifier.py:65-106, utils/verify.py); on a high-latency dispatch path (any
remote/tunneled runtime) collapsing those round-trips is the difference
between the async flagship being RTT-bound and compute-bound.
"""

from __future__ import annotations

from functools import partial
from time import perf_counter

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.engine.helpers.speculate_types import SpeculateResult, VerifierBase, VerifyResult
from ssd_tpu.engine.model_runner import (
    ModelRunner,
    _f32,
    _key_from,
    decode_step,
    next_pow2,
    pack_i32,
)
from ssd_tpu.engine.sequence import Sequence
from ssd_tpu.ops.verify import build_suffixes, verify


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "K", "B_pad", "M",
                     "jit_speculate", "sampler_x", "async_fan_out",
                     "use_pallas", "eagle_layers", "use_warp", "has_hits"),
    donate_argnames=("kv_cache",),
)
def verify_step_packed(
    params, kv_cache, logits_q, packed, *,
    arch, block_size: int, ctx_pad: int, K: int, B_pad: int, M: int,
    jit_speculate: bool = False, sampler_x: float | None = None,
    async_fan_out: int | None = None, use_pallas: bool = False,
    eagle_layers: tuple[int, ...] | None = None, use_warp: bool = False,
    has_hits: bool = True,
):
    """Fused target verify: K+1 multi-query forward + verify() in one program.

    packed = [ids(B*(K+1)) | pos(B*(K+1)) | slots(B*(K+1)) | bt(B*M) | ctx(B) |
              temps_t_bits(B) | temps_q_bits(B) | hits(B) |
              (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]

    ids IS the speculation matrix [recovery | draft tokens] flattened, so no
    separate speculations payload exists. Returns (packed_out int32 =
    [accept_until(B) | recovery(B) | eagle-tap bf16 bit-pairs
    (B*(K+1)*3D/2, when eagle_layers)], kv_cache) — ONE device->host payload.
    """
    B = B_pad
    Kp1 = K + 1
    T = B * Kp1
    bt_end = 3 * T + B * M
    ids = packed[:T]
    ctx = packed[bt_end:bt_end + B]
    temps_t = _f32(packed[bt_end + B:bt_end + 2 * B])
    temps_q = _f32(packed[bt_end + 2 * B:bt_end + 3 * B])
    hits = packed[bt_end + 3 * B:bt_end + 4 * B]
    o = bt_end + 4 * B
    top_p = top_k = None
    if use_warp:
        top_p = _f32(packed[o:o + B])
        top_k = packed[o + B:o + 2 * B]
        o += 2 * B
    key = _key_from(packed[o])

    # The forward's own sampled token is unused -> XLA dead-code-eliminates
    # the sampler; only the [B*(K+1), V] logits survive.
    _, logits_p, acts, kv_cache = decode_step(
        params, kv_cache,
        ids, packed[T:2 * T], packed[2 * T:3 * T],
        packed[3 * T:bt_end].reshape(B, M), ctx, temps_t,
        jax.random.fold_in(key, 0),
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, q_len=Kp1,
        use_pallas=use_pallas, eagle_layers=eagle_layers,
    )
    V = logits_p.shape[-1]
    accept_until, recovery = verify(
        logits_p.reshape(B, Kp1, V),
        logits_q,
        ids.reshape(B, Kp1),
        temps_t, temps_q,
        hits if has_hits else None,
        jax.random.fold_in(key, 1),
        jit_speculate=jit_speculate,
        sampler_x=sampler_x,
        async_fan_out=async_fan_out,
        top_p=top_p, top_k=top_k,
    )
    parts = [accept_until.astype(jnp.int32), recovery.astype(jnp.int32)]
    if acts is not None:
        # EAGLE taps ride the SAME packed readback, as bf16 bit-pairs: a
        # separate np.asarray(acts) on the host would cost a second full
        # host<->device round trip per step (measured ~40 ms each over the
        # tunnel — it doubled the EAGLE verify cost in round 3), and the f32
        # payload itself measured ~20 ms of transfer at B*(K+1)*3D floats —
        # the taps only condition the draft (bf16 upstream anyway), so they
        # travel at half width.
        a16 = acts.astype(jnp.bfloat16).reshape(-1, 2)
        parts.append(jax.lax.bitcast_convert_type(a16, jnp.int32).reshape(-1))
    packed_out = jnp.concatenate(parts)
    return packed_out, kv_cache


class Verifier(VerifierBase):

    def __init__(
        self,
        lookahead: int,
        target_model_runner: ModelRunner,
        sampler_x: float | None = None,
        async_fan_out: int | None = None,
        jit_speculate: bool = False,
        metrics: dict | None = None,
    ):
        super().__init__(lookahead)
        self.target_model_runner = target_model_runner
        self.sampler_x = sampler_x
        self.async_fan_out = async_fan_out
        self.jit_speculate = jit_speculate
        self.metrics = metrics if metrics is not None else {}

    def prefill(self, seqs: list[Sequence], eagle: bool = False) -> VerifyResult:
        """Target prefill; in EAGLE mode also returns per-seq activation
        arrays [num_tokens, 3D] and seeds last_target_hidden_state
        (reference verifier.py:32-52)."""
        if eagle:
            token_ids, acts_rows = self.target_model_runner.run_prefill(
                seqs, return_acts=True
            )
            for seq, token_id, acts in zip(seqs, token_ids, acts_rows):
                seq.recovery_token_id = token_id
                seq.last_target_hidden_state = acts[-1].copy()
            return VerifyResult(
                [], [seq.recovery_token_id for seq in seqs], acts_rows
            )
        token_ids = self.target_model_runner.run(seqs, is_prefill=True)
        for seq, token_id in zip(seqs, token_ids):
            seq.recovery_token_id = token_id
        return VerifyResult([], [seq.recovery_token_id for seq in seqs], None)

    def verify(self, seqs: list[Sequence], speculate_result: SpeculateResult,
               eagle: bool = False) -> VerifyResult:
        t0 = perf_counter()
        runner = self.target_model_runner
        B = len(seqs)
        K = self.lookahead
        Kp1 = K + 1

        # The sequences already carry [recovery | draft tokens] as their last
        # K+1 tokens (the speculator appended them), so the multi-query prep
        # tensorises exactly the speculation matrix.
        (input_ids, positions, slot_map, bt, context_lens, temps_t, B_pad) = (
            runner._prepare_multi_query(seqs, Kp1, draft=False)
        )
        temps_q = np.ones(B_pad, dtype=np.float32)
        for i, s in enumerate(seqs):
            temps_q[i] = (
                s.draft_temperature if s.draft_temperature is not None
                else s.temperature
            )
        cache_hits = speculate_result.cache_hits
        has_hits = cache_hits is not None
        hits_np = np.zeros(B_pad, dtype=np.int32)
        if has_hits:
            hits_np[:B] = np.asarray(cache_hits, dtype=np.int32)

        # Draft logits: device array at the verifier's batch bucket. The
        # speculator paths produce B_pad rows already; pad the rare
        # mismatched case (ghost rows are never ratio-accepted).
        logits_q = speculate_result.logits_q
        if not isinstance(logits_q, jax.Array):
            lq = np.asarray(logits_q, dtype=np.float32)
            full = np.zeros((B_pad, K, lq.shape[-1]), dtype=np.float32)
            full[:lq.shape[0]] = lq
            logits_q = runner._upload(full)
        elif logits_q.shape[0] != B_pad:
            logits_q = jnp.concatenate([
                logits_q,
                jnp.zeros((B_pad - logits_q.shape[0],) + logits_q.shape[1:],
                          logits_q.dtype),
            ])

        ctx_pad = runner._ctx_bucket(int(context_lens.max()))
        payload = pack_i32(
            input_ids, positions, slot_map, bt, context_lens,
            temps_t, temps_q, hits_np, *runner._warp_parts(seqs, B_pad),
            np.int32([runner._next_seed()]),
        )
        packed_out, runner.kv_cache = verify_step_packed(
            runner.params, runner.kv_cache, logits_q,
            runner._upload(payload),
            arch=runner.arch, block_size=runner.block_size,
            ctx_pad=ctx_pad, K=K, B_pad=B_pad, M=runner.max_blocks,
            jit_speculate=self.jit_speculate,
            sampler_x=self.sampler_x,
            async_fan_out=(
                self.async_fan_out if self.sampler_x is not None else None
            ),
            use_pallas=runner.use_pallas,
            eagle_layers=runner.eagle_layers,
            use_warp=runner.use_warp,
            has_hits=has_hits,
        )
        # ONE host readback for the whole verification (incl. EAGLE taps).
        out_np = np.asarray(packed_out)
        accept_until = out_np[:B_pad][:B]
        recovery_tokens = out_np[B_pad:B_pad + B_pad][:B].tolist()

        eagle_acts = None
        if eagle and runner.eagle_layers:
            import ml_dtypes

            eagle_acts = (
                out_np[2 * B_pad:].view(ml_dtypes.bfloat16)
                .astype(np.float32).reshape(B_pad, Kp1, -1)[:B]
            )

        new_suffixes, _ = build_suffixes(
            np.asarray(speculate_result.speculations), accept_until
        )

        self.metrics.setdefault("target_verify_times", []).append(perf_counter() - t0)
        self.metrics.setdefault("accepted_suffix_lens_with_recovery", []).extend(
            [len(s) for s in new_suffixes]
        )
        if has_hits:
            ch = np.asarray(cache_hits)
            self.metrics.setdefault("cache_hits", []).append(float(ch.mean()))
            for i, n in enumerate(len(s) for s in new_suffixes):
                bucket = (
                    "accepted_suffix_lens_on_hit" if ch[i] == 1
                    else "accepted_suffix_lens_on_miss"
                )
                self.metrics.setdefault(bucket, []).append(n)

        return VerifyResult(
            new_suffixes=new_suffixes,
            recovery_tokens=recovery_tokens,
            eagle_acts=eagle_acts,
        )
