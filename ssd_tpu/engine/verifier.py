"""Target-side verification.

Parity: /root/reference/ssd/engine/verifier.py — one multi-query forward over
the K+1 [recovery | spec] tokens per sequence, then rejection-sampling
verify(); tracks acceptance metrics. The verify math runs on-device
(ssd_tpu.ops.verify) and only the small accept/recovery vectors cross to the
host.
"""

from __future__ import annotations

from time import perf_counter

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.engine.helpers.speculate_types import SpeculateResult, VerifierBase, VerifyResult
from ssd_tpu.engine.model_runner import ModelRunner
from ssd_tpu.engine.sequence import Sequence
from ssd_tpu.ops.verify import build_suffixes, verify


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
        self.key = jax.random.PRNGKey(
            target_model_runner.config.seed + 0x5EED
        )

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
        B = len(seqs)
        K = self.lookahead

        eagle_acts = None
        if eagle:
            _, logits_p, eagle_acts = self.target_model_runner.run_decode(
                seqs, q_len=K + 1, return_logits=True, return_acts=True
            )  # logits [B, K+1, V] device; acts [B, K+1, 3D] np
        else:
            _, logits_p = self.target_model_runner.run_decode(
                seqs, q_len=K + 1, return_logits=True
            )  # [B, K+1, V] device array

        temps_t = np.asarray([s.temperature for s in seqs], dtype=np.float32)
        temps_q = np.asarray(
            [
                s.draft_temperature if s.draft_temperature is not None else s.temperature
                for s in seqs
            ],
            dtype=np.float32,
        )

        cache_hits = speculate_result.cache_hits
        self.key, sub = jax.random.split(self.key)
        # Host inputs travel through the runner's upload path: under
        # num_hosts > 1 every jit input must be a GLOBAL array, and every
        # host computes identical values (same scheduler state, same seed
        # chain), so a fully-replicated device_put is correct.
        up = self.target_model_runner._upload
        if self.target_model_runner._payload_sharding is not None:
            sub = up(np.asarray(sub))
        top_p = top_k = None
        if self.target_model_runner.use_warp:
            top_p = up(np.asarray([s.top_p for s in seqs], dtype=np.float32))
            top_k = up(np.asarray([s.top_k for s in seqs], dtype=np.int32))
        accept_until, recovery = verify(
            logits_p,
            jnp.asarray(speculate_result.logits_q)
            if isinstance(speculate_result.logits_q, jax.Array)
            else up(np.asarray(speculate_result.logits_q)),
            up(np.asarray(speculate_result.speculations)),
            up(temps_t),
            up(temps_q),
            None if cache_hits is None else up(np.asarray(cache_hits)),
            sub,
            jit_speculate=self.jit_speculate,
            sampler_x=self.sampler_x,
            async_fan_out=self.async_fan_out if self.sampler_x is not None else None,
            top_p=top_p, top_k=top_k,
        )

        new_suffixes, _ = build_suffixes(
            np.asarray(speculate_result.speculations), np.asarray(accept_until)
        )
        recovery_tokens = np.asarray(recovery).tolist()

        self.metrics.setdefault("target_verify_times", []).append(perf_counter() - t0)
        self.metrics.setdefault("accepted_suffix_lens_with_recovery", []).extend(
            [len(s) for s in new_suffixes]
        )
        if cache_hits is not None:
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
