"""Inference-step strategies: autoregressive vs speculative decode.

Parity: /root/reference/ssd/engine/step.py — AutoRegressiveStep.step runs the
model + scheduler.postprocess (step.py:36-47); SpecDecodeStep composes a
Speculator and a Verifier: save lightweight seq state -> speculate -> verify ->
restore -> postprocess_speculate (step.py:91-163).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from time import perf_counter

from ssd_tpu.engine.helpers.speculate_types import VerifyResult
from ssd_tpu.engine.model_runner import ModelRunner
from ssd_tpu.engine.scheduler import Scheduler
from ssd_tpu.engine.sequence import Sequence


def round_choices(rounds: int) -> tuple[int, ...]:
    """The compiled fused-SD round-count ladder for spec_rounds=R: R and its
    halvings down to 4 (ascending). warmup() pre-compiles every rung so the
    per-superstep pick never stalls on a compile."""
    s = {rounds}
    r = rounds
    while r > 4:
        r //= 2
        s.add(max(r, 4))
    return tuple(sorted(s))


class InferenceStep(ABC):

    def __init__(self, scheduler: Scheduler):
        self.scheduler = scheduler

    @abstractmethod
    def decode(self, seqs: list[Sequence]) -> int: ...

    @abstractmethod
    def prefill(self, seqs: list[Sequence]) -> int: ...


class AutoRegressiveStep(InferenceStep):

    def __init__(self, scheduler: Scheduler, model_runner: ModelRunner,
                 multi_step: int = 1):
        super().__init__(scheduler)
        self.model_runner = model_runner
        self.multi_step = multi_step

    def step(self, seqs: list[Sequence], is_prefill: bool) -> int:
        token_ids = self.model_runner.run(seqs, is_prefill)
        self.scheduler.postprocess(seqs, token_ids, is_prefill)
        return len(seqs) if not is_prefill else sum(len(s) for s in seqs)

    def prefill(self, seqs: list[Sequence]) -> int:
        return self.step(seqs, is_prefill=True)

    def decode(self, seqs: list[Sequence]) -> int:
        if not seqs:
            return 0  # everything preempted this step; next step re-prefills
        # Multi-step: M sampled tokens per dispatch as one lax.scan chain;
        # EOS/max-len overshoot is truncated and rolled back by the
        # scheduler, like a rejected speculation.
        M = max(1, min(
            self.multi_step,
            self.scheduler.max_model_len - max(s.num_tokens for s in seqs),
        ))
        if M <= 1:
            return self.step(seqs, is_prefill=False)
        tokens, _ = self.model_runner.run_chain(seqs, K=M)
        suffixes = [[int(t) for t in row] for row in tokens]
        before = sum(s.num_tokens for s in seqs)
        self.scheduler.postprocess_multi(seqs, suffixes)
        return sum(s.num_tokens for s in seqs) - before


class FusedSpecDecodeStep(InferenceStep):
    """Sync SD with `spec_rounds` whole rounds fused into one XLA program
    (ssd_tpu.engine.fused_sd): one dispatch + one host sync per
    R * E[accepted+1] tokens. Greedy outputs are token-exact vs the unfused
    path; EOS / max-token overshoot is truncated and rolled back like AR
    multi-step overshoot."""

    def __init__(self, scheduler: Scheduler, target_runner: ModelRunner,
                 draft_runner: ModelRunner, K: int, rounds: int,
                 metrics: dict | None = None):
        super().__init__(scheduler)
        self.target_runner = target_runner
        self.draft_runner = draft_runner
        self.K = K
        self.rounds = rounds
        self.round_set = round_choices(rounds)
        self.metrics = metrics if metrics is not None else {}

    def _pick_rounds(self, seqs: list[Sequence]) -> int:
        """Smallest compiled round count that covers the remaining token
        budget at the observed acceptance rate — a static R=64 wastes half
        its rounds on a 128-token budget (measured: 141 vs 262 tok/s at
        R=64 vs 32, PERF.md), and near the horizon even R=32 overshoots.
        Pure host logic; every choice is a program `warmup()` pre-compiled."""
        rem = max(s.max_new_tokens - s.num_completion_tokens for s in seqs)
        lens = self.metrics.get("accepted_suffix_lens_with_recovery") or []
        recent = lens[-512:]
        per_round = (sum(recent) / len(recent)) if recent else (self.K + 1)
        need = -(-rem // max(per_round, 1.0))  # ceil
        for r in self.round_set:
            if r >= need:
                return r
        return self.round_set[-1]

    def prefill(self, seqs: list[Sequence]) -> int:
        token_ids = self.target_runner.run(seqs, is_prefill=True)
        self.draft_runner.run(seqs, is_prefill=True)
        for seq, token_id in zip(seqs, token_ids):
            seq.recovery_token_id = token_id
            seq.num_cached_tokens = seq.num_prompt_tokens
            seq.num_draft_cached_tokens = seq.num_prompt_tokens
        return sum(len(s) for s in seqs)

    def _run_superstep(self, seqs: list[Sequence], rounds: int):
        """Mode hook: run R fused rounds, returning (suffixes, final_recs,
        per_round_lens) — overridden by the EAGLE and ngram variants."""
        from ssd_tpu.engine.fused_sd import run_sd_superstep

        return run_sd_superstep(
            self.target_runner, self.draft_runner, seqs, self.K, rounds
        )

    def decode(self, seqs: list[Sequence]) -> int:
        if not seqs:
            return 0
        t0 = perf_counter()
        suffixes, final_recs, per_round_lens = self._run_superstep(
            seqs, self._pick_rounds(seqs)
        )
        # The whole R-round superstep (draft chains + verify forwards +
        # verify() math + readback) gets its own key: it is NOT comparable to
        # the unfused path's per-round "target_verify_times".
        self.metrics.setdefault("sd_superstep_times", []).append(
            perf_counter() - t0
        )
        before_each = [s.num_tokens for s in seqs]
        self.scheduler.postprocess_speculate(seqs, suffixes, final_recs)
        # Acceptance metrics: count only rounds fully inside the COMMITTED
        # suffix (EOS/max truncation invalidates the tail rounds).
        for seq, before, lens in zip(seqs, before_each, per_round_lens):
            committed = seq.num_tokens - before
            used = 0
            for n in lens:
                if used + n > committed:
                    break
                self.metrics.setdefault(
                    "accepted_suffix_lens_with_recovery", []
                ).append(n)
                used += n
        return sum(s.num_tokens - b for s, b in zip(seqs, before_each))


class EagleFusedSpecDecodeStep(FusedSpecDecodeStep):
    """The EAGLE-3 draft inside the fused multi-round superstep
    (fused_sd.eagle_sd_superstep): the cheapest draft (one conditioned
    layer) in the engine's fastest mode. Conditioning closes inside the
    program's scan carry; the host only seeds it at prefill
    (seq.last_target_hidden_state) and re-seeds after preemption."""

    def __init__(self, scheduler: Scheduler, target_runner: ModelRunner,
                 draft_runner, K: int, rounds: int,
                 eagle_layers: tuple[int, ...], metrics: dict | None = None):
        super().__init__(scheduler, target_runner, draft_runner, K=K,
                         rounds=rounds, metrics=metrics)
        self.eagle_layers = tuple(eagle_layers)

    def prefill(self, seqs: list[Sequence]) -> int:
        # Target prefill with activation taps first (the draft's conditioning
        # source), then the conditioned draft prefill — the EAGLE ordering of
        # reference step.py:81-82.
        token_ids, acts_rows = self.target_runner.run_prefill(
            seqs, return_acts=True
        )
        for seq, token_id, acts in zip(seqs, token_ids, acts_rows):
            seq.recovery_token_id = token_id
            seq.last_target_hidden_state = acts[-1].copy()
            seq.num_cached_tokens = seq.num_prompt_tokens
            seq.num_draft_cached_tokens = seq.num_prompt_tokens
        import numpy as np

        bt = np.full((len(seqs), self.draft_runner.max_blocks), -1, np.int32)
        for i, seq in enumerate(seqs):
            bt[i, :len(seq.draft_block_table)] = seq.draft_block_table
        self.draft_runner.prefill_from_payload(
            [list(seq.token_ids) for seq in seqs], bt, acts_list=acts_rows
        )
        return sum(len(s) for s in seqs)

    def _run_superstep(self, seqs: list[Sequence], rounds: int):
        from ssd_tpu.engine.fused_sd import run_eagle_sd_superstep

        return run_eagle_sd_superstep(
            self.target_runner, self.draft_runner, seqs, self.K, rounds,
            self.eagle_layers,
        )


class NgramSpecDecodeStep(FusedSpecDecodeStep):
    """Model-free speculation (Config.ngram_speculate): prompt-lookup n-gram
    proposals + the fused multi-round verify superstep
    (fused_sd.ngram_superstep). No draft model, no draft KV — the token
    history rides the scan carry and the matcher runs in-program. Beyond
    reference (the reference always runs a draft model); proposal scheme =
    vLLM's ngram speculator."""

    def __init__(self, scheduler: Scheduler, target_runner: ModelRunner,
                 K: int, rounds: int, N: int, metrics: dict | None = None):
        super().__init__(scheduler, target_runner, draft_runner=None, K=K,
                         rounds=rounds, metrics=metrics)
        self.N = N

    def prefill(self, seqs: list[Sequence]) -> int:
        token_ids = self.target_runner.run(seqs, is_prefill=True)
        for seq, token_id in zip(seqs, token_ids):
            seq.recovery_token_id = token_id
            seq.num_cached_tokens = seq.num_prompt_tokens
        return sum(len(s) for s in seqs)

    def _run_superstep(self, seqs: list[Sequence], rounds: int):
        from ssd_tpu.engine.fused_sd import run_ngram_superstep

        return run_ngram_superstep(
            self.target_runner, seqs, self.N, self.K, rounds
        )


class SpecDecodeStep(InferenceStep):

    def __init__(self, scheduler: Scheduler, speculator, verifier, eagle: bool,
                 async_spec: bool):
        super().__init__(scheduler)
        self.speculator = speculator
        self.verifier = verifier
        self.eagle = eagle
        self.async_spec = async_spec

    def prefill(self, seqs: list[Sequence]) -> int:
        # Async non-EAGLE: the draft prefill is dispatched first so it runs in
        # parallel with the target prefill (reference step.py:74-83).
        if not self.eagle and self.async_spec:
            self.speculator.prefill(seqs, VerifyResult([], [], None))
            self.verifier.prefill(seqs, eagle=False)
        else:
            verify_result = self.verifier.prefill(seqs, eagle=self.eagle)
            self.speculator.prefill(seqs, verify_result)

        for seq in seqs:
            assert seq.recovery_token_id is not None
            seq.num_cached_tokens = seq.num_prompt_tokens
            seq.num_draft_cached_tokens = seq.num_prompt_tokens
        return sum(len(s) for s in seqs)

    def decode(self, seqs: list[Sequence]) -> int:
        if not seqs:
            return 0  # everything preempted this step; next step re-prefills
        # Save lightweight state; speculate() appends the recovery + draft
        # tokens, which postprocess_speculate needs in original form
        # (step.py:97-101).
        saved = [(len(s.token_ids), s.num_tokens, s.last_token) for s in seqs]

        # SSD_PROFILE=1: per-phase breakdown (reference step.py:92,155-161).
        prof = os.environ.get("SSD_PROFILE", "0") == "1"
        t0 = perf_counter()

        in_result = VerifyResult([], [], True if self.eagle else None)
        speculate_result = self.speculator.speculate(seqs, in_result)
        t1 = perf_counter()
        out_result = self.verifier.verify(seqs, speculate_result, eagle=self.eagle)
        t2 = perf_counter()

        for seq, (n_tok, nt, lt) in zip(seqs, saved):
            del seq.token_ids[n_tok:]
            seq.num_tokens = nt
            seq.last_token = lt

        self.scheduler.postprocess_speculate(
            seqs,
            out_result.new_suffixes,
            out_result.recovery_tokens,
            eagle_acts=out_result.eagle_acts if self.eagle else None,
        )
        if prof:
            t3 = perf_counter()
            print(
                f"[PROFILE target] speculate={(t1-t0)*1000:.2f}ms "
                f"verify={(t2-t1)*1000:.2f}ms postprocess={(t3-t2)*1000:.2f}ms "
                f"total={(t3-t0)*1000:.2f}ms",
                flush=True,
            )
        return sum(len(s) for s in out_result.new_suffixes)
