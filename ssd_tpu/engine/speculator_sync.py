"""Synchronous (colocated) draft speculator.

Parity: /root/reference/ssd/engine/speculator_sync.py — append the recovery
token, run the draft K+1 times collecting [B,K,V] logits_q and K tokens.
TPU-native difference: the whole chain is one lax.scan program
(ModelRunner.run_chain), not K+1 dispatches.
"""

from __future__ import annotations

import numpy as np

from ssd_tpu.engine.helpers.speculate_types import SpeculateResult, SpeculatorBase, VerifyResult
from ssd_tpu.engine.model_runner import ModelRunner
from ssd_tpu.engine.sequence import Sequence


class SpeculatorSync(SpeculatorBase):

    def __init__(self, lookahead: int, draft_model_runner: ModelRunner):
        super().__init__(lookahead)
        self.draft_model_runner = draft_model_runner

    def prefill(self, seqs: list[Sequence], verify_result: VerifyResult) -> SpeculateResult:
        assert not verify_result.eagle_acts, "EAGLE is async-only"
        self.draft_model_runner.run(seqs, is_prefill=True)
        return SpeculateResult([], [])

    def speculate(self, seqs: list[Sequence], verify_result: VerifyResult) -> SpeculateResult:
        assert not verify_result.eagle_acts, "EAGLE is async-only"
        K = self.lookahead
        recovery = []
        for seq in seqs:
            if seq.recovery_token_id is None:
                raise ValueError("recovery_token_id is None")
            recovery.append(seq.recovery_token_id)
            seq.append_token(seq.recovery_token_id)

        tokens, logits_q = self.draft_model_runner.run_chain(seqs, K)

        for i, seq in enumerate(seqs):
            for t in tokens[i].tolist():
                seq.append_token(int(t))

        speculations = np.concatenate(
            [np.asarray(recovery, dtype=np.int64)[:, None], tokens.astype(np.int64)],
            axis=1,
        )
        # Sync draft tokens are REAL samples of q (the chain program samples
        # from the draft distribution), so verify() may ratio-accept them:
        # at temp > 0 the emitted tokens then follow the target distribution
        # exactly. The reference leaves cache_hits=None here and silently
        # degrades sync sampled decoding to greedy acceptance
        # (/root/reference/ssd/utils/verify.py:60-62); marking every row a
        # "hit" is the statistically correct treatment.
        return SpeculateResult(
            speculations, logits_q,
            cache_hits=np.ones(len(seqs), dtype=np.int64),
        )
