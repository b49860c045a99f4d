"""Target-side client of the asynchronous draft server.

Parity: /root/reference/ssd/engine/speculator_async.py — append the recovery
token, send the fused speculation request (cache keys [seq_id,
accepted_len-1, rec_token], num_tokens, draft block tables, temps), receive
(cache_hits, B x K tokens, [B,K,V] draft logits). The NCCL p2p handshake
(speculator_async.py:149-185) becomes a queue round-trip to the draft
controller thread; the logits reply is moved onto the target's devices with a
single jax.device_put (the ICI transfer).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.engine.draft_runner import DraftServer, SpecRequest
from ssd_tpu.engine.helpers.speculate_types import SpeculateResult, SpeculatorBase, VerifyResult
from ssd_tpu.engine.sequence import Sequence


class SpeculatorAsync(SpeculatorBase):

    def __init__(
        self,
        lookahead: int,
        draft_server: DraftServer,
        max_blocks: int | None = None,
        target_sharding=None,
    ):
        super().__init__(lookahead)
        self.K = lookahead
        self.draft_server = draft_server
        self.max_blocks = max_blocks or draft_server.runner.max_blocks
        # Where verify() runs: the reply logits are transferred here.
        self.target_sharding = target_sharding or jax.devices()[0]
        self._union_jit = None  # lazy (draft_dp x multi-host union program)

    def _block_tables(self, seqs: list[Sequence]) -> np.ndarray:
        bt = np.full((len(seqs), self.max_blocks), -1, dtype=np.int32)
        for i, seq in enumerate(seqs):
            table = seq.draft_block_table
            bt[i, : len(table)] = table
        return bt

    def _union_parts(self, parts, B: int, K: int):
        """draft_dp x multi-host (the r3 carve-out, lifted): global draft
        replicas shard over hosts by seq_id % draft_dp, so each host's
        `parts` covers only its own rows. Rows are DISJOINT across hosts and
        zero elsewhere, so one psum over the dcn axis IS the union: ONE
        jitted sum per step carrying [tokens(B*K) | hits(B)] int32 plus the
        [B_pad, K, V] draft logits, returning fully-replicated global arrays
        (the logits land exactly where the verify program wants them).
        EAGLE note: resp.activations feed only each host's LOCAL tree build,
        so they never join the union."""
        from ssd_tpu.engine.model_runner import next_pow2
        from jax.sharding import NamedSharding, PartitionSpec as P

        B_pad = next_pow2(B)
        ints = np.zeros((B, K + 1), np.int32)
        logits_part = None
        for rows, resp in parts:
            ints[rows, :K] = resp.tokens
            ints[rows, K] = resp.cache_hits
            lq = np.asarray(resp.logits_q, dtype=np.float32)
            if logits_part is None:
                logits_part = np.zeros((B_pad, K, lq.shape[-1]), np.float32)
            logits_part[rows] = lq[: len(rows)]
        if logits_part is None:
            # This host owns none of the batch's replicas: contribute zeros
            # (the psum still must run on every host). V from the runner.
            V = self.draft_server.runner.arch.vocab_size
            logits_part = np.zeros((B_pad, K, V), np.float32)

        mesh = self.target_sharding.mesh
        nh = jax.process_count()
        if self._union_jit is None:
            rep = NamedSharding(mesh, P())
            self._union_jit = jax.jit(
                lambda a, b: (a.sum(axis=0), b.sum(axis=0)),
                out_shardings=(rep, rep),
            )
        sh = NamedSharding(mesh, P("dcn"))

        def put(local):
            return jax.make_array_from_process_local_data(
                sh, local[None], (nh,) + local.shape
            )

        ints_g, logits_q = self._union_jit(put(ints), put(logits_part))
        ints_np = np.asarray(ints_g)
        return (ints_np[:, :K].astype(np.int64),
                ints_np[:, K].astype(np.int64), logits_q)

    def prefill(self, seqs: list[Sequence], verify_result: VerifyResult) -> SpeculateResult:
        # Dispatch the draft prefill and return immediately: it runs on the
        # draft chip in parallel with (non-EAGLE) or after (EAGLE, which needs
        # the target's activations) the target prefill (reference step.py:74-83).
        self.draft_server.prefill(
            [list(seq.token_ids) for seq in seqs],
            self._block_tables(seqs),
            seq_ids=np.asarray([seq.seq_id for seq in seqs], dtype=np.int64),
            acts_list=verify_result.eagle_acts,  # per-seq [n, 3D] or None
        )
        return SpeculateResult([], [])

    def speculate(self, seqs: list[Sequence], verify_result: VerifyResult) -> SpeculateResult:
        B = len(seqs)
        K = self.K
        for seq in seqs:
            assert seq.recovery_token_id is not None
            seq.append_token(seq.recovery_token_id)

        keys = np.zeros((B, 3), dtype=np.int64)
        num_tokens = np.zeros(B, dtype=np.int64)
        temps = np.zeros(B, dtype=np.float32)
        for i, seq in enumerate(seqs):
            keys[i] = (seq.seq_id, seq.last_spec_step_accepted_len - 1,
                       seq.recovery_token_id)
            num_tokens[i] = seq.num_tokens
            temps[i] = (
                seq.draft_temperature
                if seq.draft_temperature is not None else seq.temperature
            )

        eagle = verify_result.eagle_acts is not None
        recovery_acts = extend_counts = extend_acts = extend_ids = None
        if eagle:
            # Conditioning payload (reference speculator_async.py:158-179).
            act_dim = seqs[0].last_target_hidden_state.shape[-1]
            recovery_acts = np.stack(
                [seq.last_target_hidden_state for seq in seqs]
            ).astype(np.float32)
            extend_counts = np.zeros(B, dtype=np.int64)
            extend_acts = np.zeros((B, K, act_dim), dtype=np.float32)
            extend_ids = np.zeros((B, K), dtype=np.int64)
            for i, seq in enumerate(seqs):
                n = seq.extend_count
                extend_counts[i] = n
                if n > 0 and seq.extend_eagle_acts is not None:
                    extend_acts[i, :n] = seq.extend_eagle_acts[:n]
                    extend_ids[i, :n] = seq.extend_token_ids[:n]

        tp = tk = None
        if self.draft_server.runner.use_warp:
            tp = np.asarray([s.top_p for s in seqs], dtype=np.float32)
            tk = np.asarray([s.top_k for s in seqs], dtype=np.int32)
        parts = self.draft_server.speculate(SpecRequest(
            cache_keys=keys,
            num_tokens=num_tokens,
            block_tables=self._block_tables(seqs),
            temperatures=temps,
            top_ps=tp,
            top_ks=tk,
            recovery_acts=recovery_acts,
            extend_counts=extend_counts,
            extend_acts=extend_acts,
            extend_token_ids=extend_ids,
        ))

        if getattr(self.draft_server, "sharded", False):
            # draft_dp x multi-host: this host served only its own replicas'
            # rows — union the per-host partial replies (see _union_parts).
            tokens, cache_hits, logits_q = self._union_parts(parts, B, K)
        else:
            # Reassemble replica parts in request-row order; each part's
            # logits move replica-chip -> target-chip(s) directly (no extra
            # hop). Multi-controller serving cannot reshard a process-local
            # device array onto the global mesh directly, so it hops through
            # the host (every host's replica computed the identical logits).
            # Draft replies carry B_pad rows (the fused verify program's
            # batch bucket); ghost rows hold stale logits verify() never
            # consults.
            multihost = jax.process_count() > 1
            tokens = np.zeros((B, K), dtype=np.int64)
            cache_hits = np.zeros(B, dtype=np.int64)
            part_logits = []
            for rows, resp in parts:
                tokens[rows] = resp.tokens
                cache_hits[rows] = resp.cache_hits
                lq = np.asarray(resp.logits_q) if multihost else resp.logits_q
                part_logits.append(
                    (rows, jax.device_put(lq, self.target_sharding))
                )
            if len(part_logits) == 1:
                logits_q = part_logits[0][1]
            else:
                from ssd_tpu.engine.model_runner import next_pow2

                V = part_logits[0][1].shape[-1]
                logits_q = jnp.zeros((next_pow2(B), K, V),
                                     part_logits[0][1].dtype)
                for rows, lp in part_logits:
                    logits_q = logits_q.at[jnp.asarray(rows)].set(
                        lp[:len(rows)])
                logits_q = jax.device_put(logits_q, self.target_sharding)

        speculations = np.concatenate([keys[:, 2:3], tokens], axis=1)  # [B, K+1]
        for i, seq in enumerate(seqs):
            for t in tokens[i].tolist():
                seq.append_token(int(t))

        return SpeculateResult(
            speculations=speculations,
            logits_q=logits_q,
            cache_hits=cache_hits,
        )
