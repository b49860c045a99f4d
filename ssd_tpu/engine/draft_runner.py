"""Asynchronous draft server: tree speculation off the target's critical path.

Parity: /root/reference/ssd/engine/draft_runner.py (the SSD paper's core) —
the draft pre-speculates one K-token continuation for EVERY likely
verification outcome (accepted-depth x top-F recovery token), keyed
`(seq_id, accepted_len-1, recovery_token)`, so a cache hit costs the target
one handshake instead of K draft forwards.

TPU-native re-design:
 - The reference runs the draft as a separate OS process on the last GPU,
   wired by NCCL p2p with fused int64 payloads (draft_runner.py:859-928,
   speculator_async.py:130-187). Here the draft is a *controller thread*
   driving jitted programs pinned to its own chip; the request/response
   payloads are small numpy arrays over a queue, and the [B,K,V] draft-logits
   reply is a device-to-device transfer onto the target's devices (the ICI
   equivalent of the NCCL send at draft_runner.py:360-362).
 - The reference's draft step is ~2+K dispatches (glue fwd, fork, K tree
   CUDA-graph replays each with a FlashInfer re-plan + packed-bitmask build,
   draft_runner.py:530-812). Here the ENTIRE tail — glue decode, top-F fork
   selection, and the K-step tree decode — is ONE jitted XLA program
   (`tree_build_program`) with a lax.scan over depth; the tree-attention mask
   is computed analytically from (context_len, fan_idx, step) inside the
   kernel (ops/spec_math.tree_attention_mask), no bitmask.
 - Asynchrony: `service()` answers the target from the cache (or the
   jit-speculate chain program on a miss) and the response is handed back
   before the tree build is even dispatched; JAX's async dispatch then runs
   the tree build on the draft chip while the target chip verifies.
"""

from __future__ import annotations

import os
import queue
import threading
import traceback
from dataclasses import dataclass
from functools import partial
from time import perf_counter

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config
from ssd_tpu.engine.model_runner import (
    ModelRunner,
    _f32,
    _key_from,
    chain_decode_step_packed,
    next_pow2,
    pack_i32,
    slot_of,
)
from ssd_tpu.models.transformer import Arch, compute_logits, forward_hidden
from ssd_tpu.ops import attention as att
from ssd_tpu.ops.sampler import sample
from ssd_tpu.ops.spec_math import fan_index, get_forked_recovery_tokens


# ---------------------------------------------------------------------------
# The one-dispatch draft tail: glue decode -> fork -> K-step tree decode
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "arch", "block_size", "ctx_pad", "K", "MQ_LEN",
        "fan_out_list", "fan_out_list_miss", "sampler_x", "F", "use_pallas",
    ),
    donate_argnames=("kv_cache",),
)
def tree_build_program(
    params,
    kv_cache,
    glue_input_ids,   # [B*(K+1)] int32: [rec | spec_0..spec_{K-1}] per seq
    base_positions,   # [B] int32: position of the recovery token (num_tokens-1)
    block_tables,     # [B, M] int32 (draft tables; -1 padded / ghost rows)
    cache_hits,       # [B] int32 {0,1}
    temperatures,     # [B] float32
    top_ps,           # [B] float32 | None (Config.enable_top_sampling)
    top_ks,           # [B] int32 | None
    key,
    *,
    arch: Arch,
    block_size: int,
    ctx_pad: int,
    K: int,
    MQ_LEN: int,
    fan_out_list: tuple[int, ...],
    fan_out_list_miss: tuple[int, ...],
    sampler_x: float | None,
    F: int,
    use_pallas: bool = False,
):
    """Build next step's speculation tree in a single XLA program.

    Returns (host_out int32 [B*MQ_LEN*(1+K)] = [fork_tokens | spec_tokens] —
             the ONE packed device->host payload the cache rebuild needs
             (fan_idx is deterministic from cache_hits, so the host computes
             it itself), spec_logits [B, MQ_LEN, K, V], glue_logits [B, K+1, V],
             kv).

    Geometry (reference draft_runner.py:416-731): with base = num_tokens-1,
    the draft cache layout per sequence is
      [ trunk 0..base-1 | glue base..base+K | tree step s rows at
        base+(K+1)+s*MQ_LEN + r ]
    and tree row r (forked from glue depth fan_idx[r]) uses rope position
    base + fan_idx[r] + 1 + s at step s.
    """
    B = block_tables.shape[0]
    Kp1 = K + 1
    scale = arch.head_dim ** -0.5

    # ---- glue decode: one K+1 multi-query forward per sequence ----
    b_glue = jnp.repeat(jnp.arange(B), Kp1)
    glue_positions = (base_positions[:, None] + jnp.arange(Kp1)[None, :]).reshape(-1)
    glue_slots = slot_of(block_tables, glue_positions, b_glue, block_size)
    glue_ctx = base_positions + Kp1  # attends [0, base+i] for query i

    def glue_attn(q, k, v, kv_layer):
        kv_layer = att.store_kv(kv_layer, k, v, glue_slots)
        qr = q.reshape(B, Kp1, arch.num_heads, arch.head_dim)
        if use_pallas:
            from ssd_tpu.ops import pallas_attention as patt

            o = patt.paged_attention_best(
                qr, kv_layer, block_tables, glue_ctx,
                jnp.full((B,), Kp1, jnp.int32), block_size, ctx_pad, scale, s8=use_pallas == "s8",
            )
        else:
            o = att.paged_attention(
                qr, kv_layer, block_tables, glue_ctx, block_size, ctx_pad, scale,
            )
        return o.reshape(B * Kp1, arch.num_heads, arch.head_dim), kv_layer

    hidden, kv_cache = forward_hidden(
        params, kv_cache, glue_input_ids, glue_positions, glue_attn, arch
    )
    glue_logits = compute_logits(params, hidden, arch).reshape(B, Kp1, -1)

    # ---- fork selection: top-F per glue depth, excluding returned tokens ----
    returned = glue_input_ids.reshape(B, Kp1)
    fork_tokens = get_forked_recovery_tokens(
        glue_logits, cache_hits, returned,
        list(fan_out_list), list(fan_out_list_miss),
    ).astype(jnp.int32)  # [B, MQ_LEN]

    fan_hit = jnp.asarray(fan_index(list(fan_out_list)))        # [MQ_LEN]
    fan_miss = jnp.asarray(fan_index(list(fan_out_list_miss)))  # [MQ_LEN]
    fan_idx_rows = jnp.where(
        cache_hits.astype(bool)[:, None], fan_hit[None, :], fan_miss[None, :]
    )  # [B, MQ_LEN]

    # ---- K-step tree decode over N = B*MQ_LEN rows ----
    N = B * MQ_LEN
    b_flat = jnp.repeat(jnp.arange(B), MQ_LEN)          # [N]
    r_flat = jnp.tile(jnp.arange(MQ_LEN), B)            # [N]
    base_n = base_positions[b_flat]                     # [N]
    fan_n = fan_idx_rows.reshape(-1)                    # [N]
    temps_n = temperatures[b_flat]                      # [N]
    tp_n = None if top_ps is None else top_ps[b_flat]
    tk_n = None if top_ks is None else top_ks[b_flat]

    def tree_step(carry, s):
        kv, tok = carry
        rope_pos = base_n + fan_n + 1 + s
        write_pos = base_n + Kp1 + s * MQ_LEN + r_flat
        slots = slot_of(block_tables, write_pos, b_flat, block_size)
        ctx = base_positions + Kp1 + (s + 1) * MQ_LEN   # [B]

        def attn(q, k, v, kv_layer):
            kv_layer = att.store_kv(kv_layer, k, v, slots)
            qr = q.reshape(B, MQ_LEN, arch.num_heads, arch.head_dim)
            if use_pallas:
                from ssd_tpu.ops import pallas_attention as patt

                o = patt.tree_attention_best(
                    qr, kv_layer, block_tables, ctx, fan_idx_rows, s,
                    K, block_size, ctx_pad, scale, s8=use_pallas == "s8",
                )
            else:
                o = att.tree_attention(
                    qr, kv_layer, block_tables, ctx, fan_idx_rows, s, K,
                    block_size, ctx_pad, scale,
                )
            return o.reshape(N, arch.num_heads, arch.head_dim), kv_layer

        hidden, kv = forward_hidden(params, kv, tok, rope_pos, attn, arch)
        logits = compute_logits(params, hidden, arch)   # [N, V]
        next_tok = sample(
            logits, temps_n, jax.random.fold_in(key, s),
            sampler_x=sampler_x, fan_out=F, is_tree=True,
            top_p=tp_n, top_k=tk_n,
        ).astype(jnp.int32)
        return (kv, next_tok), (next_tok, logits)

    # lax.scan needs `s` traced; fan_idx/tree mask take step as python int via
    # switch-free math — tree_attention_mask is already step-parametric, so we
    # pass s as a traced scalar through the mask arithmetic.
    (kv_cache, _), (toks, logits) = jax.lax.scan(
        tree_step, (kv_cache, fork_tokens.reshape(-1)), jnp.arange(K)
    )
    spec_tokens = toks.transpose(1, 0).reshape(B, MQ_LEN, K)
    # Cache-row-major layout [B*MQ, K, V]: row b*MQ+r is tree row r of seq b,
    # matching the host-side key order, so service() gathers by flat index.
    spec_logits = logits.transpose(1, 0, 2).reshape(B * MQ_LEN, K, -1)
    host_out = jnp.concatenate(
        [fork_tokens.reshape(-1), spec_tokens.reshape(-1)]
    ).astype(jnp.int32)
    return host_out, spec_logits, glue_logits, kv_cache


@partial(
    jax.jit,
    static_argnames=(
        "arch", "block_size", "ctx_pad", "K", "MQ_LEN", "B_pad", "M",
        "fan_out_list", "fan_out_list_miss", "sampler_x", "F", "use_pallas",
        "use_warp",
    ),
    donate_argnames=("kv_cache",),
)
def tree_build_packed(
    params, kv_cache, packed, *,
    arch: Arch, block_size: int, ctx_pad: int, K: int, MQ_LEN: int,
    B_pad: int, M: int,
    fan_out_list: tuple[int, ...], fan_out_list_miss: tuple[int, ...],
    sampler_x: float | None, F: int,
    use_pallas: bool = False, use_warp: bool = False,
):
    """tree_build_program with one flat int32 payload — the draft-side
    analogue of the reference fusing its whole handshake into one NCCL burst
    (nccl_pack.py:5-32): [glue_ids(B*(K+1)) | base(B) | bt(B*M) | hits(B) |
    temp_bits(B) | (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]."""
    B = B_pad
    T = B * (K + 1)
    bt_end = T + B + B * M
    o = bt_end + 2 * B
    warp = ((_f32(packed[o:o + B]), packed[o + B:o + 2 * B])
            if use_warp else (None, None))
    o += 2 * B if use_warp else 0
    return tree_build_program(
        params, kv_cache,
        packed[:T], packed[T:T + B],
        packed[T + B:bt_end].reshape(B, M),
        packed[bt_end:bt_end + B],
        _f32(packed[bt_end + B:bt_end + 2 * B]),
        warp[0], warp[1],
        _key_from(packed[o]),
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, K=K,
        MQ_LEN=MQ_LEN, fan_out_list=fan_out_list,
        fan_out_list_miss=fan_out_list_miss, sampler_x=sampler_x, F=F,
        use_pallas=use_pallas,
    )


# ---------------------------------------------------------------------------
# Request/response payloads (the handshake protocol)
# ---------------------------------------------------------------------------

@dataclass
class SpecRequest:
    """Target -> draft, one per decode step (speculator_async.py:149-179)."""

    cache_keys: np.ndarray      # [B, 3] int64: (seq_id, accepted_len-1, rec_token)
    num_tokens: np.ndarray      # [B] int64, incl. the appended recovery token
    block_tables: np.ndarray    # [B, max_blocks] int32 draft tables
    temperatures: np.ndarray    # [B] float32 draft temps
    # top-p/top-k warp (Config.enable_top_sampling); None when disabled.
    top_ps: np.ndarray | None = None   # [B] float32
    top_ks: np.ndarray | None = None   # [B] int32
    # EAGLE-only conditioning payload (speculator_async.py:158-179):
    recovery_acts: np.ndarray | None = None    # [B, 3*D_target]
    extend_counts: np.ndarray | None = None    # [B] int64
    extend_acts: np.ndarray | None = None      # [B, K, 3*D_target]
    extend_token_ids: np.ndarray | None = None  # [B, K] int64


@dataclass
class SpecResponse:
    """Draft -> target (draft_runner.py:360-362)."""

    cache_hits: np.ndarray      # [B] int64 {0,1}
    tokens: np.ndarray          # [B, K] int64
    logits_q: jax.Array         # [B, K, V] on the draft device
    activations: jax.Array | None = None  # [B, K, D_draft] (EAGLE only)



def _warp_np(req: "SpecRequest", B_pad: int) -> tuple[np.ndarray, ...]:
    """Numpy top-p/top-k payload segments padded to the batch bucket (ghost
    rows pass through: top_p=1, top_k=0); () when warping is off."""
    if req.top_ps is None:
        return ()
    B = req.top_ps.shape[0]
    tp = np.ones(B_pad, np.float32)
    tp[:B] = req.top_ps
    tk = np.zeros(B_pad, np.int32)
    tk[:B] = req.top_ks
    return (tp, tk)

class DraftRunner(ModelRunner):
    """Draft-model execution + the tensor-keyed speculation tree cache."""

    def __init__(self, config: Config, hf_config=None, init_random=False,
                 device=None, mesh=None):
        super().__init__(
            config,
            hf_config=hf_config,
            is_draft=True,
            init_random=init_random,
            device=device,
            mesh=mesh,
        )
        self.K = config.speculate_k
        self.MQ_LEN = config.MQ_LEN
        self.F = config.async_fan_out
        self.fan_out_list = tuple(config.fan_out_list)
        self.fan_out_list_miss = tuple(config.fan_out_list_miss)
        self.sampler_x = config.sampler_x
        self.jit_speculate = config.jit_speculate
        self._rng = np.random.default_rng(config.seed + 17)
        self.reset_tree_cache()

    def reset_tree_cache(self):
        self.tree_cache_keys = np.zeros((0, 3), dtype=np.int64)
        self.tree_cache_tokens = None   # np [N, K]
        self.tree_cache_logits = None   # device [N, K, V]
        self.tree_cache_acts = None     # device [N, K, D_draft] (EAGLE only)

    # --- prefill from payload (reference draft_async_prefill, :51-101) ---

    def prefill_from_payload(self, input_id_lists: list[list[int]],
                             block_tables: np.ndarray):
        """Whole-payload draft prefill in one dispatch (reference
        draft_async_prefill runs one varlen forward, draft_runner.py:51-101)."""
        from ssd_tpu.engine.model_runner import batched_prefill_step
        from ssd_tpu.utils.native import prepare_prefill

        B = len(input_id_lists)
        B_pad = next_pow2(B)
        lens = [len(ids) for ids in input_id_lists]
        s_pad = next_pow2(max(8, max(lens)))
        input_ids = np.zeros((B_pad, s_pad), dtype=np.int32)
        positions = np.zeros((B_pad, s_pad), dtype=np.int32)
        slot_map = np.full((B_pad, s_pad), -1, dtype=np.int32)
        context_lens = np.ones(B_pad, dtype=np.int32)
        qeff = np.ones(B_pad, dtype=np.int32)
        bt = np.full((B_pad, block_tables.shape[1]), -1, dtype=np.int32)
        bt[:B] = block_tables
        for i, ids in enumerate(input_id_lists):
            n = lens[i]
            input_ids[i, :n] = ids
            positions[i], slot_map[i] = prepare_prefill(
                bt[i], 0, n, self.block_size, s_pad
            )
            context_lens[i] = n
            qeff[i] = n
        ctx_pad = self._ctx_bucket(int(context_lens.max()))
        self.key, sub = jax.random.split(self.key)
        _, _, _, self.kv_cache = batched_prefill_step(
            self.params, self.kv_cache,
            jnp.asarray(input_ids.reshape(-1)), jnp.asarray(positions.reshape(-1)),
            jnp.asarray(slot_map.reshape(-1)), jnp.asarray(bt),
            jnp.asarray(context_lens), jnp.asarray(qeff),
            jnp.ones(B_pad, jnp.float32), sub,
            arch=self.arch, block_size=self.block_size,
            ctx_pad=ctx_pad, s_pad=s_pad, use_pallas=self.use_pallas,
        )

    # --- spec-request service (reference hit_cache_and_respond, :186-286) ---

    def _jit_chain(self, req: SpecRequest) -> tuple[np.ndarray, jax.Array]:
        """Cache-miss fallback: K real draft decodes as one chain program,
        fed by ONE packed int32 upload. Returns B_pad-row logits (the fused
        verify program consumes the same batch bucket; ghost rows are never
        ratio-accepted)."""
        B = req.cache_keys.shape[0]
        B_pad = next_pow2(B)
        first = np.zeros(B_pad, dtype=np.int32)
        start_pos = np.zeros(B_pad, dtype=np.int32)
        ctx0 = np.ones(B_pad, dtype=np.int32)
        temps = np.ones(B_pad, dtype=np.float32)
        bt = np.full((B_pad, req.block_tables.shape[1]), -1, dtype=np.int32)
        first[:B] = req.cache_keys[:, 2]
        start_pos[:B] = req.num_tokens - 1
        ctx0[:B] = req.num_tokens
        temps[:B] = req.temperatures
        bt[:B] = req.block_tables
        ctx_pad = self._ctx_bucket(int(ctx0.max()) + self.K + 1)
        payload = pack_i32(first, start_pos, bt, ctx0, temps,
                           *_warp_np(req, B_pad),
                           np.int32([self._next_seed()]))
        tokens, logits_q, self.kv_cache = chain_decode_step_packed(
            self.params, self.kv_cache, self._upload(payload),
            arch=self.arch, block_size=self.block_size, ctx_pad=ctx_pad,
            K=self.K, B_pad=B_pad, M=bt.shape[1],
            sampler_x=self.sampler_x, fan_out=self.F,
            tree_sampling=True, use_pallas=self.use_pallas,
            use_warp=self.use_warp,
        )
        return np.asarray(tokens)[:B], logits_q, None

    def service(self, req: SpecRequest) -> SpecResponse:
        B = req.cache_keys.shape[0]
        K, V = self.K, self.arch.vocab_size

        hits = np.zeros(B, dtype=np.int64)
        idx = np.zeros(B, dtype=np.int64)
        if self.tree_cache_keys.shape[0] > 0:
            match = (req.cache_keys[:, None, :] == self.tree_cache_keys[None, :, :]).all(axis=2)
            hits = match.any(axis=1).astype(np.int64)
            idx = match.argmax(axis=1)

        all_hit = bool(hits.all()) and self.tree_cache_keys.shape[0] > 0
        if self.jit_speculate and not all_hit:
            # Any miss: recompute EVERY row with real logits (reference
            # :253-282 — hit rows are overwritten too; cache_hits keeps the
            # match result for metrics / fan-out selection).
            tokens, logits_q, acts = self._jit_chain(req)
            return SpecResponse(hits, tokens.astype(np.int64), logits_q, acts)

        # Miss rows: random valid tokens, stale cached logits — verify()
        # ignores q on miss rows (greedy acceptance; ratio_rows masks on
        # cache_hits), reference inits them randomly (draft_runner.py:193-194).
        tokens = self._rng.integers(0, V, size=(B, K), dtype=np.int64)
        acts = None
        B_pad = next_pow2(B)
        if hits.any():
            cached = self.tree_cache_tokens[idx]          # [B, K] (garbage on miss)
            tokens = np.where(hits[:, None].astype(bool), cached, tokens)
            # ONE gather dispatch at the verifier's batch bucket; miss/ghost
            # rows carry stale-but-finite logits that verify() never consults.
            idx_pad = np.zeros(B_pad, dtype=np.int64)
            idx_pad[:B] = idx
            idx_dev = jnp.asarray(idx_pad)  # the step's ONE index upload
            logits_q = self.tree_cache_logits[idx_dev]  # [B_pad, K, V]
            if self.tree_cache_acts is not None:
                # all-hit in EAGLE; B_pad rows feed the tree build's prev_acts
                acts = self.tree_cache_acts[idx_dev]
        else:
            logits_q = jnp.zeros((B_pad, K, V), jnp.float32)
            if self.device is not None:
                logits_q = jax.device_put(logits_q, self.device)
        return SpecResponse(hits, tokens, logits_q, acts)

    # --- tree rebuild (reference _build_tree_batch/_decode_tree/_populate) ---

    def _fan_rows(self, hits: np.ndarray) -> np.ndarray:
        """[B, MQ_LEN] glue depth per tree row — deterministic from the hit
        flags (fan_index of the hit vs miss fan-out list), so the host never
        reads it back from the device."""
        fan_hit = fan_index(list(self.fan_out_list))
        fan_miss = fan_index(list(self.fan_out_list_miss))
        return np.where(
            hits.astype(bool)[:, None], fan_hit[None, :], fan_miss[None, :]
        )

    def build_tree(self, req: SpecRequest, resp: SpecResponse):
        B = req.cache_keys.shape[0]
        K, MQ = self.K, self.MQ_LEN
        B_pad = next_pow2(B)

        glue_ids = np.zeros((B_pad, K + 1), dtype=np.int32)
        glue_ids[:B, 0] = req.cache_keys[:, 2]
        glue_ids[:B, 1:] = resp.tokens
        base = np.zeros(B_pad, dtype=np.int32)
        base[:B] = req.num_tokens - 1
        bt = np.full((B_pad, req.block_tables.shape[1]), -1, dtype=np.int32)
        bt[:B] = req.block_tables
        hits = np.zeros(B_pad, dtype=np.int32)
        hits[:B] = resp.cache_hits
        temps = np.ones(B_pad, dtype=np.float32)
        temps[:B] = req.temperatures

        ctx_pad = self._ctx_bucket(int(base.max()) + 1 + (K + 1) + K * MQ)
        payload = pack_i32(glue_ids, base, bt, hits, temps,
                           *_warp_np(req, B_pad),
                           np.int32([self._next_seed()]))
        host_out, spec_logits, glue_logits, self.kv_cache = tree_build_packed(
            self.params, self.kv_cache, self._upload(payload),
            arch=self.arch, block_size=self.block_size, ctx_pad=ctx_pad,
            K=K, MQ_LEN=MQ, B_pad=B_pad, M=bt.shape[1],
            fan_out_list=self.fan_out_list,
            fan_out_list_miss=self.fan_out_list_miss,
            sampler_x=self.sampler_x, F=self.F,
            use_pallas=self.use_pallas, use_warp=self.use_warp,
        )

        # Debug/test hook: glue logits at depth j must equal the chain logits
        # that produced spec_j (same tokens, positions, KV) — the reference's
        # glue-vs-cached equivalence invariant (tests.py:68-126). Device
        # array at B_pad rows; tests slice.
        self._last_glue_logits = glue_logits

        # Cache population: ONE device->host readback ([fork | spec] tokens,
        # transfer started async so the wait overlaps the target's verify);
        # fan indices are recomputed host-side; logits stay on the device.
        try:
            host_out.copy_to_host_async()
        except AttributeError:
            pass
        out_np = np.asarray(host_out)
        self.populate_tree_cache(
            req.cache_keys[:, 0], hits[:B],
            out_np[:B_pad * MQ].reshape(B_pad, MQ)[:B],
            out_np[B_pad * MQ:].reshape(B_pad, MQ, K)[:B],
            spec_logits,
        )

    def populate_tree_cache(self, seq_ids_B, hits_B, fork_np, spec_np,
                            spec_logits):
        """Install a freshly built speculation tree: host-side keys (seq_id,
        fan_idx, fork_token) + token matrix, device-side logits (row b*MQ+r —
        the build's cache-row-major layout). Shared by build_tree and the
        fused exchange (engine/async_fused.py), which reads fork/spec out of
        the verify program's own packed readback."""
        B, MQ = fork_np.shape
        seq_ids = np.repeat(np.asarray(seq_ids_B, dtype=np.int64), MQ)
        fan_np = self._fan_rows(np.asarray(hits_B)).reshape(-1)
        self.tree_cache_keys = np.stack(
            [seq_ids, fan_np.astype(np.int64),
             fork_np.reshape(-1).astype(np.int64)], axis=1
        )
        self.tree_cache_tokens = spec_np.reshape(B * MQ, -1)
        self.tree_cache_logits = spec_logits  # [B_pad*MQ, K, V], row b*MQ+r


class DraftServer:
    """Controller thread owning the draft replica runner(s); the process/NCCL
    topology of the reference (llm_engine.py:82-89) collapses to a queue + a
    device per replica.

    With draft_dp > 1 (the reference's roadmap "draft data parallel",
    README.md:130), requests split by seq_id % dp across replica chips; each
    replica serves its rows and rebuilds its own speculation tree — the
    per-replica programs are async dispatches on distinct devices, so they
    run concurrently."""

    def __init__(self, config: Config, draft_cfg: Config, init_random=False):
        # LOCAL devices: under multi-host serving every host runs its own
        # draft replica(s) on chips it can address.
        devices = jax.local_devices()
        nh = jax.process_count()
        self.global_dp = config.draft_dp if config.draft_async else 1
        # draft_dp x multi-host (the r3 carve-out, lifted): with draft_dp > 1
        # across hosts the GLOBAL replica set shards over hosts — host h owns
        # global replicas [h*dp, (h+1)*dp) with dp = draft_dp/num_hosts, and
        # requests route by seq_id % draft_dp. Each host serves only its
        # rows; SpeculatorAsync unions the per-host partial replies with one
        # psum over the dcn axis (disjoint rows + zeros elsewhere). With
        # draft_dp == 1 the old replica symmetry stands: every host runs the
        # identical server and serves every row.
        self.sharded = config.draft_async and self.global_dp > 1 and nh > 1
        if self.sharded:
            assert self.global_dp % nh == 0, (
                "draft_dp must be divisible by num_hosts"
            )
            self.dp = self.global_dp // nh
            self.host_id = jax.process_index()
        else:
            self.dp = self.global_dp
            self.host_id = 0
        if len(devices) >= config.tp_size + self.dp:
            replica_devices = devices[-self.dp:]
        else:
            replica_devices = [None] * self.dp  # share the target device(s)
        if config.use_eagle:
            from ssd_tpu.engine.eagle_runner import EagleDraftRunner

            runner_cls = EagleDraftRunner
        else:
            runner_cls = DraftRunner
        self.runners = [
            runner_cls(
                draft_cfg,
                hf_config=config.draft_hf_config,
                init_random=init_random,
                device=replica_devices[r],
            )
            for r in range(self.dp)
        ]
        self.runner = self.runners[0]
        self._req_q: queue.Queue = queue.Queue()
        self._resp_q: queue.Queue = queue.Queue()
        self._step_times: list[float] = []
        self._dead = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _replica_rows(self, seq_ids: np.ndarray) -> list[np.ndarray]:
        """Row indices per LOCAL replica (seq_id % global_dp routing;
        negative ghost ids go to global replica 0). Under sharded multi-host
        serving, rows owned by other hosts' replicas land in no local list —
        the speculator unions the partial replies across hosts."""
        g = np.maximum(seq_ids, 0) % self.global_dp
        local = g - self.host_id * self.dp
        return [np.nonzero(local == r)[0] for r in range(self.dp)]

    @staticmethod
    def _slice_req(req: SpecRequest, idx: np.ndarray) -> SpecRequest:
        take = lambda a: None if a is None else a[idx]
        return SpecRequest(
            cache_keys=req.cache_keys[idx],
            num_tokens=req.num_tokens[idx],
            block_tables=req.block_tables[idx],
            temperatures=req.temperatures[idx],
            top_ps=take(req.top_ps),
            top_ks=take(req.top_ks),
            recovery_acts=take(req.recovery_acts),
            extend_counts=take(req.extend_counts),
            extend_acts=take(req.extend_acts),
            extend_token_ids=take(req.extend_token_ids),
        )

    def _loop(self):
        while True:
            cmd, payload = self._req_q.get()
            if cmd == "exit":
                break
            if cmd == "sync":
                payload.set()
                continue
            try:
                if cmd == "prefill":
                    input_id_lists, block_tables, seq_ids, acts_list = payload
                    for r, idx in enumerate(self._replica_rows(seq_ids)):
                        if len(idx) == 0:
                            continue
                        args = (
                            [input_id_lists[i] for i in idx],
                            block_tables[idx],
                        )
                        if acts_list is not None:
                            args = args + ([acts_list[i] for i in idx],)
                        self.runners[r].prefill_from_payload(*args)
                elif cmd == "spec":
                    prof = os.environ.get("SSD_PROFILE_DRAFT", "0") == "1" or (
                        os.environ.get("SSD_PROFILE", "0") == "1"
                    )
                    t0 = perf_counter()
                    rows = self._replica_rows(payload.cache_keys[:, 0])
                    parts = []
                    for r, idx in enumerate(rows):
                        if len(idx) == 0:
                            parts.append(None)
                            continue
                        sub = self._slice_req(payload, idx)
                        # Each replica's programs dispatch asynchronously on
                        # its own chip: the dp services run concurrently.
                        parts.append((sub, self.runners[r].service(sub)))
                    t1 = perf_counter()
                    # Unblock the target before building the next trees: the
                    # builds below overlap with the target's verify.
                    self._resp_q.put(
                        [(rows[r], p[1]) for r, p in enumerate(parts) if p]
                    )
                    for r, p in enumerate(parts):
                        if p is None:
                            continue
                        self.runners[r].reset_tree_cache()
                        self.runners[r].build_tree(p[0], p[1])
                    if prof:
                        for r, p in enumerate(parts):
                            if p is not None:
                                jax.block_until_ready(self.runners[r].tree_cache_logits)
                        t2 = perf_counter()
                        print(
                            f"[PROFILE draft] service={(t1-t0)*1000:.2f}ms "
                            f"build_tree={(t2-t1)*1000:.2f}ms "
                            f"total={(t2-t0)*1000:.2f}ms",
                            flush=True,
                        )
                    self._step_times.append(perf_counter() - t0)
            except Exception as e:  # surface errors to the waiting target
                traceback.print_exc()
                self._dead = True
                # Always park the exception in the response queue: a
                # speculate() blocked (or racing to block) on _resp_q must
                # observe the failure even when the dying command was a
                # prefill, which has no reply of its own.
                self._resp_q.put(e)
                break

    def prefill(self, input_id_lists: list[list[int]], block_tables: np.ndarray,
                seq_ids: np.ndarray | None = None,
                acts_list: list[np.ndarray] | None = None):
        if self._dead:
            self._raise_dead()
        if seq_ids is None:
            seq_ids = np.zeros(len(input_id_lists), dtype=np.int64)
        self._req_q.put(
            ("prefill", (input_id_lists, block_tables, np.asarray(seq_ids), acts_list))
        )

    def _raise_dead(self):
        """Surface the worker's parked root-cause exception if one is (or is
        about to land) in the response queue, else raise generically."""
        try:
            resp = self._resp_q.get(timeout=1.0)
        except queue.Empty:
            resp = None
        if isinstance(resp, Exception):
            raise RuntimeError("draft server died") from resp
        raise RuntimeError("draft server died without replying")

    def speculate(self, req: SpecRequest) -> list[tuple[np.ndarray, SpecResponse]]:
        """Returns [(row_indices, SpecResponse)] parts covering every row of
        the request (one part per non-empty replica)."""
        if self._dead:
            self._raise_dead()
        self._req_q.put(("spec", req))
        # Poll with a timeout so a worker that died without replying (e.g. in
        # a concurrent prefill) can't strand us: _dead is re-checked each
        # wakeup, while genuine long waits (first-compile minutes) keep
        # looping.
        while True:
            try:
                resp = self._resp_q.get(timeout=10.0)
                break
            except queue.Empty:
                if self._dead:
                    self._raise_dead()
        if isinstance(resp, Exception):
            raise RuntimeError("draft server failed") from resp
        return resp

    def drain(self, timeout: float = 120.0):
        """Block until every queued draft command has been processed (test /
        shutdown hook; the serving path never waits on the tree build)."""
        ev = threading.Event()
        self._req_q.put(("sync", ev))
        ev.wait(timeout=timeout)

    def warmup(self, batch_pads=(1,)):
        """Pre-compile every replica's jit-chain and tree-build programs with
        a ghost request per batch bucket (ghost keys never match a real cache
        key; block tables are -1 so no KV is written), then reset caches."""
        K = self.runner.K
        for B_each in batch_pads:
            B = B_each * self.dp
            # Ghost seq_ids cycling over the LOCALLY-owned global replica
            # ids: every local replica gets B_each ghost rows.
            seq_ids = (self.host_id * self.dp
                       + np.arange(B, dtype=np.int64) % self.dp)
            req = SpecRequest(
                cache_keys=np.stack(
                    [seq_ids, np.full(B, -2), np.zeros(B)], axis=1
                ).astype(np.int64),
                num_tokens=np.ones(B, dtype=np.int64),
                block_tables=np.full((B, self.runner.max_blocks), -1, np.int32),
                temperatures=np.zeros(B, np.float32),
                top_ps=(np.ones(B, np.float32)
                        if self.runner.use_warp else None),
                top_ks=(np.zeros(B, np.int32)
                        if self.runner.use_warp else None),
                recovery_acts=(
                    np.zeros((B, self.runner.arch.num_eagle_layers
                              * self.runner.arch.d_model_target), np.float32)
                    if hasattr(self.runner.arch, "d_model_target") else None
                ),
                extend_counts=np.zeros(B, np.int64),
                extend_acts=None,
                extend_token_ids=np.zeros((B, K), np.int64),
            )
            if req.recovery_acts is not None:
                req = SpecRequest(**{
                    **req.__dict__,
                    "extend_acts": np.zeros(
                        (B, K, req.recovery_acts.shape[1]), np.float32
                    ),
                })
            self.speculate(req)
        for r in self.runners:
            r.reset_tree_cache()

    def shutdown(self):
        if self._thread.is_alive():
            self._req_q.put(("exit", None))
            self._thread.join(timeout=30)
        if self._step_times:
            avg = sum(self._step_times) * 1000 / len(self._step_times)
            print(f"[metrics] Avg draft step time (ms): {avg:.2f}", flush=True)
