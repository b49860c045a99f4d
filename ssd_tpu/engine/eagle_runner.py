"""EAGLE-3 draft execution: conditioned prefill, jit chain, and the
one-dispatch glue+fork+tree program.

Parity: the EAGLE paths of /root/reference/ssd/engine/draft_runner.py —
 - conditioned prefill (draft_async_prefill with eagle_acts, :51-101)
 - jit_speculate carrying fc(recovery_acts) -> prenorm self-conditioning
   (:124-184)
 - the packed varlen glue decode over [extend | rec | spec] tokens with a
   single batched fc call (:530-711), re-expressed as a PADDED [B, 2K+1]
   batch: per-sequence true lengths (n_ext+K+1) flow through the same
   `qeff` contract the paged attention kernels already support, so no varlen
   machinery is needed — ghost queries are masked and discarded
 - tree decode threading prenorm hidden-state conditioning through the K
   steps and caching activations alongside tokens/logits (:733-857)

EAGLE position shift: canonical token index p lives at draft cache position
p-1 (the first prompt token is never fed to the draft), so every `base` here
is num_tokens-2 where the non-EAGLE draft uses num_tokens-1
(draft_runner.py:135 pos_offset).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config
from ssd_tpu.engine.draft_runner import DraftRunner, SpecRequest, _warp_np
from ssd_tpu.engine.model_runner import (
    ModelRunner,
    _f32,
    _key_from,
    next_pow2,
    pack_i32,
    slot_of,
)
from ssd_tpu.models.eagle3 import (
    EagleArch,
    eagle_forward,
    eagle_logits,
    init_eagle_params,
    project_target_acts,
)
from ssd_tpu.ops import attention as att
from ssd_tpu.ops.sampler import sample
from ssd_tpu.ops.spec_math import fan_index, get_forked_recovery_tokens


def _paged_attn(q4, kv_layer, block_tables, ctx, qeff, block_size, ctx_pad,
                scale, use_pallas):
    if use_pallas:
        from ssd_tpu.ops import pallas_attention as patt

        return patt.paged_attention_best(
            q4, kv_layer, block_tables, ctx, qeff, block_size, ctx_pad, scale, s8=use_pallas == "s8"
        )
    return att.paged_attention(
        q4, kv_layer, block_tables, ctx, block_size, ctx_pad, scale, qeff=qeff
    )


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "s_pad", "use_pallas"),
    donate_argnames=("kv_cache",),
)
def eagle_prefill_program(
    params,
    kv_cache,
    input_ids,     # [S_pad] token_ids[1:] padded
    target_acts,   # [S_pad, 3*D_target]
    positions,     # [S_pad] 0..n-2
    slot_map,      # [S_pad]
    block_table,   # [1, M]
    n_real,        # [] int32 = num_prompt_tokens - 1
    *,
    arch: EagleArch,
    block_size: int,
    ctx_pad: int,
    s_pad: int,
    use_pallas: bool,
):
    """Conditioned draft prefill for one sequence; KV side effects only."""
    scale = arch.head_dim ** -0.5
    cond = project_target_acts(params, target_acts)

    def attn_call(q, k, v, kv_layer):
        kv_layer = att.store_kv(kv_layer, k, v, slot_map)
        o = _paged_attn(
            q[None], kv_layer, block_table, jnp.reshape(n_real, (1,)),
            jnp.reshape(n_real, (1,)), block_size, ctx_pad, scale, use_pallas,
        )
        return o[0], kv_layer

    _, kv_cache = eagle_forward(
        params, kv_cache, input_ids, cond, positions, attn_call, arch
    )
    return kv_cache


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "s_pad", "M",
                     "use_pallas"),
    donate_argnames=("kv_cache",),
)
def eagle_prefill_packed(
    params, kv_cache, packed, *,
    arch: EagleArch, block_size: int, ctx_pad: int, s_pad: int, M: int,
    use_pallas: bool,
):
    """eagle_prefill_program fed by ONE flat int32 payload (the packed
    one-upload discipline every other engine program obeys; target acts
    travel as raw f32 bits): [input_ids(S) | positions(S) | slot_map(S) |
    block_table(M) | n_real(1) | act_bits(S*3*D_target)]."""
    S = s_pad
    A = arch.num_eagle_layers * arch.d_model_target
    o = 3 * S + M + 1
    return eagle_prefill_program(
        params, kv_cache,
        packed[:S], _f32(packed[o:o + S * A]).reshape(S, A),
        packed[S:2 * S], packed[2 * S:3 * S],
        packed[3 * S:3 * S + M].reshape(1, M), packed[3 * S + M],
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, s_pad=s_pad,
        use_pallas=use_pallas,
    )


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "K", "sampler_x", "F",
                     "use_pallas"),
    donate_argnames=("kv_cache",),
)
def eagle_chain_program(
    params,
    kv_cache,
    first_tokens,    # [B] recovery tokens
    recovery_acts,   # [B, 3*D_target]
    base_positions,  # [B] = num_tokens - 2 (EAGLE-shifted rec position)
    block_tables,    # [B, M]
    temperatures,    # [B]
    key,
    top_ps=None,     # [B] nucleus filter (Config.enable_top_sampling)
    top_ks=None,     # [B]
    *,
    arch: EagleArch,
    block_size: int,
    ctx_pad: int,
    K: int,
    sampler_x: float | None,
    F: int,
    use_pallas: bool,
):
    """K sequential conditioned decodes (reference jit_speculate :124-184).

    Returns (tokens [B,K], logits [B,K,V], prenorms [B,K,D], kv).
    """
    B = first_tokens.shape[0]
    scale = arch.head_dim ** -0.5
    cond0 = project_target_acts(params, recovery_acts)
    b_idx = jnp.arange(B)

    def step(carry, i):
        kv, tok, cond = carry
        positions = base_positions + i
        ctx = base_positions + 1 + i
        slots = slot_of(block_tables, positions, b_idx, block_size)

        def attn_call(q, k, v, kv_layer):
            kv_layer = att.store_kv(kv_layer, k, v, slots)
            o = _paged_attn(
                q.reshape(B, 1, arch.num_heads, arch.head_dim), kv_layer,
                block_tables, ctx, jnp.ones((B,), jnp.int32), block_size,
                ctx_pad, scale, use_pallas,
            )
            return o.reshape(B, arch.num_heads, arch.head_dim), kv_layer

        prenorm, kv = eagle_forward(params, kv, tok, cond, positions, attn_call, arch)
        logits = eagle_logits(params, prenorm, arch)  # [B, V_full]
        next_tok = sample(
            logits, temperatures, jax.random.fold_in(key, i),
            sampler_x=sampler_x, fan_out=F, is_tree=True,
            top_p=top_ps, top_k=top_ks,
        ).astype(jnp.int32)
        return (kv, next_tok, prenorm), (next_tok, logits, prenorm)

    (kv_cache, _, _), (toks, logits, prenorms) = jax.lax.scan(
        step, (kv_cache, first_tokens, cond0), jnp.arange(K)
    )
    return (
        toks.transpose(1, 0),
        logits.transpose(1, 0, 2),
        prenorms.transpose(1, 0, 2),
        kv_cache,
    )


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "K", "B_pad", "M",
                     "sampler_x", "F", "use_pallas", "use_warp"),
    donate_argnames=("kv_cache",),
)
def eagle_chain_packed(
    params, kv_cache, packed, *,
    arch: EagleArch, block_size: int, ctx_pad: int, K: int, B_pad: int,
    M: int, sampler_x: float | None, F: int, use_pallas: bool,
    use_warp: bool = False,
):
    """eagle_chain_program with ONE flat int32 payload — the conditioning
    activations ride the same upload as raw f32 bits (the reference ships its
    whole EAGLE handshake incl. acts as fused NCCL bursts,
    speculator_async.py:158-179): [first(B) | base(B) | bt(B*M) |
    temp_bits(B) | (top_p_bits(B) | top_k(B))? | rec_act_bits(B*3*D_target) |
    seed(1)]."""
    B = B_pad
    A = arch.num_eagle_layers * arch.d_model_target
    o = 2 * B + B * M
    temps = _f32(packed[o:o + B])
    o += B
    warp = (None, None)
    if use_warp:
        warp = (_f32(packed[o:o + B]), packed[o + B:o + 2 * B])
        o += 2 * B
    rec_acts = _f32(packed[o:o + B * A]).reshape(B, A)
    o += B * A
    return eagle_chain_program(
        params, kv_cache,
        packed[:B], rec_acts, packed[B:2 * B],
        packed[2 * B:2 * B + B * M].reshape(B, M), temps,
        _key_from(packed[o]), warp[0], warp[1],
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, K=K,
        sampler_x=sampler_x, F=F, use_pallas=use_pallas,
    )


@partial(
    jax.jit,
    static_argnames=(
        "arch", "block_size", "ctx_pad", "K", "MQ_LEN",
        "fan_out_list", "fan_out_list_miss", "sampler_x", "F", "use_pallas",
    ),
    donate_argnames=("kv_cache",),
)
def eagle_tree_build_program(
    params,
    kv_cache,
    glue_tokens,     # [B, 2K+1] packed [extend | rec | spec | pad]
    glue_fc_acts,    # [B, 2K+1, 3*D_target] target acts for fc rows (0 else)
    prev_acts,       # [B, K, D] spec rows' prenorm self-conditioning (device)
    glue_is_fc,      # [B, 2K+1] bool: row conditioned via fc
    n_ext,           # [B] int32 extend counts
    base_positions,  # [B] = num_tokens - 2
    block_tables,    # [B, M]
    cache_hits,      # [B] int32
    temperatures,    # [B]
    key,
    top_ps=None,     # [B] nucleus filter (Config.enable_top_sampling)
    top_ks=None,     # [B]
    *,
    arch: EagleArch,
    block_size: int,
    ctx_pad: int,
    K: int,
    MQ_LEN: int,
    fan_out_list: tuple[int, ...],
    fan_out_list_miss: tuple[int, ...],
    sampler_x: float | None,
    F: int,
    use_pallas: bool,
):
    """EAGLE glue + fork + tree in one XLA program.

    Returns (host_out int32 [B*MQ*(1+K)] = [fork_tokens | spec_tokens] — the
    single device->host payload, as in the plain tree_build_program —
    spec_logits [B*MQ,K,V], spec_acts [B*MQ,K,D], kv).
    """
    B, W = glue_tokens.shape  # W = 2K+1
    Kp1 = K + 1
    scale = arch.head_dim ** -0.5

    # ---- packed glue decode (reference :530-711 via padded qeff batch) ----
    qeff = (n_ext + Kp1).astype(jnp.int32)                  # [B]
    b_glue = jnp.repeat(jnp.arange(B), W)
    j = jnp.tile(jnp.arange(W), B)
    positions = (base_positions - n_ext)[b_glue] + j        # [B*W]
    slots = slot_of(block_tables, positions, b_glue, block_size)
    slots = jnp.where(j < qeff[b_glue], slots, -1)          # ghost pad rows
    glue_ctx = base_positions + 1 + K                       # [B]

    # Spec rows' self-conditioning prenorms scattered to their packed glue
    # positions j = n_ext + 1 + t (reference :595-599) — in-program so the
    # host never uploads index arrays.
    D = prev_acts.shape[-1]
    rows = jnp.repeat(jnp.arange(B), K)
    cols = (n_ext[:, None] + 1 + jnp.arange(K)[None, :]).reshape(-1)
    from ssd_tpu.models.eagle3 import _compute_dtype

    cdt = _compute_dtype(params)
    glue_prev_acts = jnp.zeros((B, W, D), cdt).at[
        rows, cols
    ].set(prev_acts.reshape(B * K, D).astype(cdt))

    cond = jnp.where(
        glue_is_fc.reshape(-1)[:, None],
        project_target_acts(params, glue_fc_acts.reshape(B * W, -1)),
        glue_prev_acts.reshape(B * W, -1),
    )

    def glue_attn(q, k, v, kv_layer):
        kv_layer = att.store_kv(kv_layer, k, v, slots)
        o = _paged_attn(
            q.reshape(B, W, arch.num_heads, arch.head_dim), kv_layer,
            block_tables, glue_ctx, qeff, block_size, ctx_pad, scale,
            use_pallas,
        )
        return o.reshape(B * W, arch.num_heads, arch.head_dim), kv_layer

    prenorm_flat, kv_cache = eagle_forward(
        params, kv_cache, glue_tokens.reshape(-1), cond, positions,
        glue_attn, arch,
    )
    # Extract rec+spec rows at j = n_ext + t (reference :651-664).
    extract = (jnp.arange(B)[:, None] * W + n_ext[:, None]
               + jnp.arange(Kp1)[None, :]).reshape(-1)
    glue_prenorm = prenorm_flat[extract].reshape(B, Kp1, -1)        # [B,K+1,D]
    glue_logits = eagle_logits(
        params, glue_prenorm.reshape(B * Kp1, -1), arch
    ).reshape(B, Kp1, -1)
    returned = glue_tokens.reshape(-1)[extract].reshape(B, Kp1)     # [rec|spec]

    # ---- fork selection ----
    fork_tokens = get_forked_recovery_tokens(
        glue_logits, cache_hits, returned,
        list(fan_out_list), list(fan_out_list_miss),
    ).astype(jnp.int32)
    fan_hit = jnp.asarray(fan_index(list(fan_out_list)))
    fan_miss = jnp.asarray(fan_index(list(fan_out_list_miss)))
    fan_idx_rows = jnp.where(
        cache_hits.astype(bool)[:, None], fan_hit[None, :], fan_miss[None, :]
    )

    # ---- K-step tree decode with prenorm conditioning (reference :666-812) --
    N = B * MQ_LEN
    b_flat = jnp.repeat(jnp.arange(B), MQ_LEN)
    r_flat = jnp.tile(jnp.arange(MQ_LEN), B)
    base_n = base_positions[b_flat]
    fan_n = fan_idx_rows.reshape(-1)
    temps_n = temperatures[b_flat]
    tp_n = None if top_ps is None else top_ps[b_flat]
    tk_n = None if top_ks is None else top_ks[b_flat]
    cond0 = glue_prenorm[b_flat, fan_n]                     # [N, D]

    def tree_step(carry, s):
        kv, tok, tcond = carry
        rope_pos = base_n + fan_n + 1 + s
        write_pos = base_n + Kp1 + s * MQ_LEN + r_flat
        slots_s = slot_of(block_tables, write_pos, b_flat, block_size)
        ctx = base_positions + Kp1 + (s + 1) * MQ_LEN

        def attn(q, k, v, kv_layer):
            kv_layer = att.store_kv(kv_layer, k, v, slots_s)
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

        prenorm, kv = eagle_forward(params, kv, tok, tcond, rope_pos, attn, arch)
        logits = eagle_logits(params, prenorm, arch)
        next_tok = sample(
            logits, temps_n, jax.random.fold_in(key, s),
            sampler_x=sampler_x, fan_out=F, is_tree=True,
            top_p=tp_n, top_k=tk_n,
        ).astype(jnp.int32)
        return (kv, next_tok, prenorm), (next_tok, logits, prenorm)

    (kv_cache, _, _), (toks, logits, prenorms) = jax.lax.scan(
        tree_step, (kv_cache, fork_tokens.reshape(-1), cond0), jnp.arange(K)
    )
    spec_tokens = toks.transpose(1, 0).reshape(B, MQ_LEN, K)
    spec_logits = logits.transpose(1, 0, 2).reshape(B * MQ_LEN, K, -1)
    spec_acts = prenorms.transpose(1, 0, 2).reshape(B * MQ_LEN, K, -1)
    host_out = jnp.concatenate(
        [fork_tokens.reshape(-1), spec_tokens.reshape(-1)]
    ).astype(jnp.int32)
    return host_out, spec_logits, spec_acts, kv_cache


@partial(
    jax.jit,
    static_argnames=(
        "arch", "block_size", "ctx_pad", "K", "MQ_LEN", "B_pad", "M",
        "fan_out_list", "fan_out_list_miss", "sampler_x", "F", "use_pallas",
        "use_warp",
    ),
    donate_argnames=("kv_cache",),
)
def eagle_tree_build_packed(
    params, kv_cache, packed, prev_acts, *,
    arch: EagleArch, block_size: int, ctx_pad: int, K: int, MQ_LEN: int,
    B_pad: int, M: int,
    fan_out_list: tuple[int, ...], fan_out_list_miss: tuple[int, ...],
    sampler_x: float | None, F: int, use_pallas: bool,
    use_warp: bool = False,
):
    """eagle_tree_build_program with ONE flat int32 upload; the spec rows'
    self-conditioning prenorms (`prev_acts` [B, K, D]) are already on the
    draft device (chain output / tree-cache gather), so they are passed as a
    device array, not traffic. Payload: [glue_tokens(B*W) | glue_is_fc(B*W) |
    n_ext(B) | base(B) | bt(B*M) | hits(B) | temp_bits(B) |
    (top_p_bits(B) | top_k(B))? | fc_act_bits(B*W*3*D_target) | seed(1)]."""
    B = B_pad
    W = 2 * K + 1
    A = arch.num_eagle_layers * arch.d_model_target
    T = B * W
    o = 2 * T + 2 * B + B * M
    hits = packed[o:o + B]
    temps = _f32(packed[o + B:o + 2 * B])
    o += 2 * B
    warp = (None, None)
    if use_warp:
        warp = (_f32(packed[o:o + B]), packed[o + B:o + 2 * B])
        o += 2 * B
    fc_acts = _f32(packed[o:o + T * A]).reshape(B, W, A)
    o += T * A
    return eagle_tree_build_program(
        params, kv_cache,
        packed[:T].reshape(B, W), fc_acts, prev_acts,
        packed[T:2 * T].reshape(B, W).astype(bool),
        packed[2 * T:2 * T + B], packed[2 * T + B:2 * T + 2 * B],
        packed[2 * T + 2 * B:2 * T + 2 * B + B * M].reshape(B, M),
        hits, temps, _key_from(packed[o]), warp[0], warp[1],
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, K=K,
        MQ_LEN=MQ_LEN, fan_out_list=fan_out_list,
        fan_out_list_miss=fan_out_list_miss, sampler_x=sampler_x, F=F,
        use_pallas=use_pallas,
    )


class EagleRunnerMixin:
    """EAGLE model construction + conditioned prefill, shared by the async
    draft server runner and the fused-superstep sync runner. Host classes set
    `self._eagle_cfg` before ModelRunner.__init__ (which calls _make_arch)."""

    def _make_arch(self):
        return EagleArch.from_model_config(
            self.hf_config,
            d_model_target=self._eagle_cfg.d_model_target,
            num_eagle_layers=len(self._eagle_cfg.eagle_layers),
        )

    def _make_params(self, init_random: bool):
        if init_random:
            return init_eagle_params(self.arch, jax.random.PRNGKey(7), self.dtype)
        from ssd_tpu.utils.loader import load_eagle_params

        return load_eagle_params(
            self.model_path, self.hf_config,
            d_model_target=self._eagle_cfg.d_model_target,
            num_eagle_layers=len(self._eagle_cfg.eagle_layers),
            target_path=self._eagle_cfg.tokenizer_path,
            dtype=self.dtype,
        )

    # --- conditioned prefill -------------------------------------------------

    def prefill_from_payload(self, input_id_lists, block_tables,
                             acts_list=None):
        assert acts_list is not None, "EAGLE prefill needs target activations"
        if self.config.debug_mode and not getattr(self, "_debug_saved", False):
            # Reference debug capture (eagle3_draft_llama3.py:279-311): save
            # the conditioned prefill inputs for offline comparison.
            import os

            os.makedirs("debug_outputs", exist_ok=True)
            np.savez(
                "debug_outputs/draft_prefill_inputs.npz",
                input_ids=np.asarray(input_id_lists[0], dtype=np.int64),
                target_hidden_states=np.asarray(acts_list[0]),
                d_model_target=self.arch.d_model_target,
                eagle_layers=np.asarray(self._eagle_cfg.eagle_layers),
            )
            self._debug_saved = True
            print("[DEBUG] saved debug_outputs/draft_prefill_inputs.npz", flush=True)
        act_dim = self.arch.num_eagle_layers * self.arch.d_model_target
        for i, ids in enumerate(input_id_lists):
            # Token j+1 conditioned on target act j: feed ids[1:], acts[:-1]
            # at draft positions 0..n-2 (speculator_async.py:66-77).
            toks = ids[1:]
            acts = np.asarray(acts_list[i])[:-1]
            n = len(toks)
            s_pad = next_pow2(max(8, n))
            input_ids = np.zeros(s_pad, dtype=np.int32)
            input_ids[:n] = toks
            acts_pad = np.zeros((s_pad, act_dim), dtype=np.float32)
            acts_pad[:n] = acts
            positions = np.zeros(s_pad, dtype=np.int32)
            positions[:n] = np.arange(n)
            bt_row = block_tables[i]
            slot_map = np.full(s_pad, -1, dtype=np.int32)
            blk = positions[:n] // self.block_size
            slot_map[:n] = bt_row[blk] * self.block_size + positions[:n] % self.block_size
            ctx_pad = self._ctx_bucket(n)
            payload = pack_i32(
                input_ids, positions, slot_map, bt_row,
                np.int32([n]), acts_pad,
            )
            self.kv_cache = eagle_prefill_packed(
                self.params, self.kv_cache, self._upload(payload),
                arch=self.arch, block_size=self.block_size, ctx_pad=ctx_pad,
                s_pad=s_pad, M=bt_row.shape[0], use_pallas=self.use_pallas,
            )


class EagleModelRunner(EagleRunnerMixin, ModelRunner):
    """EAGLE draft execution for the FUSED sync path (Config.use_eagle with
    spec_rounds > 1): params + paged KV + the conditioned prefill, with no
    tree cache or async machinery — the superstep program
    (fused_sd.eagle_sd_superstep) drives the chain/verify/accept loop."""

    def __init__(self, config: Config, hf_config=None, init_random=False,
                 mesh=None):
        self._eagle_cfg = config
        ModelRunner.__init__(
            self, config, hf_config=hf_config, is_draft=True,
            init_random=init_random, mesh=mesh,
        )


class EagleDraftRunner(EagleRunnerMixin, DraftRunner):
    """DraftRunner whose model is the EAGLE-3 single-layer conditioned draft."""

    def __init__(self, config: Config, hf_config=None, init_random=False, device=None):
        assert config.jit_speculate, (
            "EAGLE requires jit_speculate=True (cache misses need draft "
            "activations; reference draft_runner.py:41-42)"
        )
        self._eagle_cfg = config
        super().__init__(
            config, hf_config=hf_config, init_random=init_random, device=device
        )

    # --- jit chain (the only miss path in EAGLE) -----------------------------

    def _jit_chain(self, req: SpecRequest):
        B = req.cache_keys.shape[0]
        B_pad = next_pow2(B)
        act_dim = self.arch.num_eagle_layers * self.arch.d_model_target
        first = np.zeros(B_pad, dtype=np.int32)
        base = np.zeros(B_pad, dtype=np.int32)
        temps = np.ones(B_pad, dtype=np.float32)
        rec_acts = np.zeros((B_pad, act_dim), dtype=np.float32)
        bt = np.full((B_pad, req.block_tables.shape[1]), -1, dtype=np.int32)
        first[:B] = req.cache_keys[:, 2]
        base[:B] = req.num_tokens - 2
        temps[:B] = req.temperatures
        rec_acts[:B] = req.recovery_acts
        bt[:B] = req.block_tables
        ctx_pad = self._ctx_bucket(int(base.max()) + 1 + self.K)
        payload = pack_i32(first, base, bt, temps,
                           *_warp_np(req, B_pad), rec_acts,
                           np.int32([self._next_seed()]))
        tokens, logits, prenorms, self.kv_cache = eagle_chain_packed(
            self.params, self.kv_cache, self._upload(payload),
            arch=self.arch, block_size=self.block_size, ctx_pad=ctx_pad,
            K=self.K, B_pad=B_pad, M=bt.shape[1],
            sampler_x=self.sampler_x, F=self.F,
            use_pallas=self.use_pallas, use_warp=self.use_warp,
        )
        # Logits AND activations stay at B_pad rows (the verify program's
        # batch bucket / the tree build's prev_acts operand); ghost rows are
        # never consulted.
        return np.asarray(tokens)[:B], logits, prenorms

    # --- tree rebuild --------------------------------------------------------

    def build_tree(self, req: SpecRequest, resp):
        B = req.cache_keys.shape[0]
        K, MQ = self.K, self.MQ_LEN
        W = 2 * K + 1
        B_pad = next_pow2(B)
        act_dim = self.arch.num_eagle_layers * self.arch.d_model_target

        n_ext = np.zeros(B_pad, dtype=np.int32)
        if req.extend_counts is not None:
            n_ext[:B] = req.extend_counts
        glue_tokens = np.zeros((B_pad, W), dtype=np.int32)
        glue_fc_acts = np.zeros((B_pad, W, act_dim), dtype=np.float32)
        glue_is_fc = np.zeros((B_pad, W), dtype=np.int32)
        for b in range(B):
            ne = int(n_ext[b])
            if ne > 0:
                glue_tokens[b, :ne] = req.extend_token_ids[b, :ne]
                glue_fc_acts[b, :ne] = req.extend_acts[b, :ne]
            glue_tokens[b, ne] = req.cache_keys[b, 2]
            glue_fc_acts[b, ne] = req.recovery_acts[b]
            glue_is_fc[b, : ne + 1] = 1
            glue_tokens[b, ne + 1: ne + 1 + K] = resp.tokens[b]

        # Self-conditioning prenorms for the spec rows are a DEVICE array at
        # the batch bucket (chain output / tree-cache gather); the in-program
        # scatter places them at packed positions (reference :595-599).
        assert resp.activations is not None and (
            resp.activations.shape[0] == B_pad
        ), "EAGLE spec responses must carry B_pad rows of draft activations"

        base = np.zeros(B_pad, dtype=np.int32)
        base[:B] = req.num_tokens - 2
        bt = np.full((B_pad, req.block_tables.shape[1]), -1, dtype=np.int32)
        bt[:B] = req.block_tables
        hits = np.zeros(B_pad, dtype=np.int32)
        hits[:B] = resp.cache_hits
        temps = np.ones(B_pad, dtype=np.float32)
        temps[:B] = req.temperatures

        ctx_pad = self._ctx_bucket(int(base.max()) + 1 + (K + 1) + K * MQ)
        payload = pack_i32(glue_tokens, glue_is_fc, n_ext, base, bt, hits,
                           temps, *_warp_np(req, B_pad), glue_fc_acts,
                           np.int32([self._next_seed()]))
        host_out, spec_logits, spec_acts, self.kv_cache = (
            eagle_tree_build_packed(
                self.params, self.kv_cache, self._upload(payload),
                resp.activations,
                arch=self.arch, block_size=self.block_size, ctx_pad=ctx_pad,
                K=K, MQ_LEN=MQ, B_pad=B_pad, M=bt.shape[1],
                fan_out_list=self.fan_out_list,
                fan_out_list_miss=self.fan_out_list_miss,
                sampler_x=self.sampler_x, F=self.F,
                use_pallas=self.use_pallas, use_warp=self.use_warp,
            )
        )

        # ONE device->host readback; fan indices recomputed host-side.
        try:
            host_out.copy_to_host_async()
        except AttributeError:
            pass
        seq_ids = np.repeat(req.cache_keys[:, 0], MQ)
        fan_np = self._fan_rows(hits[:B]).reshape(-1)
        out_np = np.asarray(host_out)
        fork_np = out_np[:B_pad * MQ].reshape(B_pad, MQ)[:B].reshape(-1)
        self.tree_cache_keys = np.stack(
            [seq_ids, fan_np.astype(np.int64), fork_np.astype(np.int64)], axis=1
        )
        self.tree_cache_tokens = (
            out_np[B_pad * MQ:].reshape(B_pad, MQ, K)[:B].reshape(B * MQ, K)
        )
        self.tree_cache_logits = spec_logits  # [B_pad*MQ, K, V]
        self.tree_cache_acts = spec_acts      # [B_pad*MQ, K, D]
