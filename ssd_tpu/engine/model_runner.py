"""Per-model execution: weights, paged KV cache, and shape-bucketed jitted
step programs.

Parity: /root/reference/ssd/engine/model_runner.py — but the whole process
topology (NCCL groups, SharedMemory RPC, CUDA-graph capture) collapses into
one SPMD JAX program per phase:
 - CUDA graphs (cudagraph_helpers.py) -> jax.jit with power-of-2 batch /
   context buckets; replay padding with ghost sequences (slot=-1) carries over
   (cudagraph_helpers.py:25-57).
 - TP process group -> NamedSharding over an ICI mesh axis; XLA inserts and
   overlaps the per-layer all-reduces (linear.py:196-199 equivalent).
 - KV cache: one [L, H_kv, S, 2*hd] array (K/V interleaved on the minor
   axis for 128-lane-aligned page DMAs; see ssd_tpu.ops.attention), flat
   slots, donated through every step so XLA updates it in place
   (model_runner.py:484-503 equivalent).

Host-side input prep (prepare_* methods) mirrors runner_helpers.py and stays
in numpy, off the XLA trace.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tpu.config import Config
from ssd_tpu.engine.sequence import Sequence
from ssd_tpu.models.transformer import Arch, compute_logits, forward_hidden, init_params
from ssd_tpu.ops import attention as att
from ssd_tpu.ops.sampler import sample
from ssd_tpu.parallel.mesh import shard_params


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def slot_of(block_tables, positions_flat, b_of_row, block_size: int):
    """Flat cache slot for each (row, position); -1 where the table entry is
    -1 (ghost rows / padding) OR the position falls past the table entirely
    (context-limit overshoot: without the explicit -1, the gather would clamp
    to the LAST real block and corrupt committed KV). Shared by the chain,
    tree, and EAGLE programs."""
    M = block_tables.shape[1]
    blk = positions_flat // block_size
    blk_ids = block_tables[b_of_row, jnp.minimum(blk, M - 1)]
    slot = blk_ids * block_size + positions_flat % block_size
    return jnp.where((blk_ids < 0) | (blk >= M), -1, slot).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Jitted step programs (module-level so jax.jit caches across runner calls)
# ---------------------------------------------------------------------------
#
# Each phase has two entries: the explicit-argument program (used by tests and
# the graft entry) and a *_packed variant taking ONE flat int32 array that is
# sliced apart in-program — slices are free under jit, so packing trades N
# small host->device transfers per step for a single contiguous one (the TPU
# analogue of the reference's fused-int64 NCCL payload,
# /root/reference/ssd/utils/async_helpers/nccl_pack.py:5-32). Float payloads
# (temperatures) travel as raw bits; the PRNG key is derived in-program from a
# packed seed so no separate key transfer or host-side split dispatch exists.


def _key_from(seed_i32):
    return jax.random.PRNGKey(seed_i32)


def _f32(bits_i32):
    return jax.lax.bitcast_convert_type(bits_i32, jnp.float32)


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "q_len", "use_pallas",
                     "eagle_layers"),
    donate_argnames=("kv_cache",),
)
def decode_step(
    params,
    kv_cache,
    input_ids,      # [B*q_len]
    positions,      # [B*q_len]
    slot_map,       # [B*q_len]
    block_tables,   # [B, M]
    context_lens,   # [B]
    temperatures,   # [B]
    key,
    top_ps=None,    # [B] nucleus filter (Config.enable_top_sampling)
    top_ks=None,    # [B]
    *,
    arch: Arch,
    block_size: int,
    ctx_pad: int,
    q_len: int,
    use_pallas: bool = False,
    eagle_layers: tuple[int, ...] | None = None,
):
    """Batched decode with q_len queries per sequence: q_len=1 is AR decode,
    q_len=K+1 is the spec verify / glue forward. Returns (sampled last-token
    ids [B], logits [B*q_len, V], eagle acts [B*q_len, 3D] or None, updated
    cache)."""
    B = block_tables.shape[0]
    scale = arch.head_dim ** -0.5

    def attn_call(q, k, v, kv_layer):
        kv_layer = att.store_kv(kv_layer, k, v, slot_map)
        qr = q.reshape(B, q_len, arch.num_heads, arch.head_dim)
        if use_pallas:
            from ssd_tpu.ops import pallas_attention as patt

            o = patt.paged_attention_best(
                qr, kv_layer, block_tables, context_lens,
                jnp.full((B,), q_len, jnp.int32), block_size, ctx_pad, scale, s8=use_pallas == "s8",
            )
        else:
            o = att.paged_attention(
                qr, kv_layer, block_tables, context_lens, block_size, ctx_pad,
                scale,
            )
        return o.reshape(B * q_len, arch.num_heads, arch.head_dim), kv_layer

    out = forward_hidden(
        params, kv_cache, input_ids, positions, attn_call, arch,
        eagle_layers=eagle_layers,
    )
    hidden, kv_cache = out[0], out[1]
    acts = out[2] if eagle_layers else None
    logits = compute_logits(params, hidden, arch)          # [B*q_len, V]
    last = logits.reshape(B, q_len, -1)[:, -1, :]
    tokens = sample(last, temperatures, key, top_p=top_ps, top_k=top_ks)
    return tokens, logits, acts, kv_cache


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "s_pad", "use_pallas",
                     "eagle_layers"),
    donate_argnames=("kv_cache",),
)
def batched_prefill_step(
    params,
    kv_cache,
    input_ids,      # [B*s_pad]
    positions,      # [B*s_pad]
    slot_map,       # [B*s_pad]
    block_tables,   # [B, M]
    context_lens,   # [B] total length incl. new tokens
    qeff,           # [B] true new-token count per sequence
    temperatures,   # [B]
    key,
    top_ps=None,    # [B] nucleus filter (Config.enable_top_sampling)
    top_ks=None,    # [B]
    *,
    arch: Arch,
    block_size: int,
    ctx_pad: int,
    s_pad: int,
    use_pallas: bool = False,
    eagle_layers: tuple[int, ...] | None = None,
):
    """Whole-batch (possibly prefix-cached, ragged) prefill as ONE dispatch:
    per-sequence true lengths flow through the paged-attention qeff contract,
    replacing the reference's varlen flash-attention prefill
    (runner_helpers.py:123-180). Returns (first sampled tokens [B],
    last-token logits [B, V], eagle acts [B*s_pad, 3D] | None, cache)."""
    B = block_tables.shape[0]
    scale = arch.head_dim ** -0.5

    def attn_call(q, k, v, kv_layer):
        kv_layer = att.store_kv(kv_layer, k, v, slot_map)
        qr = q.reshape(B, s_pad, arch.num_heads, arch.head_dim)
        if use_pallas:
            from ssd_tpu.ops import pallas_attention as patt

            o = patt.paged_attention_best(
                qr, kv_layer, block_tables, context_lens, qeff,
                block_size, ctx_pad, scale, s8=use_pallas == "s8",
            )
        else:
            o = att.paged_attention(
                qr, kv_layer, block_tables, context_lens, block_size,
                ctx_pad, scale, qeff=qeff,
            )
        return o.reshape(B * s_pad, arch.num_heads, arch.head_dim), kv_layer

    out = forward_hidden(
        params, kv_cache, input_ids, positions, attn_call, arch,
        eagle_layers=eagle_layers,
    )
    hidden, kv_cache = out[0], out[1]
    acts = out[2] if eagle_layers else None
    gather_idx = jnp.arange(B) * s_pad + jnp.maximum(qeff - 1, 0)
    logits = compute_logits(params, hidden, arch, gather_idx=gather_idx)  # [B, V]
    tokens = sample(logits, temperatures, key, top_p=top_ps, top_k=top_ks)
    return tokens, logits, acts, kv_cache


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "K", "sampler_x", "fan_out",
                     "tree_sampling", "use_pallas", "extra_write"),
    donate_argnames=("kv_cache",),
)
def chain_decode_step(
    params,
    kv_cache,
    first_tokens,        # [B] (the recovery tokens)
    start_positions,     # [B] position of first_tokens
    block_tables,        # [B, M]
    start_context_lens,  # [B] context length incl. first_tokens
    temperatures,        # [B]
    key,
    top_ps=None,         # [B] nucleus filter (Config.enable_top_sampling)
    top_ks=None,         # [B]
    *,
    arch: Arch,
    block_size: int,
    ctx_pad: int,
    K: int,
    sampler_x: float | None = None,
    fan_out: int = 3,
    tree_sampling: bool = False,
    use_pallas: bool = False,
    extra_write: bool = True,
):
    """K (+1) sequential single-token decodes as ONE program (lax.scan over
    depth): the draft chain of sync spec decode (reference
    speculator_sync.py:47-67 runs K+1 separate forwards; here the whole chain
    is a single XLA dispatch). With extra_write, a final forward writes the
    K-th token's KV, matching the reference draft; AR multi-step decoding
    skips it (the next dispatch rewrites that slot anyway).

    Returns (tokens [B, K], logits_q [B, K, V], updated cache).
    """
    B = first_tokens.shape[0]
    scale = arch.head_dim ** -0.5

    def step(carry, i):
        kv, tok = carry
        positions = start_positions + i
        context_lens = start_context_lens + i
        slot_map = slot_of(block_tables, positions, jnp.arange(B), block_size)

        def attn_call(q, k, v, kv_layer):
            kv_layer = att.store_kv(kv_layer, k, v, slot_map)
            qr = q.reshape(B, 1, arch.num_heads, arch.head_dim)
            if use_pallas:
                from ssd_tpu.ops import pallas_attention as patt

                o = patt.paged_attention_best(
                    qr, kv_layer, block_tables, context_lens,
                    jnp.ones((B,), jnp.int32), block_size, ctx_pad, scale, s8=use_pallas == "s8",
                )
            else:
                o = att.paged_attention(
                    qr, kv_layer, block_tables, context_lens, block_size,
                    ctx_pad, scale,
                )
            return o.reshape(B, arch.num_heads, arch.head_dim), kv_layer

        hidden, kv = forward_hidden(params, kv, tok, positions, attn_call, arch)
        logits = compute_logits(params, hidden, arch)  # [B, V]
        next_tok = sample(
            logits, temperatures, jax.random.fold_in(key, i),
            sampler_x=sampler_x, fan_out=fan_out, is_tree=tree_sampling,
            top_p=top_ps, top_k=top_ks,
        )
        return (kv, next_tok), (next_tok, logits)

    n_steps = K + 1 if extra_write else K
    (kv_cache, _), (toks, logits) = jax.lax.scan(
        step, (kv_cache, first_tokens), jnp.arange(n_steps)
    )
    # Step i consumes t_i, emits (t_{i+1}, logits_i): keep t_1..t_K and
    # logits_0..logits_{K-1}.
    return toks[:K].T, logits[:K].transpose(1, 0, 2), kv_cache


# --- packed variants: ONE int32 payload per dispatch -----------------------


def pack_i32(*arrays) -> np.ndarray:
    """Concatenate int/float numpy arrays into one flat int32 payload
    (float32 travels as raw bits)."""
    parts = []
    for a in arrays:
        a = np.ascontiguousarray(a)
        if a.dtype == np.float32:
            parts.append(a.view(np.int32).reshape(-1))
        else:
            parts.append(a.astype(np.int32, copy=False).reshape(-1))
    return np.concatenate(parts)


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "q_len", "B_pad", "M",
                     "use_pallas", "eagle_layers", "use_warp"),
    donate_argnames=("kv_cache",),
)
def decode_step_packed(
    params, kv_cache, packed, *,
    arch: Arch, block_size: int, ctx_pad: int, q_len: int, B_pad: int, M: int,
    use_pallas: bool = False, eagle_layers: tuple[int, ...] | None = None,
    use_warp: bool = False,
):
    """decode_step with its entire per-step metadata in one flat int32 array:
    [ids(B*q) | pos(B*q) | slots(B*q) | block_tables(B*M) | ctx(B) |
     temp_bits(B) | (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]."""
    T = B_pad * q_len
    bt_end = 3 * T + B_pad * M
    o = bt_end + 2 * B_pad
    warp = ((_f32(packed[o:o + B_pad]), packed[o + B_pad:o + 2 * B_pad])
            if use_warp else (None, None))
    o += 2 * B_pad if use_warp else 0
    return decode_step(
        params, kv_cache,
        packed[:T], packed[T:2 * T], packed[2 * T:3 * T],
        packed[3 * T:bt_end].reshape(B_pad, M),
        packed[bt_end:bt_end + B_pad],
        _f32(packed[bt_end + B_pad:bt_end + 2 * B_pad]),
        _key_from(packed[o]),
        warp[0], warp[1],
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, q_len=q_len,
        use_pallas=use_pallas, eagle_layers=eagle_layers,
    )


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "s_pad", "B_pad", "M",
                     "use_pallas", "eagle_layers", "use_warp"),
    donate_argnames=("kv_cache",),
)
def prefill_step_packed(
    params, kv_cache, packed, *,
    arch: Arch, block_size: int, ctx_pad: int, s_pad: int, B_pad: int, M: int,
    use_pallas: bool = False, eagle_layers: tuple[int, ...] | None = None,
    use_warp: bool = False,
):
    """batched_prefill_step with one flat int32 payload:
    [ids(B*s) | pos(B*s) | slots(B*s) | block_tables(B*M) | ctx(B) | qeff(B) |
     temp_bits(B) | (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]."""
    T = B_pad * s_pad
    bt_end = 3 * T + B_pad * M
    o = bt_end + 3 * B_pad
    warp = ((_f32(packed[o:o + B_pad]), packed[o + B_pad:o + 2 * B_pad])
            if use_warp else (None, None))
    o += 2 * B_pad if use_warp else 0
    return batched_prefill_step(
        params, kv_cache,
        packed[:T], packed[T:2 * T], packed[2 * T:3 * T],
        packed[3 * T:bt_end].reshape(B_pad, M),
        packed[bt_end:bt_end + B_pad],
        packed[bt_end + B_pad:bt_end + 2 * B_pad],
        _f32(packed[bt_end + 2 * B_pad:bt_end + 3 * B_pad]),
        _key_from(packed[o]),
        warp[0], warp[1],
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, s_pad=s_pad,
        use_pallas=use_pallas, eagle_layers=eagle_layers,
    )


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "use_pallas"),
    donate_argnames=("kv_cache",),
)
def flat_prefill_step(
    params,
    kv_cache,
    input_ids,      # [T_pad] ALL sequences' new tokens, concatenated
    positions,      # [T_pad]
    slot_map,       # [T_pad]
    flat_pages,     # [P_pad] per-seq attended-page runs, concatenated
    row_lo,         # [T_pad] flat-context interval start per token
    row_hi,         # [T_pad] interval end (padding tokens: lo == hi == 0)
    gather_idx,     # [B_pad] flat index of each sequence's last new token
    temperatures,   # [B_pad]
    key,
    top_ps=None,    # [B_pad] nucleus filter (Config.enable_top_sampling)
    top_ks=None,    # [B_pad]
    *,
    arch: Arch,
    block_size: int,
    use_pallas: bool = False,
):
    """Mixed-length prefill as ONE flat-packed dispatch (no per-bucket
    dispatches, no pow2 per-sequence padding): the TPU-native form of the
    reference's flash_attn_varlen_func prefill
    (/root/reference/ssd/layers/attention.py:90-93). Attention windows are
    per-token intervals of a packed page stream — see
    ops/pallas_attention.py::flat_prefill_attention. EAGLE taps are not
    produced here (EAGLE prefill keeps the grouped path)."""
    scale = arch.head_dim ** -0.5

    def attn_call(q, k, v, kv_layer):
        kv_layer = att.store_kv(kv_layer, k, v, slot_map)
        if use_pallas:
            from ssd_tpu.ops import pallas_attention as patt

            o = patt.flat_prefill_attention(
                q, kv_layer, flat_pages, row_lo, row_hi, block_size, scale,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            dense = att.dense_pages(kv_layer, flat_pages, block_size)
            o = att.flat_prefill_attention(q, dense, row_lo, row_hi, scale)
        return o, kv_layer

    hidden, kv_cache = forward_hidden(
        params, kv_cache, input_ids, positions, attn_call, arch
    )[:2]
    logits = compute_logits(params, hidden, arch, gather_idx=gather_idx)
    tokens = sample(logits, temperatures, key, top_p=top_ps, top_k=top_ks)
    return tokens, logits, kv_cache


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "T_pad", "P_pad", "B_pad",
                     "use_pallas", "use_warp"),
    donate_argnames=("kv_cache",),
)
def flat_prefill_step_packed(
    params, kv_cache, packed, *,
    arch: Arch, block_size: int, T_pad: int, P_pad: int, B_pad: int,
    use_pallas: bool = False, use_warp: bool = False,
):
    """flat_prefill_step with one flat int32 payload:
    [ids(T) | pos(T) | slots(T) | pages(P) | lo(T) | hi(T) | gather(B) |
     temp_bits(B) | (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]."""
    T, P, B = T_pad, P_pad, B_pad
    p_end = 3 * T + P
    o = p_end + 2 * T + 2 * B
    warp = ((_f32(packed[o:o + B]), packed[o + B:o + 2 * B])
            if use_warp else (None, None))
    o += 2 * B if use_warp else 0
    return flat_prefill_step(
        params, kv_cache,
        packed[:T], packed[T:2 * T], packed[2 * T:3 * T],
        packed[3 * T:p_end],
        packed[p_end:p_end + T], packed[p_end + T:p_end + 2 * T],
        packed[p_end + 2 * T:p_end + 2 * T + B],
        _f32(packed[p_end + 2 * T + B:p_end + 2 * T + 2 * B]),
        _key_from(packed[o]),
        warp[0], warp[1],
        arch=arch, block_size=block_size, use_pallas=use_pallas,
    )


@partial(
    jax.jit,
    static_argnames=("arch", "block_size", "ctx_pad", "K", "B_pad", "M",
                     "sampler_x", "fan_out", "tree_sampling", "use_pallas",
                     "extra_write", "use_warp"),
    donate_argnames=("kv_cache",),
)
def chain_decode_step_packed(
    params, kv_cache, packed, *,
    arch: Arch, block_size: int, ctx_pad: int, K: int, B_pad: int, M: int,
    sampler_x: float | None = None, fan_out: int = 3,
    tree_sampling: bool = False, use_pallas: bool = False,
    extra_write: bool = True, use_warp: bool = False,
):
    """chain_decode_step with one flat int32 payload:
    [first(B) | start_pos(B) | block_tables(B*M) | ctx0(B) | temp_bits(B) |
     (top_p_bits(B) | top_k(B) when use_warp) | seed(1)]."""
    B = B_pad
    bt_end = 2 * B + B * M
    o = bt_end + 2 * B
    warp = ((_f32(packed[o:o + B]), packed[o + B:o + 2 * B])
            if use_warp else (None, None))
    o += 2 * B if use_warp else 0
    return chain_decode_step(
        params, kv_cache,
        packed[:B], packed[B:2 * B],
        packed[2 * B:bt_end].reshape(B, M),
        packed[bt_end:bt_end + B],
        _f32(packed[bt_end + B:bt_end + 2 * B]),
        _key_from(packed[o]),
        warp[0], warp[1],
        arch=arch, block_size=block_size, ctx_pad=ctx_pad, K=K,
        sampler_x=sampler_x, fan_out=fan_out, tree_sampling=tree_sampling,
        use_pallas=use_pallas, extra_write=extra_write,
    )


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------

class ModelRunner:
    """Owns one model's device state and serves phase programs to the engine."""

    def __init__(
        self,
        config: Config,
        model_path: str | None = None,
        hf_config=None,
        is_draft: bool = False,
        mesh=None,
        init_random: bool = False,
        device=None,
    ):
        self.config = config
        self.is_draft = is_draft
        self.device = device
        self.model_path = model_path or config.model
        self.hf_config = hf_config or config.hf_config
        self.arch = self._make_arch()
        self.block_size = config.kvcache_block_size
        self.max_blocks = config.max_blocks
        self.mesh = mesh
        if getattr(self.arch, "num_experts", 0):
            # Expert weights are sharded over tp (expert parallelism): the
            # decode-time selected-expert gather would make GSPMD move whole
            # weight shards across the mesh, and ragged_dot's data-dependent
            # group sizes cannot be placed on the sharded expert axis — keep
            # the dense all-expert form there (and when a flag disables a
            # path explicitly, e.g. as the numerics control in benches).
            import dataclasses

            ep_sharded = mesh is not None and mesh.shape.get("tp", 1) > 1
            repl = {}
            if not config.moe_gather or ep_sharded:
                repl["moe_gather"] = False
            if not config.moe_ragged or ep_sharded:
                repl["moe_ragged"] = False
            if repl:
                self.arch = dataclasses.replace(self.arch, **repl)
        self.dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        # Pallas kernels: auto-on for the TPU backend, jnp reference elsewhere.
        self.use_pallas = (
            config.use_pallas
            if config.use_pallas is not None
            else jax.default_backend() == "tpu"
        )
        if self.use_pallas and config.kv_quant == "int8_mxu":
            # Native s8 x s8 MXU dots in the int8-KV DECODE/VERIFY/TREE
            # kernels: use_pallas widens to the static tag "s8" (still
            # truthy), which every step program forwards into the kernel
            # dispatch — so the mode is part of each program's jit key, never
            # a module global. Prefill is unaffected by design: it is
            # compute-bound and dequantizes in the XLA dense-gather, not in
            # a kernel (flat_prefill_attention / paged_attention_prefill).
            self.use_pallas = "s8"

        # Target-side EAGLE activation taps (draft conditioning source).
        self.eagle_layers = (
            tuple(config.eagle_layers)
            if (config.use_eagle and not is_draft and config.eagle_layers)
            else None
        )

        self.key = jax.random.PRNGKey(config.seed + (1 if is_draft else 0))
        # Host-side PRNG seed chain for the packed step programs: the key is
        # derived in-program from one packed int32, so no device-side
        # jax.random.split dispatch (or separate key transfer) happens per
        # step.
        self._seed_state = (config.seed * 2654435761 + (1 if is_draft else 0)) & 0x7FFFFFFF

        # Static per engine: requests with top_p/top_k are only accepted
        # when the warp is compiled into the programs (llm_engine gates).
        self.use_warp = config.enable_top_sampling

        self.params = self._make_params(init_random)
        if config.quantization not in (None, "int8"):
            raise ValueError(f"unknown quantization {config.quantization!r}")
        if config.quantization == "int8":
            # Weight-only int8 (utils/quant.py); EAGLE drafts have their own
            # flat param layout (the full-vocab draft head is most of their
            # per-step bytes, so they quantize too).
            if "layers" in self.params:
                from ssd_tpu.utils.quant import quantize_params

                self.params = quantize_params(self.params)
            elif "fc" in self.params:
                from ssd_tpu.utils.quant import quantize_eagle_params

                self.params = quantize_eagle_params(self.params)
        if mesh is not None:
            self.params = shard_params(self.params, mesh)
        elif device is not None:
            # Pin this model to a dedicated chip (the async draft's device) —
            # the TPU equivalent of the reference running the draft on the
            # last GPU (llm_engine.py:82-89).
            self.params = jax.device_put(self.params, device)

        self.num_kvcache_blocks = self._decide_num_blocks()
        config.num_kvcache_blocks = self.num_kvcache_blocks
        self.kv_cache = self._allocate_kv_cache()

        # Multi-controller SPMD (num_hosts > 1): jit inputs must be GLOBAL
        # arrays, so packed payloads are device_put with a fully-replicated
        # sharding over the global mesh (every host computes the identical
        # payload from its identical scheduler state).
        self._payload_sharding = None
        if mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            self._payload_sharding = NamedSharding(mesh, PartitionSpec())

    def _upload(self, payload: np.ndarray):
        if self._payload_sharding is not None:
            return jax.device_put(payload, self._payload_sharding)
        return jnp.asarray(payload)

    def _next_seed(self) -> int:
        """LCG over int31: one fresh sampling seed per packed dispatch."""
        self._seed_state = (self._seed_state * 1103515245 + 12345) & 0x7FFFFFFF
        return self._seed_state

    # --- model construction (overridden by the EAGLE draft runner) ---

    def _make_arch(self):
        return Arch.from_model_config(self.hf_config)

    def _make_params(self, init_random: bool):
        if init_random:
            return init_params(self.arch, jax.random.PRNGKey(0), self.dtype)
        from ssd_tpu.utils.loader import load_params

        return load_params(self.model_path, self.hf_config, self.dtype)

    # --- memory sizing (reference model_runner.py:446-482) ---

    def _decide_num_blocks(self) -> int:
        if self.config.num_kvcache_blocks != -1:
            return self.config.num_kvcache_blocks
        a = self.arch
        # int8 KV: 1 byte/element + 2 f32 scales per (token, head).
        elem = (1 if self.config.kv_quant in ("int8", "int8_mxu")
                else jnp.dtype(self.dtype).itemsize)
        block_bytes = (
            2 * a.num_layers * self.block_size * a.num_kv_heads
            * (a.head_dim * elem
               + (4 if self.config.kv_quant in ("int8", "int8_mxu") else 0))
        )
        try:
            # Size from THIS runner's device (the pinned draft chip differs
            # from the target's device 0).
            dev = self.device if self.device is not None else jax.local_devices()[0]
            stats = dev.memory_stats()
            limit = stats["bytes_limit"] * self.config.hbm_memory_utilization
            avail = int(limit) - stats["bytes_in_use"]
        except Exception:
            # CPU / backends without memory stats: enough for max_num_seqs
            # full-length sequences plus slack.
            return max(
                64,
                self.config.max_num_seqs * self.config.max_blocks * 2,
            )
        num = max(16, int(avail // block_bytes))
        # No point exceeding what max_num_seqs full-length sequences can use
        # (plus spec lookahead slack).
        cap = (self.config.max_num_seqs + 1) * (self.config.max_blocks + 2) * 4
        return min(num, cap)

    def _allocate_kv_cache(self) -> jnp.ndarray:
        a = self.arch
        S = self.num_kvcache_blocks * self.block_size
        shape = (a.num_layers, a.num_kv_heads, S, 2 * a.head_dim)
        dev = self.device
        if self.mesh is not None:
            from ssd_tpu.parallel.mesh import kv_sharding

            dev = kv_sharding(self.mesh, a.num_kv_heads)

        def z(shp, dt):
            return jnp.zeros(shp, dt) if dev is None else jnp.zeros(shp, dt, device=dev)

        if self.config.kv_quant in ("int8", "int8_mxu"):
            # (int8 data, per-(token, head, K/V) f32 scales); scales carry a
            # floor value so never-written slots dequantize to exact zeros
            # without special-casing. Sharding note: the scales' head axis is
            # dim 1 like the data's, so the same NamedSharding applies.
            scales = jnp.full((a.num_layers, a.num_kv_heads, 2, S), 1e-10,
                              jnp.float32)
            if dev is not None:
                scales = jax.device_put(scales, dev)
            return (z(shape, jnp.int8), scales)
        return z(shape, self.dtype)

    # --- host-side input prep (runner_helpers.py equivalents) ---

    def _block_table_array(self, seqs: list[Sequence], draft: bool) -> np.ndarray:
        out = np.full((len(seqs), self.max_blocks), -1, dtype=np.int32)
        for i, seq in enumerate(seqs):
            table = seq.draft_block_table if draft else seq.block_table
            out[i, : len(table)] = table
        return out

    def _warp_parts(self, seqs: list[Sequence], B_pad: int) -> tuple:
        """(top_p f32, top_k i32) payload segments, or () when the engine
        compiles without the sampling warp (Config.enable_top_sampling)."""
        if not self.use_warp:
            return ()
        tp = np.ones(B_pad, dtype=np.float32)
        tk = np.zeros(B_pad, dtype=np.int32)
        for i, seq in enumerate(seqs):
            tp[i] = seq.top_p
            tk[i] = seq.top_k
        return (tp, tk)

    def _ctx_bucket(self, need: int) -> int:
        limit = self.max_blocks * self.block_size
        if self.config.ctx_bucket_policy == "single":
            return limit
        pad = max(self.block_size, next_pow2(need))
        return min(pad, limit)

    # --- phases ---

    def run_prefill(self, seqs: list[Sequence], last_only: bool = True,
                    return_acts: bool = False):
        """Prefill the scheduled batch: sequences are grouped by the pow-2
        bucket of their new-token count and each group runs as one padded
        dispatch, so mixed-length batches cost ~sum(2*len_i) query rows
        instead of B * max(len_i) (the padded-batch analogue of the
        reference's varlen packing, runner_helpers.py:123-180). Returns
        sampled first tokens [B] in input order (and, with return_acts in
        EAGLE mode, per-seq activation arrays [num_tokens, 3D] on the host).
        """
        # Flat-packed path: the whole mixed-length batch as ONE dispatch with
        # exact per-token attention windows (no per-bucket dispatches, no
        # pow2 per-seq padding). EAGLE needs per-seq activation rows and
        # keeps the grouped path.
        if (self.config.flat_prefill and not self.eagle_layers
                and not return_acts):
            return self._run_prefill_flat(seqs)
        buckets: dict[int, list[int]] = {}
        for i, seq in enumerate(seqs):
            cached = (
                seq.num_draft_cached_tokens if self.is_draft
                else seq.num_cached_tokens
            )
            if self.eagle_layers and cached > 0 and seq.prefill_chunk is None:
                cached = 0
            cached = min(cached, seq.num_tokens - 1)
            n_new = seq.num_tokens - cached
            if seq.prefill_chunk is not None:
                n_new = min(n_new, seq.prefill_chunk)
            buckets.setdefault(next_pow2(max(8, n_new)), []).append(i)
        if len(buckets) == 1:
            return self._run_prefill_group(seqs, return_acts)

        # Intra-batch prefix sharing (two admitted prompts with a common
        # prefix hit the same cache blocks): the consumer's attention must
        # see the writer's KV, which one dispatch guarantees and a grouped
        # split might reorder — so share => single padded dispatch.
        tables = [
            seq.draft_block_table if self.is_draft else seq.block_table
            for seq in seqs
        ]
        if len(set().union(*map(set, tables))) < sum(map(len, tables)):
            return self._run_prefill_group(seqs, return_acts)

        tokens_out: list[int | None] = [None] * len(seqs)
        acts_out: list = [None] * len(seqs)
        for _, idxs in sorted(buckets.items()):
            group = [seqs[i] for i in idxs]
            if return_acts:
                toks, acts = self._run_prefill_group(group, True)
                for i, t, a in zip(idxs, toks, acts):
                    tokens_out[i], acts_out[i] = t, a
            else:
                for i, t in zip(idxs, self._run_prefill_group(group, False)):
                    tokens_out[i] = t
        if return_acts:
            return tokens_out, acts_out
        return tokens_out

    def _run_prefill_flat(self, seqs: list[Sequence]):
        """One flat-packed dispatch for the whole (possibly mixed-length,
        possibly prefix-cached/-shared) prefill batch. Intra-batch prefix
        sharing is safe here for the same reason as in a single grouped
        dispatch: every layer's store_kv covers ALL sequences before its
        attention reads."""
        draft = self.is_draft
        B = len(seqs)
        cached_list, n_new_list, pages_per = [], [], []
        bt_rows = self._block_table_array(seqs, draft)
        for seq in seqs:
            cached = seq.num_draft_cached_tokens if draft else seq.num_cached_tokens
            cached = min(cached, seq.num_tokens - 1)
            n_new = seq.num_tokens - cached
            if seq.prefill_chunk is not None:
                n_new = min(n_new, seq.prefill_chunk)
            cached_list.append(cached)
            n_new_list.append(n_new)
            pages_per.append(
                (cached + n_new + self.block_size - 1) // self.block_size
            )
        T = sum(n_new_list)
        T_pad = next_pow2(max(8, T))
        P_pad = next_pow2(max(2, sum(pages_per)))
        B_pad = next_pow2(B)

        input_ids = np.zeros(T_pad, dtype=np.int32)
        positions = np.zeros(T_pad, dtype=np.int32)
        slot_map = np.full(T_pad, -1, dtype=np.int32)
        flat_pages = np.full(P_pad, -1, dtype=np.int32)
        row_lo = np.zeros(T_pad, dtype=np.int32)
        row_hi = np.zeros(T_pad, dtype=np.int32)
        gather_idx = np.zeros(B_pad, dtype=np.int32)
        temps = np.ones(B_pad, dtype=np.float32)

        tok_off = page_off = 0
        from ssd_tpu.utils.native import prepare_prefill

        for i, seq in enumerate(seqs):
            cached, n_new = cached_list[i], n_new_list[i]
            sl = slice(tok_off, tok_off + n_new)
            input_ids[sl] = seq.token_ids[cached:cached + n_new]
            pos_i, slots_i = prepare_prefill(
                bt_rows[i], cached, n_new, self.block_size, n_new
            )
            positions[sl], slot_map[sl] = pos_i, slots_i
            flat_pages[page_off:page_off + pages_per[i]] = (
                bt_rows[i][:pages_per[i]]
            )
            base = page_off * self.block_size
            # Token at prompt position p sees flat context [base, base+p+1).
            row_lo[sl] = base
            row_hi[sl] = base + pos_i + 1
            gather_idx[i] = tok_off + n_new - 1
            temps[i] = seq.temperature
            tok_off += n_new
            page_off += pages_per[i]

        payload = pack_i32(input_ids, positions, slot_map, flat_pages,
                           row_lo, row_hi, gather_idx, temps,
                           *self._warp_parts(seqs, B_pad),
                           np.int32([self._next_seed()]))
        tokens, _, self.kv_cache = flat_prefill_step_packed(
            self.params, self.kv_cache, self._upload(payload),
            arch=self.arch, block_size=self.block_size,
            T_pad=T_pad, P_pad=P_pad, B_pad=B_pad,
            use_pallas=self.use_pallas, use_warp=self.use_warp,
        )
        return np.asarray(tokens)[:B].tolist()

    def _run_prefill_group(self, seqs: list[Sequence], return_acts: bool):
        """One padded prefill dispatch (ragged lengths via per-seq qeff)."""
        from ssd_tpu.utils.native import prepare_prefill

        draft = self.is_draft
        B = len(seqs)
        B_pad = next_pow2(B)
        cached_list, n_new_list = [], []
        for seq in seqs:
            cached = seq.num_draft_cached_tokens if draft else seq.num_cached_tokens
            if self.eagle_layers and cached > 0 and seq.prefill_chunk is None:
                # The draft needs conditioning acts for EVERY prompt token;
                # recompute prefix-cached spans (KV rewrite is idempotent).
                # Partial-chunk dispatches (prefill_chunk set) are exempt:
                # they only write KV forward, and the FINAL acts-producing
                # prefill (chunk cleared, return_acts=True) recomputes the
                # whole prompt for conditioning anyway.
                cached = 0
            # Fully prefix-cached prompt: recompute the last token so real
            # last-token logits exist to sample the first output from.
            cached = min(cached, seq.num_tokens - 1)
            n_new = seq.num_tokens - cached
            if seq.prefill_chunk is not None:
                n_new = min(n_new, seq.prefill_chunk)
            cached_list.append(cached)
            n_new_list.append(n_new)
        s_pad = next_pow2(max(8, max(n_new_list)))

        input_ids = np.zeros((B_pad, s_pad), dtype=np.int32)
        positions = np.zeros((B_pad, s_pad), dtype=np.int32)
        slot_map = np.full((B_pad, s_pad), -1, dtype=np.int32)
        context_lens = np.ones(B_pad, dtype=np.int32)
        qeff = np.ones(B_pad, dtype=np.int32)
        temps = np.ones(B_pad, dtype=np.float32)
        bt = np.full((B_pad, self.max_blocks), -1, dtype=np.int32)
        bt[:B] = self._block_table_array(seqs, draft)
        for i, seq in enumerate(seqs):
            cached, n_new = cached_list[i], n_new_list[i]
            input_ids[i, :n_new] = seq.token_ids[cached:cached + n_new]
            positions[i], slot_map[i] = prepare_prefill(
                bt[i], cached, n_new, self.block_size, s_pad
            )
            # Chunked prefill: attention context ends at the chunk (later
            # prompt positions have no KV yet).
            context_lens[i] = cached + n_new
            qeff[i] = n_new
            temps[i] = seq.temperature

        ctx_pad = self._ctx_bucket(int(context_lens.max()))
        payload = pack_i32(input_ids, positions, slot_map, bt, context_lens,
                           qeff, temps, *self._warp_parts(seqs, B_pad),
                           np.int32([self._next_seed()]))
        tokens, _, acts, self.kv_cache = prefill_step_packed(
            self.params, self.kv_cache, self._upload(payload),
            arch=self.arch, block_size=self.block_size,
            ctx_pad=ctx_pad, s_pad=s_pad, B_pad=B_pad, M=self.max_blocks,
            use_pallas=self.use_pallas, eagle_layers=self.eagle_layers,
            use_warp=self.use_warp,
        )
        token_list = np.asarray(tokens)[:B].tolist()
        if return_acts:
            acts_np = np.asarray(acts).reshape(B_pad, s_pad, -1)
            acts_rows = [acts_np[i, : n_new_list[i]] for i in range(B)]
            return token_list, acts_rows
        return token_list

    def _prepare_multi_query(self, seqs: list[Sequence], q_len: int, draft: bool):
        """Tensorise a uniform q_len-per-seq decode batch, padded to a pow-2
        batch bucket with ghost rows (slot=-1). The per-token indexing runs in
        the native host library (native/ssd_host.cpp)."""
        from ssd_tpu.utils.native import prepare_multi_query

        B = len(seqs)
        B_pad = next_pow2(B)
        tails = np.asarray(
            [seq.token_ids[-q_len:] for seq in seqs], dtype=np.int32
        ).reshape(B, q_len)
        num_tokens = np.asarray([seq.num_tokens for seq in seqs], dtype=np.int32)
        bt = np.zeros((B_pad, self.max_blocks), dtype=np.int32)
        bt[:B] = self._block_table_array(seqs, draft)

        input_ids, positions, slot_map, context_lens = prepare_multi_query(
            tails, num_tokens, bt, q_len, self.block_size, B_pad
        )
        temps = np.ones(B_pad, dtype=np.float32)
        temps[:B] = [seq.temperature for seq in seqs]
        return input_ids, positions, slot_map, bt, context_lens, temps, B_pad

    def run_decode(
        self,
        seqs: list[Sequence],
        q_len: int = 1,
        return_logits: bool = False,
        temps_override: np.ndarray | None = None,
        return_acts: bool = False,
    ):
        """Batched decode/verify forward. Returns (tokens list[B], logits
        device array [B, q_len, V] or None)."""
        import os
        from time import perf_counter

        prof = os.environ.get("SSD_PROFILE_TARGET", "0") == "1"
        t0 = perf_counter()
        draft = self.is_draft
        (input_ids, positions, slot_map, bt, context_lens, temps, B_pad) = (
            self._prepare_multi_query(seqs, q_len, draft)
        )
        if temps_override is not None:
            temps[: len(seqs)] = temps_override
        ctx_pad = self._ctx_bucket(int(context_lens.max()))
        payload = pack_i32(input_ids, positions, slot_map, bt, context_lens,
                           temps, *self._warp_parts(seqs, B_pad),
                           np.int32([self._next_seed()]))
        tokens, logits, acts, self.kv_cache = decode_step_packed(
            self.params, self.kv_cache, self._upload(payload),
            arch=self.arch, block_size=self.block_size,
            ctx_pad=ctx_pad, q_len=q_len, B_pad=B_pad, M=self.max_blocks,
            use_pallas=self.use_pallas, eagle_layers=self.eagle_layers,
            use_warp=self.use_warp,
        )
        B = len(seqs)
        if prof:
            t1 = perf_counter()
            jax.block_until_ready(tokens)
            print(
                f"[PROFILE target] prepare+dispatch={(t1-t0)*1000:.2f}ms "
                f"run(q_len={q_len})={(perf_counter()-t1)*1000:.2f}ms",
                flush=True,
            )
        token_list = np.asarray(tokens)[:B].tolist()
        acts_out = None
        if return_acts and acts is not None:
            acts_out = np.asarray(acts).reshape(B_pad, q_len, -1)[:B]
        logits_out = None
        if return_logits:
            V = self.arch.vocab_size
            logits_out = logits.reshape(B_pad, q_len, V)[:B]
        if return_acts:
            return token_list, logits_out, acts_out
        return token_list, logits_out

    def run_chain(self, seqs: list[Sequence], K: int, extra_write: bool | None = None):
        """Draft speculation chain: K+1 decodes in one dispatch. Sequences must
        already carry the recovery token as their last token. Returns
        (tokens [B, K] np, logits_q [B_pad, K, V] device array — kept at the
        batch bucket so the fused verify program consumes it without a
        slice dispatch)."""
        draft = self.is_draft
        B = len(seqs)
        B_pad = next_pow2(B)
        first = np.zeros(B_pad, dtype=np.int32)
        start_pos = np.zeros(B_pad, dtype=np.int32)
        ctx0 = np.ones(B_pad, dtype=np.int32)
        temps = np.ones(B_pad, dtype=np.float32)
        bt = np.full((B_pad, self.max_blocks), -1, dtype=np.int32)
        bt[:B] = self._block_table_array(seqs, draft)
        for i, seq in enumerate(seqs):
            first[i] = seq.last_token
            start_pos[i] = seq.num_tokens - 1
            ctx0[i] = seq.num_tokens
            temps[i] = (
                seq.draft_temperature
                if draft and seq.draft_temperature is not None
                else seq.temperature
            )
        ctx_pad = self._ctx_bucket(int(ctx0.max()) + K + 1)
        payload = pack_i32(first, start_pos, bt, ctx0, temps,
                           *self._warp_parts(seqs, B_pad),
                           np.int32([self._next_seed()]))
        tokens, logits_q, self.kv_cache = chain_decode_step_packed(
            self.params, self.kv_cache, self._upload(payload),
            arch=self.arch, block_size=self.block_size, ctx_pad=ctx_pad, K=K,
            B_pad=B_pad, M=self.max_blocks, use_pallas=self.use_pallas,
            extra_write=self.is_draft if extra_write is None else extra_write,
            use_warp=self.use_warp,
        )
        return np.asarray(tokens)[:B], logits_q

    def _ctx_buckets(self) -> list[int]:
        limit = self.max_blocks * self.block_size
        if self.config.ctx_bucket_policy == "single":
            return [limit]
        out, c = [], self.block_size
        while c < limit:
            out.append(c)
            c *= 2
        out.append(limit)
        return sorted(set(out))

    def warmup_buckets(self, q_lens=(1,), chain_Ks=(), batch_pads=(1,),
                       prefill_s_pads=()):
        """Pre-compile every (batch bucket, ctx bucket) shape the decode-side
        programs can hit, with ghost-only batches (slot=-1, table=-1) so the
        KV cache passes through untouched. The jit analogue of the
        reference's CUDA-graph capture at init (model_runner.py:278-302);
        combined with the persistent XLA cache this removes all mid-run
        compilation stalls."""
        last = None
        M = self.max_blocks
        for B_pad in batch_pads:
            bt = np.full((B_pad, M), -1, np.int32)
            ctx1 = np.ones(B_pad, np.int32)
            temps = np.ones(B_pad, np.float32)
            # Ghost warp segments (top_p=1, top_k=0) when the engine compiles
            # the sampling warp into its programs.
            warp = ((np.ones(B_pad, np.float32), np.zeros(B_pad, np.int32))
                    if self.use_warp else ())
            seed = np.int32([0])
            for ctx_pad in self._ctx_buckets():
                for q in q_lens:
                    T = B_pad * q
                    zeros, ghost = np.zeros(T, np.int32), np.full(T, -1, np.int32)
                    last, _, _, self.kv_cache = decode_step_packed(
                        self.params, self.kv_cache,
                        jnp.asarray(pack_i32(zeros, zeros, ghost, bt, ctx1,
                                             temps, *warp, seed)),
                        arch=self.arch, block_size=self.block_size,
                        ctx_pad=ctx_pad, q_len=q, B_pad=B_pad, M=M,
                        use_pallas=self.use_pallas,
                        eagle_layers=self.eagle_layers,
                        use_warp=self.use_warp,
                    )
                for K in chain_Ks:
                    zb = np.zeros(B_pad, np.int32)
                    last, _, self.kv_cache = chain_decode_step_packed(
                        self.params, self.kv_cache,
                        jnp.asarray(pack_i32(zb, zb, bt, ctx1, temps, *warp,
                                             seed)),
                        arch=self.arch, block_size=self.block_size,
                        ctx_pad=ctx_pad, K=K, B_pad=B_pad, M=M,
                        use_pallas=self.use_pallas,
                        extra_write=self.is_draft,
                        use_warp=self.use_warp,
                    )
                for s_pad in prefill_s_pads:
                    if self.config.flat_prefill and not self.eagle_layers:
                        continue  # production prefill uses the flat program
                    T = B_pad * s_pad
                    zeros, ghost = np.zeros(T, np.int32), np.full(T, -1, np.int32)
                    last, _, _, self.kv_cache = prefill_step_packed(
                        self.params, self.kv_cache,
                        jnp.asarray(pack_i32(zeros, zeros, ghost, bt, ctx1,
                                             ctx1, temps, *warp, seed)),
                        arch=self.arch, block_size=self.block_size,
                        ctx_pad=ctx_pad, s_pad=s_pad, B_pad=B_pad, M=M,
                        use_pallas=self.use_pallas,
                        eagle_layers=self.eagle_layers,
                        use_warp=self.use_warp,
                    )
            # Flat-packed prefill warmup (the program the default path
            # actually dispatches): for each requested per-seq bucket, warm
            # the (T_pad, P_pad) the FRESH-prompt batch of that shape hits
            # (T_pad = pow2 of B_pad * s_pad tokens; P_pad = pow2 of the
            # matching page count). Prefix-cache-heavy batches can still hit
            # new P_pad buckets; the persistent XLA cache makes those
            # compiles one-time per machine.
            if self.config.flat_prefill and not self.eagle_layers:
                for s_pad in prefill_s_pads:
                    T_pad = next_pow2(max(8, B_pad * s_pad))
                    pages = B_pad * (-(-s_pad // self.block_size))
                    P_pad = next_pow2(max(2, pages))
                    ghostT = np.full(T_pad, -1, np.int32)
                    zerosT = np.zeros(T_pad, np.int32)
                    last, _, self.kv_cache = flat_prefill_step_packed(
                        self.params, self.kv_cache,
                        jnp.asarray(pack_i32(
                            zerosT, zerosT, ghostT,           # ids/pos/slots
                            np.full(P_pad, -1, np.int32),     # pages
                            zerosT, zerosT,                   # lo/hi
                            np.zeros(B_pad, np.int32),        # gather
                            temps, *warp, seed,
                        )),
                        arch=self.arch, block_size=self.block_size,
                        T_pad=T_pad, P_pad=P_pad, B_pad=B_pad,
                        use_pallas=self.use_pallas, use_warp=self.use_warp,
                    )
        if last is not None:
            jax.block_until_ready(last)

    def warmup_flat_prefill(self, batch_pads=(1,)):
        """Pre-compile every (T_pad, P_pad, B_pad) flat-prefill bucket a
        FRESH-prompt batch can hit, so the first real prompt of any length is
        dispatch-bound, not compile-bound. For a batch of B <= B_pad fresh
        prompts totalling T <= max_num_batched_tokens new tokens, the page
        count lies in [ceil((T_pad/2+1)/bs), T_pad//bs + B], so the P_pad
        ladder spans [pow2(T_pad//bs), pow2(T_pad//bs + B_pad)]. Prefix-cache
        hits can still land outside (cached pages count toward P but not T);
        the persistent XLA cache makes those compiles one-time per machine."""
        if not self.config.flat_prefill or self.eagle_layers:
            return
        cap = min(self.config.max_num_batched_tokens,
                  self.config.max_num_seqs * self.config.max_model_len)
        bs = self.block_size
        last = None
        seed = np.int32([0])
        for B_pad in batch_pads:
            warp = ((np.ones(B_pad, np.float32), np.zeros(B_pad, np.int32))
                    if self.use_warp else ())
            temps = np.ones(B_pad, np.float32)
            T_pad = next_pow2(max(8, B_pad))
            while True:
                p = next_pow2(max(2, T_pad // bs))
                p_hi = next_pow2(max(2, T_pad // bs + B_pad))
                while p <= p_hi:
                    ghostT = np.full(T_pad, -1, np.int32)
                    zerosT = np.zeros(T_pad, np.int32)
                    last, _, self.kv_cache = flat_prefill_step_packed(
                        self.params, self.kv_cache,
                        jnp.asarray(pack_i32(
                            zerosT, zerosT, ghostT,        # ids/pos/slots
                            np.full(p, -1, np.int32),      # pages
                            zerosT, zerosT,                # lo/hi
                            np.zeros(B_pad, np.int32),     # gather
                            temps, *warp, seed,
                        )),
                        arch=self.arch, block_size=self.block_size,
                        T_pad=T_pad, P_pad=p, B_pad=B_pad,
                        use_pallas=self.use_pallas, use_warp=self.use_warp,
                    )
                    p *= 2
                if T_pad >= next_pow2(cap):
                    break
                T_pad *= 2
        if last is not None:
            jax.block_until_ready(last)

    def run(self, seqs: list[Sequence], is_prefill: bool, last_only: bool = True,
            return_logits: bool = False):
        """Reference ModelRunner.run-compatible entry (model_runner.py:634-680)."""
        if is_prefill:
            return self.run_prefill(seqs, last_only=last_only)
        tokens, logits = self.run_decode(seqs, q_len=1, return_logits=return_logits)
        if return_logits:
            return tokens, logits[:, 0, :]
        return tokens
