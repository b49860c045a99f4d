"""Decoder-only transformer as pure functions over a stacked-parameter pytree.

Covers the Llama-3 and Qwen-3 families (reference ssd/models/llama3.py and
qwen3.py — same skeleton; Qwen-3 adds per-head q/k RMSNorm, qwen3.py:87-104).
Instead of per-layer modules, all layers are stacked along a leading L axis and
the forward is a single `lax.scan`, so an 80-layer model compiles as one fused
program with the KV cache scanned alongside the weights — the XLA-native
replacement for per-layer module dispatch + CUDA graphs.

The attention computation itself is injected as a callable (`attn_call`) built
by the model runner for the current phase (prefill / decode / verify / tree),
keeping this file free of paging metadata.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from ssd_tpu.config import ModelConfig
from ssd_tpu.ops.layers import apply_rope, rms_norm, rms_norm_residual, rope_cos_sin, silu_mul

# attn_call(q[T,Hq,hd], k[T,Hkv,hd], v[T,Hkv,hd], kv_layer[Hkv,S,2*hd])
#   -> (out[T,Hq,hd], new_kv_layer)
AttnCall = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
                    tuple[jnp.ndarray, jnp.ndarray]]

# MoE decode-size gather path: max T*k rows unrolled as per-row GEMVs (see
# _moe_mlp). Crossing the cap switches a dispatch to the dense all-expert
# einsum — outputs remain contract-exact (same math, same expert-index
# accumulation order) but are not guaranteed bitwise-stable across the
# boundary (different XLA kernels).
MOE_GATHER_UNROLL_CAP = 32


@dataclass(frozen=True)
class Arch:
    """Static, hashable architecture descriptor (safe as a jit static arg)."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float
    rope_theta: float
    use_qk_norm: bool
    tie_embeddings: bool
    # Mixture-of-experts (Qwen3-MoE): 0 experts = dense MLP. With experts,
    # EVERY layer is sparse (uniform stack — the lax.scan requires one layer
    # structure; all released Qwen3-MoE checkpoints satisfy this).
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = False
    # Decode-size MoE dispatches gather only the selected experts' weights
    # (see _moe_mlp). The engine clears this under expert-parallel sharding,
    # where gathering across the sharded expert axis would move weight shards.
    moe_gather: bool = True
    # Large MoE dispatches (prefill, big verify batches) run as a ragged
    # grouped GEMM over expert-sorted tokens (lax.ragged_dot): T*k*3*D*I
    # FLOPs — k/E of the dense all-expert einsum — while still streaming
    # each expert's weights from HBM once. The engine clears this under
    # expert-parallel sharding (group sizes are data-dependent, so GSPMD
    # cannot place the ragged groups on the sharded expert axis); the dense
    # einsum remains as the sharded path and the numerics oracle.
    moe_ragged: bool = True

    @classmethod
    def from_model_config(cls, mc: ModelConfig) -> "Arch":
        if mc.num_experts:
            assert mc.decoder_sparse_step == 1 and not mc.mlp_only_layers, (
                "MoE requires a uniform layer stack (decoder_sparse_step=1, "
                "no mlp_only_layers)"
            )
        return cls(
            vocab_size=mc.vocab_size,
            hidden_size=mc.hidden_size,
            intermediate_size=mc.intermediate_size,
            num_layers=mc.num_hidden_layers,
            num_heads=mc.num_attention_heads,
            num_kv_heads=mc.num_key_value_heads,
            head_dim=mc.head_dim_actual,
            rms_norm_eps=mc.rms_norm_eps,
            rope_theta=mc.rope_theta,
            use_qk_norm=mc.model_type in ("qwen3", "qwen3_moe"),
            tie_embeddings=mc.tie_word_embeddings,
            num_experts=mc.num_experts,
            num_experts_per_tok=mc.num_experts_per_tok,
            moe_intermediate_size=mc.moe_intermediate_size,
            norm_topk_prob=mc.norm_topk_prob,
        )

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim


def init_params(arch: Arch, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-normal init (for tests and shape probing)."""
    D, I, L = arch.hidden_size, arch.intermediate_size, arch.num_layers
    Hq, Hkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    keys = iter(jax.random.split(key, 16))

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "input_ln": jnp.ones((L, D), dtype),
        "wq": w(next(keys), (L, D, Hq * hd)),
        "wk": w(next(keys), (L, D, Hkv * hd)),
        "wv": w(next(keys), (L, D, Hkv * hd)),
        "wo": w(next(keys), (L, Hq * hd, D)),
        "post_ln": jnp.ones((L, D), dtype),
    }
    if arch.num_experts:
        E, Im = arch.num_experts, arch.moe_intermediate_size
        layers.update(
            router=w(next(keys), (L, D, E)),
            moe_gate=w(next(keys), (L, E, D, Im)),
            moe_up=w(next(keys), (L, E, D, Im)),
            moe_down=w(next(keys), (L, E, Im, D)),
        )
    else:
        layers.update(
            gate=w(next(keys), (L, D, I)),
            up=w(next(keys), (L, D, I)),
            down=w(next(keys), (L, I, D)),
        )
    if arch.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, hd), dtype)
        layers["k_norm"] = jnp.ones((L, hd), dtype)
    params = {
        "embed": w(next(keys), (arch.vocab_size, D)),
        "layers": layers,
        "final_ln": jnp.ones((D,), dtype),
    }
    params["lm_head"] = params["embed"] if arch.tie_embeddings else w(
        next(keys), (arch.vocab_size, D)
    )
    return params


def _mm(x: jnp.ndarray, lp: dict, name: str) -> jnp.ndarray:
    """x @ lp[name], transparently dequantizing int8 weight-only params
    (utils/quant.py layout: int8 weight + `name_scale` per-out-channel f32).
    (x @ q) * s keeps HBM traffic at the int8 bytes — the int8->bf16 convert
    fuses into the matmul operand — instead of materializing q * s."""
    w = lp[name]
    y = x @ w.astype(x.dtype)
    s = lp.get(name + "_scale")
    return y if s is None else y * s.astype(y.dtype)


def _moe_mlp(x: jnp.ndarray, lp: dict, arch: Arch,
             side: dict | None = None,
             layer: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sparse MoE feed-forward (HF Qwen3MoeSparseMoeBlock semantics: fp32
    softmax router, top-k, optional renormalisation, weighted expert sum).

    TPU shape, picked per dispatch size at trace time:
    - T*k < E (decode): gather the selected experts' weight rows and run
      T*k batched GEMVs — reads only the needed expert bytes from HBM,
      which is what bounds decode throughput.
    - T*k >= E (prefill): ALL experts run as one batched einsum and the
      top-k selection becomes a [T, E] combine matrix — every expert's
      weights stream from HBM exactly once, MXU-shaped dots, no ragged
      gather/scatter. Expert weights shard over the mesh's tp axis (expert
      parallelism); the combine contraction reduces over E, so GSPMD
      inserts the all-reduce. Under that sharding the gather path is
      disabled (arch.moe_gather, cleared by the engine).

    Known trade-off: long PREFILL dispatches are FLOPs-bound, where the dense
    all-expert form pays (E/k)x the ideal MLP compute and inflates TTFT. The
    exact fix is a ragged grouped GEMM (tokens sorted by expert) — a Pallas
    kernel on the roadmap; a capacity-bucketed dispatch is NOT an option here
    because dropping overflow tokens breaks the engine's HF-exactness
    contract."""
    T = x.shape[0]
    E, k = arch.num_experts, arch.num_experts_per_tok
    logits = x @ lp["router"]                                # [T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, k)                   # [T, k]
    if arch.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    top_w = top_w.astype(x.dtype)
    # Accumulate selected experts in EXPERT-INDEX order (not router-rank
    # order): the dense control below reduces over the E axis in index
    # order, and on real geometry (k=8, bf16) a different summation order
    # can drift an ULP and flip a greedy argmax across dispatch paths.
    order = jnp.argsort(top_i, axis=-1)
    top_i = jnp.take_along_axis(top_i, order, axis=-1)
    top_w = jnp.take_along_axis(top_w, order, axis=-1)

    if side is not None:
        # Decode-size dispatches (T*k < E, a trace-time fact): gather ONLY
        # the selected experts' weight rows. The dense all-expert einsum
        # below streams every expert from HBM — optimal once T*k >= E
        # (prefill), but at decode it reads E/(T*k) x the needed bytes and
        # the layer is weight-read-bound. The rows come from `side`, the
        # FULL flat [L*E, ...] expert stack closed over by the scan — NOT
        # from the per-layer scanned slice `lp`: a scanned slice feeding a
        # data-dependent gather materializes the whole slice (measured 2x
        # WORSE than dense on-chip), while gathering [layer*E + expert]
        # rows from the invariant stack is the embedding-lookup pattern and
        # reads only the selected bytes.
        # Lowering note (measured on the v5e): a data-dependent jnp.take of
        # these rows lowers to a catastrophically slow gather (~159 ms vs
        # ~2.1 ms per forward at Qwen3-MoE-3B geometry); an UNROLLED
        # dynamic-slice per selected row, fused straight into its GEMV,
        # reads just the row's bytes. The unroll count T*k is a trace-time
        # constant (capped at MOE_GATHER_UNROLL_CAP rows in forward_hidden).
        fi = (layer * E + top_i).reshape(-1)                 # [T*k]

        def row_mm(a, name, n):  # a [in] @ expert-row n of `name` -> [out]
            w = jax.lax.dynamic_index_in_dim(side[name], fi[n], 0,
                                             keepdims=False)
            y = a @ w.astype(a.dtype)
            s = side.get(name + "_scale")
            if s is None:
                return y
            return y * jax.lax.dynamic_index_in_dim(
                s, fi[n], 0, keepdims=False
            ).astype(y.dtype)

        eo = []
        for n in range(T * k):
            xa = x[n // k]
            gu = silu_mul(row_mm(xa, "moe_gate", n), row_mm(xa, "moe_up", n))
            eo.append(row_mm(gu, "moe_down", n))
        eo = jnp.stack(eo).reshape(T, k, -1)                 # [T, k, D]
        return jnp.einsum("tkd,tk->td", eo, top_w)

    if arch.moe_ragged:
        # Ragged grouped GEMM (the prefill fix for the (E/k)x dense FLOPs):
        # sort the T*k (token, expert) pairs by expert, run per-expert dense
        # tiles via lax.ragged_dot, un-permute, combine. The stable sort
        # keeps each token's k rows in expert-index order, so the combine
        # sums in exactly the gather path's (and the dense control's) order.
        N = T * k
        flat_e = top_i.reshape(-1)                           # [N]
        order = jnp.argsort(flat_e, stable=True)
        xs = jnp.repeat(x, k, axis=0)[order]                 # [N, D]
        gs = jnp.bincount(flat_e, length=E).astype(jnp.int32)

        # On the TPU backend the Pallas megablox grouped GEMM measures ~25%
        # faster than lax.ragged_dot at this shape class (and within 5% of a
        # same-FLOPs dense matmul — see PERF.md); elsewhere (CPU tests, int8
        # expert weights with per-channel scales) lax.ragged_dot is the
        # reference path.
        use_gmm = (jax.default_backend() == "tpu"
                   and "moe_gate_scale" not in lp
                   and N >= 256)  # small (verify-size) dispatches keep the
        #                          reference path: a sub-tile m is all waste

        def rdot(a, name):
            w = lp[name]
            if use_gmm:
                from jax.experimental.pallas.ops.tpu.megablox import gmm

                # fp32 accumulation inside the kernel; carry dtype preserved.
                return gmm(a, w.astype(a.dtype), gs,
                           tiling=(min(256, N), w.shape[1], w.shape[2]),
                           ).astype(a.dtype)
            y = jax.lax.ragged_dot(a, w.astype(a.dtype), gs)
            s = lp.get(name + "_scale")                      # [E, out] int8 q
            if s is None:
                return y
            return y * s[flat_e[order]].astype(y.dtype)

        g = rdot(xs, "moe_gate")
        u = rdot(xs, "moe_up")
        d = rdot(silu_mul(g, u), "moe_down")                 # [N, D]
        eo = d[jnp.argsort(order)].reshape(T, k, -1)         # un-permute
        return jnp.einsum("tkd,tk->td", eo, top_w)

    combine = jnp.zeros((T, E), x.dtype).at[
        jnp.arange(T)[:, None], top_i
    ].add(top_w)                                             # [T, E]

    def emm(spec, a, name):  # expert einsum with int8 dequant (see _mm)
        y = jnp.einsum(spec, a, lp[name].astype(a.dtype))
        s = lp.get(name + "_scale")                          # [E, out]
        return y if s is None else y * s[None].astype(y.dtype)

    g = emm("td,edi->tei", x, "moe_gate")
    u = emm("td,edi->tei", x, "moe_up")
    eo = emm("tei,eid->ted", silu_mul(g, u), "moe_down")
    return jnp.einsum("ted,te->td", eo, combine)


def forward_hidden(
    params: dict,
    kv_cache: jnp.ndarray,      # [L, Hkv, S, 2*hd] (K/V interleaved)
    input_ids: jnp.ndarray,     # [T]
    positions: jnp.ndarray,     # [T] rope positions
    attn_call: AttnCall,
    arch: Arch,
    eagle_layers: tuple[int, ...] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray] | tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Embed -> L x (attn + MLP) via lax.scan -> pre-final-norm hidden states.

    Returns (hidden [T, D], updated kv_cache), plus the concatenated EAGLE
    activations [T, len(eagle_layers)*D] when `eagle_layers` is set: the full
    residual-stream value ENTERING each tapped layer (reference
    llama3.py:257-273). Taps are collected INSIDE the one L-layer scan, as
    per-tap [T, D] carry buffers predicate-selected at the tap's iteration:
    live tap memory stays at len(taps)*T*D (an [L, T, D] ys stack would be
    GBs at long-prompt EAGLE prefill shapes), and the earlier segmented-scan
    design sliced the stacked weights per segment, which made XLA COPY the
    weight stacks every forward — measured 2x on the verify-with-taps
    program (10.4 vs 5.1 ms/round at 1B geometry, bench/sd_diag.py --eagle).
    """
    T = input_ids.shape[0]
    Hq, Hkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    eps = arch.rms_norm_eps

    # MoE decode-size gather (see _moe_mlp): the expert weights stay OUT of
    # the scan xs, flattened to [L*E, ...] and indexed by layer*E + expert.
    _MOE_SIDE = ("moe_gate", "moe_up", "moe_down",
                 "moe_gate_scale", "moe_up_scale", "moe_down_scale")
    moe_side = None
    layers_xs = params["layers"]
    if (arch.num_experts and arch.moe_gather
            and T * arch.num_experts_per_tok < arch.num_experts
            and T * arch.num_experts_per_tok <= MOE_GATHER_UNROLL_CAP):
        moe_side = {
            k: v.reshape((-1,) + v.shape[2:])
            for k, v in params["layers"].items() if k in _MOE_SIDE
        }
        layers_xs = {k: v for k, v in params["layers"].items()
                     if k not in _MOE_SIDE}

    hidden = jnp.take(params["embed"], input_ids, axis=0)
    if "embed_scale" in params:  # int8 weight-only (utils/quant.py)
        cdt = params["final_ln"].dtype
        hidden = hidden.astype(cdt) * jnp.take(
            params["embed_scale"], input_ids, axis=0
        ).astype(cdt)[:, None]
    cos, sin = rope_cos_sin(positions, hd, arch.rope_theta)
    residual = jnp.zeros_like(hidden)

    taps = tuple(sorted(eagle_layers)) if eagle_layers else ()

    def body(carry, xs):
        hidden, residual, acts_c = carry
        lp, kv_layer, li = xs
        if taps:
            # The residual-stream value entering this layer (the EAGLE tap);
            # latched into the matching tap buffer at its iteration.
            pre = (hidden.astype(jnp.float32)
                   + residual.astype(jnp.float32)).astype(hidden.dtype)
            acts_c = tuple(
                jnp.where(li == t, pre, a) for t, a in zip(taps, acts_c)
            )

        # --- attention block ---
        x, residual = rms_norm_residual(hidden, residual, lp["input_ln"], eps)
        q = _mm(x, lp, "wq").reshape(T, Hq, hd)
        k = _mm(x, lp, "wk").reshape(T, Hkv, hd)
        v = _mm(x, lp, "wv").reshape(T, Hkv, hd)
        if arch.use_qk_norm:
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        o, kv_layer = attn_call(q, k, v, kv_layer)
        hidden = _mm(o.reshape(T, Hq * hd), lp, "wo")

        # --- MLP block ---
        x, residual = rms_norm_residual(hidden, residual, lp["post_ln"], eps)
        if arch.num_experts:
            hidden = _moe_mlp(x, lp, arch, side=moe_side, layer=li)
        else:
            hidden = _mm(silu_mul(_mm(x, lp, "gate"), _mm(x, lp, "up")),
                         lp, "down")
        return (hidden, residual, acts_c), kv_layer

    L = arch.num_layers
    layer_ids = jnp.arange(L, dtype=jnp.int32)
    assert all(0 <= t < L for t in taps)
    acts0 = tuple(jnp.zeros_like(hidden) for _ in taps)

    (hidden, residual, acts_c), kv_cache = jax.lax.scan(
        body, (hidden, residual, acts0), (layers_xs, kv_cache, layer_ids)
    )
    hidden = (hidden.astype(jnp.float32) + residual.astype(jnp.float32)).astype(hidden.dtype)
    if not eagle_layers:
        return hidden, kv_cache
    # Ascending-tap order (duplicate taps repeat, matching the reference).
    return hidden, kv_cache, jnp.concatenate(list(acts_c), axis=-1)


def compute_logits(
    params: dict,
    hidden: jnp.ndarray,   # [T, D] pre-final-norm
    arch: Arch,
    gather_idx: jnp.ndarray | None = None,  # [B] token indices to project
) -> jnp.ndarray:
    """Final RMSNorm + LM head, optionally on a gathered subset of tokens
    (prefill projects only the last token per sequence — reference
    embed_head.py:78-116)."""
    if gather_idx is not None:
        hidden = hidden[gather_idx]
    hidden = rms_norm(hidden, params["final_ln"], arch.rms_norm_eps)
    logits = hidden.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32).T
    if "lm_head_scale" in params:  # int8 weight-only (utils/quant.py)
        logits = logits * params["lm_head_scale"].astype(jnp.float32)[None, :]
    if "d2t" in params:
        # Reduced draft vocab (FR-Spec style): the LM head is [Vd, D] over a
        # subset of the target vocab; scatter its logits into the full target
        # vocab with -inf elsewhere, exactly like the EAGLE-3 reduced head
        # (models/eagle3.py::eagle_logits; reference
        # eagle3_draft_llama3.py:314-352). Sampling/argmax over the scattered
        # logits then IS sampling over the subset distribution q, so verify()
        # stays exact with zero changes — while the head matmul streams only
        # Vd*D weight bytes per chain step instead of V*D.
        Vd = logits.shape[-1]
        target_idx = jnp.arange(Vd, dtype=jnp.int32) + params["d2t"]
        full = jnp.full((logits.shape[0], arch.vocab_size), -jnp.inf, jnp.float32)
        logits = full.at[:, target_idx].set(logits)
    return logits
