"""Engine configuration.

Parity: /root/reference/ssd/config.py:7-94 (same knobs + derivations:
fan_out_list, MQ_LEN, eagle layer defaults, max_model_len capping), re-expressed
for TPU: `num_devices`/`tp_size` replace `num_gpus`, `hbm_memory_utilization`
replaces `gpu_memory_utilization`, and the HF config is parsed directly from
`config.json` into a light `ModelConfig` (no torch / transformers dependency on
the hot path).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, replace

from ssd_tpu.paths import DEFAULT_TARGET, DEFAULT_DRAFT


@dataclass
class ModelConfig:
    """Subset of an HF `config.json` the engine needs, parsed without transformers."""

    model_type: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int | None = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    torch_dtype: str = "bfloat16"
    eos_token_id: int | list[int] | None = None
    bos_token_id: int | None = None
    attention_bias: bool = False
    # EAGLE-3 draft checkpoints carry a reduced LM-head vocab.
    draft_vocab_size: int | None = None
    # Mixture-of-experts (qwen3_moe): every decoder layer is sparse
    # (uniform stacking; decoder_sparse_step must be 1 and mlp_only_layers
    # empty — true for all released Qwen3-MoE checkpoints).
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = False
    decoder_sparse_step: int = 1
    mlp_only_layers: list[int] | None = None

    @property
    def head_dim_actual(self) -> int:
        if self.head_dim is not None:
            return self.head_dim
        return self.hidden_size // self.num_attention_heads

    @property
    def eos(self) -> int:
        e = self.eos_token_id
        if isinstance(e, list):
            return e[0]
        return -1 if e is None else e

    @classmethod
    def from_pretrained(cls, model_path: str) -> "ModelConfig":
        with open(os.path.join(model_path, "config.json")) as f:
            raw = json.load(f)
        known = {f_.name for f_ in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        kwargs = {k: v for k, v in raw.items() if k in known}
        return cls(**kwargs)


@dataclass
class Config:
    model: str = DEFAULT_TARGET
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 1
    max_model_len: int = 4096
    hbm_memory_utilization: float = 0.7
    num_devices: int = 1
    # Multi-host (DCN) serving: every host runs the same engine loop as one
    # controller of a global SPMD program over a hybrid ("dcn", "tp") mesh
    # (the reference is hard-capped to one node, config.py:55). With
    # coordinator_address set, the engine joins/initialises the distributed
    # runtime itself; leave it None if jax.distributed is already initialised.
    num_hosts: int = 1
    coordinator_address: str | None = None
    host_id: int | None = None
    enforce_eager: bool = False  # kept for CLI parity; XLA always compiles
    hf_config: ModelConfig | None = None
    eos: int = -1
    kvcache_block_size: int = 256
    num_kvcache_blocks: int = -1
    dtype: str = "bfloat16"
    seed: int = 0
    use_pallas: bool | None = None  # None = auto (on for TPU backend)
    # MoE decode-size dispatches gather only the selected experts' weight
    # rows (models/transformer.py::_moe_mlp) — ~E/(T*k) x fewer HBM bytes at
    # small batch. Auto-disabled under expert-parallel sharding (tp > 1);
    # False forces the dense all-expert einsum everywhere (the control).
    moe_gather: bool = True
    # Ragged grouped-GEMM MoE for large (prefill/verify) dispatches: tokens
    # sorted by expert, per-expert dense tiles via lax.ragged_dot — k/E of
    # the dense path's FLOPs. Auto-disabled under expert-parallel sharding;
    # False forces the dense all-expert einsum (the numerics control).
    moe_ragged: bool = True
    # Flat-packed ragged prefill: the whole mixed-length prefill batch as ONE
    # dispatch with exact per-token attention windows (the TPU-native form
    # of the reference's flash_attn_varlen_func packing) instead of one
    # padded dispatch per pow2 length bucket. EAGLE prefill always uses the
    # grouped path (it needs per-sequence activation rows).
    flat_prefill: bool = True
    # AR multi-step decoding: sample this many tokens per engine step as ONE
    # lax.scan program (EOS overshoot is truncated and rolled back like a
    # rejected speculation). Amortises per-step dispatch/host latency.
    multi_step: int = 1
    # Context-length shape buckets for the jitted decode programs:
    # "pow2" = power-of-two growth (fewer wasted pages, more compiles);
    # "single" = one bucket at max_model_len (one compile per program —
    # weight reads dominate decode at small batch, so the extra KV-page scans
    # are cheap).
    ctx_bucket_policy: str = "pow2"
    # Pre-compile every decode-side shape bucket at engine init (the analogue
    # of the reference capturing its CUDA graphs at init,
    # model_runner.py:278-302). None = auto: on for the TPU backend, where a
    # mid-serving bucket compile stalls decoding for minutes; off on CPU.
    # Combined with the persistent XLA cache the cost is paid once per
    # machine.
    warmup_on_init: bool | None = None

    # spec config args
    draft_hf_config: ModelConfig | None = None
    speculate: bool = False
    draft: str = DEFAULT_DRAFT
    speculate_k: int = 1
    draft_async: bool = False
    # Sync SD only: fuse this many whole speculation rounds
    # (chain -> verify -> accept) into ONE XLA program per engine step —
    # one dispatch + one host sync per rounds * E[accepted+1] tokens (the
    # speculative analogue of AR multi_step). Greedy outputs stay token-exact
    # vs spec_rounds=1. See ssd_tpu/engine/fused_sd.py.
    spec_rounds: int = 1
    # Model-free speculation (beyond reference; vLLM's ngram speculator):
    # propose speculate_k tokens per round by matching the last ngram_n
    # committed tokens against the sequence's own history, verified by the
    # same fused multi-round superstep machinery as sync SD — with ZERO draft
    # model or draft KV (fused_sd.ngram_superstep: the token history rides
    # the scan carry and the matcher runs in-program). Token-exact vs AR in
    # every case: a proposal miss only costs acceptance. Use with speculate_k
    # and spec_rounds; mutually exclusive with speculate.
    ngram_speculate: bool = False
    ngram_n: int = 3

    # async spec only
    # Draft data parallelism: replicate the draft over this many dedicated
    # chips, splitting the request batch by seq_id (the reference's roadmap
    # feature, README.md:130 "Draft data parallel").
    draft_dp: int = 1
    # Fused async exchange (engine/async_fused.py): the draft shares the
    # target's device(s) and the target's verify fuses with the draft's
    # next-step tree build into ONE XLA program per exchange — the
    # single-chip answer to the reference's two-GPU draft/target overlap
    # (draft_runner.py:859-928). With spec_rounds > 1 the whole exchange
    # LOOP fuses: R rounds of [serve-from-tree -> verify -> rebuild] in one
    # program, tree cache in the scan carry (async_ssd_superstep). Greedy
    # outputs stay token-exact vs the unfused async path. Requires
    # draft_dp == 1, num_hosts == 1, and not use_eagle.
    async_fused: bool = False
    async_fan_out: int = 3
    fan_out_list: list[int] | None = None
    fan_out_list_miss: list[int] | None = None
    sampler_x: float | None = None
    jit_speculate: bool = False

    # eagle3
    use_eagle: bool = False
    eagle_layers: list[int] | None = None
    d_model_target: int | None = None
    tokenizer_path: str | None = None

    # Top-p / top-k sampling (beyond reference): compiles the nucleus/top-k
    # warp into every sampling site AND the verify() acceptance math (both p
    # and q warp, so speculative sampling stays exact w.r.t. the warped
    # target distribution). Off by default: the warp adds a [*, V] sort per
    # sample, and requests with top_p < 1 or top_k > 0 on an engine built
    # without it are rejected at add_request.
    enable_top_sampling: bool = False

    # int8 KV cache: the paged cache stores int8 rows + per-(token, head,
    # K/V) f32 scales (ops/attention.py), halving the attention's HBM reads
    # — the lever that matters exactly where paged attention is the
    # bottleneck (long context). Approximate vs the fp cache (quantization
    # error can flip a greedy argmax vs HF), but DETERMINISTIC: AR and every
    # speculative mode still agree token-for-token with each other because
    # the same context always quantizes to the same cache bytes.
    # "int8": in-kernel f32-semantics dequant — bit-identical to the jnp
    #   oracle, but the cast costs more VPU than the halved DMA saves
    #   (PERF.md round 3: the memory win, not a speed win).
    # "int8_mxu": native s8 x s8 -> s32 MXU dots (2x int8 throughput on
    #   v5e, no in-register cast); q and the softmax weights quantize
    #   in-register, adding ~1/254 absolute error on p — approximate vs the
    #   "int8" mode by a documented tolerance (tests/test_kv_quant.py), and
    #   still deterministic across modes on a fixed backend.
    kv_quant: str | None = None
    # Weight-only quantization (beyond reference): "int8" stores matmul
    # weights as int8 with per-out-channel f32 scales (utils/quant.py) —
    # decode at small batch is weight-read-bound, so halving the weight
    # bytes is a ~2x throughput lever. None = native dtype.
    quantization: str | None = None

    # Chunked prefill (beyond reference): admit a prompt longer than the
    # per-dispatch token budget in budget-sized chunks, interleaving decode
    # steps between chunks. Lifts the max_model_len <= max_num_batched_tokens
    # constraint and bounds per-dispatch prefill latency.
    chunked_prefill: bool = False

    # debugging
    verbose: bool = False
    debug_mode: bool = False
    max_steps: int | None = None

    MQ_LEN: int = field(default=0, init=False)

    @property
    def max_blocks(self) -> int:
        return (self.max_model_len + self.kvcache_block_size - 1) // self.kvcache_block_size

    @property
    def tp_size(self) -> int:
        """Devices used for target tensor parallelism (the last draft_dp
        devices host the async draft replicas, mirroring reference
        llm_engine.py:62)."""
        if not self.draft_async or self.async_fused:
            # async_fused co-locates the draft with the target (the fused
            # program traces both models' params), so no devices split off.
            return self.num_devices
        return max(1, self.num_devices - self.draft_dp)

    def __post_init__(self):
        assert os.path.isdir(self.model), f"model path does not exist: {self.model}"
        assert self.num_devices >= 1

        self.hf_config = ModelConfig.from_pretrained(self.model)
        self.max_model_len = min(self.max_model_len, self.hf_config.max_position_embeddings)

        if self.speculate:
            self.draft_hf_config = ModelConfig.from_pretrained(self.draft)
            self.max_model_len = min(
                self.max_model_len, self.draft_hf_config.max_position_embeddings
            )
            if self.draft_async:
                assert self.draft_dp >= 1
                if self.fan_out_list is None:
                    self.fan_out_list = [self.async_fan_out] * (self.speculate_k + 1)
                if self.fan_out_list_miss is None:
                    self.fan_out_list_miss = list(self.fan_out_list)
                assert sum(self.fan_out_list_miss) == sum(self.fan_out_list), (
                    "fan_out_list_miss must sum to the same MQ_LEN as fan_out_list"
                )
                self.MQ_LEN = sum(self.fan_out_list)

        if self.use_eagle:
            if self.eagle_layers is None:
                L = self.hf_config.num_hidden_layers
                self.eagle_layers = [2, L // 2, L - 3]
            if self.speculate and self.draft_hf_config is not None:
                # EAGLE draft must use the target's rope geometry
                # (reference config.py:78-92).
                self.draft_hf_config.rope_theta = self.hf_config.rope_theta
                self.draft_hf_config.max_position_embeddings = (
                    self.hf_config.max_position_embeddings
                )
            if self.d_model_target is None:
                self.d_model_target = self.hf_config.hidden_size

        if self.eos == -1:
            self.eos = self.hf_config.eos

        # Without chunking, a batch-head prefill must fit one dispatch
        # (scheduler.py admission can never livelock at the queue head).
        assert self.chunked_prefill or (
            self.max_num_batched_tokens >= self.max_model_len
        ), "max_num_batched_tokens < max_model_len requires chunked_prefill"
        # Chunked target prefill cannot produce the per-token activations an
        # EAGLE draft prefill is conditioned on.
        # chunked_prefill + use_eagle is supported: partial-chunk dispatches
        # only write KV forward, and the final admission prefill recomputes
        # the whole prompt with activation taps for the draft's conditioning
        # (model_runner.run_prefill's prefill_chunk-gated cached reset).
        # enable_top_sampling composes with EVERY mode (AR / sync / fused-SD /
        # async-SSD / EAGLE): the warp threads through all sampling sites
        # incl. the EAGLE chain and tree programs' samplers, and verify()
        # warps p and q identically so speculative sampling stays exact.
        # EAGLE composes with the fused superstep SYNCHRONOUSLY: spec_rounds
        # > 1 runs the EAGLE-conditioned chain inside the superstep scan
        # (fused_sd.eagle_sd_superstep — conditioning taps ride the carry).
        # The async handshake is inherently one round per exchange.
        assert not (self.use_eagle and self.draft_async
                    and self.spec_rounds > 1), (
            "spec_rounds > 1 with use_eagle runs the fused SYNC superstep; "
            "it is mutually exclusive with draft_async"
        )
        if self.async_fused:
            assert self.draft_async, "async_fused requires draft_async"
            assert self.draft_dp == 1 and self.num_hosts == 1, (
                "async_fused co-locates draft and target on one controller "
                "(use the unfused DraftServer path for draft_dp/multi-host)"
            )
            assert not self.use_eagle, (
                "EAGLE's fused form is the sync superstep (spec_rounds > 1 "
                "without draft_async)"
            )
        # ngram speculation has no draft model at all.
        assert not (self.ngram_speculate and self.speculate), (
            "ngram_speculate is model-free; it is mutually exclusive with "
            "speculate (pick one proposal source)"
        )
        if self.ngram_speculate:
            assert self.ngram_n >= 1 and self.speculate_k >= 1
        assert self.kv_quant in (None, "int8", "int8_mxu"), (
            f"unknown kv_quant {self.kv_quant!r}"
        )

    def create_draft_config(self) -> "Config":
        """Config for the draft model runner (reference draft_runner.py:21-32)."""
        cfg = replace(
            self,
            model=self.draft,
            hbm_memory_utilization=0.75 if not self.draft_async else 0.8,
            tokenizer_path=self.model if self.use_eagle else None,
            d_model_target=self.hf_config.hidden_size if self.use_eagle else None,
        )
        return cfg
