"""Driver benchmark: decode throughput of the engine on this host's devices.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs a Llama-3.2-1B-shaped random-weight model (checkpoints are not available
in the build environment) through the full engine path — paged KV, continuous
batching, jitted decode — and reports decode tokens/sec.

Methodology (round-2 hardening): two-pass (a cache-fill warmup generate
compiles every bucket outside the timed window), then SSD_BENCH_REPS measured
generates (default 3) reduced by median — the tunneled-TPU RTT varies run to
run, so a single shot is not trustworthy. vs_baseline is the ratio against the
BEST value previously recorded for this exact (backend, mode, batch, out_len)
key in bench_history.json (1.0 on first run); history keys are per-backend so
CPU smokes never pollute the TPU baseline.
"""

import json
import os
import sys
import time


def build_spec_checkpoints(model_dir: str, draft_noise: float = 0.0,
                           draft_vocab: int = 0) -> tuple[str, str]:
    """Write (once) a target/draft checkpoint pair for the spec bench: the
    target's layers >= L/4 have wo = down = 0 (exact residual passthrough),
    and the draft shares the live layers + embeddings, so greedy outputs
    agree token-for-token while the draft costs ~1/4 of the target.

    draft_noise > 0 perturbs the DRAFT's live projections by that relative
    magnitude (weights are 0.02-scaled, the noise is 0.02*draft_noise-scaled)
    — the acceptance-rate knob for measuring the SD win as a function of
    draft quality instead of only at the constructed best case.

    draft_vocab > 0 gives the draft an FR-Spec-style reduced LM head: its head
    is the first `draft_vocab` rows of the target's, with a d2t identity map
    (models/transformer.py::compute_logits scatters back to the full vocab).
    Real LMs concentrate next-token mass on a small frequent-token subset
    (that is why FR-Spec works); random weights do not — they form arbitrary
    attractor tokens (the residual stream correlates with the last token's own
    embedding row, so a mild in-subset boost loses to out-of-subset
    self-similarity) — so the TARGET's head rows OUTSIDE the subset are scaled
    down 20x, concentrating its emissions in the subset the way frequency
    concentrates a real LM's. Both sides untie their embeddings; the target's
    bytes/step are unchanged (the head matmul reads the dense [V, D] either
    way), and the bench reports the measured acceptance as always."""
    import numpy as np
    from safetensors.numpy import save_file

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    L = cfg["num_hidden_layers"]
    Ld = max(1, L // 4)
    dv_sfx = f"_dv{draft_vocab}" if draft_vocab else ""
    tdir = model_dir + "_spec_target" + dv_sfx
    ddir = model_dir + "_spec_draft" + dv_sfx + (
        f"_n{draft_noise:g}" if draft_noise else "")
    t_file = os.path.join(tdir, "model.safetensors")
    d_file = os.path.join(ddir, "model.safetensors")
    for d, n_layers in ((tdir, L), (ddir, Ld)):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({**cfg, "num_hidden_layers": n_layers,
                       **({"tie_word_embeddings": False}
                          if draft_vocab else {})}, f)
    if os.path.exists(t_file) and os.path.exists(d_file):
        return tdir, ddir

    rng = np.random.default_rng(0)
    D, I, V = cfg["hidden_size"], cfg["intermediate_size"], cfg["vocab_size"]
    Hq, Hkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = cfg.get("head_dim") or D // Hq
    E = cfg.get("num_experts", 0)
    I_moe = cfg.get("moe_intermediate_size", I)

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02).astype(np.float16)

    target = {
        "model.embed_tokens.weight": w(V, D),
        "model.norm.weight": np.ones((D,), np.float16),
    }
    draft = dict(target)
    for i in range(L):
        live = i < Ld
        pre = f"model.layers.{i}."
        layer = {
            pre + "input_layernorm.weight": np.ones((D,), np.float16),
            pre + "post_attention_layernorm.weight": np.ones((D,), np.float16),
            **({pre + "self_attn.q_norm.weight": np.ones((hd,), np.float16),
                pre + "self_attn.k_norm.weight": np.ones((hd,), np.float16)}
               if cfg.get("model_type") in ("qwen3", "qwen3_moe") else {}),
            pre + "self_attn.q_proj.weight": w(Hq * hd, D),
            pre + "self_attn.k_proj.weight": w(Hkv * hd, D),
            pre + "self_attn.v_proj.weight": w(Hkv * hd, D),
            pre + "self_attn.o_proj.weight": (
                w(D, Hq * hd) if live else np.zeros((D, Hq * hd), np.float16)
            ),
        }
        if E:
            # MoE layer: a dead layer's experts all have down = 0, so the
            # residual passes through exactly, same as the dense trick.
            layer[pre + "mlp.gate.weight"] = w(E, D)
            for e in range(E):
                ep = pre + f"mlp.experts.{e}."
                layer[ep + "gate_proj.weight"] = w(I_moe, D)
                layer[ep + "up_proj.weight"] = w(I_moe, D)
                layer[ep + "down_proj.weight"] = (
                    w(D, I_moe) if live else np.zeros((D, I_moe), np.float16)
                )
        else:
            layer[pre + "mlp.gate_proj.weight"] = w(I, D)
            layer[pre + "mlp.up_proj.weight"] = w(I, D)
            layer[pre + "mlp.down_proj.weight"] = (
                w(D, I) if live else np.zeros((D, I), np.float16)
            )
        target.update(layer)
        if live:
            if draft_noise:
                nrng = np.random.default_rng(1000 + i)
                draft.update({
                    k: (v + (0.02 * draft_noise)
                        * nrng.standard_normal(v.shape).astype(np.float16)
                        if k.endswith("proj.weight") else v)
                    for k, v in layer.items()
                })
            else:
                draft.update(layer)
    if draft_vocab:
        head = target["model.embed_tokens.weight"].astype(np.float32).copy()
        head[draft_vocab:] *= 0.05  # concentrate emissions inside the subset
        target["lm_head.weight"] = head.astype(np.float16)
        draft["lm_head.weight"] = head[:draft_vocab].astype(np.float16)
        draft["d2t"] = np.zeros((draft_vocab,), np.int32)
    save_file(target, t_file)
    save_file(draft, d_file)
    return tdir, ddir


def build_eagle_checkpoints(model_dir: str,
                            draft_noise: float = 0.0) -> tuple[str, str]:
    """Write (once) a target/EAGLE-draft pair constructed for exact greedy
    equality (VERDICT r3 item 1b: the residual-passthrough trick of
    build_spec_checkpoints adapted to the 1-layer conditioned head), so
    acceptance ~= 1 while every weight byte still streams:

    TARGET: every layer is residual-passthrough (zero o_proj/down_proj), so
    its final hidden state is exactly the token embedding; embedding rows are
    unit-rms vectors supported on the first 512 coords, and the (untied) LM
    head is the embedding table rolled by one row, so greedy decoding walks
    t -> t-1 (mod V) deterministically — a nontrivial token sequence whose
    next step depends only on the current token. The target still reads all
    its weights every forward (zeros cost the same HBM bytes).

    DRAFT (EAGLE-3 single layer): constructed so its logits EQUAL the
    target's at every chain/glue/tree depth. The conditioning residual
    stream is cancelled in-layer and replaced by the current token's normed
    embedding:
      - fc selects the first activation tap (identity block), so cond_0 is
        the unit-rms tapped hidden state (= the token embedding);
      - q/k are built from the token half of the concat input with a large
        gain (beta=8), giving softmax self-attention that is exact in finite
        precision (score margin > 40 nats; see eagle3.eagle_forward for the
        concat layout);
      - v = token_norm - cond_norm (per-kv-head slices of the 512-coord
        subspace), o_proj reassembles one copy per GQA group, so
        attn_out = n(tok) - n(cond); with unit-rms cond (inductively true)
        the residual add gives prenorm = n(tok) exactly;
      - mlp down = 0, all norms = 1, lm_head = the target's.
    Hence draft logits = n(emb(tok)) @ head^T = the target's logits — the
    spec token at every depth equals the target's next token, and the fork
    set at the deepest glue depth contains the true recovery token
    (ops/spec_math.get_forked_recovery_tokens excludes nothing at the last
    depth), so the speculation-tree cache hits too. Reference bar: the EAGLE
    path as a headline mode (eagle3_draft_llama3.py:314-352).

    draft_noise > 0 (r4 VERDICT item 2: the realistic-acceptance knob)
    perturbs the DRAFT's live constructed projections (q/k/v/o and fc) by
    that relative magnitude — per-matrix rms-scaled gaussian noise, exactly
    the fused-SD bench's SSD_BENCH_DRAFT_NOISE mechanism applied to the
    EAGLE layer. The cancellation becomes inexact, so draft argmaxes diverge
    from the target's at a noise-controlled rate and acceptance falls below
    the constructed 1.0 while every weight byte still streams on both
    sides."""
    import numpy as np
    from safetensors.numpy import save_file

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    tdir = model_dir + "_eagle_eq_target"
    ddir = model_dir + "_eagle_eq_draft" + (
        f"_n{draft_noise:g}" if draft_noise else "")
    t_file = os.path.join(tdir, "model.safetensors")
    d_file = os.path.join(ddir, "model.safetensors")

    D, I, V, L = (cfg["hidden_size"], cfg["intermediate_size"],
                  cfg["vocab_size"], cfg["num_hidden_layers"])
    Hq, Hkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = cfg.get("head_dim") or D // Hq
    G = Hq // Hkv
    S = Hkv * hd  # the v-bottleneck: embeddings live in this subspace

    os.makedirs(tdir, exist_ok=True)
    os.makedirs(ddir, exist_ok=True)
    with open(os.path.join(tdir, "config.json"), "w") as f:
        json.dump({**cfg, "tie_word_embeddings": False}, f)
    with open(os.path.join(ddir, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama",
            "vocab_size": V,
            "draft_vocab_size": V,
            "hidden_size": D,
            "intermediate_size": I,
            "num_hidden_layers": 1,
            "num_attention_heads": Hq,
            "num_key_value_heads": Hkv,
            "head_dim": hd,
            "max_position_embeddings": cfg["max_position_embeddings"],
            "rms_norm_eps": cfg["rms_norm_eps"],
            "rope_theta": cfg["rope_theta"],
            "eos_token_id": cfg["eos_token_id"],
            "tie_word_embeddings": False,
        }, f)
    if os.path.exists(t_file) and os.path.exists(d_file):
        return tdir, ddir

    rng = np.random.default_rng(11)

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02
                ).astype(np.float16)

    # Unit-rms embeddings supported on the first S coords (so the draft's
    # v-projection bottleneck carries them losslessly).
    g = rng.standard_normal((V, S), dtype=np.float32)
    g *= (np.sqrt(D) / np.linalg.norm(g, axis=1, keepdims=True))
    emb = np.zeros((V, D), np.float32)
    emb[:, :S] = g
    head = np.roll(emb, -1, axis=0)  # head_v = emb_{v+1}: greedy walks t->t-1

    target = {
        "model.embed_tokens.weight": emb.astype(np.float16),
        "lm_head.weight": head.astype(np.float16),
        "model.norm.weight": np.ones((D,), np.float16),
    }
    for i in range(L):
        pre = f"model.layers.{i}."
        target.update({
            pre + "input_layernorm.weight": np.ones((D,), np.float16),
            pre + "post_attention_layernorm.weight": np.ones((D,), np.float16),
            pre + "self_attn.q_proj.weight": w(Hq * hd, D),
            pre + "self_attn.k_proj.weight": w(Hkv * hd, D),
            pre + "self_attn.v_proj.weight": w(Hkv * hd, D),
            pre + "self_attn.o_proj.weight": np.zeros((D, Hq * hd), np.float16),
            pre + "mlp.gate_proj.weight": w(I, D),
            pre + "mlp.up_proj.weight": w(I, D),
            pre + "mlp.down_proj.weight": np.zeros((D, I), np.float16),
        })

    # Draft layer (HF [out, in] layout; eagle_forward's concat input is
    # [norm(tok) | norm(cond)], token half first).
    beta = 8.0
    qw = np.zeros((Hq * hd, 2 * D), np.float32)
    kw = np.zeros((Hkv * hd, 2 * D), np.float32)
    vw = np.zeros((Hkv * hd, 2 * D), np.float32)
    ow = np.zeros((D, Hq * hd), np.float32)
    for h in range(Hq):
        grp = h // G
        for d_ in range(hd):
            qw[h * hd + d_, grp * hd + d_] = beta
    for o in range(Hkv * hd):
        kw[o, o] = beta
        vw[o, o] = 1.0          # + token coords
        vw[o, D + o] = -1.0     # - cond coords (cancels the residual)
    for grp in range(Hkv):
        for d_ in range(hd):
            # one representative q head per GQA group reassembles v
            ow[grp * hd + d_, (grp * G) * hd + d_] = 1.0
    fc = np.zeros((D, 3 * D), np.float32)
    fc[np.arange(D), np.arange(D)] = 1.0  # select the first tap

    if draft_noise:
        # Per-matrix noise scaled to the rms of the constructed (nonzero)
        # entries, so `draft_noise` is a relative perturbation magnitude.
        nrng = np.random.default_rng(2000)
        for m in (qw, kw, vw, ow, fc):
            nz = m[m != 0]
            scale = float(np.sqrt((nz ** 2).mean())) if nz.size else 1.0
            m += (draft_noise * scale
                  * nrng.standard_normal(m.shape).astype(np.float32))

    draft = {
        "fc.weight": fc.astype(np.float16),
        "midlayer.self_attn.q_proj.weight": qw.astype(np.float16),
        "midlayer.self_attn.k_proj.weight": kw.astype(np.float16),
        "midlayer.self_attn.v_proj.weight": vw.astype(np.float16),
        "midlayer.self_attn.o_proj.weight": ow.astype(np.float16),
        "midlayer.mlp.gate_proj.weight": w(I, D),
        "midlayer.mlp.up_proj.weight": w(I, D),
        "midlayer.mlp.down_proj.weight": np.zeros((D, I), np.float16),
        "midlayer.input_layernorm.weight": np.ones((D,), np.float16),
        "midlayer.hidden_norm.weight": np.ones((D,), np.float16),
        "midlayer.post_attention_layernorm.weight": np.ones((D,), np.float16),
        "norm.weight": np.ones((D,), np.float16),
        "lm_head.weight": head.astype(np.float16),
        "embed_tokens.weight": emb.astype(np.float16),
    }
    save_file(target, t_file)
    save_file(draft, d_file)
    return tdir, ddir


def build_dead_checkpoint(model_dir: str, walk: bool) -> str:
    """Write (once) a fully-dead target (every layer residual-passthrough, so
    logits = rms_norm(emb(token)) @ head^T) for the ngram-bench regimes: the
    model reads ALL its weight bytes per forward (zeros stream like any
    other bytes), while its greedy continuation is an exact function of the
    current token.

    walk=False: tied head -> embedding self-similarity repeats the token
    forever — after ngram_n+1 tokens the prompt-lookup matcher locks on and
    stays locked (acceptance ~1): the matcher CEILING at real verify cost.
    walk=True: untied head = embedding table rolled one row -> greedy walks
    t -> t-1 (mod V), which never revisits an n-gram — the matcher FLOOR
    (acceptance ~0, every round commits only the recovery token)."""
    import numpy as np
    from safetensors.numpy import save_file

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    d = model_dir + ("_dead_walk" if walk else "_dead_repeat")
    f_out = os.path.join(d, "model.safetensors")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({**cfg, "tie_word_embeddings": not walk}, f)
    if os.path.exists(f_out):
        return d

    rng = np.random.default_rng(13)
    D, I, V, L = (cfg["hidden_size"], cfg["intermediate_size"],
                  cfg["vocab_size"], cfg["num_hidden_layers"])
    Hq, Hkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = cfg.get("head_dim") or D // Hq

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02
                ).astype(np.float16)

    emb = rng.standard_normal((V, D), dtype=np.float32) * 0.02
    t = {
        "model.embed_tokens.weight": emb.astype(np.float16),
        "model.norm.weight": np.ones((D,), np.float16),
    }
    if walk:
        t["lm_head.weight"] = np.roll(emb, -1, axis=0).astype(np.float16)
    qwen = cfg.get("model_type") in ("qwen3", "qwen3_moe")
    for i in range(L):
        pre = f"model.layers.{i}."
        t.update({
            pre + "input_layernorm.weight": np.ones((D,), np.float16),
            pre + "post_attention_layernorm.weight": np.ones((D,), np.float16),
            pre + "self_attn.q_proj.weight": w(Hq * hd, D),
            pre + "self_attn.k_proj.weight": w(Hkv * hd, D),
            pre + "self_attn.v_proj.weight": w(Hkv * hd, D),
            pre + "self_attn.o_proj.weight": np.zeros((D, Hq * hd), np.float16),
            **({pre + "self_attn.q_norm.weight": np.ones((hd,), np.float16),
                pre + "self_attn.k_norm.weight": np.ones((hd,), np.float16)}
               if qwen else {}),
        })
        E = cfg.get("num_experts", 0)
        if E:
            # Dead MoE layer: every expert's down = 0 (residual passthrough).
            I_moe = cfg.get("moe_intermediate_size", I)
            t[pre + "mlp.gate.weight"] = w(E, D)
            for e_ in range(E):
                ep = pre + f"mlp.experts.{e_}."
                t[ep + "gate_proj.weight"] = w(I_moe, D)
                t[ep + "up_proj.weight"] = w(I_moe, D)
                t[ep + "down_proj.weight"] = np.zeros((D, I_moe), np.float16)
        else:
            t[pre + "mlp.gate_proj.weight"] = w(I, D)
            t[pre + "mlp.up_proj.weight"] = w(I, D)
            t[pre + "mlp.down_proj.weight"] = np.zeros((D, I), np.float16)
    save_file(t, f_out)
    return d


def _run_single():
    if os.environ.get("SSD_BENCH_CPU") == "1":
        # The env var JAX_PLATFORMS is clobbered by TPU plugin wrappers, so
        # CPU smokes must force the backend in-process (see tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    # Default = fused sync SD, the engine's flagship mode (measured 262 tok/s
    # b=1 on the v5e = 1.25x the AR best in the same hour; see PERF.md).
    # SSD_BENCH_MODE=ar measures the autoregressive baseline instead.
    mode = os.environ.get("SSD_BENCH_MODE", "sd")
    out_len = int(os.environ.get("SSD_BENCH_OUT_LEN", "128"))
    batch = int(os.environ.get("SSD_BENCH_BATCH", "1"))

    # Llama-3.2-1B geometry by default; SSD_BENCH_ARCH=qwen3 switches to a
    # Qwen3-1.7B-shaped model (per-head q/k RMSNorm, head_dim 128).
    # SSD_BENCH_TINY=1 shrinks it for CPU smokes.
    tiny = os.environ.get("SSD_BENCH_TINY") == "1"
    arch = os.environ.get("SSD_BENCH_ARCH", "llama")
    if tiny:
        # The tiny smoke always runs the shrunk llama geometry — label it as
        # such so a CPU smoke can never seed a qwen3/llama3b history "best".
        arch = "llama"
    model_tag = {"llama": "llama1b", "qwen3": "qwen3_1p7b",
                 "qwen3nq": "qwen3_1p7b_noqk",
                 "llama3b": "llama3b", "qwen3moe": "qwen3moe_3b"}[arch]
    model_dir = ("/tmp/ssd_bench_model_tiny" if tiny
                 else f"/tmp/ssd_bench_model_{model_tag}")
    os.makedirs(model_dir, exist_ok=True)
    if arch == "llama3b" and not tiny:
        # Llama-3.2-3B geometry: 6.4 GB of bf16 weights on the one chip.
        cfg = {
            "model_type": "llama",
            "vocab_size": 128256,
            "hidden_size": 3072,
            "intermediate_size": 8192,
            "num_hidden_layers": 28,
            "num_attention_heads": 24,
            "num_key_value_heads": 8,
            "head_dim": 128,
            "max_position_embeddings": 4096,
            "rms_norm_eps": 1e-5,
            "rope_theta": 500000.0,
            "tie_word_embeddings": True,
            "eos_token_id": 128001,
        }
    elif arch == "qwen3moe" and not tiny:
        # Qwen3-MoE-shaped 3B-total / ~0.6B-active geometry: 32 experts,
        # top-4, per-layer expert weights stream from HBM once per forward
        # (see models/transformer.py::_moe_mlp).
        cfg = {
            "model_type": "qwen3_moe",
            "vocab_size": 151936,
            "hidden_size": 1024,
            "intermediate_size": 1408,
            "num_hidden_layers": 24,
            "num_attention_heads": 16,
            "num_key_value_heads": 4,
            "head_dim": 128,
            "num_experts": 32,
            "num_experts_per_tok": 4,
            "moe_intermediate_size": 1408,
            "norm_topk_prob": True,
            "decoder_sparse_step": 1,
            "mlp_only_layers": [],
            "max_position_embeddings": 4096,
            "rms_norm_eps": 1e-6,
            "rope_theta": 1000000.0,
            "tie_word_embeddings": True,
            "eos_token_id": 151645,
        }
    elif arch == "qwen3nq" and not tiny:
        # Qwen3-1.7B geometry with the qk-norms ablated (model_type llama,
        # same dims incl. head_dim 128 and the 152k vocab): the control that
        # separates ARCH cost (per-head q/k RMSNorm on the VPU) from
        # GEOMETRY cost (hd 128, vocab) in the Qwen3 efficiency gap
        # (r4 VERDICT item 4).
        cfg = {
            "model_type": "llama",
            "vocab_size": 151936,
            "hidden_size": 2048,
            "intermediate_size": 6144,
            "num_hidden_layers": 28,
            "num_attention_heads": 16,
            "num_key_value_heads": 8,
            "head_dim": 128,
            "max_position_embeddings": 4096,
            "rms_norm_eps": 1e-6,
            "rope_theta": 1000000.0,
            "tie_word_embeddings": True,
            "eos_token_id": 151645,
        }
    elif arch == "qwen3" and not tiny:
        cfg = {
            "model_type": "qwen3",
            "vocab_size": 151936,
            "hidden_size": 2048,
            "intermediate_size": 6144,
            "num_hidden_layers": 28,
            "num_attention_heads": 16,
            "num_key_value_heads": 8,
            "head_dim": 128,
            "max_position_embeddings": 4096,
            "rms_norm_eps": 1e-6,
            "rope_theta": 1000000.0,
            "tie_word_embeddings": True,
            "eos_token_id": 151645,
        }
    else:
        cfg = {
            "model_type": "llama",
            "vocab_size": 512 if tiny else 128256,
            "hidden_size": 128 if tiny else 2048,
            "intermediate_size": 256 if tiny else 8192,
            "num_hidden_layers": 2 if tiny else 16,
            "num_attention_heads": 4 if tiny else 32,
            "num_key_value_heads": 2 if tiny else 8,
            "head_dim": 32 if tiny else 64,
            "max_position_embeddings": 4096,
            "rms_norm_eps": 1e-5,
            "rope_theta": 500000.0,
            "tie_word_embeddings": True,
            "eos_token_id": 128001 if not tiny else 2,
        }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    from ssd_tpu.llm import LLM
    from ssd_tpu.sampling_params import SamplingParams

    # Multi-step chains amortise the tunneled per-dispatch latency: 144 /
    # 203 / 210 tok/s at M=16/64/128 on the v5e (the forward itself runs at
    # ~4.7 ms = ~60% of the weight-read roofline). M=128 = the whole default
    # output in ONE dispatch; scale M with SSD_BENCH_OUT_LEN if raising it.
    multi_step = int(os.environ.get("SSD_BENCH_MULTI_STEP", "128"))
    kw = dict(
        init_random=True,
        dtype="bfloat16",
        max_model_len=2048,
        max_num_batched_tokens=4096,
        max_num_seqs=batch,
        kvcache_block_size=64,
        # Size the pool to the workload: bigger pools cost per-dispatch time
        # on runtimes that copy donated buffers (see memory notes).
        num_kvcache_blocks=max(64, 40 * batch),
        ctx_bucket_policy="single",
    )
    if os.environ.get("SSD_BENCH_QUANT"):
        # "int8" = weight-only quantization (utils/quant.py): halves the
        # weight bytes the decode streams per token.
        kw["quantization"] = os.environ["SSD_BENCH_QUANT"]
    if os.environ.get("SSD_BENCH_KV_QUANT"):
        # "int8" = int8 KV cache (ops/attention.py): halves the attention's
        # HBM reads — matters at long context, where the paged kernel is
        # the bound.
        kw["kv_quant"] = os.environ["SSD_BENCH_KV_QUANT"]
    if os.environ.get("SSD_BENCH_MOE_GATHER") == "0":
        # Dense all-expert control for the MoE decode gather path.
        kw["moe_gather"] = False
    if os.environ.get("SSD_BENCH_PALLAS"):
        # "0" forces the jnp-gather attention path, "1" forces Pallas —
        # for measuring the kernel-launch overhead at short contexts.
        kw["use_pallas"] = os.environ["SSD_BENCH_PALLAS"] == "1"
    if mode in ("sd", "ssd", "fasync"):
        # Speculation with a genuinely smaller draft (L/4 layers, same width).
        # With random weights a small draft would accept at chance level, so
        # the checkpoints are constructed for functional equality instead: the
        # target's upper layers have zero output projections (residual
        # passthrough -> its logits equal its own L/4-layer prefix), and the
        # draft IS that prefix. Acceptance is 100% like the old self-draft
        # mode, but the draft now genuinely costs 1/4 of the target, so sync
        # SD can beat AR on one chip — while the target still reads every
        # byte of its weights each forward, and weights flow through the real
        # safetensors loader. SSD_BENCH_SELF_DRAFT=1 restores self-drafting.
        if os.environ.get("SSD_BENCH_SELF_DRAFT") == "1":
            target_dir = draft_dir = model_dir
        else:
            # SSD_BENCH_DRAFT_NOISE lowers the draft's acceptance rate (the
            # realistic-draft operating curve; 0 = the constructed best case).
            # SSD_BENCH_DRAFT_VOCAB=N gives the draft an FR-Spec-style reduced
            # LM head of N rows (see build_spec_checkpoints): the draft chain
            # streams N*D head bytes per step instead of V*D.
            target_dir, draft_dir = build_spec_checkpoints(
                model_dir,
                draft_noise=float(os.environ.get("SSD_BENCH_DRAFT_NOISE", "0")),
                draft_vocab=int(os.environ.get("SSD_BENCH_DRAFT_VOCAB", "0")),
            )
        kw.update(speculate=True,
                  draft=draft_dir,
                  speculate_k=int(os.environ.get("SSD_BENCH_K", "4")),
                  draft_async=(mode in ("ssd", "fasync")), async_fan_out=2)
        if mode == "fasync":
            # Fused async SSD (engine/async_fused.py): R whole exchanges —
            # tree build, verify, and the tree-cache service — as ONE XLA
            # program per superstep (the one-chip answer to the reference's
            # two-GPU overlap). SSD_BENCH_SPEC_ROUNDS=1 selects the
            # per-exchange fused form (async_exchange_packed) instead.
            kw.update(
                async_fused=True,
                spec_rounds=int(os.environ.get("SSD_BENCH_SPEC_ROUNDS", "32")),
            )
        elif mode == "ssd" and os.environ.get("SSD_BENCH_ASYNC_FUSED") == "1":
            # The per-exchange fused form under the classic step loop.
            kw["async_fused"] = True
        if mode == "sd":
            # Fused multi-round SD: one dispatch + one host sync per
            # rounds * E[accepted+1] tokens (engine/fused_sd.py). Measured
            # on the v5e: 162 / 205 / 243 / 141 tok/s at R=8/16/32/64 —
            # R=32 covers the whole 128-token output in ~one dispatch;
            # R=64 overshoots the horizon and wastes rounds. Deeper chains
            # (k=8) measured WORSE (163): acceptance loss beats the extra
            # lookahead. Scale R with the output length.
            kw["spec_rounds"] = int(os.environ.get("SSD_BENCH_SPEC_ROUNDS", "32"))
        kw["init_random"] = target_dir == model_dir
        model_dir = target_dir
    elif mode == "ngram":
        # Model-free prompt-lookup speculation through the fused superstep
        # (Config.ngram_speculate): zero draft bytes, so the ceiling is the
        # pure verify roofline. SSD_BENCH_NGRAM_REGIME picks the operating
        # point, with identical model cost in all three:
        #   repeat  (default) — dead self-repeating model: matcher locks on,
        #             acceptance ~1 (the ceiling);
        #   walk    — dead t->t-1 walk: n-grams never repeat, acceptance ~0
        #             (the floor: every round commits 1 recovery token);
        #   organic — the standard random-weight model, random prompt.
        regime = os.environ.get("SSD_BENCH_NGRAM_REGIME", "repeat")
        if regime in ("repeat", "walk"):
            model_dir = build_dead_checkpoint(model_dir, walk=regime == "walk")
            kw["init_random"] = False
        kw.update(
            ngram_speculate=True,
            speculate_k=int(os.environ.get("SSD_BENCH_K", "4")),
            spec_rounds=int(os.environ.get("SSD_BENCH_SPEC_ROUNDS", "32")),
            ngram_n=int(os.environ.get("SSD_BENCH_NGRAM_N", "3")),
        )
    elif mode == "feagle":
        # Fused EAGLE superstep (use_eagle + spec_rounds > 1): the 1-layer
        # conditioned draft inside the one-dispatch multi-round program —
        # the engine's peak configuration. Constructed-equality pair so
        # acceptance ~= 1 (see build_eagle_checkpoints).
        L = cfg["num_hidden_layers"]
        target_dir, ddir = build_eagle_checkpoints(
            model_dir,
            draft_noise=float(os.environ.get("SSD_BENCH_DRAFT_NOISE", "0")),
        )
        model_dir = target_dir
        kw.update(
            speculate=True, draft=ddir, init_random=False,
            speculate_k=int(os.environ.get("SSD_BENCH_K", "3")),
            use_eagle=True,
            spec_rounds=int(os.environ.get("SSD_BENCH_SPEC_ROUNDS", "32")),
            eagle_layers=sorted([min(2, L - 1), L // 2, max(0, L - 3)]),
        )
    elif mode == "eagle":
        L = cfg["num_hidden_layers"]
        if os.environ.get("SSD_BENCH_EAGLE_RANDOM") == "1":
            # EAGLE-3 async draft at the target's geometry, random-init on
            # both sides: with random weights acceptance is chance-level, so
            # this measures the ENGINE cost of the full EAGLE path
            # (conditioned prefill -> packed glue -> tree build -> verify
            # with activation taps), not a speculation win.
            ddir = model_dir + "_eagle"
            os.makedirs(ddir, exist_ok=True)
            with open(os.path.join(ddir, "config.json"), "w") as f:
                json.dump({
                    "model_type": "llama",
                    "vocab_size": cfg["vocab_size"],
                    "draft_vocab_size": cfg["vocab_size"],
                    "hidden_size": cfg["hidden_size"],
                    "intermediate_size": cfg["intermediate_size"],
                    "num_hidden_layers": 1,
                    "num_attention_heads": cfg["num_attention_heads"],
                    "num_key_value_heads": cfg["num_key_value_heads"],
                    "head_dim": cfg.get("head_dim")
                    or cfg["hidden_size"] // cfg["num_attention_heads"],
                    "max_position_embeddings": cfg["max_position_embeddings"],
                    "rms_norm_eps": cfg["rms_norm_eps"],
                    "rope_theta": cfg["rope_theta"],
                    "eos_token_id": cfg["eos_token_id"],
                }, f)
            target_dir = model_dir
        else:
            # Default: the constructed-equality pair (acceptance ~= 1 with
            # real byte costs on both sides; see build_eagle_checkpoints) —
            # the genuine EAGLE speculation-win datapoint.
            target_dir, ddir = build_eagle_checkpoints(
                model_dir,
                draft_noise=float(
                    os.environ.get("SSD_BENCH_DRAFT_NOISE", "0")),
            )
            kw["init_random"] = False
        model_dir = target_dir
        kw.update(speculate=True, draft=ddir,
                  speculate_k=int(os.environ.get("SSD_BENCH_K", "3")),
                  draft_async=True, use_eagle=True, jit_speculate=True,
                  async_fan_out=2,
                  # The config default [2, L//2, L-3] needs L >= 5.
                  eagle_layers=sorted([min(2, L - 1), L // 2, max(0, L - 3)]))
    else:
        kw.update(multi_step=multi_step)
    engine = LLM(model_dir, **kw)

    rng = np.random.default_rng(0)
    # SSD_BENCH_PROMPT_LEN stretches the decode context (e.g. 1900 puts the
    # whole generation deep in the 2048 bucket — where attention reads, and
    # therefore the int8 KV cache, matter).
    plen = int(os.environ.get("SSD_BENCH_PROMPT_LEN", "128"))
    hi = min(50000, cfg["vocab_size"] - 1)  # tiny smokes have a 512 vocab
    prompts = [rng.integers(10, hi, size=plen).tolist() for _ in range(batch)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=out_len, ignore_eos=True)

    # Warmup: pre-compile all decode buckets + a short generate for the
    # prefill buckets, outside the timed window. prefill_s_pads=() skips the
    # default full flat-prefill ladder (~18 one-time tunnel compiles this
    # fixed-shape bench never hits): the warm generate covers its buckets.
    if os.environ.get("SSD_BENCH_WARM") == "min":
        # Fixed-shape measurement: warm only the (B_pad, R) rung this bench
        # actually runs (the full 16-rung b=8 superstep ladder costs over an
        # hour of one-time remote compiles on the tunneled chip).
        from ssd_tpu.engine.model_runner import next_pow2

        engine.warmup(
            prefill_s_pads=(), batch_pads=[next_pow2(batch)],
            round_set=(
                (kw["spec_rounds"],) if kw.get("spec_rounds", 1) > 1
                else None),
        )
    else:
        engine.warmup(prefill_s_pads=())
    warm_sp = SamplingParams(temperature=0.0, max_new_tokens=4,
                             ignore_eos=True)
    engine.generate([p[:] for p in prompts], warm_sp, use_tqdm=False)
    # Second warm pass: the SECOND generate of the same prompts is the first
    # to hit the prefix cache, whose cached-offset prefill is its own
    # program — without this, the first MEASURED sample eats that compile
    # mid-decode (the round-3 "b=8 async spread of 52 vs 503 tok/s" was
    # exactly this artifact: first-sample 60 vs steady 437/460 re-measured).
    engine.generate([p[:] for p in prompts], warm_sp, use_tqdm=False)

    reps = int(os.environ.get("SSD_BENCH_REPS", "3"))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs, metrics = engine.generate(
            [p[:] for p in prompts], sp, use_tqdm=False
        )
        wall = time.perf_counter() - t0
        total_out = sum(len(o["token_ids"]) for o in outs)
        samples.append(
            metrics["decode_total_tokens"] / metrics["decode_total_time"]
            if metrics["decode_total_time"] > 0 else total_out / wall
        )
    decode_tps = float(np.median(samples))

    import jax

    backend = jax.default_backend()
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_history.json")
    # llama keys stay unsuffixed so round-1/2 history and bests carry over.
    arch_sfx = "" if arch == "llama" else f"_{model_tag}"
    if os.environ.get("SSD_BENCH_QUANT"):
        arch_sfx += f"_{os.environ['SSD_BENCH_QUANT']}"
    if os.environ.get("SSD_BENCH_KV_QUANT"):
        arch_sfx += f"_kv{os.environ['SSD_BENCH_KV_QUANT']}"
    if plen != 128:
        arch_sfx += f"_p{plen}"
    if os.environ.get("SSD_BENCH_MOE_GATHER") == "0" and arch == "qwen3moe":
        # MoE-only control flag; on expert-free arches it is a no-op and must
        # not fork a mislabeled history series.
        arch_sfx += "_dense"
    if mode == "ngram":
        arch_sfx += f"_{os.environ.get('SSD_BENCH_NGRAM_REGIME', 'repeat')}"
    if mode == "ssd" and os.environ.get("SSD_BENCH_ASYNC_FUSED") == "1":
        arch_sfx += "_fx"
    if mode in ("sd", "ssd", "fasync", "eagle", "feagle", "ngram"):
        # Non-default speculation operating points get their own series.
        k_default = "3" if mode in ("eagle", "feagle") else "4"
        if os.environ.get("SSD_BENCH_K", k_default) != k_default:
            arch_sfx += f"_k{os.environ['SSD_BENCH_K']}"
        if float(os.environ.get("SSD_BENCH_DRAFT_NOISE", "0")):
            arch_sfx += f"_n{os.environ['SSD_BENCH_DRAFT_NOISE']}"
        if int(os.environ.get("SSD_BENCH_DRAFT_VOCAB", "0")):
            arch_sfx += f"_dv{os.environ['SSD_BENCH_DRAFT_VOCAB']}"
    key = f"decode_tok_s_{backend}_{mode}_b{batch}_o{out_len}{arch_sfx}"
    hist, best = {}, None
    if os.path.exists(hist_path):
        try:
            hist = json.load(open(hist_path))
            entry = hist.get(key)
            if isinstance(entry, dict):            # round-2 format
                best = entry.get("best")
            elif isinstance(entry, (int, float)):  # round-1 format: bare last
                best = entry
        except Exception:
            hist = {}
    try:
        hist[key] = {
            "last": round(decode_tps, 2),
            "best": round(max(decode_tps, best) if best else decode_tps, 2),
            "samples": [round(s, 2) for s in samples],
        }
        json.dump(hist, open(hist_path, "w"), indent=1)
    except Exception:
        pass

    vs = decode_tps / best if best else 1.0
    quant_sfx = (f"_{os.environ['SSD_BENCH_QUANT']}"
                 if os.environ.get("SSD_BENCH_QUANT") else "")
    fx_sfx = ("_fx" if mode == "ssd"
              and os.environ.get("SSD_BENCH_ASYNC_FUSED") == "1" else "")
    if float(os.environ.get("SSD_BENCH_DRAFT_NOISE", "0")):
        fx_sfx += f"_n{os.environ['SSD_BENCH_DRAFT_NOISE']}"
    if int(os.environ.get("SSD_BENCH_DRAFT_VOCAB", "0")):
        fx_sfx += f"_dv{os.environ['SSD_BENCH_DRAFT_VOCAB']}"
    if plen != 128:
        fx_sfx += f"_p{plen}"
    result = {
        "metric": f"decode_throughput_{model_tag}{quant_sfx}_{mode}{fx_sfx}_b{batch}",
        "value": round(decode_tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(result))
    # Release the chip state before a sibling measurement reuses the process.
    engine.exit()
    del engine
    import gc

    gc.collect()
    return result


# The engine's frontier modes, emitted as extra JSON lines after the default
# regression gate (r4 VERDICT item 7: the gate is roofline-saturated at
# ~275 tok/s, so the driver artifact should also show the modes the engine
# actually leads with). Each runs in-process (the single chip cannot be
# shared with a subprocess), sequentially, with its own history key.
_EXTRA_MODES = (
    ("ngram-repeat", {"SSD_BENCH_MODE": "ngram"}),
    ("int8-fused-sd", {"SSD_BENCH_MODE": "sd", "SSD_BENCH_QUANT": "int8"}),
    ("int8-fused-eagle", {"SSD_BENCH_MODE": "feagle",
                          "SSD_BENCH_QUANT": "int8"}),
    ("fused-async-ssd", {"SSD_BENCH_MODE": "fasync"}),
)


def main():
    result = _run_single()
    default_run = os.environ.get("SSD_BENCH_EXTRA") == "force" or (
        os.environ.get("SSD_BENCH_EXTRA", "1") != "0"
        and os.environ.get("SSD_BENCH_MODE", "sd") == "sd"
        and os.environ.get("SSD_BENCH_BATCH", "1") == "1"
        and os.environ.get("SSD_BENCH_TINY") != "1"
        and os.environ.get("SSD_BENCH_ARCH", "llama") == "llama"
        and not os.environ.get("SSD_BENCH_QUANT")
        and not os.environ.get("SSD_BENCH_KV_QUANT")
    )
    if not default_run:
        return
    for name, overrides in _EXTRA_MODES:
        saved = {k: os.environ.get(k) for k in overrides}
        os.environ.update(overrides)
        try:
            _run_single()
        except Exception as e:  # an extra must never sink the gate line
            print(f"[extra {name} failed: {type(e).__name__}: {e}]",
                  flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    # Re-print the regression-gate line LAST so the driver's parsed metric
    # stays the historical decode_throughput_llama1b_sd_b1 series.
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
