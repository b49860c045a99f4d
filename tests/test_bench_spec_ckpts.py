"""The driver bench's spec-checkpoint construction (repo-root bench.py):
the target's upper layers have zero output projections, the draft is the live
prefix, so greedy outputs must agree token-for-token while the draft reads a
quarter of the layer weights. The flagship bench number rests on this
construction — pin it for both bench architectures."""

import importlib.util
import json
import os

import numpy as np
import pytest

from ssd_tpu.llm import LLM
from ssd_tpu.sampling_params import SamplingParams


def _driver_bench():
    spec = importlib.util.spec_from_file_location(
        "driver_bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


CFGS = {
    "llama": {
        "model_type": "llama", "vocab_size": 256, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
        "max_position_embeddings": 512, "rms_norm_eps": 1e-5,
        "rope_theta": 500000.0, "tie_word_embeddings": True,
        "eos_token_id": 1,
    },
    "qwen3": {
        "model_type": "qwen3", "vocab_size": 256, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
        "max_position_embeddings": 512, "rms_norm_eps": 1e-6,
        "rope_theta": 1000000.0, "tie_word_embeddings": True,
        "eos_token_id": 1,
    },
    "qwen3moe": {
        "model_type": "qwen3_moe", "vocab_size": 256, "hidden_size": 64,
        "intermediate_size": 96, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
        "num_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 96, "norm_topk_prob": True,
        "decoder_sparse_step": 1, "mlp_only_layers": [],
        "max_position_embeddings": 512, "rms_norm_eps": 1e-6,
        "rope_theta": 1000000.0, "tie_word_embeddings": True,
        "eos_token_id": 1,
    },
}

ENGINE_KW = dict(
    dtype="float32", max_model_len=256, max_num_batched_tokens=512,
    max_num_seqs=2, kvcache_block_size=16, num_kvcache_blocks=48,
    ctx_bucket_policy="single",
)


@pytest.mark.parametrize("arch", ["llama", "qwen3", "qwen3moe"])
def test_spec_ckpt_fused_sd_matches_target_ar(tmp_path, arch):
    d = tmp_path / arch
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(CFGS[arch], f)
    tdir, ddir = _driver_bench().build_spec_checkpoints(str(d))

    if arch == "qwen3":
        from safetensors.numpy import load_file

        keys = load_file(os.path.join(ddir, "model.safetensors"))
        assert "model.layers.0.self_attn.q_norm.weight" in keys
        assert "model.layers.0.self_attn.k_norm.weight" in keys

    rng = np.random.default_rng(3)
    prompts = [rng.integers(5, 250, size=n).tolist() for n in (7, 12)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)

    ar = LLM(tdir, **ENGINE_KW)
    ar_outs, _ = ar.generate([p[:] for p in prompts], sp, use_tqdm=False)
    ar.exit()

    sd = LLM(tdir, draft=ddir, speculate=True, speculate_k=3, spec_rounds=4,
             **ENGINE_KW)
    sd_outs, metrics = sd.generate([p[:] for p in prompts], sp, use_tqdm=False)
    sd.exit()

    for a, s in zip(ar_outs, sd_outs):
        assert a["token_ids"] == s["token_ids"]
    # fp32: draft prefix == target exactly, so every speculation is accepted
    # (entries are accepted+recovery per round; K+1 = full, the horizon can
    # truncate the final round).
    lens = metrics["accepted_suffix_lens_with_recovery"]
    assert max(lens) == 4 and float(np.mean(lens)) > 3.0


def test_eagle_ckpt_acceptance_one(tmp_path):
    """build_eagle_checkpoints' constructed equality: the dead target walks
    t -> t-1 and the 1-layer EAGLE draft's attention cancels the conditioning
    residual, so fused-EAGLE acceptance must be exactly 1.0 (every round
    commits K+1 tokens) and outputs must equal the target's own AR output."""
    d = tmp_path / "eagle_eq"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump({**CFGS["llama"], "num_hidden_layers": 2}, f)
    mod = _driver_bench()
    tdir, ddir = mod.build_eagle_checkpoints(str(d))

    rng = np.random.default_rng(4)
    prompt = rng.integers(5, 250, size=9).tolist()
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)

    ar = LLM(tdir, **ENGINE_KW)
    want, _ = ar.generate([prompt[:]], sp, use_tqdm=False)
    ar.exit()
    # The walk: descending token ids (mod V).
    toks = want[0]["token_ids"]
    assert all((a - b) % CFGS["llama"]["vocab_size"] == 1
               for a, b in zip(toks, toks[1:]))

    eng = LLM(tdir, draft=ddir, speculate=True, use_eagle=True,
              speculate_k=3, spec_rounds=4, eagle_layers=[0, 1, 1],
              **ENGINE_KW)
    outs, metrics = eng.generate([prompt[:]], sp, use_tqdm=False)
    eng.exit()
    assert outs[0]["token_ids"] == toks
    lens = metrics["accepted_suffix_lens_with_recovery"]
    assert lens and min(lens[:-1] or lens) == 4, lens  # full accept each round


@pytest.mark.parametrize("arch", ["qwen3", "qwen3moe"])
def test_dead_ckpt_other_families(tmp_path, arch):
    """build_dead_checkpoint writes loadable qwen3 / qwen3-MoE targets (qk
    norms, per-expert zero down projections) whose repeat regime locks the
    ngram matcher on."""
    d = tmp_path / arch
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump({**CFGS[arch], "num_hidden_layers": 2}, f)
    mod = _driver_bench()
    rdir = mod.build_dead_checkpoint(str(d), walk=False)
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)
    prompt = np.random.default_rng(6).integers(5, 250, size=8).tolist()
    ng = LLM(rdir, ngram_speculate=True, speculate_k=3, spec_rounds=2,
             ngram_n=3, **ENGINE_KW)
    _, m = ng.generate([prompt[:]], sp, use_tqdm=False)
    lens = m["accepted_suffix_lens_with_recovery"]
    assert lens and float(np.mean(lens)) > 3.0, lens


def test_dead_ckpt_regimes(tmp_path):
    """build_dead_checkpoint: walk never repeats an n-gram (matcher floor);
    repeat locks the matcher on (ceiling)."""
    d = tmp_path / "dead"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump({**CFGS["llama"], "num_hidden_layers": 2}, f)
    mod = _driver_bench()
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)
    rng = np.random.default_rng(5)
    prompt = rng.integers(5, 250, size=8).tolist()

    wdir = mod.build_dead_checkpoint(str(d), walk=True)
    ng = LLM(wdir, ngram_speculate=True, speculate_k=3, spec_rounds=2,
             ngram_n=3, **ENGINE_KW)
    _, m = ng.generate([prompt[:]], sp, use_tqdm=False)
    lens = m["accepted_suffix_lens_with_recovery"]
    assert lens and float(np.mean(lens)) < 1.5, lens  # floor: ~1 token/round

    rdir = mod.build_dead_checkpoint(str(d), walk=False)
    ng2 = LLM(rdir, ngram_speculate=True, speculate_k=3, spec_rounds=2,
              ngram_n=3, **ENGINE_KW)
    _, m2 = ng2.generate([prompt[:]], sp, use_tqdm=False)
    lens2 = m2["accepted_suffix_lens_with_recovery"]
    assert lens2 and float(np.mean(lens2)) > 3.0, lens2  # ceiling: locked on
