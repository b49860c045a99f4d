"""Reduced draft vocab (FR-Spec style): the draft's LM head scores a subset
of the target vocab and compute_logits scatters back to full-V with -inf
elsewhere (models/transformer.py::compute_logits, the standard-draft analogue
of the EAGLE-3 d2t map, reference eagle3_draft_llama3.py:314-352).

Exactness contract: a reduced-vocab draft must never change greedy outputs —
a subset miss only costs acceptance, the recovery token always comes from the
target's full-vocab distribution.
"""

import json
import os
import shutil

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng

VOCAB = 128
SUBSET = 48


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    """Tiny untied llama whose LM-head rows inside the subset are scaled 4x,
    concentrating greedy emissions in the subset (the frequent-token
    concentration real LMs have, which is what makes a reduced draft vocab
    pay). HF reloads the edited checkpoint, so it stays the oracle."""
    from safetensors.numpy import load_file, save_file

    d = str(tmp_path_factory.mktemp("dv_target"))
    make_tiny_llama(d, vocab=VOCAB, tie=False, seed=3)
    f = os.path.join(d, "model.safetensors")
    t = load_file(f)
    head = t["lm_head.weight"].astype(np.float32)
    head[_subset()] *= 4.0
    t["lm_head.weight"] = head.astype(t["lm_head.weight"].dtype)
    save_file(t, f)
    return d


def _subset():
    # A non-contiguous subset so the d2t offsets are non-trivial.
    return np.sort(np.random.default_rng(5).permutation(VOCAB)[:SUBSET])


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory, target_dir):
    """The SAME model with its LM head reduced to the subset rows + d2t —
    isolates the vocab-reduction mechanics (acceptance ~1 iff the scatter,
    sampling, and verify compose exactly)."""
    from safetensors.numpy import load_file, save_file

    d = str(tmp_path_factory.mktemp("dv_draft"))
    t = load_file(os.path.join(target_dir, "model.safetensors"))
    sub = _subset()
    t["lm_head.weight"] = t["lm_head.weight"][sub]
    t["d2t"] = (sub - np.arange(SUBSET)).astype(np.int32)
    save_file(t, os.path.join(d, "model.safetensors"))
    shutil.copy(os.path.join(target_dir, "config.json"),
                os.path.join(d, "config.json"))
    return d


def test_reduced_head_scatter_matches_masked_full_head():
    """compute_logits with d2t == full-head logits masked to -inf outside the
    subset (on the same hidden states)."""
    import jax
    import jax.numpy as jnp

    from ssd_tpu.models.transformer import Arch, compute_logits

    arch = Arch(
        vocab_size=VOCAB, hidden_size=16, intermediate_size=32, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=8, rms_norm_eps=1e-5,
        rope_theta=1e4, use_qk_norm=False, tie_embeddings=False,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    head = jax.random.normal(k1, (VOCAB, 16), jnp.float32)
    hidden = jax.random.normal(k2, (5, 16), jnp.float32)
    ln = jnp.ones((16,), jnp.float32)
    sub = jnp.asarray(_subset(), jnp.int32)

    full = compute_logits({"final_ln": ln, "lm_head": head}, hidden, arch)
    red = compute_logits(
        {"final_ln": ln, "lm_head": head[sub],
         "d2t": sub - jnp.arange(SUBSET, dtype=jnp.int32)},
        hidden, arch,
    )
    mask = jnp.zeros((VOCAB,), bool).at[sub].set(True)
    np.testing.assert_allclose(
        np.asarray(red[:, mask]), np.asarray(full[:, mask]), rtol=1e-6)
    assert bool(jnp.all(red[:, ~mask] == -jnp.inf))


def _engine(target_dir, draft_dir, **kw):
    return LLM(
        target_dir, draft=draft_dir, speculate=True, speculate_k=3,
        dtype="float32", max_model_len=256, max_num_batched_tokens=1024,
        kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=4, **kw,
    )


def test_sync_sd_reduced_vocab_token_exact_high_acceptance(target_dir, draft_dir):
    engine = _engine(target_dir, draft_dir)
    prompts = [random_prompt(rng(21), 8, 24, vocab=VOCAB) for _ in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    # The subset covers the (concentrated) emissions, so the reduced head
    # must actually speculate, not just fall back to recovery tokens.
    lens = metrics["accepted_suffix_lens_with_recovery"]
    assert np.mean(lens) > 2.0, f"reduced-vocab draft barely accepts: {lens}"


def test_fused_sd_reduced_vocab_token_exact(target_dir, draft_dir):
    engine = _engine(target_dir, draft_dir, spec_rounds=4)
    prompt = random_prompt(rng(22), 10, 20, vocab=VOCAB)
    want = hf_greedy(target_dir, prompt, 40)
    outs, _ = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_async_ssd_reduced_vocab_token_exact(target_dir, draft_dir):
    engine = _engine(target_dir, draft_dir, draft_async=True, async_fan_out=2)
    try:
        prompt = random_prompt(rng(23), 10, 20, vocab=VOCAB)
        want = hf_greedy(target_dir, prompt, 32)
        outs, _ = engine.generate(
            [prompt],
            SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
            use_tqdm=False,
        )
        assert outs[0]["token_ids"] == want
    finally:
        engine.exit()


def test_bench_builds_reduced_vocab_spec_checkpoints(tmp_path):
    """bench.py's SSD_BENCH_DRAFT_VOCAB construction loads end-to-end."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "driver_bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    driver_bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(driver_bench)

    model_dir = str(tmp_path / "m")
    os.makedirs(model_dir)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": VOCAB, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 4,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "max_position_embeddings": 256,
            "rms_norm_eps": 1e-5, "rope_theta": 1e4,
            "tie_word_embeddings": True, "eos_token_id": 2,
        }, f)
    tdir, ddir = driver_bench.build_spec_checkpoints(model_dir, draft_vocab=32)
    engine = _engine(tdir, ddir, spec_rounds=2)
    outs, metrics = engine.generate(
        [random_prompt(rng(24), 8, 16, vocab=VOCAB)],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    # METRICS is engine-global and reset in place by the next generate —
    # capture before running the AR control engine.
    lens = list(metrics["accepted_suffix_lens_with_recovery"])
    ar = LLM(tdir, dtype="float32", max_model_len=256,
             max_num_batched_tokens=1024, kvcache_block_size=16,
             num_kvcache_blocks=64, max_num_seqs=4)
    ar_outs, _ = ar.generate(
        [random_prompt(rng(24), 8, 16, vocab=VOCAB)],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == ar_outs[0]["token_ids"]
    # The 2x-scaled subset rows concentrate emissions, so acceptance is real.
    assert np.mean(lens) > 2.0, f"subset construction failed to accept: {lens}"
