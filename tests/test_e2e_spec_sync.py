"""Sync speculative decoding end-to-end: greedy outputs must be token-exact
vs the AR path / HF (the reference's exactness contract, BASELINE.md gate 1).
"""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec_target_llama")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec_draft_llama")
    # Same family/vocab, different (smaller) model.
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, heads=4, kv_heads=2, seed=7)
    return str(d)


def spec_engine(target_dir, draft_dir, k=3, **kw):
    return LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        speculate_k=k,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_seqs=4,
        **kw,
    )


def test_sync_sd_greedy_token_exact(target_dir, draft_dir):
    engine = spec_engine(target_dir, draft_dir, k=3)
    prompts = [random_prompt(rng(10), 8, 24) for _ in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    assert metrics["accepted_suffix_lens_with_recovery"], "spec path not exercised"


def test_sync_sd_draft_equals_target_accepts_everything(target_dir):
    """With draft == target at temp 0, every speculated token must be accepted
    (avg tokens/step == K+1)."""
    k = 3
    engine = spec_engine(target_dir, target_dir, k=k)
    prompt = random_prompt(rng(11), 10, 20)
    outs, metrics = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == hf_greedy(target_dir, prompt, 24)
    lens = metrics["accepted_suffix_lens_with_recovery"]
    # All steps except possibly the truncated final one accept K+1 tokens.
    assert all(n == k + 1 for n in lens[:-1])


def test_sync_sd_block_boundary(target_dir, draft_dir):
    """Spec steps that cross KV-block boundaries and roll back."""
    engine = spec_engine(target_dir, draft_dir, k=5)
    prompt = random_prompt(rng(12), 13, 14)
    want = hf_greedy(target_dir, prompt, 48)
    outs, _ = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_new_tokens=48, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_sync_sd_temperature_statistics(target_dir):
    """draft == target at temp 1 with jit_speculate-style ratio acceptance is
    not exercised in sync mode (no cache hits), so acceptance falls back to
    greedy compare of sampled tokens; just check generation completes and
    output length is exact."""
    engine = spec_engine(target_dir, target_dir, k=2)
    outs, metrics = engine.generate(
        [random_prompt(rng(13), 8, 16)],
        SamplingParams(temperature=1.0, max_new_tokens=20, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 20
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_sync_sd_eos_in_suffix(target_dir, draft_dir):
    r = rng(14)
    engine = spec_engine(target_dir, draft_dir, k=3)
    for _ in range(20):
        prompt = random_prompt(r, 8, 30)
        want = hf_greedy(target_dir, prompt, 64)
        if 2 in want:
            cut = want[: want.index(2) + 1]
            outs, _ = engine.generate(
                [prompt],
                SamplingParams(temperature=0.0, max_new_tokens=64, ignore_eos=False),
                use_tqdm=False,
            )
            assert outs[0]["token_ids"] == cut
            return
    pytest.skip("no greedy continuation hit eos")
