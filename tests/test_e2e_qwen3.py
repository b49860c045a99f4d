"""Qwen-3 family end-to-end: AR greedy token-exact vs HF, and sync spec decode
(reference ssd/models/qwen3.py parity — same skeleton + per-head q/k RMSNorm).
"""

import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_qwen3, random_prompt, rng


@pytest.fixture(scope="module")
def qwen_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_qwen3")
    make_tiny_qwen3(d)
    return str(d)


@pytest.fixture(scope="module")
def qwen_draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_qwen3_draft")
    make_tiny_qwen3(d, layers=1, hidden=32, heads=4, kv_heads=2, head_dim=8, seed=5)
    return str(d)


def test_qwen3_ar_greedy_matches_hf(qwen_dir):
    engine = LLM(
        qwen_dir, dtype="float32", max_model_len=256,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=64, max_num_seqs=4,
    )
    prompts = [random_prompt(rng(20), 8, 24) for _ in range(2)]
    wants = [hf_greedy(qwen_dir, p, 32) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_qwen3_sync_sd_greedy_token_exact(qwen_dir, qwen_draft_dir):
    engine = LLM(
        qwen_dir, draft=qwen_draft_dir, speculate=True, speculate_k=3,
        dtype="float32", max_model_len=256, max_num_batched_tokens=1024,
        kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=4,
    )
    prompt = random_prompt(rng(21), 10, 20)
    want = hf_greedy(qwen_dir, prompt, 32)
    outs, metrics = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_qwen3_async_ssd_greedy_token_exact(qwen_dir, qwen_draft_dir):
    """Reference flagship Qwen config (--qwen --size 32 --spec --async with a
    0.6B draft) at tiny scale: async SSD must stay greedy token-exact."""
    engine = LLM(
        qwen_dir, draft=qwen_draft_dir, speculate=True, draft_async=True,
        speculate_k=3, async_fan_out=2, dtype="float32", max_model_len=256,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=96, max_num_seqs=2,
    )
    prompt = random_prompt(rng(25), 8, 24)
    want = hf_greedy(qwen_dir, prompt, 32)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert outs[0]["token_ids"] == want
    assert metrics["cache_hits"]


def test_qwen3_fused_async_greedy_token_exact(qwen_dir, qwen_draft_dir):
    """The round-5 fused async superstep at the Qwen-3 geometry (per-head
    q/k RMSNorm inside both the tree build and the verify forward)."""
    engine = LLM(
        qwen_dir, draft=qwen_draft_dir, speculate=True, draft_async=True,
        async_fused=True, spec_rounds=3, speculate_k=2, async_fan_out=2,
        dtype="float32", max_model_len=256, max_num_batched_tokens=1024,
        kvcache_block_size=16, num_kvcache_blocks=96, max_num_seqs=4,
    )
    prompt = random_prompt(rng(61), 8, 24)
    want = hf_greedy(qwen_dir, prompt, 32)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert outs[0]["token_ids"] == want
    assert metrics["sd_superstep_times"]
