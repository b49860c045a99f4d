"""Async SSD end-to-end: the flagship path.

Exactness gates (reference README.md:16-27 contract):
 - greedy outputs token-exact vs HF (the AR oracle), with and without
   jit_speculate;
 - with draft == target at temp 0, the tree cache converges to hits and
   speculation is accepted at full depth;
 - temp > 0 runs produce valid outputs (statistical path smoke).
"""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("async_target_llama")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("async_draft_llama")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, heads=4, kv_heads=2, seed=7)
    return str(d)


def async_engine(target_dir, draft_dir, k=3, f=2, **kw):
    return LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        draft_async=True,
        speculate_k=k,
        async_fan_out=f,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=4,
        **kw,
    )


def test_async_ssd_greedy_token_exact(target_dir, draft_dir):
    engine = async_engine(target_dir, draft_dir, k=3, f=2)
    prompts = [random_prompt(rng(20), 8, 24) for _ in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    assert metrics["accepted_suffix_lens_with_recovery"], "spec path not exercised"
    assert metrics["cache_hits"], "async handshake not exercised"


def test_async_ssd_jit_speculate_greedy_token_exact(target_dir, draft_dir):
    engine = async_engine(target_dir, draft_dir, k=3, f=2, jit_speculate=True)
    prompt = random_prompt(rng(21), 8, 24)
    want = hf_greedy(target_dir, prompt, 32)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert outs[0]["token_ids"] == want


def test_async_ssd_self_draft_hits_and_accepts(target_dir):
    """With draft == target at temp 0, the glue logits match the target's, so
    the fork at each depth contains the target argmax: after warmup the cache
    hit rate must approach 1 and full speculations must be accepted."""
    engine = async_engine(target_dir, target_dir, k=3, f=2)
    prompt = random_prompt(rng(22), 8, 16)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=48, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    want = hf_greedy(target_dir, prompt, 48)
    assert outs[0]["token_ids"] == want

    hits = metrics["cache_hits"]
    # First request is always a miss; everything after must hit.
    assert sum(hits[1:]) == len(hits) - 1, f"expected all hits after warmup: {hits}"
    on_hit = metrics["accepted_suffix_lens_on_hit"]
    assert on_hit and all(n == 4 for n in on_hit), (
        f"draft==target must accept K+1 tokens per hit step: {on_hit}"
    )


def test_async_ssd_batched(target_dir, draft_dir):
    engine = async_engine(target_dir, draft_dir, k=3, f=2)
    prompts = [random_prompt(rng(100 + i), 6, 20) for i in range(4)]
    wants = [hf_greedy(target_dir, p, 24) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_async_ssd_sampled_runs(target_dir, draft_dir):
    """temp > 0: rejection sampling path produces max_new_tokens valid ids."""
    engine = async_engine(target_dir, draft_dir, k=2, f=2)
    prompt = random_prompt(rng(30), 8, 16)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.8, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert len(outs[0]["token_ids"]) == 24
    assert all(0 <= t < 128 for t in outs[0]["token_ids"])
    assert metrics["cache_hits"]


def test_async_ssd_sampler_x_runs(target_dir, draft_dir):
    """sampler_x tree-mode rescaling end-to-end."""
    engine = async_engine(target_dir, draft_dir, k=2, f=2, sampler_x=2.0)
    prompt = random_prompt(rng(31), 8, 16)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.7, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert len(outs[0]["token_ids"]) == 16


def test_async_ssd_mixed_lengths_finish_midstream(target_dir, draft_dir):
    """Sequences with different max_new_tokens leave the batch at different
    steps; the shrinking handshake batch must stay token-exact for all."""
    engine = async_engine(target_dir, draft_dir, k=2, f=2)
    prompts = [random_prompt(rng(800 + i), 8, 16) for i in range(3)]
    lens = [8, 20, 32]
    wants = [hf_greedy(target_dir, p, n) for p, n in zip(prompts, lens)]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        [SamplingParams(temperature=0.0, max_new_tokens=n, ignore_eos=True)
         for n in lens],
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_async_ssd_warmup_then_exact(target_dir, draft_dir):
    """LLM.warmup() pre-compiles decode/chain/tree buckets with ghost
    batches; it must leave no state that disturbs exactness."""
    engine = async_engine(target_dir, draft_dir, k=2, f=2)
    engine.warmup()
    assert engine.draft_server.runner.tree_cache_keys.shape[0] == 0
    prompt = random_prompt(rng(801), 8, 16)
    want = hf_greedy(target_dir, prompt, 16)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert outs[0]["token_ids"] == want


def test_async_ssd_draft_dp2_token_exact(target_dir, draft_dir):
    """Draft data parallelism (reference roadmap README.md:130): two draft
    replicas on their own devices split the batch by seq_id; outputs must
    stay greedy token-exact and both replicas must serve rows."""
    engine = LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        draft_async=True,
        draft_dp=2,
        num_devices=3,  # tp=1 target + 2 draft replica devices
        speculate_k=2,
        async_fan_out=2,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=4,
    )
    assert len(engine.draft_server.runners) == 2
    d0 = engine.draft_server.runners[0].device
    d1 = engine.draft_server.runners[1].device
    assert d0 is not None and d1 is not None and d0 != d1
    prompts = [random_prompt(rng(990 + i), 8, 20) for i in range(3)]
    wants = [hf_greedy(target_dir, p, 24) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    assert metrics["cache_hits"]
