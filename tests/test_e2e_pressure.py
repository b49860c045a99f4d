"""KV-pressure end-to-end: with a cache too small for the whole batch, the
scheduler must preempt (deallocate + absorb completions into the prompt +
re-prefill, reference scheduler.py:130-146) and still produce token-exact
greedy output in every decode mode."""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pressure_target")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pressure_draft")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, heads=4, kv_heads=2, seed=7)
    return str(d)


def test_ar_preemption_under_pressure_token_exact(target_dir):
    # 4 seqs x up to (24 prompt + 48 out) tokens = ~288 slots needed at peak;
    # 14 blocks x 16 = 224 slots forces preemption mid-flight.
    engine = LLM(
        target_dir,
        dtype="float32",
        max_model_len=128,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=14,
        max_num_seqs=4,
    )
    prompts = [random_prompt(rng(300 + i), 16, 24) for i in range(4)]
    wants = [hf_greedy(target_dir, p, 48) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=48, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_async_ssd_preemption_under_pressure_token_exact(target_dir, draft_dir):
    engine = LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        draft_async=True,
        speculate_k=2,
        async_fan_out=2,
        dtype="float32",
        max_model_len=160,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        # Megaspec lookahead (K+1 + K*MQ = 3 + 12) per scheduled seq; keep
        # the pool tight enough that 3 seqs cannot all hold blocks.
        num_kvcache_blocks=22,
        max_num_seqs=3,
    )
    prompts = [random_prompt(rng(400 + i), 16, 24) for i in range(3)]
    wants = [hf_greedy(target_dir, p, 40) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_fused_sd_preemption_under_pressure_token_exact(target_dir, draft_dir):
    """Fused multi-round SD reserves spec_rounds*(K+1)+1 lookahead slots per
    scheduled sequence; under a tight pool that forces preemption between
    supersteps, outputs must stay token-exact (recovery tokens are reseeded
    by the re-prefill)."""
    engine = LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        speculate_k=2,
        spec_rounds=3,
        dtype="float32",
        max_model_len=160,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        # Lookahead 3*(2+1)+1 = 10 per scheduled seq per step; 20 blocks x 16
        # cannot hold 3 seqs' prompts + lookahead simultaneously.
        num_kvcache_blocks=20,
        max_num_seqs=3,
    )
    prompts = [random_prompt(rng(500 + i), 16, 24) for i in range(3)]
    wants = [hf_greedy(target_dir, p, 40) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_fused_async_preemption_under_pressure_token_exact(target_dir, draft_dir):
    """The fused async superstep reserves R*(K+1) target + R*(K+1)+megaspec
    draft lookahead slots per scheduled sequence; under a pool too tight for
    the whole batch the scheduler must preempt between supersteps (the
    in-program tree state is rebuilt by the chain prime, so nothing stales)
    and outputs stay token-exact."""
    engine = LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        draft_async=True,
        async_fused=True,
        speculate_k=2,
        spec_rounds=2,
        async_fan_out=2,
        dtype="float32",
        max_model_len=160,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        # Draft lookahead 2*(2+1) + (3 + 2*6) = 21 slots (2 blocks) per
        # scheduled seq on top of the trunk; 24 blocks cannot hold 3 seqs.
        num_kvcache_blocks=24,
        max_num_seqs=3,
    )
    prompts = [random_prompt(rng(600 + i), 16, 24) for i in range(3)]
    wants = [hf_greedy(target_dir, p, 40) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
