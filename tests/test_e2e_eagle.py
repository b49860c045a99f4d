"""EAGLE-3 async speculative decoding end-to-end.

EAGLE drafts are approximate by construction, so the gate is the exactness
contract: greedy outputs must be token-exact vs HF regardless of draft
quality, through the conditioned prefill / jit chain / packed glue / tree
paths. Cache-hit steps must also stay exact.
"""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import (
    hf_greedy,
    make_tiny_eagle,
    make_tiny_llama,
    random_prompt,
    rng,
)


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("eagle_target_llama")
    make_tiny_llama(d, layers=6, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def eagle_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("eagle_draft")
    make_tiny_eagle(d, seed=3)
    return str(d)


@pytest.fixture(scope="module")
def eagle_subvocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("eagle_draft_subvocab")
    make_tiny_eagle(d, draft_vocab=64, seed=5)
    return str(d)


@pytest.fixture(scope="module")
def eagle_noembed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("eagle_draft_noembed")
    make_tiny_eagle(d, with_embed=False, seed=9)
    return str(d)


def eagle_engine(target_dir, draft_dir, k=2, f=3, **kw):
    return LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        draft_async=True,
        use_eagle=True,
        jit_speculate=True,
        speculate_k=k,
        async_fan_out=f,
        eagle_layers=[0, 2, 4],
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=4,
        **kw,
    )


def test_eagle_greedy_token_exact(target_dir, eagle_dir):
    engine = eagle_engine(target_dir, eagle_dir)
    prompts = [random_prompt(rng(40), 8, 24) for _ in range(2)]
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


def test_eagle_subvocab_greedy_token_exact(target_dir, eagle_subvocab_dir):
    """Draft LM head covers only 64 of 128 tokens; d2t expansion must keep
    greedy output exact (unproposable tokens are just never accepted)."""
    engine = eagle_engine(target_dir, eagle_subvocab_dir)
    prompt = random_prompt(rng(41), 8, 24)
    want = hf_greedy(target_dir, prompt, 32)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert outs[0]["token_ids"] == want


def test_eagle_borrowed_embeddings_token_exact(target_dir, eagle_noembed_dir):
    """EAGLE checkpoint without embed_tokens borrows the target's
    (loader.py:12-61 parity)."""
    engine = eagle_engine(target_dir, eagle_noembed_dir)
    prompt = random_prompt(rng(42), 8, 20)
    want = hf_greedy(target_dir, prompt, 24)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert outs[0]["token_ids"] == want


def test_eagle_batched_and_hits(target_dir, eagle_dir):
    """Batched EAGLE stays exact; with a wide fan-out over a small vocab some
    steps should hit the speculation tree cache."""
    engine = eagle_engine(target_dir, eagle_dir, k=2, f=8)
    prompts = [random_prompt(rng(200 + i), 6, 16) for i in range(3)]
    wants = [hf_greedy(target_dir, p, 40) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    assert metrics["cache_hits"], "async handshake not exercised"


def test_eagle_preemption_under_pressure_token_exact(target_dir, eagle_dir):
    """KV pressure in EAGLE mode: preemption must clear the extend/conditioning
    carries (scheduler.preempt) and re-prefill conditioned state exactly."""
    engine = LLM(
        target_dir,
        draft=eagle_dir,
        speculate=True,
        draft_async=True,
        use_eagle=True,
        jit_speculate=True,
        speculate_k=2,
        async_fan_out=2,
        eagle_layers=[0, 2, 4],
        dtype="float32",
        max_model_len=160,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=22,  # tight: 2 seqs + megaspec lookahead can't fit
        max_num_seqs=2,
    )
    prompts = [random_prompt(rng(950 + i), 16, 24) for i in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_eagle_mixed_lengths_token_exact(target_dir, eagle_dir):
    engine = eagle_engine(target_dir, eagle_dir)
    prompts = [random_prompt(rng(960 + i), 8, 16) for i in range(2)]
    lens = [12, 28]
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
