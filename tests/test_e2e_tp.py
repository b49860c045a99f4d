"""Tensor-parallel engine end-to-end on the 8-device virtual CPU mesh.

Covers what the dryrun compile-check cannot: the full engine loop (paged KV,
continuous batching, spec handshake) with tp-sharded parameters, and the
flagship topology — target TP over devices [0, tp) with the async draft
pinned to the last device — staying greedy token-exact vs HF."""

import numpy as np
import pytest

import jax

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tp_target_llama")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tp_draft_llama")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, heads=4, kv_heads=2, seed=7)
    return str(d)


def test_ar_tp4_greedy_token_exact(target_dir):
    assert len(jax.devices()) >= 4
    engine = LLM(
        target_dir,
        num_devices=4,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_seqs=2,
    )
    prompts = [random_prompt(rng(80 + i), 8, 20) for i in range(2)]
    wants = [hf_greedy(target_dir, p, 24) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_async_ssd_tp_target_dedicated_draft(target_dir, draft_dir):
    """Flagship topology: 4-way TP target + async draft on its own device
    (reference llm_engine.py:62's num_tp = num_gpus - 1 split)."""
    assert len(jax.devices()) >= 8
    engine = LLM(
        target_dir,
        num_devices=5,  # tp_size=4, draft takes jax.devices()[-1]
        draft=draft_dir,
        speculate=True,
        draft_async=True,
        speculate_k=3,
        async_fan_out=2,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=2,
    )
    assert engine.config.tp_size == 4
    assert engine.model_runner.mesh is not None
    prompt = random_prompt(rng(90), 8, 20)
    want = hf_greedy(target_dir, prompt, 32)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert outs[0]["token_ids"] == want
    assert metrics["cache_hits"], "async handshake not exercised"
