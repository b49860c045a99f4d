"""Continuous batching with staggered arrivals via the step() API: a request
added mid-decode must prefill while others keep decoding (and, in async SSD,
join the speculation handshake) without disturbing exactness."""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cb_target")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cb_draft")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, heads=4, kv_heads=2, seed=7)
    return str(d)


def run_staggered(engine, prompts, late_idx, out_len):
    sp = SamplingParams(temperature=0.0, max_new_tokens=out_len, ignore_eos=True)
    for i, p in enumerate(prompts):
        if i != late_idx:
            engine.add_request(list(p), sp)
    outputs = {}
    steps = 0
    late_added = False
    while not engine.is_finished() or not late_added:
        if steps == 3 and not late_added:
            engine.add_request(list(prompts[late_idx]), sp)
            late_added = True
        for seq_id, token_ids in engine.step():
            outputs[seq_id] = token_ids
        steps += 1
        assert steps < 500
    return [outputs[k] for k in sorted(outputs)]


def test_ar_staggered_arrival_token_exact(target_dir):
    engine = LLM(
        target_dir, dtype="float32", max_model_len=256,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=64, max_num_seqs=4,
    )
    prompts = [random_prompt(rng(600 + i), 8, 20) for i in range(3)]
    wants = [hf_greedy(target_dir, p, 24) for p in prompts]
    outs = run_staggered(engine, prompts, late_idx=2, out_len=24)
    assert outs == wants


def test_async_ssd_staggered_arrival_token_exact(target_dir, draft_dir):
    engine = LLM(
        target_dir, draft=draft_dir, speculate=True, draft_async=True,
        speculate_k=2, async_fan_out=2, dtype="float32", max_model_len=256,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=96, max_num_seqs=4,
    )
    prompts = [random_prompt(rng(700 + i), 8, 20) for i in range(3)]
    wants = [hf_greedy(target_dir, p, 24) for p in prompts]
    outs = run_staggered(engine, prompts, late_idx=2, out_len=24)
    engine.exit()
    assert outs == wants
