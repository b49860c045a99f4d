"""End-to-end autoregressive decoding: token-exact vs HF transformers
(BASELINE.md correctness gate 1, CPU-runnable config #1)."""

import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama")
    make_tiny_llama(d)
    return str(d)


@pytest.fixture(scope="module")
def engine(llama_dir):
    return LLM(
        llama_dir,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_seqs=4,
    )


def test_ar_greedy_matches_hf_single(engine, llama_dir):
    prompt = random_prompt(rng(1), 10, 20)
    want = hf_greedy(llama_dir, prompt, 32)
    outs, _ = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_ar_greedy_matches_hf_batch(engine, llama_dir):
    r = rng(2)
    prompts = [random_prompt(r, 5, 30) for _ in range(3)]
    wants = [hf_greedy(llama_dir, p, 24) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_ar_block_boundary_crossing(engine, llama_dir):
    """Prompt + completion crossing several 16-token KV blocks."""
    prompt = random_prompt(rng(3), 14, 15)  # 14 tokens: completion crosses blocks
    want = hf_greedy(llama_dir, prompt, 40)
    outs, _ = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_prefix_cache_reuse_is_exact(engine, llama_dir):
    """Second generation sharing a >=1-block prefix must produce identical
    tokens while hitting the prefix cache."""
    base = random_prompt(rng(4), 40, 41)
    p1 = base + [7, 8]
    p2 = base + [9, 10]
    w1 = hf_greedy(llama_dir, p1, 16)
    w2 = hf_greedy(llama_dir, p2, 16)
    o1, _ = engine.generate(
        [p1], SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    o2, _ = engine.generate(
        [p2], SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert o1[0]["token_ids"] == w1
    assert o2[0]["token_ids"] == w2


def test_eos_stops_generation(engine, llama_dir):
    # Find a prompt whose greedy continuation includes eos=2 within 64 steps,
    # then check the engine stops there when ignore_eos=False.
    r = rng(5)
    for _ in range(20):
        prompt = random_prompt(r, 8, 30)
        want = hf_greedy(llama_dir, prompt, 64)
        if 2 in want:
            cut = want[: want.index(2) + 1]
            outs, _ = engine.generate(
                [prompt],
                SamplingParams(temperature=0.0, max_new_tokens=64, ignore_eos=False),
                use_tqdm=False,
            )
            assert outs[0]["token_ids"] == cut
            return
    pytest.skip("no greedy continuation hit eos in 20 prompts")


def test_temperature_sampling_runs(engine):
    outs, _ = engine.generate(
        [random_prompt(rng(6), 8, 16)],
        SamplingParams(temperature=0.8, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 16
