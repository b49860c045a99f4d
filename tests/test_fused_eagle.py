"""Fused EAGLE superstep (Config.use_eagle + spec_rounds > 1, draft_async
off): R rounds of [EAGLE-conditioned chain -> verify-with-taps -> accept]
as ONE XLA program (fused_sd.eagle_sd_superstep), the conditioning taps in
the scan carry.

The exactness contract is the gate: EAGLE drafts are approximate by
construction, so greedy outputs must equal HF / AR token-for-token through
the conditioned prefill, the in-scan chain (-1 EAGLE position shift), and
the carry handoff across supersteps — regardless of draft quality.
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
    d = tmp_path_factory.mktemp("feagle_target")
    make_tiny_llama(d, layers=6, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def eagle_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feagle_draft")
    make_tiny_eagle(d, seed=3)
    return str(d)


def fused_eagle_engine(target_dir, draft_dir, k=2, rounds=3, **kw):
    kw.setdefault("num_kvcache_blocks", 96)
    kw.setdefault("max_num_seqs", 4)
    kw.setdefault("max_model_len", 256)
    return LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        use_eagle=True,
        speculate_k=k,
        spec_rounds=rounds,
        eagle_layers=[0, 2, 4],
        dtype="float32",
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        **kw,
    )


def test_fused_eagle_greedy_token_exact(target_dir, eagle_dir):
    engine = fused_eagle_engine(target_dir, eagle_dir)
    prompts = [random_prompt(rng(50), 8, 24) for _ in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    assert metrics["accepted_suffix_lens_with_recovery"], "spec path not run"


def test_fused_eagle_matches_unfused_async_eagle(target_dir, eagle_dir):
    """Same target+draft pair through the async EAGLE path and the fused
    superstep: greedy outputs must agree token-for-token (both equal AR)."""
    prompt = random_prompt(rng(51), 8, 20)
    sp = SamplingParams(temperature=0.0, max_new_tokens=28, ignore_eos=True)
    fused = fused_eagle_engine(target_dir, eagle_dir, k=2, rounds=4)
    f_outs, _ = fused.generate([list(prompt)], sp, use_tqdm=False)
    unfused = LLM(
        target_dir, draft=eagle_dir, speculate=True, draft_async=True,
        use_eagle=True, jit_speculate=True, speculate_k=2, async_fan_out=3,
        eagle_layers=[0, 2, 4], dtype="float32", max_model_len=256,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=96, max_num_seqs=4,
    )
    u_outs, _ = unfused.generate([list(prompt)], sp, use_tqdm=False)
    unfused.exit()
    assert f_outs[0]["token_ids"] == u_outs[0]["token_ids"]


def test_fused_eagle_mixed_lengths_and_eos(target_dir, eagle_dir):
    """Mixed max_new_tokens across a batch: truncation mid-superstep must
    commit exactly the requested counts, with the carry staying correct for
    the surviving sequence."""
    engine = fused_eagle_engine(target_dir, eagle_dir, k=2, rounds=2)
    prompts = [random_prompt(rng(60 + i), 8, 16) for i in range(2)]
    lens = [11, 29]
    wants = [hf_greedy(target_dir, p, n) for p, n in zip(prompts, lens)]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        [SamplingParams(temperature=0.0, max_new_tokens=n, ignore_eos=True)
         for n in lens],
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_fused_eagle_preemption_pressure(target_dir, eagle_dir):
    """KV pressure forces preemption mid-generation; the conditioned prefill
    must re-seed the taps carry and outputs stay exact."""
    engine = fused_eagle_engine(
        target_dir, eagle_dir, k=2, rounds=2,
        num_kvcache_blocks=30, max_num_seqs=2, max_model_len=160,
    )
    prompts = [random_prompt(rng(70 + i), 16, 24) for i in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_fused_eagle_sampled_statistics(target_dir, eagle_dir):
    """temp > 0: rejection sampling must keep the target distribution —
    the first sampled token's support must match an AR engine's."""
    prompt = [5, 9, 13, 21, 34, 2, 44, 61]
    sp = SamplingParams(temperature=1.0, max_new_tokens=1, ignore_eos=True)
    eng_e = fused_eagle_engine(target_dir, eagle_dir, k=2, rounds=2)
    eng_a = LLM(target_dir, dtype="float32", max_model_len=256,
                max_num_batched_tokens=1024, kvcache_block_size=16,
                num_kvcache_blocks=64, max_num_seqs=4)
    counts_a, counts_e = {}, {}
    for s in range(50):
        eng_a.model_runner._seed_state = 10_000 + s
        eng_e.model_runner._seed_state = 20_000 + s
        a, _ = eng_a.generate([list(prompt)], sp, use_tqdm=False)
        e, _ = eng_e.generate([list(prompt)], sp, use_tqdm=False)
        counts_a[a[0]["token_ids"][0]] = counts_a.get(a[0]["token_ids"][0], 0) + 1
        counts_e[e[0]["token_ids"][0]] = counts_e.get(e[0]["token_ids"][0], 0) + 1
    top_a = max(counts_a, key=counts_a.get)
    assert counts_e.get(top_a, 0) > 0
    for tok, c in counts_e.items():
        if c >= 10:
            assert counts_a.get(tok, 0) > 0, (
                f"fused EAGLE over-produces {tok}: e={counts_e}, a={counts_a}")
