"""Fused async SSD (Config.async_fused): the one-dispatch exchange and the
R-round async superstep (engine/async_fused.py — VERDICT r4 item 1).

Exactness gates:
 - greedy outputs token-exact vs HF (the AR oracle) in BOTH fused forms,
   matching the unfused async flagship's contract;
 - the exchange form converges to cache hits with draft == target;
 - transfer discipline: <= 2 uploads per fused exchange (payload + cache
   gather index), <= 1 per superstep.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("afused_target_llama")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("afused_draft_llama")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, heads=4,
                    kv_heads=2, seed=7)
    return str(d)


def fused_engine(target_dir, draft_dir, k=3, f=2, rounds=1, **kw):
    return LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        draft_async=True,
        async_fused=True,
        spec_rounds=rounds,
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


# --- level 1: the fused exchange (spec_rounds = 1) ---


def test_exchange_greedy_token_exact(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=3, f=2)
    prompts = [random_prompt(rng(40), 8, 24) for _ in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    assert metrics["cache_hits"], "fused exchange not exercised"


def test_exchange_jit_speculate_greedy_token_exact(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=3, f=2, jit_speculate=True)
    prompt = random_prompt(rng(41), 8, 24)
    want = hf_greedy(target_dir, prompt, 32)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_exchange_self_draft_hits_and_accepts(target_dir):
    """draft == target at temp 0: after the first (cold-cache) step the
    fused exchange's tree must hit and accept at full depth — the same
    convergence contract as the unfused flagship."""
    engine = fused_engine(target_dir, target_dir, k=3, f=2)
    prompt = random_prompt(rng(42), 8, 16)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=48, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == hf_greedy(target_dir, prompt, 48)
    hits = metrics["cache_hits"]
    assert sum(hits[1:]) == len(hits) - 1, f"expected all hits: {hits}"
    on_hit = metrics["accepted_suffix_lens_on_hit"]
    assert on_hit and all(n == 4 for n in on_hit), on_hit


def test_exchange_matches_unfused_async(target_dir, draft_dir):
    """The fused exchange must produce the same greedy tokens as the unfused
    DraftServer path (same glue/fork/tree/verify math, one dispatch)."""
    prompt = random_prompt(rng(43), 8, 20)
    sp = SamplingParams(temperature=0.0, max_new_tokens=28, ignore_eos=True)
    ref = LLM(target_dir, draft=draft_dir, speculate=True, draft_async=True,
              speculate_k=2, async_fan_out=2, dtype="float32",
              max_model_len=256, max_num_batched_tokens=1024,
              kvcache_block_size=16, num_kvcache_blocks=96, max_num_seqs=4)
    ref_out, _ = ref.generate([list(prompt)], sp, use_tqdm=False)
    ref.exit()
    eng = fused_engine(target_dir, draft_dir, k=2, f=2)
    out, _ = eng.generate([list(prompt)], sp, use_tqdm=False)
    assert out[0]["token_ids"] == ref_out[0]["token_ids"]


def test_exchange_sampled_runs(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=2, f=2)
    prompt = random_prompt(rng(44), 8, 16)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.8, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 24
    assert all(0 <= t < 128 for t in outs[0]["token_ids"])
    assert metrics["cache_hits"]


def test_exchange_mixed_lengths_finish_midstream(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=2, f=2)
    prompts = [random_prompt(rng(810 + i), 8, 16) for i in range(3)]
    lens = [8, 20, 32]
    wants = [hf_greedy(target_dir, p, n) for p, n in zip(prompts, lens)]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        [SamplingParams(temperature=0.0, max_new_tokens=n, ignore_eos=True)
         for n in lens],
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_exchange_warmup_then_exact(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=2, f=2)
    engine.warmup()
    assert engine.draft_runner.tree_cache_keys.shape[0] == 0
    prompt = random_prompt(rng(811), 8, 16)
    want = hf_greedy(target_dir, prompt, 16)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


# --- level 2: the fused async superstep (spec_rounds > 1) ---


def test_superstep_greedy_token_exact(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=3, f=2, rounds=4)
    prompts = [random_prompt(rng(50), 8, 24) for _ in range(2)]
    wants = [hf_greedy(target_dir, p, 32) for p in prompts]
    outs, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
    assert metrics["cache_hits"], "in-program service not exercised"
    assert metrics["sd_superstep_times"], "superstep path not exercised"


def test_superstep_self_draft_hits(target_dir):
    """draft == target: the in-program tree service must hit on every round
    after the chain-primed first (the fork at the deepest glue depth always
    contains the target argmax)."""
    engine = fused_engine(target_dir, target_dir, k=3, f=2, rounds=4)
    prompt = random_prompt(rng(51), 8, 16)
    outs, metrics = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=48, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == hf_greedy(target_dir, prompt, 48)
    # Per-round mean-hit samples: all 1.0 (the prime counts as a hit).
    assert metrics["cache_hits"] and all(
        h == 1.0 for h in metrics["cache_hits"]), metrics["cache_hits"]
    on_hit = metrics["accepted_suffix_lens_on_hit"]
    assert on_hit and np.mean(on_hit) > 3.5, on_hit


def test_superstep_batched_sampled_runs(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=2, f=2, rounds=3)
    prompts = [random_prompt(rng(52 + i), 6, 20) for i in range(3)]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.7, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    for out in outs:
        assert len(out["token_ids"]) == 24
        assert all(0 <= t < 128 for t in out["token_ids"])


def test_superstep_mixed_lengths(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=2, f=2, rounds=3)
    prompts = [random_prompt(rng(820 + i), 8, 16) for i in range(3)]
    lens = [8, 20, 32]
    wants = [hf_greedy(target_dir, p, n) for p, n in zip(prompts, lens)]
    outs, _ = engine.generate(
        [list(p) for p in prompts],
        [SamplingParams(temperature=0.0, max_new_tokens=n, ignore_eos=True)
         for n in lens],
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_superstep_warmup_then_exact(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=2, f=2, rounds=3)
    engine.warmup()
    prompt = random_prompt(rng(821), 8, 16)
    want = hf_greedy(target_dir, prompt, 24)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_superstep_top_sampling_runs(target_dir, draft_dir):
    engine = fused_engine(target_dir, draft_dir, k=2, f=2, rounds=3,
                          enable_top_sampling=True)
    prompt = random_prompt(rng(53), 8, 16)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.8, top_p=0.9, top_k=20,
                       max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 16


# --- transfer discipline ---


def _count_uploads(monkeypatch, fn):
    uploads = []
    real_asarray, real_put = jnp.asarray, jax.device_put

    def counting_asarray(x, *a, **k):
        if isinstance(x, (np.ndarray, list, int, float)):
            uploads.append(("asarray", np.asarray(x).size
                            if not isinstance(x, (int, float)) else 1))
        return real_asarray(x, *a, **k)

    def counting_put(x, *a, **k):
        uploads.append(("device_put", None))
        return real_put(x, *a, **k)

    monkeypatch.setattr(jnp, "asarray", counting_asarray)
    monkeypatch.setattr(jax, "device_put", counting_put)
    fn()
    monkeypatch.undo()
    return uploads


def test_exchange_is_two_uploads(tmp_path, monkeypatch):
    """One fused exchange = 1 cache-gather index upload + 1 packed payload
    upload (VERDICT r4 item 1 'transfer test pins <=2 uploads/exchange')."""
    t = str(tmp_path / "t")
    d = str(tmp_path / "d")
    make_tiny_llama(t, seed=0)
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, seed=7)
    eng = LLM(t, draft=d, speculate=True, draft_async=True, async_fused=True,
              speculate_k=2, async_fan_out=2, dtype="float32",
              max_model_len=128, max_num_batched_tokens=512,
              kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=2,
              ctx_bucket_policy="single")
    eng.add_request([1, 5, 9, 2], SamplingParams(
        temperature=0.0, max_new_tokens=24, ignore_eos=True))
    step = eng.create_inference_step(eng.config)
    eng.step(step)  # prefill (not counted)
    eng.step(step)  # miss step: compiles chain + fused exchange
    eng.step(step)  # hit step: compiles the cache gather

    uploads = _count_uploads(monkeypatch, lambda: eng.step(step))
    assert len(uploads) <= 2, (
        f"fused exchange made {len(uploads)} uploads: {uploads}")


def test_superstep_is_one_upload(tmp_path, monkeypatch):
    """One fused async superstep (R rounds) = ONE packed payload upload."""
    t = str(tmp_path / "t")
    d = str(tmp_path / "d")
    make_tiny_llama(t, seed=0)
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, seed=7)
    eng = LLM(t, draft=d, speculate=True, draft_async=True, async_fused=True,
              speculate_k=2, spec_rounds=3, async_fan_out=2, dtype="float32",
              max_model_len=128, max_num_batched_tokens=512,
              kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=2,
              ctx_bucket_policy="single")
    eng.add_request([1, 5, 9, 2], SamplingParams(
        temperature=0.0, max_new_tokens=24, ignore_eos=True))
    step = eng.create_inference_step(eng.config)
    eng.step(step)  # prefill (not counted)
    eng.step(step)  # first superstep compiles

    uploads = _count_uploads(monkeypatch, lambda: eng.step(step))
    assert len(uploads) <= 1, (
        f"fused async superstep made {len(uploads)} uploads: {uploads}")
