"""Kitchen-sink integration: every beyond-reference feature enabled at once
(chunked prefill + int8 weights + int8 KV cache + top-sampling warp + fused
multi-round SD with the dynamic round ladder) must still satisfy the
mode-exactness contract."""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    t = tmp_path_factory.mktemp("matrix_t")
    d = tmp_path_factory.mktemp("matrix_d")
    make_tiny_llama(t, seed=0)
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, seed=7)
    return str(t), str(d)


def _engine(target, **kw):
    return LLM(
        target,
        quantization="int8",
        enable_top_sampling=True,
        chunked_prefill=True,
        max_num_batched_tokens=32,
        dtype="float32",
        max_model_len=256,
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=4,
        **kw,
    )


def test_all_features_fused_sd_matches_ar(dirs):
    """A 90-token prompt (chunked against the 32-token budget) through an
    int8 + warp engine: fused SD with temp=1 + top_k=1 must match the same
    engine's AR greedy token-for-token."""
    target, draft = dirs
    prompt = random_prompt(rng(91), 90, 91)
    sp_greedy = SamplingParams(temperature=0.0, max_new_tokens=16,
                               ignore_eos=True)
    sp_warp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=16,
                             ignore_eos=True)

    ar = _engine(target)
    want, _ = ar.generate([list(prompt)], sp_greedy, use_tqdm=False)

    sd = _engine(target, draft=draft, speculate=True, speculate_k=2,
                 spec_rounds=2)
    got, metrics = sd.generate([list(prompt)], sp_warp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_all_features_fused_eagle(dirs, tmp_path_factory):
    """The round-4 composition: fused EAGLE superstep (use_eagle +
    spec_rounds) stacked with int8 weights (target AND eagle draft), int8 KV,
    the top-sampling warp, and chunked prefill — outputs must equal the same
    engine stack's AR greedy."""
    from tests.utils_models import make_tiny_eagle

    target, _ = dirs
    t6 = tmp_path_factory.mktemp("matrix_t6")
    make_tiny_llama(t6, layers=6, seed=0)
    e = tmp_path_factory.mktemp("matrix_e")
    make_tiny_eagle(e, seed=3)
    prompt = random_prompt(rng(95), 90, 91)
    sp_greedy = SamplingParams(temperature=0.0, max_new_tokens=16,
                               ignore_eos=True)
    sp_warp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=16,
                             ignore_eos=True)

    ar = _engine(str(t6), kv_quant="int8")
    want, _ = ar.generate([list(prompt)], sp_greedy, use_tqdm=False)

    fe = _engine(str(t6), draft=str(e), speculate=True, use_eagle=True,
                 speculate_k=2, spec_rounds=2, eagle_layers=[0, 2, 4],
                 kv_quant="int8")
    got, metrics = fe.generate([list(prompt)], sp_warp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_all_features_ngram(dirs):
    """ngram speculation stacked with int8 weights + int8 KV + warp +
    chunked prefill: token-exact vs the same stack's AR."""
    target, _ = dirs
    prompt = random_prompt(rng(96), 90, 91)
    sp_greedy = SamplingParams(temperature=0.0, max_new_tokens=16,
                               ignore_eos=True)
    sp_warp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=16,
                             ignore_eos=True)

    ar = _engine(target, kv_quant="int8")
    want, _ = ar.generate([list(prompt)], sp_greedy, use_tqdm=False)

    ng = _engine(target, ngram_speculate=True, speculate_k=2, spec_rounds=2,
                 ngram_n=2, kv_quant="int8")
    got, metrics = ng.generate([list(prompt)], sp_warp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_all_features_plus_int8_kv(dirs):
    """The full stack PLUS the int8 KV cache (quantized weights AND cache,
    chunked prompt, warp compiled in, dynamic fused-SD rounds): AR and fused
    SD stay mutually token-exact — quantization is deterministic, so the
    cross-mode contract survives even though HF-exactness does not."""
    target, draft = dirs
    prompt = random_prompt(rng(93), 90, 91)
    sp_greedy = SamplingParams(temperature=0.0, max_new_tokens=16,
                               ignore_eos=True)
    sp_warp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=16,
                             ignore_eos=True)

    ar = _engine(target, kv_quant="int8")
    want, _ = ar.generate([list(prompt)], sp_greedy, use_tqdm=False)

    sd = _engine(target, draft=draft, speculate=True, speculate_k=2,
                 spec_rounds=8, kv_quant="int8")
    got, metrics = sd.generate([list(prompt)], sp_warp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_all_features_fused_async(dirs):
    """The round-5 composition: the fused async superstep (draft_async +
    async_fused + spec_rounds) stacked with int8 weights, the top-sampling
    warp, and chunked prefill — outputs must equal the same engine stack's
    AR greedy."""
    target, draft = dirs
    prompt = random_prompt(rng(97), 90, 91)
    sp_greedy = SamplingParams(temperature=0.0, max_new_tokens=16,
                               ignore_eos=True)
    sp_warp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=16,
                             ignore_eos=True)

    ar = _engine(target)
    want, _ = ar.generate([list(prompt)], sp_greedy, use_tqdm=False)

    fa = _engine(target, draft=draft, speculate=True, draft_async=True,
                 async_fused=True, speculate_k=2, spec_rounds=2,
                 async_fan_out=2)
    got, metrics = fa.generate([list(prompt)], sp_warp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]
    assert metrics["cache_hits"]
