"""Chunked prefill (Config.chunked_prefill, beyond reference): prompts longer
than max_num_batched_tokens prefill in budget-sized dispatches with decode
steps interleaved, and greedy outputs stay token-exact vs HF."""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunked_m")
    make_tiny_llama(d, seed=3)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunked_d")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, seed=9)
    return str(d)


def _engine(model_dir, budget=32, **kw):
    return LLM(
        model_dir,
        chunked_prefill=True,
        max_num_batched_tokens=budget,
        max_model_len=256,
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=4,
        **kw,
    )


def test_long_prompt_chunks_and_matches_hf(model_dir, monkeypatch):
    """A 100-token prompt against a 32-token dispatch budget must take
    multiple chunk dispatches and still match HF token-for-token."""
    from ssd_tpu.engine import llm_engine as le

    chunks = []
    orig = le.LLMEngine._run_prefill_chunk

    def spy(self, seq):
        chunks.append(seq.prefill_chunk)
        return orig(self, seq)

    monkeypatch.setattr(le.LLMEngine, "_run_prefill_chunk", spy)

    eng = _engine(model_dir)
    prompt = random_prompt(rng(42), 100, 101)
    want = hf_greedy(model_dir, prompt, 16)
    outs, _ = eng.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want
    # 100 tokens / 32 budget: at least two 32-token chunks before the final
    # normal-path admission of the remainder.
    assert len(chunks) >= 2 and all(c == 32 for c in chunks), chunks


def test_mixed_long_and_short_prompts(model_dir):
    eng = _engine(model_dir)
    prompts = [
        random_prompt(rng(1), 90, 91),
        random_prompt(rng(2), 8, 12),
        random_prompt(rng(3), 40, 45),
    ]
    wants = [hf_greedy(model_dir, p, 12) for p in prompts]
    outs, _ = eng.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_chunked_prefill_with_sync_sd(model_dir, draft_dir):
    """Chunked target prefill composes with sync speculative decoding (the
    draft prefills the whole prompt in one dispatch at final admission)."""
    eng = _engine(model_dir, draft=draft_dir, speculate=True, speculate_k=2)
    prompt = random_prompt(rng(7), 80, 81)
    want = hf_greedy(model_dir, prompt, 16)
    outs, metrics = eng.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want
    assert metrics["accepted_suffix_lens_with_recovery"], "spec path unused"


def test_mid_chunk_request_never_hits_unpublished_blocks(model_dir):
    """Deferred hash publication: a request sharing the long prompt's prefix
    that arrives while the long prompt is mid-chunk must not prefix-hit
    blocks whose KV is not written yet — and must still be exact."""
    eng = _engine(model_dir)
    step = eng.create_inference_step(eng.config)
    prompt = random_prompt(rng(11), 100, 101)
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)

    eng.add_request(list(prompt), sp)
    eng.step(step)  # chunk 1 of the long prompt (32 of 100 tokens)
    # Same full prompt arrives mid-chunk: its allocate() must MISS on every
    # block (nothing published yet) and produce its own exact prefill.
    eng.add_request(list(prompt), sp)
    outs = {}
    for _ in range(200):
        for sid, toks in eng.step(step):
            outs[sid] = toks
        if len(outs) == 2:
            break
    want = hf_greedy(model_dir, prompt, 8)
    assert list(outs.values()) == [want, want]


def test_published_after_completion_enables_prefix_hits(model_dir):
    """After a chunked prompt finishes, its blocks ARE published: a later
    request with the same prompt prefix-hits and stays exact."""
    eng = _engine(model_dir)
    prompt = random_prompt(rng(13), 100, 101)
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    want = hf_greedy(model_dir, prompt, 8)

    outs, _ = eng.generate([list(prompt)], sp, use_tqdm=False)
    assert outs[0]["token_ids"] == want

    # The long prompt's full blocks are published now: the rerun prefix-hits
    # (its prefill admits in ONE dispatch, under budget) and stays exact.
    from ssd_tpu.engine import llm_engine as le

    outs2, _ = eng.generate([list(prompt)], sp, use_tqdm=False)
    assert outs2[0]["token_ids"] == want


def test_chunked_prefill_with_async_ssd(model_dir, draft_dir):
    """Chunked target prefill composes with async SSD: mid-prompt chunks are
    target-only; the draft server prefills the full prompt once at final
    admission, before the first speculation request."""
    eng = _engine(model_dir, draft=draft_dir, speculate=True, speculate_k=2,
                  draft_async=True, async_fan_out=2)
    prompt = random_prompt(rng(21), 80, 81)
    want = hf_greedy(model_dir, prompt, 16)
    outs, metrics = eng.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want
    assert metrics["cache_hits"], "async spec path unused"


def test_chunked_prefill_with_eagle(model_dir, tmp_path_factory, monkeypatch):
    """Chunked prefill + EAGLE (carve-out lifted): the partial chunks only
    write KV forward; the final admission prefill recomputes the whole
    prompt with activation taps, so the draft's conditioning sees every
    prompt token. Output must match the unchunked EAGLE engine
    token-for-token."""
    from ssd_tpu.engine import llm_engine as le
    from tests.utils_models import make_tiny_eagle

    eagle_dir = str(tmp_path_factory.mktemp("chunked_eagle"))
    make_tiny_eagle(eagle_dir, seed=7)
    kw = dict(draft=eagle_dir, speculate=True, use_eagle=True,
              draft_async=True, jit_speculate=True, speculate_k=2,
              async_fan_out=2, eagle_layers=[0, 1, 1], seed=0)
    prompt = random_prompt(rng(61), 100, 101)
    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)

    eng_ref = LLM(model_dir, chunked_prefill=False,
                  max_num_batched_tokens=256, max_model_len=256,
                  dtype="float32", kvcache_block_size=16,
                  num_kvcache_blocks=96, max_num_seqs=4, **kw)
    want, _ = eng_ref.generate([list(prompt)], sp, use_tqdm=False)
    eng_ref.exit()

    chunks = []
    orig = le.LLMEngine._run_prefill_chunk

    def spy(self, seq):
        chunks.append(seq.prefill_chunk)
        return orig(self, seq)

    monkeypatch.setattr(le.LLMEngine, "_run_prefill_chunk", spy)
    eng = _engine(model_dir, **kw)
    outs, _ = eng.generate([list(prompt)], sp, use_tqdm=False)
    eng.exit()
    assert chunks and all(c == 32 for c in chunks), chunks
    assert outs[0]["token_ids"] == want[0]["token_ids"]


def test_decode_interleaves_between_chunks(model_dir):
    """While a long prompt chunk-prefills, already-running sequences keep
    decoding: the scheduler alternates chunk and decode dispatches."""
    eng = _engine(model_dir)
    step = eng.create_inference_step(eng.config)
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)

    short = random_prompt(rng(51), 8, 12)
    eng.add_request(list(short), sp)
    eng.step(step)  # prefill the short prompt -> running
    long = random_prompt(rng(52), 100, 101)
    eng.add_request(list(long), sp)

    kinds = []
    for _ in range(6):
        seqs, is_prefill = eng.scheduler.schedule()
        kind = ("chunk" if is_prefill and seqs and seqs[0].prefill_chunk
                else ("prefill" if is_prefill else "decode"))
        kinds.append(kind)
        if is_prefill and seqs and seqs[0].prefill_chunk is not None:
            eng._run_prefill_chunk(seqs[0])
        elif is_prefill:
            step.prefill(seqs)
            eng._publish_deferred_hashes(seqs)
        else:
            step.decode(seqs)
    # 100 tokens / 32 budget: chunk, decode, chunk, decode, chunk, then the
    # small final remainder admits immediately as a normal prefill (it is
    # within budget, so it no longer defers to decode).
    assert kinds == ["chunk", "decode", "chunk", "decode", "chunk", "prefill"], kinds

    # And the outputs still match HF exactly for both requests.
    outs = {}
    for _ in range(200):
        for sid, toks in eng.step(step):
            outs[sid] = toks
        if len(outs) == 2:
            break
    assert list(outs.values()) == [hf_greedy(model_dir, short, 16),
                                   hf_greedy(model_dir, long, 16)]


def test_finish_at_prefill_with_chunked_prompt(model_dir):
    """A chunked prompt whose request wants a single token must finish at its
    final prefill step without crashing the deferred-hash publication."""
    eng = _engine(model_dir)
    prompt = random_prompt(rng(53), 100, 101)
    want = hf_greedy(model_dir, prompt, 1)
    outs, _ = eng.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=1, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_chunk_boundary_block_chain_not_poisoned(model_dir):
    """The block completed by the FIRST SAMPLED TOKEN of a chunked prompt
    must chain onto published prompt hashes (reproduces the review finding:
    publishing after postprocess hashed it against a -1 prefix, and a later
    same-prefix request silently produced wrong output)."""
    eng = _engine(model_dir)
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    # 95-token prompt, block 16: appending the first sampled token completes
    # block 5 (96 tokens) during prefill postprocess.
    prompt = random_prompt(rng(54), 95, 96)
    outs, _ = eng.generate([list(prompt)], sp, use_tqdm=False)
    assert outs[0]["token_ids"] == hf_greedy(model_dir, prompt, 8)

    # A prompt that BEGINS with the long prompt's first block must still be
    # exact (a poisoned hash(ids, -1) entry would make it prefix-hit KV
    # written for positions 80..95).
    probe = list(prompt[:16]) + list(random_prompt(rng(55), 8, 12))
    outs2, _ = eng.generate([probe], sp, use_tqdm=False)
    assert outs2[0]["token_ids"] == hf_greedy(model_dir, probe, 8)


def test_chunked_reprefill_after_preemption_token_exact(model_dir):
    """Under KV pressure a preempted sequence re-prefills with its
    completions absorbed into the prompt; when that reprefill exceeds the
    dispatch budget it must go through the CHUNKED path and stay exact."""
    eng = LLM(
        model_dir,
        chunked_prefill=True,
        max_num_batched_tokens=32,
        max_model_len=256,
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=14,  # force preemption mid-flight
        max_num_seqs=4,
    )
    prompts = [random_prompt(rng(71 + i), 16, 24) for i in range(4)]
    wants = [hf_greedy(model_dir, p, 48) for p in prompts]
    outs, _ = eng.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=48, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want
