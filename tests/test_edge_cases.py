"""Regression tests for review findings: fully-cached prompts, context-limit
boundary termination, and request validation."""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_target")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_draft")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, heads=4, kv_heads=2, seed=7)
    return str(d)


def test_fully_prefix_cached_prompt_token_exact(target_dir):
    """A prompt whose length is an exact block multiple is fully prefix-cached
    on re-submission; the first sampled token must still come from real
    last-token logits (the qeff=0 ghost-row bug)."""
    engine = LLM(
        target_dir, dtype="float32", max_model_len=256,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=64, max_num_seqs=2,
    )
    prompt = random_prompt(rng(900), 32, 33)  # len 32 = 2 full blocks
    assert len(prompt) % 16 == 0
    want = hf_greedy(target_dir, prompt, 16)
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    out1, _ = engine.generate([list(prompt)], sp, use_tqdm=False)
    out2, _ = engine.generate([list(prompt)], sp, use_tqdm=False)  # cached hit
    assert out1[0]["token_ids"] == want
    assert out2[0]["token_ids"] == want


def test_spec_context_boundary_terminates(target_dir, draft_dir):
    """Async SSD with max_new_tokens reaching into the megaspec-lookahead dead
    zone near max_model_len must terminate with a truncated completion, not
    livelock (the reference preempt-loops forever here)."""
    engine = LLM(
        target_dir, draft=draft_dir, speculate=True, draft_async=True,
        speculate_k=2, async_fan_out=2, dtype="float32",
        max_model_len=64,  # megaspec lookahead = 3 + 2*6 = 15 -> dead zone
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=96, max_num_seqs=2, max_steps=200,
    )
    prompt = random_prompt(rng(901), 20, 24)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=60, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    got = outs[0]["token_ids"]
    assert 1 <= len(got) < 60  # truncated at the boundary, not hung
    want = hf_greedy(target_dir, prompt, len(got))
    assert got == want  # the tokens it did produce are exact


@pytest.mark.parametrize("rounds", [1, 4])
def test_sync_sd_generates_to_context_limit(target_dir, draft_dir, rounds):
    """Sync SD (unfused and fused multi-round) must generate right UP TO
    max_model_len — not finish R*(K+1) tokens early at the lookahead horizon.
    Overshoot positions land in ghost KV slots and the host truncates."""
    engine = LLM(
        target_dir, draft=draft_dir, speculate=True, draft_async=False,
        speculate_k=3, spec_rounds=rounds, dtype="float32",
        max_model_len=64, max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=96, max_num_seqs=2, max_steps=400,
    )
    prompt = random_prompt(rng(902), 20, 24)
    room = 64 - len(prompt)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=100, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    got = outs[0]["token_ids"]
    assert len(got) == room  # the full context, not an early horizon finish
    assert got == hf_greedy(target_dir, prompt, room)


def test_oversized_prompt_rejected(target_dir):
    engine = LLM(
        target_dir, dtype="float32", max_model_len=64,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=32, max_num_seqs=2,
    )
    with pytest.raises(ValueError, match="no room"):
        engine.add_request(list(range(3, 70)), SamplingParams(max_new_tokens=4))
    with pytest.raises(ValueError, match="empty"):
        engine.add_request([], SamplingParams(max_new_tokens=4))


def test_unserveable_request_raises(target_dir):
    """A prompt needing more KV blocks than exist must raise, not spin."""
    engine = LLM(
        target_dir, dtype="float32", max_model_len=256,
        max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=2, max_num_seqs=1,  # 32 slots total
    )
    engine.add_request(list(range(3, 60)), SamplingParams(max_new_tokens=4))
    with pytest.raises(RuntimeError, match="KV"):
        for _ in range(50):
            engine.step()


def test_sync_sd_context_limit_pallas_route(tmp_path_factory):
    """The context-limit overshoot THROUGH the manual-DMA kernel route
    (hd=64, kernels in interpret mode): regression for the review finding
    that v2/v3 mis-handled context_lens > ctx_pad (unwritten output + the
    prefetch desequencing into the next sequence). Two sequences decode
    together so the neighbor-corruption mode is covered."""
    t = tmp_path_factory.mktemp("lim64_t")
    d = tmp_path_factory.mktemp("lim64_d")
    make_tiny_llama(t, hidden=256, heads=4, kv_heads=2, seed=0)
    make_tiny_llama(d, hidden=256, heads=4, kv_heads=2, layers=1, seed=7)
    engine = LLM(
        str(t), draft=str(d), speculate=True, draft_async=False,
        speculate_k=3, spec_rounds=4, dtype="float32", use_pallas=True,
        max_model_len=64, max_num_batched_tokens=1024, kvcache_block_size=16,
        num_kvcache_blocks=96, max_num_seqs=2, max_steps=400,
    )
    p1 = random_prompt(rng(903), 20, 24)
    p2 = random_prompt(rng(904), 8, 12)  # far from the limit
    outs, _ = engine.generate(
        [list(p1), list(p2)],
        SamplingParams(temperature=0.0, max_new_tokens=100, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    assert len(outs[0]["token_ids"]) == 64 - len(p1)
    assert outs[0]["token_ids"] == hf_greedy(str(t), p1, 64 - len(p1))
    assert outs[1]["token_ids"][:10] == hf_greedy(str(t), p2, 10)


def test_eagle_async_spec_rounds_rejected(tmp_path_factory):
    """use_eagle + draft_async + spec_rounds>1 must be rejected up front:
    the async handshake is inherently one exchange per round — fusing rounds
    requires the SYNC superstep (which round 4 added; use_eagle +
    spec_rounds>1 without draft_async is the supported fused-EAGLE mode,
    tests/test_fused_eagle.py)."""
    from tests.utils_models import make_tiny_eagle

    t = tmp_path_factory.mktemp("er_t")
    e = tmp_path_factory.mktemp("er_e")
    make_tiny_llama(t, layers=6, seed=0)
    make_tiny_eagle(e, seed=3)
    with pytest.raises(AssertionError, match="draft_async"):
        LLM(str(t), draft=str(e), speculate=True, use_eagle=True,
            draft_async=True, jit_speculate=True,
            spec_rounds=4, speculate_k=3, dtype="float32",
            max_model_len=128, max_num_batched_tokens=512,
            kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=2)


def test_fused_async_generates_to_context_limit(target_dir, draft_dir):
    """The fused async superstep must generate right UP TO max_model_len —
    not boundary-finish R*(K+1)+megaspec tokens early (measured on-chip:
    prompt 1900 at max_model_len 2048 emitted ZERO tokens before the fix).
    Its in-program tree cache is discarded every superstep, so overshoot
    rounds land in ghost KV slots and truncate exactly like sync SD."""
    engine = LLM(
        target_dir, draft=draft_dir, speculate=True, draft_async=True,
        async_fused=True, speculate_k=3, spec_rounds=4, async_fan_out=2,
        dtype="float32", max_model_len=64, max_num_batched_tokens=1024,
        kvcache_block_size=16, num_kvcache_blocks=96, max_num_seqs=2,
        max_steps=400,
    )
    prompt = random_prompt(rng(903), 20, 24)
    room = 64 - len(prompt)
    outs, _ = engine.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=100, ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    got = outs[0]["token_ids"]
    assert len(got) == room  # the full context, not an early horizon finish
    assert got == hf_greedy(target_dir, prompt, room)
