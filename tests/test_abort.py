"""Request cancellation (beyond reference — vLLM abort_request parity):
aborting frees KV blocks immediately and the remaining requests stay exact."""

import numpy as np

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


def _engine(model_dir, **kw):
    kw.setdefault("num_kvcache_blocks", 64)
    return LLM(model_dir, dtype="float32", max_model_len=256,
               max_num_batched_tokens=1024, kvcache_block_size=16,
               max_num_seqs=4, **kw)


def test_abort_running_and_waiting(tmp_path):
    d = str(tmp_path / "m")
    make_tiny_llama(d, seed=0)
    eng = _engine(d)
    sp = SamplingParams(temperature=0.0, max_new_tokens=32, ignore_eos=True)
    step = eng.create_inference_step(eng.config)

    keep_prompt = random_prompt(rng(101), 8, 16)
    keep_id = eng.add_request(list(keep_prompt), sp)
    kill_id = eng.add_request(list(random_prompt(rng(102), 8, 16)), sp)

    eng.step(step)   # prefill both
    eng.step(step)   # one decode step
    free_before = len(eng.scheduler.block_manager.free_block_ids) + len(
        getattr(eng.scheduler.block_manager, "used_block_ids", []))

    assert eng.abort_request(kill_id) is True
    assert eng.abort_request(kill_id) is False  # already gone
    # A queued (never-scheduled) request aborts too.
    queued_id = eng.add_request(list(random_prompt(rng(103), 8, 16)), sp)
    assert eng.abort_request(queued_id) is True

    # The surviving request must still be token-exact vs HF.
    outs = {}
    for _ in range(100):
        for sid, toks in eng.step(step):
            outs[sid] = toks
        if eng.scheduler.is_finished():
            break
    assert outs[keep_id] == hf_greedy(d, keep_prompt, 32)

    # All blocks are back in the free pool after everything finished.
    bm = eng.scheduler.block_manager
    assert not bm.used_block_ids, bm.used_block_ids


def test_abort_in_fused_spec_modes(tmp_path):
    """Aborting mid-generation under the fused superstep modes (ngram and
    fused EAGLE): blocks free immediately, survivors stay token-exact, and
    the draft-side state (EAGLE conditioning carry / dual block tables)
    never corrupts the remaining sequences."""
    from tests.utils_models import make_tiny_eagle

    t = str(tmp_path / "t")
    e = str(tmp_path / "e")
    make_tiny_llama(t, layers=6, seed=0)
    make_tiny_eagle(e, seed=3)
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)

    for mode_kw in (
        dict(ngram_speculate=True, speculate_k=3, spec_rounds=2, ngram_n=2),
        dict(draft=e, speculate=True, use_eagle=True, speculate_k=2,
             spec_rounds=2, eagle_layers=[0, 2, 4]),
    ):
        eng = _engine(t, num_kvcache_blocks=96, **mode_kw)
        step = eng.create_inference_step(eng.config)
        keep_prompt = random_prompt(rng(111), 8, 16)
        keep_id = eng.add_request(list(keep_prompt), sp)
        kill_id = eng.add_request(list(random_prompt(rng(112), 8, 16)), sp)
        eng.step(step)   # prefill
        eng.step(step)   # one superstep
        assert eng.abort_request(kill_id) is True
        outs = {}
        for _ in range(100):
            for sid, toks in eng.step(step):
                outs[sid] = toks
            if eng.scheduler.is_finished():
                break
        assert outs[keep_id] == hf_greedy(t, keep_prompt, 24)
        assert not eng.scheduler.block_manager.used_block_ids


def test_abort_in_fused_async_modes(tmp_path):
    """Aborting mid-generation under the fused-async modes (the one-dispatch
    exchange and the R-round superstep): blocks free immediately, survivors
    stay token-exact, and the stale host-side tree-cache entries (exchange
    mode) keyed by the dead seq_id are never consulted."""
    t = str(tmp_path / "t")
    d = str(tmp_path / "d")
    make_tiny_llama(t, seed=0)
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, seed=7)
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)

    for rounds in (1, 2):
        eng = _engine(t, draft=d, speculate=True, draft_async=True,
                      async_fused=True, speculate_k=2, spec_rounds=rounds,
                      async_fan_out=2, num_kvcache_blocks=96)
        step = eng.create_inference_step(eng.config)
        keep_prompt = random_prompt(rng(121), 8, 16)
        keep_id = eng.add_request(list(keep_prompt), sp)
        kill_id = eng.add_request(list(random_prompt(rng(122), 8, 16)), sp)
        eng.step(step)   # prefill
        eng.step(step)   # one decode step / superstep
        assert eng.abort_request(kill_id) is True
        outs = {}
        for _ in range(100):
            for sid, toks in eng.step(step):
                outs[sid] = toks
            if eng.scheduler.is_finished():
                break
        assert outs[keep_id] == hf_greedy(t, keep_prompt, 24)
        assert not eng.scheduler.block_manager.used_block_ids
