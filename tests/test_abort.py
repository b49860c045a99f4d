"""Request cancellation (beyond reference — vLLM abort_request parity):
aborting frees KV blocks immediately and the remaining requests stay exact."""

import numpy as np

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


def _engine(model_dir, **kw):
    return LLM(model_dir, dtype="float32", max_model_len=256,
               max_num_batched_tokens=1024, kvcache_block_size=16,
               num_kvcache_blocks=64, max_num_seqs=4, **kw)


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
