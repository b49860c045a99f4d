"""warmup() pre-compiles the programs production actually dispatches, so a
warmed engine serves its first requests with zero compile stalls (the jit
analogue of the reference capturing CUDA graphs at init,
/root/reference/ssd/engine/model_runner.py:278-302)."""

import numpy as np

from ssd_tpu.llm import LLM
from ssd_tpu.sampling_params import SamplingParams
from tests.utils_models import make_tiny_llama


def test_warmed_engine_compiles_nothing_on_first_generate(tmp_path):
    """With flat prefill (the default), warmup(prefill_s_pads=...) must warm
    the FLAT prefill program — a fresh-prompt batch inside the warmed buckets
    then adds no new jit cache entries for prefill or decode."""
    from ssd_tpu.engine import model_runner as mr

    d = str(tmp_path / "m")
    make_tiny_llama(d, seed=0)
    eng = LLM(d, init_random=False, dtype="float32", max_model_len=128,
              max_num_seqs=2, kvcache_block_size=16, num_kvcache_blocks=32,
              ctx_bucket_policy="single")
    eng.warmup(prefill_s_pads=(4,))

    flat_before = mr.flat_prefill_step_packed._cache_size()
    decode_before = mr.decode_step_packed._cache_size()
    assert flat_before > 0, "warmup never compiled the flat prefill program"

    # Two fresh prompts: 5+3=8 new tokens -> T_pad 8 = warmed
    # next_pow2(B_pad=2 * s_pad=4); 2 pages -> P_pad 2 = warmed.
    outs, _ = eng.generate(
        [[1, 5, 9, 2, 7], [4, 4, 8]],
        SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )
    assert all(len(o["token_ids"]) == 6 for o in outs)
    assert mr.flat_prefill_step_packed._cache_size() == flat_before, (
        "first prefill compiled a program warmup should have covered")
    assert mr.decode_step_packed._cache_size() == decode_before, (
        "first decode compiled a program warmup should have covered")
