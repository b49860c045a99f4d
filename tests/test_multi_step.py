"""AR multi-step decoding: M sampled tokens per dispatch must be
token-identical to single-step decoding (and HF), including EOS truncation
and max_new_tokens overshoot rollback."""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("multistep_llama")
    make_tiny_llama(d, seed=0)
    return str(d)


def engine(model_dir, multi_step):
    return LLM(
        model_dir,
        multi_step=multi_step,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_seqs=4,
    )


def test_multi_step_greedy_token_exact(model_dir):
    eng = engine(model_dir, multi_step=4)
    prompts = [random_prompt(rng(60 + i), 8, 24) for i in range(3)]
    wants = [hf_greedy(model_dir, p, 30) for p in prompts]  # 30 % 4 != 0
    outs, _ = eng.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=30, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_multi_step_eos_truncation(model_dir):
    """Without ignore_eos, output must stop exactly at the first EOS even when
    it lands mid-chain."""
    eng1 = engine(model_dir, multi_step=1)
    eng4 = engine(model_dir, multi_step=4)
    prompts = [random_prompt(rng(70 + i), 8, 24) for i in range(3)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=False)
    outs1, _ = eng1.generate([list(p) for p in prompts], sp, use_tqdm=False)
    outs4, _ = eng4.generate([list(p) for p in prompts], sp, use_tqdm=False)
    for o1, o4 in zip(outs1, outs4):
        assert o1["token_ids"] == o4["token_ids"]
