"""Fused multi-round sync SD (ssd_tpu.engine.fused_sd): greedy outputs must be
token-exact vs the HF reference AND vs unfused sync SD — the fusion changes
only the dispatch structure (R rounds per program), never token semantics."""

import numpy as np
import pytest
import torch

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import make_tiny_llama

PROMPTS = [[1, 5, 9, 2, 7, 3], [4, 4, 8, 1], [2, 2, 2]]


def _generate(target, draft, spec_rounds, max_new=24, max_steps=None):
    engine = LLM(
        str(target),
        draft=str(draft),
        speculate=True,
        speculate_k=3,
        spec_rounds=spec_rounds,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=128,
        max_num_seqs=4,
        seed=0,
        max_steps=max_steps,
    )
    outs, metrics = engine.generate(
        [list(p) for p in PROMPTS],
        SamplingParams(temperature=0.0, max_new_tokens=max_new, ignore_eos=True),
        use_tqdm=False,
    )
    return [o["token_ids"] for o in outs], metrics


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    target = tmp_path_factory.mktemp("fused_target")
    draft = tmp_path_factory.mktemp("fused_draft")
    make_tiny_llama(target, seed=0)
    make_tiny_llama(draft, layers=1, seed=0)
    return target, draft


def test_fused_sd_matches_hf_and_unfused(ckpts):
    target, draft = ckpts
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(str(target), torch_dtype=torch.float32)
    want = [
        hf.generate(torch.tensor([p]), max_new_tokens=24, do_sample=False)[0][
            len(p):
        ].tolist()
        for p in PROMPTS
    ]

    got_fused, metrics = _generate(target, draft, spec_rounds=4)
    assert got_fused == want, (got_fused, want)

    got_unfused, _ = _generate(target, draft, spec_rounds=1)
    assert got_unfused == got_fused

    lens = metrics["accepted_suffix_lens_with_recovery"]
    assert lens and all(1 <= n <= 4 for n in lens)


def test_fused_sd_eos_truncation(ckpts):
    """EOS appearing mid-superstep truncates the suffix (no over-generation)."""
    target, draft = ckpts
    engine = LLM(
        str(target),
        draft=str(draft),
        speculate=True,
        speculate_k=3,
        spec_rounds=4,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=128,
        max_num_seqs=4,
        seed=0,
    )
    # max_new_tokens smaller than one superstep's worst case (4 rounds x 4):
    # truncation must cap output exactly.
    outs, _ = engine.generate(
        [list(PROMPTS[0])],
        SamplingParams(temperature=0.0, max_new_tokens=5, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 5


def test_round_choices_ladder():
    from ssd_tpu.engine.step import round_choices

    assert round_choices(32) == (4, 8, 16, 32)
    assert round_choices(8) == (4, 8)
    assert round_choices(3) == (3,)
    assert round_choices(1) == (1,)


def test_fused_sd_dynamic_rounds(ckpts, monkeypatch):
    """A token budget far below spec_rounds' coverage must pick a smaller
    compiled R (static R=64 measured 141 vs 262 tok/s at R=32 on a 128-token
    budget, PERF.md) while staying token-exact vs the unfused path."""
    target, draft = ckpts
    want, _ = _generate(target, draft, spec_rounds=1, max_new=6)

    import ssd_tpu.engine.fused_sd as fsd

    used = []
    real = fsd.run_sd_superstep

    def spy(t, d, seqs, K, R):
        used.append(R)
        return real(t, d, seqs, K, R)

    monkeypatch.setattr(fsd, "run_sd_superstep", spy)
    got, _ = _generate(target, draft, spec_rounds=16, max_new=6)
    assert got == want
    # budget 6, optimistic K+1=4 tokens/round -> need 2 rounds -> rung R=4,
    # never the full 16.
    assert used and max(used) <= 4, used


def test_fused_sd_over_tp_mesh_token_exact(ckpts):
    """Fused SD with the target AND draft sharded over a 4-device tp mesh:
    the superstep traces both models' params into one SPMD program, so the
    draft must share the target's mesh placement (llm_engine puts the sync
    draft on the same mesh). Greedy output must match the 1-device run."""
    target, draft = ckpts
    want, _ = _generate(target, draft, spec_rounds=3)

    engine = LLM(
        str(target),
        draft=str(draft),
        speculate=True,
        speculate_k=3,
        spec_rounds=3,
        num_devices=4,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=128,
        max_num_seqs=4,
        seed=0,
    )
    outs, _ = engine.generate(
        [list(p) for p in PROMPTS],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    assert [o["token_ids"] for o in outs] == want
