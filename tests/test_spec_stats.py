"""Statistical exactness gate (BASELINE.md gate 2): at temp > 0, async SSD
with jit_speculate uses real draft logits on every row, so its acceptance-rate
statistics must match synchronous SD within sampling noise — the reference's
oracle for temperature-sampled exactness (SURVEY §4.4)."""

import numpy as np

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import make_tiny_llama, random_prompt, rng


def _run(target_dir, draft_dir, draft_async, n_prompts=4, out_len=48):
    engine = LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        speculate_k=3,
        draft_async=draft_async,
        jit_speculate=draft_async,
        async_fan_out=2,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=96,
        max_num_seqs=4,
        seed=0,
    )
    prompts = [random_prompt(rng(500 + i), 8, 16) for i in range(n_prompts)]
    _, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.7, max_new_tokens=out_len, ignore_eos=True),
        use_tqdm=False,
    )
    lens = metrics["accepted_suffix_lens_with_recovery"]
    engine.exit()
    # accepted spec tokens per step (suffix includes the recovery token)
    return (sum(lens) - len(lens)) / len(lens)


def test_ssd_acceptance_matches_sd(tmp_path_factory):
    target = tmp_path_factory.mktemp("stats_target")
    draft = tmp_path_factory.mktemp("stats_draft")
    make_tiny_llama(target, seed=0)
    # A related draft: same seed, fewer layers -> correlated but not identical.
    make_tiny_llama(draft, layers=1, seed=0)

    acc_sd = _run(str(target), str(draft), draft_async=False)
    acc_ssd = _run(str(target), str(draft), draft_async=True)
    assert abs(acc_sd - acc_ssd) < 0.5, (
        f"SD acceptance {acc_sd:.3f} vs SSD(jit) {acc_ssd:.3f} diverge beyond noise"
    )
