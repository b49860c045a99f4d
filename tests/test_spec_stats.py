"""Statistical exactness gate (BASELINE.md gate 2): at temp > 0, async SSD
with jit_speculate uses real draft logits on every row, so its acceptance
statistics must match synchronous SD within sampling noise. The oracle is the
reference's per-depth acceptance HISTOGRAM (llm_engine.py:251-262), compared
bin by bin — a scalar mean can hide a reshaped distribution (e.g. more
0-accepts balanced by more full-accepts)."""

import numpy as np

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import make_tiny_llama, random_prompt, rng

K = 3


def _accept_histogram(target_dir, draft_dir, draft_async, n_prompts=8,
                      out_len=96):
    """Frequencies of accepted-spec-token counts (0..K) per spec round."""
    engine = LLM(
        target_dir,
        draft=draft_dir,
        speculate=True,
        speculate_k=K,
        draft_async=draft_async,
        jit_speculate=draft_async,
        async_fan_out=2,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=192,
        max_num_seqs=8,
        seed=0,
    )
    prompts = [random_prompt(rng(500 + i), 8, 16) for i in range(n_prompts)]
    _, metrics = engine.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.7, max_new_tokens=out_len, ignore_eos=True),
        use_tqdm=False,
    )
    # suffix length includes the recovery token -> accepted count = len - 1
    accepted = np.asarray(metrics["accepted_suffix_lens_with_recovery"]) - 1
    engine.exit()
    assert len(accepted) >= 150, f"too few spec rounds ({len(accepted)})"
    hist = np.bincount(np.clip(accepted, 0, K), minlength=K + 1)
    return hist / hist.sum(), len(accepted)


def test_ssd_acceptance_histogram_matches_sd(tmp_path_factory):
    target = tmp_path_factory.mktemp("stats_target")
    draft = tmp_path_factory.mktemp("stats_draft")
    make_tiny_llama(target, seed=0)
    # A related draft: same seed, fewer layers -> correlated but not identical.
    make_tiny_llama(draft, layers=1, seed=0)

    h_sd, n_sd = _accept_histogram(str(target), str(draft), draft_async=False)
    h_ssd, n_ssd = _accept_histogram(str(target), str(draft), draft_async=True)

    # Per-bin tolerance: ~4 sigma of the binomial sampling noise of the
    # smaller run, floored to keep tiny bins from over-triggering.
    n = min(n_sd, n_ssd)
    diffs = np.abs(h_sd - h_ssd)
    for k in range(K + 1):
        p = max(h_sd[k], h_ssd[k])
        tol = max(0.04, 4.0 * np.sqrt(max(p * (1 - p), 1e-4) / n) * np.sqrt(2))
        assert diffs[k] < tol, (
            f"depth-{k} acceptance frequency diverges: SD={h_sd[k]:.3f} "
            f"SSD={h_ssd[k]:.3f} (tol {tol:.3f}; hists {h_sd} vs {h_ssd})"
        )
    mean_sd = float((h_sd * np.arange(K + 1)).sum())
    mean_ssd = float((h_ssd * np.arange(K + 1)).sum())
    assert abs(mean_sd - mean_ssd) < 0.25, (
        f"mean accepted/step diverges: {mean_sd:.3f} vs {mean_ssd:.3f}"
    )
