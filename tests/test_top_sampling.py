"""Top-p / top-k sampling (beyond reference): the warp must match HF
filtering semantics, speculative sampling must stay exact w.r.t. the WARPED
target distribution (both p and q warp in verify()), and top_k=1 must reduce
every mode to greedy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_llama, random_prompt, rng


def _np_warp(probs, top_p, top_k):
    """Reference (numpy) HF-processor-chain filter over one row: top-k
    filters first, top-p measures cumulative mass on the top-k-RENORMALISED
    survivors (HF chains TopKLogitsWarper before TopPLogitsWarper, and TopP
    softmaxes the already-filtered logits)."""
    V = len(probs)
    order = np.argsort(-probs, kind="stable")
    sp = probs[order]
    k = top_k if top_k > 0 else V
    keep_k = np.arange(V) < k
    sp_k = np.where(keep_k, sp, 0.0)
    cum = np.cumsum(sp_k) / sp_k.sum()
    keep_sorted = keep_k & ((cum - sp_k / sp_k.sum()) < top_p)
    keep = np.zeros(V, bool)
    keep[order] = keep_sorted
    out = np.where(keep, probs, 0.0)
    return out / out.sum()


def test_warp_matches_numpy_reference():
    from ssd_tpu.ops.sampler import warp_top_probs

    rng_np = np.random.default_rng(0)
    probs = rng_np.dirichlet(np.ones(32), size=6).astype(np.float32)
    top_p = np.array([1.0, 0.9, 0.5, 0.3, 1.0, 0.75], np.float32)
    top_k = np.array([0, 0, 4, 0, 3, 2], np.int32)
    got = np.asarray(warp_top_probs(
        jnp.asarray(probs), jnp.asarray(top_p), jnp.asarray(top_k)))
    for b in range(6):
        want = _np_warp(probs[b].astype(np.float64), top_p[b], top_k[b])
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)
    # top_p=1 / top_k=0 row passes through unchanged.
    np.testing.assert_allclose(got[0], probs[0] / probs[0].sum(), rtol=1e-6)


def test_warp_joint_topk_then_topp_hf_semantics():
    """With both filters set, top-p measures mass on the top-k-renormalised
    survivors (HF chains the warpers): [0.5,0.2,0.2,0.1] with top_k=2,
    top_p=0.7 keeps ONLY token 0 (0.5/0.7 = 0.714 >= 0.7 closes the
    nucleus), not {0,1}."""
    from ssd_tpu.ops.sampler import warp_top_probs

    p = jnp.asarray([[0.5, 0.2, 0.2, 0.1]], jnp.float32)
    got = np.asarray(warp_top_probs(
        p, jnp.asarray([0.7], jnp.float32), jnp.asarray([2], jnp.int32)))
    np.testing.assert_allclose(got, [[1.0, 0.0, 0.0, 0.0]], atol=1e-7)


def test_sample_distribution_matches_warped_softmax():
    from ssd_tpu.ops.sampler import sample

    V, N = 16, 20000
    rng_np = np.random.default_rng(1)
    logits = jnp.asarray(rng_np.normal(size=(1, V)).astype(np.float32))
    temps = jnp.ones(1, jnp.float32)
    tp = jnp.asarray([0.7], jnp.float32)
    tk = jnp.asarray([0], jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(7), N)
    toks = np.asarray(jax.vmap(
        lambda k: sample(logits, temps, k, top_p=tp, top_k=tk)[0]
    )(keys))
    emp = np.bincount(toks, minlength=V) / N
    want = _np_warp(np.asarray(jax.nn.softmax(logits[0])).astype(np.float64),
                    0.7, 0)
    tv = 0.5 * np.abs(emp - want).sum()
    assert tv < 0.02, f"TV {tv:.4f} vs warped softmax"
    assert (emp[want == 0] == 0).all(), "sampled a filtered-out token"


def test_spec_output_distribution_equals_warped_target():
    """Rejection sampling with BOTH p and q warped emits tokens distributed
    as the WARPED target — the exactness theorem in the warped space."""
    from ssd_tpu.ops.verify import verify

    V, K, N = 8, 1, 20000
    rng_np = np.random.default_rng(3)
    logits_p = jnp.asarray(rng_np.normal(size=(1, K + 1, V)).astype(np.float32))
    logits_q = jnp.asarray(rng_np.normal(size=(1, K, V)).astype(np.float32))
    temps = jnp.ones(1, jnp.float32)
    hits = jnp.ones(1, jnp.int64)
    tp = jnp.asarray([0.8], jnp.float32)
    tk = jnp.asarray([0], jnp.int32)

    q_warp = _np_warp(np.asarray(jax.nn.softmax(logits_q[0, 0])).astype(np.float64), 0.8, 0)
    p_warp = _np_warp(np.asarray(jax.nn.softmax(logits_p[0, 0])).astype(np.float64), 0.8, 0)

    def one_trial(key):
        k_draft, k_verify = jax.random.split(key)
        # The draft samples from its WARPED distribution (as the engine's
        # warped sample() does).
        draft_tok = jax.random.choice(k_draft, V, p=jnp.asarray(q_warp, jnp.float32))
        spec = jnp.stack([jnp.int32(0), draft_tok.astype(jnp.int32)])[None, :]
        accept, recovery = verify(
            logits_p, logits_q, spec, temps, temps, hits, k_verify,
            top_p=tp, top_k=tk,
        )
        return jnp.where(accept[0] >= 1, draft_tok, recovery[0])

    keys = jax.random.split(jax.random.PRNGKey(11), N)
    emitted = np.asarray(jax.vmap(one_trial)(keys))
    emp = np.bincount(emitted, minlength=V) / N
    tv = 0.5 * np.abs(emp - p_warp).sum()
    assert tv < 0.02, f"TV {tv:.4f}: emitted dist != warped target"
    assert (emp[p_warp == 0] == 0).all(), "emitted a filtered-out token"


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("topsamp_m")
    make_tiny_llama(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("topsamp_d")
    make_tiny_llama(d, layers=1, hidden=32, intermediate=64, seed=7)
    return str(d)


def _engine(model_dir, **kw):
    return LLM(model_dir, enable_top_sampling=True, dtype="float32",
               max_model_len=256, max_num_batched_tokens=1024,
               kvcache_block_size=16, num_kvcache_blocks=64,
               max_num_seqs=4, **kw)


def test_top_k1_equals_greedy_ar_and_fused_sd(model_dir, draft_dir):
    """temp=1 + top_k=1 collapses every distribution to its argmax: AR,
    multi-step AR, and fused sync SD must ALL reproduce HF greedy."""
    prompt = random_prompt(rng(81), 8, 20)
    want = hf_greedy(model_dir, prompt, 20)
    sp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=20,
                        ignore_eos=True)

    outs, _ = _engine(model_dir).generate([list(prompt)], sp, use_tqdm=False)
    assert outs[0]["token_ids"] == want

    outs, _ = _engine(model_dir, multi_step=8).generate(
        [list(prompt)], sp, use_tqdm=False)
    assert outs[0]["token_ids"] == want

    outs, metrics = _engine(
        model_dir, draft=draft_dir, speculate=True, speculate_k=2,
        spec_rounds=2,
    ).generate([list(prompt)], sp, use_tqdm=False)
    assert outs[0]["token_ids"] == want
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_unwarped_requests_unchanged_on_warp_engine(model_dir):
    """An engine built with enable_top_sampling still serves default
    requests exactly (top_p=1/top_k=0 pass-through)."""
    prompt = random_prompt(rng(83), 8, 16)
    want = hf_greedy(model_dir, prompt, 12)
    outs, _ = _engine(model_dir).generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_warped_request_rejected_without_engine_flag(model_dir):
    eng = LLM(model_dir, dtype="float32", max_model_len=256,
              kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=4)
    with pytest.raises(ValueError, match="enable_top_sampling"):
        eng.add_request([1, 2, 3], SamplingParams(temperature=1.0, top_p=0.9))


def test_top_k1_equals_greedy_async_ssd(model_dir, draft_dir):
    """temp=1 + top_k=1 through async SSD (tree build, jit-speculate chain,
    and verify all warp) must also reproduce HF greedy."""
    prompt = random_prompt(rng(85), 8, 20)
    want = hf_greedy(model_dir, prompt, 20)
    sp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=20,
                        ignore_eos=True)
    eng = _engine(model_dir, draft=draft_dir, speculate=True, speculate_k=2,
                  draft_async=True, async_fan_out=2)
    outs, metrics = eng.generate([list(prompt)], sp, use_tqdm=False)
    eng.exit()
    assert outs[0]["token_ids"] == want
    assert metrics["cache_hits"], "async spec path unused"


def test_top_k1_equals_greedy_eagle(model_dir, tmp_path_factory):
    """temp=1 + top_k=1 through the EAGLE async path (carve-out lifted: the
    warp threads through the EAGLE chain and tree samplers) must reproduce
    the same engine's greedy output."""
    from tests.utils_models import make_tiny_eagle

    eagle_dir = str(tmp_path_factory.mktemp("warp_eagle"))
    make_tiny_eagle(eagle_dir, seed=7)
    prompt = random_prompt(rng(87), 8, 20)
    kw = dict(draft=eagle_dir, speculate=True, use_eagle=True,
              draft_async=True, jit_speculate=True, speculate_k=2,
              async_fan_out=2, eagle_layers=[0, 1, 1], seed=0)
    sp_greedy = SamplingParams(temperature=0.0, max_new_tokens=16,
                               ignore_eos=True)
    sp_warp = SamplingParams(temperature=1.0, top_k=1, max_new_tokens=16,
                             ignore_eos=True)
    eng0 = _engine(model_dir, **kw)
    want, _ = eng0.generate([list(prompt)], sp_greedy, use_tqdm=False)
    eng0.exit()
    eng = _engine(model_dir, **kw)
    outs, _ = eng.generate([list(prompt)], sp_warp, use_tqdm=False)
    eng.exit()
    assert outs[0]["token_ids"] == want[0]["token_ids"]


def test_spec_distribution_with_sampler_x_and_warp():
    """sampler_x rescaling and the warp must compose in the SAME order in the
    sampler and in verify() (rescale first, then warp): the emitted-token
    distribution must equal the warped TARGET even when the draft samples
    from warp(rescale(q))."""
    from ssd_tpu.ops.sampler import sample
    from ssd_tpu.ops.verify import verify

    V, K, N, SX, F = 8, 1, 20000, 4.0, 2
    rng_np = np.random.default_rng(5)
    logits_p = jnp.asarray(rng_np.normal(size=(1, K + 1, V)).astype(np.float32))
    logits_q = jnp.asarray(rng_np.normal(size=(1, K, V)).astype(np.float32))
    temps = jnp.ones(1, jnp.float32)
    hits = jnp.ones(1, jnp.int32)
    tp = jnp.asarray([0.8], jnp.float32)
    tk = jnp.asarray([0], jnp.int32)
    p_warp = _np_warp(
        np.asarray(jax.nn.softmax(logits_p[0, 0])).astype(np.float64), 0.8, 0)

    def one_trial(key):
        k_draft, k_verify = jax.random.split(key)
        # The draft samples exactly as the engine's tree sampler does:
        # softmax -> sampler_x rescale -> warp.
        draft_tok = sample(logits_q[:, 0], temps, k_draft, sampler_x=SX,
                           fan_out=F, is_tree=True, top_p=tp, top_k=tk)[0]
        spec = jnp.stack([jnp.int32(0), draft_tok.astype(jnp.int32)])[None, :]
        accept, recovery = verify(
            logits_p, logits_q, spec, temps, temps, hits, k_verify,
            sampler_x=SX, async_fan_out=F, top_p=tp, top_k=tk,
        )
        return jnp.where(accept[0] >= 1, draft_tok, recovery[0])

    keys = jax.random.split(jax.random.PRNGKey(13), N)
    emitted = np.asarray(jax.vmap(one_trial)(keys))
    emp = np.bincount(emitted, minlength=V) / N
    tv = 0.5 * np.abs(emp - p_warp).sum()
    assert tv < 0.02, f"TV {tv:.4f}: sampler_x + warp ordering is inconsistent"


def test_invalid_top_p_rejected(model_dir):
    eng = _engine(model_dir)
    with pytest.raises(ValueError, match="top_p"):
        eng.add_request([1, 2, 3], SamplingParams(temperature=1.0, top_p=0.0))
    with pytest.raises(ValueError, match="top_k"):
        eng.add_request([1, 2, 3], SamplingParams(temperature=1.0, top_k=-2))
