"""Qwen3-MoE end-to-end: greedy outputs token-exact vs HF through the full
engine (paged KV, continuous batching, jitted decode). MoE is the reference's
roadmap feature (README.md:132) implemented TPU-first: all experts run as one
batched einsum per layer (weight-read-optimal at decode batch sizes) and the
expert axis shards over the mesh (expert parallelism)."""

import numpy as np
import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import hf_greedy, make_tiny_qwen3_moe, random_prompt, rng


@pytest.fixture(scope="module")
def moe_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("qwen3_moe")
    make_tiny_qwen3_moe(d, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def moe_dir_unnormed(tmp_path_factory):
    d = tmp_path_factory.mktemp("qwen3_moe_unnormed")
    make_tiny_qwen3_moe(d, norm_topk_prob=False, seed=4)
    return str(d)


def _engine(model_dir, **kw):
    return LLM(
        model_dir,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=1024,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_seqs=4,
        **kw,
    )


def test_qwen3_moe_greedy_token_exact(moe_dir):
    eng = _engine(moe_dir)
    prompts = [random_prompt(rng(31), 8, 24) for _ in range(3)]
    wants = [hf_greedy(moe_dir, p, 24) for p in prompts]
    outs, _ = eng.generate(
        [list(p) for p in prompts],
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    for out, want in zip(outs, wants):
        assert out["token_ids"] == want


def test_qwen3_moe_without_topk_renorm(moe_dir_unnormed):
    """norm_topk_prob=False (the HF default) takes the un-renormalised
    routing-weight path."""
    eng = _engine(moe_dir_unnormed)
    prompt = random_prompt(rng(33), 10, 20)
    want = hf_greedy(moe_dir_unnormed, prompt, 16)
    outs, _ = eng.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want


def test_qwen3_moe_expert_parallel_tp4(moe_dir):
    """Expert parallelism: the 4 experts shard one-per-device over a 4-device
    tp mesh; outputs must match the single-device run token-for-token."""
    eng1 = _engine(moe_dir)
    eng4 = _engine(moe_dir, num_devices=4)
    prompts = [random_prompt(rng(35), 8, 16) for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    outs1, _ = eng1.generate([list(p) for p in prompts], sp, use_tqdm=False)
    outs4, _ = eng4.generate([list(p) for p in prompts], sp, use_tqdm=False)
    assert [o["token_ids"] for o in outs1] == [o["token_ids"] for o in outs4]


def test_qwen3_moe_gather_matches_dense(moe_dir):
    """The decode-size selected-expert weight gather (moe_gather, the
    default: reads only the top-k experts' rows per token) and the dense
    all-expert einsum control produce identical greedy outputs."""
    eng_g = _engine(moe_dir)
    eng_d = _engine(moe_dir, moe_gather=False)
    prompts = [random_prompt(rng(41), 8, 20) for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)
    outs_g, _ = eng_g.generate([list(p) for p in prompts], sp, use_tqdm=False)
    outs_d, _ = eng_d.generate([list(p) for p in prompts], sp, use_tqdm=False)
    assert [o["token_ids"] for o in outs_g] == [o["token_ids"] for o in outs_d]


def test_qwen3_moe_ragged_matches_dense(moe_dir):
    """The ragged grouped-GEMM prefill path (moe_ragged, the default:
    expert-sorted tokens through lax.ragged_dot at k/E of the dense FLOPs)
    and the dense all-expert einsum control produce identical greedy
    outputs."""
    eng_r = _engine(moe_dir)
    eng_d = _engine(moe_dir, moe_ragged=False)
    prompts = [random_prompt(rng(43), 8, 20) for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)
    outs_r, _ = eng_r.generate([list(p) for p in prompts], sp, use_tqdm=False)
    outs_d, _ = eng_d.generate([list(p) for p in prompts], sp, use_tqdm=False)
    assert [o["token_ids"] for o in outs_r] == [o["token_ids"] for o in outs_d]


@pytest.fixture(scope="module")
def moe_dir_k3(tmp_path_factory):
    """E=8, top_k=3: a 3-term expert sum exposes accumulation-order
    divergence that the k=2 model is blind to (a two-term sum is
    order-insensitive)."""
    d = tmp_path_factory.mktemp("qwen3_moe_k3")
    make_tiny_qwen3_moe(d, num_experts=8, top_k=3, seed=9)
    return str(d)


def test_qwen3_moe_k3_all_paths_agree(moe_dir_k3):
    """k=3: gather (decode), ragged (prefill), and dense control must agree
    token-for-token with HF and each other — pins the expert-index-order
    accumulation across every dispatch path."""
    prompts = [random_prompt(rng(47), 8, 20) for _ in range(2)]
    wants = [hf_greedy(moe_dir_k3, p, 20) for p in prompts]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)
    for kw in ({}, {"moe_ragged": False}, {"moe_gather": False}):
        eng = _engine(moe_dir_k3, **kw)
        outs, _ = eng.generate([list(p) for p in prompts], sp, use_tqdm=False)
        assert [o["token_ids"] for o in outs] == wants, kw


def test_qwen3_moe_k3_ar_vs_sync_sd(moe_dir_k3):
    """Cross-mode MoE exactness at k=3: AR decode (gather path, T*k=3) and
    sync-SD verify (T*k=9 per seq — a different dispatch path) must emit
    identical greedy tokens (the ADVICE r2 medium finding's regression
    test)."""
    prompt = random_prompt(rng(53), 8, 16)
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    eng_ar = _engine(moe_dir_k3)
    want, _ = eng_ar.generate([list(prompt)], sp, use_tqdm=False)
    eng_sd = _engine(moe_dir_k3, draft=moe_dir_k3, speculate=True,
                     speculate_k=2)
    got, _ = eng_sd.generate([list(prompt)], sp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]


def test_moe_unroll_cap_boundary():
    """Direct _moe_mlp check across the MOE_GATHER_UNROLL_CAP boundary: the
    gather path (T*k <= cap), the ragged grouped GEMM, and the dense einsum
    agree numerically on the same inputs at k=3 (order-sensitive sum)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ssd_tpu.models.transformer import (
        MOE_GATHER_UNROLL_CAP, Arch, _moe_mlp, init_params,
    )

    arch = Arch(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=16, rms_norm_eps=1e-5,
        rope_theta=1e4, use_qk_norm=True, tie_embeddings=False,
        num_experts=8, num_experts_per_tok=3, moe_intermediate_size=48,
        norm_topk_prob=True,
    )
    params = init_params(arch, jax.random.PRNGKey(0), jnp.float32)
    lp = {k: v[0] for k, v in params["layers"].items()}
    side = {k: v.reshape((-1,) + v.shape[2:])
            for k, v in params["layers"].items()
            if k.startswith(("moe_", "router")) and k != "router"}
    for T in (MOE_GATHER_UNROLL_CAP // 3, MOE_GATHER_UNROLL_CAP // 3 + 1, 16):
        x = jax.random.normal(jax.random.PRNGKey(T), (T, 32), jnp.float32)
        gather = _moe_mlp(x, lp, arch, side=side,
                          layer=jnp.zeros((), jnp.int32))
        ragged = _moe_mlp(x, lp, arch)
        dense = _moe_mlp(x, lp, dataclasses.replace(arch, moe_ragged=False))
        import numpy as np

        np.testing.assert_allclose(np.asarray(gather), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ragged), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)


def test_qwen3_moe_sync_sd_self_draft_exact(moe_dir):
    """Speculative decoding over an MoE target (self-draft): exactness holds
    and every speculated token is accepted at temp 0."""
    eng = _engine(moe_dir, draft=moe_dir, speculate=True, speculate_k=2)
    prompt = random_prompt(rng(37), 8, 16)
    want = hf_greedy(moe_dir, prompt, 16)
    outs, metrics = eng.generate(
        [list(prompt)],
        SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True),
        use_tqdm=False,
    )
    assert outs[0]["token_ids"] == want
    lens = metrics["accepted_suffix_lens_with_recovery"]
    assert lens and np.mean(lens) == 3.0  # K+1 with draft == target
