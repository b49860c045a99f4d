"""Kernel-path token exactness through the FULL engine: the same generation
run with use_pallas=True (interpret-mode kernels on CPU — identical
arithmetic, kernel control flow exercised end-to-end) must match the jnp
oracle path token-for-token. This is the engine-level companion of the
per-kernel numerics tests, and the arbiter for on-chip pallas-vs-oracle
divergence (compiled backends reduce in different orders, so greedy ties can
flip there; under identical arithmetic the paths must be EXACT)."""

import pytest

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import make_tiny_eagle, make_tiny_llama

PROMPTS = [[1, 5, 9, 2, 7, 3], [4, 4, 8, 1]]


def _gen(kw, max_new=12):
    engine = LLM(
        dtype="float32", max_model_len=128, max_num_batched_tokens=512,
        kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=2, seed=0,
        **kw,
    )
    outs, _ = engine.generate(
        [list(p) for p in PROMPTS],
        SamplingParams(temperature=0.0, max_new_tokens=max_new,
                       ignore_eos=True),
        use_tqdm=False,
    )
    engine.exit()
    return [o["token_ids"] for o in outs]


def test_ar_pallas_path_token_exact(tmp_path):
    d = str(tmp_path / "m")
    make_tiny_llama(d, seed=0)
    assert _gen(dict(model=d, use_pallas=True)) == _gen(dict(model=d))


def test_eagle_pallas_path_token_exact(tmp_path):
    target = str(tmp_path / "t")
    draft = str(tmp_path / "e")
    make_tiny_llama(target, layers=6, seed=0)
    make_tiny_eagle(draft, seed=3)
    kw = dict(
        model=target, draft=draft, speculate=True, use_eagle=True,
        draft_async=True, jit_speculate=True, speculate_k=3, async_fan_out=2,
        eagle_layers=[0, 2, 4],
    )
    assert _gen(dict(**kw, use_pallas=True)) == _gen(kw)


def test_ar_pallas_v3_route_token_exact(tmp_path):
    """head_dim=64 routes decode/verify through the manual-DMA kernels
    (paged_attention_best -> v3 at B>1, v2 at B=1) — the default tiny
    models' head_dim=16 never reaches them, so this pins the production
    route's engine-level exactness in interpret mode."""
    d = str(tmp_path / "m64")
    make_tiny_llama(d, hidden=256, heads=4, kv_heads=2, seed=2)  # hd = 64
    assert _gen(dict(model=d, use_pallas=True)) == _gen(dict(model=d))


def test_spec_pallas_v3_route_token_exact(tmp_path):
    """Sync SD (draft chain + multi-query verify) through the hd=64
    kernel route matches the oracle path token-for-token."""
    t = str(tmp_path / "t64")
    dr = str(tmp_path / "d64")
    make_tiny_llama(t, hidden=256, heads=4, kv_heads=2, layers=2, seed=2)
    make_tiny_llama(dr, hidden=256, heads=4, kv_heads=2, layers=1, seed=5)
    kw = dict(model=t, draft=dr, speculate=True, speculate_k=2)
    assert _gen(dict(**kw, use_pallas=True)) == _gen(kw)


def test_async_ssd_pallas_tree_v3_route_token_exact(tmp_path):
    """Async SSD (glue -> fork -> tree build) through the hd=64 kernel
    route: B=2 sends tree attention to the NB-grouped v3 kernel."""
    t = str(tmp_path / "t64a")
    dr = str(tmp_path / "d64a")
    make_tiny_llama(t, hidden=256, heads=4, kv_heads=2, layers=2, seed=2)
    make_tiny_llama(dr, hidden=256, heads=4, kv_heads=2, layers=1, seed=5)
    kw = dict(model=t, draft=dr, speculate=True, draft_async=True,
              speculate_k=2, async_fan_out=2)
    assert _gen(dict(**kw, use_pallas=True)) == _gen(kw)
