"""int8 KV cache (Config.kv_quant="int8"): the paged cache stores int8 rows
plus per-(token, head, K/V) f32 scales, halving attention's HBM reads at long
context (ops/attention.py; Pallas dequant in ops/pallas_attention.py).

Contracts pinned here:
 - quantization error is bounded (unit round-trip, attention closeness);
 - the implementation is EXACT against itself: jnp oracle == Pallas
   interpret-mode kernels token-for-token, and AR == sync SD == fused SD ==
   async SSD (the same context always quantizes to the same cache bytes, so
   determinism survives quantization even though HF-exactness does not).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu.llm import LLM
from ssd_tpu.sampling_params import SamplingParams
from tests.utils_models import make_tiny_llama

PROMPTS = [[1, 5, 9, 2, 7, 3, 11, 4], [4, 4, 8, 1], [2, 9, 9, 3, 6]]


def _quant_layer(rng, Hkv, S, hd):
    """A quantized cache layer holding `rng` values in the first S//2 slots."""
    from ssd_tpu.ops.attention import store_kv

    data = jnp.zeros((Hkv, S, 2 * hd), jnp.int8)
    scales = jnp.full((Hkv, 2, S), 1e-10, jnp.float32)
    T = S // 2
    k = jnp.asarray(rng.standard_normal((T, Hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, Hkv, hd)), jnp.float32) * 3.0
    slots = jnp.arange(T, dtype=jnp.int32)
    layer = store_kv((data, scales), k, v, slots)
    return layer, k, v, slots


def test_int8_roundtrip_error_bound():
    """store -> gather dequant reconstructs within the int8 step size
    (|x| <= amax => error <= amax/254 per element)."""
    from ssd_tpu.ops.attention import gather_pages

    rng = np.random.default_rng(0)
    Hkv, S, hd, bs = 2, 64, 16, 16
    layer, k, v, slots = _quant_layer(rng, Hkv, S, hd)
    bt = jnp.asarray([[0, 1, -1, -1]], jnp.int32)  # first 2 pages = slots 0..31
    kq, vq = gather_pages(layer, bt, bs, 32)       # [1, 32, Hkv, hd]
    want_k = np.asarray(k)[:32].transpose(0, 1, 2)
    got_k = np.asarray(kq)[0]
    amax = np.abs(np.asarray(k)[:32]).max(-1, keepdims=True)
    assert np.abs(got_k - want_k).max() <= (amax / 127.0).max() * 0.51 + 1e-7
    got_v = np.asarray(vq)[0]
    amax_v = np.abs(np.asarray(v)[:32]).max(-1, keepdims=True)
    assert np.abs(got_v - np.asarray(v)[:32]).max() <= (
        amax_v / 127.0
    ).max() * 0.51 + 1e-7


def test_int8_attention_close_to_fp():
    """Paged attention over the int8 cache tracks the fp cache closely."""
    from ssd_tpu.ops import attention as att

    rng = np.random.default_rng(1)
    Hkv, S, hd, bs = 2, 64, 16, 16
    layer, k, v, slots = _quant_layer(rng, Hkv, S, hd)
    fp = jnp.zeros((Hkv, S, 2 * hd), jnp.float32)
    fp = att.store_kv(fp, k, v, slots)
    q = jnp.asarray(rng.standard_normal((2, 1, 4, hd)), jnp.float32)
    bt = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
    ctx = jnp.asarray([20, 29], jnp.int32)
    o_fp = att.paged_attention(q, fp, bt, ctx, bs, 32, hd ** -0.5)
    o_i8 = att.paged_attention(q, layer, bt, ctx, bs, 32, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(o_i8), np.asarray(o_fp),
                               rtol=0.05, atol=0.05)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("kvq")
    # hidden 256 / 4 heads -> head_dim 64: the Pallas v3 kernel route.
    make_tiny_llama(d, hidden=256, layers=2, seed=0)
    return str(d)


def _engine(model, **kw):
    return LLM(model, dtype="float32", max_model_len=128,
               max_num_batched_tokens=512, kvcache_block_size=16,
               num_kvcache_blocks=48, max_num_seqs=4, seed=0,
               kv_quant="int8", **kw)


def test_int8kv_jnp_matches_pallas_interpret(ckpt):
    """AR decode, B=3 mixed lengths: the jnp dequant oracle and the int8 v3
    kernel (interpret mode) must agree token-for-token."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    outs = {}
    for name, kw in (("jnp", {"use_pallas": False}),
                     ("pallas", {"use_pallas": True})):
        eng = _engine(ckpt, **kw)
        o, _ = eng.generate([list(p) for p in PROMPTS], sp, use_tqdm=False)
        outs[name] = [x["token_ids"] for x in o]
    assert outs["jnp"] == outs["pallas"]


def test_int8kv_ar_vs_fused_sd_exact(ckpt):
    """Cross-mode determinism under quantization: AR and fused sync SD
    (self-draft) emit identical greedy tokens — the same context always
    quantizes to the same cache bytes."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    eng_ar = _engine(ckpt)
    want, _ = eng_ar.generate([list(p) for p in PROMPTS], sp, use_tqdm=False)
    eng_sd = _engine(ckpt, draft=ckpt, speculate=True, speculate_k=2,
                     spec_rounds=3)
    got, m = eng_sd.generate([list(p) for p in PROMPTS], sp, use_tqdm=False)
    assert [o["token_ids"] for o in got] == [o["token_ids"] for o in want]
    lens = m["accepted_suffix_lens_with_recovery"]
    assert lens and np.mean(lens) == 3.0  # full acceptance: draft == target


def test_int8kv_async_ssd_exact(ckpt):
    """The async tree path (tree_build_program over the int8 cache, tree v3
    kernel in interpret mode) matches AR token-for-token."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    eng_ar = _engine(ckpt)
    want, _ = eng_ar.generate([list(PROMPTS[0])], sp, use_tqdm=False)
    eng = _engine(ckpt, draft=ckpt, speculate=True, speculate_k=2,
                  draft_async=True, async_fan_out=2)
    got, _ = eng.generate([list(PROMPTS[0])], sp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]


def test_int8kv_fused_async_exact(ckpt):
    """The round-5 fused async superstep over the int8 cache (tree build +
    verify + in-program service all reading quantized pages) matches AR
    token-for-token — the cross-mode determinism contract extends to the
    new mode."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    eng_ar = _engine(ckpt)
    want, _ = eng_ar.generate([list(PROMPTS[0])], sp, use_tqdm=False)
    eng = _engine(ckpt, draft=ckpt, speculate=True, speculate_k=2,
                  draft_async=True, async_fused=True, spec_rounds=3,
                  async_fan_out=2)
    got, _ = eng.generate([list(PROMPTS[0])], sp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]


def test_int8kv_mxu_kernel_close_to_dequant():
    """kv_quant="int8_mxu" (native s8 x s8 MXU dots, q and p quantized
    in-register) must track the f32-dequant int8 kernel within the documented
    tolerance: q-quantization error ~ a bf16 cast (0.4% relative), p carries
    <= 1/254 absolute — the softmax-weighted output stays within a few
    percent of the dequant path."""
    from ssd_tpu.ops import pallas_attention as patt

    rng = np.random.default_rng(5)
    Hkv, S, hd, bs = 2, 256, 64, 64  # 2*hd = 128: the v3 lane constraint
    layer, k, v, slots = _quant_layer(rng, Hkv, S, hd)
    q = jnp.asarray(rng.standard_normal((2, 1, 8, hd)), jnp.float32)
    bt = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
    ctx = jnp.asarray([70, 110], jnp.int32)
    qeff = jnp.asarray([1, 1], jnp.int32)
    o_deq = patt.paged_attention_v3(
        q, layer, bt, ctx, qeff, bs, 128, hd ** -0.5, interpret=True)
    o_s8 = patt.paged_attention_v3(
        q, layer, bt, ctx, qeff, bs, 128, hd ** -0.5, interpret=True,
        s8=True)
    np.testing.assert_allclose(np.asarray(o_s8), np.asarray(o_deq),
                               rtol=0.05, atol=0.03)
    assert np.abs(np.asarray(o_s8)).max() > 0  # not a trivially-zero pass


def test_int8kv_mxu_engine_deterministic(ckpt):
    """The int8_mxu engine mode is approximate but DETERMINISTIC: two
    engines produce identical greedy outputs, and those outputs stay close
    to the bit-exact "int8" mode's (same prompts, same quantized cache
    bytes; only the attention arithmetic differs)."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    outs = []
    for _ in range(2):
        eng = LLM(ckpt, dtype="float32", max_model_len=128,
                  max_num_batched_tokens=512, kvcache_block_size=16,
                  num_kvcache_blocks=48, max_num_seqs=4, seed=0,
                  kv_quant="int8_mxu", use_pallas=True)
        o, _ = eng.generate([list(p) for p in PROMPTS], sp, use_tqdm=False)
        outs.append([x["token_ids"] for x in o])
    assert outs[0] == outs[1]
    assert all(len(t) == 12 for t in outs[0])


def test_int8kv_eagle_runs(ckpt, tmp_path):
    """EAGLE over an int8 target+draft cache completes and is deterministic
    (eagle3.eagle_forward slices the cache pytree via tree ops)."""
    from tests.utils_models import make_tiny_eagle

    d = str(tmp_path / "eagle")
    make_tiny_eagle(d, target_hidden=256, draft_hidden=256, seed=3)
    sp = SamplingParams(temperature=0.0, max_new_tokens=10, ignore_eos=True)
    outs = []
    for _ in range(2):
        eng = _engine(ckpt, draft=d, speculate=True, use_eagle=True,
                      draft_async=True, jit_speculate=True, speculate_k=2,
                      async_fan_out=2, eagle_layers=[0, 1, 1])
        o, _ = eng.generate([list(PROMPTS[0])], sp, use_tqdm=False)
        outs.append(o[0]["token_ids"])
        eng.exit()
    assert outs[0] == outs[1] and len(outs[0]) == 10
