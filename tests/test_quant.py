"""Weight-only int8 quantization (utils/quant.py, beyond reference):
(x @ q) * s must equal x @ (q * s) up to float roundoff, engine modes must
stay token-exact against EACH OTHER under quantization (the exactness
contract is mode-to-mode), and scale shardings must survive a TP mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tpu import SamplingParams
from ssd_tpu.llm import LLM
from tests.utils_models import make_tiny_llama, random_prompt, rng


def _dequantized(params: dict) -> dict:
    """Reconstruct a plain float param tree from a quantized one."""
    out, layers = dict(params), dict(params["layers"])
    for name in list(layers):
        if name.endswith("_scale"):
            base = name[: -len("_scale")]
            w = layers[base].astype(jnp.float32)
            s = layers[name][..., None, :]  # out-channel scales
            layers[base] = w * s
            del layers[name]
    out["layers"] = layers
    for top in ("embed", "lm_head"):
        if top + "_scale" in out:
            out[top] = out[top].astype(jnp.float32) * out[top + "_scale"][:, None]
            del out[top + "_scale"]
    return out


@pytest.mark.parametrize("moe", [False, True])
def test_quantized_decode_matches_dequantized_reference(moe):
    from ssd_tpu.config import ModelConfig
    from ssd_tpu.engine.model_runner import decode_step
    from ssd_tpu.models.transformer import Arch, init_params
    from ssd_tpu.utils.quant import quantize_params

    mc = ModelConfig(model_type="qwen3_moe" if moe else "llama",
                     vocab_size=256, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     head_dim=16,
                     **(dict(num_experts=4, num_experts_per_tok=2,
                             moe_intermediate_size=96, norm_topk_prob=True)
                        if moe else {}),
                     max_position_embeddings=256, rope_theta=10000.0)
    arch = Arch.from_model_config(mc)
    qp = quantize_params(init_params(arch, jax.random.PRNGKey(0), jnp.float32))
    ref = _dequantized(qp)

    def run(params):
        kv = jnp.zeros((2, 2, 256, 32), jnp.float32)
        return decode_step(
            params, kv,
            jnp.array([7, 9], jnp.int32), jnp.array([0, 0], jnp.int32),
            jnp.array([0, 16], jnp.int32),
            jnp.asarray(np.pad([[0], [1]], ((0, 0), (0, 7)),
                               constant_values=-1)).astype(jnp.int32),
            jnp.array([1, 1], jnp.int32), jnp.zeros(2, jnp.float32),
            jax.random.PRNGKey(1),
            arch=arch, block_size=16, ctx_pad=64, q_len=1,
        )

    tq, lq, _, _ = run(qp)
    tr, lr, _, _ = run(ref)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lr),
                               rtol=2e-5, atol=2e-5)
    assert np.asarray(tq).tolist() == np.asarray(tr).tolist()


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("quant_m")
    make_tiny_llama(d, seed=0)
    return str(d)


def _engine(model_dir, **kw):
    return LLM(model_dir, quantization="int8", dtype="float32",
               max_model_len=256, max_num_batched_tokens=1024,
               kvcache_block_size=16, num_kvcache_blocks=64,
               max_num_seqs=4, **kw)


def test_quantized_modes_token_exact_vs_each_other(model_dir, tmp_path):
    """AR and fused sync SD over the SAME quantized weights must agree
    token-for-token (the engine's exactness contract holds regardless of
    what the weights are)."""
    prompts = [random_prompt(rng(61), 8, 20) for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)

    ar = _engine(model_dir)
    outs_ar, _ = ar.generate([list(p) for p in prompts], sp, use_tqdm=False)

    sd = _engine(model_dir, draft=model_dir, speculate=True, speculate_k=2,
                 spec_rounds=2)
    outs_sd, metrics = sd.generate([list(p) for p in prompts], sp,
                                   use_tqdm=False)
    assert [o["token_ids"] for o in outs_ar] == [o["token_ids"] for o in outs_sd]
    assert metrics["accepted_suffix_lens_with_recovery"]


def test_quantized_tp4_matches_single_device(model_dir):
    """Per-out-channel scales shard alongside their weights over the mesh."""
    prompts = [random_prompt(rng(63), 8, 16) for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    outs1, _ = _engine(model_dir).generate(
        [list(p) for p in prompts], sp, use_tqdm=False)
    outs4, _ = _engine(model_dir, num_devices=4).generate(
        [list(p) for p in prompts], sp, use_tqdm=False)
    assert [o["token_ids"] for o in outs1] == [o["token_ids"] for o in outs4]


def test_quantized_output_close_to_full_precision(model_dir):
    """int8 per-channel quantization of a tiny fp32 model should rarely
    change the greedy argmax (large-init test models have well-separated
    logits); require the first tokens to agree."""
    prompt = random_prompt(rng(65), 8, 16)
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    full = LLM(model_dir, dtype="float32", max_model_len=256,
               kvcache_block_size=16, num_kvcache_blocks=64, max_num_seqs=4)
    outs_f, _ = full.generate([list(prompt)], sp, use_tqdm=False)
    outs_q, _ = _engine(model_dir).generate([list(prompt)], sp, use_tqdm=False)
    assert outs_q[0]["token_ids"] == outs_f[0]["token_ids"]


def test_quantized_target_with_eagle_mode_exact(tmp_path):
    """EAGLE async SSD over an int8 target must match int8 AR token-for-token
    (the draft conditions on the quantized target's activations; acceptance
    may drop, exactness may not)."""
    from tests.utils_models import make_tiny_eagle

    t = str(tmp_path / "t")
    e = str(tmp_path / "e")
    make_tiny_llama(t, layers=6, seed=0)  # taps need layers 0/2/4
    make_tiny_eagle(e, seed=3)

    common = dict(dtype="float32", quantization="int8", max_model_len=256,
                  max_num_batched_tokens=1024, kvcache_block_size=16,
                  num_kvcache_blocks=96, max_num_seqs=4)
    prompt = random_prompt(rng(67), 8, 20)
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)

    ar = LLM(t, **common)
    want, _ = ar.generate([list(prompt)], sp, use_tqdm=False)

    eagle = LLM(t, draft=e, speculate=True, draft_async=True, use_eagle=True,
                jit_speculate=True, speculate_k=2, async_fan_out=3,
                eagle_layers=[0, 2, 4], **common)
    got, _ = eagle.generate([list(prompt)], sp, use_tqdm=False)
    eagle.exit()
    assert got[0]["token_ids"] == want[0]["token_ids"]


def test_quantized_fused_eagle_exact(tmp_path):
    """int8 weight-only now covers the EAGLE draft too (its full-vocab head
    is most of its per-step bytes); the fused EAGLE superstep over a fully
    quantized pair must still equal the quantized target's own AR output."""
    from tests.utils_models import make_tiny_eagle

    t = str(tmp_path / "t")
    e = str(tmp_path / "e")
    make_tiny_llama(t, layers=6, seed=0)
    make_tiny_eagle(e, seed=3)

    common = dict(dtype="float32", quantization="int8", max_model_len=256,
                  max_num_batched_tokens=1024, kvcache_block_size=16,
                  num_kvcache_blocks=96, max_num_seqs=4)
    prompt = random_prompt(rng(68), 8, 20)
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)

    ar = LLM(t, **common)
    want, _ = ar.generate([list(prompt)], sp, use_tqdm=False)

    fe = LLM(t, draft=e, speculate=True, use_eagle=True, speculate_k=2,
             spec_rounds=3, eagle_layers=[0, 2, 4], **common)
    got, _ = fe.generate([list(prompt)], sp, use_tqdm=False)
    assert got[0]["token_ids"] == want[0]["token_ids"]
