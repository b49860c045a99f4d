"""Draft-side stateless invariants (reference ssd/utils/async_helpers/tests.py).

The strongest one (tests.py:68-126): the glue decode re-processes the
[recovery | spec] tokens the draft just returned, at the same positions with
the same KV — so glue logits at depth j must equal the chain logits that
produced spec_j. This pins the glue geometry (positions, slots, causal mask)
against the chain program."""

import numpy as np
import pytest

import jax.numpy as jnp

from ssd_tpu.config import Config
from ssd_tpu.engine.draft_runner import DraftRunner, SpecRequest


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    import json

    d = tmp_path_factory.mktemp("draft_inv_model")
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": 128, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "max_position_embeddings": 512, "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0, "eos_token_id": 2,
        }, f)
    cfg = Config(
        str(d), speculate=True, draft=str(d), draft_async=True,
        jit_speculate=True, speculate_k=3, async_fan_out=2, dtype="float32",
        max_model_len=256, kvcache_block_size=16, num_kvcache_blocks=64,
        max_num_batched_tokens=1024,
    )
    draft_cfg = cfg.create_draft_config()
    draft_cfg.num_kvcache_blocks = 64
    return DraftRunner(draft_cfg, hf_config=cfg.draft_hf_config, init_random=True)


def test_glue_logits_match_chain_logits(runner):
    rng = np.random.default_rng(0)
    B, K = 2, runner.K
    prompts = [rng.integers(3, 128, 20).tolist(), rng.integers(3, 128, 13).tolist()]
    bt = np.full((B, runner.max_blocks), -1, dtype=np.int32)
    bt[0, :3] = [0, 1, 2]
    bt[1, :3] = [3, 4, 5]
    runner.prefill_from_payload(prompts, bt)

    # Spec request: recovery token appended -> num_tokens = len + 1.
    keys = np.asarray(
        [[0, -2, 7], [1, -2, 9]], dtype=np.int64
    )
    req = SpecRequest(
        cache_keys=keys,
        num_tokens=np.asarray([21, 14], dtype=np.int64),
        block_tables=bt,
        temperatures=np.zeros(B, np.float32),
    )
    resp = runner.service(req)  # cache empty -> jit chain, real logits
    assert not resp.cache_hits.any()

    runner.reset_tree_cache()
    runner.build_tree(req, resp)

    glue = np.asarray(runner._last_glue_logits)[:B]      # [B, K+1, V]
    chain = np.asarray(resp.logits_q)[:B]                # [B, K, V]
    np.testing.assert_allclose(glue[:, :K], chain, rtol=2e-4, atol=2e-4)

    # And the tree cache must hold one entry per (depth, fork) with K tokens.
    MQ = runner.MQ_LEN
    assert runner.tree_cache_keys.shape == (B * MQ, 3)
    assert runner.tree_cache_tokens.shape == (B * MQ, K)
    fan = np.repeat(np.arange(K + 1), runner.fan_out_list[0])
    np.testing.assert_array_equal(runner.tree_cache_keys[:MQ, 1], fan)
