"""Fork selection, sampler_x rescaling, glue ids, and tree-mask math.

Reference semantics: async_spec_helpers.py and mask_helpers.py.
"""

import numpy as np
import jax.numpy as jnp

from ssd_tpu.ops.spec_math import (
    apply_sampler_x_rescaling,
    compute_megaspec_lookahead,
    fan_index,
    get_forked_recovery_tokens,
    make_glue_input_ids,
    tree_attention_mask,
)


def test_megaspec_lookahead():
    assert compute_megaspec_lookahead(MQ_LEN=12, K=3) == 3 + 1 + 3 * 12


def test_glue_input_ids():
    draft = jnp.asarray([[1, 2], [3, 4]])
    rec = jnp.asarray([9, 8])
    out = np.asarray(make_glue_input_ids(draft, rec))
    assert out.tolist() == [9, 1, 2, 8, 3, 4]


def test_fan_index():
    assert fan_index([2, 1, 3]).tolist() == [0, 0, 1, 2, 2, 2]


def test_fork_selection_excludes_returned_token():
    K, V = 2, 16
    fan = [2, 2, 2]
    # Logits: token v has logit = v, so naive top-2 at each depth = [15, 14].
    logits = np.tile(np.arange(V, dtype=np.float32), (1, K + 1, 1))
    returned = np.array([[7, 15, 14]])  # rec=7; returned spec tokens 15, 14
    out = np.asarray(get_forked_recovery_tokens(
        jnp.asarray(logits), jnp.asarray([1]), jnp.asarray(returned), fan, fan
    ))
    # Depth 0: 15 excluded -> [14, 13]; depth 1: 14 excluded -> [15, 13];
    # depth 2 (last): nothing excluded -> [15, 14].
    assert out.tolist() == [[14, 13, 15, 13, 15, 14]]


def test_fork_selection_hit_vs_miss_counts():
    K, V = 1, 8
    fan_hit = [3, 1]
    fan_miss = [1, 3]
    logits = np.tile(np.arange(V, dtype=np.float32), (2, K + 1, 1))
    returned = np.array([[0, 7], [0, 7]])
    out = np.asarray(get_forked_recovery_tokens(
        jnp.asarray(logits), jnp.asarray([1, 0]), jnp.asarray(returned),
        fan_hit, fan_miss,
    ))
    # Hit row: depth0 top-3 excluding 7 -> [6,5,4]; depth1 top-1 -> [7].
    assert out[0].tolist() == [6, 5, 4, 7]
    # Miss row: depth0 top-1 excluding 7 -> [6]; depth1 top-3 -> [7,6,5].
    assert out[1].tolist() == [6, 7, 6, 5]


def test_sampler_x_rescaling():
    probs = jnp.asarray([[0.5, 0.3, 0.1, 0.1]])
    out = np.asarray(apply_sampler_x_rescaling(probs, sampler_x=2.0, F=1))
    # Top-2 = {0, 1} doubled: [1.0, 0.6, .1, .1] -> normalized.
    expected = np.array([1.0, 0.6, 0.1, 0.1])
    expected /= expected.sum()
    np.testing.assert_allclose(out[0], expected, rtol=1e-6)
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)


def reference_mask(prefix_len, step, fan_idx, K, MQ_LEN):
    """Direct construction mirroring reference mask_helpers.get_mask_iter_i:
    [ones(prefix) | glue tril rows | (step+1) identity diagonals]."""
    q = MQ_LEN
    prefix = np.ones((q, prefix_len), dtype=bool)
    tril = np.tril(np.ones((K + 1, K + 1), dtype=bool))
    glue = tril[fan_idx]  # [MQ_LEN, K+1]
    diags = [np.eye(q, dtype=bool) for _ in range(step + 1)]
    return np.concatenate([prefix, glue, *diags], axis=1)


def test_tree_mask_matches_reference_structure():
    K, fan = 2, [2, 1, 2]
    MQ_LEN = sum(fan)
    fidx = fan_index(fan)
    for step in range(K):
        prefix_len = 7
        ctx = prefix_len + (K + 1) + (step + 1) * MQ_LEN
        ctx_pad = ctx + 5
        got = np.asarray(tree_attention_mask(
            jnp.asarray([ctx]), step, jnp.asarray(fidx)[None], K, MQ_LEN, ctx_pad
        ))[0]
        ref = reference_mask(prefix_len, step, fidx, K, MQ_LEN)
        np.testing.assert_array_equal(got[:, :ctx], ref)
        assert not got[:, ctx:].any()  # padding is masked out


def test_tree_mask_batch_variable_context():
    K, fan = 1, [2, 2]
    MQ_LEN = 4
    fidx = np.tile(fan_index(fan), (2, 1))
    ctxs = np.array([10, 14])
    step = 1
    ctx_pad = 20
    got = np.asarray(tree_attention_mask(
        jnp.asarray(ctxs), step, jnp.asarray(fidx), K, MQ_LEN, ctx_pad
    ))
    for b in range(2):
        prefix_len = ctxs[b] - (K + 1) - (step + 1) * MQ_LEN
        ref = reference_mask(prefix_len, step, fan_index(fan), K, MQ_LEN)
        np.testing.assert_array_equal(got[b, :, :ctxs[b]], ref)
        assert not got[b, :, ctxs[b]:].any()


def test_small_topk_matches_lax_top_k():
    """The iterative-argmax fast path must select the exact lax.top_k
    indices (including lower-index-first tie order)."""
    import jax
    import jax.numpy as jnp

    from ssd_tpu.ops.spec_math import _small_topk_indices

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 5, 257)).astype(np.float32))
    # Force ties: duplicate some values.
    x = x.at[:, :, 100].set(x[:, :, 50])
    for k in (1, 2, 3, 4):
        want = jax.lax.top_k(x, k)[1]
        got = _small_topk_indices(x, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # Past the cutoff it IS lax.top_k.
    np.testing.assert_array_equal(
        np.asarray(_small_topk_indices(x, 9)),
        np.asarray(jax.lax.top_k(x, 9)[1]))
