"""verify() exactness tests — greedy accept/mismatch logic, ratio acceptance
gating by cache hits, and recovery-distribution properties.

Reference semantics: /root/reference/ssd/utils/verify.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssd_tpu.ops.verify import verify, build_suffixes

V = 32


def logits_for(tokens, V=V, scale=10.0):
    """[S] token ids -> [S, V] logits whose argmax is those tokens."""
    out = np.zeros((len(tokens), V), dtype=np.float32)
    for i, t in enumerate(tokens):
        out[i, t] = scale
    return out


def run_verify(logits_p, logits_q, specs, tt, tq, hits=None, **kw):
    key = jax.random.PRNGKey(0)
    acc, rec = verify(
        jnp.asarray(logits_p), jnp.asarray(logits_q), jnp.asarray(specs),
        jnp.asarray(tt, dtype=jnp.float32), jnp.asarray(tq, dtype=jnp.float32),
        None if hits is None else jnp.asarray(hits),
        key, **kw,
    )
    return np.asarray(acc), np.asarray(rec)


def test_greedy_full_accept():
    K = 3
    # Draft proposed [5,6,7]; target argmax at each position agrees, and
    # position K predicts 9 as the bonus/recovery token.
    specs = np.array([[4, 5, 6, 7]])
    logits_p = logits_for([5, 6, 7, 9])[None]
    logits_q = np.random.default_rng(0).normal(size=(1, K, V)).astype(np.float32)
    acc, rec = run_verify(logits_p, logits_q, specs, [0.0], [0.0])
    assert acc[0] == K
    assert rec[0] == 9
    sufs, _ = build_suffixes(specs, acc)
    assert sufs == [[4, 5, 6, 7]]


def test_greedy_first_mismatch():
    K = 3
    specs = np.array([[4, 5, 6, 7]])
    # Target agrees on 5, disagrees at position 1 (predicts 8, draft said 6).
    logits_p = logits_for([5, 8, 7, 9])[None]
    logits_q = np.zeros((1, K, V), dtype=np.float32)
    acc, rec = run_verify(logits_p, logits_q, specs, [0.0], [0.0])
    assert acc[0] == 1
    assert rec[0] == 8  # recovery = target argmax at the mismatch position
    sufs, _ = build_suffixes(specs, acc)
    assert sufs == [[4, 5]]


def test_greedy_immediate_mismatch():
    specs = np.array([[4, 5, 6, 7]])
    logits_p = logits_for([9, 9, 9, 9])[None]
    logits_q = np.zeros((1, 3, V), dtype=np.float32)
    acc, rec = run_verify(logits_p, logits_q, specs, [0.0], [0.0])
    assert acc[0] == 0 and rec[0] == 9
    sufs, _ = build_suffixes(specs, acc)
    assert sufs == [[4]]


def test_cache_miss_rows_fall_back_to_greedy():
    """temp>0 rows that were cache MISSES must use greedy acceptance, not
    ratio acceptance (the proposals did not come from q)."""
    K = 2
    specs = np.array([[4, 5, 6]])
    logits_p = logits_for([5, 6, 9], scale=50.0)[None]  # deterministic-ish p
    # Draft logits that would reject under ratio (q puts all mass elsewhere).
    logits_q = logits_for([1, 1], scale=50.0)[None]
    acc, _ = run_verify(logits_p, logits_q, specs, [1.0], [1.0], hits=[0])
    # Greedy acceptance accepts both tokens despite q disagreement.
    assert acc[0] == K


def test_cache_hit_rows_use_ratio():
    K = 2
    specs = np.array([[4, 5, 6]])
    # p puts ~zero mass on draft tokens -> ratio path must reject at 0.
    logits_p = logits_for([1, 1, 1], scale=50.0)[None]
    logits_q = logits_for([5, 6], scale=50.0)[None]
    acc, _ = run_verify(logits_p, logits_q, specs, [1.0], [1.0], hits=[1])
    assert acc[0] == 0


def test_jit_speculate_forces_ratio_on_all_rows():
    K = 2
    specs = np.array([[4, 5, 6]])
    logits_p = logits_for([1, 1, 1], scale=50.0)[None]
    logits_q = logits_for([5, 6], scale=50.0)[None]
    acc, _ = run_verify(
        logits_p, logits_q, specs, [1.0], [1.0], hits=[0], jit_speculate=True
    )
    assert acc[0] == 0


def test_recovery_sampled_from_residual():
    """On rejection with temp>0, recovery ~ norm(max(0, p-q)): tokens where
    q >= p must never be sampled."""
    K = 1
    rng = np.random.default_rng(1)
    specs = np.array([[4, 5]])
    # p: uniform over {0..7}, zero elsewhere; q: all mass on {5}. After
    # rejection at 0, the residual removes token 5 entirely.
    logits_p = np.full((1, 2, V), -1e9, dtype=np.float32)
    logits_p[0, :, :8] = 5.0
    logits_q = logits_for([5], scale=50.0)[None]
    recs = set()
    for s in range(50):
        key = jax.random.PRNGKey(s)
        acc, rec = verify(
            jnp.asarray(logits_p), jnp.asarray(logits_q), jnp.asarray(specs),
            jnp.asarray([1.0]), jnp.asarray([1.0]), jnp.asarray([1]), key,
        )
        if int(acc[0]) == 0:
            recs.add(int(rec[0]))
    assert recs  # some rejections occurred
    assert 5 not in recs
    assert all(r < 8 for r in recs)


def test_batch_mixed_temps():
    K = 2
    specs = np.array([[4, 5, 6], [4, 5, 6]])
    logits_p = np.stack([logits_for([5, 6, 9], scale=50.0)] * 2)
    logits_q = np.stack([logits_for([5, 6], scale=50.0)] * 2)
    acc, rec = run_verify(logits_p, logits_q, specs, [0.0, 1.0], [0.0, 1.0], hits=[1, 1])
    assert acc[0] == K and rec[0] == 9
    # Row 1: hit + agreement between p and q -> ratio accepts everything.
    assert acc[1] == K


def test_acceptance_rate_statistics():
    """Identical p == q with temp 1 must accept each token w.p. ~1 (ratio=1)."""
    K = 4
    B = 64
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(B, K + 1, V)).astype(np.float32)
    specs = np.concatenate(
        [np.full((B, 1), 3), rng.integers(0, V, size=(B, K))], axis=1
    )
    acc, _ = run_verify(logits, logits[:, :K], specs, [1.0] * B, [1.0] * B, hits=[1] * B)
    assert np.all(acc == K)


def test_output_distribution_equals_target():
    """The exactness theorem: with draft tokens sampled from q and verify()'s
    accept/recovery rule, the distribution of the first emitted token equals
    the target distribution p exactly (rejection-sampling correctness,
    reference verify.py:51-167)."""
    import jax
    import jax.numpy as jnp

    from ssd_tpu.ops.verify import verify

    V, K, N = 8, 1, 20000
    rng_np = np.random.default_rng(0)
    logits_p = jnp.asarray(rng_np.normal(size=(1, K + 1, V)).astype(np.float32))
    logits_q = jnp.asarray(rng_np.normal(size=(1, K, V)).astype(np.float32))
    p = np.asarray(jax.nn.softmax(logits_p[0, 0]))
    q = np.asarray(jax.nn.softmax(logits_q[0, 0]))
    temps = jnp.ones(1, jnp.float32)
    hits = jnp.ones(1, jnp.int64)

    def one_trial(key):
        k_draft, k_verify = jax.random.split(key)
        draft_tok = jax.random.categorical(k_draft, logits_q[0, 0])
        spec = jnp.stack([jnp.int32(0), draft_tok.astype(jnp.int32)])[None, :]
        accept, recovery = verify(
            logits_p, logits_q, spec, temps, temps, hits, k_verify
        )
        return jnp.where(accept[0] >= 1, draft_tok, recovery[0])

    keys = jax.random.split(jax.random.PRNGKey(42), N)
    emitted = np.asarray(jax.vmap(one_trial)(keys))
    emp = np.bincount(emitted, minlength=V) / N
    tv = 0.5 * np.abs(emp - p).sum()
    assert tv < 0.02, f"total variation {tv:.4f}: emitted dist != target p"
    # Sanity: the draft distribution is NOT p (the test would be vacuous).
    assert 0.5 * np.abs(q - p).sum() > 0.1
