"""Sampler tests: greedy fast path, temperature sampling distribution,
sampler_x tree rescaling."""

import numpy as np
import jax
import jax.numpy as jnp

from ssd_tpu.ops.sampler import sample


def test_greedy_rows():
    logits = jnp.asarray([[0.0, 5.0, 1.0], [3.0, 0.0, 0.0]])
    out = sample(logits, jnp.asarray([0.0, 0.0]), jax.random.PRNGKey(0))
    assert np.asarray(out).tolist() == [1, 0]


def test_mixed_greedy_and_sampled():
    logits = jnp.asarray([[0.0, 50.0, 0.0], [0.0, 50.0, 0.0]])
    out = sample(logits, jnp.asarray([0.0, 1.0]), jax.random.PRNGKey(0))
    # With such a peaked distribution both rows should emit token 1.
    assert np.asarray(out).tolist() == [1, 1]


def test_sampling_distribution():
    # Two tokens with 2:1 probability ratio at temp=1.
    logits = jnp.log(jnp.asarray([[2.0, 1.0, 1e-9]]))
    counts = np.zeros(3)
    for s in range(400):
        out = sample(logits, jnp.asarray([1.0]), jax.random.PRNGKey(s))
        counts[int(np.asarray(out)[0])] += 1
    frac = counts / counts.sum()
    assert abs(frac[0] - 2 / 3) < 0.08
    assert counts[2] == 0


def test_temperature_sharpens():
    logits = jnp.log(jnp.asarray([[4.0, 1.0]]))
    hot = sum(
        int(np.asarray(sample(logits, jnp.asarray([2.0]), jax.random.PRNGKey(s)))[0])
        for s in range(300)
    )
    cold = sum(
        int(np.asarray(sample(logits, jnp.asarray([0.25]), jax.random.PRNGKey(s)))[0])
        for s in range(300)
    )
    # Lower temperature concentrates on argmax (token 0) => fewer token-1 picks.
    assert cold < hot
