#!/usr/bin/env python
"""Flat-prefill kernel tile sweep at the 1B T=2048 geometry (on-chip)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from ssd_tpu.ops.pallas_attention import flat_prefill_attention

T, Hq, Hkv, hd, bs = 2048, 32, 8, 64, 64
n_pages = T // bs
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((T, Hq, hd)) * 0.05, jnp.bfloat16)
kv = jnp.asarray(rng.standard_normal((Hkv, (n_pages + 4) * bs, 2 * hd)) * 0.05,
                 jnp.bfloat16)
pages = jnp.arange(n_pages, dtype=jnp.int32)
row_lo = jnp.zeros(T, jnp.int32)
row_hi = jnp.arange(T, dtype=jnp.int32) + 1
R = 32

def run(tq, tk):
    @jax.jit
    def f(q, kv):
        def body(c, i):
            o = flat_prefill_attention(q + c * 0, kv, pages, row_lo, row_hi,
                                       bs, hd ** -0.5, tq=tq, tk=tk)
            return c + o[0, 0, 0] * 1e-9, o[0, 0, :2]
        _, outs = jax.lax.scan(body, jnp.bfloat16(0), jnp.arange(R))
        return outs
    np.asarray(f(q, kv))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(q, kv))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / R

for tq in (256, 512, 1024):
    for tk in (256, 512, 1024, 2048):
        try:
            ms = run(tq, tk)
            print(f"tq={tq:5d} tk={tk:5d}: {ms:7.3f} ms/call", flush=True)
        except Exception as e:
            print(f"tq={tq:5d} tk={tk:5d}: FAIL {type(e).__name__}", flush=True)
