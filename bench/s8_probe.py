"""Probe: does Mosaic support s8 x s8 -> s32 dot_general on this chip, and
what does it cost vs a bf16 dot at the v3 kernel's shapes?

Usage: python -m bench.s8_probe [--interpret]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel_s8(q_ref, k_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def _kernel_bf16(q_ref, k_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        q_ref[:], k_ref[:].astype(q_ref.dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("mode", "interpret", "iters"))
def run(q, k, mode="s8", interpret=False, iters=1):
    kern = _kernel_s8 if mode == "s8" else _kernel_bf16
    out_dt = jnp.int32 if mode == "s8" else jnp.float32
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((q.shape[0], q.shape[1], k.shape[1]),
                                       out_dt),
        interpret=interpret,
    )

    def body(i, acc):
        return acc + call(q, k).sum()

    return jax.lax.fori_loop(0, iters, body, jnp.zeros((), out_dt))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    # v3 kernel geometry: NBH=64 batched rows, QG=8 queries, bk=512 kv
    # positions, 2*hd=128 contraction.
    rng = np.random.default_rng(0)
    Nb, R, bk, hd2 = 64, 8, 512, 128
    q8 = jnp.asarray(rng.integers(-127, 127, (Nb, R, hd2)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (Nb, bk, hd2)), jnp.int8)
    qb = q8.astype(jnp.bfloat16)

    for mode, q, k in (("s8", q8, k8), ("bf16_cast", qb, k8)):
        try:
            out = run(q, k, mode=mode if mode == "s8" else "bf16",
                      interpret=args.interpret)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = run(q, k, mode=mode if mode == "s8" else "bf16",
                      interpret=args.interpret, iters=args.iters)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{mode}: OK  {dt*1e6:.1f} us/call  checksum={out}")
        except Exception as e:
            print(f"{mode}: FAILED  {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
