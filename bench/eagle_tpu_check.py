"""EAGLE-3 exactness on real TPU hardware (round-1 VERDICT item 10).

Two GATED assertions on the real chip, plus a reported token comparison:

1. KERNEL NUMERICS (gated): the hd=64 manual-DMA kernels the EAGLE path
   exercises (paged decode/verify, tree attention) must match the jnp
   oracle on identical fp32 inputs to reduction tolerance (`--worker
   kernels`). This is the hard on-chip correctness assertion.
2. DETERMINISM (gated): two identical Pallas e2e runs must emit identical
   tokens.
3. Oracle token agreement (reported, not gated): compiled pallas and
   compiled jnp reduce in different orders and random-weight logit gaps sit
   inside that noise, flipping greedy argmax ties — so e2e token equality
   is not assertable here (the same engine comparison IS token-exact under
   identical arithmetic: tests/test_pallas_engine_exact.py, CPU
   interpret-mode kernels). With gate 1 passing, any token divergence is
   attributable to ties, not kernel bugs.

  python -m bench.eagle_tpu_check                 # orchestrates all phases
  python -m bench.eagle_tpu_check --worker tpu|tpu-oracle|cpu|kernels
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _build_checkpoints(base: str) -> tuple[str, str]:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from utils_models import make_tiny_eagle, make_tiny_llama

    target = os.path.join(base, "target")
    draft = os.path.join(base, "eagle")
    if not os.path.exists(os.path.join(draft, "config.json")):
        os.makedirs(base, exist_ok=True)
        # hidden 256 / 4 heads -> head_dim 64, so the on-chip run exercises
        # the manual-DMA kernel route (paged v2/v3 + tree v2) that the
        # default hd=16 tiny models never reach.
        make_tiny_llama(target, hidden=256, layers=6, seed=0)
        make_tiny_eagle(draft, target_hidden=256, draft_hidden=256, seed=3)
    return target, draft


def _kernel_gate() -> None:
    """GATED on-chip numeric correctness of the hd=64 manual-DMA kernels the
    EAGLE path exercises: paged decode/verify and tree attention vs the jnp
    oracle on identical fp32 inputs must agree to fp32 reduction tolerance.
    This is the hard assertion the e2e token comparison cannot be (argmax
    ties under random weights flip between any two compiled programs);
    run as `--worker kernels` on the real chip."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ssd_tpu.ops import attention as att
    from ssd_tpu.ops import pallas_attention as patt

    assert jax.default_backend() == "tpu", "kernel gate needs the real chip"
    B, Hq, Hkv, hd = 4, 4, 2, 64
    block_size, n_blocks = 16, 64
    ctx_pad = 128
    scale = hd ** -0.5
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal(
        (Hkv, n_blocks * block_size, 2 * hd)).astype(np.float32))
    bt = np.full((B, ctx_pad // block_size), -1, np.int32)
    for b in range(B):
        bt[b, :4] = rng.permutation(n_blocks)[:4]
    bt = jnp.asarray(bt)
    ctx = jnp.asarray(np.array([33, 17, 64, 50], np.int32))

    for Q, label in ((1, "decode"), (4, "verify")):
        q = jnp.asarray(rng.standard_normal((B, Q, Hq, hd)).astype(np.float32))
        got = jax.jit(lambda q, kv: patt.paged_attention_best(
            q, kv, bt, ctx, jnp.full((B,), Q, jnp.int32),
            block_size, ctx_pad, scale))(q, kv)
        want = jax.jit(lambda q, kv: att.paged_attention(
            q, kv, bt, ctx, block_size, ctx_pad, scale))(q, kv)
        # Both paths run the TPU's default multi-pass-bf16 f32 matmuls
        # with different reduction structures (~1e-2 relative); real kernel
        # bugs (mask/layout/dequant) are O(1) errors.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2,
            err_msg=f"paged {label} kernel disagrees with the jnp oracle "
                    f"on-chip")
        print(f"[kernel gate] paged {label} (Q={Q}) OK", flush=True)

    K, MQ = 3, 8
    fan = jnp.asarray(
        np.tile(np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32), (B, 1)))
    for s in (0, K - 1):
        q = jnp.asarray(rng.standard_normal((B, MQ, Hq, hd)).astype(np.float32))
        got = jax.jit(lambda q, kv: patt.tree_attention_best(
            q, kv, bt, ctx, fan, s, K, block_size, ctx_pad, scale))(q, kv)
        want = jax.jit(lambda q, kv: att.tree_attention(
            q, kv, bt, ctx, fan, s, K, block_size, ctx_pad, scale))(q, kv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2,
            err_msg=f"tree kernel (step {s}) disagrees with the jnp oracle "
                    f"on-chip")
        print(f"[kernel gate] tree step {s} OK", flush=True)
    print("EAGLE_KERNELS PASS", flush=True)


def _worker(mode: str) -> None:
    import jax

    if mode == "kernels":
        _kernel_gate()
        return
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    target, draft = _build_checkpoints("/tmp/ssd_eagle_check_hd64")
    use_pallas = None if mode != "tpu-oracle" else False

    from ssd_tpu.llm import LLM
    from ssd_tpu.sampling_params import SamplingParams

    engine = LLM(
        target,
        draft=draft,
        speculate=True,
        use_eagle=True,
        draft_async=True,
        jit_speculate=True,
        speculate_k=3,
        async_fan_out=2,
        use_pallas=use_pallas,
        eagle_layers=[0, 2, 4],
        dtype="float32",
        max_model_len=128,
        max_num_batched_tokens=512,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_seqs=2,
        seed=0,
    )
    prompts = [[1, 5, 9, 2, 7, 3], [4, 4, 8, 1]]
    outs, _ = engine.generate(
        prompts,
        SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True),
        use_tqdm=False,
    )
    print("EAGLE_TOKENS " + json.dumps(
        {"backend": jax.default_backend(),
         "tokens": [o["token_ids"] for o in outs]}
    ), flush=True)
    engine.exit()


def main() -> int:
    if "--worker" in sys.argv:
        _worker(sys.argv[sys.argv.index("--worker") + 1])
        return 0

    # Phase 0 (GATED): on-chip numeric kernel correctness vs the jnp oracle.
    r = subprocess.run(
        [sys.executable, "-m", "bench.eagle_tpu_check", "--worker", "kernels"],
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    kernels_pass = r.returncode == 0 and "EAGLE_KERNELS PASS" in r.stdout
    print(r.stdout.strip(), flush=True)
    assert kernels_pass, (
        f"on-chip kernel gate failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    )

    results = {}
    for name, mode in (("oracle", "tpu-oracle"), ("pallas1", "tpu"),
                       ("pallas2", "tpu")):
        r = subprocess.run(
            [sys.executable, "-m", "bench.eagle_tpu_check", "--worker", mode],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.join(os.path.dirname(__file__), ".."),
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("EAGLE_TOKENS")]
        assert r.returncode == 0 and line, (
            f"{name} run failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
        )
        results[name] = json.loads(line[0][len("EAGLE_TOKENS "):])
        assert results[name]["backend"] == "tpu", (
            f"{name} worker fell back to " + results[name]["backend"]
        )
        print(f"[{name}] ok", flush=True)

    deterministic = results["pallas1"]["tokens"] == results["pallas2"]["tokens"]

    def prefix(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    agree = [
        prefix(a, b) for a, b in
        zip(results["oracle"]["tokens"], results["pallas1"]["tokens"])
    ]
    print(json.dumps({
        "eagle_tpu_kernel_numerics": "PASS",  # asserted above
        "eagle_tpu_pallas_deterministic": "PASS" if deterministic else "FAIL",
        "oracle_agreement_prefix_tokens": agree,
        "tokens_per_seq": [len(t) for t in results["pallas1"]["tokens"]],
        "pallas": results["pallas1"]["tokens"],
    }))
    return 0 if deterministic else 1


if __name__ == "__main__":
    sys.exit(main())
