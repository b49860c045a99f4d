"""EAGLE-3 exactness on real TPU hardware (round-1 VERDICT item 10).

Runs the full EAGLE async path (conditioned prefill -> packed glue -> tree
build -> verify) twice ON THE REAL CHIP with a synthetic EAGLE checkpoint —
once through the Pallas kernels and once through the jnp oracle ops — and
checks the result. The PASS gate is on-chip DETERMINISM of the Pallas path
(two identical runs) — the oracle agreement is reported per sequence but not
gated, because compiled pallas and compiled jnp reduce in different orders
and random-weight logit gaps sit inside that noise, flipping greedy argmax
ties (the same engine comparison is token-EXACT under identical arithmetic:
tests/test_pallas_engine_exact.py runs it on CPU with interpret-mode
kernels).

  python -m bench.eagle_tpu_check                 # orchestrates both runs
  python -m bench.eagle_tpu_check --worker tpu|tpu-oracle|cpu   # internal
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


def _worker(mode: str) -> None:
    import jax

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
        "eagle_tpu_pallas_deterministic": "PASS" if deterministic else "FAIL",
        "oracle_agreement_prefix_tokens": agree,
        "tokens_per_seq": [len(t) for t in results["pallas1"]["tokens"]],
        "pallas": results["pallas1"]["tokens"],
    }))
    return 0 if deterministic else 1


if __name__ == "__main__":
    sys.exit(main())
