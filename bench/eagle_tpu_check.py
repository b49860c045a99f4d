"""EAGLE-3 exactness on real TPU hardware (round-1 VERDICT item 10).

Runs the full EAGLE async path (conditioned prefill -> packed glue -> tree
build -> verify) twice ON THE REAL CHIP with a synthetic EAGLE checkpoint —
once through the Pallas kernels and once through the jnp oracle ops — and
asserts greedy token-for-token agreement. (CPU-vs-TPU would compare different
matmul arithmetic and can diverge on argmax ties; same-chip pallas-vs-oracle
isolates exactly the kernels.)

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
        make_tiny_llama(target, layers=6, seed=0)
        make_tiny_eagle(draft, seed=3)
    return target, draft


def _worker(mode: str) -> None:
    import jax

    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    target, draft = _build_checkpoints("/tmp/ssd_eagle_check")
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
    for mode in ("tpu-oracle", "tpu"):
        r = subprocess.run(
            [sys.executable, "-m", "bench.eagle_tpu_check", "--worker", mode],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.join(os.path.dirname(__file__), ".."),
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("EAGLE_TOKENS")]
        assert r.returncode == 0 and line, (
            f"{mode} run failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
        )
        results[mode] = json.loads(line[0][len("EAGLE_TOKENS "):])
        print(f"[{mode}] backend={results[mode]['backend']} ok", flush=True)

    for mode in ("tpu-oracle", "tpu"):
        assert results[mode]["backend"] == "tpu", (
            f"{mode} worker fell back to " + results[mode]["backend"]
        )
    match = results["tpu-oracle"]["tokens"] == results["tpu"]["tokens"]
    print(json.dumps({
        "eagle_tpu_exactness": "PASS" if match else "FAIL",
        "tpu_oracle": results["tpu-oracle"]["tokens"],
        "tpu_pallas": results["tpu"]["tokens"],
    }))
    return 0 if match else 1


if __name__ == "__main__":
    sys.exit(main())
