"""Mixed-length prefill: flat-packed (one dispatch) vs grouped pow2 buckets.

The flat path's win is dispatch-count + padding on MIXED batches, which the
main bench's equal-length prompts never show — this CLI times a ragged batch
through the full engine both ways.

  python -m bench.prefill_bench                # 1B geometry on the chip
  python -m bench.prefill_bench --lens 64 200 333 512 960 1024
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lens", type=int, nargs="+",
                   default=[64, 96, 200, 333, 512, 700, 960, 1500])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tiny", action="store_true", help="CPU smoke geometry")
    args = p.parse_args()
    if args.tiny:
        # The JAX_PLATFORMS env var is clobbered by the TPU plugin wrapper,
        # so the CPU smoke must force the backend in-process (CLAUDE.md).
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.environ.setdefault("SSD_BENCH_TINY", "1" if args.tiny else "0")
    import numpy as np

    sys_argv_tiny = os.environ["SSD_BENCH_TINY"] == "1"
    model_dir = ("/tmp/ssd_bench_model_tiny" if sys_argv_tiny
                 else "/tmp/ssd_bench_model_llama1b")
    os.makedirs(model_dir, exist_ok=True)
    if not os.path.exists(os.path.join(model_dir, "config.json")):
        # Delegate config writing to the driver bench's main() geometry by
        # importing it is overkill; write the same 1B/tiny config here.
        cfg = {
            "model_type": "llama",
            "vocab_size": 512 if sys_argv_tiny else 128256,
            "hidden_size": 128 if sys_argv_tiny else 2048,
            "intermediate_size": 256 if sys_argv_tiny else 8192,
            "num_hidden_layers": 2 if sys_argv_tiny else 16,
            "num_attention_heads": 4 if sys_argv_tiny else 32,
            "num_key_value_heads": 2 if sys_argv_tiny else 8,
            "head_dim": 32 if sys_argv_tiny else 64,
            "max_position_embeddings": 4096,
            "rms_norm_eps": 1e-5,
            "rope_theta": 500000.0,
            "tie_word_embeddings": True,
            "eos_token_id": 2,
        }
        with open(os.path.join(model_dir, "config.json"), "w") as f:
            json.dump(cfg, f)

    from ssd_tpu.llm import LLM
    from ssd_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, 500, size=n).tolist() for n in args.lens]
    sp = SamplingParams(temperature=0.0, max_new_tokens=1, ignore_eos=True)

    results = {}
    for flat in (False, True):
        engine = LLM(
            model_dir, init_random=True, dtype="bfloat16",
            max_model_len=2048, max_num_batched_tokens=8192,
            max_num_seqs=len(prompts), kvcache_block_size=64,
            num_kvcache_blocks=max(64, 40 * len(prompts)),
            ctx_bucket_policy="single", flat_prefill=flat,
        )
        engine.generate([p[:] for p in prompts], sp, use_tqdm=False)  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            engine.generate([p[:] for p in prompts], sp, use_tqdm=False)
            best = min(best, time.perf_counter() - t0)
        results["flat" if flat else "grouped"] = round(best * 1e3, 2)
        engine.exit()

    print(json.dumps({
        "metric": "mixed_prefill_batch_ms",
        "lens": args.lens,
        **results,
        "speedup": round(results["grouped"] / results["flat"], 2),
    }))


if __name__ == "__main__":
    main()
