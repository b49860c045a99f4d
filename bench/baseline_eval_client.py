"""HTTP eval client for external baseline servers (vLLM / SGLang / any
OpenAI-compatible engine).

Parity: /root/reference/bench/{sglang,vllm}_eval_client.py — drives the same
prompts through a server's completions API and reports decode + end-to-end
tok/s so baseline numbers are measured identically to ours
(sglang_eval_client.py:82-113). Pure stdlib (threads + urllib): no aiohttp
dependency in the TPU image.

Usage:
  python -m bench.baseline_eval_client --url http://localhost:8000 \
      --model-id meta-llama/Llama-3.1-8B-Instruct --numseqs 32 --output_len 512
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from random import randint, seed


def parse_arguments():
    p = argparse.ArgumentParser(description="Eval an external baseline server")
    p.add_argument("--url", type=str, required=True)
    p.add_argument("--model-id", type=str, default="default")
    p.add_argument("--numseqs", type=int, default=32)
    p.add_argument("--input_len", type=int, default=128)
    p.add_argument("--output_len", type=int, default=512)
    p.add_argument("--temp", type=float, default=0.0)
    p.add_argument("--concurrency", type=int, default=1)
    p.add_argument("--prompts-file", type=str, default=None,
                   help='jsonl with {"text": ...} rows (random tokens otherwise)')
    return p.parse_args()


def one_request(args, prompt):
    body = json.dumps({
        "model": args.model_id,
        "prompt": prompt,
        "temperature": args.temp,
        "max_tokens": args.output_len,
        "ignore_eos": True,
        "stream": True,
    }).encode()
    req = urllib.request.Request(
        args.url.rstrip("/") + "/v1/completions",
        data=body, headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    ttft, n = None, 0
    with urllib.request.urlopen(req) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data:") or line.endswith("[DONE]"):
                continue
            chunk = json.loads(line[5:])
            text = chunk["choices"][0].get("text", "")
            if text:
                if ttft is None:
                    ttft = time.perf_counter() - t0
                n += 1  # streamed chunks ~ tokens with stream=True
    return {"ttft": ttft or 0.0, "n_chunks": n, "total": time.perf_counter() - t0}


def main():
    args = parse_arguments()
    seed(0)

    if args.prompts_file:
        prompts = []
        with open(args.prompts_file) as f:
            for line in f:
                if len(prompts) >= args.numseqs:
                    break
                prompts.append(json.loads(line)["text"])
    else:
        # Token-id prompts: servers accept token arrays on /v1/completions.
        prompts = [
            [randint(10, 10000) for _ in range(args.input_len)]
            for _ in range(args.numseqs)
        ]

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.concurrency) as ex:
        results = list(ex.map(lambda pr: one_request(args, pr), prompts))
    wall = time.perf_counter() - t0

    n_total = sum(r["n_chunks"] for r in results)
    mean_ttft = sum(r["ttft"] for r in results) / len(results)
    # Decode throughput against WALL clock (minus the mean prefill ramp): the
    # old sum-of-per-request-times * concurrency formula overstated whenever
    # requests didn't fully overlap. n_chunks approximates token counts
    # (1 SSE chunk ~= 1 token for the servers we target).
    print(json.dumps({
        "server": args.url,
        "numseqs": len(prompts),
        "output_tokens_approx_chunks": n_total,
        "end_to_end_tok_s": round(n_total / wall, 2),
        "decode_tok_s": round(n_total / max(wall - mean_ttft, 1e-9), 2),
        "mean_ttft_s": round(mean_ttft, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
