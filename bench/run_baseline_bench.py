"""Launch + benchmark an external baseline engine server with a matched
speculative config.

Parity: /root/reference/bench/run_{sglang,vllm}_bench.py — start the server as
a subprocess with a spec config matched to ours, poll /health until ready,
run the eval client, and kill the exact server process on exit
(run_vllm_bench.py:27-55). On TPU the natural baseline is vLLM's TPU backend
(`vllm serve` with PJRT); SGLang has no TPU backend, so `--engine sglang` is
accepted for CLI parity but only meaningful on a GPU host.

Usage:
  python -m bench.run_baseline_bench --engine vllm \
      --model meta-llama/Llama-3.1-8B-Instruct --draft meta-llama/Llama-3.2-1B-Instruct --k 6
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
import urllib.request


def parse_arguments():
    p = argparse.ArgumentParser(description="Run a baseline engine benchmark")
    p.add_argument("--engine", choices=["vllm", "sglang"], default="vllm")
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--draft", type=str, default=None)
    p.add_argument("--k", type=int, default=6)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--port", type=int, default=30000)
    p.add_argument("--numseqs", type=int, default=32)
    p.add_argument("--input_len", type=int, default=128)
    p.add_argument("--output_len", type=int, default=512)
    p.add_argument("--temp", type=float, default=0.0)
    p.add_argument("--timeout", type=int, default=600)
    return p.parse_args()


def server_command(args) -> list[str]:
    if args.engine == "vllm":
        cmd = ["vllm", "serve", args.model, "--port", str(args.port),
               "--tensor-parallel-size", str(args.tp)]
        if args.draft:
            spec = {"model": args.draft, "num_speculative_tokens": args.k,
                    "method": "draft_model"}
            cmd += ["--speculative-config", json.dumps(spec)]
        return cmd
    cmd = ["python", "-m", "sglang.launch_server", "--model-path", args.model,
           "--port", str(args.port), "--tp", str(args.tp)]
    if args.draft:
        cmd += ["--speculative-algorithm", "STANDALONE",
                "--speculative-draft-model-path", args.draft,
                "--speculative-num-steps", str(args.k),
                "--speculative-eagle-topk", "1",
                "--speculative-num-draft-tokens", str(args.k + 1)]
    return cmd


def wait_healthy(port: int, timeout: int) -> bool:
    deadline = time.time() + timeout
    url = f"http://localhost:{port}/health"
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(url, timeout=5) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(2)
    return False


def main():
    args = parse_arguments()
    if args.engine == "vllm" and shutil.which("vllm") is None:
        print("vllm is not installed on this host; install it or point "
              "bench.baseline_eval_client at a remote server.", flush=True)
        return 1

    cmd = server_command(args)
    print("launching:", " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd)
    try:
        if not wait_healthy(args.port, args.timeout):
            print("server did not become healthy in time", flush=True)
            return 1
        eval_cmd = [
            sys.executable, "-m", "bench.baseline_eval_client",
            "--url", f"http://localhost:{args.port}",
            "--model-id", args.model,
            "--numseqs", str(args.numseqs),
            "--input_len", str(args.input_len),
            "--output_len", str(args.output_len),
            "--temp", str(args.temp),
        ]
        return subprocess.call(eval_cmd)
    finally:
        # Kill the exact PID we started (never by pattern).
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    sys.exit(main())
