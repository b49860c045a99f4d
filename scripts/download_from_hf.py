"""Download benchmark model groups from HuggingFace Hub.

Parity: /root/reference/scripts/download_from_hf.py:6-57 — snapshot-download
named model groups into SSD_HF_CACHE.

Usage:
  python scripts/download_from_hf.py --group llama-small
  python scripts/download_from_hf.py --models meta-llama/Llama-3.1-8B-Instruct
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ssd_tpu.paths import HF_CACHE_DIR  # noqa: E402

MODEL_GROUPS = {
    "llama-small": ["meta-llama/Llama-3.2-1B-Instruct", "meta-llama/Llama-3.2-3B-Instruct"],
    "llama": ["meta-llama/Llama-3.1-8B-Instruct", "meta-llama/Llama-3.2-1B-Instruct"],
    "llama-70b": ["meta-llama/Llama-3.1-70B-Instruct", "meta-llama/Llama-3.2-1B-Instruct"],
    "qwen-small": ["Qwen/Qwen3-0.6B", "Qwen/Qwen3-1.7B"],
    "qwen": ["Qwen/Qwen3-8B", "Qwen/Qwen3-0.6B"],
    "qwen-32b": ["Qwen/Qwen3-32B", "Qwen/Qwen3-0.6B"],
}


def main():
    p = argparse.ArgumentParser(description="Download models from HF hub")
    p.add_argument("--group", choices=sorted(MODEL_GROUPS), default=None)
    p.add_argument("--models", nargs="+", default=None, help="explicit repo ids")
    p.add_argument("--cache-dir", default=HF_CACHE_DIR)
    args = p.parse_args()

    repos = list(args.models or [])
    if args.group:
        repos += MODEL_GROUPS[args.group]
    if not repos:
        p.error("pass --group or --models")

    from huggingface_hub import snapshot_download

    for repo in repos:
        print(f"downloading {repo} -> {args.cache_dir}", flush=True)
        snapshot_download(
            repo_id=repo,
            cache_dir=args.cache_dir,
            allow_patterns=["*.json", "*.safetensors", "*.model", "*.txt"],
        )


if __name__ == "__main__":
    sys.exit(main())
