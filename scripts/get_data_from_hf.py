"""Download + preprocess benchmark datasets to {"text": ...} jsonl files.

Parity: /root/reference/scripts/get_data_from_hf.py — each dataset becomes
SSD_DATASET_DIR/<name>.jsonl with one {"text": prompt} per line, capped at
10k rows, matching what bench_helpers.load_dataset_token_ids consumes.

Usage:
  python scripts/get_data_from_hf.py --datasets humaneval gsm8k
  python scripts/get_data_from_hf.py --all
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ssd_tpu.paths import DATASET_DIR  # noqa: E402

CAP = 10_000


def _rows(name: str):
    from datasets import load_dataset

    if name == "humaneval":
        ds = load_dataset("openai/openai_humaneval", split="test")
        for r in ds:
            yield r["prompt"]
    elif name == "alpaca":
        ds = load_dataset("tatsu-lab/alpaca", split="train")
        for r in ds:
            text = r["instruction"]
            if r.get("input"):
                text += "\n\n" + r["input"]
            yield text
    elif name == "gsm8k":
        ds = load_dataset("openai/gsm8k", "main", split="train")
        for r in ds:
            yield r["question"]
    elif name == "c4":
        ds = load_dataset("allenai/c4", "en", split="train", streaming=True)
        for r in ds:
            yield r["text"]
    elif name == "ultrafeedback":
        ds = load_dataset("HuggingFaceH4/ultrafeedback_binarized", split="train_prefs")
        for r in ds:
            yield r["prompt"]
    else:
        raise ValueError(f"unknown dataset {name}")


def main():
    names = ["humaneval", "alpaca", "gsm8k", "c4", "ultrafeedback"]
    p = argparse.ArgumentParser(description="Prepare benchmark datasets")
    p.add_argument("--datasets", nargs="+", choices=names, default=None)
    p.add_argument("--all", action="store_true")
    p.add_argument("--out-dir", default=DATASET_DIR)
    args = p.parse_args()

    chosen = names if args.all else (args.datasets or [])
    if not chosen:
        p.error("pass --datasets or --all")

    os.makedirs(args.out_dir, exist_ok=True)
    for name in chosen:
        out = os.path.join(args.out_dir, f"{name}.jsonl")
        n = 0
        with open(out, "w") as f:
            for text in _rows(name):
                if n >= CAP:
                    break
                f.write(json.dumps({"text": text}) + "\n")
                n += 1
        print(f"{name}: wrote {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
