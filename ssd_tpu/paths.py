"""Environment-variable driven paths.

Parity: /root/reference/ssd/paths.py (SSD_HF_CACHE / SSD_DATASET_DIR env vars,
default model snapshot paths, dataset paths). CUDA-arch plumbing is dropped:
there is no TPU equivalent of TORCH_CUDA_ARCH_LIST.
"""

import os
from pathlib import Path

HF_CACHE_DIR = os.environ.get(
    "SSD_HF_CACHE", os.path.expanduser("~/.cache/huggingface/hub")
)
DATASET_DIR = os.environ.get(
    "SSD_DATASET_DIR", os.path.expanduser("~/data/datasets")
)


def _snapshot(repo: str) -> str:
    """Best-effort resolution of an HF-hub snapshot dir inside HF_CACHE_DIR."""
    base = Path(HF_CACHE_DIR) / f"models--{repo.replace('/', '--')}" / "snapshots"
    if base.is_dir():
        snaps = sorted(base.iterdir())
        if snaps:
            return str(snaps[-1])
    return repo  # fall through; Config asserts the dir exists


DEFAULT_TARGET = os.environ.get(
    "SSD_DEFAULT_TARGET", _snapshot("meta-llama/Llama-3.1-8B-Instruct")
)
DEFAULT_DRAFT = os.environ.get(
    "SSD_DEFAULT_DRAFT", _snapshot("meta-llama/Llama-3.2-1B-Instruct")
)

DATASET_PATHS = {
    name: os.path.join(DATASET_DIR, f"{name}.jsonl")
    for name in ("humaneval", "alpaca", "c4", "gsm8k", "ultrafeedback")
}
