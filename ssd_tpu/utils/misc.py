"""Small host utilities. Parity: /root/reference/ssd/utils/misc.py."""

from __future__ import annotations

import os


def infer_model_family(model_path: str) -> str:
    p = model_path.lower()
    if "llama" in p:
        return "llama"
    if "qwen" in p:
        return "qwen"
    return "unknown"


def load_tokenizer(model_path: str):
    """Best-effort HF tokenizer load; returns None when no tokenizer files
    exist (token-id-only workloads and unit tests)."""
    has_files = any(
        os.path.exists(os.path.join(model_path, f))
        for f in ("tokenizer.json", "tokenizer_config.json", "tokenizer.model")
    )
    if not has_files:
        return None
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_path, use_fast=True)


def decode_tokens(token_ids: list[int], tokenizer) -> list[str]:
    out = []
    for token in token_ids:
        try:
            out.append(tokenizer.decode([token], skip_special_tokens=False))
        except Exception:
            out.append(f"<token_id:{token}>")
    return out
