"""bench CLI helper units: draft-size resolution and dataset tokenization."""

import json
import os

import pytest

from bench.bench_helpers import load_dataset_token_ids, resolve_draft_path


def test_resolve_draft_path_dir(tmp_path):
    d = tmp_path / "draft"
    d.mkdir()
    (d / "config.json").write_text("{}")
    assert resolve_draft_path(str(d)) == str(d)


def test_resolve_draft_path_bad_size():
    with pytest.raises(ValueError, match="neither"):
        resolve_draft_path("999")


def test_dataset_loader_skips_empty_rows(tmp_path, monkeypatch):
    import bench.bench_helpers as bh
    from tests.utils_models import make_tiny_llama

    model_dir = tmp_path / "m"
    make_tiny_llama(model_dir)
    data = tmp_path / "fake.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({"text": ""}) + "\n")
        f.write(json.dumps({"text": "hello world"}) + "\n")
    monkeypatch.setitem(bh.DATASET_PATHS, "fake", str(data))

    # Tiny llama ships no tokenizer files -> loader returns None gracefully.
    got = load_dataset_token_ids("fake", str(model_dir), 4, 8)
    assert got is None or all(len(p) > 0 for p in got)


def test_dataset_loader_missing_file_returns_none():
    assert load_dataset_token_ids("nonexistent", "/tmp", 4, 8) is None
