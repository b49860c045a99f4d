"""Native host-runtime library: XXH64 vs the reference xxhash package, and
C input-prep vs the numpy fallback."""

import os

import numpy as np
import pytest

from ssd_tpu.utils import native


def test_native_lib_builds_and_loads():
    assert native.get_lib() is not None, "native/ssd_host.cpp failed to build"


def test_xxh64_matches_reference():
    xxhash = pytest.importorskip("xxhash")
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(0)
    for n in (0, 1, 4, 7, 8, 31, 32, 33, 100, 1000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for seed in (0, 123456789):
            assert lib.ssd_xxh64(data, len(data), seed) == xxhash.xxh64_intdigest(data, seed)


def test_hash_tokens_stable():
    from ssd_tpu.utils.hashing import hash_tokens

    a = hash_tokens([1, 2, 3], prefix=-1)
    b = hash_tokens([1, 2, 3], prefix=a)
    assert a != b
    assert hash_tokens([1, 2, 3], prefix=-1) == a


def test_prepare_multi_query_matches_fallback(monkeypatch):
    rng = np.random.default_rng(1)
    B, q_len, M, block_size, B_pad = 3, 4, 8, 16, 4
    tails = rng.integers(0, 100, (B, q_len)).astype(np.int32)
    num_tokens = np.asarray([20, 33, 16], np.int32)
    bt = np.full((B_pad, M), -1, np.int32)
    for b in range(B):
        n = (num_tokens[b] + block_size - 1) // block_size + 1
        bt[b, :n] = rng.permutation(20)[:n]

    got = native.prepare_multi_query(tails, num_tokens, bt, q_len, block_size, B_pad)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    want = native.prepare_multi_query(tails, num_tokens, bt, q_len, block_size, B_pad)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_prepare_prefill_matches_fallback(monkeypatch):
    bt = np.asarray([3, 7, 1, -1, -1], np.int32)
    got = native.prepare_prefill(bt, 5, 30, 16, 32)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    want = native.prepare_prefill(bt, 5, 30, 16, 32)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
