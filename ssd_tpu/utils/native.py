"""Loader for the native host-runtime library (native/ssd_host.cpp).

Builds build/libssd_host.so on first use if the toolchain is available
(`make -C native`); every entry point has a pure-Python/numpy fallback so the
engine works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "build", "libssd_host.so")
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        src = os.path.join(_REPO, "native", "ssd_host.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["make", "-C", os.path.join(_REPO, "native")],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ssd_xxh64.restype = ctypes.c_uint64
    lib.ssd_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ssd_prepare_multi_query.restype = None
    lib.ssd_prepare_multi_query.argtypes = [
        i32p, i32p, i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
        i32p, i32p, i32p, i32p,
    ]
    lib.ssd_prepare_prefill.restype = None
    lib.ssd_prepare_prefill.argtypes = [
        i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p,
    ]
    _lib = lib
    return _lib


def prepare_multi_query(tail_tokens: np.ndarray, num_tokens: np.ndarray,
                        block_tables: np.ndarray, q_len: int, block_size: int,
                        B_pad: int):
    """Batched decode/verify input prep; returns (input_ids, positions,
    slot_map, context_lens) int32 arrays. C fast path with numpy fallback."""
    B = tail_tokens.shape[0]
    lib = get_lib()
    input_ids = np.empty(B_pad * q_len, np.int32)
    positions = np.empty(B_pad * q_len, np.int32)
    slot_map = np.empty(B_pad * q_len, np.int32)
    context_lens = np.empty(B_pad, np.int32)
    if lib is not None:
        lib.ssd_prepare_multi_query(
            np.ascontiguousarray(tail_tokens, np.int32),
            np.ascontiguousarray(num_tokens, np.int32),
            np.ascontiguousarray(block_tables, np.int32),
            B, q_len, block_tables.shape[1], block_size, B_pad,
            input_ids, positions, slot_map, context_lens,
        )
        return input_ids, positions, slot_map, context_lens

    input_ids[:] = 0
    positions[:] = 0
    slot_map[:] = -1
    context_lens[:] = 1
    pos = (num_tokens[:, None] - q_len + np.arange(q_len)[None, :])  # [B, q]
    blk = np.take_along_axis(
        block_tables[:B], pos // block_size, axis=1
    )
    slots = np.where(blk < 0, -1, blk * block_size + pos % block_size)
    input_ids[: B * q_len] = tail_tokens.reshape(-1)
    positions[: B * q_len] = pos.reshape(-1)
    slot_map[: B * q_len] = slots.reshape(-1)
    context_lens[:B] = num_tokens
    return input_ids, positions, slot_map, context_lens


def prepare_prefill(block_table: np.ndarray, cached: int, n_new: int,
                    block_size: int, s_pad: int):
    """Single-seq prefill positions + slots (C fast path, numpy fallback)."""
    lib = get_lib()
    positions = np.empty(s_pad, np.int32)
    slot_map = np.empty(s_pad, np.int32)
    if lib is not None:
        lib.ssd_prepare_prefill(
            np.ascontiguousarray(block_table, np.int32),
            cached, n_new, block_size, s_pad, positions, slot_map,
        )
        return positions, slot_map
    positions[:] = 0
    slot_map[:] = -1
    p = cached + np.arange(n_new)
    blk = block_table[p // block_size]
    positions[:n_new] = p
    slot_map[:n_new] = np.where(blk < 0, -1, blk * block_size + p % block_size)
    return positions, slot_map
