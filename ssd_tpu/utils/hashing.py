"""Fast 64-bit content hashing for the prefix cache.

The reference uses the xxhash package (/root/reference/ssd/engine/block_manager.py:49-55).
Here the fast path is a native C++ XXH64 implementation (native/ssd_host.cpp)
loaded via ctypes; the fallback is blake2b truncated to 64 bits. Hashes only
need to be deterministic within one process, so the two paths never mix:
whichever is available at import time is used for the process lifetime.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ssd_tpu.utils.native import get_lib

_LIB = get_lib() or False


def hash64(data: bytes, seed: int = 0) -> int:
    if _LIB:
        return int(_LIB.ssd_xxh64(data, len(data), seed & 0xFFFFFFFFFFFFFFFF))
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def hash_tokens(token_ids: list[int], prefix: int = -1) -> int:
    """Chain-hash a block of token ids onto the previous block's hash.

    Mirrors reference block_manager.compute_hash semantics: the prefix hash is
    folded in as 8 little-endian bytes, then the token array bytes.
    """
    buf = b""
    if prefix != -1:
        buf += (prefix & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    buf += np.asarray(token_ids, dtype=np.int64).tobytes()
    return hash64(buf)
