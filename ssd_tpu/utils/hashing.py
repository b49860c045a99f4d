"""Fast 64-bit content hashing for the prefix cache.

The reference uses the xxhash package (/root/reference/ssd/engine/block_manager.py:49-55).
Here the fast path is a native C++ XXH64 implementation (native/ssd_host.cpp)
loaded via ctypes; the fallback is blake2b truncated to 64 bits. Hashes only
need to be deterministic within one process, so the two paths never mix:
whichever is available at FIRST USE is used for the process lifetime. The
native-library probe (which may shell out to `make`) is deferred to that
first call so importing this module stays side-effect free.
"""

from __future__ import annotations

import hashlib

import numpy as np

_LIB = None  # None = not probed yet; False = probed, unavailable


def hash64(data: bytes, seed: int = 0) -> int:
    global _LIB
    if _LIB is None:
        from ssd_tpu.utils.native import get_lib

        _LIB = get_lib() or False
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
