"""Shared digest-shuffle kernels.

Sort exchanges over wide string keys (hex md5, raw digests) are
pathologically slow in Ray 2.49's sort shuffle; every dedup-style
pipeline here therefore ships a 128-bit digest as TWO int64 columns
plus a coarse int bucket key, sorts only the bucket ints, and resolves
exact digests vectorized inside each bucket. This module is the one
home for that packing so bucket sizing / endianness can never drift
between pipelines (exact dedup, curation dedup, tile dedup, HLL exact
check)."""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np

DIGEST_NB = 1024  # default coarse bucket count for digest exchanges


def pack_digests(digests: bytes | Iterable[bytes]) -> np.ndarray:
    """Pack concatenated (or iterable) 16-byte digests into an (n, 2)
    int64 array — big-endian halves, order-preserving."""
    if not isinstance(digests, (bytes, bytearray)):
        digests = b"".join(digests)
    if not digests:
        return np.empty((0, 2), dtype=np.int64)
    return (np.frombuffer(digests, dtype=">u8").reshape(-1, 2)
            .astype(np.uint64).view(np.int64))


def md5_pack(texts: Iterable[str | None]) -> np.ndarray:
    """md5 each text ('' for None) and pack to (n, 2) int64."""
    return pack_digests(
        b"".join(hashlib.md5((t or "").encode("utf-8")).digest()
                 for t in texts))


def bucket_of(h_hi: np.ndarray, nbuckets: int = DIGEST_NB) -> np.ndarray:
    """Coarse exchange bucket for packed digest rows."""
    return h_hi % nbuckets
