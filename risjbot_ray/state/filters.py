"""Approximate-membership filters for the URL-seen set.

The north rule calls for a sharded cuckoo-filter URL-seen set with a bloom
pre-filter (BASELINE.json north_star; the reference's exact sqlite B-tree,
refetchcontrol.py:102-115, is the behavior being scaled out). Both filters
are numpy-backed, mergeable/serializable, and keyed by the 20-byte sha1 URL
fingerprint (urlnorm.url_fingerprint), from which all hash values derive —
no re-hashing on the hot path.

Sizing at design scale: 10^10 keys / 64 shards ≈ 1.6e8 keys per shard;
a cuckoo filter at 16-bit fingerprints, 4-way buckets, 95% load ≈ 0.34 GB
per shard — distributable across a 256-node cluster. The bloom snapshot is
small enough (1-2 bits... ~10 bits/key) to broadcast to workers each wave
as the "definitely new" fast path that avoids actor round-trips.
"""

from __future__ import annotations

import numpy as np


def _key_words(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split N x 20 sha1 bytes into two independent uint64 lanes."""
    assert keys.dtype == np.uint8 and keys.ndim == 2 and keys.shape[1] >= 16
    h1 = keys[:, 0:8].copy().view(np.uint64).reshape(-1)
    h2 = keys[:, 8:16].copy().view(np.uint64).reshape(-1)
    return h1, h2


def keys_to_array(keys: list[bytes]) -> np.ndarray:
    """list of 20-byte sha1 digests -> (N, 20) uint8 array."""
    return np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)


class BloomFilter:
    """Standard k-hash bloom over a power-of-two bit array (double hashing:
    h1 + i*h2, Kirsch-Mitzenmacher)."""

    def __init__(self, n_bits: int = 1 << 23, k: int = 4):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = _key_words(keys)
        idx = np.empty((self.k, len(h1)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) & np.uint64(self.n_bits - 1)
        return idx

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).reshape(-1)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        out = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.k):
            p = pos[i]
            word = self.bits[(p >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (p & np.uint64(63))) & np.uint64(1) != 0
        return out

    def merge(self, other: "BloomFilter") -> None:
        assert self.n_bits == other.n_bits and self.k == other.k
        self.bits |= other.bits

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int = 4) -> "BloomFilter":
        arr = np.frombuffer(data, dtype=np.uint64).copy()
        f = cls.__new__(cls)
        f.n_bits = len(arr) * 64
        f.k = k
        f.bits = arr
        return f


class CuckooFilter:
    """4-way bucketed cuckoo filter with 16-bit fingerprints.

    Supports insert / contains / delete (delete is what bloom can't do —
    needed for the agelimit trim, refetchcontrol.py:180-193). Partial-key
    cuckoo hashing: alt_bucket = bucket XOR hash(fingerprint).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 16):
        assert n_buckets & (n_buckets - 1) == 0
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0

    def _fp_and_buckets(self, keys: np.ndarray):
        h1, h2 = _key_words(keys)
        fp = (h2 & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 = empty slot sentinel
        b1 = (h1 & np.uint64(self.n_buckets - 1)).astype(np.int64)
        # alt bucket derived only from (b1, fp) so it's computable at kick
        b2 = self._alt(b1, fp)
        return fp, b1, b2

    def _alt(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # multiply-shift hash of the fingerprint
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.n_buckets - 1)
        return (b ^ h.astype(np.int64)) & (self.n_buckets - 1)

    def _insert_one(self, fp: int, b1: int, b2: int) -> bool:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # kick loop
        rng = np.random.default_rng(fp * 2654435761 + b1)  # deterministic
        b = b1
        cur = np.uint16(fp)
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(self.SLOTS))
            cur, self.table[b, slot] = self.table[b, slot].copy(), cur
            b = int(self._alt(np.array([b]), np.array([cur],
                                                     dtype=np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # table full — caller should resize shard count

    def insert(self, keys: np.ndarray) -> int:
        fp, b1, b2 = self._fp_and_buckets(keys)
        ok = 0
        for i in range(len(fp)):
            ok += self._insert_one(int(fp[i]), int(b1[i]), int(b2[i]))
        return ok

    def contains(self, keys: np.ndarray) -> np.ndarray:
        fp, b1, b2 = self._fp_and_buckets(keys)
        fp64 = fp[:, None]
        return ((self.table[b1] == fp64).any(axis=1)
                | (self.table[b2] == fp64).any(axis=1))

    def delete(self, keys: np.ndarray) -> int:
        fp, b1, b2 = self._fp_and_buckets(keys)
        removed = 0
        for i in range(len(fp)):
            for b in (int(b1[i]), int(b2[i])):
                row = self.table[b]
                hit = np.nonzero(row == fp[i])[0]
                if len(hit):
                    row[hit[0]] = 0
                    self.count -= 1
                    removed += 1
                    break
        return removed

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        arr = np.frombuffer(data, dtype=np.uint16).copy()
        f = cls.__new__(cls)
        f.SLOTS = cls.SLOTS
        f.MAX_KICKS = cls.MAX_KICKS
        f.n_buckets = len(arr) // cls.SLOTS
        f.table = arr.reshape(f.n_buckets, cls.SLOTS)
        f.count = int((f.table != 0).sum())
        return f
