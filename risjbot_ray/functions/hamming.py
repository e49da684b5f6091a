"""Shared Hamming-distance kernels for the banded near-dup pipelines
(text SimHash in ``pipelines/dedup.py``, perceptual media hashes in
``pipelines/multimodal.py``).

The exported pieces are:

- ``popcount64``: vectorized 64-bit popcount (SWAR; numpy<2 has no
  ``bitwise_count``).
- ``ham_pairs_recursive``: exact Hamming<=k pairs within one LSH
  bucket via recursive pigeonhole sub-banding — the defense against
  HOT buckets, where an all-pairs sweep is O(bucket^2).
- ``band_run_pairs``: the per-band driver — vectorized run-length
  bucket detection, batched triu pair enumeration for small buckets,
  recursion for hot ones, local (a, b) dedup.
"""

from __future__ import annotations

import numpy as np

#: leaf size below which all-pairs popcount is cheap
BRUTE_MAX = 512


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101))
            >> np.uint64(56)).astype(np.int64)


def _brute_bits(ids: np.ndarray, sig: np.ndarray, max_h: int,
                out: list, block: int = 1024) -> None:
    """Exact Hamming<=max_h pairs by BLOCKWISE all-pairs popcount —
    bounded-memory tiles, no triu_indices materialization (10^4 ids
    would need ~800 MB of index arrays), no recursion fan-out."""
    n = len(ids)
    for s in range(0, n, block):
        e = min(s + block, n)
        for s2 in range(s, n, 8 * block):
            e2 = min(s2 + 8 * block, n)
            ham = popcount64(sig[s:e, None] ^ sig[None, s2:e2])
            ai, bj = np.nonzero(ham <= max_h)
            gi, gj = ai + s, bj + s2
            m = gi < gj
            if m.any():
                a, b = ids[gi[m]], ids[gj[m]]
                out.append((np.minimum(a, b), np.maximum(a, b),
                            ham[ai[m], bj[m]]))


def ham_pairs_recursive(ids: np.ndarray, sig: np.ndarray, max_h: int,
                        free_mask: int, out: list) -> None:
    """Exact Hamming<=max_h pairs within a candidate set, by recursive
    pigeonhole: split the still-free bits into ``max_h + 1`` disjoint
    chunks — a qualifying pair differs in <= max_h free bits, so it
    matches at least one whole chunk and lands together in that
    chunk's sub-bucket. Recurse per sub-bucket with the chunk's bits
    pinned; brute-force small leaves. Duplicated emissions (a pair can
    match several chunks) are deduped by the caller.

    Same skew defenses as :func:`row_pairs_recursive`: chunk bits are
    ordered most-BALANCED first (a bit constant across the subset
    splits nothing — the signature shape structured corpora produce),
    and when even the best chunk leaves the largest sub-bucket near
    the parent's size, the subset takes :func:`_brute_bits`'
    deterministic blockwise floor instead of fanning out.

    This is what keeps HOT LSH buckets from going quadratic: a
    structured corpus routinely puts 10-15% of all items in one band
    bucket, and an all-pairs sweep there is O(bucket^2) popcounts.
    Sets that stay large with near-constant free bits ARE
    near-identical — their pairs are real output, so the brute floor
    is the true cost.
    """
    n = len(ids)
    if n < 2:
        return
    free_bits = [b for b in range(64) if (free_mask >> b) & 1]
    if n <= BRUTE_MAX or len(free_bits) < 2 * (max_h + 1):
        _brute_bits(ids, sig, max_h, out)
        return
    n_chunks = max_h + 1
    # most-balanced bits first: splitting power = min(#0s, #1s)
    ones = np.array([int(((sig >> np.uint64(b)) & np.uint64(1)).sum())
                     for b in free_bits])
    power = np.minimum(ones, n - ones)
    ordered = [free_bits[k] for k in np.argsort(-power, kind="stable")]
    plans = []
    best_largest = n
    for c in range(n_chunks):
        chunk_bits = ordered[c::n_chunks]
        cmask = np.uint64(sum(1 << b for b in chunk_bits))
        vals = sig & cmask
        order = np.argsort(vals, kind="stable")
        v_s = vals[order]
        starts = np.flatnonzero(np.r_[True, v_s[1:] != v_s[:-1]])
        ends = np.r_[starts[1:], n]
        best_largest = min(best_largest, int((ends - starts).max()))
        plans.append((cmask, order, starts, ends))
    if best_largest > 0.9 * n:
        _brute_bits(ids, sig, max_h, out)
        return
    for cmask, order, starts, ends in plans:
        for s, e in zip(starts, ends):
            if e - s > 1:
                sub = order[s:e]
                ham_pairs_recursive(ids[sub], sig[sub], max_h,
                                    free_mask & ~int(cmask), out)


def _brute_rows(ids: np.ndarray, sig: np.ndarray, max_d: int,
                out: list, block: int = 512) -> None:
    """Exact row-mismatch pairs by BLOCKWISE all-pairs comparison —
    O(n^2 P) byte ops in bounded-memory numpy tiles, with no
    recursion-tree fan-out. The floor the pigeonhole falls back to
    when splitting stops paying; deterministic cost ~n^2*P/10^9 s."""
    n = len(ids)
    for s in range(0, n, block):
        e = min(s + block, n)
        for s2 in range(s, n, 4 * block):
            e2 = min(s2 + 4 * block, n)
            d = (sig[s:e, None, :] != sig[None, s2:e2, :]) \
                .sum(axis=2)
            ai, bj = np.nonzero(d <= max_d)
            gi, gj = ai + s, bj + s2
            m = gi < gj
            if m.any():
                a, b = ids[gi[m]], ids[gj[m]]
                out.append((np.minimum(a, b), np.maximum(a, b),
                            d[ai[m], bj[m]]))


def row_pairs_recursive(ids: np.ndarray, sig: np.ndarray, max_d: int,
                        free_rows: list, out: list,
                        brute_max: int = BRUTE_MAX) -> None:
    """Exact pairs differing in <= ``max_d`` ROWS between (n, P) uint64
    signature matrices — the :func:`ham_pairs_recursive` pigeonhole
    generalized from bits to MinHash rows. A qualifying pair mismatches
    at most ``max_d`` of the rows, so among ``max_d + 1`` disjoint
    row-chunks at least one chunk matches WHOLE; group on each chunk's
    values and recurse per sub-bucket with that chunk pinned.
    (Exactness needs only that the chunks PARTITION the rows they do
    cover: mismatches over any row subset <= total mismatches, so one
    of max_d+1 chunks over that subset is still mismatch-free.)

    Two defenses keep boilerplate skew from degenerating: chunk rows
    are ordered by DISCRIMINATIVE POWER (distinct-count within the
    subset, descending) before round-robin assignment — a shared
    boilerplate block pins many MinHash rows to the corpus-wide
    minimum, and constant rows split nothing — and a NO-PROGRESS
    guard: when even the best chunk leaves the largest sub-bucket
    near the parent's size, the subset switches to
    :func:`_brute_rows`' blockwise floor instead of fanning out an
    exponential recursion tree over near-indistinguishable rows.

    This is the hot-bucket guard for the text-LSH pair paths: a
    boilerplate-heavy corpus drops 10^4+ docs into ONE band bucket, and
    enumerating its all-pairs there emits O(n^2) candidate rows that
    the downstream est>=threshold verify would mostly discard. The
    recursion emits only pairs that PASS the row-mismatch bound, so
    the final (verified) output is unchanged while the emitted volume
    tracks true duplicates. Emissions may repeat across chunks;
    callers dedupe. ``out`` collects (a, b, d) triples with a < b."""
    n = len(ids)
    if n < 2:
        return
    if n <= brute_max or len(free_rows) < 2 * (max_d + 1):
        _brute_rows(ids, sig, max_d, out)
        return
    n_chunks = max_d + 1
    # order rows most-discriminative first so round-robin chunks each
    # get splitting power; constant rows land harmlessly at the tail
    sub_all = sig[:, free_rows]
    distinct = np.array([len(np.unique(sub_all[:, k]))
                         for k in range(sub_all.shape[1])])
    ordered = [free_rows[k] for k in np.argsort(-distinct,
                                                kind="stable")]
    plans = []
    best_largest = n
    for c in range(n_chunks):
        chunk = ordered[c::n_chunks]
        sub = sig[:, chunk]
        order = np.lexsort(sub.T[::-1])
        ss = sub[order]
        neq = (ss[1:] != ss[:-1]).any(axis=1)
        starts = np.flatnonzero(np.r_[True, neq])
        ends = np.r_[starts[1:], n]
        largest = int((ends - starts).max())
        best_largest = min(best_largest, largest)
        plans.append((chunk, order, starts, ends))
    if best_largest > 0.9 * n:
        # splitting is not paying: the subset is near-uniform on every
        # chunk — take the deterministic quadratic floor now
        _brute_rows(ids, sig, max_d, out)
        return
    for chunk, order, starts, ends in plans:
        pinned = set(chunk)
        rest = [r for r in free_rows if r not in pinned]
        for s, e in zip(starts, ends):
            if e - s > 1:
                g = order[s:e]
                row_pairs_recursive(ids[g], sig[g], max_d, rest, out,
                                    brute_max)


def row_pairs_dedup(out: list) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate + (a, b)-dedupe :func:`row_pairs_recursive` output."""
    if not out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = np.concatenate([f[0] for f in out]).astype(np.int64)
    b = np.concatenate([f[1] for f in out]).astype(np.int64)
    if not len(a):
        return a, b
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    first = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    return a_s[first], b_s[first]


def band_run_pairs(ids: np.ndarray, keys: np.ndarray, sig: np.ndarray,
                   max_h: int, band_mask: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (a, b, hamming) pairs with equal ``keys`` and Hamming(sig)
    <= max_h, fully vectorized. ``band_mask`` is the 64-bit mask of
    the bits the band key was sliced from (already equal within a
    bucket, so excluded from the recursion's free set).

    Small buckets take a batched-triu + SWAR-popcount path (one numpy
    pass per distinct bucket LENGTH); buckets over ``BRUTE_MAX`` rows
    go through ``ham_pairs_recursive``. Output is (a, b)-deduplicated
    and a < b.
    """
    order = np.lexsort((ids, keys))
    ids_s, keys_s, sig_s = ids[order], keys[order], sig[order]
    n = len(ids_s)
    empty = (np.empty(0, np.int64),) * 3
    if n < 2:
        return empty
    starts = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])
    counts = np.diff(np.r_[starts, n])

    found: list = []
    a_parts, b_parts = [], []
    for length in np.unique(counts[counts > 1]):
        s = starts[counts == length]
        if length > BRUTE_MAX:
            for s0 in s:
                sub = slice(s0, s0 + int(length))
                ham_pairs_recursive(ids_s[sub], sig_s[sub], max_h,
                                    ((1 << 64) - 1) & ~band_mask, found)
            continue
        ti, tj = np.triu_indices(int(length), 1)
        a_parts.append((s[:, None] + ti[None, :]).ravel())
        b_parts.append((s[:, None] + tj[None, :]).ravel())
    if a_parts:
        ai = np.concatenate(a_parts)
        bi = np.concatenate(b_parts)
        ham = popcount64(sig_s[ai] ^ sig_s[bi])
        keep = ham <= max_h
        found.append((ids_s[ai[keep]], ids_s[bi[keep]], ham[keep]))
    if not found:
        return empty
    a_all = np.concatenate([f[0] for f in found]).astype(np.int64)
    b_all = np.concatenate([f[1] for f in found]).astype(np.int64)
    h_all = np.concatenate([f[2] for f in found]).astype(np.int64)
    if not len(a_all):   # every emission empty (all pairs filtered)
        return empty
    # the recursion can emit a pair once per matching chunk; dedupe
    # locally so duplicates never ride the exchange (lexsort, not id
    # packing — ids are full int64)
    order2 = np.lexsort((b_all, a_all))
    a_s, b_s, h_s = a_all[order2], b_all[order2], h_all[order2]
    first = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    return a_s[first], b_s[first], h_s[first]
