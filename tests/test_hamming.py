"""Shared Hamming kernels (functions/hamming.py): popcount, recursive
pigeonhole hot-bucket pairing, and the band driver — each checked
against brute force, plus simhash_near_pairs end-to-end parity."""

import numpy as np

from risjbot_ray.functions.hamming import (BRUTE_MAX, band_run_pairs,
                                           ham_pairs_recursive,
                                           popcount64)


def _brute(ids, sig, max_h):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(sig[i]) ^ int(sig[j])).count("1") <= max_h:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out.add((a, b))
    return out


def test_popcount64_matches_python_bin():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**63, 1000).astype(np.uint64)
    x[:3] = [0, 1, (1 << 64) - 1]
    exp = np.array([bin(int(v)).count("1") for v in x])
    assert (popcount64(x) == exp).all()


def test_recursive_equals_brute_force_on_clustered_hashes():
    """Hot-bucket shape: many hashes share low bands; the recursion
    must return EXACTLY the brute-force pair set."""
    rng = np.random.default_rng(2)
    n = 1500                      # > BRUTE_MAX so recursion engages
    assert n > BRUTE_MAX
    base = np.uint64(0x0123456789ABCDEF)
    sig = np.full(n, base, np.uint64)
    # flip 0-8 random bits per item -> plenty of pairs within <=3
    for i in range(n):
        for b in rng.integers(0, 64, int(rng.integers(0, 9))):
            sig[i] ^= np.uint64(1) << np.uint64(b)
    ids = np.arange(n, dtype=np.int64)
    out: list = []
    ham_pairs_recursive(ids, sig, 3, (1 << 64) - 1, out)
    got = set()
    for a, b, h in out:
        for x, y, hh in zip(a, b, h):
            assert bin(int(sig[x]) ^ int(sig[y])).count("1") == hh <= 3
            got.add((int(x), int(y)))
    assert got == _brute(ids, sig, 3)


def test_band_run_pairs_mixed_hot_and_cold_buckets():
    rng = np.random.default_rng(3)
    n = 2000
    sig = rng.integers(0, 2**63, n).astype(np.uint64)
    # force a HOT bucket on band 0 (low 16 bits identical) for 60% of
    # rows, and plant near-identical pairs inside and outside it
    hot = rng.random(n) < 0.6
    sig[hot] = (sig[hot] & ~np.uint64(0xFFFF)) | np.uint64(0xBEEF)
    sig[10] = sig[11] ^ (np.uint64(0b101) << np.uint64(20))  # ham 2
    sig[20] = sig[21]                             # ham 0
    ids = np.arange(n, dtype=np.int64)
    keys = (sig & np.uint64(0xFFFF)).astype(np.int64)
    a, b, h = band_run_pairs(ids, keys, sig, 3, 0xFFFF)
    got = {(int(x), int(y)) for x, y in zip(a, b)}
    # brute force restricted to equal band keys
    exp = set()
    for i in range(n):
        for j in range(i + 1, n):
            if keys[i] == keys[j] and bin(
                    int(sig[i]) ^ int(sig[j])).count("1") <= 3:
                exp.add((i, j))
    assert got == exp
    assert (10, 11) in got and (20, 21) in got
    # a < b and no duplicates by construction
    assert (a < b).all() and len(got) == len(a)


def test_simhash_near_pairs_parity_with_brute_force(ray_session):

    from risjbot_ray.pipelines.dedup import (simhash_near_pairs,
                                             simhash_signatures)

    sf = "/root/testdata/sf0.001"
    sigs = simhash_signatures(sf).to_pandas()
    sig = sigs["simhash"].to_numpy().astype(np.int64).astype(np.uint64)
    ids = sigs["doc_id"].to_numpy().astype(np.int64)
    # LSH ground truth: ham<=3 AND sharing at least one 16-bit band
    exp = set()
    for i in range(len(ids)):
        x = sig[i + 1:] ^ sig[i]
        ham = popcount64(x)
        share = np.zeros(len(x), bool)
        for b in range(4):
            m = np.uint64(0xFFFF) << np.uint64(16 * b)
            share |= (x & m) == 0
        for off in np.nonzero((ham <= 3) & share)[0]:
            a_id, b_id = sorted((int(ids[i]), int(ids[i + 1 + off])))
            exp.add((a_id, b_id))
    got_df = simhash_near_pairs(sf).to_pandas()
    got = {(int(r.a), int(r.b)) for r in got_df.itertuples()}
    assert got == exp


def test_ham_pairs_skewed_hot_set_bounded_and_exact():
    """A near-degenerate hot set (most free bits constant — the
    structured-corpus shape) must resolve through the balanced-bit
    ordering / blockwise brute floor with output equal to a direct
    blockwise reference, without materializing O(n^2) index arrays."""
    import numpy as np

    from risjbot_ray.functions.hamming import (_brute_bits,
                                               ham_pairs_recursive,
                                               popcount64)
    rng = np.random.default_rng(9)
    n = 3000
    base = np.uint64(0x5A5A5A5A5A5A5A5A)
    # only 6 low bits vary; everything else constant across the set
    sig = base ^ rng.integers(0, 64, size=n).astype(np.uint64)
    ids = np.arange(n, dtype=np.int64)
    out: list = []
    ham_pairs_recursive(ids, sig, 2, (1 << 64) - 1, out)
    got = set()
    for a, b, _h in out:
        got.update(zip(a.tolist(), b.tolist()))
    ref_out: list = []
    _brute_bits(ids, sig, 2, ref_out)
    ref = set()
    for a, b, _h in ref_out:
        ref.update(zip(a.tolist(), b.tolist()))
    assert got == ref and len(ref) > 0
