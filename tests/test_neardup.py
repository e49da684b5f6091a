"""Planted-duplicate tests for the near-dup operators VERDICT r1 flagged
as unverified: embedding_neardup_pairs must surface a planted cosine
near-duplicate (and not sub-threshold pairs); ngram_jaccard_pairs must
verify planted text near-duplicates with exact Jaccard values, without
re-running LSH when candidates are supplied."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from risjbot_ray.pipelines import dedup


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("planted")
    rng = np.random.default_rng(7)
    dim = 16
    vecs = rng.standard_normal((40, dim))
    # plant: 41 ~= 1 (tiny perturbation, cosine > 0.99), 42 ~= 2 at a
    # moderate angle (cosine ~0.97), 43 vs 3 well below threshold
    v41 = vecs[1] + 0.01 * rng.standard_normal(dim)
    u2 = vecs[2] / np.linalg.norm(vecs[2])
    orth = rng.standard_normal(dim)
    orth -= (orth @ u2) * u2
    orth /= np.linalg.norm(orth)
    v42 = np.linalg.norm(vecs[2]) * (0.97 * u2 + np.sqrt(1 - 0.97**2) * orth)
    v43 = vecs[3] + 2.0 * rng.standard_normal(dim)
    all_vecs = np.vstack([vecs, v41[None], v42[None], v43[None]])
    ids = list(range(40)) + [41, 42, 43]
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist()
                               for v in all_vecs],
                              pa.list_(pa.float32())),
    }), str(root / "embeddings.parquet"))

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "editors review the morning bulletin about harbour traffic "
            "and municipal budget negotiations in the city assembly")
    docs = []
    for i in range(30):
        docs.append((i, f"document number {i} " + base + f" variant {i}"))
    # plant: 100 identical to 0; 101 near-identical to 1 (one word edit);
    # 102 unrelated
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1].replace("harbour", "airport")))
    docs.append((102, "completely different text with no overlap at all "
                      "regarding astronomy telescopes and nebulae"))
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    }), str(root / "documents.parquet"))
    return str(root), all_vecs, ids, dict(docs)


def _exact_jaccard(xa: str, xb: str, k: int = 3) -> float:
    sa = dedup._shingle_hashes(xa, k)
    sb = dedup._shingle_hashes(xb, k)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def test_embedding_neardup_finds_planted_pairs(ray_session, planted_dir):
    root, all_vecs, ids, _ = planted_dir
    out = dedup.embedding_neardup_pairs(root, threshold=0.95)
    pairs = {(r["a"], r["b"]): r["cosine"] for r in out.to_pylist()}
    assert (1, 41) in pairs and pairs[(1, 41)] > 0.99
    assert (2, 42) in pairs and 0.95 < pairs[(2, 42)] < 0.99
    # verified cosines match exact float64 computation to the 5dp rounding
    unit = all_vecs / np.linalg.norm(all_vecs, axis=1, keepdims=True)
    # parquet stores float32 embeddings; recompute from the stored values
    f32 = all_vecs.astype(np.float32).astype(np.float64)
    f32u = f32 / np.linalg.norm(f32, axis=1, keepdims=True)
    idx = {v: i for i, v in enumerate(ids)}
    for (a, b), c in pairs.items():
        exact = float(f32u[idx[a]] @ f32u[idx[b]])
        assert abs(c - round(exact, 5)) < 1e-9
        assert exact >= 0.95
    # nothing below threshold sneaks in
    assert (3, 43) not in pairs


def test_embedding_neardup_empty_result_is_typed(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([v.tolist() for v in
                               rng.standard_normal((20, 8))
                               .astype(np.float32)],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = dedup.embedding_neardup_pairs(str(tmp_path), threshold=0.95)
    assert out.num_rows == 0
    assert out.schema.equals(dedup._NEARDUP_SCHEMA)


def test_ngram_jaccard_finds_planted_pairs(ray_session, planted_dir):
    root, _, _, text_of = planted_dir
    out = dedup.ngram_jaccard_pairs(root, threshold=0.5)
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in out.to_pylist()}
    assert pairs.get((0, 100)) == 1.0
    assert (1, 101) in pairs
    exp = _exact_jaccard(text_of[1], text_of[101])
    assert 0.5 <= exp < 1.0
    assert abs(pairs[(1, 101)] - round(exp, 5)) < 1e-9
    assert not any(102 in p for p in pairs)


def test_ngram_jaccard_accepts_candidate_pairs(ray_session, planted_dir):
    """Supplying candidates must skip LSH and verify exactly those."""
    root, _, _, text_of = planted_dir
    cands = pa.table({"a": pa.array([0, 1, 5], pa.int64()),
                      "b": pa.array([100, 101, 102], pa.int64())})
    out = dedup.ngram_jaccard_pairs(root, threshold=0.0, candidates=cands)
    got = {(r["a"], r["b"]): r["jaccard"] for r in out.to_pylist()}
    assert set(got) == {(0, 100), (1, 101), (5, 102)}
    for (a, b), j in got.items():
        assert abs(j - round(_exact_jaccard(text_of[a], text_of[b]), 5)) \
            < 1e-9

    empty = dedup.ngram_jaccard_pairs(
        root, candidates=pa.table({"a": pa.array([], pa.int64()),
                                   "b": pa.array([], pa.int64())}))
    assert empty.num_rows == 0
    assert empty.schema.equals(dedup._JACCARD_SCHEMA)


def test_jaccard_join_fallback_matches_broadcast(
        ray_session, monkeypatch):
    """ngram_jaccard_pairs' distributed-join fallback must match the
    broadcast fast path exactly; force it by zeroing both cutoffs."""
    from risjbot_ray.pipelines import dedup
    from risjbot_ray.pipelines.dedup import ngram_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    fast = ngram_jaccard_pairs(sf).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_PAIRS_MAX", -1)
    slow = ngram_jaccard_pairs(sf).to_pandas()
    assert fast.equals(slow[fast.columns])


def test_embedding_neardup_join_fallback_matches_broadcast(
        ray_session, planted_dir, monkeypatch):
    """The join fallback for large pair sets must reproduce the
    broadcast fast path's (a, b, cosine) table exactly."""
    root, _, _, _ = planted_dir
    fast = dedup.embedding_neardup_pairs(root, threshold=0.95)
    monkeypatch.setattr(dedup, "_BROADCAST_PAIRS_MAX", -1)
    slow = dedup.embedding_neardup_pairs(root, threshold=0.95)
    assert fast.equals(slow)
    assert fast.num_rows > 0


def test_minhash_cluster_keep_longest(ray_session, planted_dir):
    """Representative selection: in each near-dup cluster exactly one
    doc survives — the longest by word count, ties to the min doc_id;
    singletons keep themselves. (Planted: 100 == doc 0 byte-identical
    and equal-length -> tie, doc 0 kept; 101 ~ doc 1 with one word
    edited, equal word count -> doc 1 kept; 102 is a singleton.)"""
    root, _, _, docs = planted_dir
    out = dedup.minhash_cluster_keep(root).to_pandas().set_index("doc_id")
    assert len(out) == len(docs)
    # every cluster keeps exactly one doc
    for cl, grp in out.groupby("cluster_id"):
        assert int(grp["kept"].sum()) == 1, cl
    # planted near-dups land in their partners' clusters (the 30 base
    # variants may merge into one big cluster — that is fine; the rule
    # below still pins the representative exactly)
    assert out.loc[100, "cluster_id"] == out.loc[0, "cluster_id"]
    assert not bool(out.loc[100, "kept"])  # identical twin of doc 0 loses
    assert out.loc[101, "cluster_id"] == out.loc[1, "cluster_id"]
    # the unrelated doc is a self-labeled kept singleton
    assert out.loc[102, "cluster_id"] == 102 and bool(out.loc[102, "kept"])
    # keep-longest, ties to min doc_id: the kept doc IS the rule's pick
    nw = {i: len(t.split()) for i, t in docs.items()}
    for cl, grp in out.groupby("cluster_id"):
        members = sorted(grp.index)
        rep = grp[grp["kept"]].index[0]
        expect = min(members, key=lambda i: (-nw[i], i))
        assert rep == expect, (cl, rep, expect)


def test_row_pairs_recursive_exact_and_bounded():
    """The signature-row pigeonhole (hot-bucket guard) emits EXACTLY
    the pairs within the row-mismatch bound — equal to brute force —
    and its emitted volume tracks true duplicates, not bucket^2: a
    5000-doc "bucket" of unrelated signatures with 6 planted clone
    groups yields only the planted pairs."""
    from risjbot_ray.functions.hamming import (row_pairs_dedup,
                                               row_pairs_recursive)
    rng = np.random.default_rng(11)
    P, max_d = 64, 19                     # num_perm=64, threshold=0.7
    n_bg = 5000
    sig = rng.integers(0, 2**63, size=(n_bg, P), dtype=np.uint64)
    # plant 6 clone groups of 4: each clone flips <= max_d rows
    planted = []
    for g in range(6):
        base = sig[g * 7]
        for c in range(3):
            clone = base.copy()
            flip = rng.choice(P, size=rng.integers(0, max_d + 1),
                              replace=False)
            clone[flip] ^= np.uint64(1)
            planted.append(clone)
    sig = np.vstack([sig, np.array(planted, dtype=np.uint64)])
    ids = np.arange(len(sig), dtype=np.int64)
    out = []
    # brute_max far below n: the recursion MUST split, not brute-force
    row_pairs_recursive(ids, sig, max_d, list(range(P)), out,
                        brute_max=64)
    a, b = row_pairs_dedup(out)
    # brute-force reference over all pairs
    ai, aj = np.triu_indices(len(sig), 1)
    d = (sig[ai] != sig[aj]).sum(axis=1)
    keep = d <= max_d
    ref = set(zip(ai[keep].tolist(), aj[keep].tolist()))
    assert set(zip(a.tolist(), b.tolist())) == ref
    assert len(ref) > 0
    # volume bound: emitted pairs == qualifying pairs, NOT O(n^2)
    assert len(a) == len(ref) < 200


def test_minhash_hot_bucket_path_is_exact(ray_session, planted_dir,
                                          monkeypatch):
    """Forcing band buckets through the hot pigeonhole path (cap
    lowered to 2) must leave minhash_candidate_pairs' verified output
    byte-identical, and the hot task must actually run."""
    root, _, _, _ = planted_dir
    base = (dedup.minhash_candidate_pairs(root, threshold=0.5)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    calls = []
    orig = dedup._hot_band_pairs_task

    class Spy:
        @staticmethod
        def remote(*args, **kw):
            calls.append(1)
            return orig.remote(*args, **kw)

    monkeypatch.setattr(dedup, "_HOT_BUCKET_CAP", 2)
    monkeypatch.setattr(dedup, "_hot_band_pairs_task", Spy)
    hot = (dedup.minhash_candidate_pairs(root, threshold=0.5)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert len(calls) > 0
    assert base.equals(hot)
    assert len(base) > 0


def test_embedding_hot_bucket_path_is_exact(ray_session, planted_dir,
                                            monkeypatch):
    """Same exactness gate for the embedding-LSH hot path: lowering
    the cap so buckets route through the exact-cosine hot task must
    not change the verified (a, b, cosine) table."""
    root, _, _, _ = planted_dir
    base = dedup.embedding_neardup_pairs(root, threshold=0.95)
    calls = []
    orig = dedup._hot_cosine_pairs_task

    class Spy:
        @staticmethod
        def remote(*args, **kw):
            calls.append(1)
            return orig.remote(*args, **kw)

    monkeypatch.setattr(dedup, "_HOT_BUCKET_CAP", 2)
    monkeypatch.setattr(dedup, "_hot_cosine_pairs_task", Spy)
    hot = dedup.embedding_neardup_pairs(root, threshold=0.95)
    assert len(calls) > 0
    assert base.equals(hot)
    assert base.num_rows > 0


# --------------------------------------------------------------------------
# incremental MinHash dedup (persisted band ledger, FineWeb per-dump
# rule): local reference parity + crash / contract behavior
# --------------------------------------------------------------------------



def test_minhash_incremental_matches_reference(ray_session, tmp_path):
    """A-then-B through a fresh ledger == the local reference of the
    documented rule, on the real corpus split into two shards (the
    sf0.001 documents table carries genuine near-dups both within and
    across the split)."""
    import os

    from risjbot_ray.pipelines.dedup import minhash_dedup_incremental

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    shards = []
    shard_dirs = []
    for name, mask in (("A", ids % 2 == 0), ("B", ids % 2 == 1)):
        sub = t.filter(pa.array(mask))
        d = tmp_path / name
        os.makedirs(d)
        pq.write_table(sub, str(d / "documents.parquet"))
        shard_dirs.append(str(d))
        shards.append(dict(zip(sub.column("doc_id").to_pylist(),
                               sub.column("text").to_pylist())))
    from risjbot_ray.testsupport.incrref import incr_reference
    exp = incr_reference(shards)
    led = str(tmp_path / "ledger")
    for sd, e in zip(shard_dirs, exp):
        got = minhash_dedup_incremental(sd, led).to_pandas()
        gd = dict(zip(got["doc_id"], got["reason"]))
        assert gd == {int(k): v for k, v in e.items()}
    # the run must have found real work in every category
    flat = [v for e in exp for v in e.values()]
    assert flat.count("prior_dup") > 0 and flat.count("shard_dup") > 0


def test_minhash_incremental_ledger_contract(ray_session, tmp_path):
    """Parameter-mismatched resumes are rejected; pending deltas from
    this run are committed (no .pending left behind) and a second
    ingest of an identical shard drops everything as prior_dup."""
    import glob
    import os

    import pytest as _pytest

    from risjbot_ray.pipelines.dedup import minhash_dedup_incremental

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["a wholly unique first document about frogs " * 5,
                 "an unrelated second document about trains " * 5]})
    sd = tmp_path / "S"
    os.makedirs(sd)
    pq.write_table(docs, str(sd / "documents.parquet"))
    led = str(tmp_path / "led")
    r1 = minhash_dedup_incremental(str(sd), led).to_pandas()
    assert list(r1["reason"]) == ["kept", "kept"]
    assert not glob.glob(os.path.join(led, "**", "*.pending"),
                         recursive=True)
    # identical shard again: everything matches the ledger
    sd2 = tmp_path / "S2"
    os.makedirs(sd2)
    pq.write_table(docs, str(sd2 / "documents.parquet"))
    r2 = minhash_dedup_incremental(str(sd2), led).to_pandas()
    assert list(r2["reason"]) == ["prior_dup", "prior_dup"]
    with _pytest.raises(ValueError, match="built with"):
        minhash_dedup_incremental(str(sd2), led, bands=8)


def test_minhash_incremental_forced_chunked_fallback(ray_session,
                                                     tmp_path,
                                                     monkeypatch):
    """Force the past-cutoff chunked cross-verify plan (cutoff lowered
    to 1 pair per chunk) on the real corpus split: verdicts must be
    IDENTICAL to the broadcast fast path — the fallback is the same
    algorithm chunked, not a different rule."""
    import os

    from risjbot_ray.pipelines import dedup as dd

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    dirs = []
    for name, mask in (("A", ids % 2 == 0), ("B", ids % 2 == 1)):
        d = tmp_path / name
        os.makedirs(d)
        pq.write_table(t.filter(pa.array(mask)),
                       str(d / "documents.parquet"))
        dirs.append(str(d))

    led1 = str(tmp_path / "led_fast")
    fast = []
    for d in dirs:
        fast.append(dd.minhash_dedup_incremental(d, led1).to_pandas())

    # chunk size 1: every cross pair takes the chunked path; keep the
    # WITHIN-shard broadcast paths intact by restoring the cutoff
    # inside _collect_pairs' other callers via a shard-scoped patch
    monkeypatch.setattr(dd, "_BROADCAST_PAIRS_MAX", 1)
    led2 = str(tmp_path / "led_chunk")
    slow = []
    for d in dirs:
        slow.append(dd.minhash_dedup_incremental(d, led2).to_pandas())
    for f, s in zip(fast, slow):
        assert list(f["doc_id"]) == list(s["doc_id"])
        assert list(f["reason"]) == list(s["reason"])
    assert (slow[1]["reason"] == "prior_dup").sum() > 0
