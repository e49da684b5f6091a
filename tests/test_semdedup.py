"""Planted-duplicate gates for SemDedup (pipelines/dedup.py
::semdedup_assignments): a synthetic embedding table with KNOWN
near-duplicate groups, checked against an in-test brute-force of the
same smallest-earlier-id rule. Covers the flat (oracle-equivalent)
case, the clustered scale path's self-check counters, and the tile
short-circuit (chunk smaller than the cell)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EPS = 0.9


def _planted_embeddings(tmp_path, n_groups: int = 6, dups: int = 3,
                        singles: int = 20, dim: int = 16, seed: int = 7):
    """n_groups tight clusters (base + `dups` tiny-noise copies, cosine
    ~0.999) plus `singles` well-separated lone vectors."""
    rng = np.random.default_rng(seed)
    vecs, groups = [], []
    for g in range(n_groups):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        members = []
        for _ in range(1 + dups):
            v = base + rng.standard_normal(dim) * 0.01
            members.append(len(vecs))
            vecs.append(v)
        groups.append(members)
    for _ in range(singles):
        vecs.append(rng.standard_normal(dim) * 3.0)
    ids = np.arange(len(vecs), dtype=np.int64)
    perm = rng.permutation(len(vecs))  # ids NOT in insertion order
    tbl = pa.table({
        "vec_id": pa.array(ids[perm], pa.int64()),
        "embedding": pa.array([np.asarray(vecs[i], np.float32).tolist()
                               for i in perm], pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(vecs), np.int32)[perm]),
    })
    d = tmp_path / "sem"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d), vecs, groups


def _brute(vecs, eps):
    """Expected (kept, dup_of, dup_cosine) under the global rule."""
    v = np.stack([np.asarray(x, np.float32).astype(np.float64)
                  for x in vecs])
    u = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    s = u @ u.T
    hits = np.tril(s >= eps, k=-1)
    anyh = hits.any(axis=1)
    first = hits.argmax(axis=1)
    kept = ~anyh
    dup_of = np.where(anyh, first, -1)
    dcos = np.where(anyh, s[np.arange(len(u)), first], 0.0)
    return kept, dup_of, np.round(dcos, 5)


def test_semdedup_flat_matches_bruteforce(ray_session, tmp_path):
    from risjbot_ray.pipelines.dedup import embedding_semdedup

    sf, vecs, groups = _planted_embeddings(tmp_path)
    res = embedding_semdedup(sf, eps=EPS, n_cells=1)
    kept_e, dup_e, cos_e = _brute(vecs, EPS)

    assert res.num_rows == len(vecs)
    got_ids = res.column("vec_id").to_pylist()
    assert got_ids == sorted(got_ids)
    for vid, kept, dup, dc in zip(got_ids,
                                  res.column("kept").to_pylist(),
                                  res.column("dup_of").to_pylist(),
                                  res.column("dup_cosine").to_pylist()):
        assert kept == bool(kept_e[vid]), vid
        assert dup == int(dup_e[vid]), vid
        assert dc == pytest.approx(float(cos_e[vid]), abs=1e-9), vid
    # every planted group keeps exactly its smallest id
    kept_set = {v for v, k in zip(got_ids,
                                  res.column("kept").to_pylist()) if k}
    for members in groups:
        assert set(members) & kept_set == {min(members)}


def test_semdedup_clustered_selfcheck_and_recall(ray_session, tmp_path):
    from risjbot_ray.pipelines.dedup import embedding_semdedup_clustered

    sf, vecs, groups = _planted_embeddings(tmp_path)
    chk = embedding_semdedup_clustered(sf, eps=EPS, n_cells=4)
    df = chk.to_pandas()
    assert (df.check_mismatch == 0).all()
    assert (df.checked_n == len(vecs)).all()
    assert df.n_vectors.sum() == len(vecs)
    assert (df.n_kept + df.n_dropped == df.n_vectors).all()
    # tight planted groups land in one cell -> all dups are dropped
    # (cosine ~0.999 copies cannot straddle a coarse spherical cell)
    assert df.n_dropped.sum() == sum(len(m) - 1 for m in groups)


def test_semdedup_tiled_sweep_matches_untiled(ray_session, tmp_path):
    """chunk smaller than the cell: the ascending column tiles with
    short-circuit must give identical (dup_of, cosine) to one big
    matmul."""
    from risjbot_ray.pipelines.dedup import semdedup_assignments

    sf, vecs, _ = _planted_embeddings(tmp_path)
    small = semdedup_assignments(sf, eps=EPS, n_cells=1,
                                 chunk=7).to_pandas()
    big = semdedup_assignments(sf, eps=EPS, n_cells=1,
                               chunk=4096).to_pandas()
    key = ["vec_id", "kept", "dup_of", "dup_cosine"]
    s = small[key].sort_values("vec_id").reset_index(drop=True)
    b = big[key].sort_values("vec_id").reset_index(drop=True)
    assert s.equals(b)
