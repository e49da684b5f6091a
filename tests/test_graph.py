"""PageRank gates: the distributed power iteration must match a local
dense-matrix reference bit-for-bit-ish (1e-12) on random graphs with
dangling nodes, and the derived-edge driver query must match the same
reference end to end."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.pipelines.graph import (doc_link_pagerank, pagerank,
                                         pagerank_reference)

SF = "/root/testdata/sf0.001"


def test_reference_is_a_distribution():
    rng = np.random.default_rng(3)
    edges = rng.integers(0, 40, size=(200, 2))
    r = pagerank_reference(edges, 40, n_iters=50)
    assert abs(r.sum() - 1.0) < 1e-9        # mass conserved
    assert (r > 0).all()


def test_distributed_matches_reference(ray_session):
    import ray
    rng = np.random.default_rng(9)
    for trial in range(3):
        n = int(rng.integers(20, 80))
        m = int(rng.integers(n, 6 * n))
        edges = rng.integers(0, n, size=(m, 2))
        # force some dangling nodes
        dang = rng.choice(n, size=max(1, n // 10), replace=False)
        edges = edges[~np.isin(edges[:, 0], dang)]
        ds = ray.data.from_arrow(pa.table({
            "src": pa.array(edges[:, 0], pa.int64()),
            "dst": pa.array(edges[:, 1], pa.int64()),
        })).repartition(4)
        got = pagerank(ds, n, n_iters=7)
        exp = pagerank_reference(edges, n, n_iters=7)
        g = got.column("rank").to_numpy()
        assert got.column("node").to_pylist() == list(range(n))
        assert np.max(np.abs(g - exp)) < 1e-12
        assert abs(g.sum() - 1.0) < 1e-9


def test_connected_components_matches_union_find(ray_session):
    import ray

    from risjbot_ray.pipelines.graph import connected_components
    rng = np.random.default_rng(17)
    n, m = 60, 90
    edges = rng.integers(0, n, size=(m, 2))
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(edges[:, 0], pa.int64()),
        "dst": pa.array(edges[:, 1], pa.int64()),
    })).repartition(3)
    got = {r["node"]: r["label"]
           for r in connected_components(ds).take_all()}
    # local union-find reference
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = set(edges.ravel().tolist())
    exp = {v: min(u for u in touched if find(u) == find(v))
           for v in touched}
    assert got == exp


def test_doc_link_pagerank_e2e(ray_session):
    from risjbot_ray.pipelines.graph import _DANGLE_MOD, _EDGE_RULES
    got = doc_link_pagerank(SF, n_iters=5)
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    ids = np.arange(n)
    ids = ids[ids % _DANGLE_MOD != 0]
    edges = np.concatenate([
        np.stack([ids, (ids * a + b) % n], axis=1)
        for a, b in _EDGE_RULES])
    exp = pagerank_reference(edges, n, n_iters=5)
    assert np.max(np.abs(got.column("rank").to_numpy() - exp)) < 1e-12
    # authority skew exists (dangling targets vs sources)
    r = got.column("rank").to_numpy()
    assert r.max() / r.min() > 1.01


def test_pagerank_rejects_out_of_range_dst(ray_session):
    """The id-range contract must check BOTH endpoints: an out-of-range
    dst used to sail past the src-only check and crash with an
    IndexError deep in the rank update."""
    import pytest
    import ray

    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 5], pa.int64()),   # 5 >= n_nodes
    }))
    with pytest.raises(Exception, match="dst ids outside"):
        pagerank(ds, n_nodes=3, n_iters=2)
