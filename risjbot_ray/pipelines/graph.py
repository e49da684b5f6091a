"""Link-graph analytics over the crawl's host graph: distributed
PageRank by power iteration.

Crawl schedulers at web scale prioritize by link authority of the
HOST graph (frontier priority = f(host rank)), and the host graph is
small next to the URL frontier: ~10^7 hosts vs 10^10 URLs. That bound
is what this operator leans on — ranks and out-degrees live in ONE
dense float64 vector (80 MB at 10^7 nodes), broadcast per iteration
via ``ray.put`` and read zero-copy by every task, while the EDGES (the
big side: one row per hyperlink) only ever stream through stateless
``map_batches`` passes. Per iteration each batch collapses its edge
contributions to at most n_nodes (dst, contrib) rows via ``bincount``,
partials tree-combine (the LM trainers' no-shuffle path), and the
driver applies damping + dangling-mass redistribution:

    rank'[v] = (1-d)/n + d * (sum_{u->v} rank[u]/outdeg[u]
                              + dangling_mass / n)

This matches the crawl's own driver-state contract (politeness,
budgets, and the seen-set directory are already O(#hosts)); a URL-level
PageRank at 10^10 nodes would instead need the rank vector partitioned
by the same url-hash buckets the frontier uses — the documented
boundary of this implementation.

The ``doc_link_pagerank`` driver query runs the operator over a
DETERMINISTIC synthetic edge set derived from ``documents.doc_id``
(two modular out-links per non-dangling node), which a DuckDB oracle
reproduces exactly with the iteration unrolled as chained CTEs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .lm import _agg_count_partials

DAMPING = 0.85


def _merge_float_sums(batch: pa.Table, key_col: str,
                      val_col: str) -> pa.Table:
    """np.unique + bincount float-sum combine of (key, value) partials
    (the float twin of lm._merge_counts)."""
    k = batch.column(key_col).to_numpy(zero_copy_only=False)
    v = batch.column(val_col).to_numpy(zero_copy_only=False)
    u, inv = np.unique(k, return_inverse=True)
    s = np.bincount(inv, weights=v, minlength=len(u))
    return pa.table({key_col: pa.array(u, pa.int64()),
                     val_col: pa.array(s, pa.float64())})


def _out_degrees(edges: "ray.data.Dataset", n_nodes: int) -> np.ndarray:
    """Dense out-degree vector via per-batch bincount + tree-combine."""
    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        # contract check (vectorized, one pass): pagerank requires
        # node ids in [0, n_nodes) — a gapped/renumbered id space must
        # be densified by the caller, not crash with an IndexError
        # deep in the rank update (or allocate a max(id)-sized array).
        # BOTH endpoints: an out-of-range dst would sail past a
        # src-only check and blow up in contrib's bincount instead
        for name, col in (("src", src), ("dst", dst)):
            if len(col) and (col.min() < 0 or col.max() >= n_nodes):
                raise ValueError(
                    f"pagerank: {name} ids outside [0, {n_nodes}): "
                    f"min={col.min()}, max={col.max()} — densify "
                    "doc_ids before deriving edges")
        deg = np.bincount(src, minlength=1)
        nz = np.nonzero(deg)[0]
        return pa.table({"node": pa.array(nz, pa.int64()),
                         "deg": pa.array(deg[nz].astype(np.float64),
                                         pa.float64())})

    t = _agg_count_partials(
        edges.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        lambda b: _merge_float_sums(b, "node", "deg"))
    deg = np.zeros(n_nodes, np.float64)
    if t is not None:
        deg[t.column("node").to_numpy(zero_copy_only=False)] = \
            t.column("deg").to_numpy(zero_copy_only=False)
    return deg


def pagerank(edges: "ray.data.Dataset", n_nodes: int,
             n_iters: int = 10, damping: float = DAMPING) -> pa.Table:
    """Power-iteration PageRank over ``edges`` (src, dst int64 in
    [0, n_nodes)). Returns (node, rank) for every node. The edge set
    streams every iteration; driver/broadcast state is two dense
    length-n vectors."""
    # coalesce + materialize ONCE so every iteration re-reads a few
    # right-sized blocks from the object store instead of re-running
    # the edge derivation over hundreds of tiny blocks (and so the
    # per-iteration combine's own coalesce is a passthrough)
    from .webtext import _coalesce_for_exchange
    edges = _coalesce_for_exchange(edges)
    deg = _out_degrees(edges, n_nodes)
    deg_ref = ray.put(deg)
    dangling = deg == 0.0
    ranks = np.full(n_nodes, 1.0 / n_nodes, np.float64)

    for _ in range(n_iters):
        ranks_ref = ray.put(ranks)

        def contrib(batch: pa.Table, r=ranks_ref, d=deg_ref) -> pa.Table:
            rk = ray.get(r)
            dg = ray.get(d)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            c = np.bincount(dst, weights=rk[src] / dg[src], minlength=1)
            nz = np.nonzero(c)[0]
            return pa.table({"node": pa.array(nz, pa.int64()),
                             "c": pa.array(c[nz], pa.float64())})

        t = _agg_count_partials(
            edges.map_batches(contrib, batch_format="pyarrow",
                              zero_copy_batch=True),
            lambda b: _merge_float_sums(b, "node", "c"))
        incoming = np.zeros(n_nodes, np.float64)
        if t is not None:
            incoming[t.column("node").to_numpy(zero_copy_only=False)] = \
                t.column("c").to_numpy(zero_copy_only=False)
        dm = float(ranks[dangling].sum())
        ranks = ((1.0 - damping) / n_nodes
                 + damping * (incoming + dm / n_nodes))

    return pa.table({"node": pa.array(np.arange(n_nodes), pa.int64()),
                     "rank": pa.array(ranks, pa.float64())})


# --------------------------------------------------------------------------
# deterministic derived edge set over documents (driver query + oracle)
# --------------------------------------------------------------------------

# every non-dangling node (doc_id % 17 != 0) links to two modular
# neighbours; doc_id % 17 == 0 nodes are dangling — exercises the
# dangling-mass term the oracle must reproduce
_EDGE_RULES = ((7, 3), (13, 5))
_DANGLE_MOD = 17
PAGERANK_ITERS = 5


def _derived_edges(sf_dir: str, n_nodes: int) -> "ray.data.Dataset":
    """Assumes contiguous doc_ids 0..n_nodes-1 (true for every driver
    table; pagerank's contract check catches violations loudly)."""
    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = ids[ids % _DANGLE_MOD != 0]
        src = np.tile(ids, len(_EDGE_RULES))
        dst = np.concatenate([(ids * a + b) % n_nodes
                              for a, b in _EDGE_RULES])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"]) \
        .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def _doc_count(sf_dir: str) -> int:
    """Row count from parquet metadata only (file or directory)."""
    import glob
    import os

    import pyarrow.parquet as pq
    path = f"{sf_dir}/documents.parquet"
    files = (sorted(glob.glob(os.path.join(path, "*.parquet")))
             if os.path.isdir(path) else [path])
    return sum(pq.read_metadata(f).num_rows for f in files)


def doc_link_pagerank(sf_dir: str,
                      n_iters: int = PAGERANK_ITERS) -> pa.Table:
    """PageRank over the deterministic doc_id-derived edge set —
    SQL-checkable end to end (rank values match the unrolled-CTE
    oracle at float64)."""
    n_nodes = _doc_count(sf_dir)
    return pagerank(_derived_edges(sf_dir, n_nodes), n_nodes,
                    n_iters=n_iters)


def connected_components(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Weakly connected components over (src, dst) edges — public
    surface for the distributed min-label propagation the MinHash
    dedup clustering uses (dedup.label_propagation_clusters: bucketed
    small-int exchanges, vectorized per-bucket folds, logarithmic
    rounds; no driver-side edge loop). Returns (node, label = min
    reachable node id) for every node incident to an edge."""
    from .dedup import label_propagation_clusters

    def to_ab(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column("src").cast(pa.int64()),
                         "b": b.column("dst").cast(pa.int64())})

    return label_propagation_clusters(
        edges.map_batches(to_ab, batch_format="pyarrow",
                          zero_copy_batch=True))


def doc_link_components(sf_dir: str) -> "ray.data.Dataset":
    """Connected components of the deterministic doc_id-derived link
    graph — SQL-checkable against a recursive-CTE transitive closure."""
    return connected_components(
        _derived_edges(sf_dir, _doc_count(sf_dir)))


def pagerank_reference(edges: np.ndarray, n_nodes: int,
                       n_iters: int = 10,
                       damping: float = DAMPING) -> np.ndarray:
    """Local dense-matrix reference for tests: same math, no Ray."""
    deg = np.bincount(edges[:, 0], minlength=n_nodes).astype(np.float64)
    dangling = deg == 0.0
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(n_iters):
        inc = np.zeros(n_nodes)
        np.add.at(inc, edges[:, 1], r[edges[:, 0]] / deg[edges[:, 0]])
        r = (1 - damping) / n_nodes + damping * (
            inc + r[dangling].sum() / n_nodes)
    return r
