"""Similarity search over the embeddings table: brute-force cosine top-k
(the exact baseline) and an IVF-bucketed variant (the scale path).

The query matrix is broadcast ONCE via ``ray.put`` and read inside each
batch task — never re-shipped per batch. Per-batch math is a single numpy
matmul over the unit-normalized vectors.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, 1e-12)


def _load_query_vectors(sf_dir: str, query_ids: list[int]) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=pc.field("vec_id").isin(query_ids))
    order = {vid: i for i, vid in enumerate(t.column("vec_id").to_pylist())}
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in t.column("embedding").to_pylist()])
    idx = [order[q] for q in query_ids]
    return vecs[idx]


def ann_topk(sf_dir: str, query_ids: list[int] | None = None,
             k: int = 10) -> pa.Table:
    """Exact cosine top-k per query: per-batch partial top-k (numpy matmul
    against the broadcast query matrix) then a tiny driver-side merge of
    ``num_batches x k`` candidates — the pre-aggregation pattern; the full
    similarity column never materializes."""
    query_ids = query_ids or [0]
    q = _unit(_load_query_vectors(sf_dir, query_ids))
    q_ref = ray.put(q)
    qid_arr = np.asarray(query_ids)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist())
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in batch.column("embedding").to_pylist()])
        sims = _unit(vecs) @ qm.T  # (N, Q)
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            mask = ids != qid_arr[qi]  # exclude the query itself
            cids, csims = ids[mask], col[mask]
            if len(cids) > k:
                part = np.argpartition(-csims, k)[:k]
                cids, csims = cids[part], csims[part]
            out_q.extend([int(qid_arr[qi])] * len(cids))
            out_id.extend(cids.tolist())
            out_sim.extend(csims.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "cosine": pa.array(out_sim, pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    rows = []
    for qid, grp in partials.groupby("query_id"):
        top = heapq.nsmallest(
            k, grp.itertuples(index=False),
            key=lambda r: (-r.cosine, r.vec_id))
        rows.extend(top)
    out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])
    out = out.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    # 5dp rounding AFTER ranking: stable across float64 summation orders
    # (the DuckDB oracle casts to DOUBLE[] and rounds identically)
    out["cosine"] = out["cosine"].round(5)
    return pa.Table.from_pandas(out, preserve_index=False)


class IVFIndex:
    """IVF coarse quantizer: seeded k-means-lite centroids computed once
    from a sample; vectors are assigned to their nearest centroid and the
    search probes only ``nprobe`` cells — the bucketed scale path for ANN
    (brute force within each probed cell)."""

    def __init__(self, sf_dir: str, n_cells: int = 16, iters: int = 5,
                 seed: int = 5):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        self.ids = np.asarray(t.column("vec_id").to_pylist())
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in t.column("embedding").to_pylist()])
        self.unit = _unit(vecs)
        rng = np.random.default_rng(seed)
        cent = self.unit[rng.choice(len(self.unit),
                                    size=min(n_cells, len(self.unit)),
                                    replace=False)]
        for _ in range(iters):
            assign = np.argmax(self.unit @ cent.T, axis=1)
            for c in range(len(cent)):
                members = self.unit[assign == c]
                if len(members):
                    cent[c] = _unit(members.mean(axis=0))
        self.centroids = cent
        self.assign = np.argmax(self.unit @ cent.T, axis=1)

    def search(self, query: np.ndarray, k: int = 10,
               nprobe: int = 4) -> list[tuple[int, float]]:
        q = _unit(query.reshape(1, -1))[0]
        cells = np.argsort(-(self.centroids @ q))[:nprobe]
        mask = np.isin(self.assign, cells)
        ids, unit = self.ids[mask], self.unit[mask]
        sims = unit @ q
        top = np.argsort(-sims)[:k]
        return [(int(ids[i]), float(sims[i])) for i in top]


def ann_ivf_topk(sf_dir: str, query_ids: list[int] | None = None,
                 k: int = 10, nprobe: int = 4) -> pa.Table:
    query_ids = query_ids or [0]
    index = IVFIndex(sf_dir)
    q = _load_query_vectors(sf_dir, query_ids)
    rows = []
    for qi, qid in enumerate(query_ids):
        for vid, sim in index.search(q[qi], k=k + 1, nprobe=nprobe):
            if vid != qid and len([r for r in rows if r[0] == qid]) < k:
                rows.append((qid, vid, sim))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "cosine": pa.array([r[2] for r in rows], pa.float64())})
