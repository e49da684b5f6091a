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
    """Distributed IVF coarse quantizer — the bucketed scale path for ANN.

    Build (once per corpus, cached on disk):
    1. FIT: k-means-lite centroids from a bounded SAMPLE (``ds.limit``)
       — the driver never sees more than ``sample_size`` vectors.
    2. ASSIGN: a ``map_batches`` pass computes each vector's nearest
       centroid (one matmul against the broadcast centroid matrix) and
       writes CELL-PARTITIONED parquet (``cell=NN/part-*.parquet``, unit
       float64 vectors) — the same partition-once-probe-few layout the
       page store uses for the fetch join.

    Search reads ONLY the ``nprobe`` probed cells' files (union across the
    query batch) and brute-forces within them; the full table is never
    read after build. Cache key covers the index parameters.

    Storage contract: the index is a multi-file layout written by every
    worker and read by the query node, so ``index_dir`` (default: under
    :func:`risjbot_ray.state.shared.shared_root`, i.e.
    ``$RISJBOT_SHARED_DIR``) must live on storage visible to all
    workers AND the driver — the same shared-fs contract the tile
    ledger and crawl spill dirs state. A violated contract (node-local
    path on a multi-node cluster) is detected LOUDLY: the DONE manifest
    records the built row count and both build and load verify that the
    parquet footers visible from this process sum to exactly that many
    rows, raising instead of silently searching a partial index."""

    def __init__(self, sf_dir: str, n_cells: int = 16, iters: int = 5,
                 seed: int = 5, sample_size: int = 4096,
                 index_dir: str | None = None):
        import hashlib
        import json
        import os

        from risjbot_ray.state.shared import shared_subdir

        self.n_cells = n_cells
        if index_dir is None:
            # the cache key includes a CONTENT fingerprint (size +
            # mtime) of the source parquet: regenerated embeddings at
            # the same path must not silently reuse a stale index
            src = f"{sf_dir}/embeddings.parquet"
            try:
                st = os.stat(src)
                content = f"{st.st_size}:{st.st_mtime_ns}"
            except OSError:          # directory of parts
                import glob as _glob
                content = ";".join(
                    f"{os.path.basename(p)}:{os.stat(p).st_size}"
                    for p in sorted(_glob.glob(f"{src}/*.parquet")))
            tag = hashlib.md5(
                f"{os.path.abspath(sf_dir)}:{content}:{n_cells}:"
                f"{iters}:{seed}:{sample_size}:v2".encode()
            ).hexdigest()[:12]
            index_dir = os.path.join(shared_subdir("ivf"), tag)
        self.index_dir = index_dir
        done = os.path.join(index_dir, "DONE")
        if not os.path.exists(done):
            # clear orphan parts from a crashed earlier build: uuid
            # part names mean a rebuild would otherwise APPEND a
            # second copy of every vector into the same cell dirs
            import shutil
            shutil.rmtree(index_dir, ignore_errors=True)
            os.makedirs(index_dir, exist_ok=True)
            ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                       columns=["vec_id", "embedding"])
            # FIT on a sample only
            sample = ds.limit(sample_size).take_all()
            svecs = _unit(np.stack([np.asarray(r["embedding"],
                                               dtype=np.float64)
                                    for r in sample]))
            rng = np.random.default_rng(seed)
            cent = svecs[rng.choice(len(svecs),
                                    size=min(n_cells, len(svecs)),
                                    replace=False)]
            for _ in range(iters):
                assign = np.argmax(svecs @ cent.T, axis=1)
                for c in range(len(cent)):
                    members = svecs[assign == c]
                    if len(members):
                        cent[c] = _unit(members.mean(axis=0))
            np.save(os.path.join(index_dir, "centroids.npy"), cent)
            cent_ref = ray.put(cent)
            out_dir = index_dir

            def assign_and_spill(batch: pa.Table) -> pa.Table:
                import uuid

                import pyarrow.parquet as _pq
                cm = ray.get(cent_ref)
                ids = np.asarray(batch.column("vec_id").to_pylist(),
                                 dtype=np.int64)
                unit = _unit(np.stack(
                    [np.asarray(v, dtype=np.float64)
                     for v in batch.column("embedding").to_pylist()]))
                cells = np.argmax(unit @ cm.T, axis=1)
                tag = uuid.uuid4().hex[:10]
                for c in np.unique(cells):
                    m = cells == c
                    cdir = os.path.join(out_dir, f"cell={int(c):04d}")
                    os.makedirs(cdir, exist_ok=True)
                    _pq.write_table(pa.table({
                        "vec_id": pa.array(ids[m], pa.int64()),
                        "unit": pa.array([u.tolist() for u in unit[m]],
                                         pa.list_(pa.float64())),
                    }), os.path.join(cdir, f"part-{tag}.parquet"))
                return pa.table({"n": pa.array([int(len(ids))],
                                               pa.int64())})

            counts = ds.map_batches(assign_and_spill,
                                    batch_format="pyarrow").take_all()
            built = sum(r["n"] for r in counts)
            # visibility check BEFORE the manifest commits: on a
            # multi-node cluster with a node-local index_dir the
            # workers' parts are invisible here and this raises
            from risjbot_ray.state.shared import verify_visible
            verify_visible(built, self._visible_rows(),
                           "IVF index", index_dir)
            with open(done, "w") as f:
                json.dump({"rows": built}, f)
        else:
            # cached load: re-verify the manifest against the parquet
            # footers actually visible from THIS process (footer
            # metadata only — no vector data is read)
            from risjbot_ray.state.shared import verify_visible
            with open(done) as f:
                manifest = json.load(f)
            verify_visible(manifest["rows"], self._visible_rows(),
                           "IVF index", index_dir)
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))

    def _visible_rows(self) -> int:
        """Sum of parquet-footer row counts across every cell part
        visible from this process — metadata reads only."""
        import glob
        import os

        import pyarrow.parquet as pq
        return sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(self.index_dir, "cell=*",
                                            "part-*.parquet")))

    def _cell_parts(self, cell: int) -> list[str]:
        import glob
        import os
        return sorted(glob.glob(os.path.join(
            self.index_dir, f"cell={cell:04d}", "part-*.parquet")))

    def search_batch(self, queries: np.ndarray, k: int = 10,
                     nprobe: int = 4) -> list[list[tuple[int, float]]]:
        """Probe the union of the queries' nprobe cells, STREAMING one
        cell part at a time with a running per-query top-k merge — the
        query node's working set is O(k x queries + one part), never
        the concatenation of every probed cell (a fat cell on a skewed
        corpus would otherwise land whole in query-node memory)."""
        import pyarrow.parquet as pq
        q = _unit(queries)
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        nq = len(q)
        best_ids = [np.empty(0, np.int64) for _ in range(nq)]
        best_sims = [np.empty(0, np.float64) for _ in range(nq)]
        for c in sorted({int(x) for x in probe.ravel()}):
            # queries that probed THIS cell (a vector lives in exactly
            # one cell, so per-cell restriction is by construction)
            qsel = np.flatnonzero((probe == c).any(axis=1))
            qmat = q[qsel]
            for part in self._cell_parts(c):
                tbl = pq.read_table(part)
                ids = np.asarray(tbl.column("vec_id").to_pylist(),
                                 dtype=np.int64)
                if not len(ids):
                    continue
                unit = np.stack([np.asarray(v) for v in
                                 tbl.column("unit").to_pylist()])
                sims = unit @ qmat.T                    # (n_part, nq_sel)
                for col, qi in enumerate(qsel):
                    cand_i = np.concatenate([best_ids[qi], ids])
                    cand_s = np.concatenate([best_sims[qi],
                                             sims[:, col]])
                    # deterministic (-cosine, vec_id) ranking like
                    # ann_topk: row order derives from uuid part
                    # filenames, so an unstable argsort would flip
                    # k-boundary ties per rebuild; incremental
                    # truncated merge under this total order equals
                    # the one-shot top-k of the union
                    top = np.lexsort((cand_i, -cand_s))[:k]
                    best_ids[qi] = cand_i[top]
                    best_sims[qi] = cand_s[top]
        return [[(int(i), float(s))
                 for i, s in zip(best_ids[qi], best_sims[qi])]
                for qi in range(nq)]

    def search(self, query: np.ndarray, k: int = 10,
               nprobe: int = 4) -> list[tuple[int, float]]:
        return self.search_batch(query.reshape(1, -1), k=k,
                                 nprobe=nprobe)[0]


def ann_ivf_topk(sf_dir: str, query_ids: list[int] | None = None,
                 k: int = 10, nprobe: int = 4) -> pa.Table:
    query_ids = query_ids or [0]
    index = IVFIndex(sf_dir)
    q = _load_query_vectors(sf_dir, query_ids)
    results = index.search_batch(q, k=k + 1, nprobe=nprobe)
    rows = []
    for qid, hits in zip(query_ids, results):
        kept = 0
        for vid, sim in hits:
            if vid != qid and kept < k:
                rows.append((qid, vid, sim))
                kept += 1
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "cosine": pa.array([r[2] for r in rows], pa.float64())})


# ---------------------------------------------------------------------------
# signature-based ANN (SimHash-for-embeddings + Hamming pre-rank): the
# index-free scale path. Charikar 2002 random-hyperplane signatures
# approximate angle; per query, the n_candidates signature-nearest
# vectors are exact-reranked. Complements IVF (partition-once-probe-few)
# with scan-everything-cheaply: the 16-byte/vector signature stream
# reads ~32x less than the float vectors, needs no index build, and the
# Hamming scan is an embarrassingly parallel per-batch partial top-C.
# ---------------------------------------------------------------------------

_HAM_BITS = 128          # signature width (2 uint64 words)
_HAM_CANDIDATES = 100    # per-query pre-rank depth before exact rerank


def _pack_signatures(unit: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(N, n_bits) sign pattern packed into (N, n_bits//64) uint64.
    Scale-invariant: sign(v @ planes) == sign(unit(v) @ planes), so
    callers may pass raw or unit vectors interchangeably."""
    bits = (unit @ planes) > 0
    n, nb = bits.shape
    if nb % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {nb}")
    w = np.uint64(1) << np.arange(64, dtype=np.uint64)
    words = np.empty((n, nb // 64), dtype=np.uint64)
    for j in range(nb // 64):
        words[:, j] = bits[:, 64 * j:64 * (j + 1)].astype(np.uint64) @ w
    return words


def ann_hamming_topk(sf_dir: str, query_ids: list[int] | None = None,
                     k: int = 10, n_bits: int = _HAM_BITS,
                     n_candidates: int = _HAM_CANDIDATES,
                     seed: int = 99) -> pa.Table:
    """Approximate cosine top-k via Hamming pre-ranking: ONE streaming
    pass computes each vector's ``n_bits``-bit hyperplane signature (a
    matmul against the broadcast plane matrix) and a per-batch PARTIAL
    top-``n_candidates`` by Hamming distance to each broadcast query
    signature (vectorized XOR + SWAR popcount); the driver merges
    ``num_batches x C`` (id, distance) rows per query, then the exact
    float64 cosine reranks ONLY the C winners (their vectors re-read
    with a pushed-down ``vec_id`` row filter). Deterministic: fixed
    plane seed, every tie broken by vec_id. Returns the ``ann_topk``
    schema (query_id, vec_id, cosine at 5dp).

    At 10^10 vectors the signature scan touches 16 B/vector instead of
    the full float payload and the driver holds only candidate ids —
    no index build, no shuffle; accuracy is gated by the
    ``ann_hamming_recall`` driver row (recall@k vs the exact path)."""
    import heapq

    import pandas as pd

    from risjbot_ray.functions.hamming import popcount64

    query_ids = query_ids or [0]
    q = _unit(_load_query_vectors(sf_dir, query_ids))
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    qsig = _pack_signatures(q, planes)
    bcast = ray.put((planes, qsig))
    qid_arr = np.asarray(query_ids)

    def partial_cand(batch: pa.Table) -> pa.Table:
        pl, qs = ray.get(bcast)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in batch.column("embedding").to_pylist()])
        # raw vectors: signatures are scale-invariant, no _unit pass
        sig = _pack_signatures(vecs, pl)
        out_q, out_id, out_h = [], [], []
        for qi in range(len(qs)):
            ham = np.zeros(len(ids), np.int64)
            for w in range(sig.shape[1]):
                ham += popcount64(sig[:, w] ^ qs[qi, w])
            mask = ids != qid_arr[qi]          # exclude the query row
            cids, chs = ids[mask], ham[mask]
            if len(cids) > n_candidates:
                # O(N) argpartition prefilter, widened to include every
                # boundary tie, then the deterministic (hamming,
                # vec_id) sort over just that slice
                kth = np.partition(chs, n_candidates - 1)[
                    n_candidates - 1]
                near = chs <= kth
                cids, chs = cids[near], chs[near]
                order = np.lexsort((cids, chs))[:n_candidates]
                cids, chs = cids[order], chs[order]
            out_q.extend([int(qid_arr[qi])] * len(cids))
            out_id.extend(cids.tolist())
            out_h.extend(chs.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "hamming": pa.array(out_h, pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_cand, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    cand: dict[int, list[int]] = {}
    for qid, grp in partials.groupby("query_id"):
        top = heapq.nsmallest(
            n_candidates, grp.itertuples(index=False),
            key=lambda r: (r.hamming, r.vec_id))
        cand[int(qid)] = [int(r.vec_id) for r in top]

    # exact rerank over the LSH-bounded union (<= Q x C vectors)
    return _exact_rerank_cosine(sf_dir, cand, q, query_ids, k)


def _exact_rerank_cosine(sf_dir: str, cand: dict[int, list[int]],
                         q: np.ndarray, query_ids: list[int],
                         k: int) -> pa.Table:
    """Exact float64 cosine rerank of per-query candidate id lists:
    the candidates' vectors are re-read with a pushed-down ``vec_id``
    row filter (<= Q x C rows regardless of corpus size), every tie
    broken by vec_id, cosine rounded to 5dp — the shared tail of the
    signature and PQ pre-rank paths."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    union = sorted({v for vs in cand.values() for v in vs})
    if not union:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=pc.field("vec_id").isin(union))
    cids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    cvec = _unit(np.stack([np.asarray(v, dtype=np.float64)
                           for v in t.column("embedding").to_pylist()]))
    pos = {int(v): i for i, v in enumerate(cids)}
    rows = []
    for qi, qid in enumerate(query_ids):
        sel = np.asarray([pos[v] for v in cand.get(int(qid), [])],
                         dtype=np.int64)
        if not len(sel):
            continue
        sims = cvec[sel] @ q[qi]
        order = np.lexsort((cids[sel], -sims))[:k]
        for j in order:
            rows.append((int(qid), int(cids[sel][j]), float(sims[j])))
    out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])
    out = out.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    out["cosine"] = out["cosine"].round(5)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# product-quantization ANN (Jégou, Douze & Schmid, "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011): vectors
# compress to m sub-codebook codes — m BYTES per vector (8 at the
# default), a 32x smaller scan than the 128-bit signature path's
# 16 B and ~32x smaller than the raw float payload — and queries rank
# the whole corpus by table-lookup ADC (asymmetric distance), then the
# C winners exact-rerank from their true vectors. The memory-bound
# complement to IVF (partition-once-probe-few) and Hamming
# (scan-cheap-signatures): at 10^10 vectors the codes column is 80 GB
# — small enough to pin hot in a cluster's object store.
# ---------------------------------------------------------------------------

_PQ_M = 8           # subquantizers (codes pack into one uint64)
_PQ_KS = 16         # centroids per subspace
_PQ_CANDIDATES = 100


def _pq_train(sample_unit: np.ndarray, m: int, ks: int,
              iters: int, seed: int) -> np.ndarray:
    """Per-subspace Lloyd's on the unit-vector sample -> codebooks of
    shape (m, ks, d//m). Deterministic: seeded init draw, stable
    argmin ties."""
    n, d = sample_unit.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, dsub))
    for j in range(m):
        sub = sample_unit[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(n, size=min(ks, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        if len(cent) < ks:      # tiny sample: pad by repeating
            cent = np.vstack([cent] * (ks // len(cent) + 1))[:ks]
        books[j] = cent
    return books


def _pq_encode(unit: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Unit vectors -> (N, m) uint8 codes: per subspace argmin
    distance to its codebook. Vectorized: one (N, ks) distance matrix
    per subspace via the expanded ||x-c||^2 form."""
    m, ks, dsub = books.shape
    codes = np.empty((len(unit), m), dtype=np.uint8)
    for j in range(m):
        sub = unit[:, j * dsub:(j + 1) * dsub]
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per
        # row, so argmin needs only the last two terms
        d2 = (books[j] ** 2).sum(-1)[None, :] - 2.0 * (sub @ books[j].T)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def _codes_from_column(col, m: int) -> np.ndarray:
    """Zero-copy (N, m) uint8 view of a fixed_size_binary(m) column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    buf = arr.buffers()[1]
    return np.frombuffer(buf, dtype=np.uint8,
                         count=len(arr) * m,
                         offset=arr.offset * m).reshape(-1, m)


def ann_pq_topk(sf_dir: str, query_ids: list[int] | None = None,
                k: int = 10, m: int = _PQ_M, ks: int = _PQ_KS,
                n_candidates: int = _PQ_CANDIDATES, iters: int = 5,
                seed: int = 7, sample_size: int = 4096) -> pa.Table:
    """Approximate cosine top-k via product quantization: codebooks
    fit on a bounded sample (``ds.limit``, the IVF convention), ONE
    encode pass materializes the (vec_id, packed-code) table — 16
    B/row — and each query ranks it by ADC (a per-subspace
    query-to-centroid distance table, then m uint8 table lookups per
    vector, fully vectorized) with per-batch partial top-C; the C
    winners exact-rerank through the shared
    :func:`_exact_rerank_cosine` tail. Deterministic end to end
    (seeded fit, ties to vec_id). Returns the ``ann_topk`` schema.

    On unit vectors L2^2 = 2 - 2 cos, so ADC's L2 ranking is the
    cosine ranking; accuracy is gated by the ``ann_pq_recall`` driver
    row (recall@10 vs the exact path, documented contract >= 0.6 at
    m=8 x 16 centroids on 64-d embeddings)."""
    import heapq

    query_ids = query_ids or [0]
    q = _unit(_load_query_vectors(sf_dir, query_ids))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    sample = ds.limit(sample_size).take_all()
    svecs = _unit(np.stack([np.asarray(r["embedding"], dtype=np.float64)
                            for r in sample]))
    books = _pq_train(svecs, m, ks, iters, seed)
    books_ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        bk = ray.get(books_ref)
        unit = _unit(np.stack([np.asarray(v, dtype=np.float64)
                               for v in
                               batch.column("embedding").to_pylist()]))
        codes = _pq_encode(unit, bk)
        # fixed_size_binary(m): works for ANY m (not just the 8 that
        # happens to pack into one int64), zero-copy back out
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "code": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m), len(codes),
                [None, pa.py_buffer(np.ascontiguousarray(codes)
                                    .tobytes())])})

    codes = ds.map_batches(encode, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # per-query ADC tables: T[j, c] = ||q_sub - books[j, c]||^2
    dsub = books.shape[2]
    qt = np.empty((len(query_ids), m, ks))
    for qi in range(len(query_ids)):
        for j in range(m):
            qt[qi, j] = ((q[qi, j * dsub:(j + 1) * dsub][None, :]
                          - books[j]) ** 2).sum(-1)
    adc_ref = ray.put(qt)
    qid_arr = np.asarray(query_ids)

    def partial_cand(batch: pa.Table) -> pa.Table:
        t = ray.get(adc_ref)
        vid = batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cb = _codes_from_column(batch.column("code"), m)
        out_q, out_id, out_d = [], [], []
        for qi in range(len(t)):
            dist = np.zeros(len(vid))
            for j in range(m):
                dist += t[qi, j][cb[:, j]]
            mask = vid != qid_arr[qi]
            cids, cds = vid[mask], dist[mask]
            if len(cids) > n_candidates:
                kth = np.partition(cds, n_candidates - 1)[
                    n_candidates - 1]
                near = cds <= kth
                cids, cds = cids[near], cds[near]
                order = np.lexsort((cids, cds))[:n_candidates]
                cids, cds = cids[order], cds[order]
            out_q.extend([int(qid_arr[qi])] * len(cids))
            out_id.extend(cids.tolist())
            out_d.extend(cds.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "adc": pa.array(out_d, pa.float64())})

    partials = codes.map_batches(partial_cand, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    cand: dict[int, list[int]] = {}
    for qid, grp in partials.groupby("query_id"):
        top = heapq.nsmallest(
            n_candidates, grp.itertuples(index=False),
            key=lambda r: (r.adc, r.vec_id))
        cand[int(qid)] = [int(r.vec_id) for r in top]
    return _exact_rerank_cosine(sf_dir, cand, q, query_ids, k)


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd's) over the embeddings table
# ---------------------------------------------------------------------------

def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5,
                      seed: int = 17, table: pa.Table | None = None):
    """Full-corpus Lloyd's k-means over the embeddings table — the
    iterative-algorithm pattern on Ray Data: every iteration is ONE
    streaming ``map_batches`` pass that folds each batch to k partial
    rows (count, vector sum, inertia contribution — the sum rides as a
    float64 blob), reduced on the driver to k centroids (k x d floats;
    at 10^9 vectors the driver still holds only k x d). No vector ever
    shuffles; the corpus is re-streamed per iteration, which is the
    deliberate trade at 100-TB scale (re-read beats pinning the table
    in the object store, and assignment is one matmul per batch).

    Deterministic: centroids init from the k smallest vec_ids (stable
    on any cluster size; found with a partial top-k, not a sort), and
    the input stays LAZY — each iteration re-reads the pruned parquet
    columns rather than pinning the table in the object store, the
    right trade when the table is a large fraction of cluster memory.
    Returns one row per cell
    (cell, n_vectors, inertia) plus constant self-check columns:
    total inertia per iteration must be non-increasing
    (``inertia_monotone`` — the driver-readable pass/fail).

    ``table`` substitutes an in-memory (vec_id, embedding) table for
    the parquet read — the injection point ``kmeans_check`` uses to run
    the identical distributed path over a planted corpus."""
    if table is not None:
        ds = ray.data.from_arrow(
            table.select(["vec_id", "embedding"])).repartition(8)
    else:
        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "embedding"])

    # Seed centroids = the k smallest vec_ids' vectors, found WITHOUT
    # a global sort: a per-batch partial top-k over the id column
    # (driver merges #blocks x k ints), then one filter pass fetches
    # exactly those k rows.
    def min_ids(batch: pa.Table) -> pa.Table:
        ids = np.sort(batch.column("vec_id").to_numpy(
            zero_copy_only=False))[:k]
        return pa.table({"vec_id": pa.array(ids, pa.int64())})

    cand = (ds.select_columns(["vec_id"])
            .map_batches(min_ids, batch_format="pyarrow").take_all())
    seed_arr = np.sort(np.array([r["vec_id"] for r in cand],
                               dtype=np.int64))[:k]

    def pick_seeds(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, seed_arr)))

    first = sorted(ds.map_batches(pick_seeds,
                                  batch_format="pyarrow").take_all(),
                   key=lambda r: r["vec_id"])
    if not first:
        raise ValueError("kmeans_embeddings: embeddings table is empty")
    # fewer rows than requested clusters: clamp k (every vector is its
    # own centroid) rather than indexing k-sized stats into an n-row
    # centroid matrix
    k = min(k, len(first))
    cent = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in first[:k]])

    def partials_fn(cent_ref):
        def partials(batch: pa.Table) -> pa.Table:
            cm = ray.get(cent_ref)
            vecs = np.stack([np.asarray(v, dtype=np.float64)
                             for v in
                             batch.column("embedding").to_pylist()])
            d2 = (np.square(vecs).sum(1)[:, None]
                  - 2.0 * vecs @ cm.T
                  + np.square(cm).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            best = d2[np.arange(len(vecs)), a]
            cells, counts, sums, inert = [], [], [], []
            for c in np.unique(a):
                m = a == c
                cells.append(int(c))
                counts.append(int(m.sum()))
                sums.append(vecs[m].sum(axis=0).tobytes())
                inert.append(float(best[m].sum()))
            return pa.table({
                "cell": pa.array(cells, pa.int64()),
                "count": pa.array(counts, pa.int64()),
                "vsum": pa.array(sums, pa.binary()),
                "inertia": pa.array(inert, pa.float64()),
            })
        return partials

    d = cent.shape[1]
    inertias = []
    for _ in range(iters):
        rows = (ds.map_batches(partials_fn(ray.put(cent)),
                               batch_format="pyarrow").take_all())
        counts = np.zeros(k)
        sums = np.zeros((k, d))
        total = 0.0
        for r in rows:
            c = r["cell"]
            counts[c] += r["count"]
            sums[c] += np.frombuffer(r["vsum"], dtype=np.float64)
            total += r["inertia"]
        inertias.append(total)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]   # empty cells keep pos

    monotone = all(b <= a * (1 + 1e-9)
                   for a, b in zip(inertias, inertias[1:]))
    # final assignment sizes + per-cell inertia with the last centroids
    rows = (ds.map_batches(partials_fn(ray.put(cent)),
                           batch_format="pyarrow").take_all())
    counts = np.zeros(k, dtype=np.int64)
    inert = np.zeros(k)
    for r in rows:
        counts[r["cell"]] += r["count"]
        inert[r["cell"]] += r["inertia"]
    return pa.table({
        "cell": pa.array(range(k), pa.int64()),
        "n_vectors": pa.array(counts, pa.int64()),
        "inertia": pa.array(np.round(inert, 6), pa.float64()),
        "inertia_monotone": pa.array([monotone] * k, pa.bool_()),
    })


def synth_planted_clusters(n: int = 600, k: int = 6, d: int = 16,
                           seed: int = 7,
                           ) -> tuple[pa.Table, np.ndarray]:
    """Deterministic planted-cluster corpus for ``kmeans_check``:
    k well-separated centers (distance 10 between any two, offsets
    within 0.5 — separation 10x the spread, so the optimal clustering
    IS the planted one), with vec_ids laid out so ids 0..k-1 are the
    exact centers — one per cluster. ``kmeans_embeddings`` seeds from
    the k smallest vec_ids, so cluster c's fitted cell index is c and
    assignment recovery is a sharp pass/fail, not a local-optimum
    lottery. Returns (table, labels[n])."""
    rng = np.random.RandomState(seed)
    centers = np.zeros((k, d))
    for c in range(k):
        centers[c, c % d] = 10.0 * (1 + c // d)
    labels = np.concatenate([np.arange(k),              # the centers
                             rng.randint(0, k, n - k)])
    offsets = rng.uniform(-0.5, 0.5, (n, d))
    offsets[:k] = 0.0                                    # exact centers
    X = centers[labels] + offsets
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    }), labels


def kmeans_check(sf_dir: str, n: int = 600, k: int = 6,
                 iters: int = 5) -> pa.Table:
    """Driver-visible k-means self-check (VERDICT r3 item 7,
    `ann_ivf_recall`-style): run the DISTRIBUTED Lloyd's path over a
    planted-cluster corpus and verify, against a local ground truth,
    (a) per-cell assignment counts recover the planted clusters
    exactly, (b) per-cell inertia matches a local recompute from the
    planted means, (c) the inertia-per-iteration sequence is
    non-increasing. One row of counters; ``check_ok`` is the pass
    flag. ``sf_dir`` is unused (the corpus is synthesized so the
    ground truth is known by construction)."""
    tbl, labels = synth_planted_clusters(n=n, k=k)
    got = kmeans_embeddings(sf_dir, k=k, iters=iters, table=tbl)

    exp_counts = np.bincount(labels, minlength=k)
    X = np.array([np.asarray(v, dtype=np.float64)
                  for v in tbl.column("embedding").to_pylist()])
    exp_inertia = np.zeros(k)
    for c in range(k):
        pts = X[labels == c]
        exp_inertia[c] = np.square(pts - pts.mean(axis=0)).sum()

    cells = np.asarray(got.column("cell").to_pylist())
    counts = np.asarray(got.column("n_vectors").to_pylist())
    inert = np.asarray(got.column("inertia").to_pylist())
    order = np.argsort(cells)
    counts, inert = counts[order], inert[order]
    n_count_mismatch = int((counts != exp_counts).sum())
    n_inertia_mismatch = int((~np.isclose(
        inert, exp_inertia, rtol=1e-6, atol=1e-6)).sum())
    monotone = bool(got.column("inertia_monotone").to_pylist()[0])
    ok = (n_count_mismatch == 0 and n_inertia_mismatch == 0
          and monotone)
    return pa.table({
        "n_vectors": pa.array([n], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "n_count_mismatch": pa.array([n_count_mismatch], pa.int64()),
        "n_inertia_mismatch": pa.array([n_inertia_mismatch], pa.int64()),
        "inertia_monotone": pa.array([monotone], pa.bool_()),
        "check_ok": pa.array([ok], pa.bool_()),
    })


# ---------------------------------------------------------------------------
# BM25 text retrieval: distributed scoring + partial top-k
# ---------------------------------------------------------------------------

def bm25_topk(sf_dir: str, query: str = "vector hash join stream",
              k: int = 20, k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """Okapi BM25 top-k retrieval over the documents table (Lucene idf
    variant: ``ln(1 + (N - df + 0.5)/(df + 0.5))``) — the text-side
    counterpart of :func:`ann_topk`, same two-pass broadcast shape:

    1. STATS pass: one streaming ``map_batches`` folds each batch to a
       single partial row (n_docs, total token length, per-query-term
       document frequencies) — the driver reduces #blocks tiny rows to
       N / avgdl / idf, never seeing a document.
    2. SCORE pass: per-batch tf scoring against the broadcast idf
       table, folded to a per-batch partial top-k; the driver merges
       #blocks x k candidates (the ``ann_topk`` pre-aggregation
       pattern — the full score column never materializes).

    Only documents containing >= 1 query term are candidates. Ranking
    uses the 5dp-ROUNDED score with ascending-doc_id tiebreak — the
    oracle orders by the same rounded value, so the top-k cut is
    reproducible across engines despite last-ulp f64 differences."""
    import heapq
    import re as _re

    terms = list(dict.fromkeys(
        _re.findall(r"[a-z0-9]+", query.lower())))
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    T = len(terms)

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        total_dl = 0
        df = np.zeros(T, dtype=np.int64)
        for t in texts:
            toks = _re.findall(r"[a-z0-9]+", (t or "").lower())
            total_dl += len(toks)
            seen = set(toks)
            for i, q in enumerate(terms):
                if q in seen:
                    df[i] += 1
        return pa.table({"n": pa.array([n], pa.int64()),
                         "total_dl": pa.array([total_dl], pa.int64()),
                         "df": pa.array([df.tobytes()], pa.binary())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(stats, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in parts)
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    avgdl = sum(r["total_dl"] for r in parts) / n_docs
    df = np.zeros(T, dtype=np.int64)
    for r in parts:
        df += np.frombuffer(r["df"], dtype=np.int64)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_s = [], []
        for did, t in zip(ids, texts):
            toks = _re.findall(r"[a-z0-9]+", (t or "").lower())
            dl = len(toks)
            s = 0.0
            hit = False
            for i, q in enumerate(terms):
                f = toks.count(q)
                if f:
                    hit = True
                    s += idf[i] * f * (k1 + 1) / (
                        f + k1 * (1 - b + b * dl / avgdl))
            if hit:
                out_id.append(did)
                # rank on the 5dp-ROUNDED score: raw f64 sums differ in
                # the last ulp between engines (summation order, libm
                # ln), and corpus scores cluster tightly — an unrounded
                # top-k cut is not reproducible across engines
                out_s.append(round(s, 5))
        if len(out_id) > k:          # partial top-k inside the batch
            order = sorted(range(len(out_id)),
                           key=lambda j: (-out_s[j], out_id[j]))[:k]
            out_id = [out_id[j] for j in order]
            out_s = [out_s[j] for j in order]
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    cand = ds.map_batches(score_topk, batch_format="pyarrow").take_all()
    top = heapq.nsmallest(k, cand,
                          key=lambda r: (-r["score"], r["doc_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in top], pa.int64()),
        "score": pa.array([r["score"] for r in top], pa.float64())})


# ---------------------------------------------------------------------------
# inverted index: bucket-partitioned posting lists as a SINK + lookup
# ---------------------------------------------------------------------------

INDEX_NBUCKETS = 64


def _term_bucket(term: str, nbuckets: int = INDEX_NBUCKETS) -> int:
    import zlib
    return zlib.crc32(term.encode("utf-8")) % nbuckets


def build_inverted_index(sf_dir: str, out_dir: str,
                         nbuckets: int = INDEX_NBUCKETS) -> "pa.Table":
    """Build a term-bucketed inverted index over ``documents`` and
    WRITE it as one parquet file per term-hash bucket (the sink shape
    a retrieval system consumes): posting rows (term, doc_id, tf),
    sorted by (term, doc_id) within each bucket so a lookup is one
    file read + one binary-searchable range.

    Scale design: per-batch Counters collapse each doc to its distinct
    (term, tf) postings before the exchange; the ONLY shuffle groups
    postings by the crc32 term bucket (a term lives in exactly one
    bucket); each bucket group merges + sorts vectorized and writes
    its own partition file (same side-effect-write pattern as the
    crawl's wave spills — on a multi-node cluster ``out_dir`` is
    shared storage). The driver sees one manifest row per bucket.
    Tokenizer is BM25's ``[a-z0-9]+`` on lowered text, so index
    lookups agree with ``bm25_topk`` term statistics."""
    import os
    import re as _re

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        import zlib
        from collections import Counter
        out_t, out_d, out_tf, out_b = [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            for term, tf in Counter(
                    _re.findall(r"[a-z0-9]+", (t or "").lower())).items():
                out_t.append(term)
                out_d.append(did)
                out_tf.append(tf)
                out_b.append(zlib.crc32(term.encode("utf-8")) % nbuckets)
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "tf": pa.array(out_tf, pa.int64()),
                         "tb": pa.array(out_b, pa.int64())})

    def write_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        import pyarrow.parquet as pq
        tb = int(df["tb"].iloc[0])
        df = df.sort_values(["term", "doc_id"],
                            kind="mergesort")[["term", "doc_id", "tf"]]
        path = os.path.join(out_dir, f"tb={tb}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp)
        os.replace(tmp, path)    # atomic: a re-run never tears a file
        return pd.DataFrame({"tb": [tb],
                             "n_terms": [df["term"].nunique()],
                             "n_postings": [len(df)]})

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    manifest = (_coalesce_for_exchange(
                    ds.map_batches(postings, batch_format="pyarrow"))
                .groupby("tb")
                .map_groups(write_bucket, batch_format="pandas")
                .to_pandas())
    return pa.Table.from_pandas(
        manifest.sort_values("tb", kind="mergesort"),
        preserve_index=False)


def index_lookup(index_dir: str, term: str,
                 nbuckets: int = INDEX_NBUCKETS) -> "pa.Table":
    """Posting-list lookup against a built index: reads EXACTLY the
    term's bucket file (never the corpus, never the other buckets) and
    returns (doc_id, tf) sorted by doc_id."""
    import os

    import pyarrow.parquet as pq

    import pyarrow.compute as pc

    path = os.path.join(index_dir,
                        f"tb={_term_bucket(term, nbuckets)}.parquet")
    if not os.path.exists(path):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64())})
    t = pq.read_table(path, filters=[("term", "=", term)],
                      columns=["doc_id", "tf"])
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id",
                                                 "ascending")]))


# ---------------------------------------------------------------------------
# distributed PCA over the embeddings table
# ---------------------------------------------------------------------------

def _pca_moment_partials(ds: "ray.data.Dataset", d: int):
    """One streaming pass: per-batch (n, sum, X^T X) moment partials,
    summed on the driver. State is d + d*d doubles per block — the
    classic single-pass distributed-PCA shape (the Gram matrix is the
    only thing that crosses the wire; vectors never leave their
    block)."""
    def partial(b: pa.Table) -> pa.Table:
        X = np.array([np.asarray(v, dtype=np.float64) for v in
                      b.column("embedding").to_pylist()])
        if X.size == 0:
            X = np.zeros((0, d))
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tobytes()], pa.binary()),
            "xtx": pa.array([(X.T @ X).tobytes()], pa.binary())})

    n_tot = 0
    s_tot = np.zeros(d)
    xtx_tot = np.zeros((d, d))
    for t in ray.get(ds.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
                     .to_arrow_refs()):
        for row in t.to_pylist():
            n_tot += row["n"]
            s_tot += np.frombuffer(row["s"], dtype=np.float64)
            xtx_tot += np.frombuffer(row["xtx"],
                                     dtype=np.float64).reshape(d, d)
    return n_tot, s_tot, xtx_tot


def embedding_pca_moments(sf_dir: str) -> pa.Table:
    """SQL-checkable slice of the distributed-PCA fit (VERDICT r3
    item 9): the covariance moments that ``embedding_pca`` reduces —
    per dimension (n, sum x, sum x^2) plus the adjacent cross-moment
    sum x_d*x_{d+1} (one off-diagonal Gram entry per dim, so the
    X^T X partial combine is exercised off the diagonal too) — come
    from the SAME ``_pca_moment_partials`` pass the eigendecomposition
    consumes, and DuckDB recomputes them with UNNEST/list indexing.
    Sums are rounded to 5 decimals on both sides (the lineitem_corr
    convention; float64 combine-order wobble is ~1e-9 at these
    magnitudes)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    first = ds.take(1)
    if not first:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "sum_x": pa.array([], pa.float64()),
                         "sum_xx": pa.array([], pa.float64()),
                         "sum_xy_next": pa.array([], pa.float64())})
    d = len(first[0]["embedding"])
    n, s, xtx = _pca_moment_partials(ds, d)
    xy = np.append(np.diag(xtx, 1), 0.0)   # last dim has no successor
    return pa.table({
        "dim": pa.array(np.arange(1, d + 1), pa.int64()),  # 1-indexed
        "n": pa.array(np.full(d, n), pa.int64()),
        "sum_x": pa.array(np.round(s, 5), pa.float64()),
        "sum_xx": pa.array(np.round(np.diag(xtx), 5), pa.float64()),
        "sum_xy_next": pa.array(np.round(xy, 5), pa.float64()),
    })


def embedding_pca(sf_dir: str, k: int = 8) -> pa.Table:
    """Distributed PCA with a driver-visible self-check: fit the top-k
    components from single-pass moment partials (mean + Gram matrix
    tree-combine; eigendecomposition of the d x d covariance on the
    driver — d is the embedding width, never the corpus), then verify
    against a FULL local numpy recompute at check scale
    (crawl_vs_expected-style counters). Returns one row per component:
    (component, explained_var_ratio, check_max_abs_diff, check_ok).
    Component signs are normalized (largest-|entry| positive) so the
    comparison is deterministic."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    first = ds.take(1)
    if not first:
        return pa.table({"component": pa.array([], pa.int64()),
                         "explained_var_ratio": pa.array([], pa.float64()),
                         "check_max_abs_diff": pa.array([], pa.float64()),
                         "check_ok": pa.array([], pa.int8())})
    d = len(first[0]["embedding"])
    n, s, xtx = _pca_moment_partials(ds, d)

    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                    # k x d
    evr = evals[order] / evals.sum()
    # deterministic sign: largest-|entry| coordinate positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]

    # ground truth at check scale: full local recompute from the raw
    # vectors (same pattern as the other *_check queries)
    X = np.array([np.asarray(r["embedding"], dtype=np.float64)
                  for r in ds.take_all()])
    cov_ref = np.cov(X, rowvar=False)
    evals_r, evecs_r = np.linalg.eigh(cov_ref)
    order_r = np.argsort(evals_r)[::-1][:k]
    comps_r = evecs_r[:, order_r].T
    evr_r = evals_r[order_r] / evals_r.sum()
    for i in range(len(comps_r)):
        j = int(np.argmax(np.abs(comps_r[i])))
        if comps_r[i, j] < 0:
            comps_r[i] = -comps_r[i]
    diffs = np.abs(comps - comps_r).max(axis=1)
    diffs = np.maximum(diffs, np.abs(evr - evr_r))
    return pa.table({
        "component": pa.array(np.arange(len(comps)), pa.int64()),
        "explained_var_ratio": pa.array(np.round(evr, 6), pa.float64()),
        "check_max_abs_diff": pa.array(np.round(diffs, 9), pa.float64()),
        "check_ok": pa.array((diffs < 1e-6).astype(np.int8), pa.int8()),
    })
