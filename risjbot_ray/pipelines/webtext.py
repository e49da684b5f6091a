"""Webtext curation operators for LLM training-data pipelines, beyond
the reference's operator set (per the build brief): benchmark
decontamination, tile-granular exact-substring dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", at k-token
tile granularity), deterministic domain-mix sampling, and a distributed
global shuffle rank.

Each operator is expressed Ray-Data-first and each has an exact ANSI-SQL
DuckDB oracle in ``__ray_entry__.oracle_sql()``:

- ``decontaminate``: the benchmark n-gram set is a SMALL fixed side
  (real benchmark suites are ~10^5 grams regardless of corpus size) —
  built once, ``ray.put`` once, membership-probed inside ``map_batches``.
  No shuffle at all; the corpus streams through a single filter pass.
- ``tile_dedup``: only four int64 columns per tile ride the
  winner-selection shuffle (128-bit digest split into two int64s, a
  coarse bucket key, an encoded site rank — never the tile text), the
  exchange sorts small-int bucket keys only, and reconstruction unions
  the DROPPED-tile markers (the dup fraction — far fewer rows than the
  survivors) with the raw doc text inside a doc-bucketed
  ``map_groups`` — one text shuffle, zero joins (Ray 2.49's hash join
  chokes on wide payloads); docs with no dropped tiles skip re-tiling.
- ``domain_sample``: stateless hash-threshold filter, zero shuffle.
- ``shuffle_rank``: bucketed prefix-sum (same shape as
  ``textstats.pack_stream``) — 256 bucket counts on the driver, ranks
  assigned per bucket; at 10^10 docs the driver holds 256 ints.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
import zlib

import numpy as np
import pyarrow as pa
import ray

TILE_K = 8          # tokens per dedup tile
NGRAM_N = 8         # tokens per decontamination n-gram
BENCH_MOD = 97      # synthetic benchmark membership: doc_id % 97 == 0


def _documents(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=columns)


def _coalesce(mat_ds: "ray.data.Dataset",
              target_block_mb: int = 32) -> "ray.data.Dataset":
    """Coalesce a MATERIALIZED dataset's blocks toward
    ``target_block_mb`` if they are pathologically small. Selective
    filters (the curation gate drops >50% of rows) and per-bucket
    ``map_groups`` outputs leave hundreds of sub-MB blocks; every
    downstream sort exchange then pays per-block-pair scheduling cost
    quadratic in block count for no parallelism benefit. At real scale
    blocks sit near the ~128 MB target and this is a no-op; the floor
    of one block per 2xCPU keeps enough parallelism either way."""
    nb = mat_ds.num_blocks()
    size = mat_ds.size_bytes() or 0
    want = max(int(ray.cluster_resources().get("CPU", 8)) * 2,
               size // (target_block_mb << 20) + 1)
    if nb > want * 2:
        return mat_ds.repartition(want).materialize()
    return mat_ds


def _counts_by(ds: "ray.data.Dataset", col: str) -> dict:
    """Per-value totals of ``col`` via in-batch partial counts + a
    driver merge of (#blocks x #distinct) tiny rows — never a sort
    exchange just to count. Null-safe: None is its own group (matching
    SQL GROUP BY), via Counter on non-integer columns."""
    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if pa.types.is_integer(arr.type) and arr.null_count == 0:
            # any-null integer chunks go through Counter below: their
            # to_numpy round-trips through float NaN, which both
            # crashes the int64 rebuild and could mis-bucket > 2^53
            v, n = np.unique(arr.to_numpy(zero_copy_only=False),
                             return_counts=True)
            vals = v.tolist()
        else:
            from collections import Counter
            c = Counter(arr.to_pylist())
            vals, n = list(c.keys()), list(c.values())
        return pa.table({col: pa.array(vals, arr.type),
                         "n": pa.array(np.asarray(n, dtype=np.int64),
                                       pa.int64())})

    sch = ds.schema(fetch_if_missing=True)
    if sch is None or col not in sch.names:
        return {}          # empty upstream loses its schema entirely
    out: dict = {}
    for t in ray.get(ds.select_columns([col])
                     .map_batches(partial, batch_format="pyarrow")
                     .to_arrow_refs()):
        for v, n in zip(t.column(col).to_pylist(),
                        t.column("n").to_pylist()):
            out[v] = out.get(v, 0) + int(n)
    return out


def fixed_pool(cap: int = 16) -> int:
    """Fixed actor-pool size for bounded batch stages. An autoscaling
    ``(1, N)`` pool RAMPS on the critical path — bench-measured: the
    perplexity scorer fell 9.4 s -> 3.9 s at 100k docs when switched
    to a fixed pool (the same lesson decontaminate_fuzzy and
    enrich_full learned) — so bounded jobs ask for every actor up
    front and let idle ones cost only their spawn."""
    return max(2, min(cap,
                      int(ray.cluster_resources().get("CPU", 8)) // 2))


def _segment_sum_i64(seg: np.ndarray, w: np.ndarray,
                     n: int) -> np.ndarray:
    """Exact int64 per-segment sums: sort by segment id and
    ``np.add.reduceat`` in INTEGER arithmetic. The drop-in
    ``np.bincount(seg, weights=w)`` accumulates in float64, which
    silently stops being exact once a per-segment sum passes 2^53 —
    the operators advertising exact order-independent integer sums
    must not inherit that cliff."""
    out = np.zeros(n, np.int64)
    if not len(seg):
        return out
    order = np.argsort(seg, kind="stable")
    si = seg[order]
    sw = np.asarray(w)[order].astype(np.int64, copy=False)
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    out[si[starts]] = np.add.reduceat(sw, starts)
    return out


def _coalesce_for_exchange(ds: "ray.data.Dataset",
                           floor_blocks: int = 8,
                           target_block_mb: int = 64
                           ) -> "ray.data.Dataset":
    """Materialize + coalesce a dataset that is about to feed a sort
    exchange (groupby). A sort's map x reduce fan-out is quadratic in
    block count, so hundreds of sub-MB blocks (the shape selective
    map stages leave behind) cost seconds of pure scheduling; the
    exchange itself restores downstream parallelism, so the floor here
    is lower than ``_coalesce``'s compute-stage floor. At real scale
    blocks sit near target_block_mb and this is a no-op passthrough."""
    mat = ds.materialize()
    size = mat.size_bytes() or 0
    want = max(floor_blocks, size // (target_block_mb << 20) + 1)
    if mat.num_blocks() > want * 2:
        return mat.repartition(want).materialize()
    return mat


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------

# Gram identity is a 64-bit rolling-polynomial hash over md5-based
# token hashes (deterministic across processes — Python's hash() is
# salted per worker). Broadcasting the bench set as ONE sorted uint64
# numpy array makes the per-actor ray.get a zero-copy plasma read:
# the previous frozenset of ~510k 8-token tuples cost ~5 s of
# unpickling PER ACTOR and gated the whole curation stage wall.
# Exactness is md5-grade, the same class as exact_dedup's digests:
# a false membership needs a 64-bit collision between a corpus gram
# and a bench gram (expected ~1e-12 at bench scale; the
# decontamination oracles pin that none occurs on the test corpora).
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)
_TOKEN_CACHE_MAX = 1 << 20      # bound per-actor vocab cache growth


def _token_h64(tok: str, cache: dict) -> int:
    h = cache.get(tok)
    if h is None:
        h = int.from_bytes(
            hashlib.md5(tok.encode("utf-8", "surrogatepass"))
            .digest()[:8], "little")
        if len(cache) >= _TOKEN_CACHE_MAX:
            cache.clear()
        cache[tok] = h
    return h


def _gram_hash_arr(words: list[str], n: int, cache: dict) -> np.ndarray:
    """uint64 hash per n-gram of ``words`` (Horner over token hashes:
    ``g_i = sum_j th[i+j] * MULT^(n-1-j)`` with uint64 wraparound) —
    n-1 vectorized ops per doc, no tuple/string materialization."""
    m = len(words)
    if m < n:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_h64(w, cache) for w in words),
                     dtype=np.uint64, count=m)
    g = th[:m - n + 1].copy()
    for j in range(1, n):
        g = g * _GRAM_MULT + th[j:m - n + 1 + j]
    return g


def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``vals`` in a sorted uint64 array."""
    if len(sorted_arr) == 0 or len(vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(sorted_arr, vals)
    pos[pos == len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[pos] == vals


class _ContaminationProbe:
    """Actor-pool stage: the benchmark gram-hash array is fetched from
    the object store ONCE per actor (zero-copy plasma read), then every
    batch is a vectorized searchsorted membership probe."""

    def __init__(self, bench_ref) -> None:
        self.bench: np.ndarray = ray.get(bench_ref)
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_n = [], []
        for did, t in zip(ids, texts):
            if did % BENCH_MOD == 0:
                continue        # benchmark docs are not scored
            grams = np.unique(_gram_hash_arr((t or "").split(),
                                             NGRAM_N, self._cache))
            hits = int(_in_sorted(self.bench, grams).sum())
            out_id.append(did)
            out_n.append(hits)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_contaminated": pa.array(out_n, pa.int64()),
            "contaminated": pa.array([n > 0 for n in out_n], pa.bool_()),
        })


def _bench_gram_ref(sf_dir: str):
    """Build the benchmark gram-hash set DISTRIBUTED and return its
    ``ray.put`` ref as ONE sorted unique uint64 numpy array: per-batch
    hashing + dedup inside ``map_batches``, a tiny
    ``np.unique(concat)`` merge on the driver, and a zero-copy read in
    every consuming actor."""
    def _gram_hashes(b: pa.Table) -> pa.Table:
        mask = np.mod(b.column("doc_id").to_numpy(), BENCH_MOD) == 0
        cache: dict = {}
        parts = [_gram_hash_arr((t or "").split(), NGRAM_N, cache)
                 for t in b.filter(pa.array(mask))
                 .column("text").to_pylist()]
        u = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, dtype=np.uint64))
        return pa.table({"gram_h": pa.array(u, pa.uint64())})

    parts = []
    for t in ray.get(_documents(sf_dir, ["doc_id", "text"])
                     .map_batches(_gram_hashes,
                                  batch_format="pyarrow")
                     .to_arrow_refs()):
        # zero-row upstream blocks can surface schemaless
        if t.num_rows and "gram_h" in t.column_names:
            parts.append(t.column("gram_h").to_numpy())
    merged = (np.unique(np.concatenate(parts)) if parts
              else np.empty(0, dtype=np.uint64))
    return ray.put(merged)


def decontaminate(sf_dir: str):
    """Flag every non-benchmark document that shares any ``NGRAM_N``-gram
    with the benchmark set (docs with ``doc_id % BENCH_MOD == 0`` stand
    in for a held-out eval suite; in production the benchmark is an
    external small input, so the bench-extraction scan disappears).

    Returns (doc_id, n_contaminated, contaminated) for all non-benchmark
    docs. ``n_contaminated`` counts DISTINCT matched grams."""
    bench_ref = _bench_gram_ref(sf_dir)

    return (_documents(sf_dir, ["doc_id", "text"])
            .map_batches(_ContaminationProbe,
                         fn_constructor_args=(bench_ref,),
                         batch_format="pyarrow",
                         concurrency=fixed_pool()))


# --------------------------------------------------------------------------
# tile-granular exact-substring dedup
# --------------------------------------------------------------------------

def _tiles(text: str, k: int = TILE_K) -> list[str]:
    toks = text.split()
    return [" ".join(toks[j * k:(j + 1) * k])
            for j in range(math.ceil(len(toks) / k))]


def tile_dedup(sf_dir: str, k: int = TILE_K):
    """Exact-substring dedup at ``k``-token tile granularity: partition
    each doc's tokens into consecutive k-token tiles; a tile survives
    only at its global first occurrence (ordered by doc_id, tile_no);
    docs are rebuilt from their surviving tiles.

    Returns (doc_id, text_dedup, n_tiles, n_tiles_kept) for every doc.
    """
    return _tile_dedup_over(_documents(sf_dir, ["doc_id", "text"]), k)


_TILE_NO_BITS = 20  # per-doc tile index fits 20 bits (≤ 8M tokens/doc)


def _explode_tiles(batch: pa.Table, k: int, nbuckets: int) -> pa.Table:
    """Explode (doc_id, text) rows into tile-hash rows (h_hi, h_lo,
    hb, rank). The 128-bit digest rides the shuffle as TWO int64
    columns plus a coarse bucket key: the exchange sorts ONLY by the
    small-int bucket (cheap), the exact 128-bit first-occurrence dedup
    is a vectorized lexsort inside each bucket. (Grouping by the full
    digest was measured 10-20x slower — Ray's sort shuffle then sorts
    10^6+ unique wide keys; grouping per-digest with map_groups costs
    one Python call per distinct tile.)"""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    o_h, o_rank = [], []
    for did, t in zip(ids, texts):
        assert did < (1 << 43), "doc_id overflows rank encoding"
        base = did << _TILE_NO_BITS
        tiles = _tiles(t or "", k)
        assert len(tiles) < (1 << _TILE_NO_BITS), \
            "doc exceeds 2^20 tiles"
        for j, tile in enumerate(tiles):
            o_h.append(hashlib.md5(tile.encode("utf-8")).digest())
            o_rank.append(base + j)
    from risjbot_ray.functions.digests import bucket_of, pack_digests
    hs = pack_digests(b"".join(o_h))
    return pa.table({"h_hi": pa.array(hs[:, 0], pa.int64()),
                     "h_lo": pa.array(hs[:, 1], pa.int64()),
                     "hb": pa.array(bucket_of(hs[:, 0], nbuckets),
                                    pa.int64()),
                     "rank": pa.array(o_rank, pa.int64())})


def _tile_dedup_over(docs_ds: "ray.data.Dataset", k: int = TILE_K,
                     passthrough: tuple[str, ...] = (),
                     nbuckets: int = 4096):
    """Tile dedup over an arbitrary (doc_id, text, *passthrough)
    Dataset — the composition-friendly core of ``tile_dedup``.

    Winner selection shuffles on a COARSE bucket key (h_hi % nbuckets)
    so the exchange sorts small ints, and resolves the exact 128-bit
    first occurrence with one vectorized lexsort per bucket. Each
    tile's site is encoded as rank = doc_id * 2^20 + tile_no (int64;
    requires tile_no < 2^20 and doc_id < 2^43 — asserted at explode
    time), so "first occurrence" is a run-head pick after sorting by
    (h_hi, h_lo, rank).

    The rebuild groups by ``doc_id % nbuckets`` and rebuilds all docs
    of a bucket in one vectorized call. ``nbuckets`` bounds per-group
    payload at ~corpus_bytes / nbuckets on BOTH exchanges: the 4096
    default suits up to ~10^7-doc corpora; size it so a bucket's
    payload fits a worker heap (e.g. 10^6+ at 10^10 docs)."""

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_tiles(batch, k, nbuckets)

    def losers(df):
        # one call per bucket (nbuckets total): exact 128-bit
        # first-occurrence selection, fully vectorized — lexsort by
        # (h_hi, h_lo, rank), each key run's head (min rank) is the
        # surviving site, and every NON-head row is emitted as a
        # dropped-tile marker. Shipping losers instead of winners is
        # deliberate: curation corpora are mostly unique, so losers
        # (the dup fraction of tiles) are far fewer rows than winners
        # (~96% of tiles on the bench corpus → 24x fewer marker rows
        # through the rebuild exchange), and docs with zero losers
        # skip re-tiling entirely at rebuild. A pathological
        # everything-is-duplicate corpus inverts the ratio, but its
        # marker volume is still bounded by the tile count — the same
        # bound the winner encoding had.
        import pandas as pd
        hi = df["h_hi"].to_numpy()
        lo = df["h_lo"].to_numpy()
        rank = df["rank"].to_numpy()
        order = np.lexsort((rank, lo, hi))
        hi, lo, rank = hi[order], lo[order], rank[order]
        first = np.empty(len(hi), dtype=bool)
        if len(hi):
            first[0] = True
            first[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        r = rank[~first]
        return pd.DataFrame({
            "doc_id": pd.Series(r >> _TILE_NO_BITS, dtype="int64"),
            "tile_no": pd.Series(r & ((1 << _TILE_NO_BITS) - 1),
                                 dtype="int64"),
        })

    # docs_ds is consumed twice (explode pass + rebuild pass). It is
    # deliberately NOT materialized: upstream stages are deterministic,
    # and re-streaming two pruned passes beats pinning the whole text
    # corpus in the object store at 100-TB inputs.
    tiles = _coalesce_for_exchange(docs_ds.map_batches(
        lambda b: explode(b.select(["doc_id", "text"])),
        batch_format="pyarrow"))
    drop = tiles.groupby("hb").map_groups(losers,
                                          batch_format="pandas")

    return _rebuild_from_drops(docs_ds, drop, k, passthrough, nbuckets)


# Broadcast-rebuild cutoff: marker sets up to this many rows (~16 MB
# as one packed int64 array) ship to every rebuild task via ray.put
# instead of a corpus-wide exchange. Curation corpora are mostly
# unique, so the marker set (the DUP fraction of tiles) normally sits
# far below this; above it the union+groupby fallback keeps per-task
# memory bounded.
_BROADCAST_DROP_MAX = 2_000_000


def _rebuild_from_drops(docs_ds: "ray.data.Dataset",
                        drop: "ray.data.Dataset", k: int,
                        passthrough: tuple[str, ...],
                        nbuckets: int):
    """Rebuild deduped docs from a (doc_id, tile_no) dropped-tile
    marker Dataset.

    Fast path (marker count <= _BROADCAST_DROP_MAX, the common case —
    markers are only the DUPLICATED tiles): pack the markers into ONE
    sorted int64 array (doc_id << 20 | tile_no), ``ray.put`` it, and
    rebuild with a streaming ``map_batches`` over the docs — zero
    all-to-all exchange, the corpus text never moves, each task finds
    its docs' drops with two vectorized searchsorteds.

    Fallback (dup-heavy corpora): union markers (tile_no >= 0, text
    null) with the raw docs (tile_no = -1) and re-tile per doc-bucket
    — the doc text crosses the exchange exactly once, no join."""
    drop_mat = drop.materialize()
    if drop_mat.count() <= _BROADCAST_DROP_MAX:
        parts = [t for t in ray.get(drop_mat.to_arrow_refs())
                 if t.num_rows]
        if parts:
            cat = pa.concat_tables(parts)
            packed = ((cat.column("doc_id").to_numpy()
                       << _TILE_NO_BITS)
                      | cat.column("tile_no").to_numpy())
            ranks_ref = ray.put(np.sort(packed))
        else:
            ranks_ref = ray.put(np.empty(0, dtype=np.int64))

        def rebuild_bcast(df):
            import pandas as pd
            ranks = ray.get(ranks_ref)
            ids = df["doc_id"].to_numpy().astype(np.int64)
            base = ids << _TILE_NO_BITS
            lo = np.searchsorted(ranks, base)
            hi = np.searchsorted(ranks, base + (1 << _TILE_NO_BITS))
            texts = df["text"].tolist()
            o_text, o_nt, o_nk = [], [], []
            mask = (1 << _TILE_NO_BITS) - 1
            for i in range(len(ids)):
                toks = (texts[i] or "").split()
                nt = math.ceil(len(toks) / k)
                if hi[i] > lo[i]:
                    dropped = set((ranks[lo[i]:hi[i]] & mask).tolist())
                    # THE tile split (drop markers were computed from
                    # _explode_tiles' _tiles boundaries — rebuild must
                    # tile identically or the wrong tiles drop)
                    tiles = _tiles(texts[i] or "", k)
                    text = " ".join(t for j, t in enumerate(tiles)
                                    if j not in dropped)
                    nk = nt - len(dropped)
                else:
                    text = " ".join(toks)
                    nk = nt
                o_text.append(text)
                o_nt.append(nt)
                o_nk.append(nk)
            out = {"doc_id": pd.Series(ids, dtype="int64")}
            for col in passthrough:
                out[col] = df[col].tolist()
            out.update({"text_dedup": o_text,
                        "n_tiles": pd.Series(o_nt, dtype="int64"),
                        "n_tiles_kept": pd.Series(o_nk,
                                                  dtype="int64")})
            return pd.DataFrame(out)

        return docs_ds.map_batches(rebuild_bcast,
                                   batch_format="pandas")
    return _rebuild_union_path(docs_ds, drop_mat, k, passthrough,
                               nbuckets)


def _rebuild_union_path(docs_ds: "ray.data.Dataset",
                        drop: "ray.data.Dataset", k: int,
                        passthrough: tuple[str, ...],
                        nbuckets: int):
    """Exchange-based rebuild for dup-heavy corpora (marker set too
    large to broadcast): see ``_rebuild_from_drops``."""
    def dbucket_of(ids: "pa.Array") -> pa.Array:
        return pa.array(ids.to_numpy(zero_copy_only=False)
                        % nbuckets, pa.int64())

    _UNION_COLS = ["doc_id", "text", *passthrough, "tile_no", "dbucket"]

    docs = docs_ds.map_batches(
        lambda b: b.append_column(
            "tile_no", pa.array([-1] * len(b), pa.int64()))
        .append_column("dbucket", dbucket_of(b.column("doc_id")))
        .select(_UNION_COLS),
        batch_format="pyarrow")

    # null-column types from the DOCS schema, resolved ONCE on the
    # driver: a non-string passthrough (e.g. an int64 fetch_ts) must
    # carry the same type on both union sides or the positional union
    # yields blocks with disagreeing schemas
    _sch = docs_ds.schema(fetch_if_missing=True)
    _pa_sch = getattr(_sch, "base_schema", _sch)
    _pt_types = {col: _pa_sch.field(col).type for col in passthrough}

    def markfill(b: pa.Table) -> pa.Table:
        b = b.append_column("text", pa.array([None] * len(b),
                                             pa.string()))
        for col in passthrough:
            b = b.append_column(col, pa.array([None] * len(b),
                                              _pt_types[col]))
        b = b.append_column("dbucket", dbucket_of(b.column("doc_id")))
        # both union sides must present the SAME column order — Ray's
        # union concatenates blocks positionally-schema'd
        return b.select(_UNION_COLS)

    marks = drop.map_batches(markfill, batch_format="pyarrow")

    def rebuild(df):
        # one call per ~64k-doc bucket. Dropped tile_nos are gathered
        # per doc (only dup-carrying docs appear); the common case — a
        # doc with no dropped tiles — takes a fast path that never
        # enumerates tiles: its deduped text is the whitespace-
        # normalized original (" ".join(tokens) == the join of all its
        # tiles) and n_tiles is ceil(n_tokens / k).
        import pandas as pd
        drop_rows = df[df["tile_no"] >= 0]
        drop_by_doc: dict[int, set[int]] = {}
        for did, tno in zip(drop_rows["doc_id"].to_numpy(),
                            drop_rows["tile_no"].to_numpy()):
            drop_by_doc.setdefault(int(did), set()).add(int(tno))
        text_rows = df[df["tile_no"] < 0].sort_values("doc_id")
        o_id, o_text, o_nt, o_nk = [], [], [], []
        o_pass: dict[str, list] = {col: [] for col in passthrough}
        for row in text_rows.itertuples(index=False):
            did = int(row.doc_id)
            dropped = drop_by_doc.get(did)
            toks = (row.text or "").split()
            nt = math.ceil(len(toks) / k)
            if dropped:
                tiles = _tiles(row.text or "", k)   # THE tile split
                text = " ".join(t for j, t in enumerate(tiles)
                                if j not in dropped)
                nk = nt - len(dropped)
            else:
                text = " ".join(toks)
                nk = nt
            o_id.append(did)
            o_text.append(text)
            o_nt.append(nt)
            o_nk.append(nk)
            for col in passthrough:
                o_pass[col].append(getattr(row, col))
        out = {"doc_id": pd.Series(o_id, dtype="int64")}
        for col in passthrough:
            out[col] = o_pass[col]
        out.update({"text_dedup": o_text,
                    "n_tiles": pd.Series(o_nt, dtype="int64"),
                    "n_tiles_kept": pd.Series(o_nk, dtype="int64")})
        return pd.DataFrame(out)

    return (docs.union(marks)
            .groupby("dbucket").map_groups(rebuild,
                                           batch_format="pandas"))


# --------------------------------------------------------------------------
# incremental tile dedup against a persisted ledger
# --------------------------------------------------------------------------

def tile_dedup_incremental(sf_dir_or_ds, ledger_dir: str,
                           k: int = TILE_K,
                           passthrough: tuple[str, ...] = (),
                           nbuckets: int = 4096):
    """Dedup a NEW document shard against a persisted tile-hash ledger
    and fold the shard's fresh tiles back into the ledger — the
    continuous-ingestion workflow: each crawl snapshot dedups against
    everything already curated without re-processing the old corpus.

    Semantics: a tile in the new shard survives iff (a) its hash is
    absent from the ledger AND (b) this is its first occurrence within
    the shard (doc_id, tile_no order). Running shards A then B through
    an empty ledger produces exactly ``tile_dedup(A union B)`` when
    A's doc_ids precede B's — pinned by a pytest equivalence gate.

    Ledger layout: ``{ledger_dir}/part={hb}/delta-*.parquet`` holding
    distinct (h_hi, h_lo) rows, partitioned by the SAME coarse bucket
    key the tile shuffle groups on (``ledger.json`` records nbuckets
    and k; mismatched resumes are rejected). The ledger is therefore
    NEVER shuffled: only the new shard's int64 tile rows move, and each
    per-bucket task reads just its own ledger partition — the
    side-lookup join pattern. The driver SNAPSHOTS the ledger file
    list at call time and gate tasks read only snapshot files, so the
    result is a pure function of (shard, snapshot): re-executed or
    re-consumed tasks never see the deltas this run appends (at worst
    a retry re-appends the same hashes — harmless, membership is
    idempotent; compacting a partition means rewriting it as one
    file). ``ledger_dir`` must live on storage visible to every
    worker AND the driver — node-local paths silently shard the
    ledger per node on a multi-node cluster (same contract as the
    crawl's spill/checkpoint dirs; use the cluster's shared fs).

    Returns the same schema as ``tile_dedup`` for the new shard."""
    import glob as _glob
    import json

    docs_ds = (sf_dir_or_ds if not isinstance(sf_dir_or_ds, str)
               else _documents(sf_dir_or_ds, ["doc_id", "text"]))

    os.makedirs(ledger_dir, exist_ok=True)
    meta_path = os.path.join(ledger_dir, "ledger.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["nbuckets"] != nbuckets or meta["k"] != k:
            raise ValueError(
                f"ledger at {ledger_dir} was built with "
                f"nbuckets={meta['nbuckets']} k={meta['k']}; "
                f"got nbuckets={nbuckets} k={k}")
    else:
        with open(meta_path, "w") as f:
            json.dump({"nbuckets": nbuckets, "k": k}, f)

    # driver-side snapshot: hb -> existing delta files (tiny: paths
    # only); gates read ONLY these, never later-appended deltas
    snapshot: dict[int, list[str]] = {}
    for pdir in _glob.glob(os.path.join(ledger_dir, "part=*")):
        try:
            hb_of = int(os.path.basename(pdir).split("=", 1)[1])
        except ValueError:
            continue
        fl = sorted(_glob.glob(os.path.join(pdir, "*.parquet")))
        if fl:
            snapshot[hb_of] = fl
    snap_ref = ray.put(snapshot)
    # deltas stage as .pending files this run tags, committed (renamed
    # to .parquet) only AFTER the rebuilt output materializes: a run
    # that dies mid-way must not leave its tiles in the ledger, or its
    # own RE-RUN would find every head "ledger-known" and silently
    # rebuild the whole shard to empty text
    import uuid as _uuid
    run_tag = _uuid.uuid4().hex[:8]

    def gate(df):
        import uuid

        import pandas as pd
        import pyarrow.parquet as pq

        hb = int(df["hb"].iloc[0])
        part_dir = os.path.join(ledger_dir, f"part={hb}")
        files = ray.get(snap_ref).get(hb, [])
        known = (pq.read_table(files).to_pandas()
                 if files else None)

        hi = df["h_hi"].to_numpy()
        lo = df["h_lo"].to_numpy()
        rank = df["rank"].to_numpy()
        order = np.lexsort((rank, lo, hi))
        hi, lo, rank = hi[order], lo[order], rank[order]
        first = np.empty(len(hi), dtype=bool)
        if len(hi):
            first[0] = True
            first[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])

        heads = pd.DataFrame({"h_hi": hi[first], "h_lo": lo[first]})
        if known is not None and len(known):
            m = heads.merge(known.drop_duplicates(),
                            on=["h_hi", "h_lo"], how="left",
                            indicator=True)
            head_known = (m["_merge"] == "both").to_numpy()
        else:
            head_known = np.zeros(len(heads), dtype=bool)

        # drops: every non-head + every head whose tile the ledger
        # already holds
        drop_rank = np.concatenate(
            [rank[~first], rank[first][head_known]])
        fresh = heads[~head_known]
        if len(fresh):
            os.makedirs(part_dir, exist_ok=True)
            pq.write_table(
                pa.table({"h_hi": pa.array(fresh["h_hi"].to_numpy(),
                                           pa.int64()),
                          "h_lo": pa.array(fresh["h_lo"].to_numpy(),
                                           pa.int64())}),
                os.path.join(
                    part_dir,
                    f"delta-{run_tag}-{uuid.uuid4().hex}"
                    ".parquet.pending"))
        return pd.DataFrame({
            "doc_id": pd.Series(drop_rank >> _TILE_NO_BITS,
                                dtype="int64"),
            "tile_no": pd.Series(drop_rank & ((1 << _TILE_NO_BITS) - 1),
                                 dtype="int64"),
        })

    tiles = _coalesce_for_exchange(docs_ds.map_batches(
        lambda b: _explode_tiles(b.select(["doc_id", "text"]),
                                 k, nbuckets),
        batch_format="pyarrow"))
    drop = tiles.groupby("hb").map_groups(gate, batch_format="pandas")

    out = _rebuild_from_drops(docs_ds, drop, k, passthrough,
                              nbuckets).materialize()
    # the output is durable in the object store: commit this run's
    # staged deltas (rename is atomic; membership is idempotent, so a
    # crash mid-commit re-runs as a partial-duplicate fold — harmless)
    for p in _glob.glob(os.path.join(
            ledger_dir, "part=*",
            f"delta-{run_tag}-*.parquet.pending")):
        os.replace(p, p[:-len(".pending")])
    return out


# --------------------------------------------------------------------------
# deterministic domain-mix sampling
# --------------------------------------------------------------------------

def _mix_rate(source: str) -> float:
    """Target sampling rate per source: srcN -> (1 + N % 9) / 10, i.e.
    0.1..0.9 — stands in for an externally supplied domain-weight map."""
    return (1 + int(source[3:]) % 9) / 10.0


def _unit_hash(doc_id: int, salt: str) -> float:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()
    return int(h[:8], 16) / 2 ** 32


def domain_sample(sf_dir: str):
    """Deterministic hash-threshold sampling to per-source target rates:
    keep a doc iff md5(doc_id || ':mix')[:8] / 2^32 < rate(source).
    Stateless, shuffle-free, and reproducible — the same doc survives on
    every run and on every cluster size. Returns (doc_id, source,
    sample_key) for the kept docs."""

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        keys = np.array([_unit_hash(d, "mix") for d in ids])
        rates = np.array([_mix_rate(s) for s in srcs])
        m = keys < rates
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)[m]),
            "source": pa.array(np.asarray(srcs, dtype=object)[m],
                               pa.string()),
            "sample_key": pa.array(keys[m], pa.float64()),
        })

    return (_documents(sf_dir, ["doc_id", "source"])
            .map_batches(sample, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# stratified exact-k sampling + per-domain token caps
# --------------------------------------------------------------------------

def _salted_grouped_topk(docs_ds, group_col: str, out_col: str,
                         salt: str, cap):
    """THE salted grouped top-k selection shared by stratified_sample
    and temperature_mix (and SQL-pinned by both oracles): within each
    group keep the ``cap`` smallest md5(doc_id || ':' || salt) hex
    keys (doc_id tiebreak), ranked 1..cap. ``cap`` is an int (same
    for every group) or a dict group -> quota. Scale shape: each
    BATCH pre-filters to its LOCAL per-group top-cap (vectorized
    sort + cumcount), so the per-group merge sees at most
    cap x #blocks rows, never the corpus — the politeness scheduler's
    pattern."""
    import pandas as pd
    cap_of = (lambda g, c=cap: c) if isinstance(cap, int) \
        else (lambda g, c=cap: c.get(g, 0))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            out_col: batch.column(group_col).to_pylist(),
        })
        df["key"] = [hashlib.md5(f"{d}:{salt}".encode()).hexdigest()
                     for d in df["doc_id"]]
        df = df.sort_values([out_col, "key", "doc_id"],
                            kind="mergesort")
        rn = df.groupby(out_col, sort=False).cumcount().to_numpy()
        caps = df[out_col].map(cap_of).to_numpy()
        return pa.Table.from_pandas(df[rn < caps],
                                    preserve_index=False)

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        q = cap_of(df[out_col].iloc[0])
        df = (df.sort_values(["key", "doc_id"], kind="mergesort")
                .head(q).reset_index(drop=True))
        df["sample_rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["doc_id", out_col, "sample_rank"]]

    return (_coalesce_for_exchange(
                docs_ds.map_batches(partial, batch_format="pyarrow"))
            .groupby(out_col).map_groups(final, batch_format="pandas"))


def stratified_sample(sf_dir: str, k: int = 50, group_col: str = "lang"):
    """Exactly ``k`` docs per group, chosen deterministically by the
    shared salted grouped top-k rule (salt ':strat'). Returns
    (doc_id, grp, sample_rank 1..k). SQL-exact (ROW_NUMBER over
    PARTITION BY ... ORDER BY md5 key)."""
    return _salted_grouped_topk(
        _documents(sf_dir, ["doc_id", group_col]),
        group_col, "grp", "strat", k)


def temperature_mix(sf_dir: str, tau: float = 0.7, total: int = 200):
    """Temperature-based domain mixing (the XLM-R / mT5 resampling
    rule): source d gets a quota k_d = floor(total * q_d) docs with
    q_d proportional to (n_d / N)^tau — tau is the flattening exponent
    (mT5's alpha = 1/T): tau < 1 upweights small domains toward
    uniform, tau = 1 keeps natural proportions.
    Within a source, selection is the deterministic md5-order rule
    shared with stratified_sample (quotas above n_d self-cap: rank
    never exceeds group size — sampling without replacement).

    Scale shape: pass 1 is an O(#sources) count tree-combine (no row
    shuffle); the driver turns counts into quotas (#sources floats)
    and the quota dict rides the pass-2 closure; pass 2 is the salted
    grouped top-k pattern — each batch keeps at most its per-source
    quota locally, so the per-source merge sees <= k_d x #blocks rows,
    never the corpus. Returns (doc_id, source, sample_rank)."""
    import pandas as pd

    from risjbot_ray.pipelines.lm import _agg_count_partials

    docs = _documents(sf_dir, ["doc_id", "source"])

    def cpartial(b: pa.Table) -> pa.Table:
        vc = pd.Series(b.column("source").to_pylist()).value_counts()
        return pa.table({"source": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    def cmerge(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("source", sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    t = _agg_count_partials(docs.map_batches(
        cpartial, batch_format="pyarrow", zero_copy_batch=True), cmerge)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string()),
                      "sample_rank": pa.array([], pa.int64())})
    if t is None:
        return ray.data.from_arrow(empty)
    cdf = t.to_pandas().sort_values("source").reset_index(drop=True)
    n_total = float(cdf["n"].sum())
    wt = (cdf["n"].to_numpy(np.float64) / n_total) ** tau
    # round before floor: quotas at an exact-integer boundary (e.g. a
    # perfectly uniform corpus) must not flip on ~1e-15 fp noise — the
    # SQL oracle applies the identical ROUND(..., 9) guard
    quota = {s: int(np.floor(np.round(total * w / wt.sum(), 9)))
             for s, w in zip(cdf["source"], wt)}
    return _salted_grouped_topk(docs, "source", "source", "tmix",
                                quota)


_CAP_KB_BITS = 12   # cutoff pre-pass key buckets (4096): the driver
#                     sees at most #sources x 4096 tiny rows, and the
#                     exact boundary pass touches ~N/4096 docs


def domain_token_cap(sf_dir: str, budget: int = 20_000):
    """Cap every source at ``budget`` tokens: keep docs in
    deterministic md5(doc_id || ':cap') order until the source's
    cumulative word count would exceed the budget (a doc is kept iff
    its OWN cumulative total fits). The standard curation guard
    against one domain dominating the mix.

    Scale shape (the crawl's politeness-cutoff pre-pass, reused): a
    cumulative scan cannot be batch-local, so pass 1 tree-combines
    per-(source, key-bucket) token sums — bounded by #sources x 2^12
    rows regardless of corpus size — and the driver locates each
    source's boundary BUCKET by cumsum. Pass 2 filters: strictly
    below-boundary buckets are kept outright (their cum totals are
    fully determined by the driver's prefix sums); only the boundary
    bucket's docs (~N/4096) flow to an exact per-source sort+cumsum.
    Returns (doc_id, source, n_words, cum_words) for kept docs."""
    import pandas as pd

    from risjbot_ray.pipelines.lm import _agg_count_partials

    def annotate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keys = [hashlib.md5(f"{d}:cap".encode()).hexdigest()
                for d in ids]
        kb = np.array([int(x[:3], 16) for x in keys], dtype=np.int64)
        nw = np.array([len(t.split()) if t else 0
                       for t in batch.column("text").to_pylist()],
                      dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": batch.column("source"),
            "key": pa.array(keys, pa.string()),
            "kb": pa.array(kb, pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
        })

    docs = _coalesce(
        _documents(sf_dir, ["doc_id", "source", "text"])
        .map_batches(annotate, batch_format="pyarrow").materialize())

    # pass 1: per-(source, bucket) token sums -> driver boundary scan
    def bucket_sums(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "kb": batch.column("kb").to_numpy(zero_copy_only=False),
            "n": batch.column("n_words").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["source", "kb"], sort=False)["n"].sum() \
              .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge_sums(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["source", "kb"], sort=False)["n"].sum() \
              .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = _agg_count_partials(
        docs.map_batches(bucket_sums, batch_format="pyarrow"),
        merge_sums)
    # per source: prefix[b] = tokens in buckets < b; boundary = first
    # bucket where prefix + bucket sum crosses the budget
    boundary: dict[str, int] = {}
    prefix_at_boundary: dict[str, int] = {}
    if sums is not None:
        sdf = sums.to_pandas().sort_values(["source", "kb"])
        for src, g in sdf.groupby("source", sort=False):
            cum = g["n"].cumsum().to_numpy()
            over = np.nonzero(cum > budget)[0]
            if len(over) == 0:
                boundary[src] = 1 << _CAP_KB_BITS      # nothing drops
                prefix_at_boundary[src] = int(cum[-1]) if len(cum) else 0
            else:
                i = int(over[0])
                boundary[src] = int(g["kb"].to_numpy()[i])
                prefix_at_boundary[src] = int(cum[i - 1]) if i else 0
    b_ref = ray.put((boundary, prefix_at_boundary))

    # pass 2a: below-boundary rows kept outright; boundary rows routed
    # to the exact epilogue (flag column, no second corpus read)
    def split(batch: pa.Table, which: str) -> pa.Table:
        bnd, _ = ray.get(b_ref)
        kb = batch.column("kb").to_numpy(zero_copy_only=False)
        srcs = batch.column("source").to_pylist()
        b = np.array([bnd.get(s, 1 << _CAP_KB_BITS) for s in srcs])
        return batch.filter(pa.array(kb < b if which == "below"
                                     else kb == b))

    below = docs.map_batches(split, batch_format="pyarrow",
                             fn_kwargs={"which": "below"})

    # below-boundary cum totals: bucket prefix (driver) + within-run
    # exact cumsum per source over the below rows, done per GROUP but
    # bounded: below rows are the kept set (<= budget tokens/source)
    def finish_below(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["key", "doc_id"], kind="mergesort")
        df["cum_words"] = df["n_words"].cumsum()
        return df[["doc_id", "source", "n_words", "cum_words"]]

    kept_below = (_coalesce_for_exchange(below)
                  .groupby("source")
                  .map_groups(finish_below, batch_format="pandas"))

    # pass 2b: exact boundary-bucket resolution (~N/4096 rows)
    def finish_boundary(df: "pd.DataFrame") -> "pd.DataFrame":
        _, pref = ray.get(b_ref)
        df = df.sort_values(["key", "doc_id"], kind="mergesort")
        off = pref.get(df["source"].iloc[0], 0) if len(df) else 0
        df["cum_words"] = df["n_words"].cumsum() + off
        df = df[df["cum_words"] <= budget]
        return df[["doc_id", "source", "n_words", "cum_words"]]

    at_boundary = docs.map_batches(split, batch_format="pyarrow",
                                   fn_kwargs={"which": "boundary"})
    kept_boundary = (_coalesce_for_exchange(at_boundary)
                     .groupby("source")
                     .map_groups(finish_boundary, batch_format="pandas"))

    return kept_below.union(kept_boundary)


# --------------------------------------------------------------------------
# snapshot diff
# --------------------------------------------------------------------------

_DIFF_NB = 256  # doc-id buckets: the exchange sorts this small int


def corpus_diff(ds_a: "ray.data.Dataset",
                ds_b: "ray.data.Dataset") -> "ray.data.Dataset":
    """Diff two corpus snapshots by content: returns (doc_id, status)
    with status in {added, removed, changed} (unchanged docs emit
    nothing — at snapshot scale they are the overwhelming majority and
    must never leave the compare). Each side collapses to
    (doc_id, md5(text), side) inside ``map_batches`` — the exchange
    carries 3 small columns, never text — and rows meet in doc-id-hash
    buckets where one vectorized pandas pass classifies them. The same
    bucketing both sides means no global join: at 100 TB this is one
    streaming pass per snapshot plus a bucketed small-row exchange."""
    import pandas as pd

    def hash_side(side: str):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            hs = [hashlib.md5((t or "").encode()).hexdigest()
                  for t in batch.column("text").to_pylist()]
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(hs, pa.string()),
                "side": pa.array([side] * len(ids), pa.string()),
                "db": pa.array(ids % _DIFF_NB, pa.int64()),
            })
        return f

    both = (ds_a.map_batches(hash_side("a"), batch_format="pyarrow")
            .union(ds_b.map_batches(hash_side("b"),
                                    batch_format="pyarrow")))

    def classify(df: "pd.DataFrame") -> "pd.DataFrame":
        p = df.pivot_table(index="doc_id", columns="side", values="h",
                           aggfunc="first")
        a = p["a"] if "a" in p else pd.Series(index=p.index, dtype=object)
        b = p["b"] if "b" in p else pd.Series(index=p.index, dtype=object)
        status = pd.Series(index=p.index, dtype=object)
        status[a.isna()] = "added"
        status[b.isna()] = "removed"
        status[a.notna() & b.notna() & (a != b)] = "changed"
        out = status.dropna().reset_index()
        out.columns = ["doc_id", "status"]
        return out

    return (_coalesce_for_exchange(both)
            .groupby("db").map_groups(classify, batch_format="pandas")
            .map_batches(lambda t: t.select(["doc_id", "status"]).cast(
                pa.schema([("doc_id", pa.int64()),
                           ("status", pa.string())])),
                batch_format="pyarrow"))


def doc_snapshot_diff(sf_dir: str):
    """Snapshot diff of documents vs a deterministically derived
    second snapshot (doc_id % 11 == 0 removed; % 7 == 0 of the rest
    re-edited with a ' v2' suffix; one new doc per % 13 == 0 id at
    doc_id + 1_000_000) — SQL-checkable end to end."""

    def derive_b(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        texts = batch.column("text").to_pylist()
        out_id, out_tx = [], []
        for d, t in zip(ids, texts):
            if d % 11 == 0:
                continue                      # removed in B
            out_id.append(int(d))
            out_tx.append((t or "") + " v2" if d % 7 == 0 else t)
        for d in ids[ids % 13 == 0]:
            out_id.append(int(d) + 1_000_000)  # added in B
            out_tx.append(f"new doc {d}")
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    a = _documents(sf_dir, ["doc_id", "text"])
    b = _documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(derive_b, batch_format="pyarrow")
    return corpus_diff(a, b)


# --------------------------------------------------------------------------
# corpus-wide duplicated-line removal (the CCNet/C4 boilerplate pass:
# lines that recur across documents — nav menus, cookie banners,
# share-button strings — are dropped everywhere they appear)
# --------------------------------------------------------------------------

_HOT_LINES_MAX = 2_000_000   # broadcast-side cap (rows, 8 bytes each)
_LINE_BLANK = " \t\r"


def _split_lines(text_col: pa.ChunkedArray | pa.Array,
                 pattern: str = "\n",
                 blank_chars: str = _LINE_BLANK):
    """Vectorized ``pattern`` split of a string column (default: the
    '\\n' LINE split). Returns ``(values, offsets, blank)``: the flat
    unit array, per-doc int64 offsets into it, and a bool numpy mask
    of blank units (only ``blank_chars`` — these never participate in
    dedup). Paragraph-granularity callers pass ``pattern='\\n\\n'``
    with newlines added to the blank class."""
    import pyarrow.compute as pc
    col = (text_col.combine_chunks()
           if isinstance(text_col, pa.ChunkedArray) else text_col)
    # null text == empty doc (one blank unit), same as ''.split(pat)
    lst = pc.split_pattern(pc.fill_null(col, ""), pattern=pattern)
    values = lst.values
    offsets = np.asarray(lst.offsets, dtype=np.int64)
    blank = np.asarray(
        pc.equal(pc.utf8_trim(values, blank_chars), ""))
    return values, offsets, blank


def _line_hashes(values: pa.Array) -> np.ndarray:
    """64-bit content hashes of a flat line array (polars xxhash with a
    fixed seed — deterministic across processes; used only INTERNALLY
    between the two passes, never persisted)."""
    import polars as pl
    return pl.from_arrow(values).hash(seed=0).to_numpy().view(np.int64)


# deterministic boilerplate injected into the derived multi-line view
# (the documents table is single-line; the view reflows it and plants
# the nav/footer lines a real crawl carries, so the drop path is
# exercised end to end — same injector convention as doc_snapshot_diff
# and the mojibake check)
_BOILER_HEAD = "Subscribe to our newsletter"
_BOILER_TAIL = "All rights reserved. Terms of use apply."
_LINE_WORDS = 12


def lined_view_batch(batch: pa.Table) -> pa.Table:
    """Derived multi-line corpus: reflow each doc into
    ``_LINE_WORDS``-word lines ([''] for empty docs), prepend
    ``_BOILER_HEAD`` when doc_id % 3 == 0, append ``_BOILER_TAIL``
    when doc_id % 5 == 0."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = []
    for d, t in zip(ids, texts):
        words = (t or "").split()
        lines = [" ".join(words[i:i + _LINE_WORDS])
                 for i in range(0, len(words), _LINE_WORDS)] or [""]
        if d % 3 == 0:
            lines.insert(0, _BOILER_HEAD)
        if d % 5 == 0:
            lines.append(_BOILER_TAIL)
        out.append("\n".join(lines))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(out, pa.string())})


_C4_TERMINAL = (".", "!", "?", '"')
_C4_MIN_LINE_WORDS = 5
_C4_MIN_KEPT_LINES = 3


def c4_clean_batch(batch: pa.Table) -> pa.Table:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) per doc of the lined
    view: keep lines that end in terminal punctuation, have >= 5 words
    and don't mention 'javascript'; flag docs containing 'lorem ipsum'
    or '{'; ``keep_doc`` iff >= 3 kept lines and neither flag."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    cols = {k: [] for k in ("n_lines", "n_kept", "has_lorem",
                            "has_brace", "keep_doc", "text_clean")}
    for t in texts:
        t = t or ""
        lines = t.split("\n")
        kept = [ln for ln in lines
                if ln.rstrip(" ").endswith(_C4_TERMINAL)
                and len(ln.split()) >= _C4_MIN_LINE_WORDS
                and "javascript" not in ln.lower()]
        lorem = "lorem ipsum" in t.lower()
        brace = "{" in t
        cols["n_lines"].append(len(lines))
        cols["n_kept"].append(len(kept))
        cols["has_lorem"].append(lorem)
        cols["has_brace"].append(brace)
        cols["keep_doc"].append(
            len(kept) >= _C4_MIN_KEPT_LINES and not lorem and not brace)
        cols["text_clean"].append("\n".join(kept))
    out = {"doc_id": pa.array(ids, pa.int64())}
    for k, v in cols.items():
        typ = (pa.int64() if k in ("n_lines", "n_kept")
               else pa.string() if k == "text_clean" else pa.bool_())
        out[k] = pa.array(v, typ)
    return pa.table(out)


def c4_clean(sf_dir: str):
    """C4 line-level cleaning over the :func:`lined_view_batch` derived
    corpus — one stateless fully-streaming ``map_batches`` pass, no
    shuffle, no state."""
    return (_documents(sf_dir, ["doc_id", "text"])
            .map_batches(lined_view_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(c4_clean_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


def line_dedup(sf_dir: str, max_docs: int = 1):
    """Remove every NON-BLANK line that occurs in more than ``max_docs``
    distinct documents (exact content match), rebuilding each doc from
    its kept lines — per doc: ``n_lines``, ``n_dropped``,
    ``text_clean``. Blank lines (only spaces/tabs/CR) never participate.
    Runs over the :func:`lined_view_batch` derived corpus.

    Scale shape: pass 1 ships 16-byte (line-hash, partial-count) rows
    — per-block combiner first, so the ``groupby`` exchange carries one
    row per distinct line per block, never line text. The hot set
    (count > max_docs) is boilerplate — a vanishing fraction of
    distinct lines — collected under an explicit count gate and
    broadcast once as a sorted int64 array; pass 2 is a stateless
    rebuild filter (one vectorized ``searchsorted`` per batch). Both
    passes are loop-free: Arrow ``split_pattern`` + a vectorized
    64-bit string hash + structured ``np.unique`` for per-doc-distinct,
    and an Arrow ``binary_join`` rebuild. For a corpus whose hot set
    itself exceeds the gate, shard pass 1/2 by ``hash % n_shards`` and
    run per shard."""
    docs = _documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(lined_view_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
    return line_dedup_over(docs, max_docs=max_docs)


_SCOPE_SEP = "\x1f"


def _scoped_line_hashes(batch: pa.Table, values: pa.Array,
                        offsets: np.ndarray,
                        scope_col: str | None) -> np.ndarray:
    """Line hashes, optionally salted with the row's ``scope_col`` value
    (joined ahead of the line with an unambiguous separator) so equal
    lines under different scopes never share a hash. Null scopes salt
    as ''."""
    import pyarrow.compute as pc
    if scope_col is None:
        return _line_hashes(values)
    scope = pc.fill_null(
        batch.column(scope_col).combine_chunks().cast(pa.string()), "")
    rep = scope.take(pa.array(np.repeat(
        np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets))))
    return _line_hashes(
        pc.binary_join_element_wise(rep, values, _SCOPE_SEP))


def _hot_hash_set(parts: "ray.data.Dataset", max_docs: int,
                  driver_merge_rows: int) -> np.ndarray:
    """Reduce (h, c, bucket) partial-count blocks to the SORTED int64
    array of hashes whose summed count exceeds ``max_docs`` — the
    size-gated reduce shared by the line- and gram-duplication passes.
    At or under ``driver_merge_rows`` partial rows (~24 bytes each) one
    driver-side merge beats Ray's sort-based groupby's fixed all-to-all
    overhead; above it, the coarse-bucketed ``map_groups`` shuffle runs
    and the driver only ever holds the POST-aggregation hot set (gated
    at ``_HOT_LINES_MAX`` — past that, shard by hash and run per
    shard)."""

    def _sum_filter(df):
        import pandas as pd
        h = df["h"].to_numpy()
        c = df["c"].to_numpy()
        hh, inv = np.unique(h, return_inverse=True)
        tot = _segment_sum_i64(inv, c, len(hh))
        sel = tot > max_docs
        return pd.DataFrame({"h": hh[sel]})

    if driver_merge_rows > 0:
        parts = parts.materialize()
    if driver_merge_rows > 0 and parts.count() <= driver_merge_rows:
        tabs = [t for t in ray.get(parts.to_arrow_refs())
                if t.num_rows]
        if tabs:
            hcat = np.concatenate(
                [t.column("h").to_numpy(zero_copy_only=False)
                 for t in tabs])
            ccat = np.concatenate(
                [t.column("c").to_numpy(zero_copy_only=False)
                 for t in tabs])
            order = np.argsort(hcat, kind="stable")
            hs, cs = hcat[order], ccat[order]
            nb = np.empty(hs.size, dtype=bool)
            nb[0] = True
            nb[1:] = hs[1:] != hs[:-1]
            starts = np.flatnonzero(nb)
            tot = np.add.reduceat(cs, starts)
            return hs[starts][tot > max_docs]  # sorted by construction
        return np.empty(0, dtype=np.int64)
    # materialize the POST-aggregation hot set (boilerplate lines /
    # duplicated grams only — kilorows) so count() + collect don't
    # re-execute
    hot_ds = parts.groupby("bucket").map_groups(
        _sum_filter).materialize()
    n_hot = hot_ds.count()
    if n_hot > _HOT_LINES_MAX:
        raise RuntimeError(
            f"hot set {n_hot} exceeds broadcast cap "
            f"{_HOT_LINES_MAX}; shard by hash % n_shards and run "
            "per shard")
    hot_parts = [t.column("h").to_numpy(zero_copy_only=False)
                 for t in ray.get(hot_ds.select_columns(["h"])
                                  .to_arrow_refs()) if t.num_rows]
    return (np.sort(np.concatenate(hot_parts).astype(np.int64))
            if hot_parts else np.empty(0, dtype=np.int64))


def line_dedup_over(docs: "ray.data.Dataset", max_docs: int = 1,
                    driver_merge_rows: int = 5_000_000,
                    scope_col: str | None = None,
                    passthrough: bool = False,
                    sep: str = "\n",
                    blank_chars: str = _LINE_BLANK,
                    count_col: str = "n_lines"):
    """Core of :func:`line_dedup` over any (doc_id, text) Dataset whose
    text is already multi-line. With ``scope_col`` (e.g. the host), line
    occurrences are counted and dropped PER SCOPE VALUE — the CCNet
    boilerplate rule: a nav line recurring on one host is removed from
    that host's docs only, while the same line appearing once on
    another host survives there.

    The hot-set reduce is size-gated (same convention as the frontier
    cutoff reduce, ``pipelines/crawl.py`` ``_compute_cutoffs``): partial
    (hash, count) volume at or under ``driver_merge_rows`` (~24 bytes a
    row) merges driver-side in one ``np.unique`` — Ray's sort-based
    groupby costs seconds of fixed all-to-all overhead that dwarfs the
    actual work at this size — while anything larger takes the
    coarse-bucketed ``map_groups`` shuffle. Pass ``driver_merge_rows=0``
    at extreme scale to stream straight into the shuffle without
    materializing the partials."""
    import pyarrow.compute as pc

    def partial_counts(batch: pa.Table) -> pa.Table:
        values, offsets, blank = _split_lines(
            batch.column("text"), sep, blank_chars)
        doc_ix = np.repeat(
            np.arange(batch.num_rows, dtype=np.uint64),
            np.diff(offsets))
        h = _scoped_line_hashes(batch, values, offsets, scope_col)
        nz = ~blank
        # per-doc-distinct then per-block counts per hash — both via
        # lexsort + boundary masks (much cheaper than structured
        # np.unique's void-dtype sort)
        hd = h[nz].view(np.uint64)
        dd = doc_ix[nz]
        order = np.lexsort((dd, hd))
        hd, dd = hd[order], dd[order]
        if hd.size:
            new = np.empty(hd.size, dtype=bool)
            new[0] = True
            new[1:] = (hd[1:] != hd[:-1]) | (dd[1:] != dd[:-1])
            hu = hd[new]                       # distinct pairs, h-sorted
            hb = np.empty(hu.size, dtype=bool)
            hb[0] = True
            hb[1:] = hu[1:] != hu[:-1]
            starts = np.flatnonzero(hb)
            hh = hu[starts]
            cc = np.diff(np.append(starts, hu.size))
        else:
            hh = np.empty(0, dtype=np.uint64)
            cc = np.empty(0, dtype=np.int64)
        return pa.table({
            "h": pa.array(hh.view(np.int64), pa.int64()),
            "c": pa.array(cc.astype(np.int64), pa.int64()),
            # coarse bucket key: the exchange sorts 128 small ints, not
            # 64-bit hashes (same shape as tile_dedup's winner shuffle)
            "bucket": pa.array((hh & np.uint64(127)).astype(np.int64),
                               pa.int64())})

    parts = docs.map_batches(partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    hot = _hot_hash_set(parts, max_docs, driver_merge_rows)
    ref = ray.put(np.ascontiguousarray(hot))

    # task pool, not actors: the only state is the broadcast hot array,
    # and ray.get of a plasma numpy array is zero-copy per task —
    # cheaper than paying actor-pool spawn latency for a stateless map
    def _rebuild(batch: pa.Table, *, _ref=ref) -> pa.Table:
        hot_arr = ray.get(_ref)
        values, offsets, blank = _split_lines(
            batch.column("text"), sep, blank_chars)
        n_lines = np.diff(offsets)
        doc_ix = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), n_lines)
        keep = np.ones(len(values), dtype=bool)
        if hot_arr.size and len(values):
            h = _scoped_line_hashes(batch, values, offsets, scope_col)
            pos = np.searchsorted(hot_arr, h)
            pos[pos >= hot_arr.size] = 0
            keep = blank | (hot_arr[pos] != h)
        kept_counts = np.bincount(
            doc_ix[keep], minlength=batch.num_rows).astype(np.int64)
        new_off = np.concatenate(
            ([0], np.cumsum(kept_counts))).astype(np.int64)
        kept_lines = pa.LargeListArray.from_arrays(
            pa.array(new_off, pa.int64()),
            values.filter(pa.array(keep)))
        if passthrough:
            out = {c: batch.column(c) for c in batch.column_names
                   if c != "text"}
        else:
            out = {"doc_id": batch.column("doc_id")}
            if scope_col is not None:
                out[scope_col] = batch.column(scope_col)
        out[count_col] = pa.array(n_lines, pa.int64())
        out["n_dropped"] = pa.array(n_lines - kept_counts, pa.int64())
        out["text_clean"] = pc.binary_join(kept_lines, sep)
        return pa.table(out)

    return docs.map_batches(_rebuild, batch_format="pyarrow",
                            zero_copy_batch=True)


# --------------------------------------------------------------------------
# per-host boilerplate removal (CCNet §3.2 deduplication is corpus-wide;
# this is the complementary per-domain rule trafilatura/boilerpipe-style
# cleaners apply: nav menus and footer strings recur across ONE host's
# pages — drop a line from a host's docs iff it recurs within that host,
# leaving the identical line untouched on hosts where it is unique)
# --------------------------------------------------------------------------

def hosted_lined_view_batch(batch: pa.Table) -> pa.Table:
    """Derived multi-line corpus KEEPING the host (``source``) column:
    reflow each doc into ``_LINE_WORDS``-word lines ([''] for empty
    docs), prepend ``'Subscribe to the {source} newsletter'`` when
    doc_id % 3 == 0 and append ``'(c) {source}. All rights reserved.'``
    when doc_id % 5 == 0 — host-branded boilerplate, so each planted
    line recurs within exactly one host and the per-host drop path is
    exercised end to end (same injector convention as
    :func:`lined_view_batch`). Null sources render as ''."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    srcs = [s if s is not None else ""
            for s in batch.column("source").to_pylist()]
    out = []
    for d, t, s in zip(ids, texts, srcs):
        words = (t or "").split()
        lines = [" ".join(words[i:i + _LINE_WORDS])
                 for i in range(0, len(words), _LINE_WORDS)] or [""]
        if d % 3 == 0:
            lines.insert(0, f"Subscribe to the {s} newsletter")
        if d % 5 == 0:
            lines.append(f"(c) {s}. All rights reserved.")
        out.append("\n".join(lines))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "source": pa.array(srcs, pa.string()),
                     "text": pa.array(out, pa.string())})


def host_line_dedup(sf_dir: str, max_docs: int = 1):
    """Per-host boilerplate line removal over the
    :func:`hosted_lined_view_batch` derived corpus: a non-blank line is
    dropped from a host's documents iff it appears in more than
    ``max_docs`` distinct documents OF THAT HOST. Returns per doc:
    (doc_id, source, n_lines, n_dropped, text_clean).

    Scale shape: identical to :func:`line_dedup` — the exchange carries
    (host-salted line hash, partial count) int64 pairs with a per-block
    combiner, the hot set broadcasts once as a sorted int64 array, and
    the rebuild is a stateless vectorized filter pass. The per-host
    scoping costs nothing extra: the scope is folded into the hash, so
    no (host, line) string pair ever rides the exchange."""
    docs = _documents(sf_dir, ["doc_id", "text", "source"]) \
        .map_batches(hosted_lined_view_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
    return line_dedup_over(docs, max_docs=max_docs, scope_col="source")


# --------------------------------------------------------------------------
# paragraph-level dedup (the Dolma/RefinedWeb deduplication granularity
# BETWEEN line and document: recurring multi-line blocks — quote chains,
# syndicated ledes, legal notices — are removed whole, where line dedup
# would only nibble their most-repeated lines and doc dedup would not
# fire at all; Soldaini et al. 2024 §2.3 run exactly this unit through
# their Bloom-filter deduper)
# --------------------------------------------------------------------------

_PARA_WORDS = 24          # words per derived paragraph (two 12-word lines)
_PARA_BLANK = _LINE_BLANK + "\n"
_PARA_HEAD = ("Subscribe to our newsletter\n"
              "Get the morning headlines in your inbox.")
_PARA_TAIL = "(c) Example Media Group.\nAll rights reserved."


def para_view_batch(batch: pa.Table) -> pa.Table:
    """Derived multi-PARAGRAPH corpus: chunk each doc's words into
    24-word paragraphs, each reflowed as two 12-word lines joined by a
    single '\\n' ([''] for empty docs); paragraphs join with '\\n\\n'.
    Prepend the 2-line nav paragraph when doc_id % 3 == 0 and append
    the footer paragraph when doc_id % 5 == 0 — same deterministic
    injector convention as :func:`lined_view_batch`, so the drop path
    is exercised end to end and the oracle can rebuild the view in
    SQL. Internal newlines are always single and flanked by words, so
    '\\n\\n' occurs exactly at paragraph boundaries."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = []
    for d, t in zip(ids, texts):
        words = (t or "").split()
        paras = []
        for i in range(0, len(words), _PARA_WORDS):
            chunk = words[i:i + _PARA_WORDS]
            p = " ".join(chunk[:_LINE_WORDS])
            if len(chunk) > _LINE_WORDS:
                p += "\n" + " ".join(chunk[_LINE_WORDS:])
            paras.append(p)
        paras = paras or [""]
        if d % 3 == 0:
            paras.insert(0, _PARA_HEAD)
        if d % 5 == 0:
            paras.append(_PARA_TAIL)
        out.append("\n\n".join(paras))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(out, pa.string())})


def paragraph_dedup(sf_dir: str, max_docs: int = 1):
    """Remove every non-blank PARAGRAPH that occurs in more than
    ``max_docs`` distinct documents (exact content match, internal
    newlines included), rebuilding each doc from its kept paragraphs
    with '\\n\\n' — per doc: (doc_id, n_paras, n_dropped, text_clean).
    Runs over the :func:`para_view_batch` derived corpus.

    Scale shape: identical to :func:`line_dedup` — the unit split is
    one Arrow ``split_pattern`` on '\\n\\n', the exchange carries
    16-byte (paragraph-hash, partial-count) rows behind a per-block
    combiner, the hot set broadcasts once as a sorted int64 array and
    the rebuild is a stateless vectorized filter. Paragraph text never
    rides the exchange."""
    docs = _documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(para_view_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
    return line_dedup_over(docs, max_docs=max_docs, sep="\n\n",
                           blank_chars=_PARA_BLANK,
                           count_col="n_paras")


# --------------------------------------------------------------------------
# Bloom-filter paragraph dedup (Dolma's BFF deduper, Soldaini et al.
# 2024 §2.3 / Groeneveld 2023: one shared Bloom filter, first
# occurrence of a paragraph survives, later occurrences drop). The
# approximate membership SET is the 100-TB alternative to the exact
# hot-count exchange: state is m/8 bytes TOTAL regardless of corpus
# size (10 bits per distinct paragraph for ~1% FP), no count shuffle at
# all — the trade is a bounded false-drop rate (a fresh paragraph that
# bloom-collides loses ALL its occurrences) and first-wins instead of
# drop-all semantics. Reuses the crawl frontier's numpy BloomFilter
# (state/filters.py) sharded by hash across num_cpus=0 actors — the
# same layout as the URL-seen shards, so the component scales exactly
# like the frontier's 10^10-key posture.
# --------------------------------------------------------------------------

class _BloomDedupShardLogic:
    """One bloom shard: vectorized test-and-set over packed 2x-uint64
    key lanes. Within one call, duplicate keys are collapsed first so
    exactly ONE occurrence reports novel; across calls the bit array
    makes test-and-set atomic (the actor serializes callers). An
    optional ``prior`` snapshot (``to_bytes`` of an earlier run's
    shard) pre-populates the filter — the BFF dedup-against-previous-
    corpus mode."""

    def __init__(self, n_bits: int, k: int, prior: bytes | None = None):
        from risjbot_ray.state.filters import BloomFilter
        if prior is not None:
            self.f = BloomFilter.from_bytes(prior, k=k)
            assert self.f.n_bits == n_bits
        else:
            self.f = BloomFilter(n_bits=n_bits, k=k)

    @staticmethod
    def _keys(lanes: bytes) -> np.ndarray:
        return np.frombuffer(lanes, dtype=np.uint8).reshape(-1, 16)

    def probe(self, lanes: bytes) -> np.ndarray:
        """Read-only membership: novel mask WITHOUT inserting — every
        occurrence of a prior-corpus paragraph reports non-novel, and
        duplicates within the new corpus are NOT collapsed (read-only
        mode never dedups within the probed corpus)."""
        return ~self.f.contains(self._keys(lanes))

    def add_only(self, lanes: bytes) -> int:
        """Filter build: insert all keys, return how many were new to
        this shard's filter (approximate, for accounting only)."""
        keys = self._keys(lanes)
        seen = self.f.contains(keys)
        self.f.add(keys[~seen])
        return int((~seen).sum())

    def to_bytes(self) -> bytes:
        return self.f.to_bytes()

    def test_and_set(self, lanes: bytes) -> np.ndarray:
        keys = self._keys(lanes)
        pairs = keys.view(np.uint64).reshape(-1, 2)
        # collapse within-call duplicates: first index per distinct key
        order = np.lexsort((pairs[:, 1], pairs[:, 0]))
        sp = pairs[order]
        new = np.empty(len(sp), dtype=bool)
        if len(sp):
            new[0] = True
            new[1:] = (sp[1:, 0] != sp[:-1, 0]) | (sp[1:, 1] != sp[:-1, 1])
        first = np.sort(order[new])
        uk = np.ascontiguousarray(keys[first])
        seen = self.f.contains(uk)
        self.f.add(uk[~seen])
        novel = np.zeros(len(keys), dtype=bool)
        novel[first[~seen]] = True
        return novel


_BloomDedupShard = None     # ray.remote wrapper, created lazily


def _bloom_shards(n_shards: int, n_bits: int, k: int,
                  priors: list[bytes] | None = None) -> list:
    global _BloomDedupShard
    if _BloomDedupShard is None:
        # num_cpus=0, like the URL-seen shards: membership actors must
        # not starve the data plane (frontier/seen.py:404 convention)
        _BloomDedupShard = ray.remote(num_cpus=0)(_BloomDedupShardLogic)
    if priors is not None:
        assert len(priors) == n_shards, \
            "prior snapshot shard count must match n_shards"
        return [_BloomDedupShard.remote(n_bits, k, p) for p in priors]
    return [_BloomDedupShard.remote(n_bits, k) for _ in range(n_shards)]


def _unit_lanes(values: pa.Array, nz: np.ndarray, n_shards: int):
    """Two independent 64-bit hash lanes + shard route for the
    non-blank unit strings at flat indices ``nz``."""
    import polars as pl
    s = pl.from_arrow(values.take(pa.array(nz)))
    h1 = s.hash(seed=0).to_numpy().view(np.uint64)
    h2 = s.hash(seed=1).to_numpy().view(np.uint64)
    shard = (h1 % np.uint64(n_shards)).astype(np.int64)
    lanes = np.empty((nz.size, 2), dtype=np.uint64)
    lanes[:, 0] = h1
    lanes[:, 1] = h2
    return lanes, shard


def build_bloom_over(docs: "ray.data.Dataset", sep: str = "\n\n",
                     blank_chars: str = _PARA_BLANK,
                     n_bits: int = 1 << 22, k: int = 4,
                     n_shards: int = 8) -> list[bytes]:
    """Build the sharded Bloom snapshot of a corpus's non-blank units
    (the BFF pre-built-filter mode): one streaming pass feeds every
    unit's hash lanes to its shard actor, then each shard serializes
    its m/n_shards-bit array. The returned per-shard byte blobs are
    the ``priors`` input of :func:`bloom_dedup_over` — persist them
    next to the snapshot (m/8 bytes total) and a later run dedups
    against this corpus without re-reading it."""
    handles = _bloom_shards(n_shards, n_bits, k)

    def feed(batch: pa.Table) -> pa.Table:
        values, offsets, blank = _split_lines(
            batch.column("text"), sep, blank_chars)
        nz = np.flatnonzero(~blank)
        futs = []
        if nz.size:
            lanes, shard = _unit_lanes(values, nz, n_shards)
            for sh in range(n_shards):
                sel = np.flatnonzero(shard == sh)
                if sel.size:
                    futs.append(handles[sh].add_only.remote(
                        np.ascontiguousarray(lanes[sel]).tobytes()))
        if futs:
            ray.get(futs)     # barrier: inserts land before task ends
        return pa.table({"n_units": pa.array([int(nz.size)],
                                             pa.int64())})

    # consume the pass (counts only reach the driver)
    docs.map_batches(feed, batch_format="pyarrow",
                     zero_copy_batch=True).count()
    return ray.get([h.to_bytes.remote() for h in handles])


def bloom_dedup_over(docs: "ray.data.Dataset", sep: str = "\n\n",
                     blank_chars: str = _PARA_BLANK,
                     count_col: str = "n_paras",
                     n_bits: int = 1 << 22, k: int = 4,
                     n_shards: int = 8,
                     priors: list[bytes] | None = None,
                     readonly: bool = False):
    """First-occurrence-wins unit dedup against sharded Bloom filters
    over any (doc_id, text) Dataset: each non-blank ``sep``-separated
    unit is kept iff its hash was not already in the filter (test-and-
    set, routed to ``hash % n_shards``). Output matches
    :func:`line_dedup_over`'s shape: (doc_id, ``count_col``,
    n_dropped, text_clean).

    Semantics vs the exact kernel: exactly ONE occurrence of every
    distinct unit survives (the first to reach its shard — which copy
    is nondeterministic under parallel arrival), except units whose
    k bloom probes all collide with previously-set bits, which lose
    every occurrence; with m/n >= 10 bits per distinct unit the
    false-drop probability is ~(1 - e^(-k n/m))^k < 1%. State is
    m bits total, sharded — nothing is exchanged between tasks, no
    count shuffle runs, and the driver holds only actor handles. At
    10^12 distinct paragraphs (100-TB corpora) that is ~1.25 TB of
    filter across 256 nodes' shards — the same layout and scaling
    story as the frontier's URL-seen shards.

    With ``priors`` (per-shard blobs from :func:`build_bloom_over`)
    the filter starts pre-populated with an earlier corpus — every
    paragraph of that corpus drops in ALL its occurrences here. Add
    ``readonly=True`` for BFF's pure decontamination mode: membership
    is probed but never updated, so duplicates WITHIN this corpus all
    survive and only prior-corpus paragraphs drop."""
    import pyarrow.compute as pc

    handles = _bloom_shards(n_shards, n_bits, k, priors)

    def rebuild(batch: pa.Table) -> pa.Table:
        values, offsets, blank = _split_lines(
            batch.column("text"), sep, blank_chars)
        n_units = np.diff(offsets)
        doc_ix = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), n_units)
        keep = np.ones(len(values), dtype=bool)
        nz = np.flatnonzero(~blank)
        if nz.size:
            lanes, shard = _unit_lanes(values, nz, n_shards)
            futs, sels = [], []
            for sh in range(n_shards):
                sel = np.flatnonzero(shard == sh)
                if sel.size:
                    h = handles[sh]
                    m = h.probe if readonly else h.test_and_set
                    futs.append(m.remote(
                        np.ascontiguousarray(lanes[sel]).tobytes()))
                    sels.append(sel)
            for sel, novel in zip(sels, ray.get(futs)):
                keep[nz[sel]] = novel
        kept_counts = np.bincount(
            doc_ix[keep], minlength=batch.num_rows).astype(np.int64)
        new_off = np.concatenate(
            ([0], np.cumsum(kept_counts))).astype(np.int64)
        kept = pa.LargeListArray.from_arrays(
            pa.array(new_off, pa.int64()),
            values.filter(pa.array(keep)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            count_col: pa.array(n_units, pa.int64()),
            "n_dropped": pa.array(n_units - kept_counts, pa.int64()),
            "text_clean": pc.binary_join(kept, sep)})

    return docs.map_batches(rebuild, batch_format="pyarrow",
                            zero_copy_batch=True)


def bloom_paragraph_dedup(sf_dir: str, n_bits: int = 1 << 22,
                          n_shards: int = 8):
    """Dolma-BFF-style paragraph dedup over the
    :func:`para_view_batch` derived corpus (first occurrence of each
    paragraph survives; see :func:`bloom_dedup_over` for the
    approximate-membership semantics and sizing)."""
    docs = _documents(sf_dir, ["doc_id", "text"]) \
        .map_batches(para_view_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
    return bloom_dedup_over(docs, n_bits=n_bits, n_shards=n_shards)


# --------------------------------------------------------------------------
# Onion-style duplicated n-gram gating (Pomikálek 2011 "Removing
# boilerplate and duplicate content from web corpora", the ONION tool;
# also the "duplicated 13-gram fraction" signal in Gopher/MassiveText,
# Rae et al. 2021 A1.1): per document, the fraction of its 13-gram
# POSITIONS whose gram occurs in more than ``max_docs`` distinct
# documents corpus-wide; documents past 50% duplication are dropped.
# Complements tile_dedup (which REMOVES duplicated spans) — this is the
# classifier-style whole-doc gate over the same evidence.
# --------------------------------------------------------------------------

# the exact Python-str.split() whitespace class (the 29 whitespace
# codepoints), identical to the RE2 class the DuckDB oracles tokenize
# with — Arrow-side split on it == ''.split() per row
_PY_WS_CLASS = ("[\t-\r\x1c-\x1f \x85\xa0\u1680\u2000-\u200a"
                "\u2028\u2029\u202f\u205f\u3000]+")
_ONION_N = 13       # Onion / MassiveText gram width
_WS_TOK_CACHE: dict = {}


def _ws_token_hashes(texts, cache: dict, return_tokens: bool = False):
    """Vectorized exact-``str.split()`` batch tokenizer: all token
    hashes flattened across the batch plus per-doc token counts. Same
    shape as ``lm._batch_token_hashes`` but WITHOUT lowercasing/
    alnum-folding — gram identity here is the raw whitespace-split
    token, matching the SQL oracle's ``array_to_string(w[i:i+n])``
    grams. md5 hashing touches only the per-batch dictionary (unique
    tokens); the hot path is Arrow split + numpy takes. With
    ``return_tokens`` the flat (empty-filtered) token StringArray is
    returned too — for callers that rebuild text from kept tokens."""
    import pyarrow.compute as pc
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.fill_null(texts, ""), _PY_WS_CLASS)
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    empty = pc.equal(pc.utf8_length(flat), 0)
    emp_np = empty.to_numpy(zero_copy_only=False)
    if emp_np.any():   # boundary empties: ' a '.split() has none
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        lens = lens - np.bincount(doc_idx[emp_np], minlength=len(lens))
        flat = flat.filter(pc.invert(empty))
    if len(flat) == 0:
        th = np.empty(0, np.uint64)
        return (th, lens, flat) if return_tokens else (th, lens)
    de = flat.dictionary_encode()
    if len(cache) >= _TOKEN_CACHE_MAX:
        cache.clear()
    vocab_h = np.fromiter(
        (_token_h64(w, cache) for w in de.dictionary.to_pylist()),
        dtype=np.uint64, count=len(de.dictionary))
    th = vocab_h[de.indices.to_numpy(zero_copy_only=False)]
    return (th, lens, flat) if return_tokens else (th, lens)


def _window_gram_hashes(th: np.ndarray, lens: np.ndarray, n: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Horner hashes of every length-``n`` token window per doc:
    (gram hashes, doc index per gram). A doc with fewer than ``n``
    tokens contributes no windows. n-1 vectorized multiply-adds over
    the flat window-start gather — no per-doc loop."""
    m = np.maximum(lens - (n - 1), 0)
    total = int(m.sum())
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    bases = np.concatenate(([0], np.cumsum(lens)))[:-1]
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), m)
    gstart = np.concatenate(([0], np.cumsum(m)))[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(gstart, m)
    start = bases[doc_idx] + within
    g = th[start].copy()
    for s in range(1, n):
        g = g * _GRAM_MULT + th[start + s]
    return g, doc_idx


def gram_duplication(sf_dir: str, n: int = _ONION_N, max_docs: int = 1,
                     driver_merge_rows: int = 5_000_000):
    """Per-doc duplicated-``n``-gram fraction + keep gate: a gram is
    "hot" when it occurs in more than ``max_docs`` distinct documents;
    ``dup_ratio`` is the fraction of the doc's gram positions that are
    hot, and the doc is kept iff at most half its positions are
    (``2*n_dup <= n_grams`` — integer arithmetic, no float threshold).
    Docs with fewer than ``n`` tokens have no grams and always keep.
    Returns (doc_id, n_grams, n_dup, dup_ratio, keep).

    Scale shape — the ``line_dedup`` twin at gram granularity: pass 1
    ships 16-byte (gram-hash, per-block distinct-doc partial count)
    rows through the size-gated :func:`_hot_hash_set` reduce (combiner
    first, coarse 128-bucket shuffle only past the driver-merge gate);
    the hot set — duplicated grams only, a vanishing fraction of
    distinct grams on a deduplicated crawl — broadcasts once as a
    sorted int64 array; pass 2 is a stateless vectorized recount
    (one searchsorted per batch). Gram text never leaves the task."""
    return gram_duplication_over(
        _documents(sf_dir, ["doc_id", "text"]), n=n, max_docs=max_docs,
        driver_merge_rows=driver_merge_rows)


def gram_duplication_over(docs: "ray.data.Dataset", n: int = _ONION_N,
                          max_docs: int = 1,
                          driver_merge_rows: int = 5_000_000,
                          passthrough: bool = False):
    """Core of :func:`gram_duplication` over any (doc_id, text, ...)
    Dataset. With ``passthrough`` the output keeps EVERY input column
    and appends the gate columns (row-aligned) — the cascade
    composition's shape; the default emits the flags-only table the
    oracle checks."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        th, lens = _ws_token_hashes(batch.column("text"), _WS_TOK_CACHE)
        gh, doc_idx = _window_gram_hashes(th, lens, n)
        # per-doc-distinct then per-block counts per hash (a (doc,
        # gram) pair lives in exactly one block, so summed partials
        # are exact distinct-doc counts) — lexsort + boundary masks
        order = np.lexsort((doc_idx, gh))
        hd, dd = gh[order], doc_idx[order]
        if hd.size:
            new = np.empty(hd.size, dtype=bool)
            new[0] = True
            new[1:] = (hd[1:] != hd[:-1]) | (dd[1:] != dd[:-1])
            hu = hd[new]
            hb = np.empty(hu.size, dtype=bool)
            hb[0] = True
            hb[1:] = hu[1:] != hu[:-1]
            starts = np.flatnonzero(hb)
            hh = hu[starts]
            cc = np.diff(np.append(starts, hu.size))
        else:
            hh = np.empty(0, dtype=np.uint64)
            cc = np.empty(0, dtype=np.int64)
        return pa.table({
            "h": pa.array(hh.view(np.int64), pa.int64()),
            "c": pa.array(cc.astype(np.int64), pa.int64()),
            "bucket": pa.array((hh & np.uint64(127)).astype(np.int64),
                               pa.int64())})

    parts = docs.map_batches(partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    hot = _hot_hash_set(parts, max_docs, driver_merge_rows)
    ref = ray.put(np.ascontiguousarray(hot))

    def _count(batch: pa.Table, *, _ref=ref) -> pa.Table:
        hot_arr = ray.get(_ref)
        th, lens = _ws_token_hashes(batch.column("text"), _WS_TOK_CACHE)
        gh, doc_idx = _window_gram_hashes(th, lens, n)
        n_grams = np.maximum(lens - (n - 1), 0)
        ndocs = batch.num_rows
        if hot_arr.size and gh.size:
            # the hot set is int64-SORTED; compare in int64 space
            dup = _in_sorted(hot_arr, gh.view(np.int64))
            n_dup = np.bincount(doc_idx[dup], minlength=ndocs)
        else:
            n_dup = np.zeros(ndocs, np.int64)
        ratio = np.divide(n_dup.astype(np.float64), n_grams,
                          out=np.zeros(ndocs, np.float64),
                          where=n_grams > 0)
        out = ({c: batch.column(c) for c in batch.column_names}
               if passthrough else {"doc_id": batch.column("doc_id")})
        out["n_grams"] = pa.array(n_grams.astype(np.int64), pa.int64())
        out["n_dup"] = pa.array(n_dup.astype(np.int64), pa.int64())
        out["dup_ratio"] = pa.array(ratio, pa.float64())
        out["keep"] = pa.array(2 * n_dup <= n_grams, pa.bool_())
        return pa.table(out)

    return docs.map_batches(_count, batch_format="pyarrow",
                            zero_copy_batch=True)


# --------------------------------------------------------------------------
# Exact W-token-window substring dedup (Lee et al. 2021 "Deduplicating
# Training Data Makes Language Models Better", ExactSubstr): any
# length-W token window whose verbatim text occurs more than once in
# the corpus — ALL occurrences counted, including repeats within one
# document — is a duplicated span; every token covered by one is
# removed and the text is rebuilt from the kept tokens. Complements
# tile_dedup (tile-granularity approximation of the same idea) with
# the published exact-window method.
# --------------------------------------------------------------------------

_WINDOW_W = 50      # Lee et al.'s 50-token match length


def window_dedup(sf_dir: str, w: int = _WINDOW_W,
                 driver_merge_rows: int = 5_000_000):
    """Exact ``w``-token-window substring dedup. Returns one row per
    doc: (doc_id, n_tokens, n_dup_windows, n_removed, text_kept) where
    ``text_kept`` is the space-joined surviving tokens (both engines
    rebuild from tokens, so whitespace is normalized identically).

    Scale shape — the :func:`gram_duplication` twin at occurrence
    (not distinct-doc) granularity: pass 1 ships 16-byte (window-hash,
    per-block occurrence count) combiner rows through the size-gated
    :func:`_hot_hash_set` reduce; the hot set (windows occurring more
    than once — a vanishing fraction of distinct windows on a
    deduplicated crawl) broadcasts once as a sorted int64 array; pass
    2 is stateless and fully vectorized: one searchsorted for window
    membership, a diff/cumsum sweep for covered token positions
    (windows never span documents, so the flat sweep is exact), and
    one Arrow ``binary_join`` rebuilds every kept text — no per-token
    Python. Window text never leaves the task; hashes are 64-bit
    Horner over md5 token hashes (collision odds ~n^2/2^65, the same
    accepted risk as the 13-gram gate)."""
    docs = _documents(sf_dir, ["doc_id", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        th, lens = _ws_token_hashes(batch.column("text"), _WS_TOK_CACHE)
        gh, _ = _window_gram_hashes(th, lens, w)
        hh, cc = np.unique(gh, return_counts=True)
        return pa.table({
            "h": pa.array(hh.view(np.int64), pa.int64()),
            "c": pa.array(cc.astype(np.int64), pa.int64()),
            "bucket": pa.array((hh & np.uint64(127)).astype(np.int64),
                               pa.int64())})

    parts = docs.map_batches(partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    hot = _hot_hash_set(parts, 1, driver_merge_rows)
    ref = ray.put(np.ascontiguousarray(hot))

    def rebuild(batch: pa.Table, *, _ref=ref) -> pa.Table:
        import pyarrow.compute as pc
        hot_arr = ray.get(_ref)
        th, lens, flat = _ws_token_hashes(batch.column("text"),
                                          _WS_TOK_CACHE,
                                          return_tokens=True)
        gh, doc_idx = _window_gram_hashes(th, lens, w)
        ndocs = batch.num_rows
        total = int(lens.sum())
        # same window-start layout _window_gram_hashes walks
        m = np.maximum(lens - (w - 1), 0)
        bases = np.concatenate(([0], np.cumsum(lens)))[:-1]
        gstart = np.concatenate(([0], np.cumsum(m)))[:-1]
        within = (np.arange(int(m.sum()), dtype=np.int64)
                  - np.repeat(gstart, m))
        start = bases[doc_idx] + within
        if hot_arr.size and gh.size:
            dup = _in_sorted(hot_arr, gh.view(np.int64))
        else:
            dup = np.zeros(len(gh), dtype=bool)
        n_dup = np.bincount(doc_idx[dup], minlength=ndocs) \
            .astype(np.int64)
        # covered token positions: +1 at each dup window start, -1
        # past its end, prefix-sum > 0 — dup windows sit entirely
        # inside their doc, so boundaries never leak across docs
        diff = np.zeros(total + 1, np.int64)
        ds_ = start[dup]
        np.add.at(diff, ds_, 1)
        np.add.at(diff, ds_ + w, -1)
        covered = np.cumsum(diff[:-1]) > 0
        keep = ~covered
        n_removed = (lens - _segment_sum_i64(
            np.repeat(np.arange(ndocs), lens), keep.astype(np.int64),
            ndocs)) if total else np.zeros(ndocs, np.int64)
        new_lens = lens - n_removed
        offsets = np.concatenate(([0], np.cumsum(new_lens)))
        kept_flat = (flat.filter(pa.array(keep)) if total
                     else flat)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_flat)
        joined = pc.binary_join(la, " ")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(lens, pa.int64()),
            "n_dup_windows": pa.array(n_dup, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
            "text_kept": joined,
        })

    return docs.map_batches(rebuild, batch_format="pyarrow",
                            zero_copy_batch=True)


# --------------------------------------------------------------------------
# URL-level curation filtering (RefinedWeb §3.1 / UT1-style: reject a
# page by its URL alone BEFORE paying for fetch/extract — blocked-domain
# prefixes, weighted soft-word scoring over the full URL, and structural
# path rules; the cheapest gate in the funnel, so it runs first)
# --------------------------------------------------------------------------

_URL_BLOCK_PREFIXES = ("ads.", "tracker.")
_URL_BAD_WORDS = (("sessionid", 2.0), ("utm_", 1.0), ("clickthrough", 1.5))
_URL_SCORE_REJECT = 2.5
_URL_MAX_SEGMENTS = 6
# pyarrow extract_regex requires NAMED groups; the DuckDB oracle uses
# the same RE2 patterns with plain groups + regexp_extract(..., 1)
_URL_HOST_RE = r"^https?://(?P<host>[^/?#]+)"
_URL_PATH_RE = r"^https?://[^/?#]+(?P<path>[^?#]*)"


def urled_view_batch(batch: pa.Table) -> pa.Table:
    """Derived URL view of the documents table (it carries no url
    column): ``https://{source}/{lang}/article-{doc_id}``, with
    deterministic bad-URL injections — an ``ads.`` host prefix when
    doc_id % 23 == 0, a 7-level path prefix when % 29 == 0, and a
    ``?utm_source=feed&sessionid=`` query when % 17 == 0 — so every
    reject rule fires on real rows (same injector convention as
    :func:`hosted_lined_view_batch`)."""
    ids = batch.column("doc_id").to_pylist()
    srcs = batch.column("source").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls = []
    for d, s, lg in zip(ids, srcs, langs):
        host = ("ads." if d % 23 == 0 else "") + (s or "")
        path = ("/a/b/c/d/e/f/g" if d % 29 == 0 else "") \
            + f"/{lg or ''}/article-{d}"
        q = f"?utm_source=feed&sessionid={d}" if d % 17 == 0 else ""
        urls.append(f"https://{host}{path}{q}")
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "url": pa.array(urls, pa.string())})


def url_filter_batch(batch: pa.Table) -> pa.Table:
    """Vectorized URL gate over a (doc_id, url) batch: parse host and
    path with one regex each, then apply three rules —
    ``blocked_domain`` (host prefix in the blocklist), ``url_score``
    (weighted soft-word hits over the lowercased URL at or above
    ``_URL_SCORE_REJECT``) and ``too_deep`` (more than
    ``_URL_MAX_SEGMENTS`` path segments). Emits (doc_id, url, host,
    url_score, n_segments, keep, reason) with reason = the FIRST
    failing rule in that order ('' when kept). All-Arrow kernels —
    no per-row Python."""
    import pyarrow.compute as pc
    url = pc.fill_null(batch.column("url").combine_chunks(), "")
    host = pc.struct_field(pc.extract_regex(url, _URL_HOST_RE), "host")
    host = pc.fill_null(host, "")
    path = pc.struct_field(pc.extract_regex(url, _URL_PATH_RE), "path")
    path = pc.fill_null(path, "")
    low = pc.utf8_lower(url)
    score = np.zeros(batch.num_rows, dtype=np.float64)
    for word, w in _URL_BAD_WORDS:
        score += np.asarray(pc.match_substring(low, word)) * w
    nseg = np.asarray(pc.count_substring(path, "/"), dtype=np.int64)
    blocked = np.zeros(batch.num_rows, dtype=bool)
    for pref in _URL_BLOCK_PREFIXES:
        blocked |= np.asarray(pc.starts_with(host, pref))
    scored = score >= _URL_SCORE_REJECT
    deep = nseg > _URL_MAX_SEGMENTS
    keep = ~(blocked | scored | deep)
    reason = np.select([blocked, scored, deep],
                       ["blocked_domain", "url_score", "too_deep"],
                       default="")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "url": url, "host": host,
        "url_score": pa.array(score, pa.float64()),
        "n_segments": pa.array(nseg, pa.int64()),
        "keep": pa.array(keep, pa.bool_()),
        "reason": pa.array(reason.tolist(), pa.string())})


def url_filter(sf_dir: str):
    """URL-level curation gate over the :func:`urled_view_batch`
    derived corpus — one stateless fully-streaming ``map_batches``
    chain, no shuffle, no state; at crawl scale this same kernel gates
    the frontier before fetch."""
    return (_documents(sf_dir, ["doc_id", "source", "lang"])
            .map_batches(urled_view_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(url_filter_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


# --------------------------------------------------------------------------
# the composed curation cascade: every round-4 gate chained in funnel
# order, each stage consuming the previous stage's SURVIVORS (and from
# the line dedup on, its CLEANED text) — the full modern training-data
# pipeline (RefinedWeb/FineWeb shape): URL gate -> duplicated-gram doc
# dedup -> corpus line dedup -> basic quality gate -> domain-mean
# quality gate -> benchmark decontamination
# --------------------------------------------------------------------------

def curate_cascade(sf_dir: str, min_words: int = 50,
                   min_alpha: float = 0.5,
                   min_stop: float = 0.02) -> pa.Table:
    """Run the six-stage curation cascade and return the funnel report:
    one row per stage with (stage_no, stage, n_in, n_dropped, n_out).

    Composition semantics (what the exact oracle reproduces): stage 1
    gates on the derived URL view; stage 2 is the duplicated-13-gram
    doc gate over the LINED view of stage-1 survivors (dedup-early,
    Lee et al. — whole-doc duplicates die before any downstream
    compute is spent on them); stage 3 removes corpus-wide duplicated
    lines (hot set over stage-2 survivors only) and drops docs with no
    remaining non-empty line (exactly the oracle's n_kept_content > 0
    rule — any non-newline character in the cleaned text); stages 4-6
    run on that CLEANED text — the ``curate_documents`` quality gate
    (min_words / min_alpha / min_stop), the domain-mean quality gate
    (means over stage-4 survivors only), and 8-gram decontamination
    against the benchmark slice of the ORIGINAL corpus (bench members
    themselves drop here, as an eval suite must).

    Scale shape: barriers exist ONLY where the next operator consumes
    its input twice (s1 feeds the gram-dup partial+annotate, s2 the
    line-dedup pair, the marked s3/s4 block the domain-mean pair); the
    funnel counts are free — parquet/materialized metadata for
    n0..n2, one vectorized flag-sum pass for n3/n4, and in-band
    per-batch partials folded into the SINGLE terminal streaming pass
    for n5/n6. Nothing materializes just to be counted, and stages
    5-6 stream unmaterialized end to end."""
    import pyarrow.compute as pc

    from risjbot_ray.pipelines.textstats import quality_batch

    def stage1_url(batch: pa.Table) -> pa.Table:
        keep = url_filter_batch(urled_view_batch(batch)).column("keep")
        return batch.filter(keep)

    def lined(batch: pa.Table) -> pa.Table:
        lv = lined_view_batch(batch.select(["doc_id", "text"]))
        return batch.drop_columns(["text"]).append_column(
            "text", lv.column("text"))

    def stage34_mark(batch: pa.Table) -> pa.Table:
        """Mark-not-drop: replace text with the line-dedup CLEANED
        text and flag stage-3 (some non-empty kept line — the
        oracle's n_kept_content > 0: a kept whitespace-only line IS
        content there, so test for any non-newline char, not
        non-whitespace) and stage-4 (quality gate) survival. Keeping
        every row lets the funnel read n3/n4 as flag sums and the
        domain stage re-derive its input from these materialized
        blocks with a cheap filter instead of another barrier."""
        keep3 = pc.fill_null(pc.match_substring_regex(
            batch.column("text_clean"), "[^\n]"), False)
        out = batch.drop_columns(["n_lines", "n_dropped"])
        t = out.column("text_clean")
        out = (out.drop_columns(["text_clean"])
               .append_column("text", t))
        q = quality_batch(out.select(["doc_id", "text"]))
        nw = q.column("n_words").to_numpy(zero_copy_only=False)
        al = q.column("alpha_ratio").to_numpy(zero_copy_only=False)
        st = q.column("stopword_ratio").to_numpy(zero_copy_only=False)
        k3 = np.asarray(keep3.to_numpy(zero_copy_only=False),
                        dtype=bool)
        k4 = k3 & (nw >= min_words) & (al >= min_alpha) \
            & (st >= min_stop)
        return (out.append_column("keep3", pa.array(k3, pa.bool_()))
                .append_column("keep4", pa.array(k4, pa.bool_())))

    base = _documents(sf_dir, ["doc_id", "text", "lang", "source"])
    n0 = base.count()              # parquet metadata — no read
    s1 = (base.map_batches(stage1_url, batch_format="pyarrow",
                           zero_copy_batch=True)
          .map_batches(lined, batch_format="pyarrow",
                       zero_copy_batch=True).materialize())

    def keep_filter(ds, gate_cols):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(b.column("keep")).drop_columns(
                list(gate_cols) + ["keep"])
        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    s2 = keep_filter(gram_duplication_over(s1, passthrough=True),
                     ["n_grams", "n_dup", "dup_ratio"]).materialize()
    s34m = (line_dedup_over(s2, passthrough=True)
            .map_batches(stage34_mark, batch_format="pyarrow",
                         zero_copy_batch=True).materialize())

    def flag_sums(b: pa.Table) -> pa.Table:
        return pa.table({
            "n3": pa.array([int(pc.sum(b.column("keep3")).as_py()
                                or 0)], pa.int64()),
            "n4": pa.array([int(pc.sum(b.column("keep4")).as_py()
                                or 0)], pa.int64())})

    fparts = s34m.map_batches(flag_sums,
                              batch_format="pyarrow").take_all()
    n3 = sum(r["n3"] for r in fparts)
    n4 = sum(r["n4"] for r in fparts)

    def s4_rows(b: pa.Table) -> pa.Table:
        return b.filter(b.column("keep4")).drop_columns(
            ["keep3", "keep4"])

    # lazy re-filter of the materialized block set: both domain-mean
    # passes and the terminal pass read identical rows (ADVICE guard:
    # the annotate lookup verifies this instead of assuming it)
    s4 = s34m.map_batches(s4_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    s5 = keep_filter(domain_quality_filter_over(s4, passthrough=True),
                     ["domain_n_docs", "domain_mean_fp"])

    bench_ref = _bench_gram_ref(sf_dir)   # grams of the RAW bench docs

    def stage6_counts(batch: pa.Table) -> pa.Table:
        """Terminal streaming pass: decontaminate AND fold the n5/n6
        funnel partials in-band — one (n5, n6) row per batch replaces
        the two materialize()+count() barriers the report used to
        pay."""
        n5_part = batch.num_rows
        probe = _ContaminationProbe(bench_ref)
        flags = probe(batch.select(["doc_id", "text"]))
        # probe excludes bench members from its output; align by id
        ok = set(flags.filter(pc.invert(
            flags.column("contaminated"))).column("doc_id").to_pylist())
        keep = pa.array([d in ok for d in
                         batch.column("doc_id").to_pylist()], pa.bool_())
        out = batch.filter(keep)
        return pa.table({"n5": pa.array([n5_part], pa.int64()),
                         "n6": pa.array([out.num_rows], pa.int64())})

    cparts = s5.map_batches(stage6_counts,
                            batch_format="pyarrow").take_all()
    n5 = sum(r["n5"] for r in cparts)
    n6 = sum(r["n6"] for r in cparts)

    counts = [n0, s1.count(), s2.count(), n3, n4, n5, n6]
    stages = ["url_filter", "gram_dup", "line_dedup", "quality",
              "domain_quality", "decontaminate"]
    return pa.table({
        "stage_no": pa.array(range(1, 7), pa.int64()),
        "stage": pa.array(stages, pa.string()),
        "n_in": pa.array(counts[:-1], pa.int64()),
        "n_dropped": pa.array(
            [a - b for a, b in zip(counts[:-1], counts[1:])],
            pa.int64()),
        "n_out": pa.array(counts[1:], pa.int64()),
    })


# --------------------------------------------------------------------------
# distributed global shuffle rank
# --------------------------------------------------------------------------

def shuffle_rank(sf_dir: str):
    """Deterministic global shuffle for training-data ordering: rank of
    each doc in md5(doc_id || ':shuf') order. Bucketed prefix-sum, the
    same shape as ``pack_stream``: 256 buckets by the key's first byte,
    per-bucket counts -> driver prefix offsets (256 ints), ranks
    assigned inside ``groupby(bucket).map_groups``. Returns
    (doc_id, rank)."""
    return _shuffle_rank_over(_documents(sf_dir, ["doc_id"]))


def _shuffle_rank_over(ds: "ray.data.Dataset"):
    """Append a global shuffle ``rank`` to any Dataset carrying a
    ``doc_id`` column; all other columns pass through. The only
    materialized artifact is the keyed dataset (needed for the
    two-pass count-then-assign prefix sum; 256 bucket counts on the
    driver)."""

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        ks = [hashlib.md5(f"{d}:shuf".encode()).hexdigest() for d in ids]
        return (batch
                .append_column("skey", pa.array(ks, pa.string()))
                .append_column("bucket", pa.array(
                    [int(k[:2], 16) for k in ks], pa.int32())))

    keyed = _coalesce_for_exchange(
        ds.map_batches(key, batch_format="pyarrow"))

    # per-bucket totals -> prefix-sum bases, no sort exchange to count
    bases, run = {}, 0
    for b, n in sorted(_counts_by(keyed, "bucket").items()):
        bases[int(b)] = run
        run += n
    base_ref = ray.put(bases)

    def assign(df):
        order = np.lexsort((df["doc_id"].to_numpy(),
                            df["skey"].to_numpy()))
        df = df.iloc[order]
        base = ray.get(base_ref)[int(df["bucket"].iloc[0])]
        df = df.assign(rank=np.arange(base, base + len(df),
                                      dtype=np.int64))
        return df.drop(columns=["skey", "bucket"])

    return keyed.groupby("bucket").map_groups(assign,
                                              batch_format="pandas")


# --------------------------------------------------------------------------
# exact top-k n-gram frequencies (partial aggregation)
# --------------------------------------------------------------------------

def top_ngrams(sf_dir: str, n: int = 2, k: int = 100):
    """Exact corpus-wide top-``k`` most frequent ``n``-grams
    (whitespace tokens), ties broken by gram text ascending. The
    frequency table is built with in-batch partial counting — each
    batch collapses to (gram, partial_count) rows via a Counter before
    the shuffle — so the exchange moves at most
    #distinct-grams x #blocks tiny rows, never token streams. The
    final top-k is a sort+limit over the aggregated vocabulary (at
    web scale the vocabulary is >> k but << corpus; for a bounded
    exchange under adversarial vocabularies, cap with a per-batch
    local top-M pre-prune at the cost of exactness — not done here,
    exactness is the contract). Returns (gram, n_occurrences)."""
    from collections import Counter

    _NB = 512   # gram-hash buckets: the exchange sorts small ints,
    #             never gram strings; a gram lives in exactly ONE
    #             bucket, so per-bucket top-k is globally exact and
    #             the final merge handles <= _NB x k tiny rows

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = (t or "").split()
            c.update(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))
        grams = list(c.keys())
        # crc32, not hash(): deterministic across worker processes
        gb = [zlib.crc32(g.encode("utf-8")) % _NB for g in grams]
        return pa.table({
            "gram": pa.array(grams, pa.string()),
            "n_occurrences": pa.array(list(c.values()), pa.int64()),
            "gb": pa.array(gb, pa.int64()),
        })

    def bucket_topk(df):
        s = (df.groupby("gram")["n_occurrences"].sum()
             .reset_index()
             .sort_values(["n_occurrences", "gram"],
                          ascending=[False, True], kind="mergesort")
             .head(k))
        return s[["gram", "n_occurrences"]]

    agg = (_coalesce_for_exchange(
               _documents(sf_dir, ["text"])
               .map_batches(partial, batch_format="pyarrow"))
           .groupby("gb").map_groups(bucket_topk,
                                     batch_format="pandas"))
    return (agg.sort(["n_occurrences", "gram"],
                     descending=[True, False]).limit(k))


def top_pmi_bigrams(sf_dir: str, k: int = 100, min_count: int = 5):
    """Top-``k`` collocations: bigrams ranked by pointwise mutual
    information, PMI = ln( (c_xy/N2) / ((c_x/N1)*(c_y/N1)) ), with a
    ``min_count`` support floor (the classic word2vec-era collocation
    score; raw PMI without a floor just surfaces hapax pairs).

    Scale design: unigram counts are vocabulary-bounded, so they
    tree-combine to the driver (the same assumption the BPE/LM
    trainers make) and BROADCAST once via ``ray.put``; bigram counts
    pre-aggregate per batch and shuffle only (w1, w2, count, bucket)
    rows grouped by a crc32 gram bucket — a bigram lives in exactly
    one bucket, so per-bucket scoring + top-k is globally exact and
    the final merge handles <= #buckets x k tiny rows. N2 derives
    exactly from the unigram pass (N2 = N1 - #nonempty docs), so no
    third pass."""
    from collections import Counter

    _NB = 512
    docs = _documents(sf_dir, ["text"])

    _NDOC_KEY = ""   # whitespace-split tokens are never empty

    def uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        ndocs = 0
        for t in batch.column("text").to_pylist():
            toks = (t or "").split()
            if toks:
                ndocs += 1
                c.update(toks)
        c[_NDOC_KEY] = ndocs
        return pa.table({
            "w": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    def uni_merge(batch: pa.Table) -> pa.Table:
        import pandas as pd
        g = (batch.to_pandas().groupby("w", sort=False, as_index=False)
             ["n"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    from risjbot_ray.pipelines.lm import _agg_count_partials
    ut = _agg_count_partials(
        docs.map_batches(uni_partial, batch_format="pyarrow",
                         zero_copy_batch=True), uni_merge)
    if ut is None:
        return ray.data.from_arrow(pa.table({
            "gram": pa.array([], pa.string()),
            "n_occurrences": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())}))
    uc = dict(zip(ut.column("w").to_pylist(),
                  ut.column("n").to_pylist()))
    n_nonempty = uc.pop(_NDOC_KEY, 0)
    n1 = sum(uc.values())
    n2 = n1 - n_nonempty          # bigrams per doc = tokens - 1
    uc_ref = ray.put(uc)

    def bi_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = (t or "").split()
            c.update(zip(toks, toks[1:]))
        w1 = [a for a, _ in c.keys()]
        w2 = [b for _, b in c.keys()]
        gb = [zlib.crc32((a + " " + b).encode("utf-8")) % _NB
              for a, b in c.keys()]
        return pa.table({
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "c": pa.array(list(c.values()), pa.int64()),
            "gb": pa.array(gb, pa.int64())})

    def bucket_topk(df):
        u = ray.get(uc_ref)
        g = (df.groupby(["w1", "w2"], sort=False, as_index=False)
             ["c"].sum())
        g = g[g["c"] >= min_count]
        if len(g) == 0:
            return g.assign(gram="", pmi=0.0)[
                ["gram", "c", "pmi"]].rename(
                columns={"c": "n_occurrences"})
        cx = g["w1"].map(u).to_numpy(dtype=np.float64)
        cy = g["w2"].map(u).to_numpy(dtype=np.float64)
        c = g["c"].to_numpy(dtype=np.float64)
        g["pmi"] = np.round(
            np.log((c * float(n1) * float(n1))
                   / (float(n2) * cx * cy)), 5)
        g["gram"] = g["w1"] + " " + g["w2"]
        g = g.rename(columns={"c": "n_occurrences"})
        g = g.sort_values(["pmi", "gram"], ascending=[False, True],
                          kind="mergesort").head(k)
        return g[["gram", "n_occurrences", "pmi"]]

    agg = (_coalesce_for_exchange(
               docs.map_batches(bi_partial, batch_format="pyarrow"))
           .groupby("gb").map_groups(bucket_topk,
                                     batch_format="pandas"))
    return (agg.sort(["pmi", "gram"], descending=[True, False])
            .limit(k))


def tfidf_topk(sf_dir: str, k: int = 3):
    """Top-``k`` TF-IDF keywords per document (the classic
    keyword-extraction / search-feature stage): tfidf = tf x
    ln(N / df), rounded to 5dp (the PMI convention), ranked per doc by
    (tfidf desc, token asc). Emits (doc_id, token, tf, df, tfidf,
    rank); empty docs emit nothing.

    Scale shape: the document-frequency table is vocabulary-bounded
    (the PMI/BPE/LM broadcast assumption), built with in-batch
    per-doc-distinct partials and ONE tree-combine — no groupby
    exchange — then broadcast once via ``ray.put``. The scoring pass is
    stateless and zero-exchange: each doc's top-k needs only its own
    term counts plus the broadcast df map."""
    from collections import Counter

    docs = _documents(sf_dir, ["doc_id", "text"])
    # parquet metadata count — no data scan
    n_docs = _documents(sf_dir, ["doc_id"]).count()

    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(set((t or "").split()))
        return pa.table({
            "w": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    def df_merge(batch: pa.Table) -> pa.Table:
        import pandas as pd
        g = (batch.to_pandas().groupby("w", sort=False, as_index=False)
             ["n"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    from risjbot_ray.pipelines.lm import _agg_count_partials
    dt = _agg_count_partials(
        docs.map_batches(df_partial, batch_format="pyarrow",
                         zero_copy_batch=True), df_merge)
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "token": pa.array([], pa.string()),
        "tf": pa.array([], pa.int64()),
        "df": pa.array([], pa.int64()),
        "tfidf": pa.array([], pa.float64()),
        "rank": pa.array([], pa.int64())})
    if dt is None:
        return ray.data.from_arrow(empty)
    df_ref = ray.put(dict(zip(dt.column("w").to_pylist(),
                              dt.column("n").to_pylist())))

    def score(batch: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_tok, o_tf, o_df, o_ti, o_rk = [], [], [], [], [], []
        for d, t in zip(ids, texts):
            c = Counter((t or "").split())
            if not c:
                continue
            toks = np.array(list(c.keys()), dtype=object)
            tf = np.array(list(c.values()), dtype=np.int64)
            dfv = np.array([dfm[w] for w in toks], dtype=np.float64)
            ti = np.round(tf * np.log(float(n_docs) / dfv), 5)
            order = np.lexsort((toks, -ti))[:k]
            o_id.extend([d] * len(order))
            o_tok.extend(toks[order].tolist())
            o_tf.extend(tf[order].tolist())
            o_df.extend(dfv[order].astype(np.int64).tolist())
            o_ti.extend(ti[order].tolist())
            o_rk.extend(range(1, len(order) + 1))
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "token": pa.array(o_tok, pa.string()),
            "tf": pa.array(o_tf, pa.int64()),
            "df": pa.array(o_df, pa.int64()),
            "tfidf": pa.array(o_ti, pa.float64()),
            "rank": pa.array(o_rk, pa.int64())}) if o_id else empty

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def source_unigram_kl(sf_dir: str) -> pa.Table:
    """Domain-shift diagnostic: KL(P_source || P_corpus) of unigram
    token distributions, one row per source. Every source token is by
    construction in the corpus support, so no smoothing is needed and
    the measure is exactly SQL-expressible.

    Scale design: (source, token) counts are (#sources x vocabulary)-
    bounded — the same vocabulary-bounded assumption the BPE/LM/PMI
    trainers make — so per-batch Counters tree-combine to the driver
    with no row shuffle and the KL sums are a vectorized pass over the
    merged table."""
    from collections import Counter

    import pandas as pd

    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for src, t in zip(batch.column("source").to_pylist(),
                          batch.column("text").to_pylist()):
            for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
                c[(src, w)] += 1
        srcs = [s for s, _ in c.keys()]
        ws = [w for _, w in c.keys()]
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "w": pa.array(ws, pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    def merge(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby(["source", "w"], sort=False,
                       as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from risjbot_ray.pipelines.lm import _agg_count_partials
    t = _agg_count_partials(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True), merge)
    if t is None:
        return pa.table({"source": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64()),
                         "kl": pa.array([], pa.float64())})
    df = t.to_pandas()
    corpus = df.groupby("w", sort=False)["n"].sum()
    n_corpus = float(corpus.sum())
    q = (df["w"].map(corpus).to_numpy(dtype=np.float64)) / n_corpus
    out_rows = []
    for src, sub_idx in df.groupby("source", sort=True).groups.items():
        sub = df.loc[sub_idx]
        n_s = float(sub["n"].sum())
        p = sub["n"].to_numpy(dtype=np.float64) / n_s
        kl = float(np.sum(p * np.log(p / q[sub_idx.to_numpy()])))
        out_rows.append((src, int(n_s), round(kl, 5)))
    return pa.table({
        "source": pa.array([r[0] for r in out_rows], pa.string()),
        "n_tokens": pa.array([r[1] for r in out_rows], pa.int64()),
        "kl": pa.array([r[2] for r in out_rows], pa.float64())})


# --------------------------------------------------------------------------
# language-balanced sampling
# --------------------------------------------------------------------------

def lang_balance_sample(sf_dir: str):
    """Deterministically downsample every language to the size of the
    SMALLEST language: rate(lang) = min_count / count(lang); keep a doc
    iff md5(doc_id || ':langbal')[:8] / 2^32 < rate(lang). Two passes:
    a tiny count aggregation (one row per language on the driver —
    O(#languages), not O(docs)), then a stateless broadcast-rate filter
    identical in shape to ``domain_sample``. Reproducible on any
    cluster size. Returns (doc_id, lang, sample_key)."""
    by_lang = _counts_by(_documents(sf_dir, ["lang"]), "lang")
    min_count = min(by_lang.values()) if by_lang else 0
    rates = {l: min_count / c for l, c in by_lang.items()}
    rates_ref = ray.put(rates)

    class _Sampler:
        def __init__(self, ref) -> None:
            self.rates: dict[str, float] = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            langs = batch.column("lang").to_pylist()
            keys = np.array([_unit_hash(d, "langbal") for d in ids])
            rr = np.array([self.rates[l] for l in langs])
            m = keys < rr
            return pa.table({
                "doc_id": pa.array(
                    np.asarray(ids, dtype=np.int64)[m]),
                "lang": pa.array(
                    np.asarray(langs, dtype=object)[m], pa.string()),
                "sample_key": pa.array(keys[m], pa.float64()),
            })

    return (_documents(sf_dir, ["doc_id", "lang"])
            .map_batches(_Sampler, fn_constructor_args=(rates_ref,),
                         batch_format="pyarrow",
                         concurrency=fixed_pool()))


# --------------------------------------------------------------------------
# global quality-ordered rank (distributed ORDER BY)
# --------------------------------------------------------------------------

def _quality_scored(sf_dir: str, extra_cols: dict[str, str] | None = None
                    ) -> "ray.data.Dataset":
    """Materialized (doc_id, score[, extra quality columns]) dataset;
    ``extra_cols`` maps output name -> ``quality_batch`` column. Score
    = alpha_ratio + stopword_ratio, the same bit-exact double
    arithmetic as ``doc_quality``."""
    import pyarrow.compute as pc

    from risjbot_ray.pipelines.textstats import quality_batch

    def score_batch(b: pa.Table) -> pa.Table:
        q = quality_batch(b)
        out = {"doc_id": q.column("doc_id"),
               "score": pc.add(q.column("alpha_ratio"),
                               q.column("stopword_ratio"))}
        for name, col in (extra_cols or {}).items():
            out[name] = q.column(col)
        return pa.table(out)

    return _coalesce(
        _documents(sf_dir, ["doc_id", "text"])
        .map_batches(score_batch, batch_format="pyarrow").materialize())


def _score_range_partitions(scored: "ray.data.Dataset",
                            nparts: int) -> "ray.data.Dataset":
    """Append a ``part`` column of equi-depth range partitions on
    ``score`` DESC (boundaries from a seeded sample) and materialize.
    The sample controls only partition BALANCE; order exactness never
    depends on it: boundaries are score VALUES, so ties always share a
    partition and partition order + local (-score, doc_id) order IS
    the exact global order. Shared by ``quality_rank`` and
    ``quality_token_budget`` — their global orders must never
    diverge."""
    n = scored.count()
    samp = (scored.random_sample(min(1.0, 20_000 / max(n, 1)), seed=7)
            .to_pandas())
    if len(samp) > 4:
        keys = np.sort(-samp["score"].to_numpy())
        cuts = np.linspace(0, len(keys) - 1,
                           num=min(nparts, len(keys) // 4) + 1
                           )[1:-1].astype(int)
        bounds = np.unique(keys[cuts])
    else:
        bounds = np.empty(0, dtype=np.float64)
    bounds_ref = ray.put(bounds)

    def part_of(b: pa.Table) -> pa.Table:
        bs = ray.get(bounds_ref)
        p = np.searchsorted(bs, -b.column("score").to_numpy(),
                            side="right")
        return b.append_column("part", pa.array(p, pa.int64()))

    return (scored.map_batches(part_of, batch_format="pyarrow")
            .materialize())


def quality_rank(sf_dir: str, nparts: int = 256):
    """Global rank of every doc ordered by quality score DESC (ties by
    doc_id ASC) — the distributed ORDER BY pattern: a stateless score
    pass, sampled range partitions (:func:`_score_range_partitions`),
    per-partition counts -> driver prefix offsets (<= ``nparts`` ints),
    then one vectorized per-partition sort+assign. Returns
    (doc_id, score, rank)."""
    parts = _score_range_partitions(_quality_scored(sf_dir), nparts)

    # per-partition totals -> prefix-sum bases, no sort exchange
    bases, run = {}, 0
    for p_, n_ in sorted(_counts_by(parts, "part").items()):
        bases[int(p_)] = run
        run += n_
    bases_ref = ray.put(bases)

    def assign(df):
        order = np.lexsort((df["doc_id"].to_numpy(),
                            -df["score"].to_numpy()))
        df = df.iloc[order]
        base = ray.get(bases_ref)[int(df["part"].iloc[0])]
        df = df.assign(rank=np.arange(base, base + len(df),
                                      dtype=np.int64))
        return df.drop(columns=["part"])

    return parts.groupby("part").map_groups(assign,
                                            batch_format="pandas")


# --------------------------------------------------------------------------
# domain-level quality gating (the C4/RefinedWeb practice of judging
# QUALITY AT THE DOMAIN, not just the page: spam/SEO farms produce many
# individually-borderline pages; their domain-mean score is the robust
# signal. Drop every doc whose domain has mean quality below tau or too
# few docs to judge)
# --------------------------------------------------------------------------

_DOMAIN_TAU_FP = 885_000    # mean floor(1e6*(alpha+stopword)) >= 0.885
_DOMAIN_MIN_DOCS = 3        # below this a domain can't be judged: drop
_DOMAIN_BCAST_MAX = 20_000_000   # verdict-map cap (rows; ~50 B each)


def _score_fp_batch(batch: pa.Table) -> np.ndarray:
    """floor(1e6 * (alpha_ratio + stopword_ratio)) per doc as int64 —
    the fixed-point quality score whose per-domain SUM is an exact
    integer any engine reproduces (float means are summation-order-
    dependent; integer sums are not). The two ratios are exact int/int
    doubles (``textstats.quality_batch``), so the product/floor is
    bit-identical across engines."""
    import pyarrow.compute as pc

    from risjbot_ray.pipelines.textstats import quality_batch
    q = quality_batch(batch)
    s = pc.add(q.column("alpha_ratio"), q.column("stopword_ratio"))
    return np.floor(1e6 * s.to_numpy(zero_copy_only=False)
                    ).astype(np.int64)


def domain_quality_filter(sf_dir: str, tau_fp: int = _DOMAIN_TAU_FP,
                          min_docs: int = _DOMAIN_MIN_DOCS):
    """Keep a doc iff its domain (``source``) has at least ``min_docs``
    documents AND mean fixed-point quality >= ``tau_fp``. Returns
    (doc_id, source, domain_n_docs, domain_mean_fp, keep).

    Scale shape: the per-domain aggregate is domain-bounded, not
    corpus-bounded — a per-batch combiner emits (source, n, sum_fp)
    rows and ONE tree-combine (``lm._agg_count_partials``) hands the
    driver the verdict table, which broadcasts once via ``ray.put``
    (gated at ``_DOMAIN_BCAST_MAX`` rows — ~10M web domains is ~0.5 GB,
    at which point swap the broadcast for a hash-join on a salted
    domain key). Pass 2 is a stateless zero-exchange annotate."""
    return domain_quality_filter_over(
        _documents(sf_dir, ["doc_id", "text", "source"]),
        tau_fp=tau_fp, min_docs=min_docs)


def domain_quality_filter_over(docs: "ray.data.Dataset",
                               tau_fp: int = _DOMAIN_TAU_FP,
                               min_docs: int = _DOMAIN_MIN_DOCS,
                               passthrough: bool = False):
    """Core of :func:`domain_quality_filter` over any (doc_id, text,
    source, ...) Dataset (consumed twice — pass a materialized dataset
    unless upstream recompute is cheap). With ``passthrough`` the
    output keeps every input column and appends the verdict columns."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        fp = _score_fp_batch(batch)
        src = pc.fill_null(batch.column("source").combine_chunks(), "")
        u, inv = np.unique(np.asarray(src.to_pylist(), dtype=object),
                           return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        s = _segment_sum_i64(inv, fp, len(u))
        return pa.table({"source": pa.array(u.tolist(), pa.string()),
                         "n": pa.array(n, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd
        g = (batch.to_pandas().groupby("source", sort=False,
                                       as_index=False)[["n", "s"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    from risjbot_ray.pipelines.lm import _agg_count_partials
    dt = _agg_count_partials(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True), merge)
    # verdicts broadcast as SORTED md5-hash + aligned count arrays —
    # ray.get of numpy arrays is a zero-copy plasma read per task,
    # where a python dict would re-unpickle per batch (the same
    # failure mode the decontamination gram set hit, see _GRAM_MULT
    # comment). Lookup = one searchsorted per batch.
    if dt is None:
        vh = np.empty(0, np.uint64)
        vn = vs = np.empty(0, np.int64)
    else:
        if dt.num_rows > _DOMAIN_BCAST_MAX:
            raise RuntimeError(
                f"domain verdict table {dt.num_rows} rows exceeds "
                f"broadcast cap {_DOMAIN_BCAST_MAX}; switch to the "
                "salted-key hash-join path")
        cache: dict = {}
        vh = np.fromiter(
            (_token_h64(x, cache) for x in dt.column("source")
             .to_pylist()), dtype=np.uint64, count=dt.num_rows)
        o = np.argsort(vh, kind="stable")
        vh = vh[o]
        vn = dt.column("n").to_numpy(zero_copy_only=False)[o]
        vs = dt.column("s").to_numpy(zero_copy_only=False)[o]
    vref = ray.put((np.ascontiguousarray(vh), np.ascontiguousarray(vn),
                    np.ascontiguousarray(vs)))

    def annotate(batch: pa.Table, *, _vref=vref) -> pa.Table:
        import pyarrow.compute as pc
        vh_, vn_, vs_ = ray.get(_vref)
        src = pc.fill_null(batch.column("source").combine_chunks(), "")
        de = src.dictionary_encode()
        cache: dict = {}
        uh = np.fromiter(
            (_token_h64(x, cache) for x in de.dictionary.to_pylist()),
            dtype=np.uint64, count=len(de.dictionary))
        h = uh[de.indices.to_numpy(zero_copy_only=False)]
        pos = np.searchsorted(vh_, h)
        pos = np.minimum(pos, max(len(vh_) - 1, 0))
        # every batch source must be in the verdict table (both passes
        # read the same dataset); verify instead of assuming — a
        # non-deterministically recomputed input would otherwise index
        # out of bounds or silently borrow another domain's verdict
        if len(vh_) == 0 or not bool(np.all(vh_[pos] == h)):
            raise RuntimeError(
                "domain verdict lookup miss: annotate saw a source "
                "absent from the partial pass — the input dataset was "
                "recomputed non-deterministically between the two "
                "consumptions; materialize it before this operator")
        n = vn_[pos]
        s = vs_[pos].astype(np.float64)
        mean = s / n          # int/int in double: deterministic
        out = ({c: batch.column(c) for c in batch.column_names}
               if passthrough else
               {"doc_id": batch.column("doc_id"),
                "source": batch.column("source")})
        out["domain_n_docs"] = pa.array(n, pa.int64())
        out["domain_mean_fp"] = pa.array(mean, pa.float64())
        out["keep"] = pa.array((n >= min_docs) & (mean >= float(tau_fp)),
                               pa.bool_())
        return pa.table(out)

    return docs.map_batches(annotate, batch_format="pyarrow",
                            zero_copy_batch=True)


# --------------------------------------------------------------------------
# global token-budget selection (the "data diet": spend a fixed token
# budget on the highest-quality documents — the selection step after
# scoring in DoReMi/DSIR-style pipelines when the training run has a
# fixed token count)
# --------------------------------------------------------------------------

def quality_token_budget(sf_dir: str, budget: int = 12_000,
                         nparts: int = 256):
    """Keep the highest-quality docs whose CUMULATIVE token count (in
    quality order: score desc, doc_id asc) stays within ``budget``.
    Returns (doc_id, score, n_tokens, cum_tokens, keep) for every doc.

    Scale shape — the ``quality_rank`` machinery
    (:func:`_score_range_partitions`, shared code) extended with a
    token prefix: per-partition TOKEN SUMS reduce to <= ``nparts``
    ints on the driver, which turns them into cumulative bases; one
    vectorized per-partition sort + cumsum assigns exact global
    running totals. No corpus-wide sort exchange; the driver never
    holds rows."""
    scored = _quality_scored(sf_dir, extra_cols={"n_tokens": "n_words"})
    parts = _score_range_partitions(scored, nparts)

    # per-partition token sums -> driver prefix bases (<= nparts ints)
    def tok_partial(b: pa.Table) -> pa.Table:
        p = b.column("part").to_numpy(zero_copy_only=False)
        t = b.column("n_tokens").to_numpy(zero_copy_only=False)
        up, inv = np.unique(p, return_inverse=True)
        s = _segment_sum_i64(inv, t, len(up))
        return pa.table({"part": pa.array(up, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    sums: dict[int, int] = {}
    for t in ray.get(parts.map_batches(
            tok_partial, batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows == 0:      # empty pass-through blocks carry no
            continue             # schema
        for p_, s_ in zip(t.column("part").to_pylist(),
                          t.column("s").to_pylist()):
            sums[p_] = sums.get(p_, 0) + s_
    bases, run = {}, 0
    for p_ in sorted(sums):
        bases[p_] = run
        run += sums[p_]
    bases_ref = ray.put(bases)

    def assign(df):
        order = np.lexsort((df["doc_id"].to_numpy(),
                            -df["score"].to_numpy()))
        df = df.iloc[order]
        base = ray.get(bases_ref)[int(df["part"].iloc[0])]
        cum = base + np.cumsum(df["n_tokens"].to_numpy(),
                               dtype=np.int64)
        df = df.assign(cum_tokens=cum, keep=cum <= budget)
        return df.drop(columns=["part"])

    return parts.groupby("part").map_groups(assign,
                                            batch_format="pandas")


# --------------------------------------------------------------------------
# deterministic train/valid/test split
# --------------------------------------------------------------------------

def corpus_split(sf_dir: str, valid_frac: float = 0.05,
                 test_frac: float = 0.05):
    """Assign every doc a deterministic train/valid/test split by hash
    threshold on md5(doc_id || ':split'): stateless, shuffle-free, and
    stable under re-runs, re-shards and cluster resizes — the property
    that matters when the 100-TB corpus is re-curated and the held-out
    set must not drift into training. Returns (doc_id, split)."""
    lo = 1.0 - valid_frac - test_frac
    hi = 1.0 - test_frac

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        u = np.array([_unit_hash(d, "split") for d in ids])
        split = np.where(u < lo, "train",
                         np.where(u < hi, "valid", "test"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "split": pa.array(split, pa.string()),
        })

    return (_documents(sf_dir, ["doc_id"])
            .map_batches(assign, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# HyperLogLog distinct-text sketch
# --------------------------------------------------------------------------

_HLL_P = 12                     # 2^12 = 4096 registers, sigma ~ 1.63%


def _hll_registers(hashes_be8: bytes, p: int = _HLL_P) -> np.ndarray:
    """Fold big-endian 8-byte hashes into a 2^p-register HLL sketch:
    register index = top p bits, value = max over items of
    (leading-zero count of the remaining 64-p bits) + 1. Fully
    vectorized — the leading-zero count comes from ``unpackbits`` +
    argmax over the 64-p suffix bit columns."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not hashes_be8:
        return regs
    h = np.frombuffer(hashes_be8, dtype=">u8").astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # big-endian byte view -> unpackbits yields the 64 bits MSB-first
    # regardless of host endianness; drop the p index bits
    bits = np.unpackbits(h.astype(">u8").view(np.uint8)
                         .reshape(-1, 8), axis=1)[:, p:]
    any_set = bits.any(axis=1)
    rho = np.where(any_set, bits.argmax(axis=1) + 1,
                   64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator (Flajolet et al. 2007) with the
    small-range linear-counting correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(
        np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return float(est)


def hll_distinct(sf_dir: str, p: int = _HLL_P):
    """Approximate distinct-document count (by md5 of text) via a
    HyperLogLog sketch, returned as ONE self-checking row alongside the
    exact answer: (n_docs, n_distinct_exact, n_distinct_hll, rel_err,
    within_bound). Sketch shape is the 100-TB shape: each batch folds
    to a 4 KiB register row inside ``map_batches`` (so the exchange
    carries #blocks x 4 KiB, never hashes), merged by elementwise max
    on the driver. The exact side shuffles only 16-byte hash keys.
    ``within_bound`` checks |err| <= 3 sigma, sigma = 1.04 / sqrt(2^p)
    — a deterministic-corpus check the driver can read as pass/fail."""
    def fold(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hs = b"".join(hashlib.md5((t or "").encode()).digest()[:8]
                      for t in texts)
        regs = _hll_registers(hs, p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary())})

    reg_rows = (_documents(sf_dir, ["text"])
                .map_batches(fold, batch_format="pyarrow")
                .take_all())                 # #blocks rows x 2^p bytes
    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in reg_rows:
        merged = np.maximum(merged,
                            np.frombuffer(r["regs"], dtype=np.uint8))
    est = _hll_estimate(merged)

    # exact distinct count for the check: shuffle 128-bit digests as
    # two int64 columns bucketed by a coarse key (sorting raw md5
    # STRINGS in the exchange is pathologically slow), then one
    # vectorized per-bucket unique count
    _NB = 1024

    def hash_only(batch: pa.Table) -> pa.Table:
        from risjbot_ray.functions.digests import bucket_of, md5_pack
        hs = md5_pack(batch.column("text").to_pylist())
        return pa.table({"h_hi": pa.array(hs[:, 0], pa.int64()),
                         "h_lo": pa.array(hs[:, 1], pa.int64()),
                         "hb": pa.array(bucket_of(hs[:, 0], _NB),
                                        pa.int64())})

    def uniq(df):
        import pandas as pd
        u = len(df[["h_hi", "h_lo"]].drop_duplicates())
        return pd.DataFrame({"n": pd.Series([u], dtype="int64")})

    hashed = _coalesce_for_exchange(
        _documents(sf_dir, ["text"])
        .map_batches(hash_only, batch_format="pyarrow"))
    exact = int(hashed.groupby("hb")
                .map_groups(uniq, batch_format="pandas")
                .to_pandas()["n"].sum())
    n_docs = _documents(sf_dir, ["doc_id"]).count()

    rel = abs(est - exact) / exact if exact else 0.0
    sigma = 1.04 / math.sqrt(1 << p)
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_distinct_exact": pa.array([exact], pa.int64()),
        "n_distinct_hll": pa.array([round(est, 2)], pa.float64()),
        "rel_err": pa.array([round(rel, 5)], pa.float64()),
        "within_bound": pa.array([rel <= 3 * sigma], pa.bool_()),
    })


# --------------------------------------------------------------------------
# corpus length histogram (partial aggregation)
# --------------------------------------------------------------------------

def length_histogram(sf_dir: str, bin_width: int = 50):
    """Word-count histogram over the corpus: one row per
    ``bin_width``-word bin with doc and word totals. Partial-aggregation
    shape: each batch collapses to at most #bins rows via ``bincount``
    INSIDE ``map_batches``, so the shuffle moves O(#bins x #blocks)
    tiny rows — never documents. Returns (bin_lo, n_docs, total_words).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        nw = np.array([len(t.split()) if t else 0 for t in texts],
                      dtype=np.int64)
        bins = nw // bin_width
        n_docs = np.bincount(bins)
        words = _segment_sum_i64(bins, nw, len(n_docs))
        nz = np.nonzero(n_docs)[0]
        return pa.table({
            "bin_lo": pa.array(nz * bin_width, pa.int64()),
            "n_docs": pa.array(n_docs[nz], pa.int64()),
            "total_words": pa.array(words[nz], pa.int64()),
        })

    return (_documents(sf_dir, ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bin_lo")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("total_words", alias_name="total_words")))


# --------------------------------------------------------------------------
# flagship composition: full training-corpus curation
# --------------------------------------------------------------------------

class _CurationGate:
    """ONE fused streaming pass applying every row-level gate before any
    shuffle: quality (n_words >= 50, alpha_ratio >= 0.5, stopword_ratio
    >= 0.02 — exactly ``textstats.curate_documents``), benchmark
    exclusion (doc_id % BENCH_MOD == 0), decontamination (no 8-gram
    shared with the benchmark set), and domain-mix sampling
    (md5 threshold per source). Rows drop here, in-batch, so only the
    survivors reach the tile-dedup exchange."""

    def __init__(self, bench_ref, min_words: int = 50,
                 min_alpha: float = 0.5, min_stop: float = 0.02) -> None:
        from risjbot_ray.pipelines.textstats import _STOPWORDS
        # sorted uint64 gram-hash array: zero-copy plasma read (the
        # frozenset-of-tuples form cost ~5 s of unpickling per actor
        # and dominated the stage wall)
        self.bench: np.ndarray = ray.get(bench_ref)
        self.min_words = min_words
        self.min_alpha = min_alpha
        self.min_stop = min_stop
        self.stopwords = _STOPWORDS
        self._cache: dict = {}

    _ALPHA_RUNS = re.compile(r"[A-Za-z]+")

    def _passes(self, did: int, text: str, source: str) -> bool:
        # cheapest-first conjunction (order does not change the AND):
        # the two hash gates drop ~half the docs before any per-char
        # or per-gram work runs
        if did % BENCH_MOD == 0:
            return False
        if _unit_hash(did, "mix") >= _mix_rate(source):
            return False
        words = text.split()
        nw = len(words)
        n = len(text)
        if nw < self.min_words or n == 0:
            return False
        # identical count to the per-char [A-Za-z] loop, at C speed
        alpha = sum(map(len, self._ALPHA_RUNS.findall(text)))
        if alpha / n < self.min_alpha:
            return False
        # early-exit stopword count: pass as soon as ceil(min_stop*nw)
        # stopwords are seen (identical boolean outcome to the full
        # count — only the >= threshold matters; measured 1.8x on this
        # component since the threshold is hit within a few words)
        need = int(-(-self.min_stop * nw // 1))  # ceil
        while need / nw < self.min_stop:
            # align the integer cutoff with the exact f64 ratio test
            # (ceil of the float product can land one short)
            need += 1
        stop = 0
        for w in words:
            if w.lower().strip(".,;:!?'\"()") in self.stopwords:
                stop += 1
                if stop >= need:
                    break
        else:
            if stop / nw < self.min_stop:
                return False
        if nw < NGRAM_N:
            return True
        grams = _gram_hash_arr(words, NGRAM_N, self._cache)
        return not _in_sorted(self.bench, grams).any()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        mask = [self._passes(d, t or "", s)
                for d, t, s in zip(ids, texts, srcs)]
        return batch.filter(pa.array(mask))


def _gate_pool_size() -> int:
    """Fixed actor-pool size for the curation gate: half the cluster's
    CPUs (actor spawn latency dominates past that at bench scale), but
    ALWAYS at least 2 CPUs short of the cluster so the upstream read /
    map tasks can run — a fixed pool acquires all its actors up front,
    and a pool as large as the cluster deadlocks the pipeline."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if cpus < 4:
        # a fixed pool on a 1-3 CPU cluster can acquire every CPU and
        # starve the producer permanently; one actor + one free CPU is
        # the smallest safe shape (at 1 CPU the caller's autoscaling
        # pool releases between waves — degraded but live)
        return 1
    return max(1, min(cpus // 2, cpus - 2))


def curate_corpus(sf_dir: str, checkpoint_dir: str | None = None):
    """Flagship training-data curation pipeline — the composed form of
    the individual webtext operators, end to end:

      quality gate + benchmark exclusion + decontamination +
      domain-mix sampling   (ONE fused map_batches pass, zero shuffle)
      -> tile-granular exact-substring dedup over the survivors
      -> deterministic global shuffle rank

    Returns (doc_id, source, text_final, n_tokens_final, n_tiles,
    n_tiles_kept, rank) for every surviving doc. At 100-TB inputs the
    row-level gates drop most data before the only two exchanges (the
    int64-only tile winner shuffle; the doc-bucketed rebuild).

    ``checkpoint_dir``: if given, the gated-survivor stage (benchmark
    scan + fused gate — the pipeline's most expensive pass) persists to
    ``{checkpoint_dir}/gated/`` parquet guarded by a ``COMPLETE``
    marker, same protocol as the crawl's wave spills; a resumed run
    with a COMPLETE marker never re-reads the input corpus for that
    stage. Every stage is deterministic, so resume output is
    bit-identical to a fresh run."""
    if checkpoint_dir is not None:
        gated_dir = os.path.join(checkpoint_dir, "gated")
        marker = os.path.join(checkpoint_dir, "gated.COMPLETE")
        if os.path.exists(marker):
            gated = ray.data.read_parquet(gated_dir).materialize()
            return _curate_tail(gated)

    bench_ref = _bench_gram_ref(sf_dir)

    # The gate is the expensive stage (per-doc gram sets + quality
    # counts) and tile dedup consumes its input twice — materialize the
    # gated SURVIVORS once (a filtered subset; the object store spills
    # to disk at scale) instead of paying the gate twice.
    gated = _coalesce(
        _documents(sf_dir, ["doc_id", "text", "source"])
        .map_batches(_CurationGate, fn_constructor_args=(bench_ref,),
                     batch_format="pyarrow",
                     # FIXED pool at half the cluster CPUs: the gate is
                     # a ~3-5 s stage at bench scale, so actor SPAWN
                     # latency dominates past ~cpus/2 actors (measured:
                     # 16 fixed beats 30 fixed 2x and beats (1, 30)
                     # autoscaling at 32 CPUs); half the cluster still
                     # scales with node count at real corpus sizes.
                     # MUST leave >=2 CPUs for the upstream read tasks:
                     # a fixed pool acquires every actor up front, and
                     # pool size == cluster CPUs starves the producer
                     # (observed: permanent idle-actor deadlock on a
                     # 4-CPU test cluster)
                     concurrency=_gate_pool_size())
        .materialize())

    if checkpoint_dir is not None:
        import shutil
        # clear any partial files from a crashed earlier attempt:
        # write_parquet APPENDS uniquely-named files into an existing
        # dir, and a resume would union both generations
        shutil.rmtree(gated_dir, ignore_errors=True)
        os.makedirs(gated_dir, exist_ok=True)
        gated.write_parquet(gated_dir)
        with open(marker, "w") as f:       # marker AFTER a full write
            f.write(str(gated.count()))

    return _curate_tail(gated)


def _curate_tail(gated: "ray.data.Dataset"):
    """Post-gate stages of ``curate_corpus``: tile dedup over the
    survivors, final token counts, global shuffle rank."""
    rebuilt = _tile_dedup_over(gated, passthrough=("source",))

    def finish(b: pa.Table) -> pa.Table:
        texts = b.column("text_dedup").to_pylist()
        nt = [len(t.split()) if t else 0 for t in texts]
        b = b.append_column("n_tokens_final", pa.array(nt, pa.int64()))
        b = b.rename_columns([
            "text_final" if c == "text_dedup" else c
            for c in b.column_names])
        return b

    return _shuffle_rank_over(
        rebuilt.map_batches(finish, batch_format="pyarrow"))
