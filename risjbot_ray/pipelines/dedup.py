"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (per the Ray Data dedup guidance):
- exact: content-hash in a vectorized ``map_batches`` then
  ``groupby(hash)`` keep-first — a single shuffle on the 16-byte hash,
  never on the text.
- MinHash/LSH: per-batch shingle->minhash signatures (computed ONCE,
  materialized), then a 20-byte-row (doc_id, band, band_hash) shuffle to
  find colliding pairs; signatures hash-join back onto the LSH-bounded
  pair set for the estimate — the 512B signatures never ride the band
  shuffle. Duplicate groups closed with min-label propagation (no
  driver-side union-find over the full corpus, only over the
  verified-pair set, which LSH keeps tiny).
- SimHash: 64-bit signatures; banding on 4 x 16-bit sub-keys finds all
  pairs within Hamming distance 3 (pigeonhole), verified exactly.
- embedding near-dup: random-hyperplane LSH buckets then exact cosine.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# deterministic 64-bit mix constants
_MASK64 = (1 << 64) - 1


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles -> uint64 hashes (blake2b-derived, stable)."""
    toks = _tokens(text)
    if len(toks) < k:
        toks = toks + ["∅"] * (k - len(toks))
    out = np.empty(max(1, len(toks) - k + 1), dtype=np.uint64)
    for i in range(len(out)):
        sh = " ".join(toks[i:i + k]).encode("utf-8")
        out[i] = int.from_bytes(
            hashlib.blake2b(sh, digest_size=8).digest(), "big")
    return np.unique(out)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

_EXACT_NB = 1024


def exact_dedup(sf_dir: str):
    """One row per distinct text: (doc_id = min id in group, n_dups).
    Hash inside map_batches (vectorized); the shuffle moves (h_hi,
    h_lo, hb, doc_id) int64 rows grouped on the coarse ``hb`` bucket —
    never text, and never md5 STRINGS (sort exchanges on wide string
    keys are pathologically slow); the per-bucket reduction is one
    vectorized pandas groupby."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    from risjbot_ray.functions.digests import bucket_of, md5_pack

    def prep(batch: pa.Table) -> pa.Table:
        hs = md5_pack(batch.column("text").to_pylist())
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "h_hi": pa.array(hs[:, 0], pa.int64()),
            "h_lo": pa.array(hs[:, 1], pa.int64()),
            "hb": pa.array(bucket_of(hs[:, 0], _EXACT_NB), pa.int64()),
        })

    def reduce_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(["h_hi", "h_lo"], sort=False)["doc_id"]
        out = pd.DataFrame({"doc_id": g.min(), "n_dups": g.size()})
        return out.reset_index(drop=True)

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    hashed = _coalesce_for_exchange(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True))
    return (hashed.groupby("hb")
            .map_groups(reduce_bucket, batch_format="pandas"))


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHasher:
    """Per-actor state: the permutation parameters (a, b) generated once
    from a fixed seed."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 seed: int = 1337):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MASK64, size=num_perm, dtype=np.uint64) | 1
        self.b = rng.integers(0, _MASK64, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        # (P, S) universal-hash then min over shingles — vectorized
        v = (sh[None, :] * self.a[:, None] + self.b[:, None]) & np.uint64(
            _MASK64)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [self.signature(t or "") for t in texts]
        # fixed-width binary (num_perm x 8 bytes, little-endian uint64):
        # a primitive type, so the signature can ride a hash join as a
        # payload column (Arrow joins reject list columns)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
        })


def _explode_bands_light(batch: pa.Table, bands: int, rows_per_band: int
                         ) -> pa.Table:
    """(doc_id, band, band_hash) rows ONLY — the 512B signature does NOT
    ride the band shuffle (it would be duplicated ``bands`` times);
    signatures join back onto the (tiny) candidate-pair set instead."""
    ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("sig").to_pylist()
    out_id, out_band, out_hash = [], [], []
    row_bytes = rows_per_band * 8
    for did, sig in zip(ids, sigs):
        for b in range(bands):
            chunk = sig[b * row_bytes:(b + 1) * row_bytes]
            h = hashlib.blake2b(chunk, digest_size=8).digest()
            out_id.append(did)
            out_band.append(b)
            out_hash.append(int.from_bytes(h, "big") >> 1)
    return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                     "band": pa.array(out_band, pa.int32()),
                     "band_hash": pa.array(out_hash, pa.int64())})


#: band-bucket occupancy above which pair enumeration defers to the
#: signature-pigeonhole hot path: a bucket AT the cap emits at most
#: cap*(cap-1)/2 ~ 5e5 pair rows; past it the all-pairs output grows
#: quadratically with boilerplate skew, which is the norm at scale
_HOT_BUCKET_CAP = 1024


def _band_cands(group, hot_cap: int | None = None):
    """Colliding pairs within ONE BAND: almost all band_hash buckets are
    singletons, so keep only duplicated hashes (vectorized), then
    enumerate pairs bucket-by-bucket. Grouping by band (few, large
    groups) instead of (band, band_hash) (millions of tiny groups) keeps
    the Ray groupby shuffle coarse.

    HOT buckets (> ``_HOT_BUCKET_CAP`` members) do NOT enumerate: they
    emit one MARKER row per member (hot=band_hash, a=doc_id, b=band)
    and the caller routes them through the signature-pigeonhole hot
    path (``_hot_band_pairs_task``), which emits only pairs that pass
    the est>=threshold row-mismatch bound — the final verified output
    is identical, but one boilerplate bucket can no longer flood the
    exchange with O(n^2) candidate rows. Normal pair rows carry
    hot=-1."""
    import pandas as pd

    if hot_cap is None:
        hot_cap = _HOT_BUCKET_CAP
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "hot": pd.Series(dtype="int64")})
    hot = group[group.duplicated("band_hash", keep=False)]
    if not len(hot):
        return empty
    # vectorized run-length + batched-triu enumeration (the
    # hamming.band_run_pairs pattern): a boilerplate-heavy corpus can
    # put 10^4+ docs in ONE bucket, and a per-pair Python append loop
    # there is the exact quadratic stall this machinery must avoid
    order = np.lexsort((hot["doc_id"].to_numpy(),
                        hot["band_hash"].to_numpy()))
    ids = hot["doc_id"].to_numpy()[order]
    bh = hot["band_hash"].to_numpy()[order]
    starts = np.r_[0, np.flatnonzero(bh[1:] != bh[:-1]) + 1]
    counts = np.diff(np.r_[starts, len(bh)])
    a_parts, b_parts = [], []
    for length in np.unique(counts[(counts > 1)
                                   & (counts <= hot_cap)]):
        s = starts[counts == length]
        ti, tj = np.triu_indices(int(length), 1)
        a_parts.append(ids[(s[:, None] + ti[None, :]).ravel()])
        b_parts.append(ids[(s[:, None] + tj[None, :]).ravel()])
    a = (np.concatenate(a_parts) if a_parts
         else np.empty(0, np.int64))
    b = (np.concatenate(b_parts) if b_parts
         else np.empty(0, np.int64))
    h = np.full(len(a), -1, np.int64)
    hot_idx = np.flatnonzero(counts > hot_cap)
    if len(hot_idx):
        band = np.int64(group["band"].iloc[0])
        m_id = np.concatenate([
            ids[starts[i]:starts[i] + counts[i]] for i in hot_idx])
        m_hash = np.repeat(bh[starts[hot_idx]], counts[hot_idx])
        a = np.concatenate([a, m_id])
        b = np.concatenate([b, np.full(len(m_id), band, np.int64)])
        h = np.concatenate([h, m_hash])
    return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                         "b": pd.Series(b, dtype="int64"),
                         "hot": pd.Series(h, dtype="int64")})


_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _has_column(parquet_path: str, name: str) -> bool:
    """Column presence from parquet metadata only (file or dir)."""
    import glob
    import os

    import pyarrow.parquet as pq
    p = parquet_path
    if os.path.isdir(p):
        parts = sorted(glob.glob(os.path.join(p, "*.parquet")))
        if not parts:
            return False
        p = parts[0]
    return name in pq.read_schema(p).names


def _norm_pairs(b: pa.Table) -> pa.Table:
    """Schema-stabilize (a, b) pair blocks: pandas map_groups stages emit
    EMPTY blocks with no columns at all, and a join partition holding
    only such blocks fails field resolution ('No match for FieldRef a')."""
    if b.num_rows == 0 or "a" not in b.column_names:
        return _PAIR_SCHEMA.empty_table()
    return b.select(["a", "b"]).cast(_PAIR_SCHEMA)


# pair-broadcast cutoff for the signature fetch-back: 200k pairs x
# (64-perm x 8 B) signatures ~ 200 MB driver-side worst case
_BROADCAST_PAIRS_MAX = 200_000

# text fetch-back bound for the jaccard fast path: the pulled texts
# must fit comfortably in the object store as ONE broadcast value
_BROADCAST_TEXT_MAX_BYTES = 256 << 20


def _minhash_max_d(num_perm: int, threshold: float) -> int:
    """Largest row-mismatch count d with (P - d)/P >= threshold under
    the SAME float64 comparison the est-verify stage applies — so the
    hot path's integer bound and the verify filter agree exactly."""
    md = -1
    for d in range(num_perm + 1):
        if (num_perm - d) / num_perm >= threshold:
            md = d
    return md


@ray.remote
def _hot_band_pairs_task(ids, sig_block_refs, num_perm: int,
                         max_d: int) -> pa.Table:
    """Qualifying pairs for ONE hot band bucket via the signature-row
    pigeonhole (``functions/hamming.row_pairs_recursive`` — the media
    phash pipeline's hot-bucket defense, ported to MinHash rows).
    Streams the signature blocks one ref at a time and keeps only this
    bucket's rows, so task memory is O(bucket x num_perm x 8 B + one
    block). Emits exactly the bucket pairs with row-mismatch <= max_d,
    i.e. est_jaccard >= threshold — the same set the downstream verify
    keeps, so routing hot buckets here leaves the final output
    byte-identical while avoiding the O(n^2) candidate flood."""
    from risjbot_ray.functions.hamming import (row_pairs_dedup,
                                               row_pairs_recursive)
    need = np.asarray(ids, np.int64)
    got_ids, got_sigs = [], []
    for ref in sig_block_refs:
        t = ray.get(ref)
        # materialized datasets can carry zero-schema EMPTY blocks
        # (empty upstream splits bypass the map UDF) — skip them
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            continue
        blk = np.asarray(t.column("doc_id").to_pylist(), np.int64)
        m = np.isin(blk, need)
        if m.any():
            tt = t.filter(pa.array(m))
            got_ids.append(np.asarray(tt.column("doc_id").to_pylist(),
                                      np.int64))
            got_sigs.extend(tt.column("sig").to_pylist())
    if not got_ids or max_d < 0:
        return _PAIR_SCHEMA.empty_table()
    all_ids = np.concatenate(got_ids)
    sig = np.stack([np.frombuffer(s, dtype=np.uint64)
                    for s in got_sigs])
    out: list = []
    row_pairs_recursive(all_ids, sig, max_d, list(range(num_perm)), out)
    a, b = row_pairs_dedup(out)
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(b, pa.int64())})


@ray.remote
def _hot_cosine_pairs_task(ids, unit_block_refs,
                           threshold: float) -> pa.Table:
    """Qualifying pairs for ONE hot embedding-LSH bucket by EXACT
    cosine: streams the unit-vector blocks (one ref at a time), keeps
    this bucket's members, then runs a blockwise matmul prefilter (at
    threshold - 1e-9, far wider than matmul-vs-einsum ulp) followed by
    the verify stage's exact einsum on the survivors — so the emitted
    set equals precisely the bucket pairs the downstream
    cosine>=threshold filter would keep. O(n^2) work becomes flops in
    one task instead of candidate rows on the exchange."""
    need = np.asarray(ids, np.int64)
    got_ids, got_units = [], []
    for ref in unit_block_refs:
        t = ray.get(ref)
        # zero-schema empty blocks bypass the map UDF — skip them
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            continue
        blk = np.asarray(t.column("vec_id").to_pylist(), np.int64)
        m = np.isin(blk, need)
        if m.any():
            tt = t.filter(pa.array(m))
            got_ids.append(np.asarray(tt.column("vec_id").to_pylist(),
                                      np.int64))
            got_units.extend(tt.column("unit").to_pylist())
    if not got_ids:
        return _PAIR_SCHEMA.empty_table()
    all_ids = np.concatenate(got_ids)
    order = np.argsort(all_ids, kind="stable")
    all_ids = all_ids[order]
    unit = np.stack([np.frombuffer(got_units[i], dtype=np.float64)
                     for i in order])
    n = len(all_ids)
    out_a, out_b = [], []
    chunk = 2048
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        sims = unit[s:e] @ unit.T                  # (chunk, n)
        ci, cj = np.nonzero(sims >= threshold - 1e-9)
        gi = ci + s
        m = gi < cj                                # i < j, skip self
        gi, cj = gi[m], cj[m]
        if not len(gi):
            continue
        # exact recheck with the verify stage's own formulation
        cos = np.einsum("ij,ij->i", unit[gi], unit[cj])
        keep = cos >= threshold
        out_a.append(all_ids[gi[keep]])
        out_b.append(all_ids[cj[keep]])
    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(b, pa.int64())})


#: driver-side cap on collected hot-marker rows (~24 B each, so the
#: cap is ~120 MB of driver heap). Hot markers are one row per member
#: of a bucket past _HOT_BUCKET_CAP — the EXCEPTION by design; a
#: corpus blowing this cap is pathologically self-similar and needs
#: sharding (split the input, dedup per shard, union survivors), so
#: fail LOUDLY with that remediation instead of growing driver heap.
_HOT_MEMBER_MAX = 5_000_000


def _split_hot_markers(cands_all):
    """Split the capped pair stream into (pair Dataset, hot marker
    Table). Marker rows (hot != -1) are the EXCEPTION — only buckets
    past ``_HOT_BUCKET_CAP`` emit them, one row per member — so
    collecting them driver-side is O(hot membership), ~24 B/row,
    bounded by ``_HOT_MEMBER_MAX``."""
    import pyarrow.compute as pc

    def pairs_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return _PAIR_SCHEMA.empty_table()
        return (b.filter(pc.equal(b.column("hot"), -1))
                .select(["a", "b"]).cast(_PAIR_SCHEMA))

    hot_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("hot", pa.int64())])

    def hot_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return hot_schema.empty_table()
        return (b.filter(pc.not_equal(b.column("hot"), -1))
                .select(["a", "b", "hot"]).cast(hot_schema))

    pairs = cands_all.map_batches(pairs_only, batch_format="pyarrow")
    hot_parts = [t for t in ray.get(
        cands_all.map_batches(hot_only, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    hot_tbl = (pa.concat_tables(hot_parts) if hot_parts
               else hot_schema.empty_table())
    if hot_tbl.num_rows > _HOT_MEMBER_MAX:
        raise RuntimeError(
            f"hot-bucket membership {hot_tbl.num_rows} rows exceeds "
            f"the driver cap {_HOT_MEMBER_MAX}: the corpus is "
            "pathologically self-similar — shard the input, dedup "
            "per shard, and union survivors")
    return pairs, hot_tbl


def _collect_pairs(pairs_ds, n: int | None = None) -> pa.Table | None:
    """Materialized (a, b) Dataset -> one driver-side Arrow table,
    ONLY if its DISTRIBUTED row count is within _BROADCAST_PAIRS_MAX;
    None past the cutoff. The count gates BEFORE any block reaches
    the driver — an oversized pair set (dup-heavy corpus) must never
    be concatenated into driver heap just to discover it is too big
    for the broadcast fast path. ``n`` short-circuits the count when
    the caller already holds it."""
    if n is None:
        n = pairs_ds.count()
    if n > _BROADCAST_PAIRS_MAX:
        return None
    # to_arrow_refs can surface raw PANDAS blocks for empty
    # map_groups outputs that skipped downstream pyarrow conversion —
    # normalize per part instead of assuming Table
    parts = []
    for t in ray.get(pairs_ds.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            parts.append(t.select(["a", "b"]).cast(_PAIR_SCHEMA))
    return (pa.concat_tables(parts) if parts
            else _PAIR_SCHEMA.empty_table())


def _broadcast_fetch(ds, id_col: str, need: np.ndarray,
                     value_col: str) -> dict:
    """The fetch-back half of every broadcast fast path: ship the
    needed ids once (ray.put), pull the matching (id, value) rows with
    ONE streaming filter pass over ``ds`` — the big side never
    shuffles — and return {id: value}. Ids absent from ``ds`` are
    simply absent from the map (callers decide whether that drops the
    pair or errors). Safe on zero matches."""
    need_ref = ray.put(np.asarray(need))

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.isin(ids, ray.get(need_ref))))

    out: dict = {}
    for t in ray.get(ds.map_batches(pick, batch_format="pyarrow")
                     .to_arrow_refs()):
        if t.num_rows:
            out.update(zip(
                t.column(id_col).to_numpy(zero_copy_only=False)
                .tolist(),
                t.column(value_col).to_pylist()))
    return out


def minhash_candidate_pairs(sf_dir: str, num_perm: int = 64,
                            bands: int = 16, threshold: float = 0.7,
                            num_partitions: int | None = None,
                            sigs=None):
    """Near-duplicate pairs (a < b) with estimated Jaccard >= threshold.

    Three stages, all narrow: (1) signatures once per doc (actor pool);
    (2) band-hash shuffle of 20-byte rows -> colliding pairs, deduped;
    (3) the pair set's signatures come back via a broadcast-ids filter
    pass when the pair set is small (the LSH design case; see
    ``_BROADCAST_PAIRS_MAX``) or a distributed hash join past the
    cutoff, and the per-pair estimate is one vectorized row-equality
    mean."""
    rows_per_band = num_perm // bands
    if sigs is None:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
        # materialized: consumed by the band shuffle AND both joins —
        # without this the MinHasher pool would re-run per consumer
        from risjbot_ray.pipelines.webtext import fixed_pool
        sigs = ds.map_batches(
            MinHasher, batch_format="pyarrow",
            fn_constructor_kwargs={"num_perm": num_perm},
            concurrency=fixed_pool()).materialize()
    # else: caller passes its already-materialized (doc_id, sig)
    # Dataset (must be the same num_perm/seed MinHasher output) —
    # the incremental path computes signatures once for the ledger
    # probe and reuses them here
    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    exploded = _coalesce_for_exchange(sigs.map_batches(
        lambda b: _explode_bands_light(b, bands, rows_per_band),
        batch_format="pyarrow"))
    # consumed twice (pair split + hot-marker split) — materialized;
    # hot buckets emit O(membership) marker rows, never O(n^2) pairs,
    # so the materialized size is bounded by the cap
    hot_cap = _HOT_BUCKET_CAP          # resolved driver-side
    cands_all = exploded.groupby("band").map_groups(
        lambda g: _band_cands(g, hot_cap),
        batch_format="pandas").materialize()
    cands, hot_tbl = _split_hot_markers(cands_all)
    if hot_tbl.num_rows:
        # HOT buckets: one pigeonhole task per bucket, streaming the
        # signature blocks; outputs stay in the object store
        # (from_arrow_refs), never on the driver
        sig_refs = sigs.to_arrow_refs()
        max_d = _minhash_max_d(num_perm, threshold)
        hot_df = hot_tbl.to_pandas()
        refs = [_hot_band_pairs_task.remote(
                    g["a"].to_numpy(), sig_refs, num_perm, max_d)
                for _, g in hot_df.groupby(["b", "hot"], sort=True)]
        cands = cands.union(ray.data.from_arrow_refs(refs))
    # a pair can collide in several bands — dedupe on (a, b). An
    # all-empty multi-block pair side would fail join field
    # resolution ('No match for FieldRef a'), so the zero-pair case
    # returns before either join; past that, typed empty blocks
    # (_norm_pairs) shuffle fine and the pair side stays MULTI-BLOCK
    # — the dup-heavy past-cutoff case no longer lands on one task.
    from ray.data.aggregate import Count
    uniq = (cands.groupby(["a", "b"])
            .aggregate(Count(alias_name="n_bands"))
            .select_columns(["a", "b"])
            .map_batches(_norm_pairs, batch_format="pyarrow")
            .materialize())
    n_pairs = uniq.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64())}))

    # FAST PATH (the design case): the pair set is LSH-bounded small,
    # so instead of two distributed hash joins, broadcast the needed
    # doc_ids, pull just those signatures with one streaming filter
    # pass, and compute every per-pair estimate in one vectorized
    # call. Each signature is num_perm x 8 bytes, so the cutoff keeps
    # the pulled subset ~O(100 MB). Past the cutoff, fall back to the
    # join plan (the big side stays fully partitioned).
    pair_tbl = _collect_pairs(uniq, n_pairs)
    if pair_tbl is not None:
        a_ids = pair_tbl.column("a").to_numpy()
        b_ids = pair_tbl.column("b").to_numpy()
        raw = _broadcast_fetch(
            sigs, "doc_id",
            np.unique(np.concatenate([a_ids, b_ids])), "sig")
        sig_by_id = {i: np.frombuffer(s, dtype=np.uint64)
                     for i, s in raw.items()}
        sa = np.stack([sig_by_id[i] for i in a_ids])
        sb = np.stack([sig_by_id[i] for i in b_ids])
        e = (sa == sb).mean(axis=1)
        keep = e >= threshold
        return ray.data.from_arrow(pa.table({
            "a": pa.array(a_ids[keep], pa.int64()),
            "b": pa.array(b_ids[keep], pa.int64()),
            "est_jaccard": pa.array(e[keep], pa.float64())}))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, cpus // 2))

    j1_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("sig_a", pa.binary())])

    def _rename_a(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sig" not in b.column_names:
            return j1_schema.empty_table()
        b = b.rename_columns(["sig_a" if c == "sig" else c
                              for c in b.column_names])
        return b.select(["a", "b", "sig_a"]).cast(j1_schema)

    # n_pairs > 0 guarantees j1 is non-empty (every pair id has a
    # signature), so both joins run with MULTI-BLOCK left sides
    j1 = (uniq.join(sigs, join_type="inner", on=("a",),
                    right_on=("doc_id",), num_partitions=num_partitions)
          .map_batches(_rename_a, batch_format="pyarrow"))
    j2 = j1.join(sigs, join_type="inner", on=("b",),
                 right_on=("doc_id",), num_partitions=num_partitions)

    def est(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = np.stack([np.frombuffer(s, dtype=np.uint64)
                       for s in batch.column("sig_a").to_pylist()])
        sb = np.stack([np.frombuffer(s, dtype=np.uint64)
                       for s in batch.column("sig").to_pylist()])
        e = (sa == sb).mean(axis=1)
        keep = e >= threshold
        return pa.table({
            "a": batch.column("a").filter(pa.array(keep)),
            "b": batch.column("b").filter(pa.array(keep)),
            "est_jaccard": pa.array(e[keep], pa.float64())})

    return j2.map_batches(est, batch_format="pyarrow")


_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _norm_labels(b: pa.Table) -> pa.Table:
    """Schema-stabilize (node, label) blocks (pandas map_groups stages
    emit schemaless empty blocks)."""
    if b.num_rows == 0 or "node" not in b.column_names:
        return _LABEL_SCHEMA.empty_table()
    return b.select(["node", "label"]).cast(_LABEL_SCHEMA)


_LP_NB = 256  # label-propagation node buckets: exchanges sort this
#               small int, and each per-bucket call is vectorized
#               pandas — never one Python call per node


def label_propagation_clusters(edges, max_rounds: int = 64):
    """Distributed connected components by iterated min-label
    propagation, entirely as Dataset ops (no driver-side edge loop):
    each round unions the current (node, label) set with both edge
    directions, groups by node bucket (node % _LP_NB — all of a node's
    rows share a bucket, so per-node mins inside a bucket are exact),
    emits each node's min label to itself and every neighbor, and a
    second bucket-grouped pass folds the messages — new_label(v) =
    min(label(v), min_{u in N(v)} label(u)). Both exchanges shuffle
    small-int bucket keys and the per-bucket work is one vectorized
    pandas groupby, not a Python call per node. Labels are
    non-increasing, so convergence is detected by an unchanged sum of
    labels (a driver scalar, never the rows). Rounds needed = max
    cluster diameter; ``max_rounds`` bounds pathological chains.
    Returns a Dataset of (node, label=min reachable node id)."""
    import pandas as pd

    edges = (edges.map_batches(_norm_pairs, batch_format="pyarrow")
             .materialize())
    if not edges.take(1):
        return ray.data.from_arrow(_LABEL_SCHEMA.empty_table())

    def as_msgs(direction: str):
        def f(b: pa.Table) -> pa.Table:
            src, dst = (("a", "b") if direction == "fwd" else ("b", "a"))
            node = b.column(src).cast(pa.int64())
            return pa.table({
                "node": node,
                "nbr": b.column(dst).cast(pa.int64()),
                "label": pa.nulls(b.num_rows, pa.int64()),
                "nb": pa.array(node.to_numpy(zero_copy_only=False)
                               % _LP_NB, pa.int64()),
            })
        return f

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange

    edge_msgs = _coalesce_for_exchange(
        edges.map_batches(as_msgs("fwd"), batch_format="pyarrow")
        .union(edges.map_batches(as_msgs("rev"),
                                 batch_format="pyarrow")))

    def init_labels(df) -> "pd.DataFrame":
        nodes = np.unique(df["node"].to_numpy())
        return pd.DataFrame({"node": pd.Series(nodes, dtype="int64"),
                             "label": pd.Series(nodes, dtype="int64")})

    labels = (edge_msgs.groupby("nb")
              .map_groups(init_labels, batch_format="pandas")
              .map_batches(_norm_labels, batch_format="pyarrow")
              .materialize())

    def with_nbr(b: pa.Table) -> pa.Table:
        node = b.column("node")
        return pa.table({
            "node": node,
            "nbr": pa.nulls(b.num_rows, pa.int64()),
            "label": b.column("label"),
            "nb": pa.array(node.to_numpy(zero_copy_only=False)
                           % _LP_NB, pa.int64()),
        })

    def propagate(df) -> "pd.DataFrame":
        # vectorized over the whole bucket: per-node min label from
        # the label rows, broadcast to every neighbor row + the node
        lab = df[df["label"].notna()]
        mins = lab.groupby("node")["label"].min()
        nbr = df[df["nbr"].notna()]
        out_node = np.concatenate([
            nbr["nbr"].to_numpy(dtype=np.int64),
            mins.index.to_numpy(dtype=np.int64)])
        out_label = np.concatenate([
            mins.reindex(nbr["node"]).to_numpy(dtype=np.int64),
            mins.to_numpy(dtype=np.int64)])
        return pd.DataFrame({"node": pd.Series(out_node, dtype="int64"),
                             "label": pd.Series(out_label,
                                                dtype="int64")})

    def fold(df) -> "pd.DataFrame":
        m = df.groupby("node")["label"].min()
        return pd.DataFrame({
            "node": pd.Series(m.index.to_numpy(dtype=np.int64),
                              dtype="int64"),
            "label": pd.Series(m.to_numpy(dtype=np.int64),
                               dtype="int64")})

    def add_nb(b: pa.Table) -> pa.Table:
        return b.append_column("nb", pa.array(
            b.column("node").to_numpy(zero_copy_only=False) % _LP_NB,
            pa.int64()))

    prev_sum = None
    for _ in range(max_rounds):
        msgs = (labels.map_batches(with_nbr, batch_format="pyarrow")
                .union(edge_msgs)
                .groupby("nb")
                .map_groups(propagate, batch_format="pandas")
                .map_batches(_norm_labels, batch_format="pyarrow")
                .map_batches(add_nb, batch_format="pyarrow"))
        labels = (_coalesce_for_exchange(msgs)
                  .groupby("nb")
                  .map_groups(fold, batch_format="pandas")
                  .map_batches(_norm_labels, batch_format="pyarrow")
                  .materialize())

        def lsum(b: pa.Table) -> pa.Table:
            return pa.table({"s": pa.array(
                [int(b.column("label").to_numpy(
                    zero_copy_only=False).sum())], pa.int64())})

        cur = int(labels.map_batches(lsum, batch_format="pyarrow")
                  .to_pandas()["s"].sum())
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        # range exhausted without the unchanged-sum signal: labels are
        # NOT fixed-point (a component with diameter > max_rounds) —
        # returning them silently would emit multiple cluster ids for
        # one true component while callers promise exact components
        raise RuntimeError(
            f"label_propagation_clusters: not converged after "
            f"{max_rounds} rounds (component diameter exceeds the "
            "bound) — raise max_rounds")
    return labels


def minhash_dedup(sf_dir: str, num_perm: int = 64, bands: int = 16,
                  threshold: float = 0.7):
    """Duplicate clusters over EXACT-Jaccard-verified MinHash/LSH pairs:
    returns (doc_id, cluster_id = min doc_id reachable). Candidates come
    from LSH banding at a permissive estimated threshold (so borderline
    true pairs aren't lost to signature noise), each candidate is then
    verified with exact shingle-set Jaccard (:func:`ngram_jaccard_pairs`)
    and kept iff jaccard >= ``threshold`` — which makes the operator's
    spec pure SQL ("components over pairs with exact Jaccard >= t"),
    checkable by the driver's recursive-CTE oracle. The closure runs as
    distributed min-label propagation
    (:func:`label_propagation_clusters`) — the pair set never lands on
    the driver, only the final cluster table (LSH-bounded small) does."""
    cands = minhash_candidate_pairs(sf_dir, num_perm, bands,
                                    threshold=min(0.5, threshold))
    verified = ngram_jaccard_pairs(sf_dir, threshold=threshold,
                                   candidates=cands)
    edges = ray.data.from_arrow(verified.select(["a", "b"]))
    labels = label_propagation_clusters(edges)
    parts = [ray.get(r) for r in labels.to_arrow_refs()]
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return pa.schema([("doc_id", pa.int64()),
                          ("cluster_id", pa.int64())]).empty_table()
    tbl = (pa.concat_tables(parts)
           .rename_columns(["doc_id", "cluster_id"]))
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id",
                                                     "ascending")]))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes, vectorized per doc.

    The per-token 64-bit hash is the first 8 bytes (big-endian) of
    md5(token) — chosen over a keyed hash because it is reproducible in
    ANSI SQL (DuckDB ``md5()``), which makes the whole signature
    oracle-checkable by the driver (`__ray_entry__.oracle_sql()`
    ``simhash_signatures``)."""

    def simhash(self, text: str) -> int:
        toks = _tokens(text)
        if not toks:
            return 0
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
             for t in toks),
            dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sh = [self.simhash(t or "") for t in texts]
        # store as int64 (wrapping) for parquet friendliness
        sh64 = np.array(sh, dtype=np.uint64).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(sh64, pa.int64())})


def simhash_signatures(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    from risjbot_ray.pipelines.webtext import fixed_pool
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          concurrency=fixed_pool())


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3):
    """Pairs within Hamming<=k via 4-band pigeonhole bucketing then exact
    popcount verification."""
    import pandas as pd

    sigs = simhash_signatures(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sh = np.asarray(batch.column("simhash").to_pylist(),
                        dtype=np.int64).astype(np.uint64)
        out_id, out_band, out_key, out_sig = [], [], [], []
        for did, s in zip(ids, sh):
            for b in range(4):
                out_id.append(did)
                out_band.append(b)
                out_key.append(int((s >> np.uint64(16 * b))
                                   & np.uint64(0xFFFF)))
                out_sig.append(int(s.astype(np.int64)))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "key": pa.array(out_key, pa.int64()),
                         "simhash": pa.array(out_sig, pa.int64())})

    def pairs(group) -> "pd.DataFrame":
        # one BAND per group: vectorized run-length bucket pairing +
        # SWAR popcount, with exact recursive pigeonhole sub-banding
        # for HOT buckets — the shared kernel in functions/hamming.py
        # (the per-bucket Python loop this replaces goes quadratic
        # when a skewed corpus concentrates in one 16-bit band value)
        from risjbot_ray.functions.hamming import band_run_pairs
        band_id = int(group["band"].iloc[0]) if len(group) else 0
        a, b, h = band_run_pairs(
            group["doc_id"].to_numpy().astype(np.int64),
            group["key"].to_numpy().astype(np.int64),
            group["simhash"].to_numpy().astype(np.int64)
            .astype(np.uint64),
            max_hamming, 0xFFFF << (band_id * 16))
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64"),
                             "hamming": pd.Series(h, dtype="int64")})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    p = exploded.groupby("band").map_groups(pairs, batch_format="pandas")
    from ray.data.aggregate import Min
    return p.groupby(["a", "b"]).aggregate(Min("hamming",
                                               alias_name="hamming"))


def simhash_clusters(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-duplicate CLUSTERS over the simhash pair set: connected
    components of "Hamming(simhash_a, simhash_b) <= max_hamming",
    returning (doc_id, cluster_id = min reachable doc_id) for every
    doc that participates in at least one pair. Same composition shape
    as :func:`minhash_dedup` — banded pairs (exact for max_hamming <
    bands by the pigeonhole recall argument) feed the distributed
    min-label propagation; the pair set never lands on the driver.
    Fully SQL-checkable: signatures, the bit_count pair predicate and
    the closure are all expressible (driver oracle
    ``simhash_dedup_clusters``)."""
    pairs = simhash_near_pairs(sf_dir, max_hamming=max_hamming)
    edges = pairs.select_columns(["a", "b"])
    labels = label_propagation_clusters(edges)
    parts = [ray.get(r) for r in labels.to_arrow_refs()]
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return pa.schema([("doc_id", pa.int64()),
                          ("cluster_id", pa.int64())]).empty_table()
    tbl = (pa.concat_tables(parts)
           .rename_columns(["doc_id", "cluster_id"]))
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id",
                                                     "ascending")]))


# --------------------------------------------------------------------------
# n-gram Jaccard verification
# --------------------------------------------------------------------------

_JACCARD_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("jaccard", pa.float64())])


def ngram_jaccard_pairs(sf_dir: str, shingle_k: int = 3,
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 16, candidates=None,
                        num_partitions: int | None = None) -> pa.Table:
    """Exact shingle-set Jaccard over candidate pairs, verified as a
    distributed two-sided hash join: pairs ⋈ docs ON a, then ⋈ docs ON b,
    then a vectorized per-pair Jaccard inside map_batches — no pair texts
    or candidate loops ever land on the driver.

    ``candidates`` is a (a, b) Dataset/Table of pairs to verify (e.g. the
    output of :func:`minhash_candidate_pairs` or
    :func:`simhash_near_pairs`); by default the MinHash/LSH candidates at
    a permissive estimated threshold of 0.3 are generated — callers that
    already ran LSH should pass its pairs in rather than recomputing.
    Returns (a, b, jaccard >= threshold), sorted, 5dp."""
    if candidates is None:
        candidates = minhash_candidate_pairs(
            sf_dir, num_perm=num_perm, bands=bands, threshold=0.3)
    if isinstance(candidates, pa.Table):
        candidates = ray.data.from_arrow(candidates)
    cands = (candidates.select_columns(["a", "b"])
             .map_batches(_norm_pairs, batch_format="pyarrow")
             .materialize())
    n_pairs = cands.count()
    if n_pairs == 0:
        # an all-empty multi-block pair side would fail join field
        # resolution — return before either join; past this the pair
        # side stays MULTI-BLOCK (typed empty blocks shuffle fine)
        return _JACCARD_SCHEMA.empty_table()

    # FAST PATH (LSH-bounded pair sets): skip both distributed joins —
    # broadcast the needed doc_ids, pull just those texts with one
    # streaming filter pass, broadcast the (pair-bounded) text map, and
    # verify the pairs with a distributed map over the pair table. The
    # shingle work stays in Ray tasks; only pair ids + their texts
    # touch the driver, both bounded by the cutoffs.
    pair_tbl = _collect_pairs(cands, n_pairs)
    if pair_tbl is not None:
        a_ids = pair_tbl.column("a").to_numpy()
        b_ids = pair_tbl.column("b").to_numpy()
        need = np.unique(np.concatenate([a_ids, b_ids]))
        # size estimate from the tiny n_chars column BEFORE any text
        # is pulled — the byte guard must run ahead of the fetch it
        # guards, or multi-MB docs land on the driver just to be
        # measured (char count ~ the utf-8 size for web text). A
        # corpus without n_chars falls back to measuring the fetched
        # texts (guard after the fact, as before).
        if _has_column(f"{sf_dir}/documents.parquet", "n_chars"):
            nchars = _broadcast_fetch(
                ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "n_chars"]),
                "doc_id", need, "n_chars")
            # n_chars counts CODEPOINTS; a driver-held str spends up
            # to 4 bytes per codepoint (PEP 393 wide strings / utf-8
            # CJK), so a raw codepoint sum can understate driver heap
            # 4x. Scale by the worst case so the guard bounds actual
            # heap: ASCII-dominant corpora lose a 4x-smaller fast-path
            # window (they fall back to the distributed join, which is
            # correct just slower); nothing can exceed the cap.
            sub_bytes = 4 * sum(nchars.values())
            texts_by_id = None
        else:
            texts_by_id = _broadcast_fetch(
                ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"]),
                "doc_id", need, "text")
            sub_bytes = sum(len(t or "")
                            for t in texts_by_id.values())
        if sub_bytes <= _BROADCAST_TEXT_MAX_BYTES:
            if texts_by_id is None:
                docs0 = ray.data.read_parquet(
                    f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
                texts_by_id = _broadcast_fetch(docs0, "doc_id", need,
                                               "text")
            text_ref = ray.put(texts_by_id)
            cpus = int(ray.cluster_resources().get("CPU", 8))
            nparts = max(1, min(cpus, pair_tbl.num_rows // 64 + 1))
            pairs_ds = (ray.data.from_arrow(pair_tbl)
                        .repartition(nparts))

            def verify_bcast(batch: pa.Table) -> pa.Table:
                texts = ray.get(text_ref)
                a_o, b_o, j_o = [], [], []
                for ai, bi in zip(batch.column("a").to_pylist(),
                                  batch.column("b").to_pylist()):
                    sa = _shingle_hashes(texts.get(ai) or "", shingle_k)
                    sb = _shingle_hashes(texts.get(bi) or "", shingle_k)
                    inter = len(np.intersect1d(sa, sb,
                                               assume_unique=True))
                    union = len(sa) + len(sb) - inter
                    if union == 0:
                        continue
                    j = inter / union
                    if j >= threshold:
                        a_o.append(ai)
                        b_o.append(bi)
                        j_o.append(j)
                return pa.table({"a": pa.array(a_o, pa.int64()),
                                 "b": pa.array(b_o, pa.int64()),
                                 "jaccard": pa.array(j_o,
                                                     pa.float64())})

            out = (pairs_ds.map_batches(verify_bcast,
                                        batch_format="pyarrow")
                   .materialize())
            return _finish_jaccard(out)

    if num_partitions is None:
        # two chained joins spawn 2x num_partitions aggregator actors —
        # size to the cluster or they deadlock on small CPU counts
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, cpus // 2))
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    j1_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("text_a", pa.string())])

    def _rename_a(b: pa.Table) -> pa.Table:
        # the hash join folds the right key into `a`; only `text` remains
        if b.num_rows == 0 or "text" not in b.column_names:
            return j1_schema.empty_table()
        if "doc_id" in b.column_names:
            b = b.drop_columns(["doc_id"])
        b = b.rename_columns(["text_a" if c == "text" else c
                              for c in b.column_names])
        return b.select(["a", "b", "text_a"]).cast(j1_schema)

    # n_pairs > 0 guarantees j1 is non-empty (every pair id has a
    # document), so both joins run with MULTI-BLOCK left sides
    j1 = (cands.join(docs, join_type="inner", on=("a",),
                     right_on=("doc_id",), num_partitions=num_partitions)
          .map_batches(_rename_a, batch_format="pyarrow"))
    j2 = j1.join(docs, join_type="inner", on=("b",),
                 right_on=("doc_id",), num_partitions=num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text").to_pylist()
        a_o, b_o, j_o = [], [], []
        for ai, bi, xa, xb in zip(a, b, ta, tb):
            sa = _shingle_hashes(xa or "", shingle_k)
            sb = _shingle_hashes(xb or "", shingle_k)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union == 0:
                continue
            j = inter / union
            if j >= threshold:
                a_o.append(ai)
                b_o.append(bi)
                j_o.append(j)
        return pa.table({"a": pa.array(a_o, pa.int64()),
                         "b": pa.array(b_o, pa.int64()),
                         "jaccard": pa.array(j_o, pa.float64())})

    out = j2.map_batches(verify, batch_format="pyarrow").materialize()
    return _finish_jaccard(out)


def _finish_jaccard(out) -> pa.Table:
    """Collect, sort and round the (small, threshold-filtered) verified
    pair set."""
    parts = [t.cast(_JACCARD_SCHEMA) for t in
             (ray.get(r) for r in out.to_arrow_refs()) if t.num_rows]
    if not parts:
        return _JACCARD_SCHEMA.empty_table()
    tbl = pa.concat_tables(parts)
    idx = pc.sort_indices(tbl, sort_keys=[("a", "ascending"),
                                          ("b", "ascending")])
    tbl = tbl.take(idx)
    return tbl.set_column(2, "jaccard",
                          pc.round(tbl.column("jaccard"), 5))


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

_NEARDUP_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("cosine", pa.float64())])


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.95,
                            n_tables: int = 16, n_planes: int = 8,
                            seed: int = 99,
                            num_partitions: int | None = None) -> pa.Table:
    """Multi-table random-hyperplane LSH then exact cosine verify; returns
    (a, b, cosine) pairs with cosine >= threshold, sorted, 5dp.

    Recall math: a pair at cosine c collides in one p-plane table with
    probability (1 - arccos(c)/pi)^p; with the default p=8, T=16 a pair
    at c=0.95 is missed with probability (1-0.899^8)^16 ~ 1.3e-4 —
    effectively exact in the near-dup regime the operator targets (the
    single-table variant missed ~70% of such pairs). ``n_planes`` sets
    bucket granularity (2^p buckets/table — raise it for larger corpora
    so per-bucket candidate sets stay small).

    Scale shape (mirrors :func:`minhash_candidate_pairs`): only 16-byte
    (vec_id, bucket) rows ride the n_tables-fold bucket shuffle — the
    embedding vectors do NOT (the round-2 version duplicated every
    vector n_tables=16x through the groupby). In-bucket candidate (a, b)
    pairs are deduped across tables, then the unit vectors hash-join
    back onto the LSH-bounded pair set and the exact float64 cosine is
    one vectorized dot per pair — values match a DOUBLE[] SQL oracle."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    first = ds.take(1)
    if not first:
        return _NEARDUP_SCHEMA.empty_table()
    dim = len(first[0]["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes))
    planes_ref = ray.put(planes)

    def unitize(batch: pa.Table) -> pa.Table:
        """(vec_id, unit) with the unit vector as fixed-width float64
        bytes — a primitive binary column, join-friendly."""
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in batch.column("embedding").to_pylist()])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        return pa.table({
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "unit": pa.array([u.tobytes() for u in unit], pa.binary()),
        })

    def bucketize(batch: pa.Table) -> pa.Table:
        """Explode ONLY (vec_id, bucket) rows — one per (vector, table)."""
        pl = ray.get(planes_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        unit = np.stack([np.frombuffer(u, dtype=np.float64)
                         for u in batch.column("unit").to_pylist()])
        n = len(ids)
        out_bucket = np.empty(n_tables * n, dtype=np.int64)
        weights = 1 << np.arange(n_planes, dtype=np.uint64)
        for t in range(n_tables):
            signs = (unit @ pl[t]) > 0
            keys = (signs.astype(np.uint64) * weights).sum(axis=1)
            # table id in the high bits -> ONE coarse groupby key
            out_bucket[t * n:(t + 1) * n] = (
                (np.uint64(t) << np.uint64(n_planes)) | keys
            ).astype(np.int64)
        return pa.table({"vec_id": pa.array(np.tile(ids, n_tables)),
                         "bucket": pa.array(out_bucket, pa.int64())})

    def bucket_pairs(group) -> "pd.DataFrame":
        """All-pairs for one LSH bucket — HOT buckets (>
        ``_HOT_BUCKET_CAP``) emit one marker row per member instead
        and are routed through the exact-cosine hot task, which emits
        only pairs passing the final cosine>=threshold filter: the
        verified output is identical, but a boilerplate bucket can no
        longer flood the exchange with O(n^2) candidate rows."""
        ids = np.unique(group["vec_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "hot": pd.Series(dtype="int64")})
        if len(ids) > _HOT_BUCKET_CAP:
            bucket = np.int64(group["bucket"].iloc[0])
            return pd.DataFrame({
                "a": pd.Series(ids, dtype="int64"),
                "b": pd.Series(np.full(len(ids), bucket), dtype="int64"),
                "hot": pd.Series(np.full(len(ids), bucket),
                                 dtype="int64")})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": pd.Series(ids[ia], dtype="int64"),
                             "b": pd.Series(ids[ib], dtype="int64"),
                             "hot": pd.Series(np.full(len(ia), -1),
                                              dtype="int64")})

    # units are consumed by the bucket explode AND the pair fetch-back
    units = ds.map_batches(unitize, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    cand_all = (_coalesce_for_exchange(
                    units.map_batches(bucketize, batch_format="pyarrow"))
                .groupby("bucket").map_groups(bucket_pairs,
                                              batch_format="pandas")
                .materialize())
    cand, hot_tbl = _split_hot_markers(cand_all)
    if hot_tbl.num_rows:
        unit_refs = units.to_arrow_refs()
        refs = [_hot_cosine_pairs_task.remote(
                    g["a"].to_numpy(), unit_refs, threshold)
                for _, g in hot_tbl.to_pandas().groupby(["b", "hot"],
                                                        sort=True)]
        cand = cand.union(ray.data.from_arrow_refs(refs))
    from ray.data.aggregate import Count
    uniq = (_coalesce_for_exchange(
                cand.map_batches(_norm_pairs, batch_format="pyarrow"))
            .groupby(["a", "b"])
            .aggregate(Count(alias_name="n_hits"))
            .select_columns(["a", "b"])
            .map_batches(_norm_pairs, batch_format="pyarrow")
            .materialize())
    n_pairs = uniq.count()
    if n_pairs == 0:
        return _NEARDUP_SCHEMA.empty_table()

    # FAST PATH (LSH-bounded pair sets): broadcast the needed vec_ids,
    # pull just those unit vectors with one streaming filter pass, and
    # take every exact cosine in one vectorized einsum — no joins.
    # Bounded by the pair cutoff AND the pulled-bytes cutoff (a unit
    # vector is dim x 8 B); past either, the join plan applies.
    pair_tbl = _collect_pairs(uniq, n_pairs)
    if pair_tbl is not None:
        a_ids = pair_tbl.column("a").to_numpy()
        b_ids = pair_tbl.column("b").to_numpy()
        need = np.unique(np.concatenate([a_ids, b_ids]))
        if len(need) * dim * 8 <= _BROADCAST_TEXT_MAX_BYTES:
            raw = _broadcast_fetch(units, "vec_id", need, "unit")
            unit_by_id = {i: np.frombuffer(u, dtype=np.float64)
                          for i, u in raw.items()}
            ua = np.stack([unit_by_id[i] for i in a_ids])
            ub = np.stack([unit_by_id[i] for i in b_ids])
            cos = np.einsum("ij,ij->i", ua, ub)
            keep = cos >= threshold
            tbl = pa.table({
                "a": pa.array(a_ids[keep], pa.int64()),
                "b": pa.array(b_ids[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }).cast(_NEARDUP_SCHEMA)
            if tbl.num_rows == 0:
                return _NEARDUP_SCHEMA.empty_table()
            idx = pc.sort_indices(tbl, sort_keys=[
                ("a", "ascending"), ("b", "ascending")])
            tbl = tbl.take(idx)
            return tbl.set_column(2, "cosine",
                                  pc.round(tbl.column("cosine"), 5))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, cpus // 2))

    j1_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("unit_a", pa.binary())])

    def _rename_a(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "unit" not in b.column_names:
            return j1_schema.empty_table()
        b = b.rename_columns(["unit_a" if c == "unit" else c
                              for c in b.column_names])
        return b.select(["a", "b", "unit_a"]).cast(j1_schema)

    # n_pairs > 0 guarantees j1 is non-empty (every pair id has a
    # unit vector), so both joins run with MULTI-BLOCK left sides
    j1 = (uniq.join(units, join_type="inner", on=("a",),
                    right_on=("vec_id",), num_partitions=num_partitions)
          .map_batches(_rename_a, batch_format="pyarrow"))
    j2 = j1.join(units, join_type="inner", on=("b",),
                 right_on=("vec_id",), num_partitions=num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _NEARDUP_SCHEMA.empty_table()
        ua = np.stack([np.frombuffer(u, dtype=np.float64)
                       for u in batch.column("unit_a").to_pylist()])
        ub = np.stack([np.frombuffer(u, dtype=np.float64)
                       for u in batch.column("unit").to_pylist()])
        cos = np.einsum("ij,ij->i", ua, ub)
        keep = cos >= threshold
        return pa.table({
            "a": batch.column("a").filter(pa.array(keep)),
            "b": batch.column("b").filter(pa.array(keep)),
            "cosine": pa.array(cos[keep], pa.float64())})

    out = j2.map_batches(verify, batch_format="pyarrow").materialize()
    parts = [t.cast(_NEARDUP_SCHEMA) for t in
             (ray.get(r) for r in out.to_arrow_refs()) if t.num_rows]
    if not parts:
        return _NEARDUP_SCHEMA.empty_table()
    tbl = pa.concat_tables(parts)
    idx = pc.sort_indices(tbl, sort_keys=[("a", "ascending"),
                                          ("b", "ascending")])
    tbl = tbl.take(idx)
    return tbl.set_column(2, "cosine", pc.round(tbl.column("cosine"), 5))


# ---------------------------------------------------------------------------
# SemDedup: semantic dedup via k-means cells + within-cell cosine pruning
# ---------------------------------------------------------------------------

_SEMDEDUP_SCHEMA = pa.schema([
    ("vec_id", pa.int64()), ("cell", pa.int64()), ("kept", pa.bool_()),
    ("dup_of", pa.int64()), ("dup_cosine", pa.float64())])


def semdedup_assignments(sf_dir: str, eps: float = 0.95, n_cells: int = 8,
                         seed: int = 5, chunk: int = 2048):
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space coarsely, then prune near-duplicates WITHIN each
    cluster by exact cosine — the quadratic work is bounded per cell,
    never global. Returns a ``ray.data.Dataset`` with one row per
    vector: (vec_id, cell, kept, dup_of, dup_cosine).

    Keep rule (deterministic, order-free): a vector ``j`` is dropped
    iff some SMALLER vec_id ``i`` in the same cell has
    ``cosine(i, j) >= eps``; ``dup_of`` is the smallest such ``i``
    (``-1`` and cosine ``0.0`` for kept rows). With ``n_cells=1`` this
    is exact greedy-free global semantic dedup, expressible as
    all-pairs SQL — the driver oracle checks that case; the clustered
    path is pinned by ``embedding_semdedup_clustered``'s independent
    recompute counters and the planted-duplicate pytest gate.

    Scale shape: reuses :class:`~risjbot_ray.pipelines.similarity.IVFIndex`
    — sample-only centroid fit, one ``map_batches`` assign pass writing
    CELL-PARTITIONED unit-vector parquet — then ONE Ray task per cell
    reads only its own cell's files (zero shuffle; the same
    partition-once layout the fetch join and IVF search use). Within a
    cell the pairwise pass runs in ``chunk x chunk`` tiles ascending by
    vec_id, so memory is O(chunk^2) regardless of cell size and the
    first qualifying tile short-circuits later columns. Cell size is
    the operator's documented partitioning assumption: pick
    ``n_cells ~ n / target_cell_rows`` so a cell's tile sweep stays
    cheap (the SemDedup paper's trade, made explicit)."""
    from .similarity import IVFIndex

    index = IVFIndex(sf_dir, n_cells=n_cells, seed=seed)
    index_dir = index.index_dir

    def cell_dedup(batch: pa.Table) -> pa.Table:
        import glob
        import os

        import pyarrow.parquet as pq_

        out: list[pa.Table] = []
        for c in batch.column("cell").to_pylist():
            parts = sorted(glob.glob(os.path.join(
                index_dir, f"cell={int(c):04d}", "part-*.parquet")))
            if not parts:
                continue
            t = pa.concat_tables([pq_.read_table(p) for p in parts])
            ids = np.asarray(t.column("vec_id").to_pylist(),
                             dtype=np.int64)
            unit = np.stack([np.asarray(v, dtype=np.float64)
                             for v in t.column("unit").to_pylist()])
            order = np.argsort(ids, kind="stable")
            ids, unit = ids[order], unit[order]
            m = len(ids)
            kept = np.ones(m, dtype=bool)
            dup_of = np.full(m, -1, dtype=np.int64)
            dcos = np.zeros(m, dtype=np.float64)
            for j0 in range(0, m, chunk):
                j1 = min(j0 + chunk, m)
                rows = unit[j0:j1]
                gidx = np.arange(j0, j1)
                found = np.zeros(j1 - j0, dtype=bool)
                # ascending column tiles => first hit IS the smallest id
                for c0 in range(0, j1, chunk):
                    c1 = min(c0 + chunk, j1)
                    sims = rows @ unit[c0:c1].T
                    mask = (np.arange(c0, c1)[None, :]
                            < gidx[:, None]) & ~found[:, None]
                    hits = (sims >= eps) & mask
                    anyh = hits.any(axis=1)
                    if anyh.any():
                        rsel = np.nonzero(anyh)[0]
                        first = hits[rsel].argmax(axis=1)
                        kept[gidx[rsel]] = False
                        dup_of[gidx[rsel]] = ids[c0 + first]
                        dcos[gidx[rsel]] = sims[rsel, first]
                        found |= anyh
                    if found.all():
                        break
            out.append(pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(np.full(m, int(c)), pa.int64()),
                "kept": pa.array(kept),
                "dup_of": pa.array(dup_of, pa.int64()),
                "dup_cosine": pa.array(np.round(dcos, 5), pa.float64()),
            }))
        if not out:
            return _SEMDEDUP_SCHEMA.empty_table()
        return pa.concat_tables(out)

    cells = ray.data.from_items([{"cell": c} for c in range(n_cells)],
                                override_num_blocks=n_cells)
    return cells.map_batches(cell_dedup, batch_format="pyarrow",
                             batch_size=1)


def embedding_semdedup(sf_dir: str, eps: float = 0.95,
                       n_cells: int = 1, seed: int = 5) -> pa.Table:
    """Driver/table form of :func:`semdedup_assignments`, sorted by
    vec_id. The default ``n_cells=1`` is the oracle-checkable exact
    case (all vectors in one cell == global all-pairs rule); at scale
    call ``semdedup_assignments`` with a real cell count and consume
    the Dataset with ``write_parquet``."""
    ds = semdedup_assignments(sf_dir, eps=eps, n_cells=n_cells, seed=seed)
    tbl = pa.concat_tables(
        [t.cast(_SEMDEDUP_SCHEMA) for t in
         (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
        or [_SEMDEDUP_SCHEMA.empty_table()])
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("vec_id",
                                                     "ascending")]))


def embedding_semdedup_clustered(sf_dir: str, eps: float = 0.95,
                                 n_cells: int = 8,
                                 seed: int = 5) -> pa.Table:
    """Clustered SemDedup with a driver-visible independent check, in
    the ``media_features_check`` style: the distributed per-cell result
    is recomputed from the RAW embeddings parquet + the index's
    centroids (a different code path from the unit-vector cell spill)
    and compared row-for-row. Returns one row per cell
    (cell, n_vectors, n_kept, n_dropped) with constant self-check
    columns: ``check_mismatch`` must be 0 and ``checked_n`` must equal
    the corpus size. The O(n^2/n_cells) recompute is driver-side and
    exists for checkable scales only — the operator itself is the
    distributed path."""
    import pyarrow.parquet as pq_

    from .similarity import IVFIndex

    res = embedding_semdedup(sf_dir, eps=eps, n_cells=n_cells, seed=seed)

    # independent recompute: raw vectors -> unitize -> centroid argmax
    # (the assign formula, from centroids.npy, NOT the cell spill) ->
    # per-cell smallest-earlier-id rule
    index = IVFIndex(sf_dir, n_cells=n_cells, seed=seed)
    raw = pq_.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ids = np.asarray(raw.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in raw.column("embedding").to_pylist()])
    unit = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(unit @ index.centroids.T, axis=1)

    order = np.argsort(ids, kind="stable")
    ids, unit, cells = ids[order], unit[order], cells[order]
    exp_kept = np.ones(len(ids), dtype=bool)
    exp_dup = np.full(len(ids), -1, dtype=np.int64)
    exp_cos = np.zeros(len(ids), dtype=np.float64)
    for c in np.unique(cells):
        sel = np.nonzero(cells == c)[0]
        s = unit[sel] @ unit[sel].T
        hits = np.tril(s >= eps, k=-1)
        anyh = hits.any(axis=1)
        first = hits.argmax(axis=1)
        exp_kept[sel[anyh]] = False
        exp_dup[sel[anyh]] = ids[sel[first[anyh]]]
        exp_cos[sel[anyh]] = s[np.arange(len(sel))[anyh], first[anyh]]

    got = {int(v): (bool(k), int(d), float(dc))
           for v, k, d, dc in zip(res.column("vec_id").to_pylist(),
                                  res.column("kept").to_pylist(),
                                  res.column("dup_of").to_pylist(),
                                  res.column("dup_cosine").to_pylist())}
    mism = sum(
        1 for i, v in enumerate(ids)
        if got.get(int(v)) != (bool(exp_kept[i]), int(exp_dup[i]),
                               float(np.round(exp_cos[i], 5))))
    mism += abs(len(got) - len(ids))

    cell_col = np.asarray(res.column("cell").to_pylist(), dtype=np.int64)
    kept_col = np.asarray(res.column("kept").to_pylist(), dtype=bool)
    rows = []
    for c in sorted(set(cell_col.tolist())):
        m = cell_col == c
        rows.append((int(c), int(m.sum()), int(kept_col[m].sum()),
                     int((~kept_col[m]).sum())))
    return pa.table({
        "cell": pa.array([r[0] for r in rows], pa.int64()),
        "n_vectors": pa.array([r[1] for r in rows], pa.int64()),
        "n_kept": pa.array([r[2] for r in rows], pa.int64()),
        "n_dropped": pa.array([r[3] for r in rows], pa.int64()),
        "eps": pa.array([eps] * len(rows), pa.float64()),
        "check_mismatch": pa.array([mism] * len(rows), pa.int64()),
        "checked_n": pa.array([len(ids)] * len(rows), pa.int64()),
    })


# --------------------------------------------------------------------------
# near-dup cluster representative selection (FineWeb/RefinedWeb-style
# "keep the best doc per duplicate cluster" — the curation step after
# clustering, instead of blind keep-first)
# --------------------------------------------------------------------------

def minhash_cluster_keep(sf_dir: str, threshold: float = 0.7):
    """(doc_id, cluster_id, kept) for EVERY document: cluster_id is the
    MinHash/exact-Jaccard component label (singletons label themselves),
    and exactly one doc per cluster is kept — the longest by n_words,
    ties to the smallest doc_id (the usual keep-longest curation rule;
    RefinedWeb §"deduplication" keeps one representative per cluster).

    Scale shape: the cluster table is LSH-bounded small (it already
    lands on the driver in :func:`minhash_dedup`); per-doc word counts
    for MEMBER docs come back via one column-pruned streaming filter
    pass (``_broadcast_fetch`` — the corpus never shuffles), and the
    final kept-marking is a stateless map_batches over a broadcast
    {cluster -> representative} map, one small dict per actor, never a
    join exchange."""
    clusters = minhash_dedup(sf_dir, threshold=threshold)
    cl_of = dict(zip(clusters.column("doc_id").to_pylist(),
                     clusters.column("cluster_id").to_pylist()))

    member_ids = np.sort(np.fromiter(cl_of, dtype=np.int64,
                                     count=len(cl_of)))
    member_ref = ray.put(member_ids)  # zero-copy numpy per task

    def _count_words(batch: pa.Table) -> pa.Table:
        # word counts are only needed for CLUSTER MEMBERS (~1% of the
        # corpus); filter by the broadcast member set BEFORE paying the
        # text materialization + split
        mem = ray.get(member_ref)
        ids = batch.column("doc_id").to_numpy()
        if mem.size:
            pos = np.searchsorted(mem, ids)
            pos[pos >= mem.size] = 0
            keep = np.flatnonzero(mem[pos] == ids)
        else:
            keep = np.empty(0, dtype=np.int64)
        sub = batch.take(pa.array(keep))
        texts = sub.column("text").to_pylist()
        return pa.table({
            "doc_id": sub.column("doc_id"),
            "n_words": pa.array([len(t.split()) if t else 0
                                 for t in texts], pa.int64())})

    nw_ds = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
             .map_batches(_count_words, batch_format="pyarrow"))
    # only the members' (doc_id, n_words) ints reach the driver — the
    # texts never do
    nw_of = _broadcast_fetch(nw_ds, "doc_id", member_ids, "n_words")
    # representative per cluster: (n_words desc, doc_id asc)
    best: dict[int, tuple[int, int]] = {}
    for doc, cl in cl_of.items():
        key = (-int(nw_of.get(doc, 0)), doc)
        if cl not in best or key < best[cl]:
            best[cl] = key
    rep_of = {cl: k[1] for cl, k in best.items()}

    # broadcast as sorted int64 arrays: dict payloads re-deserialize in
    # full on every task's ray.get, numpy arrays come back zero-copy
    m_doc = np.fromiter(cl_of.keys(), dtype=np.int64, count=len(cl_of))
    m_cl = np.fromiter(cl_of.values(), dtype=np.int64, count=len(cl_of))
    order = np.argsort(m_doc, kind="stable")
    r_cl = np.asarray(sorted(rep_of), dtype=np.int64)
    r_rep = np.asarray([rep_of[c] for c in r_cl], dtype=np.int64)
    maps_ref = ray.put((m_doc[order], m_cl[order], r_cl, r_rep))

    def mark(batch: pa.Table) -> pa.Table:
        m_doc, m_cl, r_cl, r_rep = ray.get(maps_ref)
        ids = batch.column("doc_id").to_numpy().astype(np.int64,
                                                       copy=False)
        cls = ids.copy()  # singletons label themselves
        if m_doc.size and ids.size:
            pos = np.searchsorted(m_doc, ids)
            pos[pos >= m_doc.size] = 0
            hit = m_doc[pos] == ids
            cls[hit] = m_cl[pos[hit]]
        reps = cls.copy()  # unknown cluster -> representative == label
        if r_cl.size and ids.size:
            pos = np.searchsorted(r_cl, cls)
            pos[pos >= r_cl.size] = 0
            hit = r_cl[pos] == cls
            reps[hit] = r_rep[pos[hit]]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "cluster_id": pa.array(cls, pa.int64()),
                         "kept": pa.array(reps == ids, pa.bool_())})

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
            .map_batches(mark, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# fuzzy decontamination (near-duplicate overlap with a held-out benchmark
# suite — the GPT-3/GPT-4-style eval decontamination step where EXACT
# n-gram matching misses lightly-edited benchmark copies)
# --------------------------------------------------------------------------

_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _shingle_hash_batch(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Vectorized k-token shingle hashes for a whole batch: tokenize the
    whole column in polars (lowercase + ``[a-z0-9]+`` extract_all — the
    exact `_tokens` semantics), ONE string hash call over the exploded
    tokens (fixed seed), then a numpy sliding multiply-xor mix per doc.
    Same padding convention as :func:`_shingle_hashes` (docs shorter
    than k pad with '∅' so an empty doc still has exactly one shingle),
    but a different hash function — used only where hashes stand in for
    shingle IDENTITY (set intersection/Jaccard), never where hash
    VALUES matter (MinHash signatures keep the blake2b path)."""
    import polars as pl
    toks = (pl.Series("t", texts, dtype=pl.String).fill_null("")
            .str.to_lowercase().str.extract_all(r"[a-z0-9]+"))
    lens = toks.list.len().to_numpy().astype(np.int64)
    # explode() emits ONE null row per empty list; mask those out so
    # offsets derived from `lens` (0 for empty docs) stay aligned
    flat = toks.explode()
    th = flat.hash(seed=0).to_numpy()[flat.is_not_null().to_numpy()]
    pad = pl.Series(["∅"]).hash(seed=0).to_numpy()
    out, pos = [], 0
    for n in lens:
        h = th[pos:pos + n]
        pos += n
        if n < k:
            h = np.concatenate([h, np.repeat(pad, k - n)])
            n = k
        m = n - k + 1
        acc = h[:m].copy()
        for j in range(1, k):
            acc = (acc * _SHINGLE_MIX) ^ h[j:j + m]
        out.append(np.unique(acc))
    return out


def decontaminate_fuzzy(sf_dir: str, threshold: float = 0.5):
    """Per non-benchmark document: the maximum exact 3-shingle Jaccard
    against ANY benchmark document (``doc_id % BENCH_MOD == 0`` stands in
    for the held-out suite, as in :func:`webtext.decontaminate`), the
    arg-max benchmark doc (ties to the smallest id; -1 when the doc
    shares no shingle with any benchmark doc) and a ``contaminated_fuzzy``
    flag at ``threshold``.

    Scale shape: the benchmark side is an external eval suite (small and
    fixed regardless of corpus size), broadcast ONCE as an inverted
    shingle index — sorted gram vocabulary + flattened posting lists of
    bench-doc indices. The corpus streams through a stateless probe:
    per doc, ONE ``searchsorted`` into the vocabulary, one ragged
    posting gather, one ``bincount`` — intersection counts against ALL
    bench docs at once, O(doc_grams x avg_postings) with no per-bench
    loop, so cost is independent of suite size for the typical doc."""
    from .webtext import BENCH_MOD

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def _bench_sets(b: pa.Table) -> pa.Table:
        keep = np.flatnonzero(
            b.column("doc_id").to_numpy() % BENCH_MOD == 0)
        sub = b.take(pa.array(keep))
        hashes = _shingle_hash_batch(sub.column("text").to_pylist())
        return pa.table({
            "bench_id": sub.column("doc_id"),
            "sh": pa.array(hashes, pa.list_(pa.uint64()))})

    bench: list[tuple[int, np.ndarray]] = []
    for t in ray.get(docs.map_batches(_bench_sets,
                                      batch_format="pyarrow")
                     .to_arrow_refs()):
        if t.num_rows and "bench_id" in t.column_names:
            ids = t.column("bench_id").to_numpy()
            lst = t.column("sh").combine_chunks()
            offs = lst.offsets.to_numpy()
            vals = lst.values.to_numpy().astype(np.uint64, copy=False)
            for i, bid in enumerate(ids):
                bench.append((int(bid), vals[offs[i]:offs[i + 1]]))
    bench.sort()
    # inverted shingle index: sorted vocab + flattened posting lists of
    # bench positions (bench is id-sorted, so "first max" = smallest id)
    bench_ids = np.asarray([b for b, _ in bench], dtype=np.int64)
    bench_sizes = np.asarray([a.size for _, a in bench], dtype=np.int64)
    if bench:
        flat = np.concatenate([a for _, a in bench])
        owner = np.repeat(np.arange(len(bench), dtype=np.int32),
                          bench_sizes)
        order = np.argsort(flat, kind="stable")
        flat, owner = flat[order], owner[order]
        vocab, start = np.unique(flat, return_index=True)
        post_off = np.append(start, flat.size).astype(np.int64)
    else:
        vocab = np.empty(0, dtype=np.uint64)
        owner = np.empty(0, dtype=np.int32)
        post_off = np.zeros(1, dtype=np.int64)
    ref = ray.put((bench_ids, bench_sizes, vocab, post_off, owner))

    class _Probe:
        def __init__(self, r):
            (self.bench_ids, self.bench_sizes, self.vocab,
             self.post_off, self.owner) = ray.get(r)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_pylist()
            texts = b.column("text").to_pylist()
            sel = [(did, t) for did, t in zip(ids, texts)
                   if did % BENCH_MOD != 0]
            gram_sets = _shingle_hash_batch([t for _, t in sel])
            n_sel = len(sel)
            n_bench = self.bench_ids.size
            # whole-batch probe: one searchsorted, one ragged posting
            # gather, one (doc, bench) key sort, one lexsort winner pick
            o_j = np.zeros(n_sel, dtype=np.float64)
            o_b = np.full(n_sel, -1, dtype=np.int64)
            if self.vocab.size and n_sel:
                glens = np.asarray([g.size for g in gram_sets],
                                   dtype=np.int64)
                cat = (np.concatenate(gram_sets) if glens.sum()
                       else np.empty(0, dtype=np.uint64))
                doc_of = np.repeat(np.arange(n_sel, dtype=np.int64),
                                   glens)
                pos = np.searchsorted(self.vocab, cat)
                pos[pos >= self.vocab.size] = 0
                ok = self.vocab[pos] == cat
                vix, dix = pos[ok], doc_of[ok]
                if vix.size:
                    starts = self.post_off[vix]
                    plens = self.post_off[vix + 1] - starts
                    total = int(plens.sum())
                    offs = np.concatenate(([0], np.cumsum(plens)[:-1]))
                    flat_ix = (np.arange(total)
                               - np.repeat(offs, plens)
                               + np.repeat(starts, plens))
                    hit_doc = np.repeat(dix, plens)
                    hit_bench = self.owner[flat_ix].astype(np.int64)
                    key = hit_doc * n_bench + hit_bench
                    key.sort()
                    nb = np.empty(key.size, dtype=bool)
                    nb[0] = True
                    nb[1:] = key[1:] != key[:-1]
                    kstarts = np.flatnonzero(nb)
                    inter = np.diff(np.append(kstarts, key.size))
                    uk = key[kstarts]
                    d = uk // n_bench
                    bb = uk - d * n_bench
                    j = inter / (glens[d] + self.bench_sizes[bb]
                                 - inter)
                    # winner per doc: j desc, bench index (= id) asc
                    order = np.lexsort((bb, -j, d))
                    ds_, js_, bs_ = d[order], j[order], bb[order]
                    first = np.empty(ds_.size, dtype=bool)
                    first[0] = True
                    first[1:] = ds_[1:] != ds_[:-1]
                    o_j[ds_[first]] = js_[first]
                    o_b[ds_[first]] = self.bench_ids[bs_[first]]
            o_id = [did for did, _ in sel]
            o_j = o_j.tolist()
            o_b = o_b.tolist()
            return pa.table({
                "doc_id": pa.array(o_id, pa.int64()),
                # half_towards_infinity == SQL ROUND's half-away-from-zero
                # (pc.round defaults to half-even and diverges on exact
                # binary halves like 1/64 = 0.015625)
                "max_jaccard": pc.round(
                    pa.array(o_j, pa.float64()), 5,
                    round_mode="half_towards_infinity"),
                "bench_id": pa.array(o_b, pa.int64()),
                "contaminated_fuzzy": pa.array(
                    [j >= threshold for j in o_j], pa.bool_())})

    # fixed pool sized like the curation gate (half the CPUs, two left
    # free for the upstream read) — an autoscaling pool ramps from one
    # actor and pays its spawn latency on the critical path
    cpus = int(ray.cluster_resources().get("CPU", 8))
    pool = 1 if cpus < 4 else max(1, min(cpus // 2, cpus - 2, 16))
    return docs.map_batches(_Probe, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=pool)


# --------------------------------------------------------------------------
# incremental MinHash dedup against a persisted band ledger — the
# FineWeb per-dump rule (Penedo et al. 2024 §3.3: each new snapshot is
# deduplicated against everything previously KEPT, then within itself;
# their ablation found cross-dump dedup is the part that matters).
# Complements the exact incremental tile ledger (webtext.py) and the
# bloom prior-snapshot mode with the FUZZY cross-snapshot path: no
# prior text is ever re-read — the ledger holds each kept doc's 20-byte
# band rows (collision probes) and its 512-byte signature (est-Jaccard
# verification), bucket-partitioned so probes and verifies read only
# their own partitions (the tile ledger's side-lookup convention).
# --------------------------------------------------------------------------

_INCR_PRIOR_PER_BUCKET = 8    # prior candidates kept per (band, hash)
_INCR_PRIOR_PER_DOC = 32      # prior candidates kept per new doc


def _ledger_meta(ledger_dir: str, nbuckets: int, num_perm: int,
                 bands: int) -> None:
    import json
    import os
    os.makedirs(ledger_dir, exist_ok=True)
    meta_path = os.path.join(ledger_dir, "ledger.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta["nbuckets"] != nbuckets or meta["num_perm"] != num_perm
                or meta["bands"] != bands):
            raise ValueError(
                f"minhash ledger at {ledger_dir} was built with "
                f"{meta}; got nbuckets={nbuckets} "
                f"num_perm={num_perm} bands={bands}")
    else:
        with open(meta_path, "w") as f:
            json.dump({"nbuckets": nbuckets, "num_perm": num_perm,
                       "bands": bands}, f)


def _ledger_snapshot(root: str) -> dict[int, list[str]]:
    """Driver-side snapshot of part=* -> committed delta files (paths
    only); tasks read ONLY these, never deltas appended later (the
    tile-ledger snapshot rule, webtext.py)."""
    import glob as _glob
    import os
    snap: dict[int, list[str]] = {}
    for pdir in _glob.glob(os.path.join(root, "part=*")):
        try:
            b = int(os.path.basename(pdir).split("=", 1)[1])
        except ValueError:
            continue
        fl = sorted(_glob.glob(os.path.join(pdir, "*.parquet")))
        if fl:
            snap[b] = fl
    return snap


def minhash_dedup_incremental(shard_dir: str, ledger_dir: str,
                              num_perm: int = 64, bands: int = 16,
                              threshold: float = 0.7,
                              nbuckets: int = 256):
    """Dedup a NEW document shard (``{shard_dir}/documents.parquet``)
    against the persisted MinHash ledger, then within itself, and fold
    the kept docs back into the ledger. Returns one row per shard doc:
    (doc_id, kept, reason in {'kept', 'prior_dup', 'shard_dup'}),
    sorted by doc_id.

    Rule (deterministic, mirrored exactly by the self-check reference):
    1. CROSS: a shard doc drops ('prior_dup') iff its estimated
       Jaccard (signature row-equality) vs some prior-kept doc reaches
       ``threshold``, candidates found by band-hash collision against
       the ledger — capped at the ``_INCR_PRIOR_PER_BUCKET`` smallest
       prior doc_ids per colliding (band, hash) bucket and the
       ``_INCR_PRIOR_PER_DOC`` smallest per shard doc (a true near-dup
       collides in ~every band at the threshold, so the caps cost
       recall only in adversarial bucket floods; they bound the
       candidate volume to O(|shard| x 32) regardless of skew).
    2. WITHIN: survivors cluster over EXACT shingle-Jaccard-verified
       pairs (:func:`minhash_dedup` semantics); each cluster keeps its
       min doc_id, the rest drop ('shard_dup').
    3. FOLD: kept docs' band rows and signatures append to the ledger
       as ``.pending`` deltas, committed (renamed) only after the
       result materializes — a run that dies mid-way leaves the ledger
       untouched (the tile ledger's crash rule).

    Scale shape: the ledger is bucket-partitioned (band rows by
    band_hash % nbuckets, signatures by doc_id % nbuckets) and NEVER
    shuffled — probe tasks read only their own band partition,
    verify batches read only the sig partitions their candidates live
    in; the shard side moves as 20-byte band rows and the
    candidate-bounded pair table. Cross-verification uses the
    ESTIMATOR (the ledger stores 512-byte signatures, not text) while
    within-shard verification is exact — strictly more precise than
    the drop-on-collision practice the method is based on.
    ``ledger_dir`` must live on shared storage (the crawl spill /
    tile ledger contract)."""
    import os
    import uuid as _uuid

    import pandas as pd

    from risjbot_ray.pipelines.webtext import fixed_pool

    _ledger_meta(ledger_dir, nbuckets, num_perm, bands)
    band_root = os.path.join(ledger_dir, "band")
    sig_root = os.path.join(ledger_dir, "sig")
    band_snap = ray.put(_ledger_snapshot(band_root))
    sig_snap_d = _ledger_snapshot(sig_root)
    sig_snap = ray.put(sig_snap_d)
    rows_per_band = num_perm // bands
    run_tag = _uuid.uuid4().hex[:8]

    docs = ray.data.read_parquet(f"{shard_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    sigs = docs.map_batches(MinHasher, batch_format="pyarrow",
                            fn_constructor_kwargs={"num_perm": num_perm},
                            concurrency=fixed_pool()).materialize()
    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    exploded = _coalesce_for_exchange(sigs.map_batches(
        lambda b: _explode_bands_light(b, bands, rows_per_band),
        batch_format="pyarrow")).materialize()

    def add_hb(b: pa.Table) -> pa.Table:
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        return b.append_column(
            "hb", pa.array((bh % nbuckets).astype(np.int64), pa.int64()))

    # --- 1. CROSS: probe the band ledger, bucket-locally ---
    def probe(df: "pd.DataFrame") -> "pd.DataFrame":
        import pyarrow.parquet as pq
        hb = int(df["hb"].iloc[0])
        files = ray.get(band_snap).get(hb, [])
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64")})
        if not files:
            return empty
        led = pq.read_table(files).to_pandas()
        m = df.merge(led, on=["band", "band_hash"],
                     suffixes=("_new", "_prior"))
        if not len(m):
            return empty
        # deterministic per-bucket cap: smallest prior ids only
        m = (m.sort_values(["band", "band_hash", "doc_id_prior"])
             .groupby(["band", "band_hash", "doc_id_new"],
                      sort=False).head(_INCR_PRIOR_PER_BUCKET))
        out = m[["doc_id_prior", "doc_id_new"]].drop_duplicates()
        return out.rename(columns={"doc_id_prior": "a",
                                   "doc_id_new": "b"})

    cross = (exploded.map_batches(add_hb, batch_format="pyarrow")
             .groupby("hb").map_groups(probe, batch_format="pandas"))

    def cap_per_doc(df: "pd.DataFrame") -> "pd.DataFrame":
        # DISTINCT priors before the cap: the same (prior, new) pair
        # arrives once per hb bucket it collided in, and duplicate
        # rows must not consume cap slots (the reference caps over
        # the distinct prior set)
        return (df.drop_duplicates(["a", "b"]).sort_values("a")
                .head(_INCR_PRIOR_PER_DOC))

    # schema-stabilize before the join: pandas map_groups stages emit
    # schema-less EMPTY blocks that fail join field resolution
    # (_norm_pairs does not reorder — these pairs are ASYMMETRIC,
    # a = prior, b = new)
    capped = (cross.groupby("b").map_groups(
        cap_per_doc, batch_format="pandas")
        .map_batches(_norm_pairs, batch_format="pyarrow")
        .materialize())

    dropped_prior: dict[int, int] = {}
    n_capped = capped.count()
    if n_capped:
        # attach each pair's SHARD signature: broadcast-ids filter
        # pass when the pair set is small (the design case — cross
        # candidates are duplicate-bounded); past the cutoff, the
        # SAME plan runs per ~200k-pair chunk — the driver holds one
        # chunk's int64 ids at a time and each chunk's sig fetch is
        # plasma-bounded. Chunking re-reads the shard sigs once per
        # chunk (pairs/cutoff passes), the deliberate trade against a
        # hash join whose sparse partitions crash Arrow on empty
        # blocks (the _norm_pairs note) and whose driver-side
        # alternative would hold every pair's 512-B signature at once.
        pair_tbl = _collect_pairs(capped, n_capped)
        if pair_tbl is not None:
            chunks = [pair_tbl]
        else:
            chunks = []
            for t in ray.get(capped.to_arrow_refs()):
                if not isinstance(t, pa.Table):
                    import pandas as _pd
                    t = pa.Table.from_pandas(t, preserve_index=False)
                for s in range(0, t.num_rows, _BROADCAST_PAIRS_MAX):
                    c = t.slice(s, _BROADCAST_PAIRS_MAX)
                    if c.num_rows:
                        chunks.append(c.select(["a", "b"])
                                      .cast(_PAIR_SCHEMA))

        def attach(batch: pa.Table, *, _bref) -> pa.Table:
            bs = ray.get(_bref)
            return batch.append_column("sig", pa.array(
                [bs[int(x)] for x in
                 batch.column("b").to_pylist()], pa.binary()))

        j_parts = []
        for c in chunks:
            bneed = np.unique(c.column("b").to_numpy())
            bref = ray.put(_broadcast_fetch(sigs, "doc_id", bneed,
                                            "sig"))
            j_parts.append(ray.data.from_arrow(c).map_batches(
                attach, batch_format="pyarrow",
                fn_kwargs={"_bref": bref}))
        j = j_parts[0]
        for extra in j_parts[1:]:
            j = j.union(extra)

        def verify(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq
            if batch.num_rows == 0:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "est": pa.array([], pa.float64())})
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            sb = np.stack([np.frombuffer(s, dtype=np.uint64) for s in
                           batch.column("sig").to_pylist()])
            snap = ray.get(sig_snap)
            need_buckets = np.unique(a % nbuckets)
            files = [f for nb in need_buckets
                     for f in snap.get(int(nb), [])]
            if not files:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "est": pa.array([], pa.float64())})
            led = pq.read_table(files)
            lid = led.column("doc_id").to_numpy(zero_copy_only=False)
            o = np.argsort(lid, kind="stable")
            lid = lid[o]
            lsig = np.stack([np.frombuffer(s, dtype=np.uint64) for s in
                             led.column("sig").to_pylist()])[o]
            pos = np.searchsorted(lid, a)
            pos = np.minimum(pos, max(len(lid) - 1, 0))
            ok = lid[pos] == a
            if not bool(np.all(ok)):
                raise RuntimeError(
                    "minhash ledger inconsistency: band rows reference "
                    "doc_ids absent from the sig store — the ledger "
                    "was partially committed or is not on shared "
                    "storage visible to this worker")
            est = (lsig[pos] == sb).mean(axis=1)
            keep = est >= threshold
            return pa.table({"a": pa.array(a[keep], pa.int64()),
                             "b": pa.array(b[keep], pa.int64()),
                             "est": pa.array(est[keep], pa.float64())})

        hits = j.map_batches(verify, batch_format="pyarrow").take_all()
        for r in hits:
            prev = dropped_prior.get(int(r["b"]))
            if prev is None or int(r["a"]) < prev:
                dropped_prior[int(r["b"])] = int(r["a"])

    # --- 2. WITHIN: exact-verified clusters among survivors ---
    cands = minhash_candidate_pairs(shard_dir, num_perm, bands,
                                    threshold=min(0.5, threshold),
                                    sigs=sigs)
    verified = ngram_jaccard_pairs(shard_dir, threshold=threshold,
                                   candidates=cands)
    vdf = verified.to_pandas() if verified.num_rows else None
    shard_dup: dict[int, int] = {}
    if vdf is not None and len(vdf):
        surv = ~(vdf["a"].isin(dropped_prior)
                 | vdf["b"].isin(dropped_prior))
        edges = vdf[surv][["a", "b"]]
        if len(edges):
            labels = label_propagation_clusters(
                ray.data.from_arrow(pa.Table.from_pandas(
                    edges, preserve_index=False)))
            for t in ray.get(labels.to_arrow_refs()):
                for did, lab in zip(t.column(0).to_pylist(),
                                    t.column(1).to_pylist()):
                    if did != lab:
                        shard_dup[int(did)] = int(lab)

    all_ids = np.sort(np.concatenate(
        [t.column("doc_id").to_numpy(zero_copy_only=False)
         for t in ray.get(sigs.to_arrow_refs()) if t.num_rows]
    )) if sigs.count() else np.empty(0, np.int64)
    kept_mask = np.array([int(d) not in dropped_prior
                          and int(d) not in shard_dup
                          for d in all_ids], dtype=bool)
    reasons = np.where(
        [int(d) in dropped_prior for d in all_ids], "prior_dup",
        np.where([int(d) in shard_dup for d in all_ids],
                 "shard_dup", "kept"))
    result = pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "kept": pa.array(kept_mask, pa.bool_()),
        "reason": pa.array(reasons.tolist(), pa.string())})

    # --- 3. FOLD kept docs into the ledger (pending -> commit) ---
    kept_ref = ray.put(np.sort(all_ids[kept_mask]))
    pending: list[str] = []

    def write_band(df: "pd.DataFrame") -> "pd.DataFrame":
        import pyarrow.parquet as pq
        kept_arr = ray.get(kept_ref)
        sub = df[np.isin(df["doc_id"].to_numpy(), kept_arr)]
        hb = int(df["hb"].iloc[0])
        if len(sub):
            d = os.path.join(band_root, f"part={hb}")
            os.makedirs(d, exist_ok=True)
            p = os.path.join(d, f"delta-{run_tag}.pending")
            pq.write_table(pa.Table.from_pandas(
                sub[["band", "band_hash", "doc_id"]],
                preserve_index=False), p)
            return pd.DataFrame({"path": [p]})
        return pd.DataFrame({"path": pd.Series([], dtype="object")})

    def kept_with_sb(batch: pa.Table) -> pa.Table:
        kept_arr = ray.get(kept_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = np.isin(ids, kept_arr)
        sub = batch.filter(pa.array(m))
        sids = sub.column("doc_id").to_numpy(zero_copy_only=False)
        return sub.append_column(
            "sb", pa.array((sids % nbuckets).astype(np.int64),
                           pa.int64()))

    def write_sig_group(df: "pd.DataFrame") -> "pd.DataFrame":
        # ONE file per bucket per run (the write_band shape): a
        # per-(batch, bucket) layout wrote ~50k tiny deltas per
        # 100k-doc ingest, and its short uuid suffix made birthday
        # collisions — one batch silently overwriting another's
        # pending sig rows — EXPECTED at that file count
        import pyarrow.parquet as pq
        if not len(df):
            return pd.DataFrame({"path": pd.Series([], dtype="object")})
        sbk = int(df["sb"].iloc[0])
        d = os.path.join(sig_root, f"part={sbk}")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"delta-{run_tag}.pending")
        pq.write_table(pa.Table.from_pandas(
            df[["doc_id", "sig"]], preserve_index=False), p)
        return pd.DataFrame({"path": [p]})

    pend_band = (exploded.map_batches(add_hb, batch_format="pyarrow")
                 .groupby("hb").map_groups(write_band,
                                           batch_format="pandas")
                 .take_all())
    pend_sig = (sigs.map_batches(kept_with_sb, batch_format="pyarrow")
                .groupby("sb")
                .map_groups(write_sig_group, batch_format="pandas")
                .take_all())
    pending = [r["path"] for r in pend_band] + \
        [r["path"] for r in pend_sig]
    # commit: result is fully computed above, so renames are the last
    # effect; sig deltas commit BEFORE band deltas so a probe that
    # sees a band row always finds its signature (the verify task's
    # consistency check relies on this order). A retried write task
    # can report the same path twice — dedupe, and tolerate a pending
    # file that is already committed; a path that is NEITHER pending
    # NOR committed is real data loss and must raise
    for p in sorted(set(pending),
                    key=lambda x: 0 if "/sig/" in x else 1):
        dst = p[:-len(".pending")] + ".parquet"
        try:
            os.replace(p, dst)
        except FileNotFoundError:
            if not os.path.exists(dst):
                raise
    return result
