"""Mergeable-summary operators: bounded-memory corpus statistics that
tree-combine instead of shuffling.

At 100 TB the interesting aggregations are the ones whose STATE stays
small no matter how big the input gets. Two families here:

* ``wordcount_quantiles`` — exact distributed quantiles of per-doc
  word counts. Word counts live in a small DISCRETE domain (distinct
  lengths << corpus rows), so an exact mergeable summary exists: each
  batch collapses to (value, n_docs) value-counts, partials
  tree-combine (the same no-shuffle path the LM trainers use), and the
  driver walks the cumulative distribution. Semantics match DuckDB's
  ``quantile_disc`` with DECIMAL-literal q EXACTLY — 0-based rank
  ``max(1, n - floor(n * (1 - q))) - 1`` in rational arithmetic (see
  ``quantiles_from_value_counts``; the float convention
  ``floor((n-1) * q)`` drifts off-by-one at integer boundaries) —
  which makes the operator exactly SQL-checkable.

* ``heavy_hitters`` — Misra-Gries frequent-tokens sketch, the
  bounded-memory companion to webtext.top_ngrams (which is exact but
  needs the full vocabulary to survive the exchange). An MG summary
  with m counters guarantees, after any sequence of MERGES (Agarwal et
  al., "Mergeable Summaries", PODS 2012 — public result):

      0 <= true_count(x) - est(x) <= N / (m + 1)   for every token x
      (absent tokens have est = 0)

  so every token with true frequency > N/(m+1) is RETAINED. Each batch
  counts exactly then compresses to m counters; partials tree-combine
  (sum counters, subtract the (m+1)-th largest, drop <= 0); the driver
  holds only m counters + the exact total N. The guarantee is
  driver-checkable against exact counts at small scale — the
  ``heavy_hitters_check`` query does exactly that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .lm import _agg_count_partials, _merge_counts

_QS_DEFAULT = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


# --------------------------------------------------------------------------
# exact discrete quantiles
# --------------------------------------------------------------------------

def _wc_value_counts(batch: pa.Table) -> pa.Table:
    """Per-batch (wordcount value, n_docs) — len(text.split()), the
    tokenization doc_wordcount's oracle pins."""
    wc = np.array([len(t.split()) if t else 0
                   for t in batch.column("text").to_pylist()],
                  dtype=np.int64)
    vals, n = np.unique(wc, return_counts=True)
    return pa.table({"val": pa.array(vals, pa.int64()),
                     "n": pa.array(n.astype(np.int64), pa.int64())})


def quantiles_from_value_counts(vals: np.ndarray, counts: np.ndarray,
                                qs) -> np.ndarray:
    """quantile_disc over a (sorted value, count) summary, matching
    DuckDB's DECIMAL-literal semantics EXACTLY: the 0-based rank is
    ``max(1, n - floor(n * (1 - q))) - 1`` evaluated in exact rational
    arithmetic (DuckDB parses 0.25-style literals as DECIMAL and
    computes the index with integer math, so float ``floor((n-1)*q)``
    conventions drift off-by-one whenever q*n lands on an integer the
    double grid misses). Never expands the stream."""
    from fractions import Fraction
    import math
    order = np.argsort(vals, kind="stable")
    vals, counts = vals[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1])
    ranks = np.array(
        [max(1, n - math.floor(n * (1 - Fraction(str(q))))) - 1
         for q in qs], dtype=np.int64)
    idx = np.searchsorted(cum, ranks, side="right")
    return vals[idx]


def wordcount_quantiles(sf_dir: str, qs=_QS_DEFAULT) -> pa.Table:
    """Exact corpus-wide word-count quantiles. Shuffle-free: value
    counts tree-combine; the driver sees one row per distinct length."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    partial = docs.map_batches(_wc_value_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
    t = _agg_count_partials(
        partial, lambda b: _merge_counts(b, "val", ("n",)))
    if t is None:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    v = quantiles_from_value_counts(
        t.column("val").to_numpy(zero_copy_only=False),
        t.column("n").to_numpy(zero_copy_only=False), qs)
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(v, pa.int64())})


def _wc_lang_value_counts(batch: pa.Table) -> pa.Table:
    """Per-batch (lang, wordcount value, n_docs) counts. Arrow
    group_by (not pandas): a zero-row batch keeps the typed schema
    (pandas infers a null-typed key column that breaks concat during
    coalesce), and a NULL lang forms its own group, matching SQL."""
    wc = np.array([len(t.split()) if t else 0
                   for t in batch.column("text").to_pylist()],
                  dtype=np.int64)
    t = pa.table({"lang": batch.column("lang"),
                  "val": pa.array(wc, pa.int64())})
    g = t.group_by(["lang", "val"]).aggregate([([], "count_all")])
    return g.select(["lang", "val", "count_all"]).rename_columns(
        ["lang", "val", "n"])


def _merge_lang_counts(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["lang", "val"]).aggregate([("n", "sum")])
    return g.select(["lang", "val", "n_sum"]).rename_columns(
        ["lang", "val", "n"])


def wordcount_quantiles_by_lang(sf_dir: str, qs=_QS_DEFAULT) -> pa.Table:
    """GROUPED exact discrete quantiles: per-language word-count
    quantiles over the corpus. Same mergeable value-counts summary as
    the global operator, keyed by (lang, value) — the combine state is
    bounded by #langs x #distinct lengths, independent of corpus rows,
    so partials tree-combine with no row shuffle and the driver walks
    one small cumulative distribution per language."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["lang", "text"])
    partial = docs.map_batches(_wc_lang_value_counts,
                               batch_format="pyarrow",
                               zero_copy_batch=True)
    t = _agg_count_partials(partial, _merge_lang_counts)
    if t is None:
        return pa.table({"lang": pa.array([], pa.string()),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    import pandas as pd
    df = t.to_pandas()
    langs, out_q, out_v = [], [], []
    # dropna=False: a NULL lang is a group of its own (SQL GROUP BY);
    # pandas labels it NaN — normalize back to None for the Arrow column
    for lang, sub in df.groupby("lang", sort=True, dropna=False):
        v = quantiles_from_value_counts(
            sub["val"].to_numpy(), sub["n"].to_numpy(), qs)
        langs.extend([None if pd.isna(lang) else lang] * len(qs))
        out_q.extend(qs)
        out_v.extend(v.tolist())
    return pa.table({"lang": pa.array(langs, pa.string()),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


# --------------------------------------------------------------------------
# DDSketch: relative-error quantiles for CONTINUOUS values
# --------------------------------------------------------------------------
#
# The discrete-quantile summary above is exact because word counts
# live in a small integer domain. Continuous doubles (event values,
# latencies, prices) have no such domain — the mergeable sketch for
# them is DDSketch (Masson, Rim & Lee, "DDSketch: a fast and
# fully-mergeable quantile sketch with relative-error guarantees",
# VLDB 2019 — public algorithm): bucket i = ceil(log_gamma(v)) with
# gamma = (1+alpha)/(1-alpha), so every value in bucket i is within
# relative error alpha of the bucket's midpoint estimate
# 2*gamma^i/(gamma+1). Bucket counts are plain (int key -> int64
# count) rows: merging two sketches is adding counts, so partials
# tree-combine through the same no-shuffle path as the value-counts
# summary, and the state is O(log(max/min)/alpha) buckets regardless
# of row count.

_DD_QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def dd_bucket_ids(v: np.ndarray, alpha: float) -> np.ndarray:
    """THE bucket-assignment convention, shared by the global and
    grouped sketches (any drift would make their merged results
    disagree): bucket i = ceil(log_gamma(v)) for finite v > 0, with
    non-positive values (incl. -inf) pinned to a reserved underflow
    bucket (int64 min + 1) and +inf / NaN pinned to a reserved
    OVERFLOW bucket (int64 max - 1) so nothing is silently dropped and
    nothing lands in an arbitrary rank position (the naive int64 cast
    of ceil(log(inf)) wraps to int64 MIN, which would sort the largest
    value BELOW every real bucket; NaN sorts last, matching DuckDB
    ORDER BY). Only the COUNTS of the reserved buckets are exact —
    dd_quantiles_from_buckets estimates a quantile landing in them as
    0.0 / +inf respectively (the alpha guarantee is
    finite-positive-values-only)."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    under = np.iinfo(np.int64).min + 1
    over = np.iinfo(np.int64).max - 1
    pos = v > 0.0  # False for NaN and non-positives
    b = np.full(len(v), under, dtype=np.int64)
    if pos.any():
        raw = np.ceil(np.log(v[pos]) / np.log(gamma))
        fin = np.isfinite(raw)
        ids = np.full(raw.shape, over, dtype=np.int64)
        ids[fin] = raw[fin].astype(np.int64)
        b[pos] = ids
    b[np.isnan(v)] = over
    return b


def dd_bucket_counts(v: np.ndarray, alpha: float) -> "pa.Table":
    """Deterministic DDSketch bucket counts for one value array (see
    dd_bucket_ids for the assignment convention)."""
    vals, n = np.unique(dd_bucket_ids(v, alpha), return_counts=True)
    return pa.table({"bucket": pa.array(vals, pa.int64()),
                     "n": pa.array(n.astype(np.int64), pa.int64())})


def dd_quantiles_from_buckets(buckets: np.ndarray, counts: np.ndarray,
                              alpha: float, qs) -> np.ndarray:
    """Quantile estimates from a merged DDSketch: walk the cumulative
    counts to the ceil(q*n)-th order statistic's bucket and return the
    bucket midpoint 2*gamma^i/(gamma+1) — within relative error alpha
    of the true order statistic FOR POSITIVE VALUES ONLY. A quantile
    that lands in the reserved underflow bucket (the sketch keeps
    non-positives' COUNTS exact but not their values) is explicitly
    estimated 0.0 — rel_err is 0 for true zeros and 1 for negatives,
    which the callers' within_alpha self-check surfaces. (Without the
    special case the midpoint formula happens to underflow gamma^i to
    0.0 for the sentinel bucket id — same answer, but by accident and
    under a float-underflow warning.)"""
    import math
    gamma = (1.0 + alpha) / (1.0 - alpha)
    under = np.iinfo(np.int64).min + 1
    over = np.iinfo(np.int64).max - 1
    order = np.argsort(buckets, kind="stable")
    buckets, counts = buckets[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1])
    ranks = np.array([max(1, math.ceil(q * n)) - 1 for q in qs],
                     dtype=np.int64)
    idx = np.searchsorted(cum, ranks, side="right")
    picked = buckets[idx]
    with np.errstate(over="ignore"):  # huge real buckets -> inf is fine
        est = (2.0 * np.power(gamma, picked.astype(np.float64))
               / (gamma + 1.0))
    est[picked == under] = 0.0
    est[picked == over] = np.inf
    return est


def value_quantile_sketch(sf_dir: str, alpha: float = 0.01,
                          qs=_DD_QS, column: str = "value",
                          table: str = "events") -> pa.Table:
    """DDSketch quantiles of ``events.value`` with a driver-visible
    self-check: alongside each estimate the query computes the TRUE
    order statistic at the same rank and asserts the DDSketch
    guarantee |est - exact| <= alpha * exact. The sketch path (bucket
    partials tree-combined, O(buckets) state) is the 100-TB path; the
    exact column is check-scale ground truth only (it selects the
    k-th order statistic via a second pass, same pattern as the other
    *_check queries)."""
    import math
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                               columns=[column])

    def partial(b: pa.Table) -> pa.Table:
        return dd_bucket_counts(
            b.column(column).to_numpy(zero_copy_only=False), alpha)

    t = _agg_count_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        lambda b: _merge_counts(b, "bucket", ("n",)))
    if t is None:
        return pa.table({"q": pa.array([], pa.float64()),
                         "est": pa.array([], pa.float64()),
                         "exact": pa.array([], pa.float64()),
                         "rel_err": pa.array([], pa.float64()),
                         "within_alpha": pa.array([], pa.int8())})
    buckets = t.column("bucket").to_numpy(zero_copy_only=False)
    counts = t.column("n").to_numpy(zero_copy_only=False)
    est = dd_quantiles_from_buckets(buckets, counts, alpha, qs)

    # ground truth at check scale: the true order statistics at the
    # SAME ranks (per-batch partial top-(rank+1) would be the
    # distributed selection; a plain sort is fine for the check row)
    vals = np.sort(np.concatenate(
        [b.column(column).to_numpy(zero_copy_only=False)
         for b in ds.iter_batches(batch_format="pyarrow",
                                  batch_size=65536)]))
    n = len(vals)
    ranks = np.array([max(1, math.ceil(q * n)) - 1 for q in qs],
                     dtype=np.int64)
    exact = vals[ranks]
    rel = np.abs(est - exact) / np.where(exact != 0, np.abs(exact), 1.0)
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "est": pa.array(np.round(est, 6), pa.float64()),
        "exact": pa.array(np.round(exact, 6), pa.float64()),
        "rel_err": pa.array(np.round(rel, 8), pa.float64()),
        "within_alpha": pa.array(
            (rel <= alpha + 1e-12).astype(np.int8), pa.int8()),
    })


def value_quantile_sketch_by_group(sf_dir: str, alpha: float = 0.01,
                                   qs=_DD_QS, column: str = "value",
                                   group_col: str = "event_type",
                                   table: str = "events") -> pa.Table:
    """GROUPED DDSketch: one relative-error quantile sketch per group
    (per event type), with the same within-alpha self-check per group.
    The combine state is #groups x O(buckets) rows — group cardinality
    bounds the summary, not row count — and partials tree-combine with
    no row shuffle, exactly like the global sketch. As there, the
    sketch path is the 100-TB path and the exact column is check-scale
    ground truth only (second pass over the column)."""
    import math

    import pandas as pd
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                               columns=[group_col, column])

    def partial(b: pa.Table) -> pa.Table:
        # Arrow group_by (not pandas): zero-row batches keep the typed
        # schema and NULL group keys form their own group (SQL GROUP BY)
        v = b.column(column).to_numpy(zero_copy_only=False)
        t = pa.table({"g": b.column(group_col),
                      "bucket": pa.array(dd_bucket_ids(v, alpha),
                                         pa.int64())})
        out = t.group_by(["g", "bucket"]).aggregate([([], "count_all")])
        return out.select(["g", "bucket", "count_all"]).rename_columns(
            ["g", "bucket", "n"])

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["g", "bucket"]).aggregate([("n", "sum")])
        return g.select(["g", "bucket", "n_sum"]).rename_columns(
            ["g", "bucket", "n"])

    t = _agg_count_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), merge)
    empty = pa.table({group_col: pa.array([], pa.string()),
                      "q": pa.array([], pa.float64()),
                      "est": pa.array([], pa.float64()),
                      "exact": pa.array([], pa.float64()),
                      "rel_err": pa.array([], pa.float64()),
                      "within_alpha": pa.array([], pa.int8())})
    if t is None:
        return empty

    # check-scale ground truth per group (same pattern as the global
    # sketch: the exact column exists to make the row self-checking)
    gt = pd.concat(
        [pd.DataFrame({"g": b.column(group_col).to_pandas(),
                       "v": b.column(column).to_numpy(
                           zero_copy_only=False)})
         for b in ds.iter_batches(batch_format="pyarrow",
                                  batch_size=65536)],
        ignore_index=True)
    # dropna=False + None-normalized keys: a NULL group key is a group
    # of its own (SQL GROUP BY), and NaN labels are unusable dict keys
    vals = {None if pd.isna(g) else g: sub["v"].to_numpy()
            for g, sub in gt.groupby("g", dropna=False)}

    df = t.to_pandas()
    rows = {group_col: [], "q": [], "est": [], "exact": [],
            "rel_err": [], "within_alpha": []}
    for gname, sub in df.groupby("g", sort=True, dropna=False):
        gname = None if pd.isna(gname) else gname
        est = dd_quantiles_from_buckets(
            sub["bucket"].to_numpy(), sub["n"].to_numpy(), alpha, qs)
        s = np.sort(np.asarray(vals[gname]))
        n = len(s)
        ranks = [max(1, math.ceil(q * n)) - 1 for q in qs]
        exact = s[ranks]
        rel = np.abs(est - exact) / np.where(exact != 0,
                                             np.abs(exact), 1.0)
        rows[group_col].extend([gname] * len(qs))
        rows["q"].extend(qs)
        rows["est"].extend(np.round(est, 6).tolist())
        rows["exact"].extend(np.round(exact, 6).tolist())
        rows["rel_err"].extend(np.round(rel, 8).tolist())
        rows["within_alpha"].extend(
            (rel <= alpha + 1e-12).astype(np.int8).tolist())
    return pa.table({
        group_col: pa.array(rows[group_col], pa.string()),
        "q": pa.array(rows["q"], pa.float64()),
        "est": pa.array(rows["est"], pa.float64()),
        "exact": pa.array(rows["exact"], pa.float64()),
        "rel_err": pa.array(rows["rel_err"], pa.float64()),
        "within_alpha": pa.array(rows["within_alpha"], pa.int8())})


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters
# --------------------------------------------------------------------------

_MG_TOTAL_KEY = ""   # tokens are whitespace-split, so "" never collides


def mg_compress(grams: list[str], counts: np.ndarray, m: int
                ) -> tuple[list[str], np.ndarray]:
    """Keep the top ``m`` counters, subtracting the (m+1)-th largest
    count from each survivor (the MG merge step); exact if there are
    <= m counters."""
    if len(grams) <= m:
        return grams, counts
    order = np.argsort(-counts, kind="stable")
    cut = counts[order[m]]
    keep = order[:m]
    kept = counts[keep] - cut
    nz = kept > 0
    return [grams[i] for i in keep[nz]], kept[nz]


def _mg_partial(batch: pa.Table, m: int) -> pa.Table:
    """Exact per-batch token counts compressed to an m-counter MG
    summary, plus one total row (gram='') carrying the batch's exact
    token count N."""
    from collections import Counter
    c: Counter = Counter()
    total = 0
    for t in batch.column("text").to_pylist():
        toks = (t or "").split()
        total += len(toks)
        c.update(toks)
    grams = list(c.keys())
    counts = np.fromiter(c.values(), np.int64, len(grams))
    grams, counts = mg_compress(grams, counts, m)
    return pa.table({
        "gram": pa.array(grams + [_MG_TOTAL_KEY], pa.string()),
        "est": pa.array(np.append(counts, total), pa.int64()),
        "is_total": pa.array([0] * len(grams) + [1], pa.int8()),
    })


def _mg_merge(batch: pa.Table, m: int) -> pa.Table:
    """Merge MG partials: sum counters per gram (vectorized via
    dictionary-encode + bincount), then compress back to m; totals sum
    exactly."""
    is_total = batch.column("is_total").to_numpy(zero_copy_only=False)
    est = batch.column("est").to_numpy(zero_copy_only=False)
    total = int(est[is_total == 1].sum())
    gcol = batch.column("gram")
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    sub = gcol.filter(pa.array(is_total == 0)).dictionary_encode()
    idx = sub.indices.to_numpy(zero_copy_only=False)
    summed = np.bincount(idx, weights=est[is_total == 0],
                         minlength=len(sub.dictionary)).astype(np.int64)
    grams, counts = mg_compress(sub.dictionary.to_pylist(), summed, m)
    return pa.table({
        "gram": pa.array(grams + [_MG_TOTAL_KEY], pa.string()),
        "est": pa.array(np.append(counts, total), pa.int64()),
        "is_total": pa.array([0] * len(grams) + [1], pa.int8()),
    })


def heavy_hitters(sf_dir: str, m: int = 64) -> pa.Table:
    """Misra-Gries frequent tokens over the corpus: returns
    (gram, est, n_total, bound) sorted by est desc / gram asc, where
    every token with true count > bound = N/(m+1) is guaranteed
    present and est undercounts by at most bound. State is m counters
    at every level — batch, combine, driver — regardless of corpus or
    vocabulary size (top_ngrams is the exact-count alternative when
    the vocabulary fits the exchange)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    partial = docs.map_batches(_mg_partial, batch_format="pyarrow",
                               zero_copy_batch=True, fn_kwargs={"m": m})
    t = _agg_count_partials(partial, lambda b: _mg_merge(b, m))
    if t is None:
        return pa.table({"gram": pa.array([], pa.string()),
                         "est": pa.array([], pa.int64()),
                         "n_total": pa.array([], pa.int64()),
                         "bound": pa.array([], pa.int64())})
    is_total = t.column("is_total").to_numpy(zero_copy_only=False)
    est = t.column("est").to_numpy(zero_copy_only=False)
    total = int(est[is_total == 1].sum())
    grams = t.filter(pa.array(is_total == 0)).column("gram").to_pylist()
    counts = est[is_total == 0]
    order = sorted(range(len(grams)),
                   key=lambda i: (-int(counts[i]), grams[i]))
    bound = total // (m + 1)
    return pa.table({
        "gram": pa.array([grams[i] for i in order], pa.string()),
        "est": pa.array(counts[order], pa.int64()),
        "n_total": pa.array([total] * len(order), pa.int64()),
        "bound": pa.array([bound] * len(order), pa.int64()),
    })


# --------------------------------------------------------------------------
# grouped HyperLogLog: approximate COUNT(DISTINCT user) per event type
# — the mergeable-sketch companion to relational.user_distinct_by_type.
# The exact operator's exchange is one row per DISTINCT (type, user)
# pair; when per-group cardinalities explode (10^9 users per type at
# 100 TB) even that pre-deduped pair exchange is the cost, while one
# HLL per group is (#groups x 2^p bytes) of mergeable state — each
# batch folds to at most #types-in-batch register rows, the driver
# max-merges per type and never sees a user id.
# --------------------------------------------------------------------------

def user_distinct_hll_by_type(sf_dir: str, p: int | None = None):
    """One self-checking row per event type: (event_type, n_exact,
    n_hll, rel_err, within_bound) with within_bound = |err| <= 3
    sigma, sigma = 1.04/sqrt(2^p) — the ``corpus_hll_distinct``
    convention, grouped. Null event types count under ''."""
    import hashlib
    import math

    from risjbot_ray.pipelines.relational import user_distinct_by_type
    from risjbot_ray.pipelines.webtext import (_HLL_P, _hll_estimate,
                                               _hll_registers)
    if p is None:
        p = _HLL_P

    def fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        et = pc.fill_null(batch.column("event_type").combine_chunks(),
                          "")
        de = et.dictionary_encode()
        idx = de.indices.to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        types, regs = [], []
        for ti, tname in enumerate(de.dictionary.to_pylist()):
            us = np.unique(uid[idx == ti])
            hs = b"".join(
                hashlib.md5(int(u).to_bytes(8, "big", signed=True)
                            ).digest()[:8] for u in us)
            types.append(tname)
            regs.append(_hll_registers(hs, p).tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "regs": pa.array(regs, pa.binary())})

    rows = (ray.data.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_type", "user_id"])
            .map_batches(fold, batch_format="pyarrow",
                         zero_copy_batch=True)
            .take_all())                 # #blocks x #types rows
    merged: dict[str, np.ndarray] = {}
    for r in rows:
        cur = merged.setdefault(r["event_type"],
                                np.zeros(1 << p, dtype=np.uint8))
        np.maximum(cur, np.frombuffer(r["regs"], dtype=np.uint8),
                   out=cur)

    exact = {(r["event_type"] if r["event_type"] is not None else ""):
             int(r["n_users"])
             for r in user_distinct_by_type(sf_dir).take_all()}
    sigma = 1.04 / math.sqrt(1 << p)
    out = {"event_type": [], "n_exact": [], "n_hll": [],
           "rel_err": [], "within_bound": []}
    for t in sorted(set(exact) | set(merged)):
        est = _hll_estimate(merged.get(
            t, np.zeros(1 << p, dtype=np.uint8)))
        ex = exact.get(t, 0)
        rel = abs(est - ex) / ex if ex else 0.0
        out["event_type"].append(t)
        out["n_exact"].append(ex)
        out["n_hll"].append(round(est, 2))
        out["rel_err"].append(round(rel, 5))
        out["within_bound"].append(rel <= 3 * sigma)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_exact": pa.array(out["n_exact"], pa.int64()),
        "n_hll": pa.array(out["n_hll"], pa.float64()),
        "rel_err": pa.array(out["rel_err"], pa.float64()),
        "within_bound": pa.array(out["within_bound"], pa.bool_())})
