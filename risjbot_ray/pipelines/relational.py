"""Relational demonstrations of the engine's wide operators over the
TPC-H-ish tables: grouped aggregation with partial pre-aggregation,
broadcast hash join, grouped top-k, and event-time windowed aggregates.

These are the SQL-checkable operators (every one has an oracle_sql entry);
the crawl-specific operators are exercised by the hermetic fixtures
instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _null_key_split(b: pa.Table, col: str) -> pa.Table:
    """Make a nullable string groupby key safe for Ray Data's
    sort-based exchange (which raises "'<' not supported between
    'NoneType' and 'str'" on null partition boundaries): fill the key
    with '' and carry a ``<col>__nn`` null marker as a SECOND key, so
    a real empty string and SQL's NULL group stay distinct."""
    c = b.column(col)
    b = b.append_column(col + "__nn",
                        pc.cast(pc.is_null(c), pa.int8()))
    return b.set_column(b.column_names.index(col), col,
                        pc.fill_null(c, ""))


def _null_key_restore(b: pa.Table, col: str) -> pa.Table:
    """Inverse of _null_key_split after the aggregate: restore NULL
    where the marker says so and drop the marker column."""
    nn = b.column(col + "__nn")
    restored = pc.if_else(pc.equal(nn, 1),
                          pa.scalar(None, pa.string()),
                          b.column(col))
    return (b.set_column(b.column_names.index(col), col, restored)
            .drop_columns([col + "__nn"]))


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter -> computed columns -> grouped aggregate.

    disc_price sums in EXACT integer units (prices are exact cents and
    discounts exact percent, so extendedprice*(1-discount) is an exact
    multiple of 1e-4): float summation order varies with block splits
    and its ~1e-9 wobble can flip the 2dp rounding at a cent boundary
    between runs — int64 units make the result split-invariant. The
    final cent uses the same half-AWAY-from-zero rule as the SQL
    oracle, applied in integer arithmetic ((units+50)//100), because
    the corpus really does produce sums landing exactly on a half
    cent, where numpy's half-to-even and SQL ROUND disagree.
    Capacity: ~1e9 units/row -> safe to ~8e9 rows per group."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = pa.scalar(np.datetime64("1998-09-01", "us"))

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("l_shipdate"), cutoff))
        ext_c = np.round(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        disc_c = np.round(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        units = ext_c * (100 - disc_c)          # exact 1e-4 dollars
        return (b.append_column("disc_units",
                                pa.array(units, pa.int64()))
                .drop_columns(["l_shipdate", "l_extendedprice",
                               "l_discount"]))

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("disc_units", alias_name="sum_units"),
                      Count(alias_name="count_order")))

    def finish(b: pa.Table) -> pa.Table:
        units = b.column("sum_units").to_numpy(zero_copy_only=False)
        price = ((units + 50) // 100) / 100.0    # exact cents
        b = (b.append_column("sum_disc_price",
                             pa.array(price, pa.float64()))
             .drop_columns(["sum_units"]))
        # index resolved on the POST-drop table: resolving it pre-drop
        # happened to work only because sum_units sorted after sum_qty
        return b.set_column(b.column_names.index("sum_qty"), "sum_qty",
                            pc.round(b.column("sum_qty"), 2))

    return agg.map_batches(finish, batch_format="pyarrow")


#: customer rows at or under which the (customer x nation) side
#: broadcasts; ~100 B/row keeps the ray.put value ~O(200 MB). Past it
#: the partitioned hash-join plan runs unconditionally — the TPC-H
#: "fits at any sane scale" assumption no longer needs to hold.
_CUST_BCAST_MAX = 2_000_000


def top_customers_by_nation(sf_dir: str, k: int = 5,
                            bcast_max: int | None = None):
    """Join orders⋈customer⋈nation, partial per-batch pre-aggregation
    by customer, then grouped top-k per nation. The customer side is
    count-gated (parquet footer metadata — no read): at or under
    ``bcast_max`` it broadcasts once via ``ray.put`` (the TPC-H shape);
    past it the per-customer aggregate hash-joins the partitioned
    customer table instead, with only the 25-row nation map broadcast.
    Both plans emit identical rows."""
    import pyarrow.parquet as pq

    if bcast_max is None:
        bcast_max = _CUST_BCAST_MAX
    try:
        n_cust = pq.read_metadata(
            f"{sf_dir}/customer.parquet").num_rows
    except OSError:          # directory of parts
        import glob as _glob
        n_cust = sum(pq.read_metadata(p).num_rows for p in
                     _glob.glob(f"{sf_dir}/customer.parquet/*.parquet"))

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("o_custkey", sort=False)["o_totalprice"].agg(
            ["sum", "count"]).reset_index()
        return pa.Table.from_pandas(
            g.rename(columns={"sum": "total", "count": "n"}),
            preserve_index=False)

    partials = orders.map_batches(partial, batch_format="pyarrow")
    total = (partials.groupby("o_custkey")
             .aggregate(Sum("total", alias_name="total_spent"),
                        Sum("n", alias_name="n_orders")))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["total_spent", "o_custkey"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    if n_cust <= bcast_max:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_name",
                                      "c_nationkey"])
        cdf = cust.to_pandas().merge(
            nation.to_pandas(), left_on="c_nationkey",
            right_on="n_nationkey")
        # broadcast as ARROW: a pandas frame with object-dtype strings
        # re-unpickles in full on every task's ray.get; an Arrow table
        # reads zero-copy from plasma
        lookup_ref = ray.put(pa.Table.from_pandas(
            cdf[["c_custkey", "c_name", "n_name"]],
            preserve_index=False))

        def attach(b: pa.Table) -> pa.Table:
            """Broadcast-join the (customer, nation) lookup onto the
            per-customer aggregate — runs per batch in the tasks, so
            the aggregate never materializes on the driver."""
            lk = ray.get(lookup_ref)  # zero-copy arrow table
            j = b.join(lk, keys="o_custkey", right_keys="c_custkey",
                       join_type="inner")
            return j.set_column(j.column_names.index("total_spent"),
                                "total_spent",
                                pc.round(j.column("total_spent"), 2))

        joined = total.map_batches(attach, batch_format="pyarrow")
    else:
        # PARTITIONED plan: nation (25 rows, bounded by geography)
        # broadcasts onto the customer scan; the aggregate then
        # hash-joins customers — both big sides stay partitioned
        nref = ray.put(nation)
        cust_ds = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey"])

        def with_nation(b: pa.Table) -> pa.Table:
            j = b.join(ray.get(nref), keys="c_nationkey",
                       right_keys="n_nationkey", join_type="inner")
            return j.select(["c_custkey", "c_name", "n_name"])

        cn = cust_ds.map_batches(with_nation, batch_format="pyarrow")
        cpus = int(ray.cluster_resources().get("CPU", 8))
        nparts = max(2, min(32, cpus // 2))
        j2 = total.join(cn, join_type="inner", on=("o_custkey",),
                        right_on=("c_custkey",), num_partitions=nparts)

        def finish_round(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            return b.set_column(b.column_names.index("total_spent"),
                                "total_spent",
                                pc.round(b.column("total_spent"), 2))

        joined = j2.map_batches(finish_round, batch_format="pyarrow")

    # distributed grouped top-k: one small group per nation
    ranked = joined.groupby("n_name").map_groups(topk,
                                                 batch_format="pandas")
    out = ranked.to_pandas()  # k x #nations rows — tiny final result
    out = out.rename(columns={"o_custkey": "custkey",
                              "n_name": "nation_name"})
    out = out.sort_values(["nation_name", "total_spent", "custkey"],
                          ascending=[True, False, True], kind="mergesort")
    return pa.Table.from_pandas(
        out[["nation_name", "custkey", "c_name", "total_spent",
             "n_orders"]], preserve_index=False)


def events_hourly(sf_dir: str):
    """Tumbling event-time window: (hour, event_type) -> count, sum/min/max
    of value. Window assignment is a vectorized truncation inside
    map_batches; the groupby keys are (window start, type)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def window(b: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(b.column("ts"), unit="hour")
        b = b.append_column("hour", hours).drop_columns(["ts"])
        return _null_key_split(b, "event_type")

    agg = (ds.map_batches(window, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["hour", "event_type__nn", "event_type"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value"),
                      Min("value", alias_name="min_value"),
                      Max("value", alias_name="max_value")))

    def finish(b: pa.Table) -> pa.Table:
        b = _null_key_restore(b, "event_type")
        for c in ("sum_value", "min_value", "max_value"):
            b = b.set_column(b.column_names.index(c), c,
                             pc.round(b.column(c), 2))
        return b

    return agg.map_batches(finish, batch_format="pyarrow")


def purchase_attribution(sf_dir: str, nbuckets: int = 512):
    """Distributed AS-OF join (a custom operator Ray Data lacks): for
    every non-purchase event, attach the SAME user's most recent
    purchase event at-or-before its timestamp (ties on ts break toward
    the higher event_id). Classic marketing-attribution shape.

    Scale design: both sides are the same stream here, but the shape
    generalizes — hash-co-partition left and right on the join key
    (``user_id % nbuckets``), then each bucket group does ONE
    vectorized ``pandas.merge_asof`` over every user in the bucket
    (sorted-merge, no per-user Python calls). The only exchange is the
    one co-partitioning groupby; no global sort, no all-pairs
    inequality join. Events without a prior purchase drop (inner
    as-of)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])

    def add_ub(batch: pa.Table) -> pa.Table:
        ub = batch.column("user_id").to_numpy(
            zero_copy_only=False) % nbuckets
        return batch.append_column("ub", pa.array(ub, pa.int64()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # notna AND != : SQL's `event_type <> 'purchase'` is NULL for
        # NULL rows (dropped); pandas `None != 'purchase'` keeps them
        left = (df[df["event_type"].notna()
                   & (df["event_type"] != "purchase")]
                [["event_id", "ts", "user_id", "event_type", "value"]]
                .sort_values(["ts", "event_id"], kind="mergesort"))
        right = (df[df["event_type"] == "purchase"]
                 [["user_id", "ts", "event_id", "value"]]
                 .rename(columns={"ts": "purchase_ts",
                                  "event_id": "purchase_event_id",
                                  "value": "attributed_value"})
                 .sort_values(["purchase_ts", "purchase_event_id"],
                              kind="mergesort"))
        out = pd.merge_asof(left, right, left_on="ts",
                            right_on="purchase_ts", by="user_id",
                            direction="backward",
                            allow_exact_matches=True)
        out = out[out["purchase_event_id"].notna()].copy()
        out["purchase_event_id"] = out["purchase_event_id"].astype(
            "int64")
        return out

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    keyed = _coalesce_for_exchange(
        ds.map_batches(add_ub, batch_format="pyarrow"))
    return keyed.groupby("ub").map_groups(per_bucket,
                                          batch_format="pandas")


def events_window_counts(sf_dir: str, n_windows: int = 120,
                         every_hours: int = 6, length_hours: int = 9):
    """Distributed RANGE join: overlapping time windows (stride 6 h,
    length 9 h — every event falls in 1-2 windows) joined against the
    event stream on ``wstart <= ts < wend``, aggregated per window.

    Scale design: the window side is small and derived (one cheap
    ``min(ts)`` pass), so it BROADCASTS into the map tasks instead of
    shuffling the big side: each batch sorts its own timestamps once
    and answers every window with two ``searchsorted`` probes against
    a value prefix-sum — O(B log B + W log B) per batch. Only
    (window_id, n, sum) partials (<= W rows per block) reach the
    groupby; event rows never ride an exchange."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])
    t0 = np.datetime64(ds.min("ts"), "us")
    t0 = t0.astype("datetime64[h]").astype("datetime64[us]")
    hour = np.timedelta64(3600_000_000, "us")
    wstarts = t0 + np.arange(n_windows) * every_hours * hour
    wends = wstarts + length_hours * hour

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts, v = ts[order], v[order]
        cv = np.concatenate([[0.0], np.cumsum(v)])
        lo = np.searchsorted(ts, wstarts, side="left")
        hi = np.searchsorted(ts, wends, side="left")
        n = (hi - lo).astype(np.int64)
        nz = n > 0
        return pa.table({
            "window_id": pa.array(np.nonzero(nz)[0].astype(np.int64),
                                  pa.int64()),
            "n": pa.array(n[nz], pa.int64()),
            "sv": pa.array(cv[hi[nz]] - cv[lo[nz]], pa.float64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("window_id")
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("sv", alias_name="sum_value")))

    def finish(b: pa.Table) -> pa.Table:
        wid = b.column("window_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "window_id": b.column("window_id"),
            "wstart": pa.array(wstarts[wid], pa.timestamp("us")),
            "wend": pa.array(wends[wid], pa.timestamp("us")),
            "n_events": b.column("n_events"),
            "sum_value": pc.round(b.column("sum_value"), 2),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def user_distinct_by_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): distinct users per event type.
    Scale design: each batch pre-dedups its (event_type, user_id)
    pairs BEFORE the exchange, so the distinct-pair groupby moves at
    most one row per pair per block (not one per event); the second
    aggregation input is already one row per distinct pair."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])

    def pair_dedup(b: pa.Table) -> pa.Table:
        # arrow distinct (null event_type kept as its own key), then
        # the null-safe key split so BOTH downstream Ray groupbys sort
        # only non-null values
        g = b.group_by(["event_type", "user_id"]).aggregate([])
        return _null_key_split(g, "event_type")

    pairs = (ds.map_batches(pair_dedup, batch_format="pyarrow")
             .groupby(["event_type__nn", "event_type", "user_id"])
             .aggregate(Count(alias_name="_n")))

    def type_partial(b: pa.Table) -> pa.Table:
        g = (b.group_by(["event_type__nn", "event_type"])
             .aggregate([([], "count_all")]))
        return g.select(["event_type__nn", "event_type",
                         "count_all"]).rename_columns(
            ["event_type__nn", "event_type", "n"])

    agg = (pairs.map_batches(type_partial, batch_format="pyarrow")
           .groupby(["event_type__nn", "event_type"])
           .aggregate(Sum("n", alias_name="n_users")))
    return agg.map_batches(lambda b: _null_key_restore(b, "event_type"),
                           batch_format="pyarrow")


def rolling_user_value(sf_dir: str, window: int = 5,
                       nbuckets: int = 512):
    """Per-user rolling mean of ``value`` over the trailing ``window``
    events (ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW, ordered by
    ts then event_id). Scale design: co-partition by ``user_id %
    nbuckets`` (one exchange), then ONE vectorized pass per bucket —
    shifted-adds in oldest-first association (matching SQL frame
    order, so rounding is stable against the oracle), user boundaries
    handled by a position-in-user mask; no per-user Python calls."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])

    def add_ub(batch: pa.Table) -> pa.Table:
        ub = batch.column("user_id").to_numpy(
            zero_copy_only=False) % nbuckets
        return batch.append_column("ub", pa.array(ub, pa.int64()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        uid = df["user_id"].to_numpy()
        v = df["value"].to_numpy()
        newu = np.empty(n, dtype=bool)
        newu[0] = True
        newu[1:] = uid[1:] != uid[:-1]
        first = np.maximum.accumulate(
            np.where(newu, np.arange(n), 0))
        pos = np.arange(n) - first
        acc = np.zeros(n, dtype=np.float64)
        for k in range(window - 1, -1, -1):  # oldest lag first
            shifted = np.zeros(n, dtype=np.float64)
            if k:
                shifted[k:] = v[:n - k]
            else:
                shifted = v.astype(np.float64)
            valid = pos >= k
            acc[valid] = acc[valid] + shifted[valid]
        cnt = np.minimum(pos + 1, window)
        df["rolling_avg"] = np.round(acc / cnt, 4)
        return df[["event_id", "user_id", "ts", "value", "rolling_avg"]]

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    keyed = _coalesce_for_exchange(
        ds.map_batches(add_ub, batch_format="pyarrow"))
    return keyed.groupby("ub").map_groups(per_bucket,
                                          batch_format="pandas")


def lineitem_corr(sf_dir: str) -> pa.Table:
    """Grouped Pearson correlation of (l_quantity, l_extendedprice)
    per l_returnflag, from SUFFICIENT STATISTICS: each batch collapses
    to (flag, n, sx, sy, sxx, syy, sxy) partials in one vectorized
    pass, partials sum through a tiny groupby (one row per flag per
    block), and the driver finishes the algebra — the canonical way a
    correlation matrix is computed at 100 TB (no second pass, no
    centering shuffle)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        x = df["l_quantity"].to_numpy(dtype=np.float64)
        y = df["l_extendedprice"].to_numpy(dtype=np.float64)
        df = pd.DataFrame({"f": df["l_returnflag"], "n": 1.0,
                           "sx": x, "sy": y, "sxx": x * x,
                           "syy": y * y, "sxy": x * y})
        g = df.groupby("f", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("f")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy"),
                      Sum("sxy", alias_name="sxy")))
    df = agg.to_pandas()    # one row per returnflag
    n = df["n"]
    cov = df["sxy"] - df["sx"] * df["sy"] / n
    vx = df["sxx"] - df["sx"] ** 2 / n
    vy = df["syy"] - df["sy"] ** 2 / n
    out = pd.DataFrame({
        "l_returnflag": df["f"],
        "n": n.astype("int64"),
        "corr_qty_price": np.round(cov / np.sqrt(vx * vy), 5),
    }).sort_values("l_returnflag", kind="mergesort")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_anomaly(sf_dir: str, z_cut: float = 3.0):
    """Grouped z-score anomaly detection — the data-validation staple:
    per event type, mean/std of ``value`` from ONE sufficient-stats
    pass (the lineitem_corr pattern: (type, n, s, ss) partials, tiny
    groupby), then a stateless second pass flags rows with |z| >
    z_cut. The stats dict is O(#event_types) and broadcasts in the
    closure; no row ever shuffles. Returns (event_id, event_type,
    value, z) for the anomalous rows.

    Null semantics match the oracle: rows with NULL type or value
    contribute nothing to the stats and are never flagged (AVG /
    STDDEV_POP ignore nulls; JOIN USING never matches a NULL key).
    Numerics: the single-pass E[x^2]-E[x]^2 variance assumes values
    and spread within float64 headroom (|v| and sd within ~1e7 of
    each other), the standard telemetry envelope — like every float
    oracle here, a row sitting EXACTLY on |z| == z_cut is a
    measure-zero tie for continuous data."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type",
                                        "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().dropna(subset=["event_type", "value"])
        v = df["value"].to_numpy(dtype=np.float64)
        g = (pd.DataFrame({"t": df["event_type"], "n": 1.0,
                           "s": v, "ss": v * v})
             .groupby("t", sort=False, as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("t")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("s", alias_name="s"),
                      Sum("ss", alias_name="ss"))).to_pandas()
    m = agg["s"] / agg["n"]
    sd = np.sqrt(np.maximum(agg["ss"] / agg["n"] - m * m, 0.0))
    means = dict(zip(agg["t"], m))
    sds = dict(zip(agg["t"], sd))

    def flag(b: pa.Table) -> pa.Table:
        types = pd.Series(b.column("event_type").to_pylist(),
                          dtype=object)
        v = b.column("value").to_numpy(zero_copy_only=False)
        mm = types.map(means).to_numpy(dtype=np.float64)  # NaN if
        ss = types.map(sds).to_numpy(dtype=np.float64)    # unknown/null
        ok = np.isfinite(v) & np.isfinite(mm) & (ss > 0)
        z = np.where(ok, (v - mm) / np.where(ok, ss, 1.0), 0.0)
        keep = ok & (np.abs(z) > z_cut)
        return pa.table({
            "event_id": pa.array(np.asarray(
                b.column("event_id").to_numpy(
                    zero_copy_only=False))[keep], pa.int64()),
            "event_type": pa.array(
                np.asarray(types, dtype=object)[keep], pa.string()),
            "value": pa.array(v[keep], pa.float64()),
            "z": pa.array(np.round(z[keep], 5), pa.float64())})

    return ds.map_batches(flag, batch_format="pyarrow")


def table_profile(sf_dir: str, table: str = "events") -> pa.Table:
    """Data-profiling operator: one row per column with row count,
    null count, and min/max (numeric and timestamp columns; timestamps
    report epoch microseconds so the output schema is uniform, string
    columns report NULL bounds). The staple first pass over an unknown
    100-TB table: each batch collapses to O(#columns) partial rows,
    partials tree-combine on the driver — no shuffle, no row ever
    leaves its block."""
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")

    def partial(b: pa.Table) -> pa.Table:
        names, nrows, nnull, mins, maxs = [], [], [], [], []
        for name in b.column_names:
            col = b.column(name)
            names.append(name)
            nrows.append(len(col))
            nnull.append(col.null_count)
            typ = col.type
            if pa.types.is_timestamp(typ):
                col = col.cast(pa.int64())
                typ = pa.int64()
            if (pa.types.is_integer(typ) or pa.types.is_floating(typ)) \
                    and len(col) > col.null_count:
                mm = pc.min_max(col)
                mins.append(float(mm["min"].as_py()))
                maxs.append(float(mm["max"].as_py()))
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table({
            "column_name": pa.array(names, pa.string()),
            "n_rows": pa.array(nrows, pa.int64()),
            "n_null": pa.array(nnull, pa.int64()),
            "min_val": pa.array(mins, pa.float64()),
            "max_val": pa.array(maxs, pa.float64())})

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    df = pa.concat_tables(parts).to_pandas()
    g = df.groupby("column_name", sort=True)
    out = pd.DataFrame({
        "n_rows": g["n_rows"].sum(),
        "n_null": g["n_null"].sum(),
        "min_val": g["min_val"].min(),
        "max_val": g["max_val"].max(),
    }).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def sessionize_events(sf_dir: str, gap_minutes: int = 30,
                      nbuckets: int = 1024):
    """Session windows per user: sort within user, split on ts gaps >
    ``gap_minutes``. The exchange groups on a coarse ``user_id %
    nbuckets`` key (all of a user's events share a bucket) and each
    per-bucket call sessionizes EVERY user in the bucket with one
    vectorized sort + gap/boundary scan — never one Python call per
    user (billions of users at design scale). Returns per-session
    (user_id, session_start, n_events, total_value)."""
    import pyarrow as pa

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_ub(batch: "pa.Table") -> "pa.Table":
        ub = batch.column("user_id").to_numpy(
            zero_copy_only=False) % nbuckets
        return batch.append_column("ub", pa.array(ub, pa.int64()))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        user_break = df["user_id"].ne(df["user_id"].shift())
        new_sess = user_break | df["ts"].diff().gt(gap)
        g = df.groupby(new_sess.cumsum())
        out = pd.DataFrame({
            "user_id": g["user_id"].first(),
            "session_start": g["ts"].min(),
            "n_events": g["ts"].size(),
            "total_value": g["value"].sum().round(2),
        })
        return out.reset_index(drop=True)

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange
    keyed = _coalesce_for_exchange(
        ds.map_batches(add_ub, batch_format="pyarrow"))
    return keyed.groupby("ub").map_groups(per_bucket,
                                          batch_format="pandas")
