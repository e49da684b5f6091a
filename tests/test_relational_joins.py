"""Reference-parity gates for the non-equi join operators: the AS-OF
join (purchase attribution), the overlapping-window RANGE join, exact
grouped count-distinct, and the trailing-window rolling mean. Each is
checked row-for-row against an independent brute-force pandas/numpy
reference over the sf0.001 events table (the DuckDB oracles are gated
separately in test_oracle_parity.py)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from risjbot_ray.pipelines.relational import (events_window_counts,
                                              purchase_attribution,
                                              rolling_user_value,
                                              user_distinct_by_type)

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_purchase_attribution_vs_bruteforce(ray_session):
    ev = _events()
    got = (purchase_attribution(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    purch = ev[ev["event_type"] == "purchase"]
    rows = []
    for e in ev[ev["event_type"] != "purchase"].itertuples():
        cand = purch[(purch["user_id"] == e.user_id)
                     & (purch["ts"] <= e.ts)]
        if len(cand) == 0:
            continue
        best = cand.sort_values(["ts", "event_id"]).iloc[-1]
        rows.append((e.event_id, best["event_id"], best["ts"],
                     best["value"]))
    exp = (pd.DataFrame(rows, columns=["event_id", "purchase_event_id",
                                       "purchase_ts",
                                       "attributed_value"])
           .sort_values("event_id").reset_index(drop=True))
    assert len(got) == len(exp)
    assert got["event_id"].to_list() == exp["event_id"].to_list()
    assert (got["purchase_event_id"].to_list()
            == exp["purchase_event_id"].to_list())
    assert got["purchase_ts"].to_list() == exp["purchase_ts"].to_list()
    assert np.allclose(got["attributed_value"],
                       exp["attributed_value"])


def test_events_window_counts_vs_bruteforce(ray_session):
    ev = _events()
    got = (events_window_counts(SF).to_pandas()
           .sort_values("window_id").reset_index(drop=True))
    t0 = ev["ts"].min().floor("h")
    seen = 0
    for k in range(120):
        ws = t0 + pd.Timedelta(hours=6 * k)
        we = ws + pd.Timedelta(hours=9)
        sub = ev[(ev["ts"] >= ws) & (ev["ts"] < we)]
        if len(sub) == 0:
            assert k not in got["window_id"].to_numpy()
            continue
        row = got[got["window_id"] == k]
        assert len(row) == 1
        assert row["n_events"].iloc[0] == len(sub)
        assert row["wstart"].iloc[0] == ws
        assert row["wend"].iloc[0] == we
        assert abs(row["sum_value"].iloc[0]
                   - round(sub["value"].sum(), 2)) < 1e-6
        seen += 1
    assert seen == len(got)
    # windows genuinely overlap: total window-event memberships exceed
    # the event count (each event falls in 1-2 windows)
    assert got["n_events"].sum() > len(ev)


def test_user_distinct_by_type_vs_bruteforce(ray_session):
    ev = _events()
    got = user_distinct_by_type(SF).to_pandas()
    exp = (ev.groupby("event_type")["user_id"].nunique()
           .rename("n_users").reset_index())
    merged = got.merge(exp, on="event_type", suffixes=("", "_exp"))
    assert len(merged) == len(exp) == len(got)
    assert (merged["n_users"] == merged["n_users_exp"]).all()


def test_table_profile_nulls_and_bounds(ray_session, tmp_path):
    """Profile over a hand-built table with nulls: counts, null
    counts, numeric/timestamp bounds, NULL bounds for strings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.relational import table_profile

    t = pa.table({
        "a": pa.array([1, None, 3, None], pa.int64()),
        "b": pa.array([0.5, -2.0, None, 7.25], pa.float64()),
        "s": pa.array(["x", None, "y", "z"], pa.string()),
        "ts": pa.array([1_000_000, 2_000_000, None, 4_000_000],
                       pa.timestamp("us")),
    })
    pq.write_table(t, str(tmp_path / "mini.parquet"))
    got = (table_profile(str(tmp_path), table="mini").to_pandas()
           .set_index("column_name"))
    assert (got["n_rows"] == 4).all()
    assert got.loc["a", "n_null"] == 2
    assert got.loc["a", "min_val"] == 1.0
    assert got.loc["a", "max_val"] == 3.0
    assert got.loc["b", "min_val"] == -2.0
    assert got.loc["b", "max_val"] == 7.25
    assert pd.isna(got.loc["s", "min_val"])
    assert got.loc["ts", "min_val"] == 1_000_000.0
    assert got.loc["ts", "max_val"] == 4_000_000.0


def test_filter_funnel_consistency(ray_session):
    """Funnel internal invariants + agreement with curate_documents:
    the cascade survivor count at the last gate equals the number of
    distinct-text survivors' inputs (pre-dedup)."""
    from risjbot_ray.pipelines.textstats import filter_funnel
    got = filter_funnel(SF).to_pandas().set_index("stage")
    n = got.loc["input", "n_surviving"]
    s1, s2, s3 = (got.loc["min_words", "n_surviving"],
                  got.loc["min_alpha", "n_surviving"],
                  got.loc["min_stop", "n_surviving"])
    assert n >= s1 >= s2 >= s3 >= 0
    assert got.loc["min_words", "n_failed"] == n - s1


def test_inverted_index_build_and_lookup(ray_session, tmp_path):
    """Index sink + lookup vs a brute-force corpus scan: posting lists
    for several terms (present, absent, multi-occurrence) match exact
    tf counts; a lookup touches only its term's bucket file; the
    manifest accounts for every posting."""
    import re
    from collections import Counter

    from risjbot_ray.pipelines.similarity import (_term_bucket,
                                                  build_inverted_index,
                                                  index_lookup)
    out = str(tmp_path / "idx")
    manifest = build_inverted_index(SF, out).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    tfs: dict = {}
    total_postings = 0
    for r in docs:
        c = Counter(re.findall(r"[a-z0-9]+", (r["text"] or "").lower()))
        total_postings += len(c)
        for term, tf in c.items():
            tfs.setdefault(term, {})[r["doc_id"]] = tf
    assert manifest["n_postings"].sum() == total_postings

    for term in ("vector", "the", "hash", "zzz_not_a_term"):
        got = index_lookup(out, term).to_pandas()
        exp = sorted((tfs.get(term) or {}).items())
        assert list(zip(got["doc_id"], got["tf"])) == exp, term
    # bucket-locality: the lookup's file is the term's crc32 bucket
    import os
    assert os.path.exists(
        os.path.join(out, f"tb={_term_bucket('vector')}.parquet"))


def test_lineitem_corr_vs_numpy(ray_session):
    """Grouped correlation from sufficient statistics vs np.corrcoef
    per group."""
    from risjbot_ray.pipelines.relational import lineitem_corr
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_quantity",
                                "l_extendedprice"]).to_pandas()
    got = lineitem_corr(SF).to_pandas().set_index("l_returnflag")
    for flag, sub in li.groupby("l_returnflag"):
        exp = np.corrcoef(sub["l_quantity"],
                          sub["l_extendedprice"])[0, 1]
        assert got.loc[flag, "n"] == len(sub)
        assert abs(got.loc[flag, "corr_qty_price"] - exp) < 1e-5, flag


def test_events_anomaly_vs_local(ray_session):
    """Grouped z-score flags == a local pandas recompute of the same
    population-stat rule, and every flagged row truly exceeds the
    cut."""
    from risjbot_ray.pipelines.relational import events_anomaly
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type",
                                "value"]).to_pandas()
    got = events_anomaly(SF, z_cut=2.0).to_pandas()
    exp_ids = set()
    for t, sub in ev.groupby("event_type"):
        v = sub["value"].to_numpy()
        m, sd = v.mean(), v.std()        # ddof=0 == population
        if sd > 0:
            z = (v - m) / sd
            exp_ids |= set(sub["event_id"].to_numpy()[np.abs(z) > 2.0])
    assert set(got["event_id"]) == exp_ids and len(exp_ids) > 0
    assert (np.abs(got["z"]) > 2.0 - 1e-9).all()


def test_events_anomaly_null_safety(ray_session, tmp_path):
    """NULL event_type / NULL value rows match the oracle semantics:
    they contribute nothing to the stats and are never flagged, and
    non-null groups' stats are unbiased by the null rows."""
    import pyarrow as pa
    n = 40
    vals = [float(i % 10) for i in range(n)]
    vals[7] = 500.0                             # the planted outlier
    types = ["click"] * n
    types[3] = None                             # null type
    vals[5] = None                              # null value
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from risjbot_ray.pipelines.relational import events_anomaly
    got = events_anomaly(str(tmp_path), z_cut=3.0).to_pandas()
    assert got["event_id"].tolist() == [7]
    # stats must exclude the nulls: recompute the expected z exactly
    clean = [v for ty, v in zip(types, vals)
             if ty is not None and v is not None]
    m = np.mean(clean)
    sd = np.std(clean)
    assert abs(got["z"].iloc[0] - round((500.0 - m) / sd, 5)) < 1e-9


def test_embedding_pca_planted_direction(ray_session, tmp_path):
    """PCA on data with one planted dominant direction: component 0
    recovers it (|cos| ~ 1), explained ratios are sorted, and the
    self-check passes."""
    import pyarrow as pa

    from risjbot_ray.pipelines.similarity import embedding_pca
    rng = np.random.default_rng(3)
    d, n = 16, 800
    direction = np.zeros(d)
    direction[2] = 1.0
    X = rng.normal(0, 0.05, size=(n, d)) \
        + np.outer(rng.normal(0, 3.0, n), direction)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in
                               X.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = embedding_pca(str(tmp_path), k=4).to_pandas()
    assert (got["check_ok"] == 1).all()
    evr = got["explained_var_ratio"].to_numpy()
    assert evr[0] > 0.9 and (np.diff(evr) <= 1e-12).all()


def test_rolling_user_value_vs_bruteforce(ray_session):
    ev = _events()
    got = (rolling_user_value(SF, window=5).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = ev.sort_values(["user_id", "ts", "event_id"],
                        kind="mergesort")
    exp = (ev.groupby("user_id")["value"]
           .rolling(5, min_periods=1).mean()
           .reset_index(level=0, drop=True))
    ev = ev.assign(exp_avg=exp).sort_values("event_id")
    assert len(got) == len(ev)
    assert got["event_id"].to_list() == ev["event_id"].to_list()
    assert np.allclose(got["rolling_avg"],
                       np.round(ev["exp_avg"].to_numpy(), 4),
                       atol=1e-9)


def test_top_customers_partitioned_matches_broadcast(ray_session):
    """The count-gated partitioned hash-join plan (bcast_max=0) must
    reproduce the broadcast plan's table exactly."""
    from risjbot_ray.pipelines.relational import top_customers_by_nation
    sf = "/root/testdata/sf0.001"
    fast = top_customers_by_nation(sf)
    slow = top_customers_by_nation(sf, bcast_max=0)
    assert fast.num_rows > 0
    assert fast.equals(slow)
