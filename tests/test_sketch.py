"""Gates for the mergeable-summary operators: exact-quantile parity
with a brute-force reference (and with DuckDB's quantile_disc), and
the Misra-Gries undercount guarantee on adversarial streams."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.pipelines.sketch import (heavy_hitters, mg_compress,
                                          quantiles_from_value_counts,
                                          wordcount_quantiles)

SF = "/root/testdata/sf0.001"
QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _disc_quantiles(stream: np.ndarray, qs) -> np.ndarray:
    """Brute-force quantile_disc with DuckDB's exact DECIMAL-literal
    rank convention: 0-based rank = max(1, n - floor(n*(1-q))) - 1 in
    exact rational arithmetic."""
    import math
    from fractions import Fraction
    s = np.sort(stream)
    n = len(s)
    ranks = [max(1, n - math.floor(n * (1 - Fraction(str(q))))) - 1
             for q in qs]
    return s[ranks]


def test_quantiles_from_value_counts_matches_bruteforce():
    rng = np.random.default_rng(5)
    for _ in range(20):
        stream = rng.integers(0, 50, size=int(rng.integers(1, 400)))
        vals, counts = np.unique(stream, return_counts=True)
        # shuffle summary order: the function must not assume sorted
        p = rng.permutation(len(vals))
        got = quantiles_from_value_counts(vals[p], counts[p], QS)
        assert np.array_equal(got, _disc_quantiles(stream, QS))


def test_quantiles_match_duckdb_semantics():
    import duckdb
    rng = np.random.default_rng(7)
    stream = rng.integers(0, 30, size=257)
    vals, counts = np.unique(stream, return_counts=True)
    got = quantiles_from_value_counts(vals, counts, QS)
    exp = duckdb.sql(
        "SELECT quantile_disc(x, " + str(list(QS)) + ") FROM "
        "(SELECT unnest(" + str(stream.tolist()) + ") AS x)"
    ).fetchone()[0]
    assert list(got) == list(exp)


def test_wordcount_quantiles_e2e(ray_session):
    got = wordcount_quantiles(SF, qs=QS)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = np.array([len(t.split()) if t else 0
                   for t in tbl.column("text").to_pylist()])
    exp = _disc_quantiles(wc, QS)
    assert got.column("value").to_pylist() == list(exp)
    assert got.column("q").to_pylist() == list(QS)


def test_wordcount_quantiles_by_lang_e2e(ray_session):
    from risjbot_ray.pipelines.sketch import wordcount_quantiles_by_lang
    got = wordcount_quantiles_by_lang(SF, qs=QS).to_pandas()
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["lang", "text"]).to_pandas()
    tbl["wc"] = [len(t.split()) if t else 0 for t in tbl["text"]]
    for lang, sub in tbl.groupby("lang"):
        exp = _disc_quantiles(sub["wc"].to_numpy(), QS)
        g = got[got["lang"] == lang].sort_values("q")
        assert g["value"].to_list() == list(exp), lang
        assert g["q"].to_list() == list(QS)


def test_ddsketch_bucket_mergeability_and_bound():
    """The DDSketch contract: (a) merging per-chunk bucket counts is
    EXACTLY the single-pass sketch (deterministic buckets, counts just
    add); (b) every quantile estimate is within relative error alpha
    of the true order statistic at the same rank."""
    import math

    import pyarrow as pa

    from risjbot_ray.pipelines.lm import _merge_counts
    from risjbot_ray.pipelines.sketch import (dd_bucket_counts,
                                              dd_quantiles_from_buckets)
    rng = np.random.default_rng(17)
    alpha = 0.01
    v = rng.lognormal(mean=1.0, sigma=2.0, size=20_000)
    whole = dd_bucket_counts(v, alpha)
    parts = [dd_bucket_counts(c, alpha)
             for c in np.array_split(v, 13)]
    merged = _merge_counts(pa.concat_tables(parts), "bucket", ("n",))
    assert merged.sort_by("bucket").equals(whole.sort_by("bucket"))

    qs = QS
    est = dd_quantiles_from_buckets(
        merged.column("bucket").to_numpy(zero_copy_only=False),
        merged.column("n").to_numpy(zero_copy_only=False), alpha, qs)
    s = np.sort(v)
    n = len(s)
    exact = s[[max(1, math.ceil(q * n)) - 1 for q in qs]]
    assert np.all(np.abs(est - exact) <= alpha * exact + 1e-12)


def test_ddsketch_underflow_bucket_counts_nonpositive():
    from risjbot_ray.pipelines.sketch import dd_bucket_counts
    v = np.array([-1.0, 0.0, 2.5, 3.5])
    t = dd_bucket_counts(v, 0.01)
    under = np.iinfo(np.int64).min + 1
    d = dict(zip(t.column("bucket").to_pylist(),
                 t.column("n").to_pylist()))
    assert d[under] == 2
    assert sum(d.values()) == 4


def test_value_quantile_sketch_e2e(ray_session):
    from risjbot_ray.pipelines.sketch import value_quantile_sketch
    t = value_quantile_sketch(SF, alpha=0.01)
    assert t.column("within_alpha").to_pylist() == [1] * 7


def test_value_quantile_sketch_by_group_e2e(ray_session):
    from risjbot_ray.pipelines.sketch import (
        value_quantile_sketch_by_group)
    t = value_quantile_sketch_by_group(SF, alpha=0.01).to_pandas()
    assert t["event_type"].nunique() == 5
    assert len(t) == 5 * 7
    assert (t["within_alpha"] == 1).all()


def _mg_reference_check(stream, m, grams, est):
    """The MG contract: every estimate undercounts its true count by
    at most N/(m+1); absent tokens have true count <= N/(m+1)."""
    from collections import Counter
    true = Counter(stream)
    n = len(stream)
    bound = n / (m + 1)
    got = dict(zip(grams, est))
    for tok, c in true.items():
        e = got.get(tok, 0)
        assert 0 <= e <= c
        assert c - e <= bound, (tok, c, e, bound)


def test_mg_compress_guarantee_single_pass():
    rng = np.random.default_rng(11)
    # zipf-ish stream with a few giants and a long tail
    toks = ([f"h{i}" for i in range(3) for _ in range(500)]
            + [f"t{int(x)}" for x in rng.integers(0, 5000, 4000)])
    rng.shuffle(toks)
    from collections import Counter
    c = Counter(toks)
    grams, counts = mg_compress(
        list(c.keys()), np.fromiter(c.values(), np.int64, len(c)), 16)
    _mg_reference_check(toks, 16, grams, counts)
    # the three giants (500 each > N/17 ~ 324) must be retained
    assert {"h0", "h1", "h2"} <= set(grams)


def test_mg_merge_guarantee_across_splits():
    """Simulate the distributed shape: split an adversarial stream
    into uneven batches, compress each, merge in stages — the bound
    must hold for the FINAL summary (mergeability, not just one
    pass)."""
    import pyarrow as pa

    from risjbot_ray.pipelines.sketch import _mg_merge, _mg_partial
    rng = np.random.default_rng(13)
    m = 8
    # adversarial: m+2 tokens with near-identical counts + one giant
    toks = (["giant"] * 400
            + [f"w{i}" for i in range(10) for _ in range(95)]
            + [f"r{int(x)}" for x in rng.integers(0, 300, 500)])
    rng.shuffle(toks)
    docs = [" ".join(toks[i:i + 37]) for i in range(0, len(toks), 37)]
    parts = []
    for lo in range(0, len(docs), 7):
        batch = pa.table({"text": pa.array(docs[lo:lo + 7])})
        parts.append(_mg_partial(batch, m))
    # two-stage merge like the tree-combine
    mid = len(parts) // 2
    stage = [_mg_merge(pa.concat_tables(parts[:mid]), m),
             _mg_merge(pa.concat_tables(parts[mid:]), m)]
    final = _mg_merge(pa.concat_tables(stage), m)
    is_total = final.column("is_total").to_numpy(zero_copy_only=False)
    est = final.column("est").to_numpy(zero_copy_only=False)
    assert int(est[is_total == 1].sum()) == len(toks)
    grams = final.filter(pa.array(is_total == 0)) \
        .column("gram").to_pylist()
    _mg_reference_check(toks, m, grams, est[is_total == 0])
    assert "giant" in grams  # 400 > N/(m+1) ~ 205


def test_heavy_hitters_e2e(ray_session):
    m = 32
    got = heavy_hitters(SF, m=m)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter
    true = Counter()
    for t in tbl.column("text").to_pylist():
        true.update((t or "").split())
    n = sum(true.values())
    assert got.column("n_total").to_pylist()[0] == n
    est = dict(zip(got.column("gram").to_pylist(),
                   got.column("est").to_pylist()))
    bound = n / (m + 1)
    for tok, c in true.items():
        e = est.get(tok, 0)
        assert 0 <= e <= c and c - e <= bound
    # every true-heavy token is present
    for tok, c in true.items():
        if c > bound:
            assert tok in est


def test_ddsketch_nonfinite_pinned_to_overflow_bucket():
    """+inf / NaN must land in the reserved OVERFLOW bucket (sorting
    ABOVE every real bucket), never wrap to int64 min — pre-fix a
    single inf shifted every quantile rank and the median of
    [1, 2, inf, nan] was estimated 0.0."""
    import warnings

    from risjbot_ray.pipelines.sketch import (dd_bucket_counts,
                                              dd_bucket_ids,
                                              dd_quantiles_from_buckets)
    over = np.iinfo(np.int64).max - 1
    under = np.iinfo(np.int64).min + 1
    v = np.array([1.0, 2.0, np.inf, np.nan, -np.inf])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old cast warned
        b = dd_bucket_ids(v, 0.01)
    assert b[2] == over and b[3] == over
    assert b[4] == under
    assert b[0] != under and b[1] != under

    t = dd_bucket_counts(np.array([1.0, 2.0, np.inf]), 0.01)
    est = dd_quantiles_from_buckets(
        np.asarray(t.column("bucket").to_pylist(), np.int64),
        np.asarray(t.column("n").to_pylist(), np.int64),
        0.01, (0.5, 0.99))
    assert abs(est[0] - 2.0) / 2.0 <= 0.01 + 1e-12  # median ~2
    assert np.isinf(est[1])                          # p99 = inf


def test_grouped_partials_keep_types_on_empty_and_null_keys():
    """Zero-row batches must emit TYPED partials (pandas inferred a
    null lang column that broke Arrow concat), and a NULL group key is
    a group of its own, matching SQL GROUP BY."""
    import pyarrow as pa

    from risjbot_ray.pipelines.sketch import (_merge_lang_counts,
                                              _wc_lang_value_counts)
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "text": pa.array([], pa.string())})
    pe = _wc_lang_value_counts(empty)
    assert pe.schema.field("lang").type == pa.string()
    full = pa.table({"lang": pa.array(["en", None, "en"]),
                     "text": pa.array(["a b", "c", "a b"])})
    pf = _wc_lang_value_counts(full)
    # concat across the two partials must not raise (pre-fix:
    # 'Schema at index 1 was different')
    merged = _merge_lang_counts(pa.concat_tables([pe, pf]))
    d = {(lg, v): n for lg, v, n in zip(
        merged.column("lang").to_pylist(),
        merged.column("val").to_pylist(),
        merged.column("n").to_pylist())}
    assert d[("en", 2)] == 2
    assert d[(None, 1)] == 1  # NULL lang kept as its own group


def test_user_distinct_hll_by_type(ray_session, tmp_path):
    """Grouped HLL: per-type estimates stay within the 3-sigma bound
    of the exact distinct counts at real cardinality, registers merge
    across blocks (multi-block input == same answer), and a planted
    high-cardinality group is estimated accurately."""
    import os

    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.sketch import user_distinct_hll_by_type

    rng = np.random.default_rng(11)
    n = 30_000
    # 'hot' has 5000 distinct users, 'cold' has 7
    types = np.where(rng.random(n) < 0.9, "hot", "cold")
    users = np.where(
        types == "hot",
        rng.integers(0, 5000, n),
        rng.integers(100_000, 100_007, n)).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(t, str(d / "events.parquet"))
    out = user_distinct_hll_by_type(str(d)).to_pandas() \
        .set_index("event_type")
    exact_hot = len(np.unique(users[types == "hot"]))
    assert out.loc["hot", "n_exact"] == exact_hot
    assert out.loc["cold", "n_exact"] == 7
    assert bool(out["within_bound"].all())
    # small groups are near-exact under HLL's linear-counting regime
    assert abs(out.loc["cold", "n_hll"] - 7) < 1
