"""Oracle parity on ADVERSARIAL inputs the driver corpora never
exercise: non-ASCII letters, Unicode whitespace (\xa0,  , \x0b),
whitespace-only and NULL text, and NULL event_type rows. The standard
parity gate (test_oracle_parity) runs on ASCII-only fixtures, so the
Python-vs-RE2 tokenization contract and SQL NULL semantics are only
pinned here. Each case found a real divergence when added:
ends_with_punct('   ') substring-True, Python-\\w counting 'café' as
one BPE-ish token, NULL event_type crashing the distinct-count
bincount and surviving the as-of join's != filter."""

import glob
import hashlib
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_NASTY_TEXTS = [
    "café au\xa0lait naïve 99!",          # non-ASCII letters + NBSP
    "   ",                                 # whitespace-only
    None,                                  # NULL text
    "a\x0bb c d e　f.",           # exotic whitespace classes
    "ends with period. five words here ok.\nshort line\njavascript ad",
    "",                                    # empty
    "\tleading tab and trailing newline\n",
    "ï¿½ mojibake-ish bytes André",
    "word " * 60 + "end.",                 # long ASCII control doc
    "\t\n\x0b",                     # whitespace-only with NO spaces:
                                       # DuckDB trim() strips spaces
                                       # only, so trim-based emptiness
                                       # guards diverge on this row
]


def _write_docs(tmp_path) -> str:
    n = len(_NASTY_TEXTS)
    tbl = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(_NASTY_TEXTS, pa.string()),
        "lang": pa.array((["en", None] * n)[:n], pa.string()),
        "source": pa.array([f"s{i % 3}.example" for i in range(n)],
                           pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for t in _NASTY_TEXTS],
                            pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path) -> str:
    ts = pa.array([1_700_000_000_000_000 + i * 1_000_000
                   for i in range(8)], pa.timestamp("us"))
    tbl = pa.table({
        "event_id": pa.array(range(1, 9), pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 2, 2, 1, 2, 1, 2], pa.int64()),
        "event_type": pa.array(["purchase", None, "view", "purchase",
                                "click", None, "view", "click"],
                               pa.string()),
        "value": pa.array([10.0, 2.0, 3.0, 40.0, 5.0, 6.0, 7.0, 8.0],
                          pa.float64()),
        "props": pa.array(["{}"] * 8, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _vhash(df) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns),
                        kind="mergesort").reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def _compare(name: str, sf_dir: str):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry
    res = entry.queries()[name](sf_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    for path in glob.glob(f"{sf_dir}/*.parquet"):
        view = os.path.basename(path)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {view} AS SELECT * FROM '{path}'")
    odf = con.execute(entry.oracle_sql()[name]).df()
    assert len(df) == len(odf), (name, len(df), len(odf))
    assert sorted(df.columns) == sorted(odf.columns)
    assert _vhash(df) == _vhash(odf), name


_DOC_QUERIES = ["doc_wordcount", "doc_tokencount", "doc_quality",
                "doc_gopher_quality", "corpus_token_stats",
                "doc_c4_clean", "doc_normalize", "doc_line_dedup",
                "doc_quality_rank", "domain_quality_filter",
                "doc_quality_token_budget", "doc_gram_dup",
                "doc_nfc_normalize", "doc_tfidf_topk",
                "doc_host_line_dedup", "doc_url_filter",
                # the 'word '*60 doc self-repeats its 50-token windows,
                # so removal + Unicode tokenization both really fire
                "doc_window_dedup"]


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_doc_query_parity_on_nasty_text(ray_session, name, tmp_path):
    sf = _write_docs(tmp_path)
    _compare(name, sf)


_EVENT_QUERIES = ["events_user_distinct", "events_asof_purchase",
                  "events_hourly"]


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_event_query_parity_with_null_type(ray_session, name, tmp_path):
    sf = _write_events(tmp_path)
    _compare(name, sf)
