"""Driver-style parity gates for the generated DuckDB oracles added in
round 3 (simhash / fingerprint / langid): run the Ray query AND the
oracle SQL over sf0.001 and compare rows + schema + value hash exactly
the way the driver's CORRECTNESS check does. The minhash-clusters
recursive-CTE oracle is excluded here only because its all-pairs
shingle SQL takes ~35 s — it is pinned by the golden value hash
(test_golden_hashes) and checked by the driver at sf0.01."""

import hashlib

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

NAMES = ["simhash_signatures", "doc_fingerprint", "doc_langid",
         "frontier_schedule", "doc_pii_scrub", "doc_repetition",
         "doc_chunks", "doc_pack_stream", "doc_decontaminate",
         "doc_tile_dedup", "doc_domain_sample", "doc_shuffle_rank",
         "corpus_curate_full", "doc_length_histogram",
         "corpus_top_bigrams", "doc_lang_balance", "corpus_split",
         "doc_quality_rank", "doc_tile_dedup_incr",
         "embedding_semdedup", "doc_bm25_topk", "doc_perplexity",
         "doc_dsir_weight", "doc_dsir_resample",
         "doc_wordcount_quantiles", "doc_pagerank",
         "graph_components", "doc_stratified_sample",
         "doc_domain_token_cap", "doc_snapshot_diff",
         "doc_wordcount_quantiles_by_lang", "events_asof_purchase",
         "events_window_counts", "events_user_distinct",
         "events_rolling_avg", "corpus_top_pmi",
         "doc_filter_funnel", "events_profile",
         "simhash_dedup_clusters", "doc_index_lookup",
         "doc_normalize", "lineitem_corr", "source_unigram_kl",
         "doc_temperature_mix", "doc_blocklist", "events_anomaly"]


def _vhash(df) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns),
                        kind="mergesort").reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_matches_query(ray_session, name):
    import __ray_entry__ as entry
    res = entry.queries()[name](SF)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    for view in ("documents", "embeddings", "events", "lineitem"):
        con.execute(f"CREATE VIEW {view} AS "
                    f"SELECT * FROM '{SF}/{view}.parquet'")
    odf = con.execute(entry.oracle_sql()[name]).df()
    assert len(df) == len(odf)
    assert sorted(df.columns) == sorted(odf.columns)
    assert _vhash(df) == _vhash(odf)
