"""Golden value-hash gates for language-ID, rolling fingerprints,
SimHash signatures and MinHash duplicate clusters. All four now ALSO
have driver-side DuckDB oracles (`__ray_entry__.oracle_sql()`), but the
goldens stay: they are pure seeded functions of the sf0.001 documents
table, so their full sorted output is pinned by hash and any silent
behavior change trips here without waiting for a driver round."""

import hashlib

import pytest

SF = "/root/testdata/sf0.001"

GOLDEN = {
    "doc_langid": "77ebdc69e943e328fcbe2ae3c776fb4a",
    "doc_fingerprint": "a3bcf10ff01cbb820b6126ad43e81b6c",
    "simhash_signatures": "2e41a04b50bcacb04ba7bd260c53e2d2",
    "minhash_dedup_clusters": "b2ef4fe48c4934cb5316983a526baedc",
}


def _vhash(res) -> str:
    df = res.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns),
                        kind="mergesort").reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_value_hash(ray_session, name):
    from risjbot_ray.pipelines import dedup
    from risjbot_ray.pipelines import textstats as ts
    fns = {
        "doc_langid": ts.q_langid,
        "doc_fingerprint": ts.q_fingerprint,
        "simhash_signatures": dedup.simhash_signatures,
        "minhash_dedup_clusters": dedup.minhash_dedup,
    }
    assert _vhash(fns[name](SF)) == GOLDEN[name]
