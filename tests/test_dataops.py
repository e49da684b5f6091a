"""Training-data operator tests: dedup families, similarity search, text
stats, multimodal plumbing — over the driver testdata at sf0.001."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_exact_dedup_partitions_corpus():
    from risjbot_ray.pipelines.dedup import exact_dedup
    out = exact_dedup(SF).to_pandas()
    import pyarrow.parquet as pq
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert out["n_dups"].sum() == n_docs
    assert out["doc_id"].is_unique


def test_minhash_identical_docs_cluster():
    """Plant exact+near duplicates through the same MinHash pipeline
    machinery (batch-level) and confirm they pair."""
    from risjbot_ray.pipelines.dedup import MinHasher
    mh = MinHasher(num_perm=64)
    words = [f"w{i}token" for i in range(200)]
    a = " ".join(words)
    b = " ".join(words[:190] + ["changed", "tail", "words"])  # small edit
    c = " ".join(f"z{i}other" for i in range(200))
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    assert (sa == sb).mean() > 0.7       # near-dup: high signature overlap
    assert (sa == sc).mean() < 0.2       # unrelated: low overlap


def test_minhash_clusters_on_corpus():
    from risjbot_ray.pipelines.dedup import minhash_dedup
    out = minhash_dedup(SF).to_pandas()
    # cluster_id is the min doc_id of each cluster
    assert (out.groupby("cluster_id")["doc_id"].min()
            == out.groupby("cluster_id")["cluster_id"].first()).all()


def test_label_propagation_clusters_distributed():
    """Connected components as Dataset ops: a chain, a separate pair,
    and a cycle all collapse to their min node id, with no driver-side
    edge loop (the edges Dataset is never to_pandas'd)."""
    import ray
    from risjbot_ray.pipelines.dedup import label_propagation_clusters
    edges = pa.table({
        "a": pa.array([1, 2, 3, 9, 5, 20, 21], pa.int64()),
        "b": pa.array([2, 3, 4, 1, 6, 21, 20], pa.int64()),
    })
    labels = label_propagation_clusters(ray.data.from_arrow(edges))
    got = {(r["node"], r["label"]) for r in labels.take_all()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (9, 1),
                   (5, 5), (6, 5), (20, 20), (21, 20)}


def test_simhash_hamming_for_similar_text():
    from risjbot_ray.pipelines.dedup import SimHasher
    sh = SimHasher()
    a = sh.simhash("the quick brown fox jumps over the lazy dog " * 5)
    b = sh.simhash("the quick brown fox jumps over the lazy dogs " * 5)
    c = sh.simhash("unrelated text about economic policy and markets " * 5)
    assert bin(a ^ b).count("1") < bin(a ^ c).count("1")


def test_ann_topk_matches_bruteforce_numpy():
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.similarity import ann_topk
    out = ann_topk(SF, query_ids=[0], k=10).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    vecs = np.stack([np.asarray(v, float)
                     for v in t.column("embedding").to_pylist()])
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    q = unit[ids == 0][0]
    sims = unit @ q
    sims[ids == 0] = -2
    top = ids[np.argsort(-sims)[:10]]
    assert set(out["vec_id"]) == set(top)
    assert len(out) == 10


def test_ann_ivf_recall_vs_exact():
    from risjbot_ray.pipelines.similarity import ann_ivf_topk, ann_topk
    exact = set(ann_topk(SF, query_ids=[0], k=10)
                .to_pandas()["vec_id"])
    approx = set(ann_ivf_topk(SF, query_ids=[0], k=10, nprobe=8)
                 .to_pandas()["vec_id"])
    assert len(exact & approx) >= 6  # decent recall with nprobe=8/16 cells


def test_ivf_index_shared_dir_roundtrip(tmp_path):
    """The IVF index honors a caller-supplied (shared-fs) index root,
    round-trips through a cached load, and a PARTIALLY VISIBLE layout
    — the multi-node signature of a node-local path — fails loudly
    instead of silently searching a fragment."""
    import glob
    import os

    from risjbot_ray.pipelines.similarity import (IVFIndex,
                                                  _load_query_vectors)
    idx_dir = str(tmp_path / "clusterfs" / "ivf-explicit")
    idx = IVFIndex(SF, index_dir=idx_dir)
    assert idx.index_dir == idx_dir
    assert os.path.exists(os.path.join(idx_dir, "DONE"))
    q = _load_query_vectors(SF, [0, 1])
    r1 = idx.search_batch(q, k=10, nprobe=8)
    # cached re-open verifies the manifest and returns identical hits
    r2 = IVFIndex(SF, index_dir=idx_dir).search_batch(q, k=10, nprobe=8)
    assert r1 == r2 and len(r1[0]) == 10
    parts = glob.glob(os.path.join(idx_dir, "cell=*", "part-*.parquet"))
    os.remove(sorted(parts)[0])
    with pytest.raises(RuntimeError, match="partially visible"):
        IVFIndex(SF, index_dir=idx_dir)


def test_ivf_default_dir_under_shared_root(tmp_path, monkeypatch):
    """Default index placement follows $RISJBOT_SHARED_DIR — the same
    shared-storage contract as the tile ledger/checkpoint dirs."""
    import os

    from risjbot_ray.pipelines.similarity import IVFIndex
    root = str(tmp_path / "sharedfs")
    monkeypatch.setenv("RISJBOT_SHARED_DIR", root)
    idx = IVFIndex(SF)
    assert idx.index_dir.startswith(os.path.join(root, "ivf"))
    assert os.path.exists(os.path.join(idx.index_dir, "DONE"))


def test_ivf_streaming_search_matches_oneshot(tmp_path):
    """The per-cell streaming top-k merge equals the one-shot top-k of
    the probed cells' union under the (-cosine, vec_id) order."""
    import glob
    import os

    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.similarity import (IVFIndex, _unit,
                                                  _load_query_vectors)
    idx = IVFIndex(SF, index_dir=str(tmp_path / "ivf-stream"))
    q = _unit(_load_query_vectors(SF, [0]))
    probe = np.argsort(-(q @ idx.centroids.T), axis=1)[:, :4]
    parts = []
    for c in sorted({int(x) for x in probe.ravel()}):
        parts.extend(glob.glob(os.path.join(
            idx.index_dir, f"cell={c:04d}", "part-*.parquet")))
    tbl = pa.concat_tables([pq.read_table(p) for p in parts])
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    unit = np.stack([np.asarray(v) for v in
                     tbl.column("unit").to_pylist()])
    sims = unit @ q[0]
    top = np.lexsort((ids, -sims))[:10]
    got = idx.search_batch(q, k=10, nprobe=4)[0]
    # ids and order exact; cosines to BLAS ulp (matvec vs matmul paths)
    assert [g[0] for g in got] == [int(ids[i]) for i in top]
    assert np.allclose([g[1] for g in got], sims[top])


def test_ann_hamming_recall_and_determinism():
    from risjbot_ray.pipelines.similarity import ann_hamming_topk, ann_topk
    exact = set(ann_topk(SF, query_ids=[0], k=10)
                .to_pandas()["vec_id"])
    out = ann_hamming_topk(SF, query_ids=[0], k=10)
    approx = set(out.to_pandas()["vec_id"])
    assert len(exact & approx) >= 6   # the documented >=0.6 contract
    assert out.equals(ann_hamming_topk(SF, query_ids=[0], k=10))
    assert 0 not in approx            # query row excluded


def test_ann_hamming_matches_numpy_reference():
    """Full-pipeline parity with a local numpy implementation of the
    same signature/pre-rank/rerank algorithm (same seed, same ties)."""
    import heapq

    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.similarity import (_pack_signatures,
                                                  ann_hamming_topk)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in t.column("embedding").to_pylist()])
    unit = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    k, C, qid = 10, 100, 1
    rng = np.random.default_rng(99)
    planes = rng.standard_normal((unit.shape[1], 128))
    sig = _pack_signatures(unit, planes)
    qi = int(np.where(ids == qid)[0][0])
    ham = np.zeros(len(ids), np.int64)
    for w in range(sig.shape[1]):
        x = (sig[:, w] ^ sig[qi, w]).astype(np.uint64)
        ham += np.array([bin(int(v)).count("1") for v in x])
    mask = ids != qid
    order = sorted(zip(ham[mask], ids[mask]))[:C]
    cand = np.array([v for _, v in order], dtype=np.int64)
    sel = np.isin(ids, cand)
    sims = unit[sel] @ unit[qi]
    cids = ids[sel]
    ref = sorted(zip(-sims, cids))[:k]
    want = [(int(v), round(float(-s), 5)) for s, v in ref]
    got = [(r["vec_id"], r["cosine"]) for r in
           ann_hamming_topk(SF, query_ids=[qid], k=k).to_pylist()]
    assert got == want


def test_langid_separates_languages():
    from risjbot_ray.pipelines.textstats import LangId
    li = LangId()
    assert li.classify("the cat sat on the mat and the dog was there")[0] \
        == "en"
    assert li.classify("der hund und die katze sind schön und ich bin")[0] \
        == "de"
    assert li.classify("le chat est sur la table et que les chiens")[0] \
        == "fr"
    assert li.classify("")[0] == "und"


def test_fingerprint_stability_and_sensitivity():
    from risjbot_ray.pipelines.textstats import rolling_fingerprint
    a_min, a_xor = rolling_fingerprint("some document content here")
    assert (a_min, a_xor) == rolling_fingerprint("some document content here")
    b_min, b_xor = rolling_fingerprint("some document content herX")
    assert a_xor != b_xor                      # any edit flips the fold
    # local edit far from the min window usually preserves fp_min
    c_min, _ = rolling_fingerprint("some document content here plus tail")
    assert isinstance(c_min, int)


def test_quality_ratios_are_exact_divisions():
    from risjbot_ray.pipelines.textstats import quality_batch
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["The cat, 9 lives!"], pa.string())})
    out = quality_batch(t).to_pylist()[0]
    assert out["n_chars"] == 17
    assert out["n_words"] == 4
    assert out["alpha_ratio"] == 11 / 17
    assert out["digit_ratio"] == 1 / 17
    assert out["ends_with_punct"] is True


def test_media_features_pipeline():
    from risjbot_ray.pipelines.multimodal import (FrameSampler,
                                                  media_features_ds,
                                                  synth_media_table)
    out = media_features_ds(n=60, seed=42).to_pandas()
    assert len(out) == 60
    assert all(len(f) == 32 for f in out["features"])
    # deterministic across runs
    out2 = media_features_ds(n=60, seed=42).to_pandas()
    assert (np.stack(out["features"].to_numpy())
            == np.stack(out2["features"].to_numpy())).all()
    # frame sampler explodes only videos
    import ray
    frames = (ray.data.from_arrow(synth_media_table(30, 42))
              .map_batches(FrameSampler, batch_format="pyarrow",
                           batch_size=8, concurrency=1).to_pandas())
    assert len(frames) > 0
    assert frames["frame_ms"].min() == 0


def test_pii_scrub_redacts_all_three_kinds():
    import pyarrow as pa
    from risjbot_ray.pipelines.textstats import pii_scrub_batch
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "mail a.b+c@x.co.uk and b@y.io, ip 192.168.0.1, tel 555-123-4567",
            "no pii here",
            "",
        ], pa.string()),
    })
    out = pii_scrub_batch(batch)
    assert out.column("n_emails").to_pylist() == [2, 0, 0]
    assert out.column("n_ips").to_pylist() == [1, 0, 0]
    assert out.column("n_phones").to_pylist() == [1, 0, 0]
    assert out.column("clean_text").to_pylist()[0] == \
        "mail <EMAIL> and <EMAIL>, ip <IP>, tel <PHONE>"
    assert out.column("clean_text").to_pylist()[1] == "no pii here"


def test_repetition_fractions():
    import pyarrow as pa
    from risjbot_ray.pipelines.textstats import repetition_batch
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b a a c", "x y z", ""], pa.string()),
    })
    out = repetition_batch(batch)
    # 5 tokens, 3 unique, top 'a' x3
    assert out.column("dup_word_frac").to_pylist() == [1 - 3 / 5, 0.0, 0.0]
    assert out.column("top_word_frac").to_pylist() == [3 / 5, 1 / 3, 0.0]


def test_chunk_batch_windows():
    import pyarrow as pa
    from risjbot_ray.pipelines.textstats import chunk_batch
    batch = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["a b c d e", ""], pa.string()),
    })
    out = chunk_batch(batch, window=2).to_pylist()
    doc7 = [r for r in out if r["doc_id"] == 7]
    assert [(r["chunk_id"], r["token_start"], r["token_end"],
             r["chunk_text"]) for r in doc7] == [
        (0, 0, 2, "a b"), (1, 2, 4, "c d"), (2, 4, 5, "e")]
    doc8 = [r for r in out if r["doc_id"] == 8]
    assert doc8 == [{"doc_id": 8, "chunk_id": 0, "token_start": 0,
                     "token_end": 0, "chunk_text": ""}]


def test_pack_stream_offsets(ray_session):
    from risjbot_ray.pipelines.textstats import pack_stream
    df = (pack_stream("/root/testdata/sf0.001", context=100,
                      bucket_size=64)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # exact prefix-sum across bucket boundaries
    import numpy as np
    n = df["n_tokens"].to_numpy()
    expect_off = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert (df["token_offset"].to_numpy() == expect_off).all()
    assert (df["seq_first"] == df["token_offset"] // 100).all()
    assert (df["offset_in_seq"] == df["token_offset"] % 100).all()
    last = np.where(n > 0, (expect_off + n - 1) // 100, expect_off // 100)
    assert (df["seq_last"].to_numpy() == last).all()
    assert (df["seq_last"] >= df["seq_first"]).all()


def _write_docs(tmp_path, rows):
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] if len(r) > 2 else "src1"
                            for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_tile_dedup_planted(ray_session, tmp_path):
    """First-occurrence tile semantics on planted duplicates: a repeated
    8-token tile survives only at its (doc_id, tile_no)-minimal site; a
    fully duplicated doc comes back empty."""
    from risjbot_ray.pipelines.webtext import tile_dedup
    t1 = "a b c d e f g h"            # tile shared by docs 1, 2 and 3
    t2 = "i j k l m n o p"
    t3 = "q r s t u v w x"
    sf = _write_docs(tmp_path, [
        (1, f"{t1} {t2}"),            # keeps both tiles
        (2, f"{t1} {t3}"),            # t1 dropped, t3 kept
        (3, f"{t1} {t2}"),            # exact dup of doc 1 -> empty
    ])
    df = (tile_dedup(sf).to_pandas()
          .set_index("doc_id").sort_index())
    assert df.loc[1, "text_dedup"] == f"{t1} {t2}"
    assert df.loc[2, "text_dedup"] == t3
    assert df.loc[3, "text_dedup"] == ""
    assert df["n_tiles"].tolist() == [2, 2, 2]
    assert df["n_tiles_kept"].tolist() == [2, 1, 0]


def test_decontaminate_planted(ray_session, tmp_path):
    """A doc sharing an 8-gram with the benchmark doc (doc_id % 97 == 0)
    is flagged; an unrelated doc is not; the benchmark doc is excluded
    from the output."""
    from risjbot_ray.pipelines.webtext import decontaminate
    leak = "one two three four five six seven eight"
    sf = _write_docs(tmp_path, [
        (0, f"prefix {leak} suffix"),                  # benchmark
        (5, f"stolen text with {leak} inside it"),     # contaminated
        (6, "totally fresh words nothing shared here at all ok"),
    ])
    df = decontaminate(sf).to_pandas().set_index("doc_id").sort_index()
    assert list(df.index) == [5, 6]
    assert bool(df.loc[5, "contaminated"])
    assert df.loc[5, "n_contaminated"] >= 1
    assert not bool(df.loc[6, "contaminated"])


def test_domain_sample_and_shuffle_rank(ray_session, tmp_path):
    """Hash-threshold sampling matches the per-row predicate recomputed
    locally, and shuffle ranks are a permutation of 0..n-1 in key
    order."""
    from risjbot_ray.pipelines.webtext import (_mix_rate, _unit_hash,
                                               domain_sample,
                                               shuffle_rank)
    rows = [(i, f"doc {i} text body", f"src{i % 20}") for i in range(64)]
    sf = _write_docs(tmp_path, rows)

    kept = set(domain_sample(sf).to_pandas()["doc_id"])
    expect = {i for i, _, s in rows
              if _unit_hash(i, "mix") < _mix_rate(s)}
    assert kept == expect
    assert 0 < len(kept) < len(rows)

    df = shuffle_rank(sf).to_pandas()
    assert sorted(df["rank"]) == list(range(64))
    import hashlib
    order = sorted(range(64),
                   key=lambda i: (hashlib.md5(f"{i}:shuf".encode())
                                  .hexdigest(), i))
    got = df.set_index("doc_id")["rank"]
    assert [got[i] for i in order] == list(range(64))


def test_curate_corpus_zero_survivors(ray_session, tmp_path):
    """An input where every doc fails the quality gate flows through the
    whole composed pipeline (tile dedup + shuffle rank) and yields an
    empty result instead of crashing on empty exchanges."""
    from risjbot_ray.pipelines.webtext import curate_corpus
    sf = _write_docs(tmp_path, [(1, "too short"), (2, "also short")])
    assert len(curate_corpus(sf).to_pandas()) == 0


def test_tile_dedup_property(ray_session, tmp_path):
    """tile_dedup matches a trivial in-memory reference on an
    adversarial corpus: tiny vocabulary + short docs force heavy tile
    collisions, duplicate docs, empty docs, and partial tail tiles."""
    import math

    from risjbot_ray.pipelines.webtext import tile_dedup

    rng = np.random.default_rng(13)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = []
    for i in range(60):
        n = int(rng.integers(0, 30))
        rows.append((i, " ".join(vocab[j]
                                 for j in rng.integers(0, 4, n))))
    rows.append((60, rows[5][1]))          # exact duplicate doc
    sf = _write_docs(tmp_path, rows)

    # reference: global first-occurrence per tile content
    seen: set[str] = set()
    expect = {}
    for did, text in sorted(rows):
        toks = text.split()
        tiles = [" ".join(toks[j * 8:(j + 1) * 8])
                 for j in range(math.ceil(len(toks) / 8))]
        kept = [t for t in tiles if t not in seen and not seen.add(t)]
        expect[did] = (" ".join(kept), len(tiles), len(kept))

    got = tile_dedup(sf).to_pandas().set_index("doc_id").sort_index()
    assert len(got) == len(rows)
    for did, (txt, nt, nk) in expect.items():
        assert got.loc[did, "text_dedup"] == txt, did
        assert got.loc[did, "n_tiles"] == nt
        assert got.loc[did, "n_tiles_kept"] == nk


def test_top_ngrams_exact(ray_session, tmp_path):
    """Exact bigram counts with deterministic ties: reference Counter
    over the same corpus; k smaller than the vocabulary so the tie
    boundary is exercised."""
    from collections import Counter

    from risjbot_ray.pipelines.webtext import top_ngrams

    rows = [(0, "a b a b c d"), (1, "a b c d"), (2, "x y"), (3, "")]
    sf = _write_docs(tmp_path, rows)

    ref: Counter = Counter()
    for _, text in rows:
        toks = text.split()
        ref.update(" ".join(toks[i:i + 2])
                   for i in range(len(toks) - 1))
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]

    got = top_ngrams(sf, n=2, k=3).to_pandas()
    got = list(zip(got["gram"], got["n_occurrences"]))
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def test_top_pmi_bigrams_reference(ray_session, tmp_path):
    """PMI collocations against an independent Counter/math reference:
    a planted always-together pair must outrank a frequent-but-
    independent pair; values match the ln((c*N1*N1)/(N2*cx*cy))
    formula at 5dp."""
    import math
    from collections import Counter

    from risjbot_ray.pipelines.webtext import top_pmi_bigrams

    # "zig zag" always co-occurs; "a b" is frequent but a/b also
    # appear apart, diluting their PMI
    rows = [(i, "zig zag a b a c b d " + "e f " * 3)
            for i in range(10)]
    sf = _write_docs(tmp_path, rows)

    uni: Counter = Counter()
    bi: Counter = Counter()
    ndocs = 0
    for _, text in rows:
        toks = text.split()
        if toks:
            ndocs += 1
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n1 = sum(uni.values())
    n2 = n1 - ndocs
    ref = {}
    for (x, y), c in bi.items():
        if c >= 5:
            ref[f"{x} {y}"] = round(
                math.log((c * float(n1) * float(n1))
                         / (float(n2) * uni[x] * uni[y])), 5)

    got = top_pmi_bigrams(sf, k=50, min_count=5).to_pandas()
    assert dict(zip(got["gram"], got["pmi"])) == ref
    assert got.iloc[0]["gram"] == "zig zag"
    top = {g: p for g, p in zip(got["gram"], got["pmi"])}
    assert top["zig zag"] > top["a b"]


def test_source_unigram_kl_reference(ray_session, tmp_path):
    """KL per source against an independent Counter/math reference: a
    source matching the corpus mix has KL near 0; a skewed source has
    strictly larger KL; values match the p*ln(p/q) sum at 5dp."""
    import math
    from collections import Counter

    from risjbot_ray.pipelines.webtext import source_unigram_kl

    rows = []
    for i in range(40):
        rows.append((i, "a b c d", "mixed"))
    for i in range(40, 60):
        rows.append((i, "a a a a", "skewed"))
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = source_unigram_kl(str(tmp_path)).to_pandas() \
        .set_index("source")
    corpus: Counter = Counter()
    per: dict = {}
    for _, text, src in rows:
        toks = text.split()
        corpus.update(toks)
        per.setdefault(src, Counter()).update(toks)
    n_c = sum(corpus.values())
    for src, cnt in per.items():
        n_s = sum(cnt.values())
        kl = sum((c / n_s) * math.log((c / n_s)
                                      / (corpus[w] / n_c))
                 for w, c in cnt.items())
        assert abs(got.loc[src, "kl"] - round(kl, 5)) < 1e-9, src
        assert got.loc[src, "n_tokens"] == n_s
    assert got.loc["skewed", "kl"] > got.loc["mixed", "kl"] > 0


def test_logreg_fit_matches_local_reference(ray_session):
    """Distributed full-batch GD == a local numpy implementation of
    the identical update (same standardization, lr, iterations) to
    1e-9, and separable synthetic data trains to high accuracy."""
    import ray as _ray

    from risjbot_ray.pipelines.textstats import _logreg_fit
    rng = np.random.default_rng(7)
    n, d = 600, 4
    x_raw = rng.normal(size=(n, d - 1))
    w_true = np.array([1.5, -2.0, 0.5])
    y = (x_raw @ w_true + 0.1 * rng.normal(size=n) > 0).astype(np.int8)
    x = np.column_stack([np.ones(n), x_raw])
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "x": pa.array(list(x), pa.list_(pa.float64())),
                  "y": pa.array(y, pa.int8())})
    ds = _ray.data.from_arrow(t).repartition(5)
    w, mu, sd, losses = _logreg_fit(ds, d, iters=25, lr=1.0)

    mu_l = x.mean(axis=0)
    sd_l = np.sqrt(np.maximum((x * x).mean(axis=0) - mu_l ** 2, 1e-12))
    mu_l[0], sd_l[0] = 0.0, 1.0
    xs = (x - mu_l) / sd_l
    xs[:, 0] = 1.0
    wl = np.zeros(d)
    ll = []
    yf = y.astype(np.float64)
    for _ in range(25):
        p = 1.0 / (1.0 + np.exp(-(xs @ wl)))
        eps = 1e-12
        ll.append(float(-np.mean(yf * np.log(p + eps)
                                 + (1 - yf) * np.log(1 - p + eps))))
        wl = wl - 1.0 * xs.T @ (p - yf) / n
    assert np.allclose(w, wl, atol=1e-9)
    assert np.allclose(losses, ll, atol=1e-9)
    acc = ((xs @ wl > 0) == (y == 1)).mean()
    assert acc > 0.9
    assert losses[-1] < losses[0]


def test_quality_classifier_e2e(ray_session):
    from risjbot_ray.pipelines.textstats import quality_classifier
    row = quality_classifier(SF, iters=15).to_pandas().iloc[0]
    assert row["check_ok"] == 1
    assert row["loss_final"] < row["loss_first"]
    assert row["accuracy"] >= row["base_rate"]
    assert row["n_docs"] > 0


def test_blocklist_filter_kernel():
    """Whole-word, case-insensitive, multi-hit counting against a
    hand-computed truth table; keep flag is the C4 any-hit drop."""
    from risjbot_ray.pipelines.textstats import blocklist_filter_batch
    texts = ["Spark and flink beat spark", "sorted is not sort",
             "merge sort merge", "clean text only", "", None]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = blocklist_filter_batch(t).to_pandas()
    assert out["n_engine"].tolist() == [3, 0, 0, 0, 0, 0]
    assert out["n_shuffle"].tolist() == [0, 1, 3, 0, 0, 0]
    assert out["n_blocked_total"].tolist() == [3, 1, 3, 0, 0, 0]
    assert out["keep"].tolist() == [False, False, False,
                                    True, True, True]


def test_mojibake_repair_kernel():
    """The strict round-trip heuristic: latin-1 and cp1252 mojibake
    are restored byte-for-byte; clean ASCII, clean accented text, and
    text with codepoints > U+00FF are never altered."""
    from risjbot_ray.pipelines.textstats import (MOJIBAKE_MARK,
                                                 fix_mojibake_batch)
    orig = "café №7 — naïve côté übung"
    latin = orig.encode("utf-8").decode("latin-1")
    cp = orig.encode("utf-8").decode("cp1252")
    # cp1252 cases whose continuation bytes ALL land in 0x80-0x9F
    # (mapped to specials OUTSIDE U+0080-U+00BF) — the prefilter gap
    # class: em dash and a German umlaut word
    dash_cp = "—".encode("utf-8").decode("cp1252")       # 'â€”'
    umlaut_cp = "Ärger".encode("utf-8").decode("cp1252")  # 'Ã„rger'
    clean_cases = ["plain ascii only", "café au lait — naïve",
                   "mixed € and ™ symbols", ""]
    cases = [latin, cp, dash_cp, umlaut_cp, orig] + clean_cases
    t = pa.table({"doc_id": pa.array(range(len(cases)), pa.int64()),
                  "text": pa.array(cases, pa.string())})
    out = fix_mojibake_batch(t)
    texts = out.column("text").to_pylist()
    rep = out.column("repaired").to_pylist()
    assert texts[0] == orig and rep[0] == 1
    assert texts[1] == orig and rep[1] == 1          # cp1252 variant
    assert texts[2] == "—" and rep[2] == 1
    assert texts[3] == "Ärger" and rep[3] == 1
    assert texts[4] == orig and rep[4] == 0          # already clean
    assert texts[5:] == clean_cases and rep[5:] == [0] * 4
    import re as _re
    for s in (latin, cp, dash_cp, umlaut_cp):
        assert _re.search(MOJIBAKE_MARK, s), s
    assert not _re.search(MOJIBAKE_MARK, "plain ascii")


def test_mojibake_properties():
    """Hypothesis properties of the repair heuristic: (a) latin-1
    corruption of ANY unicode text containing a multi-byte char is
    restored byte-for-byte; (b) pure-ASCII text is NEVER altered (no
    marker), and neither is text no mojibake codec can re-encode
    (both strict encodes fail, so the round trip can't start)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from risjbot_ray.pipelines.textstats import fix_mojibake_batch

    def run_one(s: str) -> tuple[str, int]:
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([s], pa.string())})
        out = fix_mojibake_batch(t)
        return (out.column("text").to_pylist()[0],
                out.column("repaired").to_pylist()[0])

    text_st = st.text(alphabet=st.characters(
        blacklist_categories=("Cs",)), min_size=0, max_size=80)

    @given(text_st)
    @settings(max_examples=150, deadline=None)
    def corrupt_restores(s):
        if not any(ord(c) > 0x7F for c in s):
            return                       # corruption is identity
        bad = s.encode("utf-8").decode("latin-1")
        fixed, rep = run_one(bad)
        assert fixed == s and rep == 1

    @given(st.text(alphabet=st.characters(max_codepoint=0x7F),
                   max_size=80))
    @settings(max_examples=100, deadline=None)
    def ascii_untouched(s):
        fixed, rep = run_one(s)
        assert fixed == s and rep == 0

    def _unencodable(s):
        for enc in ("latin-1", "cp1252"):
            try:
                s.encode(enc)
                return False
            except UnicodeEncodeError:
                continue
        return True

    @given(text_st.filter(_unencodable))
    @settings(max_examples=100, deadline=None)
    def unencodable_untouched(s):
        fixed, rep = run_one(s)
        assert fixed == s and rep == 0

    corrupt_restores()
    ascii_untouched()
    unencodable_untouched()


def test_mojibake_check_e2e(ray_session):
    from risjbot_ray.pipelines.textstats import q_mojibake_check
    row = q_mojibake_check(SF).to_pandas().iloc[0]
    assert row["n_docs"] > 0
    assert row["n_corrupted"] > 0
    assert row["n_repaired"] == row["n_corrupted"]
    assert row["n_mismatch"] == 0
    assert row["check_ok"] == 1


def test_lang_balance_and_split(ray_session, tmp_path):
    """Language balancing caps every language near the smallest
    language's size; the split assignment is deterministic, complete
    and ~90/5/5."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import (corpus_split,
                                               lang_balance_sample)

    langs = ["en"] * 400 + ["de"] * 100 + ["fr"] * 25
    t = pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": pa.array(["w " * 10] * len(langs), pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["src1"] * len(langs), pa.string()),
        "n_chars": pa.array([20] * len(langs), pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    df = lang_balance_sample(sf).to_pandas()
    by = df.groupby("lang")["doc_id"].count()
    assert by["fr"] == 25                      # rate 1.0: all kept
    # hash-threshold sampling is binomial around 25 for en/de
    assert 5 <= by["en"] <= 50 and 5 <= by["de"] <= 50
    assert (df["sample_key"] < 1.0).all()

    sp = corpus_split(sf).to_pandas()
    assert len(sp) == len(langs)
    frac = sp.groupby("split")["doc_id"].count() / len(langs)
    assert frac["train"] > 0.8
    assert frac.get("valid", 0) < 0.12 and frac.get("test", 0) < 0.12
    # deterministic: a second run assigns identical splits
    sp2 = corpus_split(sf).to_pandas()
    m = sp.merge(sp2, on="doc_id", suffixes=("", "_2"))
    assert (m["split"] == m["split_2"]).all()


def test_quality_rank_exact(ray_session, tmp_path):
    """Global ORDER BY rank matches a local argsort reference on a
    corpus large enough to force multiple range partitions (boundary
    rows must not collide or skip ranks)."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import quality_rank

    rng = np.random.default_rng(5)
    vocab = ["the", "and", "zq", "xv", "of", "kp"]
    texts = [" ".join(vocab[j] for j in rng.integers(0, 6, 40))
             for _ in range(3000)]
    texts += ["", "   "]                       # degenerate docs
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["src1"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = (quality_rank(str(tmp_path), nparts=16).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    assert got["rank"].tolist() == list(range(len(texts)))
    # reference ordering: score desc, doc_id asc
    ref = got.sort_values(["score", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    assert (ref["rank"].to_numpy() == np.arange(len(texts))).all()


def test_curate_corpus_checkpoint_resume(ray_session, tmp_path):
    """A resumed curation run with a COMPLETE gated checkpoint never
    re-reads the input corpus: after the first run the input parquet is
    REPLACED WITH GARBAGE, and the resumed run still reproduces the
    original output bit-for-bit from the checkpoint."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import curate_corpus

    rng = np.random.default_rng(11)
    stops = ["the", "and", "of", "to", "a"]
    texts = [" ".join(stops[j % 5] + f"w{j}" if j % 3 else stops[j % 5]
                      for j in rng.integers(0, 40, 60))
             for _ in range(300)]
    t = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 300, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(300)],
                           pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    docs = tmp_path / "documents.parquet"
    pq.write_table(t, str(docs))
    ckpt = str(tmp_path / "ckpt")

    first = (curate_corpus(str(tmp_path), checkpoint_dir=ckpt)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (tmp_path / "ckpt" / "gated.COMPLETE").exists()
    assert len(first) > 0

    # poison the input: resume MUST NOT touch it
    poison = pa.table({
        "doc_id": pa.array([999], pa.int64()),
        "text": pa.array(["poisoned"], pa.string()),
        "lang": pa.array(["xx"], pa.string()),
        "source": pa.array(["src0"], pa.string()),
        "n_chars": pa.array([8], pa.int64()),
    })
    pq.write_table(poison, str(docs))

    resumed = (curate_corpus(str(tmp_path), checkpoint_dir=ckpt)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert resumed.equals(first)


def test_hll_registers_reference():
    """Vectorized register fold matches a per-item bit_length
    reference on random hashes (index = top 12 bits, rho = leading
    zeros of the 52-bit suffix + 1)."""
    import hashlib as hl

    from risjbot_ray.pipelines.webtext import _HLL_P, _hll_registers

    items = [hl.md5(str(i).encode()).digest()[:8] for i in range(5000)]
    got = _hll_registers(b"".join(items))

    ref = np.zeros(1 << _HLL_P, dtype=np.uint8)
    for it in items:
        h = int.from_bytes(it, "big")
        idx = h >> (64 - _HLL_P)
        suffix = h & ((1 << (64 - _HLL_P)) - 1)
        rho = (64 - _HLL_P) - suffix.bit_length() + 1
        ref[idx] = max(ref[idx], rho)
    assert (got == ref).all()


def test_hll_distinct_bound(ray_session, tmp_path):
    """End-to-end sketch accuracy: 5,000 distinct texts duplicated to
    8,000 docs; the estimate must sit within the advertised 3-sigma
    bound and the self-check row must say so."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import hll_distinct

    texts = [f"unique document number {i} body" for i in range(5000)]
    texts += [texts[i % 5000] for i in range(3000)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["src1"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    row = hll_distinct(str(tmp_path)).to_pylist()[0]
    assert row["n_docs"] == 8000
    assert row["n_distinct_exact"] == 5000
    assert row["within_bound"]
    assert abs(row["n_distinct_hll"] - 5000) / 5000 <= 3 * 1.04 / 64


def test_tile_dedup_incremental_equivalence(ray_session, tmp_path):
    """Incremental dedup of shard A then shard B against a fresh
    ledger equals batch tile_dedup over A union B (A's doc_ids precede
    B's); fresh tiles are folded into the ledger between runs, and a
    ledger built with different parameters is rejected."""
    import pytest as _pytest

    from risjbot_ray.pipelines.webtext import (tile_dedup,
                                               tile_dedup_incremental)

    rng = np.random.default_rng(23)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    shared = " ".join(vocab[j] for j in rng.integers(0, 5, 16))
    rows_a, rows_b = [], []
    for i in range(50):
        n = int(rng.integers(0, 40))
        body = " ".join(vocab[j] for j in rng.integers(0, 5, n))
        rows_a.append((i, (shared + " " + body) if i % 4 == 0 else body))
    for i in range(50, 100):
        n = int(rng.integers(0, 40))
        body = " ".join(vocab[j] for j in rng.integers(0, 5, n))
        # half of B's planted dups collide with A's shared span
        rows_b.append((i, (shared + " " + body) if i % 3 == 0 else body))

    for d in ("a", "b", "all"):
        (tmp_path / d).mkdir()
    sfa = _write_docs(tmp_path / "a", rows_a)
    sfb = _write_docs(tmp_path / "b", rows_b)
    sfall = _write_docs(tmp_path / "all", rows_a + rows_b)

    full = (tile_dedup(sfall).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    ledger = str(tmp_path / "ledger")
    out_a = tile_dedup_incremental(sfa, ledger).to_pandas()
    out_b = tile_dedup_incremental(sfb, ledger).to_pandas()
    inc = (__import__("pandas").concat([out_a, out_b])
           .sort_values("doc_id").reset_index(drop=True))

    assert inc.equals(full)
    # some cross-shard dup actually exercised the ledger path
    assert (out_b["n_tiles_kept"] < out_b["n_tiles"]).any()

    with _pytest.raises(ValueError):
        tile_dedup_incremental(sfb, ledger, nbuckets=128)


def test_kmeans_embeddings_blobs(ray_session, tmp_path):
    """Distributed Lloyd's recovers 4 well-separated blobs exactly:
    the final cells partition the corpus into the blob sizes and the
    per-iteration total inertia is non-increasing."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.similarity import kmeans_embeddings

    rng = np.random.default_rng(3)
    centers = np.eye(4, 16) * 50.0            # far apart
    vecs, ids = [], []
    for b in range(4):
        for i in range(100):
            vecs.append((centers[b]
                         + rng.normal(0, 0.5, 16)).astype(np.float32))
            ids.append(b * 100 + i)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i // 100 for i in ids], pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    df = kmeans_embeddings(str(tmp_path), k=4, iters=6).to_pandas()
    assert df["inertia_monotone"].all()
    assert sorted(df["n_vectors"].tolist()) == [100, 100, 100, 100]
    # tight blobs: total inertia ~ n * d * sigma^2, far under the
    # inter-blob scale
    assert df["inertia"].sum() < 400 * 16 * 0.5 ** 2 * 2


def test_kmeans_check_planted(ray_session):
    """The driver-visible kmeans self-check row passes on its planted
    corpus: exact count recovery, inertia parity vs the local
    recompute, monotone inertia."""
    from risjbot_ray.pipelines.similarity import kmeans_check

    row = kmeans_check("unused").to_pylist()[0]
    assert row["n_count_mismatch"] == 0
    assert row["n_inertia_mismatch"] == 0
    assert row["inertia_monotone"] is True
    assert row["check_ok"] is True


def test_kmeans_embeddings_small_table(ray_session, tmp_path):
    """k larger than the table clamps to n (one centroid per vector,
    zero inertia); an empty table raises a usable error."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from risjbot_ray.pipelines.similarity import kmeans_embeddings

    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "embedding": pa.array(
            [(np.eye(5, 8)[i] * 10.0).tolist() for i in range(5)],
            pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    df = kmeans_embeddings(str(tmp_path), k=8, iters=3).to_pandas()
    assert len(df) == 5
    assert df["n_vectors"].tolist() == [1] * 5
    assert (df["inertia"] == 0.0).all()

    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    pq.write_table(t.slice(0, 0), str(empty_dir / "embeddings.parquet"))
    with _pytest.raises(ValueError, match="empty"):
        kmeans_embeddings(str(empty_dir), k=4)


def test_tile_dedup_union_fallback_matches_broadcast(
        ray_session, tmp_path, monkeypatch):
    """The dup-heavy fallback (union + doc-bucket rebuild) must
    produce exactly what the broadcast fast path produces; force it by
    zeroing the broadcast cutoff on the same adversarial corpus."""
    import math

    from risjbot_ray.pipelines import webtext
    from risjbot_ray.pipelines.webtext import tile_dedup

    rng = np.random.default_rng(29)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = []
    for i in range(50):
        n = int(rng.integers(0, 30))
        rows.append((i, " ".join(vocab[j]
                                 for j in rng.integers(0, 4, n))))
    rows.append((50, rows[7][1]))          # exact duplicate doc
    sf = _write_docs(tmp_path, rows)

    fast = (tile_dedup(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(webtext, "_BROADCAST_DROP_MAX", -1)
    slow = (tile_dedup(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert fast.equals(slow[fast.columns])


def test_minhash_pairs_join_fallback_matches_broadcast(
        ray_session, monkeypatch):
    """The distributed-join fallback for large pair sets must produce
    exactly what the broadcast fast path produces; force it by zeroing
    the broadcast cutoff."""
    from risjbot_ray.pipelines import dedup
    from risjbot_ray.pipelines.dedup import minhash_candidate_pairs

    fast = (minhash_candidate_pairs(SF).to_pandas()
            .sort_values(["a", "b"]).reset_index(drop=True))
    monkeypatch.setattr(dedup, "_BROADCAST_PAIRS_MAX", -1)
    slow = (minhash_candidate_pairs(SF).to_pandas()
            .sort_values(["a", "b"]).reset_index(drop=True))
    assert fast.equals(slow[fast.columns])
    assert len(fast) > 0


def test_bm25_planted_relevance(ray_session, tmp_path):
    """A document stuffed with the query terms must outrank documents
    that mention them once among filler; docs with no query term never
    appear. Scores re-derived with an in-test BM25 of the same
    (Lucene-idf, k1=1.2, b=0.75) formula."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.similarity import bm25_topk

    filler = "alpha beta gamma delta " * 30
    docs = {
        0: "vector hash join stream " * 10,          # dense in all terms
        1: filler + " vector hash",                   # two terms, once
        2: filler + " stream",                        # one term, once
        3: filler,                                    # no term
        4: filler + " join join join",                # one term, thrice
    }
    d = tmp_path / "bm"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }), d / "documents.parquet")

    res = bm25_topk(str(d), query="vector hash join stream", k=10)
    ids = res.column("doc_id").to_pylist()
    scores = res.column("score").to_pylist()

    assert 3 not in ids                  # no query term -> not candidate
    assert ids[0] == 0                   # stuffed doc ranks first
    assert set(ids) == {0, 1, 2, 4}
    assert scores == sorted(scores, reverse=True)

    # independent recompute of doc 2's score (single term 'stream')
    toks = {i: __import__("re").findall(r"[a-z0-9]+", t.lower())
            for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = sum(1 for t in toks.values() if "stream" in t)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    f = toks[2].count("stream")
    dl = len(toks[2])
    exp = idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
    got = dict(zip(ids, scores))[2]
    assert got == pytest.approx(round(exp, 5), abs=1e-9)


def test_stratified_sample_matches_reference(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import stratified_sample
    SF = "/root/testdata/sf0.001"
    k = 7
    got = stratified_sample(SF, k=k, group_col="lang").to_pandas()
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang"]).to_pandas()
    tbl["key"] = [hashlib.md5(f"{d}:strat".encode()).hexdigest()
                  for d in tbl["doc_id"]]
    exp = (tbl.sort_values(["lang", "key", "doc_id"], kind="mergesort")
              .groupby("lang").head(k))
    assert len(got) == len(exp)
    got_s = set(zip(got["doc_id"], got["grp"], got["sample_rank"]))
    exp_s = set()
    for lang, g in exp.groupby("lang"):
        for r, d in enumerate(
                g.sort_values(["key", "doc_id"])["doc_id"], 1):
            exp_s.add((d, lang, r))
    assert got_s == exp_s


def test_temperature_mix_matches_reference(ray_session):
    """Quotas follow the (n_d/N)^(1/tau) rule exactly (tau=1 gives
    natural proportions; tau<1 strictly upweights the smallest
    source's share) and per-source selection matches the md5-order
    local reference."""
    import hashlib

    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import temperature_mix
    SF = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "source"]).to_pandas()
    counts = tbl["source"].value_counts().sort_index()
    n_total = float(counts.sum())

    def quotas(tau, total):
        wt = (counts.to_numpy(np.float64) / n_total) ** tau
        return {s: int(np.floor(np.round(total * w / wt.sum(), 9)))
                for s, w in zip(counts.index, wt)}

    for tau in (0.7, 1.0):
        got = temperature_mix(SF, tau=tau, total=60).to_pandas()
        q = quotas(tau, 60)
        exp_s = set()
        for src, g in tbl.groupby("source"):
            g = g.copy()
            g["key"] = [hashlib.md5(f"{d}:tmix".encode()).hexdigest()
                        for d in g["doc_id"]]
            sel = g.sort_values(["key", "doc_id"]).head(q[src])
            for r, d in enumerate(sel["doc_id"], 1):
                exp_s.add((d, src, r))
        got_s = set(zip(got["doc_id"], got["source"],
                        got["sample_rank"]))
        assert got_s == exp_s and len(got_s) > 0

    # formula property on a skewed distribution (the sf corpus is
    # near-uniform, so tau barely moves its quotas): tau<1 strictly
    # upweights the small domain and downweights the dominant one
    def q_of(ns, tau, total):
        ns = np.asarray(ns, np.float64)
        wt = (ns / ns.sum()) ** tau
        return np.floor(np.round(total * wt / wt.sum(), 9))
    nat = q_of([800, 150, 50], 1.0, 500)
    hot = q_of([800, 150, 50], 0.5, 500)
    assert hot[2] > nat[2] and hot[0] < nat[0]


def test_domain_token_cap_matches_reference(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import domain_token_cap
    SF = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "source", "text"]).to_pandas()
    tbl["n_words"] = [len(t.split()) if t else 0 for t in tbl["text"]]
    tbl["key"] = [hashlib.md5(f"{d}:cap".encode()).hexdigest()
                  for d in tbl["doc_id"]]

    def reference(budget):
        out = {}
        for src, g in tbl.groupby("source"):
            g = g.sort_values(["key", "doc_id"], kind="mergesort")
            cum = g["n_words"].cumsum()
            keep = g[cum <= budget]
            for d, n, c in zip(keep["doc_id"], keep["n_words"],
                               cum[cum <= budget]):
                out[int(d)] = (src, int(n), int(c))
        return out

    # binding budget, boundary-heavy tiny budget, and a no-drop budget
    for budget in (700, 120, 10**9):
        got = domain_token_cap(SF, budget=budget).to_pandas()
        exp = reference(budget)
        assert len(got) == len(exp), budget
        for d, s, n, c in zip(got["doc_id"], got["source"],
                              got["n_words"], got["cum_words"]):
            assert exp[int(d)] == (s, int(n), int(c)), (budget, d)


def test_corpus_diff_all_statuses(ray_session):
    import ray

    from risjbot_ray.pipelines.webtext import corpus_diff
    a = ray.data.from_items([
        {"doc_id": 1, "text": "same"},
        {"doc_id": 2, "text": "old"},
        {"doc_id": 3, "text": "gone"},
        {"doc_id": 5, "text": ""},
    ]).repartition(2)
    b = ray.data.from_items([
        {"doc_id": 1, "text": "same"},      # unchanged -> absent
        {"doc_id": 2, "text": "new"},       # changed
        {"doc_id": 4, "text": "fresh"},     # added
        {"doc_id": 5, "text": ""},          # unchanged empty -> absent
    ]).repartition(2)
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(a, b).take_all()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_gopher_quality_discriminates(ray_session, tmp_path):
    """Real prose passes every Gopher rule; bullet spam, symbol spam
    and too-short docs each fail their specific rule."""
    from risjbot_ray.pipelines.textstats import q_gopher
    prose = ("the quick brown fox jumps over that lazy dog with great "
             "delight and it runs to be free of all the trouble it has "
             "seen before in its long and winding life near the river "
             "bank where tall green trees grow beside the old stone "
             "bridge that many travellers have crossed with heavy packs")
    bullets = "\n".join("• item number %d here" % i for i in range(10))
    hashes = " ".join("#tag%d" % i for i in range(60))
    sf = _write_docs(tmp_path, [
        (1, prose),
        (2, bullets),
        (3, hashes),
        (4, "too short to pass the gate"),
    ])
    df = q_gopher(sf).to_pandas().set_index("doc_id").sort_index()
    assert bool(df.loc[1, "pass_gopher"])
    assert df.loc[1, "n_req_stop"] >= 2
    assert not bool(df.loc[2, "pass_gopher"])
    assert df.loc[2, "bullet_ratio"] == 1.0
    assert not bool(df.loc[3, "pass_gopher"])
    assert df.loc[3, "symbol_ratio"] >= 0.1
    assert not bool(df.loc[4, "pass_gopher"])
    assert df.loc[4, "n_words"] < 50


def test_gopher_features_exact():
    """Feature values are exact int/int doubles on a hand-checked doc."""
    import pyarrow as pa

    from risjbot_ray.pipelines.textstats import gopher_quality_batch
    t = "ab cd…\n• x...\nthe be"
    out = gopher_quality_batch(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([t], pa.string())})).to_pandas().iloc[0]
    # words: ab cd… • x... the be (6); non-space chars 15
    assert out.n_words == 6
    assert out.mean_word_len == 15 / 6
    # symbols: one '…' + one '...' = 2
    assert out.symbol_ratio == 2 / 6
    assert out.bullet_ratio == 1 / 3       # the '• x...' line
    assert out.ellipsis_ratio == 2 / 3     # 'ab cd…' and '• x...'
    assert out.alpha_word_ratio == 5 / 6   # all but '•'
    assert out.n_req_stop == 2             # the, be
    assert not out.pass_gopher


def test_line_dedup_planted(ray_session, tmp_path):
    """Boilerplate head/tail lines (injected on doc_id % 3 / % 5) and a
    naturally repeated reflow line are dropped everywhere; unique lines
    survive; empty docs come back empty."""
    from risjbot_ray.pipelines.webtext import line_dedup
    first12 = ("alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lambda mu")
    sf = _write_docs(tmp_path, [
        (1, f"{first12} nu xi omicron"),
        (2, f"{first12} pi rho sigma"),
        (3, "tau upsilon phi"),
        (5, "chi psi omega"),
        (15, "digamma qoppa sampi"),
        (7, ""),
    ])
    df = line_dedup(sf).to_pandas().set_index("doc_id").sort_index()
    # shared 12-word reflow line dropped from both 1 and 2
    assert df.loc[1, "text_clean"] == "nu xi omicron"
    assert df.loc[2, "text_clean"] == "pi rho sigma"
    assert df.loc[1, "n_lines"] == 2 and df.loc[1, "n_dropped"] == 1
    # head boilerplate (docs 3 and 15) and tail (docs 5 and 15) dropped
    assert df.loc[3, "text_clean"] == "tau upsilon phi"
    assert df.loc[5, "text_clean"] == "chi psi omega"
    assert df.loc[15, "text_clean"] == "digamma qoppa sampi"
    assert df.loc[15, "n_lines"] == 3 and df.loc[15, "n_dropped"] == 2
    # empty doc: single blank line, kept (blank lines never participate)
    assert df.loc[7, "n_lines"] == 1 and df.loc[7, "n_dropped"] == 0
    assert df.loc[7, "text_clean"] == ""


def test_line_dedup_same_doc_repeat_kept(ray_session, tmp_path):
    """A line repeated only WITHIN one doc stays (distinct-doc
    semantics): max_docs counts documents, not occurrences."""
    from risjbot_ray.pipelines.webtext import line_dedup
    twelve = "one two three four five six seven eight nine ten eleven " \
             "twelve"
    sf = _write_docs(tmp_path, [
        (1, f"{twelve} {twelve}"),      # reflows to the same line twice
        (2, "entirely different words here"),
    ])
    df = line_dedup(sf).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_dropped"] == 0
    assert df.loc[1, "text_clean"] == f"{twelve}\n{twelve}"


def test_host_line_dedup_scoped_to_host(ray_session, tmp_path):
    """Per-host boilerplate scoping: a line recurring across two docs of
    host A is dropped from A only — the identical line on host B (one
    occurrence there) survives; injected host-branded boilerplate drops
    exactly on hosts where it recurs."""
    from risjbot_ray.pipelines.webtext import host_line_dedup
    first12 = ("alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lambda mu")
    sf = _write_docs(tmp_path, [
        (1, f"{first12} nu xi", "a.com"),       # shared reflow line on A
        (2, f"{first12} pi rho", "a.com"),      # shared reflow line on A
        (4, f"{first12} tau phi", "b.com"),     # same line, unique on B
        (3, "upsilon chi psi", "c.com"),        # %3: branded head on C
        (6, "omega digamma qoppa", "c.com"),    # %3: branded head on C
        (9, "sampi heta sho", "d.com"),         # %3: branded head on D
    ])
    df = host_line_dedup(sf).to_pandas().set_index("doc_id").sort_index()
    # the 12-word line recurs on a.com -> dropped there only
    assert df.loc[1, "text_clean"] == "nu xi"
    assert df.loc[2, "text_clean"] == "pi rho"
    assert df.loc[4, "text_clean"] == f"{first12}\ntau phi"
    assert df.loc[4, "n_dropped"] == 0
    # branded head recurs on c.com (docs 3 and 6) -> dropped on C...
    assert df.loc[3, "text_clean"] == "upsilon chi psi"
    assert df.loc[6, "text_clean"] == "omega digamma qoppa"
    # ...but doc 9 is d.com's ONLY %3 doc: its branded head is unique
    # within d.com and survives
    assert df.loc[9, "text_clean"] == \
        "Subscribe to the d.com newsletter\nsampi heta sho"
    assert df.loc[9, "n_dropped"] == 0
    assert (df["source"] == df.index.to_series().map(
        {1: "a.com", 2: "a.com", 4: "b.com", 3: "c.com",
         6: "c.com", 9: "d.com"})).all()


def test_host_line_dedup_shuffle_path_parity(ray_session, tmp_path):
    """The grouped-shuffle hot-set path (driver_merge_rows=0) and the
    driver-merge path agree row for row on a scoped corpus."""
    from risjbot_ray.pipelines.webtext import (host_line_dedup,
                                               hosted_lined_view_batch,
                                               line_dedup_over)
    import ray as _ray
    first12 = ("alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lambda mu")
    rows = [(i, f"{first12} tail{i % 4}",
             f"h{i % 3}.com") for i in range(1, 31)]
    sf = _write_docs(tmp_path, rows)
    a = (host_line_dedup(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    docs = (_ray.data.read_parquet(
                f"{sf}/documents.parquet",
                columns=["doc_id", "text", "source"])
            .map_batches(hosted_lined_view_batch, batch_format="pyarrow"))
    b = (line_dedup_over(docs, max_docs=1, driver_merge_rows=0,
                         scope_col="source").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    import pandas.testing as pdt
    pdt.assert_frame_equal(a, b)


def test_tfidf_topk_hand_computed(ray_session, tmp_path):
    """TF-IDF keywords against hand-computed values: tfidf =
    tf * ln(N/df) at 5dp; equal scores break to token ascending; empty
    docs emit nothing."""
    import math

    from risjbot_ray.pipelines.webtext import tfidf_topk
    sf = _write_docs(tmp_path, [
        (1, "apple apple banana"),
        (2, "apple cherry"),
        (3, "banana banana banana cherry"),
        (4, ""),
    ])
    df = (tfidf_topk(sf).to_pandas()
          .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    ln2_5 = round(math.log(2.0), 5)           # every df is 2 of N=4
    assert 4 not in set(df["doc_id"])         # empty doc: no rows
    d1 = df[df.doc_id == 1]
    assert list(d1.token) == ["apple", "banana"]
    assert list(d1.tfidf) == [round(2 * math.log(2.0), 5), ln2_5]
    assert list(d1.tf) == [2, 1] and list(d1.df) == [2, 2]
    # doc 2: identical scores -> token ascending breaks the tie
    d2 = df[df.doc_id == 2]
    assert list(d2.token) == ["apple", "cherry"]
    assert list(d2.tfidf) == [ln2_5, ln2_5]
    d3 = df[df.doc_id == 3]
    assert list(d3.token) == ["banana", "cherry"]
    assert list(d3.tfidf) == [round(3 * math.log(2.0), 5), ln2_5]
    assert list(df["rank"]) == [1, 2, 1, 2, 1, 2]


def test_url_filter_rules(ray_session, tmp_path):
    """URL gate truth table: blocked ads. host, soft-word score
    (sessionid 2.0 + utm_ 1.0 = 3.0 >= 2.5), deep path, and a clean
    keeper — with blocked_domain taking precedence over url_score when
    both fire."""
    from risjbot_ray.pipelines.webtext import url_filter
    sf = _write_docs(tmp_path, [
        (1, "clean doc", "news.example"),     # keep
        (23, "ad doc", "news.example"),       # ads. prefix -> blocked
        (17, "tracked doc", "news.example"),  # sessionid+utm_ -> 3.0
        (29, "deep doc", "news.example"),     # 9 path segments
        (391, "both doc", "news.example"),    # 23*17: blocked wins
    ])
    df = url_filter(sf).to_pandas().set_index("doc_id").sort_index()
    assert df.loc[1, "keep"] and df.loc[1, "reason"] == ""
    assert df.loc[1, "url"] == "https://news.example/en/article-1"
    assert df.loc[1, "host"] == "news.example"
    assert not df.loc[23, "keep"]
    assert df.loc[23, "reason"] == "blocked_domain"
    assert df.loc[23, "host"] == "ads.news.example"
    assert not df.loc[17, "keep"]
    assert df.loc[17, "reason"] == "url_score"
    assert df.loc[17, "url_score"] == 3.0
    assert not df.loc[29, "keep"]
    assert df.loc[29, "reason"] == "too_deep"
    assert df.loc[29, "n_segments"] == 9
    # query string never counts toward path segments
    assert df.loc[17, "n_segments"] == 2
    assert df.loc[391, "reason"] == "blocked_domain"
    assert df.loc[391, "url_score"] == 3.0


def test_c4_clean_rules(ray_session, tmp_path):
    """C4 line rules discriminate: punctuated >=5-word prose lines
    survive; unpunctuated, short and javascript lines are dropped;
    lorem-ipsum and brace docs are rejected wholesale."""
    import pyarrow as pa

    from risjbot_ray.pipelines.webtext import c4_clean_batch
    good = ("This is a proper first sentence of prose.\n"
            "Here comes another full sentence with enough words.\n"
            "And a third complete sentence closes the document.")
    mixed = ("no terminal punctuation on this line\n"
             "Too short.\n"
             "Please enable javascript to view this page.\n"
             "Only this well formed sentence actually survives here.")
    lorem = ("One proper sentence stands right here today.\n"
             "Lorem ipsum dolor sit amet, consectetur adipiscing elit.\n"
             "A third full sentence would otherwise keep the doc.")
    brace = "A sentence with code { return 0; } inside it stays not."
    out = c4_clean_batch(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([good, mixed, lorem, brace], pa.string()),
    })).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "keep_doc"]) and out.loc[1, "n_kept"] == 3
    assert out.loc[1, "text_clean"] == good
    assert out.loc[2, "n_kept"] == 1
    assert (out.loc[2, "text_clean"]
            == "Only this well formed sentence actually survives here.")
    assert not bool(out.loc[2, "keep_doc"])
    assert bool(out.loc[3, "has_lorem"]) and not bool(
        out.loc[3, "keep_doc"])
    assert bool(out.loc[4, "has_brace"]) and not bool(
        out.loc[4, "keep_doc"])


def test_c4_clean_e2e(ray_session, tmp_path):
    """End-to-end over the derived lined view: the injected boilerplate
    tail (ends in '.', 7 words) survives the line rules while the
    unpunctuated reflow lines drop."""
    from risjbot_ray.pipelines.webtext import c4_clean
    sf = _write_docs(tmp_path, [
        (5, "just a bag of words with no punctuation at all here"),
    ])
    df = c4_clean(sf).to_pandas().set_index("doc_id")
    assert df.loc[5, "n_kept"] == 1
    assert df.loc[5, "text_clean"] == \
        "All rights reserved. Terms of use apply."


def test_ccnet_buckets_terciles(ray_session, tmp_path):
    """CCNet bucketing: ranks are a 0..n-1 bijection PER LANGUAGE
    ordered by mean fixed-point NLL (ties doc_id), tercile sizes obey
    3r < n / 3r < 2n, and a gibberish doc lands in its language's
    tail while reference-slice prose lands in head."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.lm import ccnet_ppl_buckets
    fluent = ("the quick brown fox jumps over the lazy dog and then "
              "the dog sleeps near the quiet river all afternoon")
    rows = []
    for i in range(12):                       # en: 12 docs, ids 0..11
        # doc_id % 10 == 0 trains the LM -> fluent refs score low
        rows.append((i, fluent if i < 8 else
                     f"zzq{i} vvk{i} qqj{i} xxw{i} jjp{i} kkz{i}", "en"))
    for i in range(101, 106):                 # fr: 5 docs, none in the
        # doc_id % 10 == 0 reference slice
        rows.append((i, fluent if i > 102 else
                     f"qxz{i} wvu{i} ppl{i} mmn{i}", "fr"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = ccnet_ppl_buckets(str(tmp_path)).to_pandas()
    assert len(df) == len(rows)
    for lang, g in df.groupby("lang"):
        n = len(g)
        assert sorted(g["ppl_rank"]) == list(range(n))
        g = g.sort_values("ppl_rank")
        # ranks ascend with (avg nll, doc_id)
        key = list(zip(g["avg_nll_fp"], g["doc_id"]))
        assert key == sorted(key)
        want = ["head" if 3 * r < n else
                "middle" if 3 * r < 2 * n else "tail" for r in range(n)]
        assert list(g["bucket"]) == want
    by_id = df.set_index("doc_id")
    assert by_id.loc[0, "bucket"] == "head"        # the training ref
    assert by_id.loc[11, "bucket"] == "tail"       # en gibberish
    # fr gibberish docs tie exactly (every unseen bigram scores
    # ln(V)) -> doc_id order: 101 -> rank 3 (middle), 102 -> rank 4
    assert by_id.loc[101, "bucket"] == "middle"
    assert by_id.loc[102, "bucket"] == "tail"


def test_gram_duplication_planted(ray_session, tmp_path):
    """A 13-gram shared between two docs marks BOTH docs' positions hot;
    a unique doc and a short (<13 tokens) doc keep with zero dups."""
    from risjbot_ray.pipelines.webtext import gram_duplication
    shared = " ".join(f"w{i}" for i in range(20))    # 8 dup positions
    uniq = " ".join(f"u{i}" for i in range(20))
    sf = _write_docs(tmp_path, [
        (1, shared),
        (2, shared),                   # exact dup: all positions hot
        (3, uniq),                     # unique: no hot positions
        (4, "a b c"),                  # too short: no grams at all
        (5, "   "),                    # whitespace-only: no tokens
    ])
    df = (gram_duplication(sf).to_pandas()
          .set_index("doc_id").sort_index())
    assert df.loc[1, "n_grams"] == 8 and df.loc[1, "n_dup"] == 8
    assert not df.loc[1, "keep"] and not df.loc[2, "keep"]
    assert df.loc[3, "n_grams"] == 8 and df.loc[3, "n_dup"] == 0
    assert df.loc[3, "keep"]
    assert df.loc[4, "n_grams"] == 0 and df.loc[4, "keep"]
    assert df.loc[5, "n_grams"] == 0 and df.loc[5, "dup_ratio"] == 0.0
    assert df.loc[5, "keep"]


def test_gram_duplication_half_rule(ray_session, tmp_path):
    """The keep gate is the INTEGER rule 2*n_dup <= n_grams: exactly
    half duplicated keeps, one position past half drops."""
    from risjbot_ray.pipelines.webtext import gram_duplication
    shared = " ".join(f"s{i}" for i in range(13))    # 1 dup position
    sf = _write_docs(tmp_path, [
        # 14 tokens -> 2 grams, 1 hot (the shared prefix window is not
        # aligned: craft instead doc with shared 13-gram + 1 extra tok)
        (1, shared + " x1"),           # grams: [s0..s12],[s1..s12 x1]
        (2, shared + " y1"),           # shares only [s0..s12]
        (3, shared + " z1 z2"),        # 3 grams, 1 hot -> keep
    ])
    df = (gram_duplication(sf).to_pandas()
          .set_index("doc_id").sort_index())
    # docs 1,2: n_grams=2, n_dup=1 -> 2*1 <= 2 keeps (exactly half)
    assert df.loc[1, "n_grams"] == 2 and df.loc[1, "n_dup"] == 1
    assert df.loc[1, "keep"] and df.loc[2, "keep"]
    assert df.loc[3, "n_grams"] == 3 and df.loc[3, "n_dup"] == 1
    assert df.loc[3, "keep"]


def test_gram_duplication_shuffle_path_parity(ray_session, tmp_path):
    """driver_merge_rows=0 (bucketed shuffle reduce) returns the exact
    same table as the driver-merge fast path."""
    from risjbot_ray.pipelines.webtext import gram_duplication
    shared = " ".join(f"w{i}" for i in range(30))
    rows = [(i, shared if i % 3 == 0 else
             " ".join(f"t{i}_{j}" for j in range(25)))
            for i in range(12)]
    sf = _write_docs(tmp_path, rows)
    a = (gram_duplication(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (gram_duplication(sf, driver_merge_rows=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_domain_quality_filter_rules(ray_session, tmp_path):
    """min_docs drops small domains regardless of score; the tau gate
    splits domains by mean fixed-point score."""
    from risjbot_ray.pipelines.webtext import domain_quality_filter
    good = "the cat and the dog are in the house with a bird"  # alpha+stop high
    bad = "0123456789 0123456789 0123456789"                   # digits: low
    sf = _write_docs(tmp_path, [
        (1, good, "good.com"), (2, good, "good.com"),
        (3, good, "good.com"),
        (4, bad, "bad.com"), (5, bad, "bad.com"), (6, bad, "bad.com"),
        (7, good, "tiny.com"), (8, good, "tiny.com"),  # only 2 docs
    ])
    df = (domain_quality_filter(sf).to_pandas()
          .set_index("doc_id").sort_index())
    assert df.loc[1, "keep"] and df.loc[2, "keep"] and df.loc[3, "keep"]
    assert not df.loc[4, "keep"] and not df.loc[6, "keep"]
    assert not df.loc[7, "keep"] and not df.loc[8, "keep"]  # min_docs
    assert df.loc[7, "domain_n_docs"] == 2
    assert (df.loc[[1, 2, 3], "domain_mean_fp"]
            > df.loc[[4, 5, 6], "domain_mean_fp"].max()).all()


def test_quality_token_budget_order_and_ties(ray_session, tmp_path):
    """Cumulative token accounting follows (score desc, doc_id asc)
    exactly; the keep boundary is cum <= budget."""
    from risjbot_ray.pipelines.webtext import quality_token_budget
    hi = "the cat and the dog are here"       # 7 tokens, high score
    lo = "0123 4567 8901 2345 6789 0000 1111"  # 7 tokens, low score
    sf = _write_docs(tmp_path, [
        (2, hi), (1, hi),        # tie on score -> doc 1 ranks first
        (3, lo), (4, lo),
    ])
    df = (quality_token_budget(sf, budget=14).to_pandas()
          .set_index("doc_id").sort_index())
    # ordered: doc1 (cum 7), doc2 (14), doc3 (21), doc4 (28)
    assert df.loc[1, "cum_tokens"] == 7
    assert df.loc[2, "cum_tokens"] == 14
    assert df.loc[1, "keep"] and df.loc[2, "keep"]
    assert not df.loc[3, "keep"] and not df.loc[4, "keep"]
    assert df.loc[3, "cum_tokens"] + 7 == df.loc[4, "cum_tokens"]


def test_ws_token_hashes_python_split_parity():
    """The Arrow-side whitespace tokenizer counts exactly what
    ''.split() produces, across the nasty whitespace codepoints."""
    from risjbot_ray.pipelines.webtext import _ws_token_hashes
    cases = ["", "  ", "a", " a ", "a b　c", "x\x1c\x1dy",
             " start mid end ", "tab\tand\nnl",
             "\x85nel", "mixed  thin space"]
    th, lens = _ws_token_hashes(pa.array(cases, pa.string()), {})
    assert lens.tolist() == [len(c.split()) for c in cases]
    assert len(th) == sum(lens)
    # null text tokenizes as empty
    th2, lens2 = _ws_token_hashes(
        pa.array([None, "a b"], pa.string()), {})
    assert lens2.tolist() == [0, 2]


def test_nfc_normalize_kernel():
    """Decomposed sequences compose; ASCII and already-NFC rows pass
    through unchanged; the injector plants the suffix on doc_id%4==0."""
    import unicodedata

    from risjbot_ray.pipelines.textstats import (_NFC_SUFFIX,
                                                 nfc_normalize_batch)
    b = pa.table({
        "doc_id": pa.array([4, 1, 2], pa.int64()),
        "text": pa.array(["plain", "x̧́y", None], pa.string()),
    })
    out = nfc_normalize_batch(b).to_pandas().set_index("doc_id")
    # doc 4: ascii text + injected decomposed suffix -> composes
    want = "plain" + unicodedata.normalize("NFC", _NFC_SUFFIX)
    assert out.loc[4, "text_nfc"] == want
    assert out.loc[4, "changed"]
    assert out.loc[4, "n_chars_in"] - out.loc[4, "n_chars_nfc"] == 2
    # doc 1: combining marks on x have no composed form -> may reorder
    assert out.loc[1, "text_nfc"] == unicodedata.normalize(
        "NFC", "x̧́y")
    # doc 2: null text, no injection -> empty, unchanged
    assert out.loc[2, "text_nfc"] == "" and not out.loc[2, "changed"]


def test_curate_cascade_funnel_consistency(ray_session):
    """Funnel arithmetic is exact (n_out == n_in - n_dropped, chained),
    stage order is fixed, and each count matches the standalone
    operator run on the same corpus where the stage is first."""
    from risjbot_ray.pipelines.webtext import curate_cascade, url_filter
    t = curate_cascade(SF).to_pandas()
    assert list(t["stage"]) == ["url_filter", "gram_dup", "line_dedup",
                                "quality", "domain_quality",
                                "decontaminate"]
    for i in range(len(t)):
        assert t.loc[i, "n_out"] == t.loc[i, "n_in"] - t.loc[i, "n_dropped"]
        if i:
            assert t.loc[i, "n_in"] == t.loc[i - 1, "n_out"]
    # stage 1 must equal the standalone URL gate's keep count
    uf = url_filter(SF).to_pandas()
    assert t.loc[0, "n_out"] == int(uf["keep"].sum())
    assert (t["n_out"] > 0).all()     # the funnel never annihilates


def test_window_dedup_planted_spans(tmp_path):
    """Plant a shared 60-token span in three docs and a doc-internal
    repeat; exactly the covered tokens are removed, unique docs are
    untouched, and the rebuilt text is the space-joined survivors."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.webtext import window_dedup
    rng = np.random.default_rng(17)

    def words(n, tag):
        return [f"{tag}{i}x{rng.integers(1e6)}" for i in range(n)]

    span = " ".join(words(60, "dup"))
    docs = []
    for i in range(8):                       # unique docs
        docs.append((i, " ".join(words(120, f"u{i}_"))))
    for i in (100, 101, 102):                # shared planted span
        pre = " ".join(words(30, f"p{i}_"))
        post = " ".join(words(30, f"q{i}_"))
        docs.append((i, f"{pre} {span} {post}"))
    # doc-internal repeat: same 55-token run twice in one doc
    rep = " ".join(words(55, "rep"))
    docs.append((200, f"{rep} {' '.join(words(40, 'mid'))} {rep}"))
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = window_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    for i in range(8):                       # unique docs: untouched
        assert out.loc[i, "n_removed"] == 0
        assert out.loc[i, "text_kept"] == docs[i][1]
    for i in (100, 101, 102):
        # the 60-token span is covered by its 11 windows; boundary
        # tokens of pre/post can only be covered via windows crossing
        # into unique text, which never duplicate -> exactly 60 gone
        assert out.loc[i, "n_removed"] == 60, i
        assert out.loc[i, "n_dup_windows"] == 11
        kept = out.loc[i, "text_kept"].split(" ")
        assert len(kept) == 60 and not any(k.startswith("dup")
                                           for k in kept)
    # doc-internal repeat: both 55-token copies are duplicated windows
    assert out.loc[200, "n_removed"] == 110
    assert all(not k.startswith("rep")
               for k in out.loc[200, "text_kept"].split(" "))


def test_paragraph_dedup_drops_whole_blocks(ray_session):
    """Paragraph granularity: a recurring multi-line block is removed
    WHOLE, while the same first line standing alone elsewhere is a
    different unit and survives — the distinction line dedup cannot
    express."""
    import ray

    from risjbot_ray.pipelines import webtext as wt

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [
            "unique one\n\nSHARED A\nSHARED B\n\ntail one",
            "other text\n\nSHARED A\nSHARED B",
            "SHARED A\n\nsolo",
        ]})
    out = wt.line_dedup_over(
        ray.data.from_arrow(docs), sep="\n\n",
        blank_chars=wt._PARA_BLANK, count_col="n_paras")
    rows = {r["doc_id"]: r for r in out.take_all()}
    assert rows[1]["text_clean"] == "unique one\n\ntail one"
    assert rows[1]["n_paras"] == 3 and rows[1]["n_dropped"] == 1
    assert rows[2]["text_clean"] == "other text"
    # 'SHARED A' alone is a different paragraph than the 2-line block
    assert rows[3]["text_clean"] == "SHARED A\n\nsolo"
    assert rows[3]["n_dropped"] == 0


def test_paragraph_view_boundaries():
    """The derived view writes single internal newlines flanked by
    words, so '\n\n' occurs exactly at paragraph boundaries; empty
    docs become one blank paragraph."""
    from risjbot_ray.pipelines import webtext as wt

    b = pa.table({"doc_id": pa.array([1, 3, 5], pa.int64()),
                  "text": ["w" + " w" * 25, None, "a b"]})
    out = wt.para_view_batch(b).column("text").to_pylist()
    # 26 words -> 24-word para (two 12-word lines) + 2-word para
    p = out[0].split("\n\n")
    assert len(p) == 2 and p[0].count("\n") == 1
    assert len(p[0].split()) == 24 and len(p[1].split()) == 2
    assert "\n\n\n" not in out[0]
    # doc 3: empty text -> [''] then the %3 head paragraph
    assert out[1] == wt._PARA_HEAD + "\n\n"
    # doc 5: %5 footer appended
    assert out[2] == "a b\n\n" + wt._PARA_TAIL


def test_bloom_dedup_first_wins_and_in_call_collapse(ray_session):
    """Sharded Bloom test-and-set: exactly ONE occurrence of each
    distinct paragraph survives corpus-wide, including when both
    occurrences arrive in the SAME actor call (the within-call
    collapse path); unique paragraphs and blanks always survive."""
    import collections

    import ray

    from risjbot_ray.pipelines import webtext as wt

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["only one\n\nDUP PARA\nsecond line",
                 "DUP PARA\nsecond line\n\nother",
                 "DUP PARA\nsecond line"]})
    out = wt.bloom_dedup_over(
        ray.data.from_arrow(docs), n_shards=1).take_all()
    kept = collections.Counter()
    for r in out:
        for p in (r["text_clean"] or "").split("\n\n"):
            if p.strip(" \t\r\n"):
                kept[p] += 1
    assert kept["DUP PARA\nsecond line"] == 1
    assert kept["only one"] == 1 and kept["other"] == 1
    assert sum(r["n_dropped"] for r in out) == 2
    assert [r["n_paras"] for r in
            sorted(out, key=lambda r: r["doc_id"])] == [2, 2, 1]


def test_bloom_dedup_false_drop_accounting(ray_session):
    """With a deliberately saturated filter (256 bits for hundreds of
    distinct paragraphs) the approximate semantics MUST show up as
    false drops — never as duplicate survivors or invented text. This
    pins the failure mode the self-check's bound guards."""
    import collections

    import ray

    from risjbot_ray.pipelines import webtext as wt

    n = 400
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": [f"unique paragraph number {i} with payload" for i in
                 range(n)]})
    # 8 blocks so later test-and-set calls probe an already-populated
    # filter (a single block would collapse everything in one call
    # against empty shards and never exercise saturation)
    out = wt.bloom_dedup_over(
        ray.data.from_arrow(docs).repartition(8),
        n_bits=256, n_shards=2).take_all()
    kept = collections.Counter()
    for r in out:
        for p in (r["text_clean"] or "").split("\n\n"):
            if p.strip(" \t\r\n"):
                kept[p] += 1
    exact = {f"unique paragraph number {i} with payload"
             for i in range(n)}
    assert set(kept) <= exact                 # nothing invented
    assert all(c == 1 for c in kept.values())  # at most one survivor
    assert len(kept) < n                      # saturation really bit


def test_bloom_prior_snapshot_readonly(ray_session):
    """build_bloom_over(A) + readonly probe of B: paragraphs shared
    with A drop in every occurrence, fresh paragraphs keep ALL their
    copies (read-only mode must not dedup within B)."""
    import ray

    from risjbot_ray.pipelines import webtext as wt

    a = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["OLD PARA\n\nboth have this",
                           "another old"]})
    b = pa.table({"doc_id": pa.array([10, 11, 12], pa.int64()),
                  "text": ["OLD PARA\n\nfresh thing",
                           "fresh thing\n\nboth have this",
                           "fresh thing"]})
    priors = wt.build_bloom_over(ray.data.from_arrow(a), n_shards=4)
    out = {r["doc_id"]: r for r in wt.bloom_dedup_over(
        ray.data.from_arrow(b), n_shards=4, priors=priors,
        readonly=True).take_all()}
    assert out[10]["text_clean"] == "fresh thing"
    assert out[11]["text_clean"] == "fresh thing"
    assert out[12]["text_clean"] == "fresh thing"   # all 3 copies kept
    assert out[10]["n_dropped"] == 1 and out[11]["n_dropped"] == 1
    assert out[12]["n_dropped"] == 0
    # non-readonly with the same priors DOES dedup within B too:
    # exactly one 'fresh thing' survives across the three docs
    out2 = wt.bloom_dedup_over(
        ray.data.from_arrow(b), n_shards=4, priors=priors).take_all()
    kept = sum((r["text_clean"] or "").split("\n\n").count("fresh thing")
               for r in out2)
    assert kept == 1


def test_ann_pq_recall_and_determinism():
    from risjbot_ray.pipelines.similarity import ann_pq_topk, ann_topk
    exact = set(ann_topk(SF, query_ids=[0], k=10)
                .to_pandas()["vec_id"])
    out = ann_pq_topk(SF, query_ids=[0], k=10)
    approx = set(out.to_pandas()["vec_id"])
    assert len(exact & approx) >= 6   # the documented >=0.6 contract
    assert out.equals(ann_pq_topk(SF, query_ids=[0], k=10))
    assert 0 not in approx            # query row excluded
    # m is a real tunable, not only the int64-packing special case
    out4 = ann_pq_topk(SF, query_ids=[0], k=10, m=4)
    exact4 = set(out4.to_pandas()["vec_id"])
    assert len(exact & exact4) >= 5   # coarser codes, still useful


def test_ann_pq_matches_numpy_reference():
    """Full-pipeline parity with a local numpy implementation of the
    same fit/encode/ADC/rerank algorithm (same sample order, same
    seed, same ties) — pins the per-batch partial-top-C merge."""
    import pyarrow.parquet as pq

    from risjbot_ray.pipelines.similarity import (_pq_encode, _pq_train,
                                                  _unit, ann_pq_topk)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    unit = _unit(np.stack([np.asarray(v, dtype=np.float64)
                           for v in t.column("embedding").to_pylist()]))
    m, ks, C, k, qid = 8, 16, 100, 10, 1
    books = _pq_train(unit[:4096], m, ks, iters=5, seed=7)
    cb = _pq_encode(unit, books)
    dsub = unit.shape[1] // m
    qi = int(np.where(ids == qid)[0][0])
    dist = np.zeros(len(ids))
    for j in range(m):
        tbl = ((unit[qi, j * dsub:(j + 1) * dsub][None, :]
                - books[j]) ** 2).sum(-1)
        dist += tbl[cb[:, j]]
    mask = ids != qid
    order = np.lexsort((ids[mask], dist[mask]))[:C]
    cand = ids[mask][order]
    pos = {int(v): i for i, v in enumerate(ids)}
    sims = np.array([float(unit[pos[int(v)]] @ unit[qi])
                     for v in cand])
    topo = np.lexsort((cand, -sims))[:k]
    exp = [(int(cand[j]), round(float(sims[j]), 5)) for j in topo]
    got = [(r["vec_id"], r["cosine"]) for r in
           ann_pq_topk(SF, query_ids=[qid], k=k).to_pylist()]
    assert got == exp


def test_unit_dedup_kernel_identity_property(ray_session):
    """Property gate for the generalized unit-dedup kernel all three
    granularities share: with max_docs high enough that nothing is
    hot, the rebuild must reproduce every text EXACTLY for arbitrary
    content, at both '\n' and '\n\n' separators."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray

    from risjbot_ray.pipelines import webtext as wt

    texts_strategy = st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=80),
        min_size=1, max_size=6)

    @given(texts_strategy)
    @settings(max_examples=25, deadline=None)
    def check(texts):
        docs = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())})
        for sep, blank in (("\n", wt._LINE_BLANK),
                           ("\n\n", wt._PARA_BLANK)):
            out = {r["doc_id"]: r for r in wt.line_dedup_over(
                ray.data.from_arrow(docs), max_docs=10**9,
                sep=sep, blank_chars=blank).take_all()}
            for i, t in enumerate(texts):
                assert out[i]["n_dropped"] == 0
                assert out[i]["text_clean"] == t, (sep, repr(t))

    check()
