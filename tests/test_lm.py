"""Perplexity-scoring gates: the hash-packed distributed pipeline must
match a string-dict local reference exactly (catches hash-packing
bugs), and a fluent/gibberish corpus must rank the way a bigram LM
should."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.pipelines.lm import (BigramLM, PerplexityScorer, _words,
                                      perplexity_score, train_bigram_lm)

SF = "/root/testdata/sf0.001"


def _local_reference(texts_by_id, ref_mod=10):
    """Pure string-dict implementation — no hashing, no numpy lookup."""
    uni, bi = {}, {}
    for did, t in texts_by_id.items():
        if did % ref_mod != 0:
            continue
        ws = _words(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for did, t in texts_by_id.items():
        ws = _words(t)
        if len(ws) < 2:
            out[did] = (0, 0.0)
            continue
        nll = [math.log(uni.get(a, 0) + v) - math.log(bi.get((a, b), 0) + 1)
               for a, b in zip(ws, ws[1:])]
        out[did] = (len(nll), float(np.mean(nll)))
    return out


def test_pipeline_matches_string_reference(ray_session):
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    exp = _local_reference(texts)
    got = perplexity_score(SF).to_pandas()
    assert len(got) == len(exp)
    for did, nb, lp in zip(got["doc_id"], got["n_bigrams"],
                           got["log_ppl"]):
        enb, elp = exp[int(did)]
        assert enb == int(nb)
        assert abs(elp - float(lp)) < 1e-9


def test_fluent_scores_below_gibberish():
    # train on fluent text; a shuffled-word doc must score strictly
    # higher (its bigrams are unseen even though its unigrams are not)
    fluent = ("the cat sat on the mat and the dog sat on the rug "
              "while the cat saw the dog and the dog saw the cat") * 3
    rng = np.random.default_rng(3)
    words = _words(fluent)
    gib = " ".join(rng.permutation(words).tolist())
    uni, bi = {}, {}
    ws = _words(fluent)
    for w in ws:
        uni[w] = uni.get(w, 0) + 1
    for a, b in zip(ws, ws[1:]):
        bi[a + " " + b] = bi.get(a + " " + b, 0) + 1
    lm = BigramLM(uni, bi)
    scorer = PerplexityScorer.__new__(PerplexityScorer)
    scorer.v, scorer.uni_h, scorer.uni_n, scorer.bi_h, scorer.bi_n = \
        lm.packed()
    scorer.cache = {}
    _, lp_fluent = scorer._doc(fluent)
    _, lp_gib = scorer._doc(gib)
    assert lp_fluent < lp_gib
    # an empty / single-token doc is defined as (0, 0.0)
    assert scorer._doc("") == (0, 0.0)
    assert scorer._doc("word") == (0, 0.0)


def test_model_packing_roundtrip():
    uni = {"a": 3, "b": 1, "c": 2}
    bi = {"a b": 2, "b c": 1}
    lm = BigramLM(uni, bi)
    v, uh, un, bh, bn = lm.packed()
    assert v == 3
    assert list(np.sort(uh)) == list(uh)  # sorted for searchsorted
    assert list(np.sort(bh)) == list(bh)
    assert int(un.sum()) == 6 and int(bn.sum()) == 3


def test_dsir_bucketed_matches_local_reference(ray_session):
    """Hashed-bucket scale path == local numpy reference with the same
    hashing (catches bucket-fold and packing bugs)."""
    import math

    from risjbot_ray.pipelines.lm import (_GRAM_MULT, _token_h64,
                                          dsir_score)
    B = 64
    got = dsir_score(SF, n_buckets=B).to_pandas()
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    cache = {}
    ct = np.zeros(B, np.int64)
    cr = np.zeros(B, np.int64)

    def buckets(t):
        ws = _words(t)
        th = np.fromiter((_token_h64(w, cache) for w in ws),
                         dtype=np.uint64, count=len(ws))
        if len(ws) < 2:
            return np.empty(0, np.int64)
        return ((th[:-1] * _GRAM_MULT + th[1:])
                % np.uint64(B)).astype(np.int64)

    docs = list(zip(tbl.column("doc_id").to_pylist(),
                    tbl.column("text").to_pylist()))
    for did, t in docs:
        bs = buckets(t)
        np.add.at(cr, bs, 1)
        if did % 10 == 0:
            np.add.at(ct, bs, 1)
    off = math.log(cr.sum() + float(B)) - math.log(ct.sum() + float(B))
    exp = {}
    for did, t in docs:
        bs = buckets(t)
        exp[did] = (len(bs), float((np.log(ct[bs] + 1.0)
                                    - np.log(cr[bs] + 1.0) + off).sum())
                    if len(bs) else 0.0)
    for did, nf, lw in zip(got["doc_id"], got["n_feats"],
                           got["log_weight"]):
        enf, elw = exp[int(did)]
        assert enf == int(nf)
        assert abs(elw - float(lw)) < 1e-9


def test_dsir_ranks_target_like_docs_higher():
    """A doc made of target-slice bigrams must outweigh a doc of
    bigrams that appear only off-target."""
    from risjbot_ray.pipelines.lm import DSIRModel, DSIRScorer
    tgt_text = "solar panels convert sunlight into clean energy " * 5
    raw_text = "casino bonus spins win jackpot deposit now " * 5
    counts = {}
    for text, is_tgt in ((tgt_text, True), (raw_text, False)):
        ws = _words(text)
        for a, b in zip(ws, ws[1:]):
            g = a + " " + b
            t0, r0 = counts.get(g, (0, 0))
            counts[g] = (t0 + (1 if is_tgt else 0), r0 + 1)
    for n_buckets in (None, 32):
        model = DSIRModel(counts, n_buckets=n_buckets)
        s = DSIRScorer.__new__(DSIRScorer)
        (s.n_buckets, s.v, s.n_tgt, s.n_raw,
         s.h, s.c_tgt, s.c_raw) = model.packed()
        s.offset = (np.log(s.n_raw + float(s.v))
                    - np.log(s.n_tgt + float(s.v)))
        s.cache = {}
        _, w_tgt = s._doc("solar panels convert sunlight")
        _, w_raw = s._doc("casino bonus spins win")
        assert w_tgt > w_raw
        assert s._doc("") == (0, 0.0)


def test_train_bigram_lm_counts(ray_session):
    lm = train_bigram_lm(SF, ref_mod=10)
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    n_uni = 0
    seen = set()
    total = 0
    for did, t in zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()):
        if did % 10 == 0:
            ws = _words(t)
            seen.update(ws)
            total += len(ws)
    assert lm.v == len(seen)
    assert int(lm.uni_n.sum()) == total


def test_bigramlm_dict_construction_emits_no_overflow_warnings():
    """Scalar uint64 Horner arithmetic used to warn ('overflow
    encountered in scalar multiply') on essentially every bigram; the
    masked Python-int path must be warning-free and agree with the
    vectorized hashes."""
    import warnings

    from risjbot_ray.pipelines.lm import BigramLM
    uni = {"the": 5, "cat": 3, "sat": 2}
    bi = {"the cat": 3, "cat sat": 2}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m = BigramLM(uni, bi)
    assert m.v == 3 and len(m.bi_h) == 2


# --------------------------------------------------------------------------
# interpolated trigram LM
# --------------------------------------------------------------------------

def _trigram_local_reference(texts: dict, lambdas=(0.2, 0.3, 0.5)):
    """Independent pure-dict implementation of the interpolated
    trigram LM (no shared kernels beyond the tokenizer contract)."""
    import collections
    import math
    l1, l2, l3 = lambdas
    uni = collections.Counter()
    bi = collections.Counter()
    tri = collections.Counter()
    for d, t in texts.items():
        if d % 10 != 0:
            continue
        ws = _words(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
        tri.update(zip(ws, ws[1:], ws[2:]))
    n, v = sum(uni.values()), len(uni)
    out = {}
    for d, t in texts.items():
        ws = _words(t)
        if len(ws) < 3:
            out[d] = (0, 0.0)
            continue
        s = 0.0
        m = 0
        for w1, w2, w3 in zip(ws, ws[1:], ws[2:]):
            a = tri[(w1, w2, w3)] / bi[(w1, w2)] \
                if bi[(w1, w2)] else 0.0
            b = bi[(w2, w3)] / uni[w2] if uni[w2] else 0.0
            u = (uni[w3] + 1) / float(n + v)
            s += -math.log(l3 * a + l2 * b + l1 * u)
            m += 1
        out[d] = (m, s / m)
    return out


def test_trigram_pipeline_matches_local_reference(ray_session):
    from risjbot_ray.pipelines.lm import trigram_perplexity_score
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    exp = _trigram_local_reference(texts)
    got = trigram_perplexity_score(SF).to_pandas()
    assert len(got) == len(exp)
    for did, nt, lp in zip(got["doc_id"], got["n_trigrams"],
                           got["log_ppl"]):
        ent, elp = exp[int(did)]
        assert ent == int(nt)
        assert abs(elp - float(lp)) < 1e-9, did


def test_trigram_prefers_fluent_over_shuffled():
    """Train on fluent text: the shuffled-word doc loses the trigram
    AND bigram interpolation terms, so it must score strictly
    higher; short docs are defined as (0, 0.0)."""
    from risjbot_ray.pipelines.lm import (TrigramLM,
                                          TrigramPerplexityScorer,
                                          _batch_bigram_hashes,
                                          _batch_token_hashes,
                                          _batch_trigram_hashes)
    fluent = ("the cat sat on the mat and the dog sat on the rug "
              "while the cat saw the dog and the dog saw the cat") * 3
    rng = np.random.default_rng(5)
    gib = " ".join(rng.permutation(_words(fluent)).tolist())
    th, lens = _batch_token_hashes(
        pa.array([fluent], pa.string()), {})
    uh, un = np.unique(th, return_counts=True)
    gh, _, _ = _batch_bigram_hashes(th, lens)
    bh, bn = np.unique(gh, return_counts=True)
    t3 = _batch_trigram_hashes(th, lens)[0]
    th3, tn3 = np.unique(t3, return_counts=True)
    lm = TrigramLM.from_hashed(uh, un, bh, bn, th3, tn3)
    sc = TrigramPerplexityScorer.__new__(TrigramPerplexityScorer)
    (sc.v, sc.n_tokens, sc.lambdas, sc.uni_h, sc.uni_n,
     sc.bi_h, sc.bi_n, sc.tri_h, sc.tri_n) = lm.packed()
    sc.cache = {}
    out = sc(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                       "text": [fluent, gib, "two words"]}))
    lp = dict(zip(out.column("doc_id").to_pylist(),
                  out.column("log_ppl").to_pylist()))
    nt = dict(zip(out.column("doc_id").to_pylist(),
                  out.column("n_trigrams").to_pylist()))
    assert lp[1] < lp[2]
    assert nt[3] == 0 and lp[3] == 0.0
