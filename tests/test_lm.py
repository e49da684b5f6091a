"""Perplexity-scoring gates: the hash-packed distributed pipeline must
match a string-dict local reference exactly (catches hash-packing
bugs), and a fluent/gibberish corpus must rank the way a bigram LM
should."""

import math

import numpy as np
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
