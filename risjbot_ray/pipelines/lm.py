"""CCNet-style n-gram language-model perplexity scoring over the
``documents`` table (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020 — public method:
score each document's perplexity under a small LM trained on a
REFERENCE corpus, then filter/bucket by the score).

The LM here is an add-one-smoothed word-bigram model trained on a
deterministic reference slice of the corpus (``doc_id % ref_mod == 0``
— at 100 TB the reference side is the SMALL bounded corpus by design,
exactly as CCNet trains on Wikipedia, never on the crawl itself):

    p(w2 | w1) = (C(w1 w2) + 1) / (C(w1) + V)

with V = distinct reference unigrams; a document's score is
``log_ppl = mean(-ln p)`` over its bigrams (0.0 for docs with < 2
tokens). Simple enough to admit an EXACT DuckDB oracle, real enough to
rank fluent text above gibberish.

Scale shape: training is one combiner-pre-aggregated groupby per gram
order over the bounded reference slice; the packed model (sorted
uint64 gram-hash arrays + int64 counts — md5-grade hashing, same
exactness class as the decontamination gram set) is ``ray.put`` ONCE
and read zero-copy from plasma by every scoring actor; scoring itself
is an embarrassingly parallel ``map_batches`` with no exchange at all.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray

from .webtext import _GRAM_MULT, _coalesce_for_exchange, _token_h64

_WORD_RE = re.compile(r"[a-z0-9]+")
_TOKEN_CACHE_MAX = 1 << 20


def _words(text: str | None) -> list[str]:
    return _WORD_RE.findall(text.lower()) if text else []


# --------------------------------------------------------------------------
# training: reference-slice gram counts -> packed broadcast model
# --------------------------------------------------------------------------

def _gram_count_batch(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch unigram and bigram counts, emitted as
    (order, gram, n) rows — bigrams space-joined (word tokens cannot
    contain spaces). Pre-aggregation bounds the shuffle by the batch
    vocabulary, not the token count."""
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    for t in batch.column("text").to_pylist():
        ws = _words(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            g = a + " " + b
            bi[g] = bi.get(g, 0) + 1
    orders = [1] * len(uni) + [2] * len(bi)
    grams = sorted(uni) + sorted(bi)
    ns = [uni[g] for g in sorted(uni)] + [bi[g] for g in sorted(bi)]
    return pa.table({"ord": pa.array(orders, pa.int8()),
                     "gram": pa.array(grams, pa.string()),
                     "n": pa.array(ns, pa.int64())})


class BigramLM:
    """Packed add-one bigram LM: sorted uint64 hash arrays + counts.
    Hashes follow webtext's gram scheme (md5 token hash, Horner
    combine) so lookups are two vectorized searchsorteds per doc."""

    def __init__(self, uni: dict[str, int], bi: dict[str, int]):
        cache: dict[str, int] = {}
        self.v = len(uni)
        uh = np.fromiter((_token_h64(w, cache) for w in uni),
                         dtype=np.uint64, count=len(uni))
        un = np.fromiter(uni.values(), dtype=np.int64, count=len(uni))
        o = np.argsort(uh, kind="stable")
        self.uni_h, self.uni_n = uh[o], un[o]
        bh = np.empty(len(bi), np.uint64)
        bn = np.empty(len(bi), np.int64)
        for i, (g, n) in enumerate(bi.items()):
            a, b = g.split(" ")
            bh[i] = (np.uint64(_token_h64(a, cache)) * _GRAM_MULT
                     + np.uint64(_token_h64(b, cache)))
            bn[i] = n
        o = np.argsort(bh, kind="stable")
        self.bi_h, self.bi_n = bh[o], bn[o]

    def packed(self) -> tuple:
        return (self.v, self.uni_h, self.uni_n, self.bi_h, self.bi_n)


def _lookup(sorted_h: np.ndarray, sorted_n: np.ndarray,
            vals: np.ndarray) -> np.ndarray:
    """Counts for ``vals`` (0 where absent) via searchsorted."""
    out = np.zeros(len(vals), np.int64)
    if len(sorted_h) and len(vals):
        pos = np.searchsorted(sorted_h, vals)
        pos[pos == len(sorted_h)] = len(sorted_h) - 1
        hit = sorted_h[pos] == vals
        out[hit] = sorted_n[pos[hit]]
    return out


def train_bigram_lm(sf_dir: str, ref_mod: int = 10) -> BigramLM:
    """Count grams over the reference slice (one combiner groupby) and
    pack the model on the driver (bounded by the reference vocab)."""
    from ray.data.aggregate import Sum

    def _ref_slice(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % ref_mod == 0))

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_ref_slice, batch_format="pyarrow", zero_copy_batch=True)
    partial = docs.map_batches(_gram_count_batch, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = _coalesce_for_exchange(partial).groupby(["ord", "gram"]) \
        .aggregate(Sum("n", alias_name="n"))
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    for t in ray.get(agg.to_arrow_refs()):
        for o, g, n in zip(t.column("ord").to_pylist(),
                           t.column("gram").to_pylist(),
                           t.column("n").to_pylist()):
            (uni if o == 1 else bi)[g] = n
    return BigramLM(uni, bi)


# --------------------------------------------------------------------------
# scoring: broadcast model, zero-exchange map
# --------------------------------------------------------------------------

class PerplexityScorer:
    """Actor-pool stage: (doc_id, text) -> (doc_id, n_bigrams,
    log_ppl). The packed model arrives as ONE object ref — ray.get in
    ``__init__`` is a zero-copy plasma read per actor, never per
    batch."""

    def __init__(self, model_ref):
        self.v, self.uni_h, self.uni_n, self.bi_h, self.bi_n = \
            ray.get(model_ref)
        self.cache: dict[str, int] = {}

    def _doc(self, text: str | None) -> tuple[int, float]:
        ws = _words(text)
        m = len(ws)
        if m < 2:
            return 0, 0.0
        if len(self.cache) >= _TOKEN_CACHE_MAX:
            self.cache.clear()
        th = np.fromiter((_token_h64(w, self.cache) for w in ws),
                         dtype=np.uint64, count=m)
        cu = _lookup(self.uni_h, self.uni_n, th[:-1])
        cb = _lookup(self.bi_h, self.bi_n,
                     th[:-1] * _GRAM_MULT + th[1:])
        nll = np.log(cu + float(self.v)) - np.log(cb + 1.0)
        return m - 1, float(nll.mean())

    def __call__(self, batch: pa.Table) -> pa.Table:
        res = [self._doc(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array([r[0] for r in res], pa.int64()),
            "log_ppl": pa.array([r[1] for r in res], pa.float64()),
        })


def perplexity_score(sf_dir: str, ref_mod: int = 10,
                     model: BigramLM | None = None) -> "ray.data.Dataset":
    """Train on the reference slice (unless ``model`` given), broadcast
    once, score every document."""
    if model is None:
        model = train_bigram_lm(sf_dir, ref_mod=ref_mod)
    ref = ray.put(model.packed())
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(PerplexityScorer, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=(1, 8))


# --------------------------------------------------------------------------
# DSIR importance weighting (Xie et al., "Data Selection for Language
# Models via Importance Resampling", NeurIPS 2023 — public method)
# --------------------------------------------------------------------------
#
# Each document gets a log importance weight: the bag-of-bigram
# log-likelihood ratio between a TARGET distribution (the reference
# slice — DSIR's "formal text" side) and the RAW corpus distribution,
#
#   log w(doc) = sum_f [ ln p_tgt(f) - ln p_raw(f) ]
#
# with add-one smoothing, p(f) = (C(f) + 1) / (N + V).
#
# Two feature spaces:
#  * n_buckets=None — features are EXACT bigrams. SQL-expressible
#    (the `doc_dsir_weight` oracle), but the model is bounded by the
#    raw corpus's bigram vocabulary: a TEST/ORACLE configuration.
#  * n_buckets=B — DSIR's real formulation: bigrams hashed into B
#    buckets, model = two dense length-B int arrays regardless of
#    corpus size. This is the 100-TB path (the paper uses B=10k);
#    gated by exact parity with a local numpy reference in pytest.


def _dsir_count_batch(batch: pa.Table, ref_mod: int) -> pa.Table:
    """Combiner: per-batch bigram counts split into raw/target columns
    so ONE groupby serves both distributions (target is a subset of
    raw, so raw rows always dominate the exchange)."""
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    for did, t in zip(batch.column("doc_id").to_pylist(),
                      batch.column("text").to_pylist()):
        ws = _words(t)
        is_tgt = did % ref_mod == 0
        for a, b in zip(ws, ws[1:]):
            g = a + " " + b
            raw[g] = raw.get(g, 0) + 1
            if is_tgt:
                tgt[g] = tgt.get(g, 0) + 1
    grams = sorted(raw)
    return pa.table({
        "gram": pa.array(grams, pa.string()),
        "n_raw": pa.array([raw[g] for g in grams], pa.int64()),
        "n_tgt": pa.array([tgt.get(g, 0) for g in grams], pa.int64()),
    })


class DSIRModel:
    """Packed likelihood-ratio model. Exact mode: sorted uint64 bigram
    hashes with aligned (c_tgt, c_raw). Bucketed mode: two dense
    length-B count arrays (direct indexing, no searchsorted)."""

    def __init__(self, counts: dict[str, tuple[int, int]],
                 n_buckets: int | None = None):
        self.n_buckets = n_buckets
        self.v = n_buckets if n_buckets else len(counts)
        self.n_tgt = sum(t for t, _ in counts.values())
        self.n_raw = sum(r for _, r in counts.values())
        cache: dict[str, int] = {}

        def gh(g: str) -> int:
            # Python-int arithmetic masked to 64 bits: same wraparound
            # as the vectorized uint64 Horner, without numpy's scalar
            # overflow warnings
            a, b = g.split(" ")
            return ((_token_h64(a, cache) * int(_GRAM_MULT)
                     + _token_h64(b, cache)) & 0xFFFFFFFFFFFFFFFF)

        if n_buckets:
            ct = np.zeros(n_buckets, np.int64)
            cr = np.zeros(n_buckets, np.int64)
            for g, (t, r) in counts.items():
                i = gh(g) % n_buckets
                ct[i] += t
                cr[i] += r
            self.h, self.c_tgt, self.c_raw = None, ct, cr
        else:
            h = np.fromiter((gh(g) for g in counts), dtype=np.uint64,
                            count=len(counts))
            ct = np.fromiter((t for t, _ in counts.values()),
                             dtype=np.int64, count=len(counts))
            cr = np.fromiter((r for _, r in counts.values()),
                             dtype=np.int64, count=len(counts))
            o = np.argsort(h, kind="stable")
            self.h, self.c_tgt, self.c_raw = h[o], ct[o], cr[o]

    def packed(self) -> tuple:
        return (self.n_buckets, self.v, self.n_tgt, self.n_raw,
                self.h, self.c_tgt, self.c_raw)


def train_dsir(sf_dir: str, ref_mod: int = 10,
               n_buckets: int | None = None) -> DSIRModel:
    from ray.data.aggregate import Sum
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    partial = docs.map_batches(_dsir_count_batch, batch_format="pyarrow",
                               zero_copy_batch=True,
                               fn_kwargs={"ref_mod": ref_mod})
    agg = _coalesce_for_exchange(partial).groupby("gram").aggregate(
        Sum("n_tgt", alias_name="n_tgt"), Sum("n_raw", alias_name="n_raw"))
    counts: dict[str, tuple[int, int]] = {}
    for t in ray.get(agg.to_arrow_refs()):
        for g, nt, nr in zip(t.column("gram").to_pylist(),
                             t.column("n_tgt").to_pylist(),
                             t.column("n_raw").to_pylist()):
            counts[g] = (nt, nr)
    return DSIRModel(counts, n_buckets=n_buckets)


class DSIRScorer:
    """Actor-pool stage: (doc_id, text) -> (doc_id, n_feats,
    log_weight); model read zero-copy from plasma once per actor."""

    def __init__(self, model_ref):
        (self.n_buckets, self.v, self.n_tgt, self.n_raw,
         self.h, self.c_tgt, self.c_raw) = ray.get(model_ref)
        # constant per-feature offset: ln(N_raw + V) - ln(N_tgt + V)
        self.offset = (np.log(self.n_raw + float(self.v))
                       - np.log(self.n_tgt + float(self.v)))
        self.cache: dict[str, int] = {}

    def _doc(self, text: str | None) -> tuple[int, float]:
        ws = _words(text)
        m = len(ws)
        if m < 2:
            return 0, 0.0
        if len(self.cache) >= _TOKEN_CACHE_MAX:
            self.cache.clear()
        th = np.fromiter((_token_h64(w, self.cache) for w in ws),
                         dtype=np.uint64, count=m)
        gh = th[:-1] * _GRAM_MULT + th[1:]
        if self.n_buckets:
            idx = (gh % np.uint64(self.n_buckets)).astype(np.int64)
            ct, cr = self.c_tgt[idx], self.c_raw[idx]
        else:
            ct = _lookup(self.h, self.c_tgt, gh)
            cr = _lookup(self.h, self.c_raw, gh)
        lr = np.log(ct + 1.0) - np.log(cr + 1.0) + self.offset
        return m - 1, float(lr.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        res = [self._doc(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_feats": pa.array([r[0] for r in res], pa.int64()),
            "log_weight": pa.array([r[1] for r in res], pa.float64()),
        })


def dsir_score(sf_dir: str, ref_mod: int = 10,
               n_buckets: int | None = None,
               model: DSIRModel | None = None) -> "ray.data.Dataset":
    """Train the likelihood-ratio model (unless given), broadcast once,
    score every document with its DSIR log importance weight."""
    if model is None:
        model = train_dsir(sf_dir, ref_mod=ref_mod, n_buckets=n_buckets)
    ref = ray.put(model.packed())
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(DSIRScorer, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=(1, 8))


def dsir_resample(sf_dir: str, k: int = 100, ref_mod: int = 10,
                  n_buckets: int | None = None,
                  model: DSIRModel | None = None) -> "ray.data.Dataset":
    """Importance RESAMPLING via the Gumbel-top-k trick (sampling k
    docs without replacement with probability proportional to their
    importance weight == taking the top k of ``log_weight + Gumbel
    noise``). The per-doc Gumbel variate is derived from a
    deterministic integer-hash uniform of ``doc_id`` — reproducible
    across runs and expressible in the SQL oracle (no RNG state).

    Scale shape: each batch keeps only its local top-k, so the final
    exact sort+limit sees at most k rows per block, never the corpus."""

    def _key_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = ((ids % 1048573) * 2654435761 + 12345) % 4294967296
        u = (x.astype(np.float64) + 0.5) / 4294967296.0
        key = (batch.column("log_weight").to_numpy(zero_copy_only=False)
               - np.log(-np.log(u)))
        t = batch.append_column("sample_key",
                                pa.array(key, pa.float64()))
        if t.num_rows > k:
            t = t.take(np.argsort(-key, kind="stable")[:k])
        return t

    scores = dsir_score(sf_dir, ref_mod=ref_mod, n_buckets=n_buckets,
                        model=model)
    part = scores.select_columns(["doc_id", "log_weight"]).map_batches(
        _key_batch, batch_format="pyarrow", zero_copy_batch=True)
    return part.sort(["sample_key", "doc_id"],
                     descending=[True, False]).limit(k)
