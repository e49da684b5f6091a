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

Scale shape: training is a vectorized per-batch gram-hash combiner
followed by a tree-combine (distributed merge over coalesced blocks,
driver final merge — NO shuffle; the merged table is the broadcast
model, bounded by the reference vocabulary, so it must fit on the
driver regardless); the packed model (sorted uint64 gram-hash arrays
+ int64 counts — md5-grade hashing, same exactness class as the
decontamination gram set) is ``ray.put`` ONCE and read zero-copy from
plasma by every scoring actor; scoring itself is an embarrassingly
parallel whole-batch-vectorized ``map_batches`` with no exchange.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import ray

from .webtext import _GRAM_MULT, _coalesce_for_exchange, _token_h64

_TOKEN_CACHE_MAX = 1 << 20


def _words(text: str | None) -> list[str]:
    """Scalar twin of the Arrow batch tokenizer — implemented THROUGH
    the same kernels (1-element array) so the two paths cannot diverge
    on case mappings where Python's full lower() and Arrow's simple
    one disagree (e.g. U+0130 'İ': Python inserts a combining dot that
    splits the token, Arrow does not). The engine-wide tokenization
    contract is the ARROW behavior; the SQL oracles agree wherever
    lower() is a 1:1 mapping (all driver corpora)."""
    if not text:
        return []
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pa.array([text], pa.string())), "[^a-z0-9]+")
    return [t for t in toks[0].as_py() if t]


def _batch_token_hashes(texts, cache: dict
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch tokenizer: all word-token hashes flattened
    across the batch plus per-doc token counts. Tokenization is
    Arrow-side (lower + RE2 split on ``[^a-z0-9]+`` == the `_words`
    findall, modulo boundary empties which are dropped); md5 hashing
    touches only the per-batch DICTIONARY (unique tokens), never the
    token stream — the hot loop is all numpy takes."""
    import pyarrow.compute as pc
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), "[^a-z0-9]+")
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    empty = pc.equal(pc.utf8_length(flat), 0)
    emp_np = empty.to_numpy(zero_copy_only=False)
    if emp_np.any():
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        lens = lens - np.bincount(doc_idx[emp_np], minlength=len(lens))
        flat = flat.filter(pc.invert(empty))
    if len(flat) == 0:
        return np.empty(0, np.uint64), lens
    de = flat.dictionary_encode()
    if len(cache) >= _TOKEN_CACHE_MAX:
        cache.clear()
    vocab_h = np.fromiter(
        (_token_h64(w, cache) for w in de.dictionary.to_pylist()),
        dtype=np.uint64, count=len(de.dictionary))
    return vocab_h[de.indices.to_numpy(zero_copy_only=False)], lens


def _batch_bigram_hashes(th: np.ndarray, lens: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bigram Horner hashes, owning doc index, first-token hashes)
    for a flattened token stream — pairs that straddle a document
    boundary are dropped."""
    if len(th) < 2:
        e = np.empty(0, np.uint64)
        return e, np.empty(0, np.int64), e
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    valid = doc_idx[:-1] == doc_idx[1:]
    w1 = th[:-1][valid]
    return ((th[:-1] * _GRAM_MULT + th[1:])[valid],
            doc_idx[:-1][valid], w1)


# --------------------------------------------------------------------------
# training: reference-slice gram counts -> packed broadcast model
# --------------------------------------------------------------------------

_GRAM_CACHE: dict = {}


def _merge_counts(batch: pa.Table, key_col: str,
                  count_cols: tuple[str, ...]) -> pa.Table:
    """Vectorized combine of partial (key, counts...) tables:
    np.unique on the key + bincount sums — no sort-based groupby.
    Exact: int64 counts summed in float64 stay exact below 2^53."""
    k = batch.column(key_col).to_numpy(zero_copy_only=False)
    u, inv = np.unique(k, return_inverse=True)
    cols = {key_col: pa.array(u, pa.int64())}
    for c in count_cols:
        n = batch.column(c).to_numpy(zero_copy_only=False)
        cols[c] = pa.array(
            np.bincount(inv, weights=n, minlength=len(u)).astype(
                np.int64), pa.int64())
    return pa.table(cols)


def _agg_count_partials(partial: "ray.data.Dataset", merge_fn
                        ) -> pa.Table | None:
    """Tree-combine partial count tables: one distributed merge pass
    over the coalesced blocks (whole-block batches), then a driver
    final merge. Replaces a groupby exchange — the merged table is
    the broadcast model's contents, bounded by the reference / bucket
    vocabulary, so it must fit on the driver regardless; the
    intermediate level bounds what the driver ingests to
    ~n_coalesced_blocks x vocab rows."""
    comb = _coalesce_for_exchange(partial).map_batches(
        merge_fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    parts = [t for t in ray.get(comb.to_arrow_refs()) if t.num_rows]
    if not parts:
        return None
    return merge_fn(pa.concat_tables(parts))


def _gram_count_batch(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch unigram and bigram counts, emitted as
    (order, gram-HASH, n) rows — the md5/Horner hashes the packed
    model keys on anyway, so the exchange never carries strings and
    the hashing work is already done when rows reach the driver.
    Pre-aggregation bounds the shuffle by the batch vocabulary, not
    the token count. Hashes ride as int64 views (same bits)."""
    th, lens = _batch_token_hashes(batch.column("text"), _GRAM_CACHE)
    uh, un = np.unique(th, return_counts=True)
    gh, _, _ = _batch_bigram_hashes(th, lens)
    bh, bn = np.unique(gh, return_counts=True)
    return pa.table({
        "ord": pa.array([1] * len(uh) + [2] * len(bh), pa.int8()),
        "gh": pa.array(np.concatenate(
            [uh.view(np.int64), bh.view(np.int64)]), pa.int64()),
        "n": pa.array(np.concatenate([un, bn]), pa.int64()),
    })


def _merge_gram_counts(batch: pa.Table) -> pa.Table:
    """Per-order merge of (ord, gh, n) partials — unigram and bigram
    hash namespaces are kept separate, as the groupby on (ord, gh)
    they replace did."""
    ords = batch.column("ord").to_numpy(zero_copy_only=False)
    out = []
    for o in (1, 2):
        sub = batch.filter(pa.array(ords == o))
        m = _merge_counts(sub, "gh", ("n",))
        out.append(m.add_column(0, "ord", pa.array(
            np.full(m.num_rows, o, np.int8), pa.int8())))
    return pa.concat_tables(out)


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
            # Python-int arithmetic masked to 64 bits: same wraparound
            # as the vectorized uint64 Horner, without numpy's scalar
            # overflow warnings (same hazard DSIRModel.gh avoids)
            bh[i] = ((_token_h64(a, cache) * int(_GRAM_MULT)
                      + _token_h64(b, cache)) & 0xFFFFFFFFFFFFFFFF)
            bn[i] = n
        o = np.argsort(bh, kind="stable")
        self.bi_h, self.bi_n = bh[o], bn[o]

    @classmethod
    def from_hashed(cls, uni_h: np.ndarray, uni_n: np.ndarray,
                    bi_h: np.ndarray, bi_n: np.ndarray) -> "BigramLM":
        """Build directly from (hash, count) arrays — the distributed
        trainer's path; V = distinct unigram hashes (== distinct
        words at md5-64 collision odds)."""
        m = cls.__new__(cls)
        m.v = len(uni_h)
        o = np.argsort(uni_h, kind="stable")
        m.uni_h, m.uni_n = uni_h[o], uni_n[o]
        o = np.argsort(bi_h, kind="stable")
        m.bi_h, m.bi_n = bi_h[o], bi_n[o]
        return m

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
    """Count grams over the reference slice (vectorized combiner +
    tree-combine, no shuffle) and pack the model on the driver
    (bounded by the reference vocab)."""

    def _ref_slice(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % ref_mod == 0))

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_ref_slice, batch_format="pyarrow", zero_copy_batch=True)
    partial = docs.map_batches(_gram_count_batch, batch_format="pyarrow",
                               zero_copy_batch=True)
    t = _agg_count_partials(partial, _merge_gram_counts)
    if t is None:
        # an empty model would score every doc log(0) = -inf (and give
        # DSIR a NaN offset) — fail loudly at train time instead
        raise ValueError(
            f"train_bigram_lm: reference slice doc_id % {ref_mod} == 0 "
            "contains no tokens — widen ref_mod or check the corpus")
    ords = t.column("ord").to_numpy(zero_copy_only=False)
    gh = t.column("gh").to_numpy(zero_copy_only=False).view(np.uint64)
    n = t.column("n").to_numpy(zero_copy_only=False)
    u = ords == 1
    return BigramLM.from_hashed(gh[u], n[u], gh[~u], n[~u])


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
        """Whole-batch vectorized scoring: one tokenize pass, one
        bigram-hash pass, two searchsorted lookups over the batch's
        entire bigram stream, then per-doc segment sums via bincount —
        no per-document Python loop."""
        th, lens = _batch_token_hashes(batch.column("text"), self.cache)
        gh, doc_idx, w1 = _batch_bigram_hashes(th, lens)
        ndocs = len(lens)
        cu = _lookup(self.uni_h, self.uni_n, w1)
        cb = _lookup(self.bi_h, self.bi_n, gh)
        nll = np.log(cu + float(self.v)) - np.log(cb + 1.0)
        n_bi = np.bincount(doc_idx, minlength=ndocs)
        tot = np.bincount(doc_idx, weights=nll, minlength=ndocs)
        log_ppl = np.divide(tot, n_bi, out=np.zeros(ndocs, np.float64),
                            where=n_bi > 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array(n_bi.astype(np.int64), pa.int64()),
            "log_ppl": pa.array(log_ppl, pa.float64()),
        })


def perplexity_score(sf_dir: str, ref_mod: int = 10,
                     model: BigramLM | None = None,
                     concurrency=None) -> "ray.data.Dataset":
    """Train on the reference slice (unless ``model`` given), broadcast
    once, score every document. ``concurrency`` defaults to a FIXED
    pool (``webtext.fixed_pool``) — an autoscaling pool ramps on the
    critical path (bench: 9.4 s -> 3.9 s at 100k docs)."""
    if concurrency is None:
        from risjbot_ray.pipelines.webtext import fixed_pool
        concurrency = fixed_pool()
    if model is None:
        model = train_bigram_lm(sf_dir, ref_mod=ref_mod)
    ref = ray.put(model.packed())
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(PerplexityScorer, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=concurrency)


# --------------------------------------------------------------------------
# interpolated TRIGRAM LM (Jelinek-Mercer fixed-weight interpolation,
# Jelinek & Mercer 1980; the order KenLM-based CCNet filters actually
# run at is 5 — this is the same recursive-mixture family at order 3,
# the largest order whose exact count joins stay SQL-checkable):
#
#   p(w3 | w1 w2) = l3*C(w1w2w3)/C(w1w2) + l2*C(w2w3)/C(w2)
#                   + l1*(C(w3)+1)/(N+V)
#
# ML ratios are 0 when their context count is 0; the add-one unigram
# floor keeps p > 0 always. Same scale shape as the bigram LM: counts
# tree-combine (no shuffle), packed model broadcast once, scoring is a
# zero-exchange vectorized map.
# --------------------------------------------------------------------------

_JM_LAMBDAS = (0.2, 0.3, 0.5)      # (l1 uni, l2 bi, l3 tri)


def _batch_trigram_hashes(th: np.ndarray, lens: np.ndarray):
    """Per trigram position (w1 w2 w3) of a flattened token stream:
    (trigram Horner hash, context-bigram hash C(w1w2), inner-bigram
    hash C(w2w3), w2 hash, w3 hash, owning doc index). Positions that
    straddle a document boundary are dropped."""
    if len(th) < 3:
        e = np.empty(0, np.uint64)
        return e, e, e, e, e, np.empty(0, np.int64)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    valid = (doc_idx[:-2] == doc_idx[1:-1]) & (doc_idx[:-2] == doc_idx[2:])
    w1, w2, w3 = th[:-2][valid], th[1:-1][valid], th[2:][valid]
    h12 = w1 * _GRAM_MULT + w2
    return (h12 * _GRAM_MULT + w3, h12, w2 * _GRAM_MULT + w3,
            w2, w3, doc_idx[:-2][valid])


def _gram3_count_batch(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch unigram / bigram / trigram counts as
    (order, gram-hash, n) rows — the order-2 combiner extended one
    level; the exchange stays bounded by the batch vocabulary."""
    th, lens = _batch_token_hashes(batch.column("text"), _GRAM_CACHE)
    uh, un = np.unique(th, return_counts=True)
    gh, _, _ = _batch_bigram_hashes(th, lens)
    bh, bn = np.unique(gh, return_counts=True)
    t3, _, _, _, _, _ = _batch_trigram_hashes(th, lens)
    th3, tn3 = np.unique(t3, return_counts=True)
    return pa.table({
        "ord": pa.array([1] * len(uh) + [2] * len(bh) + [3] * len(th3),
                        pa.int8()),
        "gh": pa.array(np.concatenate(
            [uh.view(np.int64), bh.view(np.int64), th3.view(np.int64)]),
            pa.int64()),
        "n": pa.array(np.concatenate([un, bn, tn3]), pa.int64()),
    })


def _merge_gram3_counts(batch: pa.Table) -> pa.Table:
    """Per-order merge of (ord, gh, n) partials for orders 1-3."""
    ords = batch.column("ord").to_numpy(zero_copy_only=False)
    out = []
    for o in (1, 2, 3):
        sub = batch.filter(pa.array(ords == o))
        m = _merge_counts(sub, "gh", ("n",))
        out.append(m.add_column(0, "ord", pa.array(
            np.full(m.num_rows, o, np.int8), pa.int8())))
    return pa.concat_tables(out)


class TrigramLM:
    """Packed interpolated trigram LM: sorted uint64 hash arrays +
    counts per order, V = distinct reference unigrams, N = total
    reference tokens."""

    @classmethod
    def from_hashed(cls, uni_h, uni_n, bi_h, bi_n, tri_h, tri_n,
                    lambdas=_JM_LAMBDAS) -> "TrigramLM":
        m = cls.__new__(cls)
        m.v = len(uni_h)
        m.n_tokens = int(uni_n.sum())
        for name, h, n in (("uni", uni_h, uni_n), ("bi", bi_h, bi_n),
                           ("tri", tri_h, tri_n)):
            o = np.argsort(h, kind="stable")
            setattr(m, f"{name}_h", h[o])
            setattr(m, f"{name}_n", n[o])
        m.lambdas = tuple(lambdas)
        return m

    def packed(self) -> tuple:
        return (self.v, self.n_tokens, self.lambdas,
                self.uni_h, self.uni_n, self.bi_h, self.bi_n,
                self.tri_h, self.tri_n)


def train_trigram_lm(sf_dir: str, ref_mod: int = 10,
                     lambdas=_JM_LAMBDAS) -> TrigramLM:
    """Count orders 1-3 over the reference slice (combiner +
    tree-combine, no shuffle), pack on the driver (bounded by the
    reference vocabulary — the CCNet posture: the reference corpus is
    the small, curated side at any scale)."""

    def _ref_slice(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % ref_mod == 0))

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_ref_slice, batch_format="pyarrow",
                  zero_copy_batch=True)
    partial = docs.map_batches(_gram3_count_batch,
                               batch_format="pyarrow",
                               zero_copy_batch=True)
    t = _agg_count_partials(partial, _merge_gram3_counts)
    if t is None:
        raise ValueError(
            f"train_trigram_lm: reference slice doc_id % {ref_mod} == 0 "
            "contains no tokens — widen ref_mod or check the corpus")
    ords = t.column("ord").to_numpy(zero_copy_only=False)
    gh = t.column("gh").to_numpy(zero_copy_only=False).view(np.uint64)
    n = t.column("n").to_numpy(zero_copy_only=False)
    return TrigramLM.from_hashed(
        gh[ords == 1], n[ords == 1], gh[ords == 2], n[ords == 2],
        gh[ords == 3], n[ords == 3], lambdas=lambdas)


class TrigramPerplexityScorer:
    """Actor-pool stage: (doc_id, text) -> (doc_id, n_trigrams,
    log_ppl) under the packed interpolated trigram LM (one plasma read
    per actor). Whole-batch vectorized: one tokenize pass, one
    trigram-hash pass, five searchsorted lookups over the batch's
    entire trigram stream, per-doc means via bincount."""

    def __init__(self, model_ref):
        (self.v, self.n_tokens, self.lambdas,
         self.uni_h, self.uni_n, self.bi_h, self.bi_n,
         self.tri_h, self.tri_n) = ray.get(model_ref)
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        l1, l2, l3 = self.lambdas
        th, lens = _batch_token_hashes(batch.column("text"), self.cache)
        h3, h12, h23, u2, u3, doc_idx = _batch_trigram_hashes(th, lens)
        ndocs = len(lens)
        c3 = _lookup(self.tri_h, self.tri_n, h3)
        c12 = _lookup(self.bi_h, self.bi_n, h12)
        c23 = _lookup(self.bi_h, self.bi_n, h23)
        cu2 = _lookup(self.uni_h, self.uni_n, u2)
        cu3 = _lookup(self.uni_h, self.uni_n, u3)
        # ML ratios, 0 where the context is unseen; the guarded
        # denominator never changes a taken branch's value
        tri = np.where(c12 > 0, c3 / np.maximum(c12, 1), 0.0)
        bi = np.where(cu2 > 0, c23 / np.maximum(cu2, 1), 0.0)
        uni = (cu3 + 1.0) / float(self.n_tokens + self.v)
        nll = -np.log(l3 * tri + l2 * bi + l1 * uni)
        n_tri = np.bincount(doc_idx, minlength=ndocs)
        tot = np.bincount(doc_idx, weights=nll, minlength=ndocs)
        log_ppl = np.divide(tot, n_tri,
                            out=np.zeros(ndocs, np.float64),
                            where=n_tri > 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_trigrams": pa.array(n_tri.astype(np.int64), pa.int64()),
            "log_ppl": pa.array(log_ppl, pa.float64()),
        })


def trigram_perplexity_score(sf_dir: str, ref_mod: int = 10,
                             model: TrigramLM | None = None,
                             concurrency=None) -> "ray.data.Dataset":
    """Train the interpolated trigram LM on the reference slice
    (unless ``model`` given), broadcast once, score every document —
    fixed actor pool, zero-exchange scoring pass."""
    if concurrency is None:
        from risjbot_ray.pipelines.webtext import fixed_pool
        concurrency = fixed_pool()
    if model is None:
        model = train_trigram_lm(sf_dir, ref_mod=ref_mod)
    ref = ray.put(model.packed())
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(TrigramPerplexityScorer,
                            fn_constructor_args=(ref,),
                            batch_format="pyarrow",
                            concurrency=concurrency)


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


def _dsir_count_batch(batch: pa.Table, ref_mod: int,
                      n_buckets: int | None) -> pa.Table:
    """Combiner: per-batch bigram-HASH counts split into raw/target
    columns so ONE combine pass serves both distributions (target is
    a subset of raw, so raw rows always dominate). Fully vectorized:
    tokenize once, np.unique for raw, bincount of the inverse for the
    target subset. In bucketed mode the hash is folded to its bucket
    HERE, so every partial is bounded by B rows — the 100-TB path
    never materializes the raw bigram vocabulary anywhere."""
    th, lens = _batch_token_hashes(batch.column("text"), _GRAM_CACHE)
    gh, doc_idx, _ = _batch_bigram_hashes(th, lens)
    if n_buckets:
        gh = gh % np.uint64(n_buckets)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    uniq, inv, n_raw = np.unique(gh, return_inverse=True,
                                 return_counts=True)
    tgt_pair = (ids % ref_mod == 0)[doc_idx] if len(gh) \
        else np.empty(0, bool)
    n_tgt = np.bincount(inv[tgt_pair], minlength=len(uniq)) \
        if len(uniq) else np.empty(0, np.int64)
    return pa.table({
        "gh": pa.array(uniq.view(np.int64), pa.int64()),
        "n_raw": pa.array(n_raw.astype(np.int64), pa.int64()),
        "n_tgt": pa.array(n_tgt.astype(np.int64), pa.int64()),
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

    @classmethod
    def from_hashed(cls, h: np.ndarray, c_tgt: np.ndarray,
                    c_raw: np.ndarray,
                    n_buckets: int | None = None) -> "DSIRModel":
        """Build directly from (bigram-hash, target-count, raw-count)
        arrays — the distributed trainer's path."""
        m = cls.__new__(cls)
        m.n_buckets = n_buckets
        m.v = n_buckets if n_buckets else len(h)
        m.n_tgt = int(c_tgt.sum())
        m.n_raw = int(c_raw.sum())
        if n_buckets:
            ct = np.zeros(n_buckets, np.int64)
            cr = np.zeros(n_buckets, np.int64)
            idx = (h % np.uint64(n_buckets)).astype(np.int64)
            np.add.at(ct, idx, c_tgt)
            np.add.at(cr, idx, c_raw)
            m.h, m.c_tgt, m.c_raw = None, ct, cr
        else:
            o = np.argsort(h, kind="stable")
            m.h, m.c_tgt, m.c_raw = h[o], c_tgt[o], c_raw[o]
        return m

    def packed(self) -> tuple:
        return (self.n_buckets, self.v, self.n_tgt, self.n_raw,
                self.h, self.c_tgt, self.c_raw)


def train_dsir(sf_dir: str, ref_mod: int = 10,
               n_buckets: int | None = None) -> DSIRModel:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    partial = docs.map_batches(
        _dsir_count_batch, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"ref_mod": ref_mod, "n_buckets": n_buckets})
    t = _agg_count_partials(
        partial, lambda b: _merge_counts(b, "gh", ("n_tgt", "n_raw")))
    if t is None:
        # exact-mode empty model gives V=0 -> a NaN offset and NaN
        # weights for every doc — fail loudly at train time
        raise ValueError("train_dsir: corpus contains no bigrams")
    return DSIRModel.from_hashed(
        t.column("gh").to_numpy(zero_copy_only=False).view(np.uint64),
        t.column("n_tgt").to_numpy(zero_copy_only=False),
        t.column("n_raw").to_numpy(zero_copy_only=False),
        n_buckets=n_buckets)


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
        """Whole-batch vectorized scoring (same shape as
        PerplexityScorer.__call__): one tokenize pass, batched count
        lookups, per-doc segment sums — no per-document Python loop."""
        th, lens = _batch_token_hashes(batch.column("text"), self.cache)
        gh, doc_idx, _ = _batch_bigram_hashes(th, lens)
        ndocs = len(lens)
        if self.n_buckets:
            idx = (gh % np.uint64(self.n_buckets)).astype(np.int64)
            ct, cr = self.c_tgt[idx], self.c_raw[idx]
        else:
            ct = _lookup(self.h, self.c_tgt, gh)
            cr = _lookup(self.h, self.c_raw, gh)
        lr = np.log(ct + 1.0) - np.log(cr + 1.0) + self.offset
        n_feats = np.bincount(doc_idx, minlength=ndocs)
        log_w = np.bincount(doc_idx, weights=lr, minlength=ndocs)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_feats": pa.array(n_feats.astype(np.int64), pa.int64()),
            "log_weight": pa.array(log_w, pa.float64()),
        })


def dsir_score(sf_dir: str, ref_mod: int = 10,
               n_buckets: int | None = None,
               model: DSIRModel | None = None,
               concurrency=None
               ) -> "ray.data.Dataset":
    """Train the likelihood-ratio model (unless given), broadcast once,
    score every document with its DSIR log importance weight.
    ``concurrency`` defaults to the FIXED pool (see
    ``perplexity_score``)."""
    if concurrency is None:
        from risjbot_ray.pipelines.webtext import fixed_pool
        concurrency = fixed_pool()
    if model is None:
        model = train_dsir(sf_dir, ref_mod=ref_mod, n_buckets=n_buckets)
    ref = ray.put(model.packed())
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(DSIRScorer, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=concurrency)


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


# --------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020 §4.3 —
# the public method: per LANGUAGE, rank documents by LM perplexity and
# split the corpus into equal head/middle/tail terciles; "head" is the
# most-fluent third that CCNet keeps for LM training data)
# --------------------------------------------------------------------------

_NLL_FP_SCALE = 1_000_000.0   # fixed-point grid for the per-bigram NLL
_PPL_BIN_WIDTH = 250_000.0    # rank-bin width in fp units (0.25 nat)
_PPL_BINS = 128               # bins above 32 nats clamp into the last


class _FPNLLScorer(PerplexityScorer):
    """PerplexityScorer twin that emits the SUM of per-bigram
    ``floor(1e6 * nll)`` as an int64 (plus a ``lang`` passthrough)
    instead of the float mean. The fixed-point floor makes the
    document score an integer DuckDB reproduces exactly: SUM of
    identical integers is summation-order-independent, and the only
    cross-engine freedom left is a 1-ulp difference in ln(), which
    flips a floor only when 1e6*nll sits within ~1e-9 of an integer —
    vanishing for irrational logs. Ranks over the score therefore
    admit an exact SQL oracle where ranking the float mean
    (summation-order-dependent) would not."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, lens = _batch_token_hashes(batch.column("text"), self.cache)
        gh, doc_idx, w1 = _batch_bigram_hashes(th, lens)
        ndocs = len(lens)
        cu = _lookup(self.uni_h, self.uni_n, w1)
        cb = _lookup(self.bi_h, self.bi_n, gh)
        fp = np.floor(_NLL_FP_SCALE * (np.log(cu + float(self.v))
                                       - np.log(cb + 1.0)))
        n_bi = np.bincount(doc_idx, minlength=ndocs)
        # per-bigram fp is a non-negative integer < ~5e7 (cu >= cb and
        # V >= 1 make every term >= 0), so a doc total stays far under
        # 2^53 and the float-weighted bincount is exact
        tot = np.bincount(doc_idx, weights=fp, minlength=ndocs)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_bigrams": pa.array(n_bi.astype(np.int64), pa.int64()),
            "nll_fp": pa.array(tot.astype(np.int64), pa.int64()),
        })


def ccnet_ppl_buckets(sf_dir: str, ref_mod: int = 10,
                      concurrency=None
                      ) -> "ray.data.Dataset":
    """CCNet's per-language head/middle/tail perplexity split.

    Scale shape: score with the broadcast bigram LM (zero-exchange,
    same as ``perplexity_score``), then assign EXACT per-language
    ranks with the two-pass prefix-sum used by ``shuffle_rank`` /
    ``pack_stream`` — documents key into (lang, coarse-NLL-bin)
    groups, a combiner count pass hands the driver one integer per
    non-empty group (bounded by #langs x 128 bins, never by corpus
    size), the driver turns those into prefix bases, and ranks are
    assigned inside ``groupby(gkey).map_groups``. Because the bin is
    a monotone function of the sort key (mean NLL), within-bin local
    order + prefix base = the exact global per-language rank; no
    corpus-wide sort exchange. Bin balance (not correctness) assumes
    mean NLL < 32 nats — pathological corpora clamp into the last bin
    and only lose parallelism there. Tercile rule on the 0-based
    rank r with n docs in the language: head iff 3r < n, middle iff
    3r < 2n, else tail (ties broken by doc_id, so the split is
    deterministic and SQL-reproducible).

    Returns (doc_id, lang, n_bigrams, nll_fp, avg_nll_fp, ppl_rank,
    bucket); docs with < 2 tokens score 0 and land in head — CCNet
    leaves length gating to the quality rules (gopher/C4), not the
    LM stage."""
    if concurrency is None:
        from risjbot_ray.pipelines.webtext import fixed_pool
        concurrency = fixed_pool()
    from .webtext import _counts_by
    model = train_bigram_lm(sf_dir, ref_mod=ref_mod)
    ref = ray.put(model.packed())
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    scored = docs.map_batches(_FPNLLScorer, fn_constructor_args=(ref,),
                              batch_format="pyarrow",
                              concurrency=concurrency)

    def key(batch: pa.Table) -> pa.Table:
        n = batch.column("n_bigrams").to_numpy(zero_copy_only=False)
        fp = batch.column("nll_fp").to_numpy(zero_copy_only=False)
        avg = np.divide(fp.astype(np.float64), n,
                        out=np.zeros(len(n), np.float64), where=n > 0)
        bins = np.clip((avg // _PPL_BIN_WIDTH).astype(np.int64),
                       0, _PPL_BINS - 1)
        # null lang shares the "" group key (SQL's one-NULL-group
        # semantics); the lang COLUMN itself passes through untouched
        gk = [f"{l or ''}\x1f{b:03d}" for l, b in
              zip(batch.column("lang").to_pylist(), bins)]
        return (batch
                .append_column("avg_nll_fp", pa.array(avg, pa.float64()))
                .append_column("gkey", pa.array(gk, pa.string())))

    keyed = _coalesce_for_exchange(
        scored.map_batches(key, batch_format="pyarrow"))

    # one tiny int per non-empty (lang, bin): prefix bases + totals
    bases: dict[str, int] = {}
    totals: dict[str, int] = {}
    per_lang: dict[str, list[tuple[str, int]]] = {}
    for gk, c in _counts_by(keyed, "gkey").items():
        per_lang.setdefault(gk.rpartition("\x1f")[0], []).append((gk, c))
    for lang, items in per_lang.items():
        run = 0
        for gk, c in sorted(items):   # %03d bin pads: lexicographic
            bases[gk] = run           # order == numeric bin order
            run += c
        totals[lang] = run
    meta_ref = ray.put((bases, totals))

    def assign(df):
        order = np.lexsort((df["doc_id"].to_numpy(),
                            df["avg_nll_fp"].to_numpy()))
        df = df.iloc[order]
        b, t = ray.get(meta_ref)
        gk = df["gkey"].iloc[0]
        base, n = b[gk], t[gk.rpartition("\x1f")[0]]
        rank = np.arange(base, base + len(df), dtype=np.int64)
        bucket = np.where(3 * rank < n, "head",
                          np.where(3 * rank < 2 * n, "middle", "tail"))
        return (df.assign(ppl_rank=rank, bucket=bucket)
                  .drop(columns=["gkey"]))

    return keyed.groupby("gkey").map_groups(assign,
                                            batch_format="pandas")
