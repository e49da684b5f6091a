"""Distributed byte-pair-encoding (BPE) vocabulary training and
application over the ``documents`` table.

Follows the word-frequency formulation of Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units" (ACL
2016): merges are learned from the corpus WORD-FREQUENCY table, not
from the raw token stream, so the only distributed exchange in
training is one word-count groupby — with in-batch pre-aggregation as
the combiner, the shuffle carries (word, partial_count) rows bounded
by the vocabulary, never by corpus size. The merge loop itself runs on
the driver over the pruned frequency table (bounded by ``max_words``;
on web corpora the top ~1M words carry almost all token mass, and the
long typo/URL tail is exactly what BPE's character fallback exists
for), and application is embarrassingly parallel: an actor-pool
``map_batches`` stage that builds the merge-rank dict once per actor
and memoizes per-word encodings (web text repeats words massively, so
the cache turns per-token merge loops into dict hits).

Scale shape at 100 TB: corpus → one combiner-style groupby over at
most |vocab| distinct keys → driver loop over ≤ max_words rows →
broadcast merges (a few kB) to the apply pool. No stage ever holds
more than the pruned vocabulary in one place.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from .textstats import _BPEISH_RE

# end-of-word marker: a distinct symbol appended to every word so that
# merges cannot cross word boundaries and word-final units get their
# own tokens (Sennrich et al. 2016, §3.2)
EOW = "</w>"

DEFAULT_MERGES = 512
_WORD_CACHE_MAX = 1 << 20       # bound per-actor word->encoding cache


# --------------------------------------------------------------------------
# stage 1: distributed word-frequency table
# --------------------------------------------------------------------------

def _wordfreq_batch(batch: pa.Table) -> pa.Table:
    """Per-batch word counts (the combiner): pre-aggregating here means
    the groupby shuffle moves at most |batch vocabulary| rows per batch
    instead of one row per token."""
    counts: dict[str, int] = {}
    for t in batch.column("text").to_pylist():
        if not t:
            continue
        for w in _BPEISH_RE.findall(t):
            counts[w] = counts.get(w, 0) + 1
    words = sorted(counts)
    return pa.table({"word": pa.array(words, pa.string()),
                     "n": pa.array([counts[w] for w in words], pa.int64())})


def word_freq_ds(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents(text) -> (word, n) via combiner map + one groupby."""
    from ray.data.aggregate import Sum
    from .webtext import _coalesce_for_exchange
    partial = docs_ds.map_batches(_wordfreq_batch, batch_format="pyarrow",
                                  zero_copy_batch=True)
    agg = _coalesce_for_exchange(partial).groupby("word").aggregate(
        Sum("n", alias_name="n"))
    return agg


def collect_word_freqs(docs_ds: "ray.data.Dataset",
                       min_count: int = 1,
                       max_words: int | None = None) -> dict[str, int]:
    """Materialize the pruned frequency table on the driver. The result
    is bounded by ``max_words`` (top-by-count, deterministic (count
    desc, word asc) tie-break) — the documented scale knob that keeps
    the driver loop independent of corpus size."""
    ds = word_freq_ds(docs_ds)
    if min_count > 1:
        ds = ds.filter(expr=f"n >= {min_count}")
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    freqs: dict[str, int] = {}
    for t in parts:
        freqs.update(zip(t.column("word").to_pylist(),
                         t.column("n").to_pylist()))
    if max_words is not None and len(freqs) > max_words:
        keep = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
        freqs = dict(keep[:max_words])
    return freqs


# --------------------------------------------------------------------------
# stage 2: driver-side merge loop (incremental pair-count maintenance)
# --------------------------------------------------------------------------

def bpe_train_from_freqs(freqs: dict[str, int],
                         n_merges: int = DEFAULT_MERGES
                         ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word-frequency dict.

    Incremental algorithm: pair counts and the pair -> {word index} map
    are maintained across iterations, so each merge costs
    O(occurrences of the merged pair), not a full recount
    (``_naive_bpe_train`` in tests recomputes from scratch every round
    and must agree exactly). Selection is a LAZY max-heap — every count
    change pushes a (-n, pair) entry and pops validate against the live
    count — so the per-round argmax is amortized O(updates log P), not
    a full O(|pairs|) dict scan (which would dominate at the documented
    ~1M-word scale knob: millions of pairs x n_merges rounds).
    Tie-break is deterministic: highest count, then lexicographically
    smallest pair (exactly the (-n, pair) heap order)."""
    import heapq
    words = sorted(freqs)            # deterministic iteration order
    counts = [freqs[w] for w in words]
    seqs = [list(w) + [EOW] for w in words]

    pair_n: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, seq in enumerate(seqs):
        c = counts[i]
        for p in zip(seq, seq[1:]):
            pair_n[p] = pair_n.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)

    heap = [(-n, p) for p, n in pair_n.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_n = 0
        while heap:
            neg_n, p = heapq.heappop(heap)
            if pair_n.get(p, 0) == -neg_n:  # live entry, else stale
                best, best_n = p, -neg_n
                break
        if best is None or best_n <= 0:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            seq = seqs[i]
            c = counts[i]
            # remove this word's old pair contributions
            for p in zip(seq, seq[1:]):
                pair_n[p] -= c
                if pair_n[p] <= 0:
                    del pair_n[p]
                else:
                    heapq.heappush(heap, (-pair_n[p], p))
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del pair_words[p]
            # apply the merge left-to-right
            out = []
            j = 0
            while j < len(seq):
                if (j + 1 < len(seq)
                        and seq[j] == best[0] and seq[j + 1] == best[1]):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[i] = out
            # add the new contributions back
            for p in zip(out, out[1:]):
                pair_n[p] = pair_n.get(p, 0) + c
                heapq.heappush(heap, (-pair_n[p], p))
                pair_words.setdefault(p, set()).add(i)
    return merges


def train_bpe(sf_dir: str, n_merges: int = DEFAULT_MERGES,
              min_count: int = 1,
              max_words: int | None = None) -> list[tuple[str, str]]:
    """documents.parquet -> learned merge list (text column only read)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    freqs = collect_word_freqs(docs, min_count=min_count,
                               max_words=max_words)
    return bpe_train_from_freqs(freqs, n_merges)


def vocab_table(merges: list[tuple[str, str]]) -> pa.Table:
    """Merge list as an arrow table (rank, left, right, token)."""
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
        "token": pa.array([a + b for a, b in merges], pa.string()),
    })


# --------------------------------------------------------------------------
# stage 3: distributed application (actor pool, per-word memoization)
# --------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly merge the present pair with the
    LOWEST learned rank. Equivalent to replaying the merges in training
    order (``_replay_encode`` in tests exercises that equivalence) but
    O(len * merges-applied) instead of O(len * |vocab|)."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank = None
        best_j = -1
        for j in range(len(seq) - 1):
            r = ranks.get((seq[j], seq[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        a, b = seq[best_j], seq[best_j + 1]
        new_sym = a + b
        out = []
        j = 0
        while j < len(seq):
            if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                out.append(new_sym)
                j += 2
            else:
                out.append(seq[j])
                j += 1
        seq = out
    return seq


class BPEApply:
    """Actor-pool stage: documents(doc_id, text) -> (doc_id,
    n_bpe_tokens). The merge-rank dict is built once per actor from the
    (kB-scale) merge list; per-word encodings are memoized with a
    bounded cache — cleared, not LRU-evicted, past ``_WORD_CACHE_MAX``
    entries so a pathological vocabulary cannot grow an actor's heap
    unboundedly."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            if len(self.cache) >= _WORD_CACHE_MAX:
                self.cache.clear()
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            out.append(sum(self._n_tokens(w)
                           for w in _BPEISH_RE.findall(t)) if t else 0)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": pa.array(out, pa.int64())})


def bpe_tokencount(sf_dir: str, n_merges: int = DEFAULT_MERGES,
                   merges: list[tuple[str, str]] | None = None,
                   concurrency: tuple[int, int] = (1, 8)
                   ) -> "ray.data.Dataset":
    """Train on the corpus (unless ``merges`` given), then count BPE
    tokens per document with the learned vocabulary."""
    if merges is None:
        merges = train_bpe(sf_dir, n_merges=n_merges)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(BPEApply, fn_constructor_args=(merges,),
                            batch_format="pyarrow", concurrency=concurrency)
