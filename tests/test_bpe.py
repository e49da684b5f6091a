"""BPE training/application gates: the incremental distributed path
must agree exactly with from-scratch naive reference implementations
(independent code paths), and the classic Sennrich worked example must
produce the hand-computed merges."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from risjbot_ray.pipelines.bpe import (EOW, BPEApply, bpe_train_from_freqs,
                                       bpe_tokencount, encode_word,
                                       train_bpe, vocab_table)
from risjbot_ray.pipelines.textstats import _BPEISH_RE

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# naive reference implementations (deliberately different algorithms)
# --------------------------------------------------------------------------

def _naive_bpe_train(freqs, n_merges):
    """From-scratch pair recount every iteration (O(vocab) per merge);
    same (count desc, pair asc) tie-break as the incremental trainer."""
    seqs = {w: tuple(list(w) + [EOW]) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, seq in seqs.items():
            c = freqs[w]
            for p in zip(seq, seq[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] <= 0:
            break
        merges.append(best)
        new = best[0] + best[1]
        for w, seq in seqs.items():
            out, j = [], 0
            while j < len(seq):
                if (j + 1 < len(seq) and seq[j] == best[0]
                        and seq[j + 1] == best[1]):
                    out.append(new)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = tuple(out)
    return merges


def _replay_encode(word, merges):
    """Apply merges in TRAINING order (not greedy-min-rank): for BPE
    these are equivalent, which is exactly what this reference checks."""
    seq = list(word) + [EOW]
    for a, b in merges:
        out, j = [], 0
        while j < len(seq):
            if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(seq[j])
                j += 1
        seq = out
    return seq


def _rand_freqs(rng, n_words=400):
    alpha = "abcdefgh"
    freqs = {}
    for _ in range(n_words):
        w = "".join(rng.choice(list(alpha),
                               size=rng.integers(1, 9)))
        freqs[w] = freqs.get(w, 0) + int(rng.integers(1, 50))
    return freqs


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_sennrich_worked_example():
    # Sennrich et al. 2016 §3.2 example vocabulary
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_from_freqs(freqs, n_merges=4)
    # hand-computed: ('e','s') 9 (ties ('s','t'),('t',EOW) broken by
    # pair order), then ('es','t') 9, ('est',EOW) 9, then ('l','o') 7
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]
    assert encode_word("newest", {tuple(p): i
                                  for i, p in enumerate(merges)}) \
        == ["n", "e", "w", "est</w>"]


def test_incremental_matches_naive_trainer():
    rng = np.random.default_rng(11)
    for trial in range(3):
        freqs = _rand_freqs(rng)
        fast = bpe_train_from_freqs(freqs, n_merges=60)
        slow = _naive_bpe_train(freqs, n_merges=60)
        assert fast == slow


def test_trainer_stops_when_exhausted():
    merges = bpe_train_from_freqs({"ab": 3}, n_merges=100)
    # 'a b </w>' admits at most 2 merges
    assert len(merges) == 2
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert encode_word("ab", ranks) == ["ab" + EOW]


def test_greedy_encode_equals_replay():
    rng = np.random.default_rng(23)
    freqs = _rand_freqs(rng)
    merges = bpe_train_from_freqs(freqs, n_merges=80)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in list(freqs)[:120]:
        assert encode_word(w, ranks) == _replay_encode(w, merges)
    # words never seen in training still encode (character fallback)
    for w in ("zzzzq", "x", "qqq"):
        got = encode_word(w, ranks)
        assert "".join(got) == w + EOW


def test_distributed_train_matches_local(ray_session):
    merges = train_bpe(SF, n_merges=64)
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    freqs = {}
    for t in texts:
        for w in _BPEISH_RE.findall(t or ""):
            freqs[w] = freqs.get(w, 0) + 1
    assert merges == _naive_bpe_train(freqs, n_merges=64)
    vt = vocab_table(merges)
    assert vt.num_rows == 64
    assert vt.column("token").to_pylist()[0] == merges[0][0] + merges[0][1]


def test_bpe_tokencount_pipeline_exact(ray_session):
    merges = train_bpe(SF, n_merges=64)
    got = bpe_tokencount(SF, merges=merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    exp = {}
    for did, t in zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()):
        exp[did] = sum(len(_replay_encode(w, merges))
                       for w in _BPEISH_RE.findall(t or ""))
    assert len(got) == len(exp)
    for did, n in zip(got["doc_id"], got["n_bpe_tokens"]):
        assert exp[int(did)] == int(n)
    # sanity: BPE count sits between wordcount and character count
    assert (got["n_bpe_tokens"] > 0).all()


def test_bpe_apply_cache_bound():
    b = BPEApply([("a", "b")])
    import risjbot_ray.pipelines.bpe as m
    old = m._WORD_CACHE_MAX
    m._WORD_CACHE_MAX = 4
    try:
        for w in ("aa", "bb", "cc", "dd", "ee", "ab"):
            b._n_tokens(w)
        assert len(b.cache) <= 4 + 1
        assert b._n_tokens("ab") == 2  # 'ab' + EOW -> ['ab', '</w>']
    finally:
        m._WORD_CACHE_MAX = old
