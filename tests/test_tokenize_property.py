"""Property tests for the exact-str.split() Arrow tokenizer and the
vectorized n-gram window hasher behind gram_duplication: the Arrow
split must agree with Python ''.split() on ARBITRARY unicode text
(including the 29 whitespace codepoints, combining marks, surrogates
are excluded by st.text defaults), and the flat window hasher must
equal the per-row Horner reference."""

import numpy as np
import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from risjbot_ray.pipelines.webtext import (_gram_hash_arr, _token_h64,
                                           _window_gram_hashes,
                                           _ws_token_hashes)

_texts = st.lists(
    st.text(max_size=60), min_size=0, max_size=8)


@given(_texts)
@settings(max_examples=500, deadline=None)
@example(["  x y "])          # exotic whitespace classes
@example(["\x1c\x1d\x1e\x1f\x85\xa0"])  # the non-space controls
@example(["", "   ", "\t\n\x0b"])
def test_ws_token_hashes_matches_python_split(texts):
    th, lens = _ws_token_hashes(pa.array(texts, pa.string()), {})
    py = [t.split() for t in texts]
    assert lens.tolist() == [len(p) for p in py]
    # hash stream equals md5 token hashes of the Python split
    cache: dict = {}
    want = [_token_h64(w, cache) for p in py for w in p]
    assert th.tolist() == want


@given(st.lists(st.lists(st.integers(0, 50), min_size=0, max_size=30),
                min_size=1, max_size=6),
       st.integers(2, 5))
@settings(max_examples=300, deadline=None)
def test_window_gram_hashes_matches_rowwise_reference(docs, n):
    # docs as token-hash sequences: map ints to distinct tokens
    toks = [[f"t{i}" for i in d] for d in docs]
    cache: dict = {}
    th = np.array([_token_h64(w, cache) for d in toks for w in d],
                  dtype=np.uint64)
    lens = np.array([len(d) for d in toks], dtype=np.int64)
    gh, doc_idx = _window_gram_hashes(th, lens, n)
    # per-row reference (the _gram_hash_arr Horner)
    want_h, want_d = [], []
    for di, d in enumerate(toks):
        g = _gram_hash_arr(d, n, cache)
        want_h.extend(g.tolist())
        want_d.extend([di] * len(g))
    assert gh.tolist() == want_h
    assert doc_idx.tolist() == want_d
