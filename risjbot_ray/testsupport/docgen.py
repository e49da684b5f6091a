"""Deterministic synthetic documents corpus for benching the webtext
training-data operators at scales beyond the driver's small documents
table (sf0.1 ships 5,000 docs; the operators are designed for 10^9+).

Schema matches `/root/testdata/sf*/documents.parquet`:
``documents(doc_id, text, lang, source, n_chars)``. 15% of docs carry a
planted duplicated 64-token span (drawn from a 500-template pool) so
tile dedup has real work; the vocabulary is common-English-heavy so the
curation quality gates pass at realistic rates.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = (
    "the a an and of to in is was for on with as by at it this that be "
    "are from time year people way day man thing woman life child world "
    "school state family student group country problem hand part place "
    "case week company system program question work government number "
    "night point home water room mother area money story fact month lot "
    "right study book eye job word business issue side kind head house "
    "service friend father power hour game line end member law car city "
    "community name president team minute idea body information back "
    "parent face others level office door health person art war history "
    "party result change morning reason research girl guy moment air "
    "teacher force education").split()


def gen_docs_corpus(n: int, seed: int = 7, shards: int = 32,
                    root: str | None = None) -> str:
    """Write (or reuse) a deterministic n-doc corpus under ``root``
    (default ``/tmp/risjbot_docs_{n}``) as
    ``{root}/documents.parquet/part-*.parquet``; returns ``root`` (an
    ``sf_dir`` for every documents-table operator)."""
    root = root or f"/tmp/risjbot_docs_{n}"
    ddir = f"{root}/documents.parquet"
    done = f"{root}/.complete"
    if os.path.exists(done):
        return root
    os.makedirs(ddir, exist_ok=True)
    # shards are seed-independent, so generation parallelizes across
    # processes (the serial loop costs ~50 s at 100k docs)
    import multiprocessing as mp
    args = [(n, seed, shards, s, ddir) for s in range(shards)]
    # fork (not spawn): workers touch only numpy/pyarrow, and spawn
    # would re-execute a <stdin>/REPL __main__
    with mp.get_context("fork").Pool(min(8, shards)) as pool:
        pool.starmap(_gen_shard, args)
    with open(done, "w") as f:
        f.write(str(n))
    return root


def _gen_shard(n: int, seed: int, shards: int, s: int,
               ddir: str) -> None:
    v = len(_VOCAB)
    rng0 = np.random.default_rng(seed)
    templates = [" ".join(_VOCAB[i] for i in rng0.integers(0, v, 64))
                 for _ in range(500)]
    per = n // shards
    rng = np.random.default_rng(seed * 1000 + s)
    count = per if s < shards - 1 else n - per * (shards - 1)
    ids = np.arange(s * per, s * per + count, dtype=np.int64)
    texts, srcs = [], []
    for d in ids:
        length = int(rng.integers(100, 400))
        t = " ".join(_VOCAB[i] for i in rng.integers(0, v, length))
        if rng.random() < 0.15:
            t = templates[int(rng.integers(0, 500))] + " " + t
        texts.append(t)
        srcs.append(f"src{int(d) % 20}")
    pq.write_table(
        pa.table({"doc_id": ids, "text": texts,
                  "lang": ["en"] * count, "source": srcs,
                  "n_chars": [len(t) for t in texts]}),
        f"{ddir}/part-{s}.parquet")
