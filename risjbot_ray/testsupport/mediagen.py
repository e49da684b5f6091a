"""Deterministic synthetic media corpus (real encoded BMP/PPM/WAV/y4m
payloads) for benching the multimodal operators at scales beyond the
300-row driver checks.

Rows are seeded per (seed, media_id) — see
``pipelines/multimodal.py::synth_media_rows`` — so any shard slice is
row-for-row identical to the driver-side ``synth_media_table``; shards
generate independently in a fork pool (same pattern as ``docgen``).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def gen_media_corpus(n: int, seed: int = 42, shards: int = 32,
                     root: str | None = None) -> str:
    """Write (or reuse) a deterministic n-row media corpus under
    ``root`` (default ``/tmp/risjbot_media_{n}``) as
    ``{root}/media.parquet/part-*.parquet``; returns the dataset dir.

    Parquet parts keep row groups small (256 rows) because payload
    rows are KB-to-MB scale — readers get fine-grained blocks without
    oversized batch bytes.
    """
    root = root or f"/tmp/risjbot_media_{n}"
    mdir = f"{root}/media.parquet"
    done = f"{root}/.complete"
    if os.path.exists(done):
        return mdir
    os.makedirs(mdir, exist_ok=True)
    import multiprocessing as mp
    args = [(n, seed, shards, s, mdir) for s in range(shards)]
    # fork (not spawn): workers touch only numpy/pyarrow, and spawn
    # would re-execute a <stdin>/REPL __main__
    with mp.get_context("fork").Pool(min(8, shards)) as pool:
        pool.starmap(_gen_shard, args)
    with open(done, "w") as f:
        f.write(str(n))
    return mdir


def _gen_shard(n: int, seed: int, shards: int, s: int,
               mdir: str) -> None:
    from risjbot_ray.pipelines.multimodal import synth_media_rows
    lo = n * s // shards
    hi = n * (s + 1) // shards
    if hi <= lo:
        return
    tbl = synth_media_rows(range(lo, hi), seed)
    pq.write_table(tbl, f"{mdir}/part-{s:05d}.parquet",
                   row_group_size=256, compression="zstd")
