"""Bucketed frontier spill layout — the representation that keeps a
10^10-URL frontier off the driver.

Canonicalized frontier rows (``canonicalize_batch`` output) are written as
one parquet part per fetch bucket (``url_hash % num_buckets`` — the same
partitioning key the page store and seen shards use), each with a sidecar
JSON manifest ``{bucket, n, host_counts}``. The driver reconstructs a
:class:`BucketedFrontier` from the sidecars alone: O(#parts + #hosts)
driver state, never O(#rows).

Writers run inside Ray tasks/actors (discovery expansion, the trawl
epilogue shards, politeness-deferred rows); parts carry a uuid tag so
concurrent writers never collide. The spill directory lives under the
checkpoint dir, which — like the page store — must be on storage reachable
from every node of the cluster.
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


@dataclass
class BucketedFrontier:
    """A frontier wave that never materializes on the driver: article
    children were canonicalized + keyed at spill time and written as
    per-fetch-bucket parquet files. The driver holds only file lists and
    per-host (and per-host-per-bucket) counts.

    The next wave runs gate -> robots -> politeness -> fetch -> extract as
    ONE task per bucket with no shuffle: the partitioning key (url_hash
    bucket) is shared between the frontier layout and the page store. The
    per-(host, bucket) counts let the driver decide which buckets must
    participate in cross-bucket politeness coordination when a host
    exceeds its budget (see ``CrawlPipeline._politeness_cutoffs``)."""

    directory: str
    num_rows: int
    host_counts: dict[str, int]
    bucket_files: dict[int, list[str]]
    host_bucket_counts: dict[str, dict[int, int]] | None = field(
        default=None)
    # directory of the spill whose processing generated this one
    # (politeness-deferred spills) — on resume, a pending child whose
    # parent is also pending is dropped: reprocessing the parent
    # regenerates it deterministically
    parent: str | None = field(default=None)
    # source spill dirs when this piece is an in-memory MERGE of several
    # spills (one wave job + jointly-applied politeness); each source
    # gets its COMPLETE marker when the merged piece finishes
    sources: list[str] | None = field(default=None)

    def to_manifest(self) -> dict:
        return {
            "directory": self.directory,
            "num_rows": self.num_rows,
            "host_counts": self.host_counts,
            "bucket_files": {str(k): v for k, v in self.bucket_files.items()},
            "host_bucket_counts": (
                {h: {str(b): c for b, c in bc.items()}
                 for h, bc in self.host_bucket_counts.items()}
                if self.host_bucket_counts is not None else None),
            "parent": self.parent,
        }

    @classmethod
    def from_manifest(cls, pb: dict) -> "BucketedFrontier":
        hbc = pb.get("host_bucket_counts")
        return cls(
            pb["directory"], pb["num_rows"], pb["host_counts"],
            {int(k): v for k, v in pb["bucket_files"].items()},
            ({h: {int(b): c for b, c in bc.items()}
              for h, bc in hbc.items()} if hbc is not None else None),
            pb.get("parent"))


def spill_bucketed(cand: pa.Table, directory: str,
                   num_buckets: int) -> int:
    """Write canonicalized frontier rows as per-bucket parquet parts with
    sidecar count manifests. Returns the number of rows written. Safe to
    call concurrently from many tasks (uuid part tags)."""
    if cand.num_rows == 0:
        return 0
    hashes = np.asarray(cand.column("url_hash").to_pylist(),
                        dtype=np.uint64)
    buckets = (hashes % np.uint64(num_buckets)).astype(np.int64)
    if "fetch_bucket" in cand.column_names:
        cand = cand.drop_columns(["fetch_bucket"])
    cand = cand.append_column("fetch_bucket",
                              pa.array(buckets, type=pa.int64()))
    tag = uuid.uuid4().hex[:10]
    total = 0
    for b in np.unique(buckets):
        sub = cand.filter(pa.array(buckets == b))
        bdir = os.path.join(directory, f"bucket={int(b):05d}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"part-{tag}.parquet")
        pq.write_table(sub, path)
        hc = {r["values"]: int(r["counts"])
              for r in pc.value_counts(sub.column("host")).to_pylist()}
        side = {"bucket": int(b), "n": sub.num_rows, "host_counts": hc}
        # durable atomic publish: the sidecar is the part's commit
        # record — the loader ignores parquet without one, so a task
        # that dies mid-write (and is retried by Ray) can never
        # surface a torn part. The parquet is fsynced BEFORE the
        # sidecar rename so power loss cannot persist the sidecar name
        # over lost data blocks (checkpoint.py documents the hazard).
        # A retry that re-runs a COMPLETED attempt leaves duplicate
        # rows under fresh uuids; in-bucket dedupe_wave absorbs them.
        from ..state.checkpoint import _fsync_dir, _fsync_file
        _fsync_file(path)
        tmp = path + ".json.tmp"
        with open(tmp, "w") as f:
            json.dump(side, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path + ".json")
        _fsync_dir(bdir)
        total += sub.num_rows
    return total


def load_bucketed_frontier(directory: str) -> BucketedFrontier | None:
    """Reconstruct a BucketedFrontier from a spill directory's sidecar
    manifests (never reads the parquet rows)."""
    sidecars = sorted(glob.glob(
        os.path.join(directory, "bucket=*", "part-*.parquet.json")))
    host_counts: dict[str, int] = {}
    hbc: dict[str, dict[int, int]] = {}
    bucket_files: dict[int, list[str]] = {}
    n = 0
    for sc in sidecars:
        with open(sc) as f:
            info = json.load(f)
        b = int(info["bucket"])
        bucket_files.setdefault(b, []).append(sc[:-5])
        n += int(info["n"])
        for h, c in info["host_counts"].items():
            host_counts[h] = host_counts.get(h, 0) + c
            d = hbc.setdefault(h, {})
            d[b] = d.get(b, 0) + c
    if n == 0:
        return None
    return BucketedFrontier(directory, n, host_counts, bucket_files, hbc)
