"""Bucketed frontier spill layout — the representation that keeps a
10^10-URL frontier off the driver.

Canonicalized frontier rows (``canonicalize_batch`` output) are written as
one parquet part per fetch bucket (``url_hash % num_buckets`` — the same
partitioning key the page store and seen shards use), each with a tiny
sidecar JSON commit record ``{bucket, n}``. Host accounting lives in
columnar per-call stats files under ``stats/`` (v2 layout):

  * ``hosts-{tag}.parquet`` (host, n) — per-call host totals, read
    EAGERLY at load time with one vectorized group_by. Driver state for
    host totals is O(#distinct-hosts-per-wave), the politeness
    invariant's natural grain (per-host budgets need per-host counts).
  * ``hb-{tag}.parquet`` (host, bucket, n), sorted by host — per-bucket
    detail, scanned LAZILY with a host filter only for the (few)
    over-budget hosts (``bucket_counts_for``). The eager v1 layout held
    O(#hosts x #buckets) nested dicts on the driver — 139 MB and a
    12.7 s 80M-entry JSON parse at a 10M-row / 50k-host wave
    (stress_frontier.py) — v2 loads the same wave in well under a
    second with megabytes of driver state.

``num_rows`` still derives from the per-part sidecars, which remain the
commit records: a torn call (stats written, some sidecars missing) can
inflate HOST counts — harmless, politeness only becomes more cautious —
but can never surface unreadable rows or wrong totals.

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


def _scan_stats_agg(files: list[str], hosts: list[str]):
    """Host-filtered (host, bucket) count aggregation over hb- stats
    parquets; returns (table, sum_column_name)."""
    import pyarrow.dataset as pads
    val = pa.array(hosts, type=pa.string())
    tbl = pads.dataset(files, format="parquet").to_table(
        filter=pc.field("host").isin(val))
    return (tbl.group_by(["host", "bucket"]).aggregate([("n", "sum")]),
            "n_sum")


def _scan_stats_chunk(files: list[str], hosts: list[str]) -> pa.Table:
    """Remote-task body: partial host-filtered aggregation of one chunk
    of stats files (runs where the files are; ships only the partials)."""
    agg, _ = _scan_stats_agg(files, hosts)
    return agg


@dataclass
class BucketedFrontier:
    """A frontier wave that never materializes on the driver: article
    children were canonicalized + keyed at spill time and written as
    per-fetch-bucket parquet files. The driver holds only file lists and
    per-host counts.

    The next wave runs gate -> robots -> politeness -> fetch -> extract as
    ONE task per bucket with no shuffle: the partitioning key (url_hash
    bucket) is shared between the frontier layout and the page store.
    Per-(host, bucket) counts are NOT held on the driver: when a host
    exceeds its budget, ``bucket_counts_for`` scans the columnar stats
    sidecars for just the over-budget hosts (see
    ``CrawlPipeline._politeness_cutoffs``)."""

    directory: str
    num_rows: int
    host_counts: dict[str, int]
    bucket_files: dict[int, list[str]]
    # legacy (v1 manifests/sidecars) eager per-host-per-bucket counts;
    # v2 spills leave this None and use stats_files lazily
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
    # per-call (host, bucket, n) stats parquets for lazy over-host scans
    stats_files: list[str] | None = field(default=None)

    def bucket_counts_for(self, hosts) -> dict[str, dict[int, int]] | None:
        """Per-bucket row counts for ``hosts`` only — the politeness
        pre-pass uses this to size its task set to the over-host row
        volume. Driver cost is O(len(hosts) x #buckets); the scan is a
        host-filtered columnar read of the ``hb-`` stats files (sorted
        by host at write time, so parquet row-group stats prune).
        Returns None when neither stats files nor legacy eager counts
        exist (old layout without counts) — the caller falls back to
        scanning every bucket."""
        legacy_part: dict[str, dict[int, int]] = {}
        if self.host_bucket_counts is not None:
            legacy_part = {h: dict(self.host_bucket_counts[h])
                           for h in hosts if h in self.host_bucket_counts}
            # pure-legacy directory: the eager dict is complete
            if not self.stats_files:
                return legacy_part
        if not self.stats_files:
            return None
        if not hosts:
            return {}
        want = sorted(set(hosts))
        total_bytes = sum(os.path.getsize(f) for f in self.stats_files)
        # big stats set: scan in Ray tasks so the driver never decodes
        # the stats rows — it receives only per-chunk partials filtered
        # to the requested hosts (observed: the driver-side scan of a
        # 10M-row wave's stats left a ~230 MB RSS high-water mark)
        if total_bytes > (8 << 20):
            import ray
            if ray.is_initialized():
                n_chunks = min(len(self.stats_files), 32)
                scan = ray.remote(num_cpus=1)(_scan_stats_chunk)
                parts = ray.get([
                    scan.remote(self.stats_files[i::n_chunks], want)
                    for i in range(n_chunks)])
                tbls = [t for t in parts if t.num_rows]
                if not tbls:
                    return {}
                agg = (pa.concat_tables(tbls)
                       .group_by(["host", "bucket"])
                       .aggregate([("n_sum", "sum")]))
                col = "n_sum_sum"
            else:
                agg, col = _scan_stats_agg(self.stats_files, want)
        else:
            agg, col = _scan_stats_agg(self.stats_files, want)
        out: dict[str, dict[int, int]] = {}
        for h, b, c in zip(agg.column("host").to_pylist(),
                           agg.column("bucket").to_pylist(),
                           agg.column(col).to_pylist()):
            out.setdefault(h, {})[int(b)] = int(c)
        # mixed-generation directory (resume across releases): v1 parts
        # carry no hb- stats rows, so their eager counts must be ADDED to
        # the stats-file scan or the politeness pre-pass under-counts
        for h, d in legacy_part.items():
            tgt = out.setdefault(h, {})
            for b, c in d.items():
                tgt[b] = tgt.get(b, 0) + c
        return out

    def to_manifest(self) -> dict:
        """Slim resume record: the spill directory is durable, so the
        manifest carries identity + row count only — embedding the host
        counts made every wave-manifest O(#hosts) on disk (v1)."""
        return {
            "directory": self.directory,
            "num_rows": self.num_rows,
            "parent": self.parent,
        }

    @classmethod
    def from_manifest(cls, pb: dict) -> "BucketedFrontier | None":
        # v1 manifests embedded the full counts — honor them on resume,
        # UNLESS the directory has since received v2 respills (stats/
        # hb-*.parquet present): then the embedded counts are stale —
        # they miss every respilled row — and the directory itself is
        # the authority (load_bucketed_frontier merges both
        # generations, same as the first resume did)
        if pb.get("host_counts") is not None:
            if glob.glob(os.path.join(pb["directory"], "stats",
                                      "hb-*.parquet")):
                bf = load_bucketed_frontier(pb["directory"])
                if bf is not None:
                    bf.parent = pb.get("parent")
                    return bf
            hbc = pb.get("host_bucket_counts")
            return cls(
                pb["directory"], pb["num_rows"], pb["host_counts"],
                {int(k): v for k, v in pb["bucket_files"].items()},
                ({h: {int(b): c for b, c in bc.items()}
                  for h, bc in hbc.items()} if hbc is not None else None),
                pb.get("parent"))
        bf = load_bucketed_frontier(pb["directory"])
        if bf is None:
            return None  # no committed parts — nothing to resume
        bf.parent = pb.get("parent")
        return bf


def spill_bucketed(cand: pa.Table, directory: str,
                   num_buckets: int) -> int:
    """Write canonicalized frontier rows as per-bucket parquet parts with
    tiny sidecar commit records plus per-call columnar host stats.
    Returns the number of rows written. Safe to call concurrently from
    many tasks (uuid part tags)."""
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

    from ..state.checkpoint import _fsync_dir, _fsync_file

    # columnar host stats FIRST (before any part's commit record): a
    # call that dies after stats but before sidecars leaves phantom
    # host counts — harmless (politeness gets more cautious), whereas
    # committed parts without stats would silently evade budgets
    sdir = os.path.join(directory, "stats")
    os.makedirs(sdir, exist_ok=True)
    hb = (cand.select(["host", "fetch_bucket"])
          .group_by(["host", "fetch_bucket"])
          .aggregate([([], "count_all")])
          .rename_columns(["host", "bucket", "n"])
          .sort_by("host"))  # sorted by host: row-group pruning for
    #                          the lazy over-host scans
    pq.write_table(hb, os.path.join(sdir, f"hb-{tag}.parquet"),
                   row_group_size=65536)
    hosts = (hb.select(["host", "n"]).group_by("host")
             .aggregate([("n", "sum")]).rename_columns(["host", "n"]))
    pq.write_table(hosts, os.path.join(sdir, f"hosts-{tag}.parquet"))
    _fsync_file(os.path.join(sdir, f"hb-{tag}.parquet"))
    _fsync_file(os.path.join(sdir, f"hosts-{tag}.parquet"))
    _fsync_dir(sdir)

    total = 0
    for b in np.unique(buckets):
        sub = cand.filter(pa.array(buckets == b))
        bdir = os.path.join(directory, f"bucket={int(b):05d}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"part-{tag}.parquet")
        pq.write_table(sub, path)
        side = {"bucket": int(b), "n": sub.num_rows}
        # durable atomic publish: the sidecar is the part's commit
        # record — the loader ignores parquet without one, so a task
        # that dies mid-write (and is retried by Ray) can never
        # surface a torn part. The parquet is fsynced BEFORE the
        # sidecar rename so power loss cannot persist the sidecar name
        # over lost data blocks (checkpoint.py documents the hazard).
        # A retry that re-runs a COMPLETED attempt leaves duplicate
        # rows under fresh uuids; in-bucket dedupe_wave absorbs them.
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
    records (never reads the frontier rows). Host totals come from ONE
    vectorized aggregation over the per-call ``hosts-`` stats parquets;
    per-bucket detail stays on disk until ``bucket_counts_for`` needs it
    for over-budget hosts."""
    sidecars = sorted(glob.glob(
        os.path.join(directory, "bucket=*", "part-*.parquet.json")))
    host_counts: dict[str, int] = {}
    legacy_hbc: dict[str, dict[int, int]] = {}
    bucket_files: dict[int, list[str]] = {}
    legacy = False
    n = 0
    for sc in sidecars:
        with open(sc) as f:
            info = json.load(f)
        b = int(info["bucket"])
        bucket_files.setdefault(b, []).append(sc[:-5])
        n += int(info["n"])
        if "host_counts" in info:  # v1 sidecar (pre-stats layout)
            legacy = True
            for h, c in info["host_counts"].items():
                host_counts[h] = host_counts.get(h, 0) + c
                d = legacy_hbc.setdefault(h, {})
                d[b] = d.get(b, 0) + c
    if n == 0:
        return None
    stats_files = sorted(glob.glob(
        os.path.join(directory, "stats", "hb-*.parquet")))
    hosts_files = sorted(glob.glob(
        os.path.join(directory, "stats", "hosts-*.parquet")))
    if hosts_files:
        # v2 parts' host totals. In a MIXED directory (a pre-stats-layout
        # checkpoint resumed under this release and respilled into) the
        # v1 sidecar counts are already in host_counts — ADD the v2
        # aggregation so budget gating sees every row; bucket_counts_for
        # merges the two generations the same way.
        import pyarrow.dataset as pads
        tbl = pads.dataset(hosts_files, format="parquet").to_table()
        agg = tbl.group_by("host").aggregate([("n", "sum")])
        for h, c in zip(agg.column("host").to_pylist(),
                        agg.column("n_sum").to_pylist()):
            host_counts[h] = host_counts.get(h, 0) + int(c)
    return BucketedFrontier(directory, n, host_counts, bucket_files,
                            legacy_hbc if legacy else None,
                            stats_files=stats_files or None)
