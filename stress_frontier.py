#!/usr/bin/env python
"""Frontier-scale stress: an N-million-URL bucketed wave with driver-RSS
evidence.

The 10^10 posture of the crawl engine rests on one claim: the driver's
state for a wave is sidecar AGGREGATES (per-bucket file lists, per-host
counts), never rows (`frontier/spill.py`). This script measures that
claim directly at millions of URLs on one node:

  1. N Ray tasks generate the frontier rows INSIDE tasks — canonicalize
     (the real `canonicalize_batch` kernel) and `spill_bucketed` to the
     checkpoint dir. The driver never holds a row.
  2. The driver reconstructs the `BucketedFrontier` from sidecars alone
     and runs ONE full production wave (`_run_bucketed_wave`: dedup ->
     seen-gate -> robots -> politeness cutoffs + rank deferral -> fetch
     join -> ledger commit). Hot hosts exceed `per_host_budget`, so the
     politeness pre-pass and the per-rank deferral respill both run at
     full volume.
  3. Driver VmRSS is sampled at each phase boundary; the headline
     number is the RSS growth from pipeline-ready to wave-complete,
     which must stay O(#hosts x #buckets), not O(#rows).

Usage:
  python stress_frontier.py                 # 10M rows, 50k hosts
  python stress_frontier.py --rows 2000000  # quicker smoke

Prints ONE JSON line; human detail on stderr. Results recorded in
BASELINE.md ("Frontier-scale driver-state evidence").
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


@ray.remote
def gen_and_spill(task_id: int, n_rows: int, n_hosts: int, hot_hosts: int,
                  hot_share: float, sdir: str, num_buckets: int,
                  seed: int) -> int:
    """Generate n_rows synthetic article URLs (hot_share of them on the
    first hot_hosts hosts), canonicalize with the production kernel and
    spill as a bucketed frontier piece. Runs entirely in-task."""
    from risjbot_ray.frontier.canon import canonicalize_batch
    from risjbot_ray.frontier.spill import spill_bucketed
    from risjbot_ray.sources.stage import CHILD_SCHEMA
    rng = np.random.default_rng(seed * 1000 + task_id)
    n_hot = int(n_rows * hot_share)
    hosts_idx = np.concatenate([
        rng.integers(0, hot_hosts, n_hot),
        rng.integers(hot_hosts, n_hosts, n_rows - n_hot)])
    art = np.arange(n_rows, dtype=np.int64) + task_id * n_rows
    urls = [f"https://h{h}.stress.example/art/{a}"
            for h, a in zip(hosts_idx, art)]
    tbl = pa.Table.from_pydict(
        {"url": urls,
         "priority": pa.array(np.zeros(n_rows, np.int32)),
         "depth": pa.array(np.zeros(n_rows, np.int32)),
         "source_kind": ["article"] * n_rows,
         "meta": pa.array([None] * n_rows, pa.string())},
        schema=CHILD_SCHEMA)
    cand = canonicalize_batch(tbl)
    return spill_bucketed(cand, sdir, num_buckets)


def run(rows: int, n_hosts: int, hot_hosts: int, hot_share: float,
        tasks: int, budget: int, work_dir: str,
        num_buckets: int = 64, seen_shards: int = 8) -> dict:
    from risjbot_ray.frontier.spill import load_bucketed_frontier
    from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
    from risjbot_ray.testsupport.pagegen import gen_corpus

    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    # a small REAL page corpus so the fetch-join/extract path executes
    # (hits are a tiny fraction; the stress is the gate/politeness path)
    pages, expected, seeds, robots = gen_corpus(500, seed=7)
    ppath = os.path.join(work_dir, "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=os.path.join(work_dir, "out"),
                      checkpoint_dir=os.path.join(work_dir, "ckpt"),
                      per_host_budget=budget,
                      num_fetch_buckets=num_buckets,
                      num_seen_shards=seen_shards)
    pipe = CrawlPipeline(cfg, ppath, os.path.join(work_dir, "store"),
                         robots_bodies=robots)
    out: dict = {"rows": rows, "hosts": n_hosts, "hot_hosts": hot_hosts,
                 "hot_share": hot_share, "budget": budget,
                 "buckets": num_buckets}
    try:
        rss_ready = rss_mb()
        sdir = os.path.join(cfg.checkpoint_dir, "frontier-stress")
        per = rows // tasks
        t0 = time.time()
        ns = ray.get([gen_and_spill.remote(
            i, per + (rows % tasks if i == tasks - 1 else 0),
            n_hosts, hot_hosts, hot_share, sdir, num_buckets, seed=1)
            for i in range(tasks)])
        out["gen_spill_sec"] = round(time.time() - t0, 2)
        assert sum(ns) == rows, (sum(ns), rows)

        t0 = time.time()
        bf = load_bucketed_frontier(sdir)
        out["load_sec"] = round(time.time() - t0, 3)
        rss_loaded = rss_mb()
        assert bf.num_rows == rows
        n_over = sum(1 for c in bf.host_counts.values() if c > budget)
        out["hosts_over_budget"] = n_over
        if budget < rows * hot_share / max(hot_hosts, 1):
            assert n_over >= hot_hosts, "hot hosts must bind the budget"

        t0 = time.time()
        pipe._run_bucketed_wave(0, bf)
        out["wave_sec"] = round(time.time() - t0, 2)
        rss_done = rss_mb()

        snap = pipe.extract_metrics.snapshot()
        out["scheduled"] = int(snap.get("bucketed_scheduled", 0))
        out["deferred"] = int(snap.get("bucketed_deferred", 0))
        out["rss_ready_mb"] = round(rss_ready, 1)
        out["rss_loaded_mb"] = round(rss_loaded, 1)
        out["rss_done_mb"] = round(rss_done, 1)
        out["driver_rss_delta_mb"] = round(rss_done - rss_ready, 1)
        out["rows_per_driver_mb"] = (
            round(rows / max(out["driver_rss_delta_mb"], 1e-9))
            if out["driver_rss_delta_mb"] > 0 else None)
        out["wave_urls_per_sec"] = round(rows / out["wave_sec"])
    finally:
        pipe.shutdown()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--hosts", type=int, default=50_000)
    ap.add_argument("--hot-hosts", type=int, default=100)
    ap.add_argument("--hot-share", type=float, default=0.2)
    ap.add_argument("--tasks", type=int, default=32)
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--work-dir", default="/tmp/frontier_stress")
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir for inspection")
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    try:
        res = run(args.rows, args.hosts, args.hot_hosts, args.hot_share,
                  args.tasks, args.budget, args.work_dir)
    finally:
        ray.shutdown()
        if not args.keep:
            shutil.rmtree(args.work_dir, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
