"""Per-host politeness budgets, robots.txt gate, and the salted grouped
top-k scheduler.

Reference semantics being modeled (SURVEY.md 2.4 T6/T7, 2.7 O1):
- ``ROBOTSTXT_OBEY = True`` (settings.py:45) with per-request opt-out
  (``dont_obey_robotstxt``, spiders/uk/liverpoolecho.py:38-39)
- per-domain concurrency caps / download delays (settings.py:88-94) —
  realized batch-style as a per-host budget of fetches per wave
- priority queues (Request(priority=...), liverpoolecho.py:37,108,134,171)
  — realized as a deterministic per-host top-k by (priority desc,
  canon_url asc)

Scale design (north rule): hot hosts (bbc.co.uk/nytimes.com-style skew) are
SALTED into sub-groups before the groupby so no single partition holds a
whole hot host; a cheap second per-host pass over the ≤ (budget + salt)
survivors reconciles the exact budget. Wave-deferred rows are re-queued,
preserving politeness across waves.
"""

from __future__ import annotations

import urllib.robotparser

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class RobotsIndex:
    """Per-host robots.txt rules parsed once (stdlib urllib.robotparser on
    robots bodies from the pages table) and broadcast to scheduler tasks."""

    def __init__(self, robots_bodies: dict[str, str],
                 user_agent: str = "RISJbot"):
        self.user_agent = user_agent
        self.parsers: dict[str, urllib.robotparser.RobotFileParser] = {}
        for host, body in robots_bodies.items():
            rp = urllib.robotparser.RobotFileParser()
            try:
                rp.parse(body.splitlines())
            except ValueError:
                # stdlib robotparser urlparse()s each Allow/Disallow
                # value and a hostile one ('//[x?') raises "Invalid
                # IPv6 URL" — a garbage robots.txt must degrade to
                # no-rules (allow all, the no-robots convention), not
                # kill pipeline construction
                rp = urllib.robotparser.RobotFileParser()
                rp.parse([])
            self.parsers[host] = rp

    def allowed(self, host: str, url: str) -> bool:
        rp = self.parsers.get(host)
        if rp is None:
            return True  # no robots.txt → allowed
        try:
            return rp.can_fetch(self.user_agent, url)
        except ValueError:
            # can_fetch urlparse()s the url; an unparseable one (e.g.
            # 'http://[?x' surviving canonicalization's degraded path)
            # can't match any Disallow rule — treat as allowed rather
            # than crash the bucket task; the fetch join drops it (no
            # such page) immediately after
            return True

    def allowed_mask(self, hosts: list[str], urls: list[str]) -> np.ndarray:
        return np.fromiter(
            (self.allowed(h, u) for h, u in zip(hosts, urls)),
            dtype=bool, count=len(urls))


def add_salted_group(table: pa.Table,
                     salt_threshold: int = 10_000) -> pa.Table:
    """Append a ``sched_group`` column: ``host`` for normal hosts,
    ``host#k`` (k = url_hash % S) for hosts whose wave volume exceeds
    ``salt_threshold`` — the explicit hot-host salting the north rule
    requires. S grows with the host's row count so each sub-group stays
    under the threshold.

    ONE full-length pass regardless of how many hosts are hot: per-row
    sub-group counts come from a single index_in/take against the
    hot-host list (the previous per-hot-host if_else loop was
    O(#hot_hosts x rows) — exactly wrong on the skewed waves salting
    exists for)."""
    hosts = pc.cast(table.column("host"), pa.string()).combine_chunks()
    counts = pc.value_counts(hosts)
    hot = {r["values"]: int(np.ceil(r["counts"] / salt_threshold))
           for r in counts.to_pylist() if r["counts"] > salt_threshold}
    if not hot:
        return table.append_column("sched_group", hosts)
    idx = pc.index_in(hosts, value_set=pa.array(list(hot), pa.string()))
    idx_np = idx.to_numpy(zero_copy_only=False)       # NaN = not hot
    is_hot = ~np.isnan(idx_np)
    s_np = np.ones(len(idx_np), np.uint64)
    s_np[is_hot] = np.array(list(hot.values()), np.uint64)[
        idx_np[is_hot].astype(np.int64)]
    hash_np = np.asarray(table.column("url_hash").to_numpy(
        zero_copy_only=False), dtype=np.uint64)
    salts = pc.cast(pa.array((hash_np % s_np).astype(np.int64)),
                    pa.string())
    salted = pc.binary_join_element_wise(hosts, salts, pa.scalar("#"))
    groups = pc.if_else(pa.array(is_hot), salted, hosts)
    return table.append_column("sched_group", groups)


def schedule_wave(frontier: pa.Table, per_host_budget: int,
                  salt_threshold: int = 10_000,
                  host_budgets: dict[str, int] | None = None,
                  default_budget: int | None = None
                  ) -> tuple[pa.Table, pa.Table]:
    """Split a gated frontier wave into (scheduled, deferred).

    ``host_budgets`` optionally tightens the budget per host (AutoThrottle,
    ``frontier/autothrottle.py``); hosts absent from it use
    ``default_budget`` when given (the start-delay-implied budget for
    not-yet-observed hosts) else ``per_host_budget``, and a listed budget
    is never applied above ``per_host_budget``.

    Phase 1: salted grouped top-k (each sub-group takes the full budget —
    a superset). Phase 2: exact per-host top-k over the ≤ budget x S
    survivors. Deferred rows = everything not scheduled, re-queued for the
    next wave (per-domain queue semantics).

    Implemented with pandas inside the driver for wave-sized tables. Waves
    that never land on the driver (the bucketed spill path) get the SAME
    per-host selection from ``CrawlPipeline._politeness_cutoffs``: each
    bucket task dry-gates its over-budget-host rows and returns only local
    top-k keys; the driver merges those few keys into per-host cutoff keys
    that each bucket filters by — exact parity with this function (pinned
    by tests/test_politeness_bucketed.py) at O(#hosts x #buckets x budget)
    driver cost instead of a wave materialization.
    """
    if frontier.num_rows == 0:
        empty = frontier.slice(0, 0)
        return empty, empty

    salted = add_salted_group(frontier, salt_threshold)
    # one global stable Arrow sort; grouped top-k then reduces to a
    # cumcount mask over two SMALL columns — the wide columns (meta blobs)
    # never round-trip through pandas
    idx = pc.sort_indices(salted, sort_keys=[("priority", "descending"),
                                             ("canon_url", "ascending")])
    salted = salted.take(idx)
    df = pd.DataFrame({
        "sched_group": salted.column("sched_group").to_pylist(),
        "host": salted.column("host").to_pylist(),
    })
    per_host = host_budgets or default_budget is not None
    if per_host:
        fallback = (default_budget if default_budget is not None
                    else per_host_budget)
        bud = (df["host"].map(host_budgets or {}).fillna(fallback)
               .clip(upper=per_host_budget).astype(int))
    else:
        bud = per_host_budget  # scalar fast path
    in_p1 = df.groupby("sched_group", sort=False).cumcount() < bud
    host_rank = df[in_p1].groupby("host", sort=False).cumcount()
    in_p2 = pd.Series(False, index=df.index)
    in_p2.loc[host_rank.index] = host_rank < (
        bud.loc[host_rank.index] if per_host else per_host_budget)
    mask = pa.array(in_p2.to_numpy())
    out = salted.drop_columns(["sched_group"])
    return out.filter(mask), out.filter(pc.invert(mask))
