"""The wave-synchronous crawl pipeline (SURVEY.md section 3.2).

Each wave: canonicalize+key -> in-wave dedup -> seen-gate (sharded actor
probe) -> robots + politeness schedule (salted grouped top-k) -> "fetch"
(bucketed hash join against the PageStore) -> discovery expansion /
extraction -> ledger commit -> checkpoint. The loop runs until the
frontier drains; an optional trawl epilogue (RefetchControl
REFETCHFROMDB, refetchcontrol.py:132-195) re-seeds under-fetched URLs.

Heavy per-row work (fetch join, parse, extraction) runs as Ray Data
operations; wave control state (the bounded scheduled set) is Arrow on the
driver. Wave *candidate* tables beyond ``ray_threshold`` rows are pushed
through Dataset stages instead of driver pandas.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..extract.page import ExtractStats
from ..extract.stage import extract_batch
from ..frontier.canon import canonicalize_batch, dedupe_wave
from ..frontier.pagestore import PageStore, build_page_store
from ..frontier.politeness import RobotsIndex, schedule_wave
from ..frontier.seen import SeenSet
from ..frontier.spill import (BucketedFrontier, load_bucketed_frontier,
                              spill_bucketed)
from ..sources.stage import CHILD_SCHEMA, DISCOVERY_KINDS, discover_batch
from ..state.checkpoint import CheckpointManager


@dataclass
class CrawlConfig:
    out_dir: str
    checkpoint_dir: str
    num_seen_shards: int = 8
    num_fetch_buckets: int = 32
    per_host_budget: int = 256
    salt_threshold: int = 10_000
    maxfetches: int = 8          # settings.py:131
    refetchsecs: int = 10_800    # settings.py:132
    agelimit: int | None = None  # default maxfetches*refetchsecs
    refetchfromdb: bool = False  # settings.py:133 (trawl epilogue)
    trimdb: bool = True          # settings.py:134
    obey_robots: bool = True     # settings.py:45
    max_waves: int = 25
    equivalent_domains: dict | None = None
    clock_us: int | None = None  # injectable clock for deterministic tests
    extract_concurrency: int | None = None
    batch_size: int = 256        # html rows per extraction batch (MB-scale)
    small_wave_rows: int = 4096  # driver fast path below this
    ray_canon_threshold: int = 20_000  # distribute canonicalize above
    ray_discovery_rows: int = 32  # distribute discovery parse above
    # item pipelines enabled by default in the reference
    # (settings.py:216-224: Sentiment(100), WordCount(200); NamedPeople/
    # ReadingAge present but disabled)
    enrich: bool = True
    enrich_namedpeople: bool = False
    enrich_readingage: bool = False
    # deferral look-ahead: ONE politeness pre-pass emits cutoff keys for
    # the next K waves, so a budget-bound host pays ceil(waves/K)
    # pre-passes instead of one per wave (each rank spill is within
    # budget by construction and schedules with no pre-pass at all)
    politeness_lookahead: int = 8
    # AutoThrottle (reference settings.py:236-247, disabled by default
    # there too): per-host delays adapt to observed wave fetch latency
    # and TIGHTEN per_host_budget per host (frontier/autothrottle.py)
    autothrottle: bool = False
    autothrottle_start_delay: float = 5.0    # AUTOTHROTTLE_START_DELAY
    autothrottle_max_delay: float = 60.0     # AUTOTHROTTLE_MAX_DELAY
    autothrottle_target_concurrency: float = 1.0
    autothrottle_wave_seconds: float = 60.0  # wave period: delay->budget
    download_delay: float = 0.0              # DOWNLOAD_DELAY floor


def seed_frontier(seeds: list[dict]) -> pa.Table:
    """Seed rows: [{'url':..., 'kind':..., 'priority':..., 'meta':...}].
    Sitemap/robots seeds get the reference's start_requests meta
    (newssitemapspider.py:19-26: sitemap flag + refetchcontrol_pass)."""
    rows = []
    for s in seeds:
        kind = s.get("kind", "article")
        meta = dict(s.get("meta") or {})
        if kind in ("sitemap", "robots"):
            meta.setdefault("sitemap", True)
            meta.setdefault("refetchcontrol_pass", True)
        if kind == "specified":
            kind = "article"
            meta.setdefault("refetchcontrol_pass", True)
        rows.append({"url": s["url"], "priority": int(s.get("priority", 0)),
                     "depth": 0, "source_kind": kind,
                     "meta": json.dumps(meta) if meta else None})
    return pa.Table.from_pylist(rows, schema=CHILD_SCHEMA)


def _now_us(cfg: CrawlConfig) -> int:
    if cfg.clock_us is not None:
        return cfg.clock_us
    return int(datetime.now(timezone.utc).timestamp() * 1_000_000)


# result rows of the discovery-spill tasks: the (few) discovery-kind
# children; article children go straight to the bucketed spill layout
_DISC_RESULT_SCHEMA = pa.schema([
    ("child_json", pa.string()),
])

# result rows of the table-path article tasks: one counts row per task
# (child_json null) plus one row per in-task-harvested link child
_ART_RESULT_SCHEMA = pa.schema([
    ("fetched", pa.int64()),
    ("extracted", pa.int64()),
    ("child_json", pa.string()),
])


def _timed_fetch(store, metrics, enabled: bool):
    """``fetch_group`` wrapper: when AutoThrottle is on, attribute each
    group's fetch wall time to its hosts (mean per-page latency x host
    row count) as at_us:/at_n: counters — one fire-and-forget metrics
    RPC per group, folded by the driver in the wave epilogue."""
    if not enabled:
        return store.fetch_group

    def fetch(group):
        t0 = time.perf_counter()
        out = store.fetch_group(group)
        el = time.perf_counter() - t0
        if out is not None and out.num_rows:
            from collections import Counter
            per_us = el * 1e6 / out.num_rows
            deltas: dict[str, int] = {}
            for h, c in Counter(out.column("host").to_pylist()).items():
                deltas["at_us:" + h] = int(per_us * c)
                deltas["at_n:" + h] = c
            metrics.incr(deltas)
        return out

    return fetch


# --------------------------------------------------------------------------
# Shared wave-kernel stages: the gate -> rank -> fetch -> harvest pipeline
# that both bucketed execution modes (`_run_bucketed_wave`'s per-bucket
# tasks and `_run_bucketed_window`'s per-group tasks) compose. ONE copy of
# each stage so a fix can never land one-sided.
# --------------------------------------------------------------------------

def _gate_rows(tbl: pa.Table, seen, robots, now_us: int) -> pa.Table:
    """In-wave dedup -> seen-ledger gate (trawl override) -> robots
    filter; returns the gated table with ``previousfetches`` attached."""
    tbl = dedupe_wave(tbl)
    keys = tbl.column("key").to_pylist()
    hashes = np.asarray(tbl.column("url_hash").to_pylist(),
                        dtype=np.uint64)
    passes = np.asarray(tbl.column("pass_seen").to_pylist(), dtype=bool)
    allowed, prev = seen.check(keys, hashes, now_us, pass_flags=passes)
    allowed |= np.asarray(tbl.column("trawled").to_pylist(), dtype=bool)
    tbl = tbl.append_column("previousfetches",
                            pa.array(prev, type=pa.int32()))
    tbl = tbl.filter(pa.array(allowed))
    if robots is not None and tbl.num_rows:
        mask = robots.allowed_mask(tbl.column("host").to_pylist(),
                                   tbl.column("canon_url").to_pylist())
        tbl = tbl.filter(pa.array(mask))
    return tbl


def _rank_rows(tbl: pa.Table,
               cutoffs: dict[str, list[tuple[int, str]]]) -> np.ndarray:
    """Per-row politeness rank = number of wave cutoffs the row falls
    after (rank 0 schedules NOW, rank r in wave now+r) — the one cutoff
    arithmetic both execution modes share."""
    rank = np.zeros(tbl.num_rows, dtype=np.int64)
    if not cutoffs or not tbl.num_rows:
        return rank
    pri = np.asarray(tbl.column("priority").to_pylist())
    hosts_np = np.asarray(tbl.column("host").to_pylist(), dtype=object)
    urls_np = np.asarray(tbl.column("canon_url").to_pylist(),
                         dtype=object)
    for h, cl in cutoffs.items():
        m = hosts_np == h
        if not m.any():
            continue
        for cp, cu in cl:
            rank[m] += ((pri[m] < cp)
                        | ((pri[m] == cp) & (urls_np[m] > cu)))
    return rank


def _fetch_rows(tbl: pa.Table, store, metrics,
                at_on: bool) -> pa.Table | None:
    """Fetch join against the page store, split by fetch bucket.
    Per-bucket store reads are IO-bound parquet scans — pyarrow releases
    the GIL, so a thread pool overlaps them (a sparse wave touches MANY
    buckets with few rows each; serial reads would dominate)."""
    fb = np.asarray(tbl.column("fetch_bucket").to_pylist())
    groups = [tbl.filter(pa.array(fb == b)) for b in np.unique(fb)]
    fetchfn = _timed_fetch(store, metrics, at_on)
    if len(groups) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(16, len(groups))) as ex:
            fouts = list(ex.map(fetchfn, groups))
    else:
        fouts = [fetchfn(groups[0])]
    fparts = [f for f in fouts if f is not None and f.num_rows]
    if not fparts:
        return None
    return pa.concat_tables(fparts, promote_options="default")


def _harvest_links_from(fetched: pa.Table | None,
                        link_hosts: frozenset) -> pa.Table:
    """Harvest CrawlSpider children (reference rules, S7) from pages
    this wave ALREADY fetched — link-host pages are read exactly once
    per wave on every execution path."""
    if not link_hosts or fetched is None or fetched.num_rows == 0:
        return CHILD_SCHEMA.empty_table()
    from ..sources.stage import harvest_links_batch
    lmask = pc.is_in(fetched.column("host"),
                     value_set=pa.array(sorted(link_hosts)))
    if not pc.any(lmask).as_py():
        return CHILD_SCHEMA.empty_table()
    return harvest_links_batch(fetched.filter(lmask))


def _harvest_in_task(fetched: pa.Table, link_hosts: frozenset,
                     links_dir: str | None, equivalent_domains,
                     num_buckets: int, metrics) -> None:
    """Bucketed-path variant: harvested children leave the task as a
    bucketed side-spill (the driver never sees them)."""
    children = _harvest_links_from(fetched, link_hosts)
    if children.num_rows:
        n_link = spill_bucketed(
            canonicalize_batch(children, equivalent_domains),
            links_dir, num_buckets)
        metrics.incr({"link_children": n_link})


def _link_hosts_of(tbl: pa.Table) -> frozenset:
    """Hosts in this wave that declare LinkExtractor-style rules."""
    from ..extract.siterules import rules_for_host
    return frozenset(h for h in set(tbl.column("host").to_pylist())
                     if rules_for_host(h).link_allow
                     or rules_for_host(h).link_restrict_xpaths)


class CrawlPipeline:
    """Owns the seen-shard pool, page store and checkpoint state across
    waves. Ray must already be initialized by the caller."""

    def __init__(self, cfg: CrawlConfig, pages_path: str | list[str],
                 store_dir: str, robots_bodies: dict[str, str] | None = None):
        self.cfg = cfg
        self.store = build_page_store(pages_path, store_dir,
                                      num_buckets=cfg.num_fetch_buckets)
        self.seen = SeenSet(num_shards=cfg.num_seen_shards,
                            maxfetches=cfg.maxfetches,
                            refetchsecs=cfg.refetchsecs,
                            agelimit=cfg.agelimit)
        self.ckpt = CheckpointManager(cfg.checkpoint_dir)
        self.robots = RobotsIndex(robots_bodies or {})
        self.metrics: dict[str, float] = {"scheduled_urls": 0,
                                          "extracted_pages": 0,
                                          "fetched_rows": 0}
        from ..state.metrics import Metrics
        self.extract_metrics = Metrics()
        self._pending_bucketed: list = []
        self.throttle = None
        self._host_budgets: dict[str, int] = {}
        self._at_snap: dict[str, int] = {}
        if cfg.autothrottle:
            from ..frontier.autothrottle import AutoThrottle
            self.throttle = AutoThrottle(
                start_delay=cfg.autothrottle_start_delay,
                max_delay=cfg.autothrottle_max_delay,
                target_concurrency=cfg.autothrottle_target_concurrency,
                download_delay=cfg.download_delay)
            self._host_budgets = self.throttle.budgets(
                [], cfg.autothrottle_wave_seconds, cfg.per_host_budget)
        self._warm_workers()

    def _budget_of(self, host: str) -> int:
        cap = self.cfg.per_host_budget
        if self.throttle is not None:
            # unseen hosts start at start_delay (Scrapy semantics), so
            # the throttle answers for EVERY host, not just observed ones
            return self.throttle.budget_of(
                host, self.cfg.autothrottle_wave_seconds, cap)
        hb = self._host_budgets.get(host)
        return cap if hb is None else min(cap, hb)

    def _at_default_budget(self) -> int | None:
        """Budget for hosts the throttle has not observed yet (the
        start_delay-implied one); None when AutoThrottle is off."""
        if self.throttle is None:
            return None
        return self.throttle.budget_of(
            "\x00unseen", self.cfg.autothrottle_wave_seconds,
            self.cfg.per_host_budget)

    def _update_autothrottle(self) -> None:
        """Wave epilogue: fold the wave's per-host mean fetch latency
        (shipped as at_us:/at_n: counters by the fetch sites) into the
        throttle and refresh next wave's per-host budgets. O(#hosts)."""
        if self.throttle is None:
            return
        snap = self.extract_metrics.snapshot()
        for k, v in snap.items():
            if not k.startswith("at_n:"):
                continue
            host = k[5:]
            n = v - self._at_snap.get(k, 0)
            if n <= 0:
                continue
            us = (snap.get("at_us:" + host, 0)
                  - self._at_snap.get("at_us:" + host, 0))
            self.throttle.observe(host, (us / n) / 1e6)
        self._at_snap = snap
        self._host_budgets = self.throttle.budgets(
            self.throttle.delays, self.cfg.autothrottle_wave_seconds,
            self.cfg.per_host_budget)

    def _warm_workers(self) -> None:
        """Force worker-pool spin-up + library imports BEFORE the first
        wave so cold-start cost is paid at pipeline construction, not
        inside the crawl (one dummy task per CPU importing the package
        modules the wave UDFs need)."""

        def _touch(batch):
            import pandas  # noqa: F401

            from ..extract import stage  # noqa: F401
            return batch

        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            (ray.data.range(ncpu, override_num_blocks=ncpu)
             .map_batches(_touch, batch_size=None).materialize())
        except Exception:
            pass

    # -- single wave ------------------------------------------------------
    def run_wave(self, wave: int, frontier: pa.Table) -> pa.Table:
        """Process one wave; returns the next wave's frontier table."""
        cfg = self.cfg
        now_us = _now_us(cfg)
        t0 = time.time()
        phases: dict[str, float] = {}

        def mark(name: str) -> None:
            phases[name] = round(time.time() - t0 - sum(phases.values()), 3)

        self.seen.new_wave()

        # 1. canonicalize + key (canonicalize-before-ledger,
        #    settings.py:121-124) and in-wave exact dedup. The per-URL
        #    kernel runs distributed above the threshold — on a 10^10
        #    frontier this is a pure map stage, never a driver loop.
        if frontier.num_rows > cfg.ray_canon_threshold:
            eq = cfg.equivalent_domains
            cand_ds = ray.data.from_arrow(frontier).map_batches(
                lambda b, _eq=eq: canonicalize_batch(b, _eq),
                batch_format="pyarrow",
                zero_copy_batch=True).materialize()
            cand = pa.concat_tables(
                [ray.get(r) for r in cand_ds.to_arrow_refs()],
                promote_options="default").combine_chunks()
        else:
            cand = canonicalize_batch(frontier, cfg.equivalent_domains)
        cand = dedupe_wave(cand)
        mark("canonicalize")

        # 2. seen gate (sharded actor probe; trawled rows bypass the gate —
        #    refetchcontrol.py:205-212)
        keys = cand.column("key").to_pylist()
        hashes = np.asarray(cand.column("url_hash").to_pylist(),
                            dtype=np.uint64)
        passes = np.asarray(cand.column("pass_seen").to_pylist(), dtype=bool)
        trawled = np.asarray(cand.column("trawled").to_pylist(), dtype=bool)
        allowed, prev = self.seen.check(keys, hashes, now_us,
                                        pass_flags=passes)
        allowed = allowed | trawled
        # trawled rows carry their own previous-fetch count in meta
        cand = cand.append_column("previousfetches",
                                  pa.array(prev, type=pa.int32()))
        gated = cand.filter(pa.array(allowed))
        mark("gate")

        # 3. robots gate (T6)
        if self.cfg.obey_robots and gated.num_rows:
            mask = self.robots.allowed_mask(
                gated.column("host").to_pylist(),
                gated.column("canon_url").to_pylist())
            gated = gated.filter(pa.array(mask))

        # 4. politeness schedule: salted grouped top-k; overflow deferred
        scheduled, deferred = schedule_wave(
            gated, cfg.per_host_budget, cfg.salt_threshold,
            host_budgets=self._host_budgets or None,
            default_budget=self._at_default_budget())
        self.metrics["scheduled_urls"] += scheduled.num_rows
        mark("schedule")

        # 5. split control plane (discovery fetches: robots / sitemaps /
        #    feeds — always tiny) from data plane (article pages)
        kinds = scheduled.column("source_kind")
        disc_mask = pc.is_in(kinds, value_set=pa.array(
            list(DISCOVERY_KINDS), type=pa.string()))
        disc_tbl = scheduled.filter(disc_mask)
        art_tbl = scheduled.filter(pc.invert(disc_mask))

        # 6. discovery expansion and article processing are independent —
        #    run them CONCURRENTLY (both mostly wait on Ray) so control-
        #    plane parse time hides behind the data-plane pipeline.
        #    Link-host children (S7) come back from _process_articles,
        #    harvested in-task from the SAME fetch extraction uses.
        if disc_tbl.num_rows and art_tbl.num_rows:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as ex:
                fut_d = ex.submit(self._process_discovery, disc_tbl, wave,
                                  now_us)
                fut_a = ex.submit(self._process_articles, art_tbl, wave,
                                  now_us)
                children = fut_d.result()
                n_extracted, n_fetched, link_children = fut_a.result()
        else:
            children = self._process_discovery(disc_tbl, wave, now_us)
            n_extracted, n_fetched, link_children = self._process_articles(
                art_tbl, wave, now_us)
        mark("discovery+articles")
        # discovery rows are counted as scheduled-for-fetch (an upper
        # bound: control-plane fetch misses are rare and not returned
        # by _process_discovery)
        n_fetched += disc_tbl.num_rows
        self.metrics["fetched_rows"] += n_fetched
        self.metrics["extracted_pages"] += n_extracted

        next_frontier = _concat_frontier([deferred, children,
                                          link_children])

        # 7. checkpoint: seen snapshots + next frontier + manifest
        self.seen.snapshot(self.ckpt.seen_dir)
        self.ckpt.write_frontier(wave + 1, next_frontier)
        self.ckpt.commit_wave(wave, {
            "wave": wave,
            "rows_in": frontier.num_rows,
            "candidates": cand.num_rows,
            "gated": gated.num_rows,
            "scheduled": scheduled.num_rows,
            "deferred": deferred.num_rows,
            "fetched": n_fetched,
            "extracted": n_extracted,
            "children": children.num_rows,
            "seen_counters": self.seen.counters(),
            "extract_counters": self.extract_metrics.snapshot(),
            "pending_bucketed": [b.to_manifest()
                                 for b in self._pending_bucketed],
            "phase_sec": phases,
            "wall_sec": round(time.time() - t0, 3),
        })
        return next_frontier

    def _with_buckets(self, tbl: pa.Table) -> pa.Table:
        if "fetch_bucket" in tbl.column_names:
            tbl = tbl.drop_columns(["fetch_bucket"])
        hashes = np.asarray(tbl.column("url_hash").to_pylist(),
                            dtype=np.uint64)
        buckets = self.store.bucket_of(hashes)
        return tbl.append_column("fetch_bucket",
                                 pa.array(buckets, type=pa.int64()))

    def _fetch_driver(self, tbl: pa.Table) -> pa.Table | None:
        """Driver-side bucketed fetch join for SMALL tables (control-plane
        discovery fetches and tiny article waves). Per-bucket reads are
        IO-bound parquet scans — a thread pool overlaps them (pyarrow
        releases the GIL), cutting the serial per-wave driver cost that
        otherwise caps scaling efficiency."""
        if tbl.num_rows == 0:
            return None
        tbl = self._with_buckets(tbl)
        buckets = np.asarray(tbl.column("fetch_bucket").to_pylist())
        groups = [tbl.filter(pa.array(buckets == b))
                  for b in np.unique(buckets)]
        fetchfn = _timed_fetch(self.store, self.extract_metrics,
                               self.cfg.autothrottle)
        if len(groups) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(
                    max_workers=min(16, len(groups))) as ex:
                outs = list(ex.map(fetchfn, groups))
        else:
            outs = [fetchfn(groups[0])]
        parts = [o for o in outs if o is not None and o.num_rows]
        if not parts:
            return None
        return pa.concat_tables(parts, promote_options="default")

    def _process_discovery(self, disc_tbl: pa.Table, wave: int,
                           now_us: int) -> pa.Table:
        """Control-plane expansion: robots/sitemap/feed bodies are few and
        small, so they are fetched and parsed on the driver — no Ray
        round-trips for waves that move only a handful of rows."""
        if disc_tbl.num_rows == 0:
            return CHILD_SCHEMA.empty_table()
        if disc_tbl.num_rows <= self.cfg.ray_discovery_rows:
            fetched = self._fetch_driver(disc_tbl)
            if fetched is None:
                return CHILD_SCHEMA.empty_table()
            return discover_batch(fetched)
        # many feed/sitemap bodies (each can hold tens of thousands of
        # <url> entries): fetch AND parse inside per-bucket Ray tasks —
        # the multi-MB XML bodies never ship through the object store.
        # Article children are canonicalized IN the task and spilled to
        # per-fetch-bucket parquet (BucketedFrontier); only discovery-kind
        # children (sitemap shards — always few) and per-host counts come
        # back to the driver.
        store = self.store
        eq = self.cfg.equivalent_domains
        num_buckets = store.num_buckets
        frontier_dir = os.path.join(self.ckpt.dir,
                                    f"frontier-bucketed-{wave + 1:04d}")
        # the loader scans the dir's sidecars: orphan parts from a crashed
        # earlier attempt at this wave must not double-count
        import shutil
        shutil.rmtree(frontier_dir, ignore_errors=True)
        os.makedirs(frontier_dir, exist_ok=True)
        tbl = self._with_buckets(disc_tbl)
        buckets = np.asarray(tbl.column("fetch_bucket").to_pylist())
        uniq = np.unique(buckets)
        # cap the task fan-out: each spill task writes one part into
        # EVERY target bucket, so #tasks x #buckets parts land on disk —
        # one task per CPU keeps the parse+canonicalize+spill wave fully
        # parallel (it is a whole-corpus pass at crawl start) while
        # bounding the per-bucket tiny-file count at #CPUs
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        max_tasks = max(8, ncpu)
        groups = np.array_split(uniq, min(len(uniq), max_tasks))
        parts = [tbl.filter(pa.array(np.isin(buckets, g)))
                 for g in groups if len(g)]

        def fetch_discover_spill(group: pa.Table) -> pa.Table:
            gb = np.asarray(group.column("fetch_bucket").to_pylist())
            fparts = []
            for b in np.unique(gb):
                f = store.fetch_group(group.filter(pa.array(gb == b)))
                if f is not None and f.num_rows:
                    fparts.append(f)
            if not fparts:
                return _DISC_RESULT_SCHEMA.empty_table()
            fetched = pa.concat_tables(fparts, promote_options="default")
            children = discover_batch(fetched)
            if children.num_rows == 0:
                return _DISC_RESULT_SCHEMA.empty_table()
            kinds = children.column("source_kind")
            dmask = pc.is_in(kinds, value_set=pa.array(
                list(DISCOVERY_KINDS), type=pa.string()))
            disc_children = children.filter(dmask)
            art_children = children.filter(pc.invert(dmask))
            if art_children.num_rows:
                spill_bucketed(canonicalize_batch(art_children, eq),
                               frontier_dir, num_buckets)
            rows = [{"child_json": json.dumps(child)}
                    for child in disc_children.to_pylist()]
            return pa.Table.from_pylist(rows, schema=_DISC_RESULT_SCHEMA)

        # materialize BEFORE to_arrow_refs: the lazy path runs an extra
        # limit-1 schema probe that re-executes (and then cancels) the
        # side-effecting spill tasks — a cancelled task can be killed
        # mid-write
        ds = ray.data.from_arrow(parts).map_batches(
            fetch_discover_spill, batch_format="pyarrow",
            batch_size=None).materialize()
        results = [ray.get(r) for r in ds.to_arrow_refs()]
        results = [t for t in results if t.num_rows]
        disc_children_rows = [
            json.loads(r["child_json"])
            for t in results for r in t.to_pylist()]
        disc_children = (pa.Table.from_pylist(disc_children_rows,
                                              schema=CHILD_SCHEMA)
                         if disc_children_rows
                         else CHILD_SCHEMA.empty_table())
        bf = load_bucketed_frontier(frontier_dir)
        if bf is not None:
            self._pending_bucketed.append(bf)
        return disc_children

    def _politeness_cutoffs(self, bf: BucketedFrontier, over: set[str],
                            now_us: int) -> dict[str, list[tuple[int, str]]]:
        """Exact cross-bucket per-host top-k without driver frontier
        materialization: each participating bucket-group task (task count
        sized by over-host row volume; driver-side below the small-wave
        threshold) gates its over-budget-host rows (dry-run — no
        counter/keysrqd mutation, identical verdicts to the real gate)
        and returns only its LOCAL top-``budget x K + 1`` (priority,
        canon_url) keys per host (the +1 is the witness that rank K-1
        overflows — without it the last rank's cutoff could never emit);
        the per-group partials are merged in a distributed
        ``groupby(host).map_groups`` reduce, so the driver receives only
        the final O(#over-hosts x lookahead) cutoff rows (below the
        small-wave threshold the merge runs driver-side on the same
        O(#groups x budget x K) keys) and derives nothing further:
        each row already names a host's global cutoff for the next K waves
        (K = ``politeness_lookahead``): cutoffs[h][r] bounds the rows
        host h may schedule in wave now+r. Rows are totally ordered by
        (priority desc, canon_url asc) — canon_url is unique per host
        after in-bucket dedup because equal URLs always hash to the same
        bucket — so filtering each bucket by the rank-0 cutoff reproduces
        the table path's ``schedule_wave`` selection exactly (per-domain
        budget semantics, reference settings.py:88-94), and the later
        ranks pre-compute the NEXT waves' selections so deferral chains
        stop paying one pre-pass per wave."""
        import pandas as pd

        cfg = self.cfg
        seen = self.seen
        robots = self.robots if cfg.obey_robots else None
        # per-host budgets: the static cap, tightened by AutoThrottle
        # when enabled (absent hosts keep the cap)
        bud_of = {h: self._budget_of(h) for h in over}
        lookahead = max(1, cfg.politeness_lookahead)
        # +1 witness key per host: the r-th cutoff may only emit when a
        # row EXISTS beyond position (r+1)*budget-1, so a cap of exactly
        # budget*lookahead could never prove the last rank overflows —
        # the final virtual wave would silently swallow the whole
        # overflow tail (budget violation), and lookahead=1 would emit
        # no cutoffs at all
        cap_of = {h: b * lookahead + 1 for h, b in bud_of.items()}
        local_cap = max(cap_of.values()) if cap_of else 0
        over_arr = pa.array(sorted(over), type=pa.string())
        # lazy columnar scan for JUST the over hosts — the driver never
        # holds per-bucket counts for the full host set (spill.py v2)
        hbc = bf.bucket_counts_for(over)
        over_rows_of: dict[int, int] = {}
        if hbc:
            for h in over:
                for b, c in hbc.get(h, {}).items():
                    over_rows_of[b] = over_rows_of.get(b, 0) + c
            want = sorted(over_rows_of)
        else:  # counts missing (old manifest): all buckets participate
            want = sorted(bf.bucket_files)
        want = [b for b in want if b in bf.bucket_files]
        # task granularity scales with the OVER-HOST row volume (known
        # from the sidecar counts), not the bucket count — a small wave
        # must not pay 128 task launches x 8 seen-shard RPC storms each.
        # Per-host local top-k over a multi-bucket group is still a
        # superset of the host's global top-k, so cutoffs are unchanged.
        total_over = (sum(over_rows_of.values()) if over_rows_of
                      else bf.num_rows)
        n_groups = min(len(want), max(1, -(-total_over // 6000)))
        group_sz = -(-len(want) // max(1, n_groups))
        items = [{"group": g,
                  "paths": [p for b in want[g * group_sz:(g + 1) * group_sz]
                            for p in bf.bucket_files[b]]}
                 for g in range(n_groups)]
        items = [it for it in items if it["paths"]]
        cols = ["key", "url_hash", "pass_seen", "trawled", "host",
                "canon_url", "priority"]
        key_schema = pa.schema([("host", pa.string()),
                                ("priority", pa.int64()),
                                ("canon_url", pa.string())])

        def local_topk(batch: pa.Table) -> pa.Table:
            import pyarrow.dataset as _pads
            outs = []
            for row in batch.to_pylist():
                tbl = _pads.dataset(row["paths"],
                                    format="parquet").to_table(columns=cols)
                tbl = tbl.filter(pc.is_in(tbl.column("host"),
                                          value_set=over_arr))
                if tbl.num_rows == 0:
                    continue
                tbl = dedupe_wave(tbl)
                keys = tbl.column("key").to_pylist()
                hashes = np.asarray(tbl.column("url_hash").to_pylist(),
                                    dtype=np.uint64)
                passes = np.asarray(tbl.column("pass_seen").to_pylist(),
                                    dtype=bool)
                allowed, _ = seen.check(keys, hashes, now_us,
                                        pass_flags=passes, dry=True)
                allowed |= np.asarray(tbl.column("trawled").to_pylist(),
                                      dtype=bool)
                tbl = tbl.filter(pa.array(allowed))
                if robots is not None and tbl.num_rows:
                    mask = robots.allowed_mask(
                        tbl.column("host").to_pylist(),
                        tbl.column("canon_url").to_pylist())
                    tbl = tbl.filter(pa.array(mask))
                if tbl.num_rows == 0:
                    continue
                idx = pc.sort_indices(
                    tbl, sort_keys=[("priority", "descending"),
                                    ("canon_url", "ascending")])
                tbl = tbl.take(idx)
                hosts = pd.Series(tbl.column("host").to_pylist())
                keep = (hosts.groupby(hosts, sort=False).cumcount()
                        < hosts.map(cap_of).fillna(local_cap))
                outs.append(tbl.filter(pa.array(keep.to_numpy()))
                            .select(["host", "priority", "canon_url"])
                            .cast(key_schema))
            if not outs:
                return key_schema.empty_table()
            return pa.concat_tables(outs)

        per_host_budget = cfg.per_host_budget

        def _derive(df) -> list[tuple[str, int, int, str]]:
            """Global cutoff keys for ONE host's merged local-top-k rows:
            (host, rank, priority, canon_url) per emitted rank."""
            df = df.sort_values(["priority", "canon_url"],
                                ascending=[False, True], kind="mergesort")
            h = df["host"].iloc[0]
            budget_h = bud_of.get(h, per_host_budget)
            rows = []
            for r in range(lookahead):
                pos = (r + 1) * budget_h - 1
                if len(df) <= pos + 1:
                    break  # everything up to here fits — no more cutoffs
                rows.append((h, r, int(df["priority"].iloc[pos]),
                             str(df["canon_url"].iloc[pos])))
            return rows

        # the merged local-top-k volume is bounded IN ADVANCE by the
        # sidecar counts: each host contributes at most cap_of[h] keys
        # per group, and never more rows than it has
        if over_rows_of and hbc:
            est_keys = sum(
                min(sum(hbc.get(h, {}).values()),
                    cap_of.get(h, local_cap) * max(1, len(items)))
                for h in over)
        else:
            est_keys = total_over

        def _derive_driver(merged: pa.Table) -> list:
            return [t for _, grp in merged.to_pandas()
                    .groupby("host", sort=False)
                    for t in _derive(grp)]

        if total_over <= cfg.small_wave_rows:
            # tiny over-volume: one driver-side scan beats a Ray job
            merged = local_topk(pa.Table.from_pylist(items))
            if merged.num_rows == 0:
                return {}
            key_rows = _derive_driver(merged)
        elif est_keys <= 250_000:
            # bounded merge volume (<= ~25 MB transient): scan the
            # buckets distributed but merge driver-side — a per-wave
            # groupby shuffle costs more than it saves at this size
            # (BENCH r4: +20% on the budget-bound crawl when every wave
            # paid the all-to-all for kilorow key tables)
            scan = ray.remote(num_cpus=1)(local_topk)
            merged_tbl = pa.concat_tables(
                [t for t in ray.get(
                    [scan.remote(pa.Table.from_pylist([it]))
                     for it in items])
                 if t.num_rows] or [key_schema.empty_table()])
            if merged_tbl.num_rows == 0:
                return {}
            key_rows = _derive_driver(merged_tbl)
        else:
            # distributed per-host reduce: the groupby brings every
            # group's local top-k for a host together in ONE task, which
            # emits only that host's <= lookahead cutoff keys — the
            # driver receives O(#over-hosts x lookahead) rows, never the
            # O(#over-hosts x #groups x budget x lookahead) key tables
            # (observed: ~250 MB driver growth per 10M-row wave before
            # this, stress_frontier.py)
            def host_cutoffs(df):
                out = _derive(df)
                return pd.DataFrame(
                    out, columns=["host", "rank", "priority", "canon_url"])

            ds = (ray.data.from_items(items)
                  .map_batches(local_topk, batch_format="pyarrow",
                               batch_size=1).materialize())
            if ds.count() == 0:
                return {}
            small = ds.groupby("host").map_groups(host_cutoffs).to_pandas()
            key_rows = [(r.host, int(r.rank), int(r.priority),
                         str(r.canon_url))
                        for r in small.itertuples(index=False)]

        cutoffs: dict[str, list[tuple[int, str]]] = {}
        for h, r, prio, cu in sorted(key_rows, key=lambda t: (t[0], t[1])):
            cutoffs.setdefault(h, []).append((prio, cu))
        return cutoffs

    @staticmethod
    def _outputs_marker_of(bf: BucketedFrontier) -> dict | None:
        """The spill's OUTPUTS marker payload, if its fetch/extract
        outputs already completed in a crashed run (see
        ``_replay_bucketed_commit``)."""
        path = os.path.join(bf.directory, "OUTPUTS.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _write_outputs_marker(self, bf: BucketedFrontier,
                              payload: dict) -> None:
        """Atomically record that every fetch/extract output of this
        spill is fully on disk, plus what the commit epilogue needs to
        replay. Written AFTER the last task finishes and BEFORE the seen
        snapshot: a crash anywhere in the epilogue resumes via
        ``_replay_bucketed_commit`` instead of a destructive
        reprocess."""
        path = os.path.join(bf.directory, "OUTPUTS.json")
        with open(path + ".tmp", "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(path + ".tmp", path)

    @staticmethod
    def _write_next_marker(src_dir: str, nxt_dir: str,
                           parent: str) -> None:
        """Durable tmp+rename publish of a deferral-chain NEXT record
        — a torn NEXT would wedge the chain on every resume (the
        successor release json.load would crash the run repeatedly)."""
        path = os.path.join(src_dir, "NEXT")
        with open(path + ".tmp", "w") as f:
            json.dump({"dir": nxt_dir, "parent": parent}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(path + ".tmp", path)

    def _replay_bucketed_commit(self, wave: int, bf: BucketedFrontier,
                                payload: dict, primary: bool = True,
                                piece: int = 0) -> int:
        """Commit-epilogue replay for a spill whose outputs completed
        but whose manifest/COMPLETE never landed (crash in the
        snapshot->manifest window). The OUTPUTS marker is written only
        after every fetch/extract task finished, so the outputs on disk
        are whole: replay re-registers the recorded pending side-spills
        (deferral ranks, window overflow, link children), re-counts the
        extracted rows from the output files, snapshots the ledger and
        commits the manifest WITHOUT re-fetching. Re-fetching would be
        wrong twice over: it rmtree's complete outputs and then drops
        every row whose ledger commit DID reach the crashed snapshot
        (recently-fetched skip) — i.e. it loses data. Ledger commits
        that MISSED the snapshot are accepted as lost, matching the
        reference: RISJbot's sqlite ledger syncs at spider close
        (refetchcontrol.py:90-129), so a crash loses them there too
        while already-shipped items stay shipped. Returns the number of
        waves the original job consumed (1 for single waves, ``k_used``
        for windows)."""
        import glob as _glob

        import pyarrow.parquet as _pq
        _t0 = time.time()
        have = {b.directory for b in self._pending_bucketed}
        for p in payload.get("pending", []):
            d = p["dir"]
            if d in have or os.path.exists(os.path.join(d, "COMPLETE")):
                continue
            nbf = load_bucketed_frontier(d)
            if nbf is not None:
                nbf.parent = p.get("parent")
                self._pending_bucketed.append(nbf)
                have.add(d)
        out_dirs = payload.get("out_dirs", [])
        n_extracted = sum(
            _pq.read_metadata(f).num_rows
            for d in out_dirs
            for f in _glob.glob(os.path.join(d, "*.parquet")))
        n_scheduled = int(payload.get("scheduled", n_extracted))
        self.metrics["scheduled_urls"] += n_scheduled
        self.metrics["extracted_pages"] += n_extracted
        self.metrics["fetched_rows"] += n_extracted
        self.seen.snapshot(self.ckpt.seen_dir)
        waves = max(1, int(payload.get("waves", 1)))
        commit = (self.ckpt.commit_wave if primary
                  else lambda w, m: self.ckpt.commit_wave_suffixed(
                      w, f"b{piece}", m))
        commit(wave + waves - 1, {
            "wave": wave + waves - 1,
            "mode": payload.get("mode", "bucketed"),
            "replayed": True,
            "waves": waves,
            "rows_in": bf.num_rows,
            "scheduled": n_scheduled,
            "deferred": int(payload.get("deferred", 0)),
            "fetched": n_extracted,
            "extracted": n_extracted,
            "children": 0,
            "buckets": len(bf.bucket_files),
            "out_dirs": out_dirs,
            "seen_counters": self.seen.counters(),
            "pending_bucketed": [b.to_manifest()
                                 for b in self._pending_bucketed],
            "wall_sec": round(time.time() - _t0, 3),
        })
        for d in [bf.directory] + (bf.sources or []):
            with open(os.path.join(d, "COMPLETE"), "w") as f:
                f.write("ok")
        return waves

    def _link_harvest_setup(self, bf: BucketedFrontier
                            ) -> tuple[frozenset, str | None]:
        """Link-crawl hosts (buzzfeed/bild-style CrawlSpider rules):
        their article pages are ALSO discovery surfaces. Returns the
        host set and a fresh side-spill dir for harvested children
        (None when no host in the wave has link rules). Names derive
        from the spill identity (hash-capped) so a resumed reprocessing
        regenerates identical dirs."""
        from ..extract.siterules import rules_for_host
        link_hosts = frozenset(
            h for h in bf.host_counts
            if rules_for_host(h).link_allow
            or rules_for_host(h).link_restrict_xpaths)
        if not link_hosts:
            return link_hosts, None
        import hashlib as _hl
        import shutil
        lbase = "links-" + os.path.basename(bf.directory)
        if len(lbase) > 100:
            lbase = "links-" + _hl.md5(lbase.encode()).hexdigest()[:16]
        links_dir = os.path.join(self.ckpt.dir, lbase)
        shutil.rmtree(links_dir, ignore_errors=True)
        return link_hosts, links_dir

    def _release_next_chain(self, bf: BucketedFrontier) -> None:
        """Successor release: if this spill (or a merged source) was a
        deferral rank, completing it unlocks the next rank's spill."""
        for d in [bf.directory] + (bf.sources or []):
            nxt_path = os.path.join(d, "NEXT")
            if not os.path.exists(nxt_path):
                continue
            with open(nxt_path) as f:
                info = json.load(f)
            if os.path.exists(os.path.join(info["dir"], "COMPLETE")):
                continue
            nbf = load_bucketed_frontier(info["dir"])
            if nbf is not None:
                nbf.parent = info.get("parent")
                self._pending_bucketed.append(nbf)

    def _register_links_pending(self, links_dir: str | None,
                                bf: BucketedFrontier) -> None:
        if links_dir is None:
            return
        lbf = load_bucketed_frontier(links_dir)
        if lbf is not None:
            lbf.parent = bf.directory
            self._pending_bucketed.append(lbf)

    @staticmethod
    def _task_groups(bf: BucketedFrontier) -> list[dict]:
        """Task granularity: one bucket per task for big waves; SMALL
        pieces group many buckets per task so a 6k-row wave doesn't pay
        128 task launches + tiny-file scans (~1.5k rows per task)."""
        sorted_buckets = sorted(bf.bucket_files.items())
        n_groups = min(len(sorted_buckets),
                       max(1, -(-bf.num_rows // 1500)))
        group_sz = -(-len(sorted_buckets) // n_groups)
        return [{"group": g, "paths": paths}
                for g in range(n_groups)
                if (paths := [p for _, files in
                              sorted_buckets[g * group_sz:
                                             (g + 1) * group_sz]
                              for p in files])]

    def _run_bucketed_wave(self, wave: int, bf: BucketedFrontier,
                           primary: bool = True, piece: int = 0) -> pa.Table:
        """Process a bucket-partitioned article frontier: ONE Ray task per
        fetch bucket runs dedup -> seen-gate -> robots -> politeness ->
        fetch join -> extract -> ledger commit; results stream to parquet.
        Nothing about the wave is O(rows) on the driver.

        When a host's wave volume exceeds ``per_host_budget``, a cheap
        key-column pre-pass computes per-host cutoff keys
        (``_politeness_cutoffs``); each bucket task keeps its rows within
        the cutoff and spills the politeness-deferred remainder as a NEW
        bucketed frontier for the next wave — per-domain queue semantics
        with zero driver materialization."""
        payload = self._outputs_marker_of(bf)
        if payload is not None:
            # the outer loop advances by ONE wave on this path, so the
            # replayed manifest must commit at the current index even if
            # the crashed job was a multi-wave window (LATEST must never
            # regress behind a later commit)
            self._replay_bucketed_commit(wave, bf,
                                         {**payload, "waves": 1},
                                         primary=primary, piece=piece)
            return CHILD_SCHEMA.empty_table()
        _t0 = time.time()
        cfg = self.cfg
        now_us = _now_us(cfg)

        over = {h for h, c in bf.host_counts.items()
                if c > self._budget_of(h)}
        cutoffs: dict[str, list[tuple[int, str]]] = {}
        deferred_dirs: dict[int, str] = {}
        import shutil
        if over:
            cutoffs = self._politeness_cutoffs(bf, over, now_us)
        if cutoffs:
            # deferral-rank dirs: rank r holds the rows wave now+r will
            # schedule (each within budget per host by construction, so
            # processing a rank needs NO pre-pass); the last rank holds
            # the overflow beyond the look-ahead horizon and pays its own
            # pre-pass if still over budget. Names derive from the PARENT
            # spill so a resumed reprocessing of the parent regenerates
            # identical dirs (hash-capped so chains can't grow the path).
            import hashlib as _hl
            dbase = "deferred-" + os.path.basename(bf.directory)
            if len(dbase) > 100:
                dbase = "deferred-" + _hl.md5(
                    dbase.encode()).hexdigest()[:16]
            max_rank = max(len(cl) for cl in cutoffs.values())
            for r in range(1, max_rank + 1):
                d = os.path.join(self.ckpt.dir, f"{dbase}-r{r:02d}")
                shutil.rmtree(d, ignore_errors=True)
                deferred_dirs[r] = d

        link_hosts, links_dir = self._link_harvest_setup(bf)

        seen = self.seen
        robots = self.robots if cfg.obey_robots else None
        store = self.store
        metrics = self.extract_metrics
        at_on = cfg.autothrottle
        extract_commit = self._extract_commit_fn(wave, now_us)
        # output dir derives from the SPILL identity, not the wave index:
        # a resumed run reprocessing this spill at a different wave index
        # rewrites the same dir (idempotent), never duplicates output
        wave_dir = f"{cfg.out_dir}/wave={os.path.basename(bf.directory)}"
        shutil.rmtree(wave_dir, ignore_errors=True)
        self.seen.new_wave()
        num_buckets = store.num_buckets

        def run_bucket(batch: pa.Table) -> pa.Table:
            import pyarrow.dataset as _pads
            outs = []
            # scheduled/deferred are LOAD-BEARING: the driver snapshots
            # them right after the job to write the outputs marker, so
            # they flush with ONE blocking incr at task end (task done
            # => delta processed); fire-and-forget incrs elsewhere in
            # this function may lag, but nothing reads them in-band
            n_sched = 0
            n_deferred = 0
            for row in batch.to_pylist():
                # one dataset scan over the group's parts (cheaper than
                # per-file read_table when a bucket holds many small
                # parts from fan-out spill tasks); a group may span
                # SEVERAL buckets when the piece is small — the fetch
                # join below re-splits by fetch_bucket
                tbl = _pads.dataset(row["paths"],
                                    format="parquet").to_table()
                tbl = _gate_rows(tbl, seen, robots, now_us)
                if cutoffs and tbl.num_rows:
                    # rank 0 is scheduled NOW, rank r spills to the
                    # wave-(now+r) deferral dir
                    rank = _rank_rows(tbl, cutoffs)
                    if (rank > 0).any():
                        for r in np.unique(rank[rank > 0]):
                            dropped = (tbl.filter(pa.array(rank == r))
                                       .drop_columns(["previousfetches"]))
                            n_def = spill_bucketed(
                                dropped, deferred_dirs[int(r)],
                                num_buckets)
                            n_deferred += n_def
                        tbl = tbl.filter(pa.array(rank == 0))
                n_sched += tbl.num_rows
                if tbl.num_rows == 0:
                    continue
                fetched = _fetch_rows(tbl, store, metrics, at_on)
                if fetched is None:
                    continue
                _harvest_in_task(fetched, link_hosts, links_dir,
                                 cfg.equivalent_domains, num_buckets,
                                 metrics)
                outs.append(extract_commit(fetched))
            metrics.incr_sync({"bucketed_scheduled": n_sched,
                               "bucketed_deferred": n_deferred})
            if not outs:
                return _empty_extracted()
            return pa.concat_tables(outs, promote_options="default")

        snap0 = metrics.snapshot()
        before = snap0.get("bucketed_scheduled", 0)
        before_def = snap0.get("bucketed_deferred", 0)
        items = self._task_groups(bf)
        if bf.num_rows <= cfg.small_wave_rows:
            # driver fast path (same threshold as the table path): a
            # politeness-rank or trickle wave of a few thousand rows pays
            # pyarrow-kernel cost, not a Ray Data job launch + task
            # round-trips — this is what keeps a long deferral chain's
            # per-wave overhead flat
            import pyarrow.parquet as _pq
            out = run_bucket(pa.Table.from_pylist(items))
            if out.num_rows:
                os.makedirs(wave_dir, exist_ok=True)
                _pq.write_table(out, f"{wave_dir}/part-driver.parquet")
        else:
            (ray.data.from_items(items)
             .map_batches(run_bucket, batch_format="pyarrow",
                          batch_size=1)
             .write_parquet(wave_dir))

        import glob

        import pyarrow.parquet as pq
        n_extracted = sum(pq.read_metadata(p).num_rows
                          for p in glob.glob(f"{wave_dir}/*.parquet"))
        snap = metrics.snapshot()
        n_scheduled = snap.get("bucketed_scheduled", 0) - before
        n_deferred = snap.get("bucketed_deferred", 0) - before_def
        pend0 = len(self._pending_bucketed)
        if deferred_dirs:
            # register only the FIRST non-empty rank as pending; each rank
            # dir gets a NEXT pointer to its successor so completing one
            # rank wave releases the next (one rank per wave — exact
            # table-path parity — with zero additional pre-passes)
            rank_bfs = []
            for r in sorted(deferred_dirs):
                rbf = load_bucketed_frontier(deferred_dirs[r])
                if rbf is not None:
                    rbf.parent = bf.directory
                    rank_bfs.append(rbf)
            if rank_bfs:
                self._pending_bucketed.append(rank_bfs[0])
                for cur, nxt in zip(rank_bfs, rank_bfs[1:]):
                    self._write_next_marker(cur.directory,
                                            nxt.directory,
                                            bf.directory)
        self._release_next_chain(bf)
        self._register_links_pending(links_dir, bf)
        self._write_outputs_marker(bf, {
            "mode": "bucketed",
            "scheduled": n_scheduled,
            "deferred": n_deferred,
            "out_dirs": [wave_dir],
            "pending": [{"dir": b.directory, "parent": b.parent}
                        for b in self._pending_bucketed[pend0:]],
        })
        self.metrics["scheduled_urls"] += n_scheduled
        self.metrics["extracted_pages"] += n_extracted
        self.metrics["fetched_rows"] += n_extracted
        self.seen.snapshot(self.ckpt.seen_dir)
        commit = (self.ckpt.commit_wave if primary
                  else lambda w, m: self.ckpt.commit_wave_suffixed(
                      w, f"b{piece}", m))
        commit(wave, {
            "wave": wave, "mode": "bucketed",
            "rows_in": bf.num_rows,
            "scheduled": n_scheduled,
            "deferred": n_deferred,
            "fetched": n_extracted,
            "extracted": n_extracted,
            "children": 0,
            "buckets": len(bf.bucket_files),
            "out_dir": wave_dir,
            "seen_counters": self.seen.counters(),
            "extract_counters": snap,
            "pending_bucketed": [b.to_manifest()
                                 for b in self._pending_bucketed],
            "wall_sec": round(time.time() - _t0, 3),
        })
        for d in [bf.directory] + (bf.sources or []):
            with open(os.path.join(d, "COMPLETE"), "w") as f:
                f.write("ok")
        return CHILD_SCHEMA.empty_table()

    def _run_bucketed_window(self, wave: int, bf: BucketedFrontier,
                             k: int) -> int:
        """Execute up to ``k`` politeness waves of one over-budget
        bucketed frontier as ONE job (virtual waves ``wave`` ..
        ``wave+k-1``); returns the number of virtual waves consumed.

        A politeness-bound tail is a chain of budget-sized waves; running
        them one driver iteration each pays the per-wave fixed costs
        (politeness pre-pass, seen snapshot, metrics round-trips, a full
        pruned store-read pass, a job launch) once PER WAVE — the
        dominant cost when each wave extracts for only a fraction of a
        second. This path pays them once per WINDOW: one cutoff pre-pass
        ranks every row into its virtual wave (identical per-wave
        scheduled sets to the sequential path — the cutoffs ARE the
        sequential path's rank spills, see ``_politeness_cutoffs``), one
        task set fetches each page exactly once grouped by store bucket,
        then extracts/commits per rank into per-rank output dirs. Rows
        ranked beyond the window spill to ONE overflow frontier and the
        next driver iteration re-ranks them (merged with any newly
        discovered pieces) under a fresh pre-pass. Per-host per-wave
        budgets hold exactly (reference settings.py:88-94): each rank is
        within budget by cutoff construction. AutoThrottle budgets are
        frozen for the window's K virtual waves and re-adapt between
        windows (the sequential path adapts per wave; the reference
        adapts per download — both are approximations of the same
        feedback loop, and the per-window grain is the price of paying
        the pre-pass once).

        Crash consistency matches the single-wave path at window
        granularity: outputs/overflow dirs derive from the spill
        identity (idempotent rewrite), ONE manifest commits at the
        window's last virtual-wave index after the seen snapshot, and
        COMPLETE markers land last — a crash mid-window resumes by
        reprocessing the whole spill, or, once the OUTPUTS marker is on
        disk (all tasks finished), by replaying just the commit
        epilogue (see ``_replay_bucketed_commit``)."""
        payload = self._outputs_marker_of(bf)
        if payload is not None:
            return self._replay_bucketed_commit(wave, bf, payload)
        cfg = self.cfg
        _t0 = time.time()
        now_us = _now_us(cfg)   # injectable clock, like every sibling
        import hashlib as _hl
        import shutil

        over = {h for h, c in bf.host_counts.items()
                if c > self._budget_of(h)}
        cutoffs = self._politeness_cutoffs(bf, over, now_us)
        base = os.path.basename(bf.directory)
        dbase = "deferred-" + base
        if len(dbase) > 100:
            dbase = "deferred-" + _hl.md5(dbase.encode()).hexdigest()[:16]
        overflow_dir = os.path.join(self.ckpt.dir, f"{dbase}-r{k:02d}")
        shutil.rmtree(overflow_dir, ignore_errors=True)

        link_hosts, links_dir = self._link_harvest_setup(bf)

        seen = self.seen
        robots = self.robots if cfg.obey_robots else None
        store = self.store
        metrics = self.extract_metrics
        at_on = cfg.autothrottle
        extract_commit = self._extract_commit_fn(wave, now_us)
        wave_dirs = [f"{cfg.out_dir}/wave={base}-w{r:02d}"
                     for r in range(k)]
        for d in wave_dirs:
            shutil.rmtree(d, ignore_errors=True)
        self.seen.new_wave()
        num_buckets = store.num_buckets

        def run_group(batch: pa.Table) -> pa.Table:
            import pyarrow.dataset as _pads
            import pyarrow.parquet as _pq
            # scheduling counts returned IN-BAND (the task's result),
            # not via the fire-and-forget metrics actor: actor deltas
            # from workers may still be in flight when the driver
            # snapshots after materialize(), and k_used / the commit
            # wave index must not race
            res: dict[str, int] = {}
            for row in batch.to_pylist():
                tbl = _pads.dataset(row["paths"],
                                    format="parquet").to_table()
                tbl = _gate_rows(tbl, seen, robots, now_us)
                if tbl.num_rows == 0:
                    continue
                # rank = the virtual wave this row schedules in (same
                # cutoff arithmetic as the sequential path)
                rank = _rank_rows(tbl, cutoffs)
                if cutoffs:
                    over_m = rank >= k
                    if over_m.any():
                        dropped = (tbl.filter(pa.array(over_m))
                                   .drop_columns(["previousfetches"]))
                        n_def = spill_bucketed(dropped, overflow_dir,
                                               num_buckets)
                        metrics.incr({"bucketed_deferred": n_def,
                                      "win_overflow": n_def})
                        res["win_overflow"] = \
                            res.get("win_overflow", 0) + n_def
                        keep = ~over_m
                        tbl = tbl.filter(pa.array(keep))
                        rank = rank[keep]
                if tbl.num_rows == 0:
                    continue
                deltas = {"bucketed_scheduled": tbl.num_rows,
                          "win_ranked": int((rank > 0).sum())}
                for r, n in zip(*np.unique(rank, return_counts=True)):
                    deltas[f"win_sched_r{int(r)}"] = int(n)
                metrics.incr(deltas)
                for key in ("win_ranked", *(k_ for k_ in deltas
                                            if k_.startswith("win_sched_r"))):
                    res[key] = res.get(key, 0) + deltas[key]
                # ONE store-read pass fetches every rank's rows together
                fetched = _fetch_rows(tbl, store, metrics, at_on)
                if fetched is None:
                    continue
                rank_of = dict(zip(tbl.column("canon_url").to_pylist(),
                                   rank.tolist()))
                frk = np.asarray(
                    [rank_of[u] for u in
                     fetched.column("canon_url").to_pylist()],
                    dtype=np.int64)
                _harvest_in_task(fetched, link_hosts, links_dir,
                                 cfg.equivalent_domains, num_buckets,
                                 metrics)
                for r in np.unique(frk):
                    out = extract_commit(
                        fetched.filter(pa.array(frk == r)),
                        wave_idx=wave + int(r))
                    if out.num_rows:
                        os.makedirs(wave_dirs[int(r)], exist_ok=True)
                        _pq.write_table(
                            out, f"{wave_dirs[int(r)]}"
                                 f"/part-g{row['group']:05d}.parquet")
            return pa.table({
                "metric": pa.array(list(res), pa.string()),
                "value": pa.array(list(res.values()), pa.int64())})

        items = self._task_groups(bf)
        if bf.num_rows <= cfg.small_wave_rows:
            count_parts = [run_group(pa.Table.from_pylist(items))]
        else:
            count_parts = ray.get(
                ray.data.from_items(items)
                .map_batches(run_group, batch_format="pyarrow",
                             batch_size=1)
                .materialize().to_arrow_refs())
        # counts come from the task RESULTS (deterministic), not from
        # a metrics-actor snapshot that in-flight deltas can race
        counts: dict[str, int] = {}
        for part in count_parts:
            for m, v in zip(part.column("metric").to_pylist(),
                            part.column("value").to_pylist()):
                counts[m] = counts.get(m, 0) + int(v)

        import glob

        import pyarrow.parquet as pq
        snap = metrics.snapshot()   # informational extract_counters
        #                             only; scheduling math uses the
        #                             in-band task results above

        rank_stats = []
        k_used = 1
        for r in range(k):
            s = counts.get(f"win_sched_r{r}", 0)
            e = sum(pq.read_metadata(p).num_rows
                    for p in glob.glob(f"{wave_dirs[r]}/*.parquet"))
            if s > 0:
                k_used = r + 1
            rank_stats.append({"wave": wave + r, "scheduled": s,
                               "extracted": e})
        rank_stats = rank_stats[:k_used]
        n_scheduled = sum(rs["scheduled"] for rs in rank_stats)
        n_extracted = sum(rs["extracted"] for rs in rank_stats)
        n_overflow = counts.get("win_overflow", 0)
        n_deferred = counts.get("win_ranked", 0) + n_overflow
        pend0 = len(self._pending_bucketed)
        obf = load_bucketed_frontier(overflow_dir)
        if obf is not None:
            obf.parent = bf.directory
            self._pending_bucketed.append(obf)
        # a merged source may be a rank spill from an old-style NEXT
        # chain (mixed-table waves still emit them); completing it here
        # must unlock its successor exactly like the single-wave path
        self._release_next_chain(bf)
        self._register_links_pending(links_dir, bf)
        self._write_outputs_marker(bf, {
            "mode": "bucketed-window",
            "scheduled": n_scheduled,
            "deferred": n_deferred,
            "waves": k_used,
            "out_dirs": wave_dirs[:k_used],
            "pending": [{"dir": b.directory, "parent": b.parent}
                        for b in self._pending_bucketed[pend0:]],
        })
        self.metrics["scheduled_urls"] += n_scheduled
        self.metrics["extracted_pages"] += n_extracted
        self.metrics["fetched_rows"] += n_extracted
        self.seen.snapshot(self.ckpt.seen_dir)
        self.ckpt.commit_wave(wave + k_used - 1, {
            "wave": wave + k_used - 1, "mode": "bucketed-window",
            "wave_first": wave, "waves": k_used,
            "rows_in": bf.num_rows,
            "scheduled": n_scheduled,
            "deferred": n_deferred,
            "overflow": n_overflow,
            "ranks": rank_stats,
            "fetched": n_extracted,
            "extracted": n_extracted,
            "children": 0,
            "buckets": len(bf.bucket_files),
            "out_dirs": wave_dirs[:k_used],
            "seen_counters": self.seen.counters(),
            "extract_counters": snap,
            "pending_bucketed": [b.to_manifest()
                                 for b in self._pending_bucketed],
            "wall_sec": round(time.time() - _t0, 3),
        })
        for d in [bf.directory] + (bf.sources or []):
            with open(os.path.join(d, "COMPLETE"), "w") as f:
                f.write("ok")
        return k_used

    def _extract_commit_fn(self, wave: int, now_us: int):
        """The fused extract+commit batch UDF (shared by the Ray pipeline
        and the driver fast path)."""
        seen = self.seen

        def prep_meta(batch: pa.Table) -> pa.Table:
            metas = (batch.column("meta").to_pylist()
                     if "meta" in batch.column_names
                     else [None] * batch.num_rows)
            prevs = batch.column("previousfetches").to_pylist()
            out_meta = []
            for m, p in zip(metas, prevs):
                meta = json.loads(m) if m else {}
                # a trawl-spilled row carries its TRUE ledger fetch
                # count in meta (seen.trawl_spill) and may be gate-
                # bypassed (prev 0 via the `| trawled` allow) — never
                # clobber a real count with the gate's placeholder
                if p is not None and not (
                        int(p) == 0
                        and meta.get("refetchcontrol_previous")):
                    meta["refetchcontrol_previous"] = int(p)
                out_meta.append(json.dumps(meta))
            if "meta" in batch.column_names:
                batch = batch.drop_columns(["meta"])
            return batch.append_column("meta",
                                       pa.array(out_meta, type=pa.string()))

        metrics = self.extract_metrics
        cfg = self.cfg
        enrich_holder: list = []  # built once per task process

        def get_enricher():
            if not cfg.enrich:
                return None
            if not enrich_holder:
                from ..enrich.stages import Enrich
                enrich_holder.append(Enrich(
                    sentiment=True, wordcount=True,
                    namedpeople=cfg.enrich_namedpeople,
                    readingage=cfg.enrich_readingage))
            return enrich_holder[0]

        def extract_commit(batch: pa.Table,
                           wave_idx: int | None = None) -> pa.Table:
            # wave_idx overrides the construction-time wave stamp: the
            # windowed politeness path (_run_bucketed_window) commits K
            # virtual waves through ONE closure (one enrichment build per
            # task, not per rank)
            batch = prep_meta(batch)
            # response URL is the canonical one (the fetch joined on it);
            # keep a copy for the ledger commit — the reference commits
            # response.url, not the item url (refetchcontrol.py:309)
            batch = batch.drop_columns(["url"])
            batch = batch.append_column(
                "resp_url", batch.column("canon_url"))
            batch = batch.rename_columns(
                ["url" if c == "canon_url" else c
                 for c in batch.column_names])
            from ..extract.page import ExtractStats as _ES
            stats = _ES()
            out = extract_batch(batch, passthrough=("key", "url_hash",
                                                    "pass_seen",
                                                    "resp_url"),
                                stats=stats)
            if metrics is not None:
                metrics.incr(stats.as_dict())
            if out.num_rows:
                mask = pc.invert(out.column("pass_seen"))
                commit_rows = out.filter(mask)
                if commit_rows.num_rows:
                    seen.commit(
                        commit_rows.column("key").to_pylist(),
                        commit_rows.column("resp_url").to_pylist(),
                        np.asarray(
                            commit_rows.column("url_hash").to_pylist(),
                            dtype=np.uint64),
                        now_us, wave if wave_idx is None else wave_idx)
            out = out.drop_columns(["key", "url_hash", "pass_seen",
                                    "resp_url"])
            enricher = get_enricher()
            if enricher is not None and out.num_rows:
                out = enricher(out)
            return out

        return extract_commit

    def _process_articles(self, art_tbl: pa.Table, wave: int,
                          now_us: int) -> tuple[int, int, pa.Table]:
        """Data plane: fetch join + extraction + ledger commit + write as
        ONE fused streaming pipeline (fetch groups feed extraction feeds
        the parquet sink with backpressure, no mid-pipeline
        materialization). Waves under ``small_wave_rows`` run on the
        driver — correctness-tier runs skip all Ray latency.

        Link-host pages (CrawlSpider rules, S7) are harvested from the
        SAME fetch this pipeline already does — in-band on the Ray path,
        directly on the driver path — so they are read once per wave
        (the bucketed path does the same via `_harvest_in_task`).
        Returns (n_extracted, n_fetched, link_children)."""
        if art_tbl.num_rows == 0:
            return 0, 0, CHILD_SCHEMA.empty_table()
        cfg = self.cfg
        link_hosts = _link_hosts_of(art_tbl)
        wave_dir = f"{cfg.out_dir}/wave={wave:04d}"
        # idempotent re-run: a crash between this wave's write and its
        # manifest commit leaves partial files — a resumed wave must
        # replace, not append (resumability contract, SURVEY.md section 4)
        import shutil
        shutil.rmtree(wave_dir, ignore_errors=True)
        extract_commit = self._extract_commit_fn(wave, now_us)

        if art_tbl.num_rows <= cfg.small_wave_rows:
            fetched = self._fetch_driver(art_tbl)
            if fetched is None:
                return 0, 0, CHILD_SCHEMA.empty_table()
            link_children = _harvest_links_from(fetched, link_hosts)
            out = extract_commit(fetched)
            if out.num_rows:
                os.makedirs(wave_dir, exist_ok=True)
                import pyarrow.parquet as pq
                pq.write_table(out, f"{wave_dir}/part-driver.parquet")
            return out.num_rows, fetched.num_rows, link_children

        store = self.store
        tbl = self._with_buckets(art_tbl)
        # Hash-partition the wave into one Arrow table per fetch bucket
        # (numpy masks — this IS the exchange a groupby would do, but the
        # wave is politeness-bounded and the buckets are already files, so
        # no Ray shuffle is needed). Each table becomes one block; the
        # fused fetch+extract+commit UDF runs once per bucket, reading
        # only that bucket's parquet file.
        buckets = np.asarray(tbl.column("fetch_bucket").to_pylist())
        parts = [tbl.filter(pa.array(buckets == b))
                 for b in np.unique(buckets)]

        def fetch_extract_commit(group: pa.Table) -> pa.Table:
            # writes its own part and returns counts plus harvested
            # link children IN-BAND — fetched != extracted whenever
            # pages fetch but fail extraction, and the counts must not
            # come from a racy metrics snapshot
            import pyarrow.parquet as _pq
            fetched = store.fetch_group(group)
            nf = 0 if fetched is None else fetched.num_rows
            ne = 0
            child_rows: list[dict] = []
            if nf:
                children = _harvest_links_from(fetched, link_hosts)
                child_rows = [{"fetched": 0, "extracted": 0,
                               "child_json": json.dumps(c)}
                              for c in children.to_pylist()]
                out = extract_commit(fetched)
                ne = out.num_rows
                if ne:
                    os.makedirs(wave_dir, exist_ok=True)
                    b = int(group.column("fetch_bucket")[0].as_py())
                    _pq.write_table(
                        out, f"{wave_dir}/part-b{b:05d}.parquet")
            rows = [{"fetched": nf, "extracted": ne,
                     "child_json": None}] + child_rows
            return pa.Table.from_pylist(rows, schema=_ART_RESULT_SCHEMA)

        ds = ray.data.from_arrow(parts)
        count_parts = ray.get(
            ds.map_batches(fetch_extract_commit, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
            .materialize().to_arrow_refs())
        n_fetched = sum(int(t.column("fetched").to_numpy().sum())
                        for t in count_parts if t.num_rows)
        n_extracted = sum(int(t.column("extracted").to_numpy().sum())
                          for t in count_parts if t.num_rows)
        child_rows = [json.loads(j)
                      for t in count_parts if t.num_rows
                      for j in t.column("child_json").to_pylist()
                      if j is not None]
        link_children = (pa.Table.from_pylist(child_rows,
                                              schema=CHILD_SCHEMA)
                         if child_rows else CHILD_SCHEMA.empty_table())
        return n_extracted, n_fetched, link_children

    # -- full run ---------------------------------------------------------
    def run(self, seeds: list[dict] | None = None,
            resume: bool = False) -> dict:
        cfg = self.cfg
        start_wave = 0
        restored_bucketed: list = []
        if resume:
            latest = self.ckpt.latest_wave()
            if latest is not None:
                self.seen.restore(self.ckpt.seen_dir)
                frontier = self.ckpt.read_frontier(latest + 1)
                start_wave = latest + 1
                # scan EVERY manifest (incl. suffixed piece manifests) for
                # spills lacking a COMPLETE marker — a wave that commits a
                # new manifest while a prior wave's spill is still being
                # processed must not orphan the in-flight spill on crash
                import glob as _glob
                pend: dict[str, BucketedFrontier] = {}
                for mpath in sorted(_glob.glob(
                        os.path.join(self.ckpt.dir, "wave-*.json"))):
                    with open(mpath) as f:
                        m = json.load(f)
                    for pb in m.get("pending_bucketed", []):
                        d = pb["directory"]
                        if d in pend or os.path.exists(
                                os.path.join(d, "COMPLETE")):
                            continue
                        nbf = BucketedFrontier.from_manifest(pb)
                        # None: slim manifest whose spill dir has no
                        # committed parts — nothing to resume there
                        if nbf is not None:
                            pend[d] = nbf
                # a pending deferred spill whose parent is ALSO pending is
                # dropped: reprocessing the parent regenerates it
                restored_bucketed = [
                    b for b in pend.values()
                    if not (b.parent and b.parent in pend)]
            else:
                resume = False
        if not resume:
            frontier = seed_frontier(seeds or [])

        # the frontier between waves is a list of PIECES: driver tables
        # (control plane, trawl, link children) and BucketedFrontier
        # spills (bulk article sets that never touch the driver)
        pieces: list = [frontier] if frontier is not None else []
        pieces.extend(restored_bucketed)
        wave = start_wave
        trawled_done = False
        t0 = time.time()
        while wave < cfg.max_waves:
            tables = [p for p in pieces if isinstance(p, pa.Table)
                      and p.num_rows]
            bucketed = [p for p in pieces
                        if isinstance(p, BucketedFrontier) and p.num_rows]
            # large article-table pieces (bulk seed lists, big child
            # sets) leave the driver NOW via a distributed spill; only
            # control-plane discovery rows stay on the table path
            kept_tables = []
            for t in tables:
                if t.num_rows <= cfg.ray_canon_threshold:
                    kept_tables.append(t)
                    continue
                dmask = pc.is_in(t.column("source_kind"),
                                 value_set=pa.array(
                                     list(DISCOVERY_KINDS),
                                     type=pa.string()))
                disc_t = t.filter(dmask)
                art_t = t.filter(pc.invert(dmask))
                if art_t.num_rows <= cfg.ray_canon_threshold:
                    kept_tables.append(t)
                    continue
                bf = self._spill_table_piece(wave, len(bucketed), art_t)
                if bf is not None:
                    bucketed.append(bf)
                if disc_t.num_rows:
                    kept_tables.append(disc_t)
            tables = kept_tables
            if not tables and not bucketed:
                # idle: trawl epilogue, once (refetchcontrol.py:132-195).
                # Each seen shard spills its eligible set directly as a
                # bucketed frontier — the trawl never lands on the driver.
                if cfg.refetchfromdb and not trawled_done:
                    trawled_done = True
                    tbf = self._trawl_bucketed(wave)
                    if tbf is not None:
                        pieces = [tbf]
                        continue
                break
            if len(bucketed) > 1:
                # a spill whose outputs already completed in a crashed
                # run (OUTPUTS marker) must keep its identity and go
                # through commit replay — merging it would re-fetch rows
                # whose ledger commit missed the crashed snapshot and
                # duplicate their output
                fresh = [b for b in bucketed
                         if self._outputs_marker_of(b) is None]
                done = [b for b in bucketed if b not in fresh]
                if len(fresh) > 1:
                    fresh = [self._merge_bucketed(fresh)]
                bucketed = done + fresh
            self._pending_bucketed = []
            next_pieces: list = []
            # bucketed-only over-budget wave => windowed politeness: run
            # up to K budget-sized virtual waves in ONE job (one
            # pre-pass / store pass / snapshot for the whole window)
            win_used = 0
            if (not tables and len(bucketed) == 1
                    and cfg.politeness_lookahead > 1):
                k = min(cfg.politeness_lookahead, cfg.max_waves - wave)
                if k >= 2 and any(
                        c > self._budget_of(h)
                        for h, c in bucketed[0].host_counts.items()):
                    win_used = self._run_bucketed_window(
                        wave, bucketed[0], k)
            if win_used == 0:
                if tables:
                    tbl = (tables[0] if len(tables) == 1
                           else _concat_frontier(tables))
                    nf = self.run_wave(wave, tbl)
                    if nf is not None and nf.num_rows:
                        next_pieces.append(nf)
                for i, bfp in enumerate(bucketed):
                    children = self._run_bucketed_wave(
                        wave, bfp, primary=(not tables and i == 0),
                        piece=i)
                    if children.num_rows:
                        next_pieces.append(children)
                if not tables:
                    # bucketed-only wave: persist any table children
                    # (link harvest) so a crash before the next table
                    # wave cannot lose them (run_wave persists its own)
                    child_tables = [p for p in next_pieces
                                    if isinstance(p, pa.Table)]
                    self.ckpt.write_frontier(
                        wave + 1, _concat_frontier(child_tables))
            next_pieces.extend(self._pending_bucketed)
            pieces = next_pieces
            self._update_autothrottle()
            wave += win_used or 1
        wall = time.time() - t0
        return {
            "waves": wave - start_wave,
            "wall_sec": round(wall, 3),
            "scheduled_urls": self.metrics["scheduled_urls"],
            "extracted_pages": self.metrics["extracted_pages"],
            "fetched_rows": self.metrics["fetched_rows"],
            "scheduled_per_sec": round(
                self.metrics["scheduled_urls"] / max(wall, 1e-9), 1),
            "extracted_per_sec": round(
                self.metrics["extracted_pages"] / max(wall, 1e-9), 1),
            "seen_counters": self.seen.counters(),
            "seen_size": self.seen.size(),
        }

    def _merge_bucketed(self, pieces: list[BucketedFrontier]
                        ) -> BucketedFrontier:
        """Merge several bucketed pieces into ONE logical wave piece: the
        per-host budget then applies JOINTLY (table-path parity — the
        table path schedules a wave's pieces together) and the wave pays
        one politeness pre-pass + one Ray job instead of one per piece.
        The merge is driver-side metadata only (file lists + counts);
        deterministic naming keeps resume idempotent."""
        import hashlib
        names = sorted(os.path.basename(p.directory) for p in pieces)
        tag = hashlib.md5("|".join(names).encode()).hexdigest()[:12]
        mdir = os.path.join(self.ckpt.dir, f"frontier-merged-{tag}")
        os.makedirs(mdir, exist_ok=True)
        bucket_files: dict[int, list[str]] = {}
        host_counts: dict[str, int] = {}
        # per-bucket detail is all-or-nothing: a PARTIAL merge (one
        # piece without counts) would make the politeness cutoff
        # pre-pass scan only the counted buckets and under-set the
        # cutoffs — so if ANY piece lacks BOTH stats files and legacy
        # eager counts, the merged piece carries neither and the
        # consumer takes its full-scan fallback. Otherwise stats files
        # merge as a path union (bucket_counts_for aggregates across
        # them) AND legacy eager dicts merge additively — a
        # mixed-generation piece (v1 checkpoint respilled under v2)
        # carries both, with the hb- stats covering only its v2 spills
        # and the eager dict its v1 parts; dropping either side would
        # under-count and let an over-budget host exceed its politeness
        # budget (bucket_counts_for sums the two per directory, and the
        # merged piece must preserve that).
        have_detail = all(p.stats_files or p.host_bucket_counts is not None
                          for p in pieces)
        stats_files: list[str] = []
        hbc: dict[str, dict[int, int]] = {}
        n = 0
        for p in pieces:
            n += p.num_rows
            for b, fs in p.bucket_files.items():
                bucket_files.setdefault(b, []).extend(fs)
            for h, c in p.host_counts.items():
                host_counts[h] = host_counts.get(h, 0) + c
            if have_detail:
                if p.stats_files:
                    stats_files.extend(p.stats_files)
                for h, bc in (p.host_bucket_counts or {}).items():
                    d = hbc.setdefault(h, {})
                    for b, c in bc.items():
                        d[b] = d.get(b, 0) + c
        return BucketedFrontier(mdir, n, host_counts, bucket_files,
                                (hbc or None) if have_detail else None,
                                sources=[p.directory for p in pieces],
                                stats_files=stats_files or None)

    def _spill_table_piece(self, wave: int, idx: int,
                           art_tbl: pa.Table) -> BucketedFrontier | None:
        """Distributed canonicalize + spill of a LARGE article table piece
        (e.g. a 10^8-row specified-URL seed list) into the bucketed
        layout: after this, the driver holds only per-host counts and
        file lists — the table path never sees the rows (ADVICE r1: large
        table frontiers must not concat back onto the driver)."""
        import shutil
        sdir = os.path.join(self.ckpt.dir,
                            f"frontier-tblspill-{wave:04d}-{idx}")
        shutil.rmtree(sdir, ignore_errors=True)
        eq = self.cfg.equivalent_domains
        nb = self.store.num_buckets

        def canon_spill(b: pa.Table) -> pa.Table:
            n = spill_bucketed(canonicalize_batch(b, eq), sdir, nb)
            return pa.table({"n": pa.array([n], pa.int64())})

        (ray.data.from_arrow(art_tbl)
         .map_batches(canon_spill, batch_format="pyarrow")
         .materialize())
        return load_bucketed_frontier(sdir)

    def _trawl_bucketed(self, wave: int) -> BucketedFrontier | None:
        """Trawl epilogue as a bucketed frontier: shards canonicalize and
        spill their own eligible sets (frontier/seen.py trawl_spill); the
        driver only merges the sidecar counts."""
        import shutil
        now_us = _now_us(self.cfg)
        tdir = os.path.join(self.ckpt.dir, f"frontier-trawl-{wave:04d}")
        shutil.rmtree(tdir, ignore_errors=True)
        n = self.seen.trawl_spill(now_us, tdir, self.store.num_buckets,
                                  trim=self.cfg.trimdb)
        if n == 0:
            return None
        return load_bucketed_frontier(tdir)

    def shutdown(self) -> None:
        self.seen.shutdown()
        self.extract_metrics.shutdown()


def _concat_frontier(tables: list[pa.Table]) -> pa.Table:
    keep = [t.select(CHILD_SCHEMA.names) for t in tables
            if t is not None and t.num_rows > 0]
    if not keep:
        return CHILD_SCHEMA.empty_table()
    return pa.concat_tables(
        [t.cast(CHILD_SCHEMA) for t in keep]).combine_chunks()


def _empty_extracted() -> pa.Table:
    from .. import schemas
    return schemas.EXTRACTED.empty_table()
