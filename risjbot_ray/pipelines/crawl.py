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
import time
from dataclasses import dataclass, field
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

    # -- single wave ------------------------------------------------------
    def run_wave(self, wave: int, frontier: pa.Table) -> pa.Table:
        """Process one wave; returns the next wave's frontier table."""
        cfg = self.cfg
        now_us = _now_us(cfg)
        t0 = time.time()
        self.seen.new_wave()

        # 1. canonicalize + key (canonicalize-before-ledger,
        #    settings.py:121-124) and in-wave exact dedup
        cand = canonicalize_batch(frontier, cfg.equivalent_domains)
        cand = dedupe_wave(cand)

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

        # 3. robots gate (T6)
        if self.cfg.obey_robots and gated.num_rows:
            mask = self.robots.allowed_mask(
                gated.column("host").to_pylist(),
                gated.column("canon_url").to_pylist())
            gated = gated.filter(pa.array(mask))

        # 4. politeness schedule: salted grouped top-k; overflow deferred
        scheduled, deferred = schedule_wave(
            gated, cfg.per_host_budget, cfg.salt_threshold)
        self.metrics["scheduled_urls"] += scheduled.num_rows

        # 5. fetch join against the page store, bucket-aligned
        fetched_ds = self._fetch(scheduled)

        # 6a. discovery expansion
        # 6b. extraction + ledger commit + partitioned write
        children, n_extracted, n_fetched = self._process_fetched(
            fetched_ds, wave, now_us)
        self.metrics["fetched_rows"] += n_fetched
        self.metrics["extracted_pages"] += n_extracted

        next_frontier = _concat_frontier([deferred, children])

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
            "wall_sec": round(time.time() - t0, 3),
        })
        return next_frontier

    def _fetch(self, scheduled: pa.Table):
        """Scheduled rows -> fetched rows (html attached) as a Ray Dataset,
        grouped by fetch bucket so each bucket file is read once."""
        if scheduled.num_rows == 0:
            return None
        hashes = np.asarray(scheduled.column("url_hash").to_pylist(),
                            dtype=np.uint64)
        buckets = self.store.bucket_of(hashes)
        scheduled = scheduled.append_column(
            "fetch_bucket", pa.array(buckets, type=pa.int64()))
        store = self.store
        ds = ray.data.from_arrow(scheduled)

        def fetch_group(group: pa.Table) -> pa.Table:
            out = store.fetch_group(group)
            if out is None or out.num_rows == 0:
                return _empty_fetched(group)
            return out

        return ds.groupby("fetch_bucket").map_groups(
            fetch_group, batch_format="pyarrow")

    def _process_fetched(self, fetched_ds, wave: int, now_us: int):
        """Split fetched rows into discovery vs articles; expand / extract;
        commit article keys; write extracted parquet under out/wave=K."""
        if fetched_ds is None:
            return CHILD_SCHEMA.empty_table(), 0, 0
        cfg = self.cfg
        fetched = fetched_ds.materialize()
        n_fetched = fetched.count()

        disc_kinds = pa.array(list(DISCOVERY_KINDS), type=pa.string())

        def _split(batch: pa.Table, want_discovery: bool) -> pa.Table:
            mask = pc.is_in(batch.column("source_kind"),
                            value_set=disc_kinds)
            if not want_discovery:
                mask = pc.invert(mask)
            return batch.filter(mask)

        disc = fetched.map_batches(
            lambda b: _split(b, True), batch_format="pyarrow")
        arts = fetched.map_batches(
            lambda b: _split(b, False), batch_format="pyarrow")

        # discovery expansion (flat_map over bodies)
        child_tables = [t for t in
                        disc.map_batches(discover_batch,
                                         batch_format="pyarrow")
                        .to_arrow_refs()]
        children = (pa.concat_tables([ray.get(r) for r in child_tables])
                    if child_tables else CHILD_SCHEMA.empty_table())
        if children.num_rows:
            children = children.combine_chunks()

        # extraction over articles: fold previousfetches into meta, run the
        # ensemble, commit ledger keys per batch, write parquet partition
        seen = self.seen
        batch_size = cfg.batch_size
        wave_dir = f"{cfg.out_dir}/wave={wave:04d}"

        def prep_meta(batch: pa.Table) -> pa.Table:
            metas = (batch.column("meta").to_pylist()
                     if "meta" in batch.column_names
                     else [None] * batch.num_rows)
            prevs = batch.column("previousfetches").to_pylist()
            out_meta = []
            for m, p in zip(metas, prevs):
                meta = json.loads(m) if m else {}
                if p is not None:
                    meta["refetchcontrol_previous"] = int(p)
                out_meta.append(json.dumps(meta))
            batch = batch.drop_columns(["meta"]) if "meta" in batch.column_names else batch
            return batch.append_column("meta",
                                       pa.array(out_meta, type=pa.string()))

        def extract_commit(batch: pa.Table) -> pa.Table:
            batch = prep_meta(batch)
            # response URL is the canonical one (the fetch joined on it);
            # keep a copy for the ledger commit — the reference commits
            # response.url, not the item url (refetchcontrol.py:309)
            batch = batch.drop_columns(["url"])
            batch = batch.append_column(
                "resp_url", batch.column("canon_url"))
            batch = batch.rename_columns(
                ["url" if c == "canon_url" else c for c in batch.column_names])
            out = extract_batch(batch, passthrough=("key", "url_hash",
                                                    "pass_seen", "resp_url"))
            if out.num_rows:
                mask = pc.invert(out.column("pass_seen"))
                commit_rows = out.filter(mask)
                if commit_rows.num_rows:
                    seen.commit(
                        commit_rows.column("key").to_pylist(),
                        commit_rows.column("resp_url").to_pylist(),
                        np.asarray(commit_rows.column("url_hash").to_pylist(),
                                   dtype=np.uint64),
                        now_us, wave)
            return out.drop_columns(["key", "url_hash", "pass_seen",
                                     "resp_url"])

        n_extracted = 0
        if arts.count() > 0:
            ex = arts.map_batches(extract_commit, batch_format="pyarrow",
                                  batch_size=batch_size)
            ex = ex.materialize()
            n_extracted = ex.count()
            if n_extracted:
                ex.write_parquet(wave_dir)
        return children, n_extracted, n_fetched

    # -- full run ---------------------------------------------------------
    def run(self, seeds: list[dict] | None = None,
            resume: bool = False) -> dict:
        cfg = self.cfg
        start_wave = 0
        if resume:
            latest = self.ckpt.latest_wave()
            if latest is not None:
                self.seen.restore(self.ckpt.seen_dir)
                frontier = self.ckpt.read_frontier(latest + 1)
                start_wave = latest + 1
            else:
                resume = False
        if not resume:
            frontier = seed_frontier(seeds or [])

        wave = start_wave
        trawled_done = False
        t0 = time.time()
        while wave < cfg.max_waves:
            if frontier is None or frontier.num_rows == 0:
                # idle: trawl epilogue, once (refetchcontrol.py:132-195)
                if cfg.refetchfromdb and not trawled_done:
                    trawled_done = True
                    frontier = self._trawl_frontier()
                    if frontier.num_rows:
                        continue
                break
            frontier = self.run_wave(wave, frontier)
            wave += 1
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

    def _trawl_frontier(self) -> pa.Table:
        now_us = _now_us(self.cfg)
        entries = self.seen.trawl(now_us, trim=self.cfg.trimdb)
        rows = []
        for key, url, nf in entries:
            rows.append({
                "url": url, "priority": 0, "depth": 0,
                "source_kind": "trawl",
                "meta": json.dumps({"refetchcontrol_trawled": True,
                                    "refetchcontrol_previous": nf}),
            })
        return pa.Table.from_pylist(rows, schema=CHILD_SCHEMA)

    def shutdown(self) -> None:
        self.seen.shutdown()


def _concat_frontier(tables: list[pa.Table]) -> pa.Table:
    keep = [t.select(CHILD_SCHEMA.names) for t in tables
            if t is not None and t.num_rows > 0]
    if not keep:
        return CHILD_SCHEMA.empty_table()
    return pa.concat_tables(
        [t.cast(CHILD_SCHEMA) for t in keep]).combine_chunks()


def _empty_fetched(group: pa.Table) -> pa.Table:
    schema = pa.schema(list(group.schema)
                       + [pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
                          pa.field("html", pa.binary())])
    return schema.empty_table()
