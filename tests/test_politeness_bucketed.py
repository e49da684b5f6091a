"""The bucketed politeness scheduler: when a host's wave volume exceeds
per_host_budget, the bucketed path must schedule EXACTLY the same set as
the table path's ``schedule_wave`` (per-domain budget semantics, reference
settings.py:88-94) — via cutoff keys, with zero driver materialization and
no table-path fallback."""

import glob
import json

import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.frontier.canon import canonicalize_batch, dedupe_wave
from risjbot_ray.frontier.politeness import schedule_wave
from risjbot_ray.frontier.spill import (BucketedFrontier,
                                         load_bucketed_frontier,
                                         spill_bucketed)
from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
from risjbot_ray.sources.stage import CHILD_SCHEMA
from risjbot_ray.testsupport.pagegen import EQUIVALENT_DOMAINS, gen_corpus


def _read_spill_urls(directory: str) -> set[str]:
    out = set()
    for p in glob.glob(f"{directory}/bucket=*/part-*.parquet"):
        out.update(pq.read_table(p, columns=["canon_url"])
                   .column("canon_url").to_pylist())
    return out


def test_bucketed_schedule_matches_table_path(ray_session, tmp_path):
    """Exact parity: scheduled + deferred sets of a budget-bound bucketed
    wave equal schedule_wave's on the identical frontier."""
    pages, expected, seeds, robots = gen_corpus(200, seed=11)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=7, num_seen_shards=2,
                      num_fetch_buckets=4,
                      equivalent_domains=EQUIVALENT_DOMAINS)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    try:
        urls = [r["url"] for r in expected.to_pylist()]
        rows = [{"url": u, "priority": (i * 3) % 5, "depth": 0,
                 "source_kind": "article", "meta": None}
                for i, u in enumerate(urls)]
        cand = dedupe_wave(canonicalize_batch(
            pa.Table.from_pylist(rows, schema=CHILD_SCHEMA),
            EQUIVALENT_DOMAINS))
        sched, deferred = schedule_wave(cand, cfg.per_host_budget,
                                        cfg.salt_threshold)
        exp_sched = set(sched.column("canon_url").to_pylist())
        exp_def = set(deferred.column("canon_url").to_pylist())
        assert exp_def, "budget must bind for this test to mean anything"

        sdir = str(tmp_path / "ckpt" / "frontier-bucketed-manual")
        spill_bucketed(cand, sdir, pipe.store.num_buckets)
        bf = load_bucketed_frontier(sdir)
        assert max(bf.host_counts.values()) > cfg.per_host_budget
        pipe._run_bucketed_wave(0, bf)

        snap = pipe.extract_metrics.snapshot()
        assert snap["bucketed_scheduled"] == len(exp_sched)
        # deferred rows live in per-rank dirs (-r01, -r02, ...): the union
        # is the table path's deferred set, and EACH rank must be within
        # budget per host (so later waves schedule it with no pre-pass)
        rank_dirs = sorted(glob.glob(
            str(tmp_path / "ckpt" / "deferred-frontier-bucketed-manual-r*")))
        assert rank_dirs
        got_def = set()
        for rd in rank_dirs:
            urls_r = _read_spill_urls(rd)
            assert not (urls_r & got_def), "ranks must partition the set"
            got_def |= urls_r
            rbf = load_bucketed_frontier(rd)
            if rd != rank_dirs[-1]:  # last rank may hold the overflow
                assert max(rbf.host_counts.values()) <= cfg.per_host_budget
        assert got_def == exp_def
        # next-wave parity: rank 1 is exactly schedule_wave's pick on the
        # deferred remainder
        sched2, _ = schedule_wave(
            deferred, cfg.per_host_budget, cfg.salt_threshold)
        assert _read_spill_urls(rank_dirs[0]) == \
            set(sched2.column("canon_url").to_pylist())
    finally:
        pipe.shutdown()


def test_budget_bound_bucketed_crawl_completes_without_fallback(
        ray_session, tmp_path, monkeypatch):
    """E2E: binding per-host budget on the bucketed discovery path — the
    crawl defers and completes across waves with no driver fallback and
    the same final extracted set; the look-ahead cutoffs mean deferral
    waves do NOT each pay a politeness pre-pass."""
    prepasses = {"n": 0}
    orig_cutoffs = CrawlPipeline._politeness_cutoffs

    def counting(self, *a, **k):
        prepasses["n"] += 1
        return orig_cutoffs(self, *a, **k)

    monkeypatch.setattr(CrawlPipeline, "_politeness_cutoffs", counting)
    pages, expected, seeds, robots = gen_corpus(150, seed=13)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=5, num_seen_shards=2,
                      num_fetch_buckets=4, max_waves=60,
                      ray_discovery_rows=0, small_wave_rows=0,
                      equivalent_domains=EQUIVALENT_DOMAINS)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    res = pipe.run(seeds=seeds)
    pipe.shutdown()

    manifests = [json.load(open(p)) for p in
                 sorted(glob.glob(str(tmp_path / "ckpt" / "wave-*.json")))]
    assert all(m.get("mode") != "bucketed-fallback" for m in manifests)
    assert any(m.get("deferred", 0) > 0 for m in manifests)

    parts = sorted(glob.glob(str(tmp_path / "out" / "wave=*" /
                                 "*.parquet")))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    live = sorted(r["url"] for r in expected.to_pylist()
                  if not r["dropped"])
    assert sorted(ext.column("url").to_pylist()) == live
    assert res["waves"] > 2  # deferral forced extra waves
    deferral_waves = sum(1 for m in manifests if m.get("deferred", 0) > 0
                         or (m.get("mode") == "bucketed"
                             and m.get("rows_in", 0)
                             and m.get("scheduled", 0) < m["rows_in"]))
    # one look-ahead pre-pass covers K deferral waves; without the
    # look-ahead this equals the number of budget-bound waves
    assert prepasses["n"] < max(3, deferral_waves), \
        f"{prepasses['n']} pre-passes for {deferral_waves} deferral waves"


def test_large_seed_table_spills_to_bucketed(ray_session, tmp_path):
    """A seed list above ray_canon_threshold must leave the driver as a
    distributed bucketed spill, not flow through the table path."""
    pages, expected, _seeds, robots = gen_corpus(150, seed=17)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=100_000, num_seen_shards=2,
                      num_fetch_buckets=4, ray_canon_threshold=50,
                      equivalent_domains=EQUIVALENT_DOMAINS)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    live = sorted(r["url"] for r in expected.to_pylist()
                  if not r["dropped"])
    all_urls = [r["url"] for r in expected.to_pylist()]
    res = pipe.run(seeds=[{"url": u, "kind": "specified"}
                          for u in all_urls])
    pipe.shutdown()
    assert glob.glob(str(tmp_path / "ckpt" / "frontier-tblspill-*" /
                         "bucket=*")), "seed table must spill"
    manifests = [json.load(open(p)) for p in sorted(
        glob.glob(str(tmp_path / "ckpt" / "wave-*.json")))]
    assert any(m.get("mode") == "bucketed" for m in manifests)
    parts = sorted(glob.glob(str(tmp_path / "out" / "wave=*" /
                                 "*.parquet")))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    assert sorted(ext.column("url").to_pylist()) == live
    assert res["extracted_pages"] == len(live)


def test_trawl_spill_writes_bucketed_frontier(ray_session, tmp_path):
    """Shard-side trawl: eligible entries land as a bucketed spill (with
    trawled meta), never as a driver table."""
    from risjbot_ray.frontier.seen import SeenSet
    from risjbot_ray.functions.urlnorm import url_fingerprint

    import numpy as np

    seen = SeenSet(num_shards=2, maxfetches=8, refetchsecs=100)
    try:
        urls = [f"https://example.org/a/{i}" for i in range(20)]
        keys = [url_fingerprint(u) for u in urls]
        hashes = np.asarray([int.from_bytes(k[:8], "big") for k in keys],
                            dtype=np.uint64)
        t0 = 1_600_000_000 * 1_000_000
        seen.commit(keys, urls, hashes, t0, wave=0)
        tdir = str(tmp_path / "trawl")
        n = seen.trawl_spill(t0 + 200 * 1_000_000, tdir, num_buckets=4)
        assert n == 20
        bf = load_bucketed_frontier(tdir)
        assert bf.num_rows == 20
        assert bf.host_counts == {"example.org": 20}
        rows = [r for p in glob.glob(f"{tdir}/bucket=*/part-*.parquet")
                for r in pq.read_table(p).to_pylist()]
        assert sorted(r["canon_url"] for r in rows) == sorted(urls)
        for r in rows:
            assert r["trawled"] is True
            meta = json.loads(r["meta"])
            assert meta["refetchcontrol_trawled"] is True
            assert meta["refetchcontrol_previous"] == 1
    finally:
        seen.shutdown()


def test_window_matches_iterated_schedule_wave(ray_session, tmp_path):
    """Windowed politeness (`_run_bucketed_window`): the per-rank output
    sets of one K-wave window equal K sequential applications of the
    table path's ``schedule_wave`` on the same frontier (each rank's
    extracted pages = that virtual wave's scheduled set ∩ live pages)."""
    pages, expected, seeds, robots = gen_corpus(200, seed=11)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=3, num_seen_shards=2,
                      num_fetch_buckets=4, small_wave_rows=0,
                      equivalent_domains=EQUIVALENT_DOMAINS)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    try:
        urls = [r["url"] for r in expected.to_pylist()]
        live = {r["url"] for r in expected.to_pylist() if not r["dropped"]}
        rows = [{"url": u, "priority": (i * 3) % 5, "depth": 0,
                 "source_kind": "article", "meta": None}
                for i, u in enumerate(urls)]
        cand = dedupe_wave(canonicalize_batch(
            pa.Table.from_pylist(rows, schema=CHILD_SCHEMA),
            EQUIVALENT_DOMAINS))
        k = 4
        # expected: iterate the table scheduler K times
        exp_ranks, remaining = [], cand
        for _ in range(k):
            sched, remaining = schedule_wave(remaining,
                                             cfg.per_host_budget,
                                             cfg.salt_threshold)
            exp_ranks.append(set(sched.column("canon_url").to_pylist()))
        assert remaining.num_rows, "window must overflow to bind"

        sdir = str(tmp_path / "ckpt" / "frontier-bucketed-win")
        spill_bucketed(cand, sdir, pipe.store.num_buckets)
        bf = load_bucketed_frontier(sdir)
        used = pipe._run_bucketed_window(0, bf, k)
        assert used == k
        for r in range(k):
            parts = glob.glob(str(
                tmp_path / "out" / f"wave=frontier-bucketed-win-w{r:02d}"
                / "*.parquet"))
            got = set()
            for p in parts:
                got.update(pq.read_table(p, columns=["url"])
                           .column("url").to_pylist())
            assert got == (exp_ranks[r] & live), f"rank {r}"
        # the overflow spill holds exactly the un-scheduled remainder
        odirs = glob.glob(str(tmp_path / "ckpt" /
                              "deferred-frontier-bucketed-win-r*"))
        assert len(odirs) == 1
        assert _read_spill_urls(odirs[0]) == set(
            remaining.column("canon_url").to_pylist())
        # window manifest: one commit covering all K virtual waves
        m = json.load(open(str(tmp_path / "ckpt" /
                               f"wave-{k - 1:04d}.json")))
        assert m["mode"] == "bucketed-window"
        assert m["waves"] == k and m["wave_first"] == 0
        assert m["overflow"] == remaining.num_rows
        assert [rs["scheduled"] for rs in m["ranks"]] == \
            [len(s) for s in exp_ranks]
    finally:
        pipe.shutdown()


def test_window_last_rank_holds_budget(ray_session, tmp_path):
    """Regression: with K equal to the full look-ahead horizon and hosts
    whose volume exceeds K x budget, the LAST virtual wave must still be
    budget-exact and the excess must overflow — the cutoff pre-pass used
    to cap each host's key list at exactly budget*K, so no row could
    prove the last rank overflowed and the final wave silently swallowed
    the whole tail (and lookahead=1 emitted no cutoffs at all)."""
    pages, expected, seeds, robots = gen_corpus(200, seed=11)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=1, num_seen_shards=2,
                      num_fetch_buckets=4, small_wave_rows=0,
                      equivalent_domains=EQUIVALENT_DOMAINS)
    k = cfg.politeness_lookahead
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    try:
        urls = [r["url"] for r in expected.to_pylist()]
        rows = [{"url": u, "priority": (i * 3) % 5, "depth": 0,
                 "source_kind": "article", "meta": None}
                for i, u in enumerate(urls)]
        cand = dedupe_wave(canonicalize_batch(
            pa.Table.from_pylist(rows, schema=CHILD_SCHEMA),
            EQUIVALENT_DOMAINS))
        hosts = cand.column("host").to_pylist()
        heavy = max(hosts.count(h) for h in set(hosts))
        assert heavy > k * cfg.per_host_budget, \
            "corpus must exceed the look-ahead horizon for this test"
        exp_ranks, remaining = [], cand
        for _ in range(k):
            sched, remaining = schedule_wave(remaining,
                                             cfg.per_host_budget,
                                             cfg.salt_threshold)
            exp_ranks.append(set(sched.column("canon_url").to_pylist()))
        assert remaining.num_rows, "horizon must overflow to bind"

        sdir = str(tmp_path / "ckpt" / "frontier-bucketed-heavy")
        spill_bucketed(cand, sdir, pipe.store.num_buckets)
        bf = load_bucketed_frontier(sdir)
        used = pipe._run_bucketed_window(0, bf, k)
        assert used == k
        m = json.load(open(str(tmp_path / "ckpt" /
                               f"wave-{k - 1:04d}.json")))
        assert [rs["scheduled"] for rs in m["ranks"]] == \
            [len(s) for s in exp_ranks]
        assert m["overflow"] == remaining.num_rows
        odirs = glob.glob(str(tmp_path / "ckpt" /
                              "deferred-frontier-bucketed-heavy-r*"))
        assert len(odirs) == 1
        assert _read_spill_urls(odirs[0]) == set(
            remaining.column("canon_url").to_pylist())
    finally:
        pipe.shutdown()


def test_mixed_generation_spill_dir_counts_both(ray_session, tmp_path):
    """A pre-stats-layout (v1, host_counts-in-sidecar) checkpoint resumed
    under the current release and respilled into leaves ONE directory with
    both sidecar generations. Host totals and the lazy per-bucket counts
    must cover BOTH generations' rows — the loader used to take totals
    only from the v1 sidecars (v2 hosts evade budget gating) and
    bucket_counts_for returned only the partial legacy dict."""
    import os

    sdir = str(tmp_path / "mixed")

    def _cand(host, n):
        rows = [{"url": f"https://{host}/p/{i}", "priority": 0,
                 "depth": 0, "source_kind": "article", "meta": None}
                for i in range(n)]
        return dedupe_wave(canonicalize_batch(
            pa.Table.from_pylist(rows, schema=CHILD_SCHEMA)))

    # v2 half: 6 rows on hostv2.example via the current spill writer
    cand = _cand("hostv2.example", 6)
    assert spill_bucketed(cand, sdir, num_buckets=4) == 6
    # v1 half: hand-written part + sidecar with the legacy host_counts
    # field, 3 rows on hostv1.example in bucket 2
    old = _cand("hostv1.example", 3)
    bdir = os.path.join(sdir, "bucket=00002")
    os.makedirs(bdir, exist_ok=True)
    part = os.path.join(bdir, "part-legacy0000.parquet")
    pq.write_table(old, part)
    with open(part + ".json", "w") as f:
        json.dump({"bucket": 2, "n": 3,
                   "host_counts": {"hostv1.example": 3}}, f)

    bf = load_bucketed_frontier(sdir)
    assert bf.num_rows == 9
    assert bf.host_counts["hostv1.example"] == 3
    assert bf.host_counts.get("hostv2.example") == 6  # was ABSENT pre-fix
    hbc = bf.bucket_counts_for(["hostv1.example", "hostv2.example"])
    assert sum(hbc["hostv1.example"].values()) == 3
    assert sum(hbc.get("hostv2.example", {}).values()) == 6


def test_merge_preserves_mixed_generation_counts(ray_session, tmp_path):
    """_merge_bucketed must keep a mixed-generation piece's legacy eager
    counts ALONGSIDE the stats-file union: its hb- stats cover only the
    v2 spills, the eager dict the v1 parts. The merge used to discard
    the legacy dict whenever every piece had stats files, so the merged
    politeness pre-pass under-counted the v1 rows and an over-budget
    host could exceed its per-host budget."""
    import os

    def _cand(host, n):
        rows = [{"url": f"https://{host}/p/{i}", "priority": 0,
                 "depth": 0, "source_kind": "article", "meta": None}
                for i in range(n)]
        return dedupe_wave(canonicalize_batch(
            pa.Table.from_pylist(rows, schema=CHILD_SCHEMA)))

    # piece A: mixed generation — 6 v2 rows + 3 hand-written v1 rows
    adir = str(tmp_path / "mixed")
    assert spill_bucketed(_cand("hostv2.example", 6), adir,
                          num_buckets=4) == 6
    old = _cand("hostv1.example", 3)
    bdir = os.path.join(adir, "bucket=00002")
    os.makedirs(bdir, exist_ok=True)
    part = os.path.join(bdir, "part-legacy0000.parquet")
    pq.write_table(old, part)
    with open(part + ".json", "w") as f:
        json.dump({"bucket": 2, "n": 3,
                   "host_counts": {"hostv1.example": 3}}, f)
    piece_a = load_bucketed_frontier(adir)
    assert piece_a.stats_files and piece_a.host_bucket_counts

    # piece B: pure v2, more rows on the v1 host (so the merged count
    # for hostv1 must combine legacy eager + stats sources)
    bdir2 = str(tmp_path / "purev2")
    assert spill_bucketed(_cand("hostv1.example", 5), bdir2,
                          num_buckets=4) == 5
    piece_b = load_bucketed_frontier(bdir2)
    assert piece_b.stats_files and piece_b.host_bucket_counts is None

    pages, _, _, robots = gen_corpus(20, seed=5)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      num_seen_shards=2, num_fetch_buckets=4)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    try:
        merged = pipe._merge_bucketed([piece_a, piece_b])
        assert merged.num_rows == 14
        assert merged.host_counts["hostv1.example"] == 8
        assert merged.host_counts["hostv2.example"] == 6
        hbc = merged.bucket_counts_for(
            ["hostv1.example", "hostv2.example"])
        # pre-fix: hostv1 summed to 5 (legacy 3 dropped on merge)
        assert sum(hbc["hostv1.example"].values()) == 8
        assert sum(hbc["hostv2.example"].values()) == 6
        # a piece with NO detail at all still disables per-bucket counts
        bare = BucketedFrontier(str(tmp_path / "bare"), 1,
                                {"x.example": 1}, {0: []})
        nodetail = pipe._merge_bucketed([piece_b, bare])
        assert nodetail.stats_files is None
        assert nodetail.host_bucket_counts is None
    finally:
        pipe.shutdown()


def test_v1_manifest_defers_to_directory_after_respill(ray_session,
                                                       tmp_path):
    """A v1 manifest (embedded host_counts) whose directory later
    received v2 respills must load from the DIRECTORY — the embedded
    counts predate the respill and would hide those rows from budget
    gating."""
    import os

    def _cand(host, n):
        rows = [{"url": f"https://{host}/p/{i}", "priority": 0,
                 "depth": 0, "source_kind": "article", "meta": None}
                for i in range(n)]
        return dedupe_wave(canonicalize_batch(
            pa.Table.from_pylist(rows, schema=CHILD_SCHEMA)))

    sdir = str(tmp_path / "dir")
    # v1-era part: hand-written with a legacy sidecar
    old = _cand("hostv1.example", 3)
    bdir = os.path.join(sdir, "bucket=00002")
    os.makedirs(bdir, exist_ok=True)
    part = os.path.join(bdir, "part-legacy0000.parquet")
    pq.write_table(old, part)
    with open(part + ".json", "w") as f:
        json.dump({"bucket": 2, "n": 3,
                   "host_counts": {"hostv1.example": 3}}, f)
    manifest = {"directory": sdir, "num_rows": 3,
                "host_counts": {"hostv1.example": 3},
                "bucket_files": {"2": [part]},
                "host_bucket_counts": {"hostv1.example": {"2": 3}},
                "parent": None}

    # no respill yet: the embedded counts are authoritative
    bf0 = BucketedFrontier.from_manifest(manifest)
    assert bf0.num_rows == 3 and bf0.stats_files is None

    # v2 respill into the same directory, then resume from the SAME
    # v1 manifest: the directory is now the authority
    assert spill_bucketed(_cand("hostv2.example", 5), sdir,
                          num_buckets=4) == 5
    bf = BucketedFrontier.from_manifest(manifest)
    assert bf.num_rows == 8
    assert bf.host_counts == {"hostv1.example": 3,
                              "hostv2.example": 5}
    hbc = bf.bucket_counts_for(["hostv1.example", "hostv2.example"])
    assert sum(hbc["hostv1.example"].values()) == 3
    assert sum(hbc["hostv2.example"].values()) == 5
