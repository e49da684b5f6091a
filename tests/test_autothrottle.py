"""AutoThrottle (T7 dynamics, reference settings.py:236-247): the
documented Scrapy update rule as a truth table, per-host budgets in
schedule_wave, and an e2e crawl where the throttle (not the static cap)
is the binding politeness constraint."""

import glob
import json

import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.frontier.autothrottle import AutoThrottle
from risjbot_ray.frontier.canon import canonicalize_batch, dedupe_wave
from risjbot_ray.frontier.politeness import schedule_wave
from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
from risjbot_ray.sources.stage import CHILD_SCHEMA
from risjbot_ray.testsupport.pagegen import EQUIVALENT_DOMAINS, gen_corpus


def test_update_rule_truth_table():
    """Hand-computed sequence of the documented algorithm: new delay =
    avg(current, latency/target); failures never decrease; clamped to
    [download_delay, max_delay]; unseen hosts start at start_delay."""
    at = AutoThrottle(start_delay=5.0, max_delay=60.0,
                      target_concurrency=1.0, download_delay=0.5)
    assert at.delay_of("a.com") == 5.0
    assert at.observe("a.com", 2.0) == 3.5          # (5 + 2) / 2
    assert at.observe("a.com", 2.0) == 2.75         # (3.5 + 2) / 2
    # fast failure: would halve toward 0.1 but failures can't speed up
    assert at.observe("a.com", 0.1, ok=False) == 2.75
    # slow failure: still slows the host down
    assert at.observe("a.com", 10.0, ok=False) == 6.375
    # clamp at max_delay
    assert at.observe("a.com", 1000.0) == 60.0
    # floor at download_delay
    for _ in range(20):
        at.observe("a.com", 0.0)
    assert at.delay_of("a.com") == 0.5
    # target_concurrency divides the latency
    at2 = AutoThrottle(start_delay=5.0, target_concurrency=4.0)
    assert at2.observe("b.com", 8.0) == 3.5         # (5 + 8/4) / 2


def test_budget_mapping():
    at = AutoThrottle(start_delay=5.0)
    # delay 5s, 60s wave -> 12 fetches; hard cap and floor respected
    assert at.budget_of("x", 60.0, 256) == 12
    assert at.budget_of("x", 60.0, 8) == 8
    assert at.budget_of("x", 1.0, 256) == 1          # always progresses
    at.delays["x"] = 0.0
    assert at.budget_of("x", 60.0, 256) == 256       # no delay -> cap
    at.delays["y"] = 30.0
    b = at.budgets(["x", "y"], 60.0, 256)
    assert b == {"y": 2}                             # capped hosts omitted


def _frontier(urls):
    rows = [{"url": u, "priority": (i * 3) % 5, "depth": 0,
             "source_kind": "article", "meta": None}
            for i, u in enumerate(urls)]
    return dedupe_wave(canonicalize_batch(
        pa.Table.from_pylist(rows, schema=CHILD_SCHEMA),
        EQUIVALENT_DOMAINS))


def test_schedule_wave_per_host_budgets():
    """host_budgets tightens per host; default_budget covers unlisted
    hosts; neither ever loosens the static cap."""
    urls = ([f"https://slow.com/p/{i}" for i in range(10)]
            + [f"https://fast.com/p/{i}" for i in range(10)]
            + [f"https://new.com/p/{i}" for i in range(10)])
    cand = _frontier(urls)
    sched, deferred = schedule_wave(
        cand, 8, host_budgets={"slow.com": 2, "fast.com": 999},
        default_budget=4)
    hosts = sched.column("host").to_pylist()
    assert hosts.count("slow.com") == 2              # tightened
    assert hosts.count("fast.com") == 8              # capped at static 8
    assert hosts.count("new.com") == 4               # default_budget
    assert sched.num_rows + deferred.num_rows == cand.num_rows
    # per-host selection parity: each host's picks equal a scalar
    # schedule_wave at that host's budget on the same frontier
    for host, b in (("slow.com", 2), ("fast.com", 8), ("new.com", 4)):
        solo, _ = schedule_wave(cand, b)
        exp = {u for h, u in zip(solo.column("host").to_pylist(),
                                 solo.column("canon_url").to_pylist())
               if h == host}
        got = {u for h, u in zip(hosts,
                                 sched.column("canon_url").to_pylist())
               if h == host}
        assert got == exp, host


def test_autothrottle_crawl_e2e(ray_session, tmp_path):
    """E2E with the throttle as the BINDING constraint (static cap is
    loose): start-delay budgets force deferral waves, observed (fast)
    store latencies then melt the delays toward the floor, and the crawl
    still finishes with exactly the live set."""
    pages, expected, seeds, robots = gen_corpus(150, seed=13)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=100,  # loose static cap
                      autothrottle=True,
                      autothrottle_start_delay=1.0,
                      autothrottle_wave_seconds=4.0,  # initial budget 4
                      download_delay=0.05,
                      num_seen_shards=2, num_fetch_buckets=4,
                      max_waves=60, ray_discovery_rows=0,
                      small_wave_rows=0,  # force the bucketed Ray path
                      equivalent_domains=EQUIVALENT_DOMAINS)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    res = pipe.run(seeds=seeds)
    try:
        # the throttle observed real fetches and sped hosts up from
        # start_delay (store reads are ~ms, so delays must have dropped)
        assert pipe.throttle.delays, "no latency observations reached " \
            "the throttle"
        assert all(d < 1.0 for d in pipe.throttle.delays.values())
    finally:
        pipe.shutdown()
    manifests = [json.load(open(p)) for p in sorted(
        glob.glob(str(tmp_path / "ckpt" / "wave-*.json")))]
    assert any(m.get("deferred", 0) > 0 for m in manifests), \
        "start-delay budget must bind for this test to mean anything"
    parts = sorted(glob.glob(str(tmp_path / "out" / "wave=*" /
                                 "*.parquet")))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    live = sorted(r["url"] for r in expected.to_pylist()
                  if not r["dropped"])
    assert sorted(ext.column("url").to_pylist()) == live
    assert res["waves"] > 2
