"""End-to-end crawl pipeline tests: seeds -> waves -> extracted parquet,
checkpoint/resume, refetch-window behavior (SURVEY.md section 5 items 3-4).
"""

import glob
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
from risjbot_ray.testsupport.pagegen import EQUIVALENT_DOMAINS, gen_corpus

N_ARTICLES = 150


def read_extracted(out_dir: str) -> pa.Table:
    parts = sorted(glob.glob(f"{out_dir}/wave=*/*.parquet"))
    if not parts:
        return None
    return pa.concat_tables([pq.read_table(p) for p in parts],
                            promote_options="default")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl")
    pages, expected, seeds, robots = gen_corpus(N_ARTICLES, seed=42)
    pages_path = str(root / "pages.parquet")
    pq.write_table(pages, pages_path)
    return root, pages_path, expected, seeds, robots


def make_cfg(root, tag: str, **kw) -> CrawlConfig:
    defaults = dict(out_dir=str(root / f"out-{tag}"),
                    checkpoint_dir=str(root / f"ckpt-{tag}"),
                    per_host_budget=1000,
                    equivalent_domains=EQUIVALENT_DOMAINS,
                    num_seen_shards=2, num_fetch_buckets=4, max_waves=10)
    defaults.update(kw)
    return CrawlConfig(**defaults)


@pytest.fixture(scope="module")
def crawl_run(ray_session, corpus, tmp_path_factory):
    root, pages_path, expected, seeds, robots = corpus
    cfg = make_cfg(root, "main")
    pipe = CrawlPipeline(cfg, pages_path, str(root / "store-main"),
                         robots_bodies=robots)
    res = pipe.run(seeds=seeds)
    pipe.shutdown()
    return root, cfg, expected, res


def test_crawl_extracts_every_live_article(crawl_run):
    root, cfg, expected, res = crawl_run
    ext = read_extracted(cfg.out_dir)
    expd = {r["url"]: r for r in expected.to_pylist()}
    outd = {r["url"]: r for r in ext.to_pylist()}
    live = [u for u, e in expd.items() if not e["dropped"]]
    assert sorted(outd) == sorted(live)
    for u in live:
        if expd[u]["bodytext"] is not None:
            assert outd[u]["bodytext"] == expd[u]["bodytext"]


def test_crawl_ledger_matches_extracted(crawl_run):
    _, _, expected, res = crawl_run
    live = sum(1 for r in expected.to_pylist() if not r["dropped"])
    assert res["seen_counters"]["stored"] == live
    assert res["seen_size"] == live
    assert res["seen_counters"]["skipped"] == 0


def test_crawl_wave_manifests_have_lineage(crawl_run):
    root, cfg, _, res = crawl_run
    import os
    latest = int(open(os.path.join(cfg.checkpoint_dir, "LATEST")).read())
    for w in range(latest + 1):
        m = json.load(open(
            os.path.join(cfg.checkpoint_dir, f"wave-{w:04d}.json")))
        assert {"rows_in", "scheduled", "fetched", "extracted",
                "children", "seen_counters"} <= set(m)


def test_politeness_budget_defers_and_completes(ray_session, corpus):
    """With a tiny per-host budget the crawl takes more waves but still
    reaches the same final set (deferred rows re-queue)."""
    root, pages_path, expected, seeds, robots = corpus
    cfg = make_cfg(root, "budget", per_host_budget=5, max_waves=40)
    pipe = CrawlPipeline(cfg, pages_path, str(root / "store-budget"),
                         robots_bodies=robots)
    res = pipe.run(seeds=seeds)
    pipe.shutdown()
    ext = read_extracted(cfg.out_dir)
    live = [r["url"] for r in expected.to_pylist() if not r["dropped"]]
    assert sorted(ext.column("url").to_pylist()) == sorted(live)
    assert res["waves"] > 4  # budget forced extra waves


def test_rerun_within_refetch_window_fetches_nothing(ray_session, corpus):
    """Second crawl over the same seeds inside refetchsecs: every article
    is skipped by the ledger (persistent dupefilter semantics)."""
    root, pages_path, expected, seeds, robots = corpus
    cfg = make_cfg(root, "rerun")
    pipe = CrawlPipeline(cfg, pages_path, str(root / "store-rerun"),
                         robots_bodies=robots)
    pipe.run(seeds=seeds)
    first_counters = pipe.seen.counters()
    res2 = pipe.run(seeds=seeds)
    pipe.shutdown()
    c = res2["seen_counters"]
    assert c["stored"] == first_counters["stored"]  # nothing new stored
    assert c["skipped"] > 0


def test_resume_from_checkpoint(ray_session, corpus):
    """Kill between waves; resume completes to the identical final set
    (SURVEY.md section 5 item 4)."""
    root, pages_path, expected, seeds, robots = corpus
    cfg = make_cfg(root, "resume", max_waves=2)  # stop after 2 waves
    pipe = CrawlPipeline(cfg, pages_path, str(root / "store-resume"),
                         robots_bodies=robots)
    pipe.run(seeds=seeds)
    pipe.shutdown()

    cfg2 = make_cfg(root, "resume", max_waves=25)
    pipe2 = CrawlPipeline(cfg2, pages_path, str(root / "store-resume2"),
                          robots_bodies=robots)
    pipe2.run(resume=True)
    pipe2.shutdown()

    ext = read_extracted(cfg.out_dir)
    live = [r["url"] for r in expected.to_pylist() if not r["dropped"]]
    got = sorted(ext.column("url").to_pylist())
    assert got == sorted(live)


def test_trawl_epilogue_refetches(ray_session, corpus):
    """refetchfromdb: after the refetch window passes, the idle trawl
    re-seeds under-fetched URLs and fetch counts increase."""
    root, pages_path, expected, seeds, robots = corpus
    base = 1_500_000_000 * 1_000_000
    cfg = make_cfg(root, "trawl", refetchfromdb=True, clock_us=base)
    pipe = CrawlPipeline(cfg, pages_path, str(root / "store-trawl"),
                         robots_bodies=robots)
    pipe.run(seeds=seeds)
    stored_first = pipe.seen.counters()["stored"]
    # advance the injected clock past refetchsecs, run with no seeds:
    # the trawl alone must re-seed the frontier
    pipe.cfg.clock_us = base + (pipe.cfg.refetchsecs + 60) * 1_000_000
    res2 = pipe.run(seeds=[])
    c = pipe.seen.counters()
    pipe.shutdown()
    assert c["trawled"] > 0
    assert c["stored"] > stored_first  # refetches committed
    assert res2["extracted_pages"] > 0
    # the trawl frontier must flow through the bucketed (shard-spill)
    # path — never materialized as a driver table
    import os
    trawl_spills = glob.glob(
        os.path.join(cfg.checkpoint_dir, "frontier-trawl-*", "bucket=*"))
    assert trawl_spills, "trawl must spill a bucketed frontier"
    manifests = [json.load(open(p)) for p in sorted(
        glob.glob(os.path.join(cfg.checkpoint_dir, "wave-*.json")))]
    assert any(m.get("mode") == "bucketed" and m.get("extracted", 0) > 0
               for m in manifests)


def test_crawl_output_is_enriched(crawl_run):
    """The reference runs Sentiment(100)+WordCount(200) on every item by
    default (settings.py:216-224); the crawl output must carry them, with
    wordcount == len(bodytext.split())."""
    _, cfg, expected, _ = crawl_run
    ext = read_extracted(cfg.out_dir)
    assert "wordcount" in ext.column_names
    assert "sentiment" in ext.column_names
    for row in ext.to_pylist()[:50]:
        if row.get("bodytext"):
            assert row["wordcount"] == len(row["bodytext"].split())
            assert row["sentiment"] is not None
