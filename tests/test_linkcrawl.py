"""Link-following crawl (S7) and per-site sitemap_follow tests."""

import json
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
from risjbot_ray.sources.stage import discover_batch, harvest_links_batch
from risjbot_ray.testsupport.pagegen import PAGE_SCHEMA

TS = datetime(2017, 3, 1, tzinfo=timezone.utc)


def _page(url, html):
    return {"url": url, "warc_ts": TS, "html": html.encode(),
            "text": "", "lang": "en"}


def test_harvest_links_respects_site_rules():
    hub = ('<html><body>'
           '<a href="/news/a-good-story">x</a>'
           '<a href="/about/team">y</a>'
           '<a href="https://other.example/z">z</a>'
           "</body></html>")
    batch = pa.Table.from_pylist([
        {"url": "https://www.buzzfeed.com/news/hub", "html": hub.encode(),
         "depth": 0},
        # host without link rules -> no children
        {"url": "https://site00.example/hub", "html": hub.encode(),
         "depth": 0},
    ], schema=pa.schema([("url", pa.string()), ("html", pa.binary()),
                         ("depth", pa.int32())]))
    out = harvest_links_batch(batch)
    urls = out.column("url").to_pylist()
    assert urls == ["https://www.buzzfeed.com/news/a-good-story"]
    assert out.column("source_kind").to_pylist() == ["link"]
    assert out.column("depth").to_pylist() == [1]


def test_harvest_links_depth_cap():
    hub = '<html><body><a href="/news/a-x">x</a></body></html>'
    batch = pa.Table.from_pylist(
        [{"url": "https://www.buzzfeed.com/news/h", "html": hub.encode(),
          "depth": 3}],
        schema=pa.schema([("url", pa.string()), ("html", pa.binary()),
                          ("depth", pa.int32())]))
    assert harvest_links_batch(batch, max_depth=3).num_rows == 0


def test_sitemap_follow_filters_index_children():
    idx = ('<?xml version="1.0"?><sitemapindex>'
           "<sitemap><loc>https://uk.reuters.com/sitemap_20170301.xml</loc>"
           "</sitemap>"
           "<sitemap><loc>https://uk.reuters.com/sitemap_fr.html</loc>"
           "</sitemap></sitemapindex>")
    batch = pa.Table.from_pylist([
        {"source_kind": "sitemap", "html": idx.encode(), "priority": 0,
         "depth": 0, "canon_url": "https://uk.reuters.com/sitemap_index.xml"},
    ], schema=pa.schema([("source_kind", pa.string()),
                         ("html", pa.binary()), ("priority", pa.int32()),
                         ("depth", pa.int32()), ("canon_url", pa.string())]))
    out = discover_batch(batch)
    urls = out.column("url").to_pylist()
    # reuters rules follow only *.xml children (uk/reuters.py:11-19,40)
    assert urls == ["https://uk.reuters.com/sitemap_20170301.xml"]


def test_link_crawl_end_to_end(ray_session, tmp_path):
    """Seed a hub page on a link-crawl host; the crawl must follow links
    across hops and extract the linked articles."""
    art = ('<html lang="en"><head><title>T{i}</title>'
           '<meta property="og:title" content="Linked {i}"></head>'
           '<body><div itemprop="articleBody"><p>Body of linked article '
           "number {i} with enough words to matter.</p></div>"
           '{next_link}</body></html>')
    pages = [
        _page("https://www.buzzfeed.com/news/hub",
              '<html><body><a href="/news/art-1">1</a>'
              '<a href="/about/nope">no</a></body></html>'),
        _page("https://www.buzzfeed.com/news/art-1",
              art.format(i=1, next_link='<a href="/news/art-2">next</a>')),
        _page("https://www.buzzfeed.com/news/art-2",
              art.format(i=2, next_link="")),
    ]
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=PAGE_SCHEMA), ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=100, num_seen_shards=1,
                      num_fetch_buckets=2, max_waves=8, obey_robots=False)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"))
    res = pipe.run(seeds=[{"url": "https://www.buzzfeed.com/news/hub",
                           "kind": "article",
                           "meta": {"refetchcontrol_pass": True}}])
    counters = pipe.extract_metrics.snapshot()
    pipe.shutdown()
    import glob
    parts = glob.glob(str(tmp_path / "out" / "wave=*" / "*.parquet"))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    urls = sorted(ext.column("url").to_pylist())
    assert "https://www.buzzfeed.com/news/art-1" in urls
    assert "https://www.buzzfeed.com/news/art-2" in urls  # 2 hops
    assert counters.get("extracted", 0) >= 3


def test_link_crawl_bucketed_harvests_in_task(ray_session, tmp_path,
                                              monkeypatch):
    """Bucketed waves with a link-crawl host harvest inside the
    per-bucket tasks: children arrive as a bucketed side-spill and the
    DRIVER never reads any frontier spill parquet (the round-2 scan of
    every bucket part is gone)."""
    art = ('<html lang="en"><head><title>T{i}</title>'
           '<meta property="og:title" content="Linked {i}"></head>'
           '<body><div itemprop="articleBody"><p>Body of linked article '
           "number {i} with enough words to matter.</p></div>"
           '{next_link}</body></html>')
    pages = [
        _page("https://www.buzzfeed.com/news/hub",
              '<html><body><a href="/news/art-1">1</a>'
              '<a href="/about/nope">no</a></body></html>'),
        _page("https://www.buzzfeed.com/news/art-1",
              art.format(i=1, next_link='<a href="/news/art-2">next</a>')),
        _page("https://www.buzzfeed.com/news/art-2",
              art.format(i=2, next_link="")),
    ]
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=PAGE_SCHEMA), ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=100, num_seen_shards=1,
                      num_fetch_buckets=2, max_waves=8, obey_robots=False,
                      # force EVERY article piece through the bucketed path
                      ray_canon_threshold=0, small_wave_rows=0,
                      ray_discovery_rows=0)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"))

    reads: list[str] = []
    real_read = pq.read_table

    def spy(path, *a, **k):
        reads.append(str(path))
        return real_read(path, *a, **k)

    monkeypatch.setattr(pq, "read_table", spy)
    try:
        pipe.run(seeds=[{"url": "https://www.buzzfeed.com/news/hub",
                         "kind": "article",
                         "meta": {"refetchcontrol_pass": True}}])
    finally:
        monkeypatch.setattr(pq, "read_table", real_read)
        pipe.shutdown()

    spill_reads = [p for p in reads
                   if "/frontier-" in p or "/links-" in p
                   or "/deferred-" in p]
    assert not spill_reads, f"driver read frontier spill parquet: " \
                            f"{spill_reads[:3]}"
    import glob
    assert glob.glob(str(tmp_path / "ckpt" / "links-*" / "bucket=*")), \
        "link children must spill bucketed"
    parts = glob.glob(str(tmp_path / "out" / "wave=*" / "*.parquet"))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    urls = sorted(ext.column("url").to_pylist())
    assert "https://www.buzzfeed.com/news/art-1" in urls
    assert "https://www.buzzfeed.com/news/art-2" in urls  # 2 hops in-task


def test_link_crawl_table_path_fetches_once(ray_session, tmp_path):
    """Table-path waves harvest links from the SAME fetch extraction
    uses: every page-store row is fetched at most once per crawl (the
    round-3 defect fetched link-host pages twice per wave — once by the
    separate harvest pass, once by the article pipeline)."""
    art = ('<html lang="en"><head><title>T{i}</title>'
           '<meta property="og:title" content="Linked {i}"></head>'
           '<body><div itemprop="articleBody"><p>Body of linked article '
           "number {i} with enough words to matter.</p></div>"
           '{next_link}</body></html>')
    pages = [
        _page("https://www.buzzfeed.com/news/hub",
              '<html><body><a href="/news/art-1">1</a></body></html>'),
        _page("https://www.buzzfeed.com/news/art-1",
              art.format(i=1, next_link='<a href="/news/art-2">next</a>')),
        _page("https://www.buzzfeed.com/news/art-2",
              art.format(i=2, next_link="")),
    ]
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=PAGE_SCHEMA), ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=100, num_seen_shards=1,
                      num_fetch_buckets=2, max_waves=8, obey_robots=False)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"))

    from collections import Counter
    fetch_counts: Counter = Counter()
    real_fetch = pipe.store.fetch_group

    def counting_fetch(group):
        out = real_fetch(group)
        if out is not None and out.num_rows:
            fetch_counts.update(out.column("canon_url").to_pylist())
        return out

    pipe.store.fetch_group = counting_fetch
    try:
        pipe.run(seeds=[{"url": "https://www.buzzfeed.com/news/hub",
                         "kind": "article",
                         "meta": {"refetchcontrol_pass": True}}])
    finally:
        pipe.store.fetch_group = real_fetch
        pipe.shutdown()

    dupes = {u: c for u, c in fetch_counts.items() if c > 1}
    assert not dupes, f"pages fetched more than once: {dupes}"
    import glob
    parts = glob.glob(str(tmp_path / "out" / "wave=*" / "*.parquet"))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    urls = sorted(ext.column("url").to_pylist())
    assert "https://www.buzzfeed.com/news/art-1" in urls
    assert "https://www.buzzfeed.com/news/art-2" in urls


def test_allowed_domains_offsite_gate():
    """Children outside allowed_domains are dropped (independent.co.uk
    allowed_domains, uk/independent.py:13-16)."""
    rss = (b'<rss version="2.0"><channel>'
           b"<item><link>https://www.independent.co.uk/news/a1</link>"
           b"<title>ok</title></item>"
           b"<item><link>https://www.standard.co.uk/offsite</link>"
           b"<title>no</title></item>"
           b"</channel></rss>")
    batch = pa.Table.from_pylist([
        {"source_kind": "rss", "html": rss, "priority": 0, "depth": 0,
         "canon_url": "https://www.independent.co.uk/rss"},
    ], schema=pa.schema([("source_kind", pa.string()),
                         ("html", pa.binary()), ("priority", pa.int32()),
                         ("depth", pa.int32()), ("canon_url", pa.string())]))
    out = discover_batch(batch)
    assert out.column("url").to_pylist() == \
        ["https://www.independent.co.uk/news/a1"]
