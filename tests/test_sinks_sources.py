"""JSONLines sink parity, comments join, and csv/atom/urllist source
kinds through the crawl."""

import glob
import json
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.pipelines.comments import COMMENTS_SCHEMA, join_comments
from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
from risjbot_ray.sinks import read_jsonlines, write_jsonlines
from risjbot_ray.testsupport.pagegen import PAGE_SCHEMA

TS = datetime(2017, 3, 1, tzinfo=timezone.utc)


def _page(url, html):
    return {"url": url, "warc_ts": TS, "html": html.encode(),
            "text": "", "lang": "en"}


def test_write_jsonlines_omits_absent_fields(ray_session, tmp_path):
    tbl = pa.table({
        "url": ["https://a/1", "https://a/2"],
        "headline": ["H1", None],
        "bylines": pa.array([["A", "B"], None], pa.list_(pa.string())),
    })
    paths = write_jsonlines(tbl, str(tmp_path / "jl"))
    lines = [json.loads(line)
             for p in paths for line in open(p) if line.strip()]
    assert lines[0] == {"url": "https://a/1", "headline": "H1",
                        "bylines": ["A", "B"]}
    assert lines[1] == {"url": "https://a/2"}  # nulls omitted
    # round-trip via ray.data
    back = read_jsonlines(paths).take_all()
    assert len(back) == 2


def test_write_jsonlines_dataset_blocks(ray_session, tmp_path):
    import ray
    ds = ray.data.from_items(
        [{"url": f"u{i}", "v": i} for i in range(10)]).repartition(3)
    paths = write_jsonlines(ds, str(tmp_path / "jl2"))
    assert len(paths) == 3
    rows = [json.loads(line) for p in paths for line in open(p)
            if line.strip()]
    assert len(rows) == 10


def test_join_comments_broadcast(ray_session):
    import ray
    arts = ray.data.from_arrow(pa.table({
        "url": ["u1", "u2", "u3"],
        "articleid": ["a1", "a2", None],
    }))
    comments = pa.Table.from_pylist([
        {"articleid": "a1", "comment_id": 1, "author": "x", "body": "first"},
        {"articleid": "a1", "comment_id": 2, "author": "y", "body": "second"},
    ], schema=COMMENTS_SCHEMA)
    out = {r["url"]: r for r in join_comments(arts, comments).take_all()}
    assert out["u1"]["rawcomments"] == ["first", "second"]
    assert out["u1"]["n_comments"] == 2
    assert out["u2"]["n_comments"] == 0
    assert out["u3"]["rawcomments"] is None


def test_csv_and_urllist_seed_kinds(ray_session, tmp_path):
    """S5/S6: a fetched CSV page and a url-list page both expand to
    article children that get crawled."""
    art = ('<html lang="en"><head><title>A</title>'
           '<meta property="og:title" content="From {src}"></head>'
           '<body><div itemprop="articleBody"><p>Body {src}.</p></div>'
           "</body></html>")
    pages = [
        _page("https://site00.example/feed.csv",
              "url,extra\nhttps://site00.example/art-csv,1\n"),
        _page("https://site00.example/list.txt",
              "https://site00.example/art-list\n"),
        _page("https://site00.example/art-csv", art.format(src="csv")),
        _page("https://site00.example/art-list", art.format(src="list")),
    ]
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=PAGE_SCHEMA), ppath)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=100, num_seen_shards=1,
                      num_fetch_buckets=2, max_waves=4, obey_robots=False)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"))
    pipe.run(seeds=[
        {"url": "https://site00.example/feed.csv", "kind": "csv",
         "meta": {"refetchcontrol_pass": True}},
        {"url": "https://site00.example/list.txt", "kind": "urllist",
         "meta": {"refetchcontrol_pass": True}},
    ])
    pipe.shutdown()
    parts = glob.glob(str(tmp_path / "out" / "wave=*" / "*.parquet"))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    urls = sorted(ext.column("url").to_pylist())
    assert urls == ["https://site00.example/art-csv",
                    "https://site00.example/art-list"]
