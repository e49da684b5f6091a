"""PageStore layout tests: the distributed (Ray Data) build must produce
the identical bucket layout to the driver-side fallback, survive crashed
(marker-less) builds, and feed the crawl e2e unchanged (VERDICT r3 item 3).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from risjbot_ray.frontier.pagestore import PageStore, build_page_store
from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
from risjbot_ray.testsupport.pagegen import EQUIVALENT_DOMAINS, gen_corpus

NB = 4


@pytest.fixture(scope="module")
def pages(tmp_path_factory):
    root = tmp_path_factory.mktemp("pagestore")
    tbl, expected, seeds, robots = gen_corpus(60, seed=7)
    # inject duplicate snapshots of the first 5 urls (older warc_ts) to
    # exercise the latest-wins dedup in both build paths
    dup = tbl.slice(0, 5)
    if "warc_ts" in dup.column_names:
        import pyarrow.compute as pc
        idx = dup.column_names.index("warc_ts")
        delta = pa.scalar(3600_000_000, pa.duration("us"))
        dup = dup.set_column(
            idx, "warc_ts",
            pc.subtract(dup.column("warc_ts"), delta).cast(
                dup.schema.field("warc_ts").type))
    tbl = pa.concat_tables([tbl, dup], promote_options="default")
    path = str(root / "pages.parquet")
    pq.write_table(tbl, path)
    return root, path, expected, seeds, robots


def _bucket_tables(store_dir: str) -> dict[str, pa.Table]:
    return {f: pq.read_table(os.path.join(store_dir, f))
            for f in sorted(os.listdir(store_dir))
            if f.startswith("bucket-")}


def test_distributed_matches_local(ray_session, pages):
    root, path, *_ = pages
    build_page_store(path, str(root / "st-local"), num_buckets=NB,
                     distributed=False)
    build_page_store(path, str(root / "st-ray"), num_buckets=NB,
                     distributed=True)
    local = _bucket_tables(str(root / "st-local"))
    ray_b = _bucket_tables(str(root / "st-ray"))
    assert set(local) == set(ray_b) and local
    for name, lt in local.items():
        rt = ray_b[name]
        assert lt.schema.names == rt.schema.names
        assert lt.num_rows == rt.num_rows
        assert lt.equals(rt.select(lt.schema.names))


def test_dedup_latest_snapshot_wins(ray_session, pages):
    root, path, *_ = pages
    store = PageStore(str(root / "st-ray"), NB)
    src = pq.read_table(path)
    urls = src.column("url").to_pylist()
    total = sum(t.num_rows for t in _bucket_tables(store.store_dir).values())
    assert total == len(set(urls))  # duplicates collapsed
    # and the survivor is the LATEST snapshot of each duplicated url
    import numpy as np
    from risjbot_ray.functions.urlnorm import url_hash64
    u0 = urls[0]
    b = int(np.uint64(url_hash64(u0)) % np.uint64(NB))
    got = store.fetch_bucket(b, [u0], columns=("url", "warc_ts"))
    want = max(r["warc_ts"] for r in src.to_pylist() if r["url"] == u0)
    assert got.num_rows == 1 and got.column("warc_ts")[0].as_py() == want


def test_stale_files_cleared_on_rebuild(ray_session, pages):
    root, path, *_ = pages
    sd = str(root / "st-stale")
    os.makedirs(sd)
    stale = os.path.join(sd, "bucket-99999.parquet")
    pq.write_table(pa.table({"url": ["x"]}), stale)  # crashed prior build
    build_page_store(path, sd, num_buckets=NB, distributed=False)
    assert not os.path.exists(stale)
    assert os.path.exists(os.path.join(sd, f"DONE-{NB}"))


def test_crawl_e2e_over_distributed_store(ray_session, pages, tmp_path):
    root, path, expected, seeds, robots = pages
    sd = str(root / "st-crawl")
    build_page_store(path, sd, num_buckets=NB, distributed=True)
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=1000,
                      equivalent_domains=EQUIVALENT_DOMAINS,
                      num_seen_shards=2, num_fetch_buckets=NB, max_waves=10)
    pipe = CrawlPipeline(cfg, path, sd, robots_bodies=robots)
    res = pipe.run(seeds=seeds)
    pipe.shutdown()
    import glob
    parts = sorted(glob.glob(f"{cfg.out_dir}/wave=*/*.parquet"))
    ext = pa.concat_tables([pq.read_table(p) for p in parts],
                           promote_options="default")
    got = set(ext.column("url").to_pylist())
    want = {r["url"] for r in expected.to_pylist() if not r["dropped"]}
    assert got == want


def test_stale_done_marker_other_bucket_count_cleared(ray_session, pages):
    """A rebuild with num_buckets=M deletes every bucket file but used to
    leave DONE-{N} markers from other bucket counts behind: a THIRD build
    asking for N again would short-circuit on the stale marker and serve
    the M-bucket layout — url_hash % N routing onto missing/misbucketed
    files, pages silently never crawled."""
    root, path, *_ = pages
    sd = str(root / "st-stale-done")
    build_page_store(path, sd, num_buckets=NB, distributed=False)
    first = _bucket_tables(sd)
    build_page_store(path, sd, num_buckets=NB * 2, distributed=False)
    assert not os.path.exists(os.path.join(sd, f"DONE-{NB}"))
    # the third build must REBUILD (not reuse the 2*NB layout)
    store = build_page_store(path, sd, num_buckets=NB, distributed=False)
    assert store.num_buckets == NB
    again = _bucket_tables(sd)
    assert set(again) == set(first)
    for k in first:
        assert again[k].equals(first[k])
