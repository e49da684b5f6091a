"""End-to-end dump loop (pipelines/dumps.py): synthetic .warc.gz
dumps -> extraction -> incremental cross-dump dedup -> curated
parquet. Overlapping pages between dump 1 and dump 2 must drop as
prior_dup in dump 2; outputs land partitioned per dump."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from risjbot_ray.pipelines.dumps import process_dump
from risjbot_ray.testsupport.pagegen import gen_pages
from risjbot_ray.testsupport.warcgen import gen_warc_archives


def test_dump_loop_cross_dump_dedup(ray_session, tmp_path):
    pages, exp = gen_pages(120, seed=19)
    # keep only live article pages (feeds/sitemaps carry no bodytext)
    ed = exp.to_pandas()
    live = set(ed[~ed["dropped"]]["url"])
    mask = pa.array([u in live for u in pages.column("url").to_pylist()])
    arts = pages.filter(mask)
    n = arts.num_rows
    assert n > 60
    cut1, cut0 = (2 * n) // 3, n // 3            # overlap middle third
    d1 = arts.slice(0, cut1)
    d2 = arts.slice(cut0)
    overlap = set(d1.column("url").to_pylist()) \
        & set(d2.column("url").to_pylist())
    assert len(overlap) > 10

    warcs = []
    for tag, tbl in (("d1", d1), ("d2", d2)):
        pdir = tmp_path / f"pages_{tag}"
        os.makedirs(pdir)
        pq.write_table(tbl, str(pdir / "part-0.parquet"))
        warcs.append(gen_warc_archives(str(pdir), str(tmp_path / tag),
                                       n_archives=2))

    led = str(tmp_path / "ledger")
    out = str(tmp_path / "corpus")
    m1 = process_dump(warcs[0], led, out, "d1")
    m2 = process_dump(warcs[1], led, out, "d2")

    assert m1["n_pages"] == d1.num_rows
    assert m1["n_prior_dup"] == 0                # empty ledger
    # every overlapping article is a byte-identical revisit -> caught
    # by the cross-dump probe (est 1.0 >= any threshold)
    assert m2["n_prior_dup"] >= len(overlap)
    assert m2["n_kept"] <= m2["n_docs"] - len(overlap)

    # curated outputs: dump dirs exist, kept rows only, no overlap
    # URL from dump 2 survives in dump=d2
    k2 = pq.read_table(glob.glob(os.path.join(out, "dump=d2",
                                              "*.parquet")))
    assert set(k2.column("url").to_pylist()) & overlap == set()
    k1 = pq.read_table(glob.glob(os.path.join(out, "dump=d1",
                                              "*.parquet")))
    assert k1.num_rows == m1["n_kept"]
    assert k2.num_rows == m2["n_kept"]
    # doc text parity: curated rows carry the extracted bodytext
    assert all((t or "") != "" for t in k1.column("text").to_pylist())
