"""Golden-fixture extraction tests: engine output must match the generated
expected values byte-for-byte (BASELINE.json per-row invariant)."""

import pyarrow as pa
import pytest

from risjbot_ray.extract.stage import extract_batch
from risjbot_ray.testsupport.pagegen import gen_pages

CHECK_FIELDS = ("headline", "bodytext", "summary", "source", "section",
                "bylines", "keywords", "firstpubtime", "modtime", "language")


@pytest.fixture(scope="module")
def golden():
    pages, exp = gen_pages(300, seed=42)
    out = extract_batch(pages)
    return (pages, {r["url"]: r for r in exp.to_pylist()},
            {r["url"]: r for r in out.to_pylist()})


def test_fake404_rows_dropped(golden):
    _, expd, outd = golden
    for url, e in expd.items():
        if e["dropped"]:
            assert url not in outd


def test_all_families_extract_byte_identical(golden):
    _, expd, outd = golden
    fails = []
    for url, e in expd.items():
        if e["dropped"]:
            continue
        o = outd.get(url)
        assert o is not None, f"missing output for {e['family']} {url}"
        for f in CHECK_FIELDS:
            if e[f] is not None and o.get(f) != e[f]:
                fails.append((e["family"], f, e[f], o.get(f)))
    assert not fails, fails[:5]


def test_bodytext_matches_pages_text_column(golden):
    # pages.text is the golden extracted bodytext per input_hint
    pages, expd, outd = golden
    for row in pages.to_pylist():
        if expd[row["url"]]["dropped"]:
            continue
        assert outd[row["url"]].get("bodytext") == row["text"]


def test_rawpage_stripped_by_default(golden):
    _, _, outd = golden
    assert all(r.get("rawpagegzipb64") is None for r in outd.values())


def test_extract_batch_on_ray(ray_session):
    import ray

    pages, exp = gen_pages(120, seed=9)
    ds = ray.data.from_arrow(pages)
    out = ds.map_batches(extract_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
    table = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)],
        promote_options="default")
    outd = {r["url"]: r for r in table.to_pylist()}
    expd = {r["url"]: r for r in exp.to_pylist()}
    live = [u for u, e in expd.items() if not e["dropped"]]
    assert len(outd) == len(live)
    for u in live:
        if expd[u]["bodytext"] is not None:
            assert outd[u]["bodytext"] == expd[u]["bodytext"]
