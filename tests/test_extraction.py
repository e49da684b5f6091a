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


def test_jsonld_untyped_values_do_not_crash():
    """Wild JSON-LD carries untyped JSON (numeric unix datePublished,
    nested-list keywords, dict headline): extraction must survive the
    page and keep only the string-typed values — and a context that is
    NOT literally schema.org must not qualify the block."""
    from risjbot_ray.extract.ensemble import newsarticle_from_jsonld
    from risjbot_ray.extract.stage import extract_batch
    import pyarrow as pa

    html = (
        '<html><head><script type="application/ld+json">'
        '{"@context":"https://schema.org","@type":"NewsArticle",'
        '"datePublished":1488218536,"keywords":[["a"]],'
        '"headline":{"v":"x"},"articleBody":"body text here"}'
        "</script></head><body><p>fallback</p></body></html>")
    import datetime
    t = pa.table({
        "url": pa.array(["http://example.com/x"], pa.string()),
        "warc_ts": pa.array(
            [datetime.datetime(2024, 1, 1,
                               tzinfo=datetime.timezone.utc)],
            pa.timestamp("us", tz="UTC")),
        "html": pa.array([html.encode()], pa.binary()),
    })
    out = extract_batch(t)          # must not raise
    assert out.num_rows == 1
    assert out.column("bodytext").to_pylist()[0] == "body text here"

    evil = [{"@context": "https://schemaXorg", "@type": "NewsArticle",
             "headline": "nope"}]
    assert newsarticle_from_jsonld(evil) == {}
    ok = [{"@context": "https://schema.org", "@type": "NewsArticle",
           "headline": "yes"}]
    assert newsarticle_from_jsonld(ok).get("headline") == "yes"
