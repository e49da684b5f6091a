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


# ---------------------------------------------------------------------------
# WARC ingestion
# ---------------------------------------------------------------------------

def _warc_record(wtype: str, url: str, date: str, payload: bytes,
                 extra: str = "") -> bytes:
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"{extra}"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n").encode()
    return head + payload + b"\r\n\r\n"


def _http_payload(status: int, body: bytes,
                  ctype: str = "text/html") -> bytes:
    return (f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def _sample_warc() -> bytes:
    recs = [
        _warc_record("warcinfo", "", "2024-01-01T00:00:00Z",
                     b"software: test\r\n"),
        _warc_record("request", "http://a.example/x",
                     "2024-01-01T00:00:01Z", b"GET /x HTTP/1.1\r\n"),
        _warc_record("response", "http://a.example/x",
                     "2024-01-01T00:00:01Z",
                     _http_payload(200, b"<html>alpha</html>")),
        _warc_record("response", "http://b.example/y",
                     "2024-02-03T04:05:06Z",
                     _http_payload(404, b"gone", ctype="text/plain")),
    ]
    return b"".join(recs)


def test_parse_warc_records_plain_and_gzip():
    import gzip as gz

    from risjbot_ray.sources.warc import parse_warc_records

    per_record_members = b"".join(
        gz.compress(r) for r in [
            _warc_record("warcinfo", "", "2024-01-01T00:00:00Z",
                         b"software: test\r\n"),
            _warc_record("response", "http://a.example/x",
                         "2024-01-01T00:00:01Z",
                         _http_payload(200, b"<html>alpha</html>")),
            _warc_record("response", "http://b.example/y",
                         "2024-02-03T04:05:06Z",
                         _http_payload(404, b"gone",
                                       ctype="text/plain")),
        ])
    for raw in (_sample_warc(),
                gz.compress(_sample_warc()),
                # per-record gzip members, concatenated (CC layout)
                per_record_members):
        recs = parse_warc_records(raw)
        assert [r["url"] for r in recs] == ["http://a.example/x",
                                            "http://b.example/y"]
        assert recs[0]["html"] == b"<html>alpha</html>"
        assert recs[0]["http_status"] == 200
        assert recs[1]["http_status"] == 404
        assert recs[1]["content_type"] == "text/plain"


def test_parse_warc_resyncs_after_malformed_record():
    """One corrupt record mid-archive must not drop the rest of the
    file: the parser resyncs at the next WARC/ line and reports
    counters instead of silently truncating."""
    from risjbot_ray.sources.warc import iter_warc_records

    good_a = _warc_record("response", "http://a.example/x",
                          "2024-01-01T00:00:01Z",
                          _http_payload(200, b"<html>alpha</html>"))
    # record with a non-integer Content-Length
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://bad.example/\r\n"
           b"Content-Length: oops\r\n\r\n"
           b"junk payload line\r\nmore junk\r\n\r\n\r\n")
    good_b = _warc_record("response", "http://b.example/y",
                          "2024-02-03T04:05:06Z",
                          _http_payload(404, b"gone",
                                        ctype="text/plain"))
    import io as _io
    errors: dict = {}
    recs = list(iter_warc_records(
        _io.BytesIO(good_a + bad + good_b), errors))
    assert [r["url"] for r in recs] == ["http://a.example/x",
                                        "http://b.example/y"]
    assert errors["bad_records"] == 1
    assert errors["skipped_lines"] > 0

    # record missing Content-Length entirely
    bad2 = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    errors = {}
    recs = list(iter_warc_records(
        _io.BytesIO(bad2 + good_a), errors))
    assert [r["url"] for r in recs] == ["http://a.example/x"]
    assert errors["bad_records"] == 1


def test_split_http_payload_transfer_and_content_encoding():
    """As-served archives keep chunked framing and gzip bodies; the
    html column must still come out as markup."""
    import gzip as gz

    from risjbot_ray.sources.warc import _split_http_payload

    html = b"<html>chunky</html>"
    chunked = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n"
               + hex(len(html[:7]))[2:].encode() + b"\r\n" + html[:7]
               + b"\r\n"
               + hex(len(html[7:]))[2:].encode() + b"\r\n" + html[7:]
               + b"\r\n0\r\n\r\n")
    status, ctype, body = _split_http_payload(chunked)
    assert (status, ctype, body) == (200, "text/html", html)

    gzipped = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b"Content-Encoding: gzip\r\n\r\n" + gz.compress(html))
    assert _split_http_payload(gzipped)[2] == html

    import zlib as _zlib
    deflated = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
                b"\r\n" + _zlib.compress(html))
    assert _split_http_payload(deflated)[2] == html
    co = _zlib.compressobj(wbits=-15)
    raw_deflate = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
                   b"\r\n" + co.compress(html) + co.flush())
    assert _split_http_payload(raw_deflate)[2] == html
    # undecodable body passes through raw rather than crashing
    junk = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            b"not actually gzip")
    assert _split_http_payload(junk)[2] == b"not actually gzip"


def test_read_warc_dataset(ray_session, tmp_path):
    import gzip as gz

    from risjbot_ray.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(_sample_warc())
    (tmp_path / "b.warc.gz").write_bytes(gz.compress(_sample_warc()))

    df = (read_warc([str(tmp_path / "a.warc"),
                     str(tmp_path / "b.warc.gz")])
          .to_pandas().sort_values(["warc_path", "url"])
          .reset_index(drop=True))
    assert len(df) == 4                     # 2 responses per archive
    assert set(df["url"]) == {"http://a.example/x", "http://b.example/y"}
    assert df["html"].map(bytes).tolist().count(b"<html>alpha</html>") == 2
    # timestamps parsed to real UTC instants
    assert str(df["warc_ts"].iloc[0]).startswith("2024-")
    # lineage column points back to the source archive
    assert df["warc_path"].str.contains("warc").all()


def test_warc_to_extraction_pipeline(ray_session, tmp_path):
    """WARC ingest composes with the extraction stage: pages wrapped
    into WARC response records come out with byte-identical bodytext
    versus the pagegen goldens."""
    import gzip as gz

    from risjbot_ray.extract.stage import extract_batch
    from risjbot_ray.sources.warc import read_warc
    from risjbot_ray.testsupport.pagegen import gen_pages

    pages, exp = gen_pages(20, seed=3)
    recs = []
    for row in pages.to_pylist():
        recs.append(_warc_record(
            "response", row["url"], "2024-01-01T00:00:00Z",
            _http_payload(200, row["html"])))
    (tmp_path / "pages.warc.gz").write_bytes(gz.compress(b"".join(recs)))

    out = (read_warc(str(tmp_path / "pages.warc.gz"))
           .map_batches(extract_batch, batch_format="pyarrow")
           .select_columns(["url", "bodytext"]).to_pandas())
    want = {r["url"]: r["bodytext"] for r in exp.to_pylist()
            if r.get("live", True)}
    got = dict(zip(out["url"], out["bodytext"]))
    live = {u: b for u, b in want.items() if u in got}
    assert len(live) == len(got) > 0
    assert got == live


def test_warcgen_roundtrip(ray_session, tmp_path):
    """The bench's archive synthesis (per-record gzip members, CC
    layout) round-trips every page byte-identically through
    read_warc, and the cache marker makes regeneration a no-op."""
    import pyarrow.parquet as pq

    from risjbot_ray.sources.warc import read_warc
    from risjbot_ray.testsupport.pagegen import gen_pages
    from risjbot_ray.testsupport.warcgen import gen_warc_archives

    pages, _ = gen_pages(200, seed=11)
    pdir = tmp_path / "pages.parquet"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "part-0.parquet"))
    files = gen_warc_archives(str(pdir), str(tmp_path), n_archives=3)
    assert len(files) == 3

    df = read_warc(files).to_pandas()
    assert len(df) == len(pages)
    orig = pages.to_pandas().set_index("url")["html"].map(bytes)
    got = df.set_index("url")["html"].map(bytes)
    assert (orig.loc[got.index] == got).all()

    import os as _os
    mtimes = [_os.path.getmtime(p) for p in files]
    assert gen_warc_archives(str(pdir), str(tmp_path),
                             n_archives=3) == files
    assert [_os.path.getmtime(p) for p in files] == mtimes


def test_wet_ingest_roundtrip(ray_session, tmp_path):
    """WET conversion records (plain-text payload, no HTTP envelope)
    round-trip byte-exactly through read_wet, mixed response/request
    records in the same archive are ignored, and the output feeds the
    documents-shaped operators (unicode survives the decode)."""
    import gzip

    from risjbot_ray.sources.warc import read_wet
    from risjbot_ray.testsupport.warcgen import _warc_record, wet_record

    texts = {
        "https://a.example/1": "plain words here",
        "https://a.example/2": "ünïcode — em-dash and ümlauts",
        "https://a.example/3": "",
    }
    blob = b""
    for url, t in texts.items():
        blob += gzip.compress(wet_record(url, t), compresslevel=1)
    # a response record interleaved: read_wet must skip it
    blob += gzip.compress(_warc_record("https://a.example/html",
                                       b"<html>x</html>"),
                          compresslevel=1)
    p = tmp_path / "chunk.warc.wet.gz"
    p.write_bytes(blob)

    df = read_wet(str(p)).to_pandas().set_index("url")
    assert len(df) == 3
    for url, t in texts.items():
        assert df.loc[url, "text"] == t
        assert df.loc[url, "n_chars"] == len(t)
    assert (df["wet_path"].str.endswith("chunk.warc.wet.gz")).all()
    # and response parsing is unaffected by the added record_types arg
    from risjbot_ray.sources.warc import read_warc
    hdf = read_warc(str(p)).to_pandas()
    assert len(hdf) == 1 and bytes(hdf["html"][0]) == b"<html>x</html>"


def test_dechunk_rejects_negative_chunk_size():
    """A hostile/corrupt chunked entity starting with a negative hex
    size (e.g. b"-6\\r\\n") previously looped forever with unbounded
    memory growth; it must fall back to the raw bytes instead."""
    from risjbot_ray.sources.warc import _dechunk

    data = b"-6\r\n" + b"A" * 50
    assert _dechunk(data) == data
    # sanity: well-formed framing still decodes
    assert _dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"


def test_warc_overlong_line_bounded_and_resynced():
    """A corrupt record followed by a newline-free multi-MB blob must
    neither materialize the blob in one readline() nor stop the parse:
    the parser skims it in bounded slices and resyncs at the next
    WARC/ line."""
    import io as _io

    from risjbot_ray.sources.warc import iter_warc_records

    good = _warc_record("response", "http://a.example/x",
                        "2024-01-01T00:00:01Z",
                        _http_payload(200, b"<html>alpha</html>"))
    # header block whose Content-Length is garbage, then a long
    # newline-free binary run (simulates a corrupted length + raw
    # video bytes), then a good record
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: oops\r\n\r\n" + b"\xff" * (1 << 20))
    errors: dict = {}
    recs = list(iter_warc_records(
        _io.BytesIO(bad + b"\r\n\r\n" + good), errors))
    assert [r["url"] for r in recs] == ["http://a.example/x"]
    assert errors["bad_records"] == 1

    # an over-long HEADER line (no newline within the bound) abandons
    # the record instead of buffering it whole
    bad2 = (b"WARC/1.0\r\nX-Junk: " + b"j" * (1 << 20) + b"\r\n"
            b"Content-Length: 4\r\n\r\nbody\r\n\r\n")
    errors = {}
    recs = list(iter_warc_records(_io.BytesIO(bad2 + good), errors))
    assert [r["url"] for r in recs] == ["http://a.example/x"]
    assert errors["bad_records"] >= 1


def test_split_http_payload_first_header_wins():
    """Duplicate Content-Encoding headers (proxy-appended) must not
    skip the decompress: first occurrence wins for all three headers."""
    import gzip as gz

    from risjbot_ray.sources.warc import _split_http_payload

    html = b"<html>dup</html>"
    dup = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
           b"Content-Encoding: gzip\r\n"
           b"Content-Encoding: identity\r\n\r\n" + gz.compress(html))
    status, ctype, body = _split_http_payload(dup)
    assert body == html


def test_cdx_index_gzip_members_and_random_access(tmp_path):
    """CC-layout archive (one gzip member per record): the index's
    offset/length must address each member exactly, and fetching a
    span must reproduce the record without scanning the archive."""
    import gzip as gz

    from risjbot_ray.sources.warc import (fetch_cdx_spans,
                                          iter_cdx_entries)

    recs = []
    for i in range(7):
        recs.append(gz.compress(_warc_record(
            "response", f"http://ex.example/{i}",
            "2024-01-01T00:00:01Z",
            _http_payload(200, f"<html>page {i}</html>".encode())),
            compresslevel=1))
    # interleave a non-response member that must not be indexed
    raw = b"".join(recs[:3]) + gz.compress(_warc_record(
        "request", "http://ex.example/3", "2024-01-01T00:00:01Z",
        b"GET /3 HTTP/1.1\r\n")) + b"".join(recs[3:])
    p = tmp_path / "a.warc.gz"
    p.write_bytes(raw)

    entries = list(iter_cdx_entries(raw, str(p)))
    assert [e["url"] for e in entries] == \
        [f"http://ex.example/{i}" for i in range(7)]
    # each offset/length must decode standalone to that exact record
    for e in entries:
        blob = raw[e["offset"]:e["offset"] + e["length"]]
        assert gz.decompress(blob).startswith(b"WARC/1.0")
    got = fetch_cdx_spans(str(p), [(e["offset"], e["length"],
                                    e["rec_seq"])
                                   for e in entries[::2]])
    assert [r["html"] for r in got] == \
        [f"<html>page {i}</html>".encode() for i in (0, 2, 4, 6)]
    # digests identify identical payloads
    assert len({e["digest"] for e in entries}) == 7


def test_cdx_index_plain_and_multirecord_member(tmp_path):
    """Plain .warc offsets address raw record bytes; a single gzip
    member holding several records is disambiguated by rec_seq."""
    import gzip as gz

    from risjbot_ray.sources.warc import (fetch_cdx_spans,
                                          iter_cdx_entries)

    plain = _sample_warc()           # warcinfo + request + 2 responses
    p1 = tmp_path / "plain.warc"
    p1.write_bytes(plain)
    entries = list(iter_cdx_entries(plain, str(p1)))
    assert len(entries) == 2 and not entries[0]["compressed"]
    for e in entries:
        blob = plain[e["offset"]:e["offset"] + e["length"]]
        assert blob.startswith(b"WARC/1.0")
        got = fetch_cdx_spans(str(p1), [(e["offset"], e["length"], 0)])
        assert got[0]["url"] == e["url"]

    # whole-archive gzip = ONE member with both responses inside
    p2 = tmp_path / "whole.warc.gz"
    p2.write_bytes(gz.compress(plain))
    entries2 = list(iter_cdx_entries(p2.read_bytes(), str(p2)))
    assert [e["rec_seq"] for e in entries2] == [0, 1]
    assert entries2[0]["offset"] == entries2[1]["offset"]
    got = fetch_cdx_spans(str(p2), [(entries2[1]["offset"],
                                     entries2[1]["length"], 1)])
    assert got[0]["url"] == entries2[1]["url"]


def test_cdx_index_survives_corrupt_and_oversized_members(tmp_path,
                                                          monkeypatch):
    """Robustness contract of the indexer: (a) an archive whose first
    gzip member is corrupt indexes as empty WITHOUT failing the task;
    (b) an oversized member MID-archive is stream-discarded and
    counted — the members after it still index (previously the whole
    remainder of the archive was silently dropped)."""
    import gzip as gz

    import risjbot_ray.sources.warc as warc_mod
    from risjbot_ray.sources.warc import _cdx_batch, iter_cdx_entries

    # (a) corrupt first member: counted, no crash, empty index
    bad = b"\x1f\x8b" + b"\x00" * 64
    p = tmp_path / "bad.warc.gz"
    p.write_bytes(bad)
    t = pa.table({"path": pa.array([str(p)], pa.string())})
    chunks = list(_cdx_batch(t))
    assert sum(c.num_rows for c in chunks) == 0

    # (b) oversized member between two good ones (cap lowered so the
    # test stays tiny)
    monkeypatch.setattr(warc_mod, "_MEMBER_MAX_BYTES", 1 << 16)
    good = [gz.compress(_warc_record(
        "response", f"http://ex.example/{i}", "2024-01-01T00:00:01Z",
        _http_payload(200, f"<html>p{i}</html>".encode())),
        compresslevel=1) for i in range(2)]
    huge = gz.compress(b"\x00" * (1 << 20), compresslevel=1)
    raw = good[0] + huge + good[1]
    errors: dict = {}
    entries = list(iter_cdx_entries(raw, "x.warc.gz", errors))
    assert [e["url"] for e in entries] == \
        ["http://ex.example/0", "http://ex.example/1"]
    assert errors["bad_members"] == 1
    # offsets still address the good members exactly
    for e in entries:
        assert gz.decompress(
            raw[e["offset"]:e["offset"] + e["length"]]
        ).startswith(b"WARC/1.0")


def test_cdx_selective_read_dataset(ray_session, tmp_path):
    """End-to-end: build the CDX index as a Dataset, filter it, and
    read back exactly the selected pages via ranged fetches."""
    import pyarrow.parquet as pq

    from risjbot_ray.sources.warc import cdx_index, read_warc_selective
    from risjbot_ray.testsupport.pagegen import gen_pages
    from risjbot_ray.testsupport.warcgen import gen_warc_archives

    pages, _ = gen_pages(120, seed=7)
    pdir = tmp_path / "pages.parquet"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "part-0.parquet"))
    files = gen_warc_archives(str(pdir), str(tmp_path), n_archives=3)

    idx = cdx_index(files)
    # the index is small: filter on the driver-visible column set only
    want = idx.filter(lambda r: r["url"].endswith(("0", "5")))
    out = read_warc_selective(want).to_pandas()
    orig = pages.to_pandas()
    sel = orig[orig["url"].str.endswith(("0", "5"))]
    assert sorted(out["url"]) == sorted(sel["url"])
    om = out.set_index("url")["html"].map(bytes)
    sm = sel.set_index("url")["html"].map(bytes)
    assert (om.loc[sm.index] == sm).all()


def test_warc_cdx_check_query_all_zero(ray_session):
    """The driver-visible CDX self-check row must be all-zero
    mismatches (offsets address stored bytes; ranged fetch reproduces
    pages byte-identically)."""
    import __ray_entry__ as entry

    row = entry.queries()["warc_cdx_check"]("unused").to_pylist()[0]
    assert row["url_set_mismatch"] == 0
    assert row["digest_mismatches"] == 0
    assert row["fetch_html_mismatches"] == 0
    assert row["fetch_count_ok"]
    assert row["n_index_rows"] == row["n_pages"]


def test_cdx_whole_file_gzip_fallback(tmp_path, monkeypatch):
    """An archive that is one giant gzip member (whole-file gzip) must
    fall back to whole-file entries (offset 0, global rec_seq) without
    buffering the raw archive, and a truncated tail must be counted,
    not raised."""
    import gzip as gz

    from risjbot_ray.sources import warc as W

    plain = _sample_warc()          # 2 response records
    raw = gz.compress(plain)
    monkeypatch.setattr(W, "_MEMBER_MAX_BYTES", 64)  # force fallback
    errors: dict = {}
    entries = list(W.iter_cdx_entries(raw, "whole.warc.gz", errors))
    assert [e["rec_seq"] for e in entries] == [0, 1]
    assert all(e["offset"] == 0 and e["length"] == len(raw)
               for e in entries)

    p = tmp_path / "whole.warc.gz"
    p.write_bytes(raw)
    got = W.fetch_cdx_spans(str(p), [(0, len(raw), 1)])
    assert got[0]["url"] == entries[1]["url"]

    # truncated tail after a good member: counted, not raised
    good = gz.compress(_warc_record(
        "response", "http://a.example/x", "2024-01-01T00:00:01Z",
        _http_payload(200, b"<html>alpha</html>")), compresslevel=1)
    monkeypatch.setattr(W, "_MEMBER_MAX_BYTES", 64 << 20)
    errors = {}
    entries = list(W.iter_cdx_entries(good + good[:25],
                                      "trunc.warc.gz", errors))
    assert [e["url"] for e in entries] == ["http://a.example/x"]
    assert errors["bad_members"] == 1


def test_join_comments_bucketed_matches_broadcast(ray_session,
                                                  monkeypatch):
    """The large-large bucketed hash-join plan must reproduce the
    broadcast plan exactly (bodies ordered by comment_id either way),
    including no-comment and null-articleid articles."""
    import ray

    from risjbot_ray.pipelines import comments as cm
    arts = ray.data.from_arrow(pa.table({
        "url": [f"u{i}" for i in range(8)],
        "articleid": ["a1", "a2", None, "a3", "a1x", "a4", "a5", "a6"],
    }))
    rows = []
    for i, aid in enumerate(["a1", "a1", "a3", "a3", "a3", "a5"]):
        rows.append({"articleid": aid, "comment_id": 100 - i,
                     "author": f"w{i}", "body": f"body-{aid}-{100 - i}"})
    ctbl = pa.Table.from_pylist(rows, schema=cm.COMMENTS_SCHEMA)

    fast = {r["url"]: r for r in
            cm.join_comments(arts, ctbl).take_all()}
    monkeypatch.setattr(cm, "_COMMENTS_BCAST_MAX", -1)
    slow = {r["url"]: r for r in
            cm.join_comments(arts, ctbl).take_all()}
    assert set(fast) == set(slow)
    for u in fast:
        assert fast[u]["rawcomments"] == slow[u]["rawcomments"], u
        assert fast[u]["n_comments"] == slow[u]["n_comments"], u
    # order within an article is by comment_id ascending
    assert fast["u0"]["rawcomments"] == ["body-a1-99", "body-a1-100"]
    assert fast["u3"]["n_comments"] == 3


def test_join_comments_plans_agree_on_hostile_bodies(ray_session,
                                                     monkeypatch):
    """Bodies containing the old pack separator, JSON metacharacters,
    or NULL must come back identically from both plans (a round-5
    review find: a \\x1f-joined packing split such bodies apart)."""
    import ray

    from risjbot_ray.pipelines import comments as cm
    arts = ray.data.from_arrow(pa.table({
        "url": ["u0", "u1", "u2"],
        "articleid": ["a1", "a2", ""],
    }))
    ctbl = pa.Table.from_pylist([
        {"articleid": "a1", "comment_id": 1, "author": "x",
         "body": "sep\x1finside"},
        {"articleid": "a1", "comment_id": 2, "author": "y",
         "body": '"quotes" and \\ backslash \n newline'},
        {"articleid": "a2", "comment_id": 3, "author": "z",
         "body": None},
        # '' is a REAL key: both plans must attach it identically
        {"articleid": "", "comment_id": 4, "author": "e",
         "body": "empty-id comment"},
    ], schema=cm.COMMENTS_SCHEMA)
    fast = {r["url"]: r for r in
            cm.join_comments(arts, ctbl).take_all()}
    monkeypatch.setattr(cm, "_COMMENTS_BCAST_MAX", -1)
    slow = {r["url"]: r for r in
            cm.join_comments(arts, ctbl).take_all()}
    for u in fast:
        assert fast[u]["rawcomments"] == slow[u]["rawcomments"], u
        assert fast[u]["n_comments"] == slow[u]["n_comments"], u
    assert fast["u0"]["rawcomments"] == [
        "sep\x1finside", '"quotes" and \\ backslash \n newline']
    assert fast["u2"]["rawcomments"] == ["empty-id comment"]


# --------------------------------------------------------------------------
# WARC sink (sinks.write_warc): the engine emits the same CC-layout
# archives sources/warc.py ingests
# --------------------------------------------------------------------------

def _sink_pages() -> pa.Table:
    """Small hostile page table: unicode url, empty + null html, null
    timestamp, a non-200 status and explicit content_type."""
    ts = [datetime(2024, 3, 1, 12, 0, 5, tzinfo=timezone.utc),
          datetime(2025, 1, 2, 3, 4, 5, tzinfo=timezone.utc),
          None,
          datetime(2024, 3, 1, 12, 0, 5, tzinfo=timezone.utc),
          datetime(2024, 6, 6, 6, 6, 6, tzinfo=timezone.utc)]
    return pa.table({
        "url": ["https://ex.example/a",
                "https://ex.example/café",
                "https://ex.example/empty",
                "https://ex.example/null",
                "https://ex.example/went-away"],
        "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
        "html": pa.array([b"<html>alpha</html>",
                          "<html>café — page</html>".encode(),
                          b"", None, b"gone"], pa.binary()),
        "http_status": pa.array([200, 200, 200, 200, 404], pa.int32()),
        "content_type": pa.array(
            ["text/html", "text/html", "text/html", None,
             "text/plain"], pa.string()),
    })


def test_write_warc_roundtrip_and_cdx(ray_session, tmp_path):
    """write_warc -> read_warc reproduces every page byte-for-byte
    (url, payload, second-resolution timestamp, status, content type),
    and cdx_index over the WRITTEN archives yields ranged-fetchable
    spans with correct sha1 digests."""
    import hashlib

    from risjbot_ray.sinks import write_warc
    from risjbot_ray.sources.warc import cdx_index, read_warc

    pages = _sink_pages()
    out = str(tmp_path / "warc_out")
    manifest = write_warc(pages, out)
    assert sum(manifest.column("n_records").to_pylist()) == 5
    for p, nb in zip(manifest.column("path").to_pylist(),
                     manifest.column("n_bytes").to_pylist()):
        import os
        assert os.path.getsize(p) == nb

    got = {r["url"]: r for r in
           read_warc(manifest.column("path").to_pylist()).take_all()}
    assert set(got) == set(pages.column("url").to_pylist())
    for i, u in enumerate(pages.column("url").to_pylist()):
        exp_html = pages.column("html")[i].as_py() or b""
        assert bytes(got[u]["html"]) == exp_html, u
        assert got[u]["http_status"] == \
            pages.column("http_status")[i].as_py()
        exp_ct = pages.column("content_type")[i].as_py() or "text/html"
        assert got[u]["content_type"] == exp_ct
        ts = pages.column("warc_ts")[i].as_py()
        if ts is not None:
            assert got[u]["warc_ts"].replace(tzinfo=timezone.utc) \
                == ts.replace(microsecond=0)

    idx = cdx_index(manifest.column("path").to_pylist()).to_pandas()
    assert set(idx["url"]) == set(got)
    by_url = {u: pages.column("html")[i].as_py() or b""
              for i, u in enumerate(pages.column("url").to_pylist())}
    for u, d in zip(idx["url"], idx["digest"]):
        assert hashlib.sha1(by_url[u]).hexdigest() == d, u


def test_write_warc_resumable_and_bounded(ray_session, tmp_path):
    """Content-addressed parts: a re-run over the same input reuses the
    finished archives (same names, same count, no rewrites), and
    records_per_archive bounds members per archive independently of
    upstream blocking."""
    import glob as g
    import os

    import ray

    from risjbot_ray.sinks import write_warc
    from risjbot_ray.sources.warc import read_warc

    pages = _sink_pages()
    out = str(tmp_path / "w")
    m1 = write_warc(ray.data.from_arrow(pages), out,
                    records_per_archive=2)
    paths1 = sorted(g.glob(os.path.join(out, "*.warc.gz")))
    assert len(paths1) >= 3               # 5 records, <=2 per archive
    mtimes = {p: os.path.getmtime(p) for p in paths1}

    m2 = write_warc(ray.data.from_arrow(pages), out,
                    records_per_archive=2)
    paths2 = sorted(g.glob(os.path.join(out, "*.warc.gz")))
    assert paths1 == paths2
    assert m1.column("path").to_pylist() == \
        m2.column("path").to_pylist()
    for p in paths1:                      # resumed, not rewritten
        assert os.path.getmtime(p) == mtimes[p]

    got = {r["url"]: bytes(r["html"]) for r in
           read_warc(paths2).take_all()}
    assert got["https://ex.example/a"] == b"<html>alpha</html>"
    assert len(got) == 5


def test_write_warc_revisits_and_wide_unicode(ray_session, tmp_path):
    """Review pins: (a) two snapshots of the SAME urls with different
    timestamps/content must produce two distinct archives — a
    URL-only name key silently dropped the second batch; (b) URIs
    beyond latin-1 round-trip (spec: WARC headers are UTF-8)."""
    import ray

    from risjbot_ray.sinks import write_warc
    from risjbot_ray.sources.warc import read_warc

    t1 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t2 = datetime(2024, 6, 1, tzinfo=timezone.utc)
    snap = lambda ts, body: pa.table({
        "url": ["https://ex.example/a", "https://ex.example/日本/ページ"],
        "warc_ts": pa.array([ts, ts], pa.timestamp("us", tz="UTC")),
        "html": pa.array([body, "körper — 本文".encode()], pa.binary()),
    })
    out = str(tmp_path / "w")
    m1 = write_warc(ray.data.from_arrow(snap(t1, b"<v1>")), out)
    m2 = write_warc(ray.data.from_arrow(snap(t2, b"<v2>")), out)
    paths = sorted(set(m1.column("path").to_pylist())
                   | set(m2.column("path").to_pylist()))
    assert len(paths) == 2            # distinct content -> distinct parts
    recs = read_warc(paths).take_all()
    assert len(recs) == 4             # both snapshots preserved
    by_key = {(r["url"], bytes(r["html"])) for r in recs}
    assert ("https://ex.example/a", b"<v1>") in by_key
    assert ("https://ex.example/a", b"<v2>") in by_key
    assert ("https://ex.example/日本/ページ",
            "körper — 本文".encode()) in by_key


def test_write_warc_non_utc_timestamp(ray_session, tmp_path):
    """tz-aware non-UTC timestamps must be converted to UTC before the
    Z-suffixed WARC-Date (review pin: the +02:00 wall clock was being
    labeled Z)."""
    from datetime import timedelta

    import ray

    from risjbot_ray.sinks import write_warc
    from risjbot_ray.sources.warc import read_warc

    # epoch micros pin the INSTANT unambiguously: 10:00:05Z, whose
    # +02:00 wall clock reads 12:00:05 — the bug wrote the wall clock
    # with a Z suffix
    micros = int(datetime(2024, 3, 1, 10, 0, 5,
                          tzinfo=timezone.utc).timestamp()) * 1_000_000
    pages = pa.table({
        "url": ["https://ex.example/t"],
        "warc_ts": pa.array([micros], pa.timestamp("us", tz="+02:00")),
        "html": pa.array([b"x"], pa.binary())})
    assert pages.column("warc_ts")[0].as_py().hour == 12  # +02 wall
    m = write_warc(ray.data.from_arrow(pages), str(tmp_path / "w"))
    rec = read_warc(m.column("path").to_pylist()).take_all()[0]
    got = rec["warc_ts"].replace(tzinfo=timezone.utc)
    assert got == datetime(2024, 3, 1, 10, 0, 5, tzinfo=timezone.utc)
