"""Adversarial hypothesis fuzzing of the WARC stream parser (VERDICT r3
item 8): real archives arrive truncated, garbage-spliced, and partially
corrupt; ``iter_warc_records`` must never raise, never spin, and never
drop well-formed neighbor records."""

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from risjbot_ray.sources.warc import iter_warc_records, parse_warc_records


def _record(url: str, payload: bytes, wtype: str = "response") -> bytes:
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2024-01-02T03:04:05Z\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n").encode()
    return head + payload + b"\r\n\r\n"


# arbitrary payload bytes — content-length framing must make ANY payload
# safe, including ones containing b"WARC/" version lines
_payload = st.binary(max_size=120)

# inter-record garbage: anything that does not itself start a syntactic
# record (no b"WARC/" line) and ends on a line boundary, so it cannot
# glue onto the next record's version line
_garbage = (st.binary(max_size=60)
            .filter(lambda b: b"WARC/" not in b)
            .map(lambda b: b + b"\r\n"))


@st.composite
def archives(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    payloads = [draw(_payload) for _ in range(n)]
    recs = [_record(f"http://h{i}.example/p", p)
            for i, p in enumerate(payloads)]
    return recs, payloads


@given(archives(), st.lists(_garbage, min_size=0, max_size=5))
@settings(max_examples=500, deadline=None)
def test_garbage_between_records_never_drops_neighbors(arch, junk):
    recs, payloads = arch
    pieces = []
    for i, r in enumerate(recs):
        if i < len(junk):
            pieces.append(junk[i])
        pieces.append(r)
    pieces.extend(junk[len(recs):])
    raw = b"".join(pieces)
    errors: dict = {}
    out = list(iter_warc_records(io.BytesIO(raw), errors))
    assert [r["html"] for r in out] == payloads
    assert [r["url"] for r in out] == \
        [f"http://h{i}.example/p" for i in range(len(payloads))]


@given(archives(), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=500, deadline=None)
def test_truncation_yields_exact_prefix(arch, cut_seed):
    recs, payloads = arch
    raw = b"".join(recs)
    full = list(iter_warc_records(io.BytesIO(raw)))
    cut = cut_seed % (len(raw) + 1)
    errors: dict = {}
    out = list(iter_warc_records(io.BytesIO(raw[:cut]), errors))
    # never raises, always terminates, and yields an exact prefix
    got = [(r["url"], r["html"]) for r in out]
    want = [(r["url"], r["html"]) for r in full]
    assert got == want[:len(got)]
    # every record whose byte span is wholly before the cut survives
    n_complete = sum(1 for r in full if r["offset"] + r["length"] <= cut)
    assert len(got) >= n_complete


@given(archives(), st.integers(min_value=0, max_value=3))
@settings(max_examples=500, deadline=None)
def test_corrupt_record_resyncs_to_neighbors(arch, which):
    recs, payloads = arch
    victim = which % len(recs)
    # corrupt ONE record by stripping its Content-Length header; its
    # (WARC/-free) payload desyncs the stream until the next record
    mutated = []
    for i, r in enumerate(recs):
        if i == victim:
            head, _, tail = r.partition(b"\r\n\r\n")
            lines = [ln for ln in head.split(b"\r\n")
                     if not ln.lower().startswith(b"content-length:")]
            body = tail
            if b"WARC/" in body:        # keep the property sound: the
                body = b""              # orphaned payload must not start
                #                         a bogus record of its own
            mutated.append(b"\r\n".join(lines) + b"\r\n\r\n" + body)
        else:
            mutated.append(r)
    errors: dict = {}
    out = list(iter_warc_records(io.BytesIO(b"".join(mutated)), errors))
    survivors = [p for i, p in enumerate(payloads) if i != victim]
    assert [r["html"] for r in out] == survivors
    assert errors["bad_records"] >= 1


@given(st.binary(max_size=400),
       st.sampled_from([b"", b"\x1f\x8b", b"\x1f\x8b\x08\x00"]))
@settings(max_examples=500, deadline=None)
def test_arbitrary_bytes_never_raise(raw, gz_prefix):
    # pure fuzz: any byte string — including one wearing a gzip magic
    # number over a corrupt stream — parses to SOME list without raising
    out = parse_warc_records(gz_prefix + raw)
    assert isinstance(out, list)


# --------------------------------------------------------------------------
# writer <-> reader round trip (the sink, sinks.warc_archive_bytes):
# any page content must survive write -> parse byte-exactly
# --------------------------------------------------------------------------

# URLs spanning ASCII, latin-1, BMP and astral codepoints; no
# whitespace/control chars (a URI cannot contain raw CR/LF — the header
# framing forbids them, matching real crawlers' percent-encoding)
_url_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc", "Zs"),
                           blacklist_characters="\r\n"),
    min_size=1, max_size=40)


@given(st.lists(st.tuples(_url_text, st.binary(max_size=200)),
                min_size=1, max_size=6, unique_by=lambda t: t[0]),
       st.integers(min_value=200, max_value=599))
@settings(max_examples=300, deadline=None)
def test_writer_reader_roundtrip_any_content(pages, status):
    """warc_archive_bytes -> iter_warc_records reproduces every (url,
    body, status) byte-exactly for arbitrary payloads (including
    bodies containing WARC/ version lines and CRLF runs) and URIs
    across the full unicode range (ISO 28500: UTF-8 headers)."""
    import gzip

    import pyarrow as pa

    from risjbot_ray.sinks import warc_archive_bytes

    urls = ["https://ex.example/" + u for u, _ in pages]
    batch = pa.table({
        "url": urls,
        "html": pa.array([b for _, b in pages], pa.binary()),
        "http_status": pa.array([status] * len(pages), pa.int32()),
    })
    raw = warc_archive_bytes(batch, "t.warc.gz")
    # concatenated per-record gzip members -> one plain stream
    plain = b""
    bio = io.BytesIO(raw)
    while bio.tell() < len(raw):
        with gzip.GzipFile(fileobj=bio) as g:
            plain += g.read()
    recs = list(iter_warc_records(io.BytesIO(plain)))
    assert [(r["url"], r["html"], r["http_status"]) for r in recs] == \
        [(u, b, status) for u, (_, b) in zip(urls, pages)]
