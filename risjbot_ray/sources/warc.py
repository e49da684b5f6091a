"""WARC ingestion: Common Crawl's native archive format -> the
engine's page table ``(url, warc_ts, html, ...)``.

The reference crawls live sites; at 100-TB scale the same corpus
arrives as WARC archives (ISO 28500), which is what the BASELINE's
"Common-Crawl-style Parquet" tables are derived from. This source
closes that gap: ``read_warc(paths)`` is the ingest step that turns
raw archives into exactly the parquet page schema every other pipeline
stage consumes.

Scale shape: one WARC file is one Ray task (``read_binary_files`` +
``flat_map``-style batch parse). Common Crawl ships ~1 GiB .warc.gz
files in the tens of thousands per snapshot, so file granularity IS
the right parallelism unit; records inside a file are sequential by
format (gzip members are concatenated per record, so a file cannot be
split without an index). Pure-Python parser, no external deps —
the format is line headers + Content-Length payloads.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa
import ray

_CRLF = b"\r\n"


def parse_warc_records(raw: bytes) -> list[dict]:
    """Parse a (possibly gzipped) WARC byte stream into dicts for each
    ``response`` record: url, warc_ts (epoch micros), http_status,
    content_type, html (payload body bytes). Non-response records
    (warcinfo / request / metadata) are skipped. Gzip is handled for
    both whole-file and per-record-member compression (Python's gzip
    transparently reads concatenated members)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = raw.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        lines = raw[pos:head_end].split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            break                      # desynced: stop, don't loop
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = head_end + 4
        body = raw[body_start:body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = _warc_date_to_micros(headers.get("warc-date", ""))
        status, ctype, html = _split_http_payload(body)
        out.append({"url": url, "warc_ts": ts, "http_status": status,
                    "content_type": ctype, "html": html})
    return out


def _warc_date_to_micros(s: str) -> int:
    """WARC-Date (ISO-8601 Z) -> epoch microseconds; 0 if absent."""
    if not s:
        return 0
    try:
        dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        try:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError:
            return 0
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def _split_http_payload(body: bytes) -> tuple[int, str, bytes]:
    """A WARC response payload is an HTTP/1.x message: split status +
    headers from the entity body. Returns (status, content_type,
    body). Payloads that are not HTTP (rare) pass through whole."""
    if not body.startswith(b"HTTP/"):
        return 200, "", body
    he = body.find(_CRLF + _CRLF)
    if he < 0:
        return 200, "", body
    lines = body[:he].split(_CRLF)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = 200
    ctype = ""
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body[he + 4:]


def _records_batch(batch: pa.Table) -> pa.Table:
    urls, tss, sts, cts, bodies, paths = [], [], [], [], [], []
    path_col = batch.column("path").to_pylist()
    for raw, path in zip(batch.column("bytes").to_pylist(), path_col):
        for rec in parse_warc_records(raw):
            urls.append(rec["url"])
            tss.append(rec["warc_ts"])
            sts.append(rec["http_status"])
            cts.append(rec["content_type"])
            bodies.append(rec["html"])
            paths.append(path)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
        "http_status": pa.array(sts, pa.int32()),
        "content_type": pa.array(cts, pa.string()),
        "html": pa.array(bodies, pa.binary()),
        "warc_path": pa.array(paths, pa.string()),
    })


def read_warc(paths: str | list[str]) -> "ray.data.Dataset":
    """Read WARC (or .warc.gz) archives into a page Dataset with
    columns (url, warc_ts, http_status, content_type, html,
    warc_path) — the input shape of the extraction pipeline
    (``warc_path`` gives per-record lineage back to its archive).
    One archive = one read task; parsing runs inside ``map_batches``
    on the worker that read the bytes, so archive payloads never
    concentrate on the driver."""
    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(_records_batch, batch_format="pyarrow",
                             batch_size=1)
