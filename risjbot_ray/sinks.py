"""Sinks: JSONLines feed export parity + partitioned parquet.

The reference exports one JSON object per item, UTF-8, absent fields
omitted (FEED_FORMAT='jsonlines', settings.py:77-85). Parquet is the
native sink (resumable ``out/wave=K/`` layout written by the crawl
pipeline); JSONLines is for parity dumps and downstream consumers of the
reference's format.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray


def _rows_to_jsonl(table: pa.Table) -> str:
    out = []
    for row in table.to_pylist():
        clean = {k: v for k, v in row.items()
                 if v is not None and v != [] and v != ""}
        out.append(json.dumps(clean, ensure_ascii=False, sort_keys=True))
    return "\n".join(out)


def write_jsonlines(ds, directory: str) -> list[str]:
    """Write a Dataset (or Arrow table) as JSONLines part files, one per
    block, null/absent fields omitted (reference feed-export semantics).
    Distributed: each block serializes in its own Ray task."""
    os.makedirs(directory, exist_ok=True)

    if isinstance(ds, pa.Table):
        path = os.path.join(directory, "part-00000.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write(_rows_to_jsonl(ds) + "\n")
        return [path]

    @ray.remote
    def _write(block: pa.Table, path: str) -> str:
        with open(path, "w", encoding="utf-8") as f:
            f.write(_rows_to_jsonl(block) + "\n")
        return path

    futures = []
    for i, ref in enumerate(ds.to_arrow_refs()):
        path = os.path.join(directory, f"part-{i:05d}.jsonl")
        futures.append(_write.remote(ref, path))
    return ray.get(futures)


def read_jsonlines(paths: str | list[str]):
    """Round-trip reader (ray.data.read_json handles jsonl)."""
    return ray.data.read_json(paths)


# --------------------------------------------------------------------------
# WARC sink: the archive format the engine INGESTS (sources/warc.py) is
# also one it can EMIT, so a crawl's page store round-trips through the
# Common Crawl interchange layout — one gzip MEMBER per record, ISO
# 28500 record heads, HTTP response envelopes — and the repo's own
# cdx_index / read_warc_selective work on the written archives
# unchanged. The reference exports JSONLines only (settings.py:77-85);
# WARC output is the web-scale companion a CC-style corpus needs.
# --------------------------------------------------------------------------

_WARC_EPOCH = "2024-01-01T00:00:00Z"


def _warc_date(ts) -> str:
    """ISO-8601 Z second-resolution WARC-Date from a pyarrow timestamp
    scalar (or None). tz-aware values convert to UTC first — the Z
    suffix must label the actual UTC instant, not a foreign wall
    clock."""
    from datetime import timezone
    if ts is None:
        return _WARC_EPOCH
    dt = ts.as_py() if hasattr(ts, "as_py") else ts
    if dt is None:
        return _WARC_EPOCH
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _warc_response_member(url: str, html: bytes, date: str,
                          status: int, ctype: str) -> bytes:
    """One uncompressed ``response`` record: WARC head + HTTP envelope
    + payload, RFC-framed with CRLF and the record-terminating blank
    block. WARC-Record-ID is derived from (url, date) content — stable
    across re-runs, per-record unique in an archive (the reader
    ignores it; determinism is for byte-identical resumed output).
    WARC-Payload-Digest is the sha1 hex of the PAYLOAD BODY — the same
    value ``cdx_index`` computes, so index rows can be verified
    against record heads without decoding payloads."""
    import hashlib
    import uuid
    payload = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
               f"Content-Length: {len(html)}\r\n\r\n"
               ).encode("latin-1") + html
    rid = uuid.UUID(bytes=hashlib.md5(
        url.encode("utf-8", "surrogatepass") + date.encode()).digest())
    digest = hashlib.sha1(html).hexdigest()
    # UTF-8 per the WARC spec (ISO 28500 §4: header values are UTF-8)
    # — latin-1 would crash on any URI code point above U+00FF; the
    # reader decodes UTF-8 first with a latin-1 fallback for archives
    # from spec-violating writers
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Payload-Digest: sha1:{digest}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def _warcinfo_member(filename: str, date: str) -> bytes:
    """Lead ``warcinfo`` record (CC archives carry one; the reader and
    indexer skip non-response types, so it costs nothing downstream)."""
    fields = (b"software: risjbot_ray\r\n"
              b"format: WARC File Format 1.0\r\n")
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: warcinfo\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Filename: {filename}\r\n"
            f"Content-Type: application/warc-fields\r\n"
            f"Content-Length: {len(fields)}\r\n\r\n").encode("latin-1")
    return head + fields + b"\r\n\r\n"


def warc_archive_bytes(batch: pa.Table, filename: str) -> bytes:
    """Serialize one page batch (url:string, html:binary, optional
    warc_ts / http_status / content_type) into Common-Crawl-layout
    ``.warc.gz`` bytes: a warcinfo lead member, then one gzip member
    per response record."""
    import gzip
    names = set(batch.column_names)
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    tss = (batch.column("warc_ts").to_pylist()
           if "warc_ts" in names else [None] * len(urls))
    sts = (batch.column("http_status").to_pylist()
           if "http_status" in names else [200] * len(urls))
    cts = (batch.column("content_type").to_pylist()
           if "content_type" in names else ["text/html"] * len(urls))
    first_date = _warc_date(tss[0] if tss else None)
    out = [gzip.compress(_warcinfo_member(filename, first_date),
                         compresslevel=1)]
    for u, h, t, s, c in zip(urls, htmls, tss, sts, cts):
        out.append(gzip.compress(_warc_response_member(
            u or "", bytes(h or b""), _warc_date(t),
            int(s) if s is not None else 200, c or "text/html"),
            compresslevel=1))
    return b"".join(out)


def write_warc(ds, out_dir: str,
               records_per_archive: int | None = None) -> pa.Table:
    """Distributed WARC sink: write a page Dataset (columns url:string,
    html:binary, optional warc_ts/http_status/content_type) as
    ``.warc.gz`` archives under ``out_dir``, one archive per batch
    written inside the map task that holds the block — page bytes
    never move to the driver. Returns the small manifest table
    (path, n_records, n_bytes), one row per archive.

    Resumable by construction: archive names are content-addressed
    (md5 over the member urls + record count), written ``.tmp`` then
    atomically renamed — a re-run over identical input recomputes the
    same names and SKIPS archives already on disk, so a failed run
    continues where it stopped and never half-writes a member. Pass
    ``records_per_archive`` to bound archive size independently of the
    upstream block size (a 100-TB store wants ~1 GiB archives
    regardless of how the pipeline blocked the pages)."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)

    def _write(batch: pa.Table) -> pa.Table:
        empty = pa.table({"path": pa.array([], pa.string()),
                          "n_records": pa.array([], pa.int64()),
                          "n_bytes": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        # CONTENT-addressed name: urls + timestamps + payload digests
        # — a URL-only key would collide for two snapshots of the
        # same urls (warc_ts exists precisely for revisits) and would
        # wrongly reuse a stale archive after page bytes changed.
        # Batches with byte-identical content still collapse to one
        # archive (a retried/duplicated batch IS the same archive).
        names = set(batch.column_names)
        sig = hashlib.md5()
        tss = (batch.column("warc_ts").to_pylist()
               if "warc_ts" in names else [None] * batch.num_rows)
        sts = (batch.column("http_status").to_pylist()
               if "http_status" in names else [200] * batch.num_rows)
        cts = (batch.column("content_type").to_pylist()
               if "content_type" in names else [None] * batch.num_rows)
        for u, h, t, s, c in zip(batch.column("url").to_pylist(),
                                 batch.column("html").to_pylist(),
                                 tss, sts, cts):
            sig.update((u or "").encode("utf-8", "surrogatepass"))
            sig.update(b"\x00")
            sig.update(f"{_warc_date(t)}|{s}|{c or ''}".encode())
            sig.update(hashlib.md5(bytes(h or b"")).digest())
        sig.update(str(batch.num_rows).encode())
        name = f"part-{sig.hexdigest()[:16]}.warc.gz"
        path = os.path.join(out_dir, name)
        if not os.path.exists(path):       # resume: skip finished parts
            raw = warc_archive_bytes(batch, name)
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(raw)
            os.replace(tmp, path)
            n_bytes = len(raw)
        else:
            n_bytes = os.path.getsize(path)
        return pa.table({
            "path": pa.array([path], pa.string()),
            "n_records": pa.array([batch.num_rows], pa.int64()),
            "n_bytes": pa.array([n_bytes], pa.int64())})

    manifest = ds.map_batches(
        _write, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=records_per_archive)
    # the manifest is O(#archives) rows — tiny by construction
    out = manifest.take_all()
    tbl = pa.table({
        "path": pa.array([r["path"] for r in out], pa.string()),
        "n_records": pa.array([r["n_records"] for r in out], pa.int64()),
        "n_bytes": pa.array([r["n_bytes"] for r in out], pa.int64())})
    return tbl.sort_by("path")
