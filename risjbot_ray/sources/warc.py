"""WARC ingestion: Common Crawl's native archive format -> the
engine's page table ``(url, warc_ts, html, ...)``.

The reference crawls live sites; at 100-TB scale the same corpus
arrives as WARC archives (ISO 28500), which is what the BASELINE's
"Common-Crawl-style Parquet" tables are derived from. This source
closes that gap: ``read_warc(paths)`` is the ingest step that turns
raw archives into exactly the parquet page schema every other pipeline
stage consumes.

Scale shape: one WARC file is one Ray task (``read_binary_files`` +
a generator ``map_batches`` parse). Common Crawl ships ~1 GiB .warc.gz
files in the tens of thousands per snapshot, so file granularity IS
the right parallelism unit; records inside a file are sequential by
format (gzip members are concatenated per record, so a file cannot be
split without an index). The parse is STREAMING — the decompressed
archive (4-5 GiB raw per 1 GiB .warc.gz) is never materialized: the
gzip stream is read record by record and output tables are yielded in
bounded chunks, so per-task memory is O(compressed file + one chunk),
not O(raw archive). Malformed records never silently truncate the
file: the parser resyncs at the next ``WARC/`` version line and
counts what it skipped. Pure-Python parser, no external deps — the
format is line headers + Content-Length payloads.
"""

from __future__ import annotations

import gzip
import io
import logging
import zlib
from datetime import datetime, timezone
from typing import IO, Iterator

import pyarrow as pa
import ray

_CRLF = b"\r\n"
_log = logging.getLogger(__name__)

# yield an output table once buffered bodies reach this many bytes
_CHUNK_BYTES = 64 * 1024 * 1024
_CHUNK_RECORDS = 4096

# readline() bound: a header/version line longer than this is treated as
# desynced bytes, so a corrupt Content-Length followed by a newline-free
# multi-GiB binary body can never materialize in one readline() call
# (which would defeat the O(one-record) memory guarantee).
_MAX_LINE = 1 << 16


def iter_warc_records(stream: IO[bytes],
                      errors: dict | None = None,
                      record_types: tuple = ("response",)
                      ) -> Iterator[dict]:
    """Stream records of the given WARC types from a binary WARC
    stream as dicts: url, warc_ts (epoch micros), http_status,
    content_type, html (decoded payload body bytes). ``response``
    records carry an HTTP envelope that is split off; ``conversion``
    records (the WET extracted-text layout Common Crawl ships next to
    each snapshot) have no envelope — the payload IS the content, so
    http_status is 0 and content_type comes from the WARC header.
    Records of other types (warcinfo / request / metadata) are
    skipped.

    Memory is O(one record): headers are read line by line and the
    payload with one bounded ``read``. A malformed record (missing or
    non-integer Content-Length, header block without terminator) does
    NOT stop the parse — the parser counts it and skims forward to the
    next ``WARC/`` version line, so one corrupt record cannot silently
    drop the rest of a 100k-record archive. Pass ``errors={}`` to
    receive counters: ``bad_records`` (records abandoned mid-parse)
    and ``skipped_lines`` (desynced lines skimmed during resync)."""
    err = errors if errors is not None else {}
    err.setdefault("bad_records", 0)
    err.setdefault("skipped_lines", 0)
    while True:
        line = stream.readline(_MAX_LINE)
        if not line:
            return
        if line in (b"\r\n", b"\n") or not line.strip():
            continue                       # inter-record blank lines
        if not line.startswith(b"WARC/") or not line.endswith(b"\n"):
            err["skipped_lines"] += 1      # desynced: skim to resync
            continue
        rec_start = stream.tell() - len(line)
        headers: dict[str, str] = {}
        terminated = False
        while True:
            h = stream.readline(_MAX_LINE)
            if not h:                      # EOF inside header block
                err["bad_records"] += 1
                return
            if h in (b"\r\n", b"\n"):
                terminated = True
                break
            if not h.endswith(b"\n"):      # over-long line: desynced
                break
            k, sep, v = h.partition(b":")
            if sep:
                vb = v.strip()
                try:
                    # UTF-8 per ISO 28500 §4 (what write_warc emits,
                    # incl. non-ASCII WARC-Target-URI values) ...
                    val = vb.decode("utf-8")
                except UnicodeDecodeError:
                    # ... latin-1 for spec-violating archives in the
                    # wild — never fails, preserves the bytes
                    val = vb.decode("latin-1")
                headers[k.strip().lower().decode("latin-1")] = val
        if not terminated:                 # abandoned on over-long line
            err["bad_records"] += 1
            continue
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            # payload extent unknown: count it and let the outer loop
            # skim forward to the next WARC/ line
            err["bad_records"] += 1
            continue
        body = stream.read(length)
        if len(body) < length:             # truncated archive tail
            err["bad_records"] += 1
            return
        rtype = headers.get("warc-type")
        if rtype not in record_types:
            continue
        url = headers.get("warc-target-uri", "")
        ts = _warc_date_to_micros(headers.get("warc-date", ""))
        if rtype == "response":
            status, ctype, html = _split_http_payload(body)
        else:       # conversion / resource: payload is the content
            status, ctype, html = 0, headers.get("content-type",
                                                 ""), body
        yield {"url": url, "warc_ts": ts, "http_status": status,
               "content_type": ctype, "html": html,
               # stream offset span of this record (version line ..
               # end of payload), for CDX indexing of PLAIN archives;
               # on a GzipFile stream these are decompressed offsets
               "offset": rec_start, "length": stream.tell() - rec_start}


class _TolerantRaw(io.RawIOBase):
    """Raw-level gzip adapter that converts mid-stream decompression
    failures (truncated member, garbage after the magic number, bad
    deflate blocks) into clean EOF: one corrupt .warc.gz must cost its
    unread tail, never the whole ingest task. BadGzipFile subclasses
    OSError; EOFError covers truncated members; zlib.error covers
    corrupt deflate streams. Sits UNDER an io.BufferedReader so the
    try/except runs once per 64 KB chunk, not once per header line
    (the per-line Python wrapper cost +30% on warc_cdx_index)."""

    def __init__(self, inner: IO[bytes]):
        super().__init__()
        self._inner = inner
        self.decode_error = False

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        try:
            chunk = self._inner.read(len(b))
        except (EOFError, OSError, zlib.error):
            self.decode_error = True
            return 0
        b[: len(chunk)] = chunk
        return len(chunk)


class _TolerantStream:
    """C-buffered readline over ``_TolerantRaw`` with a byte-exact
    ``tell()`` (decompressed offset — BufferedReader.tell needs a
    seekable raw, which gzip is not)."""

    def __init__(self, inner: IO[bytes]):
        self._raw = _TolerantRaw(inner)
        self._br = io.BufferedReader(self._raw, 1 << 16)
        self._pos = 0

    @property
    def decode_error(self) -> bool:
        return self._raw.decode_error

    def readline(self, n: int = -1) -> bytes:
        line = self._br.readline(n)
        self._pos += len(line)
        return line

    def read(self, n: int = -1) -> bytes:
        data = self._br.read(n)
        self._pos += len(data)
        return data

    def tell(self) -> int:
        return self._pos


def _open_stream(raw: bytes) -> IO[bytes]:
    """Wrap raw archive bytes as a record-streamable file object;
    gzip (whole-file or concatenated per-record members — GzipFile
    reads both transparently) is decompressed lazily, never as one
    giant bytes object. Decompression errors surface as EOF, not
    exceptions (see _TolerantStream)."""
    if raw[:2] == b"\x1f\x8b":
        return _TolerantStream(gzip.GzipFile(fileobj=io.BytesIO(raw)))
    return io.BytesIO(raw)


def parse_warc_records(raw: bytes) -> list[dict]:
    """Parse a (possibly gzipped) WARC byte string into a list of
    ``response`` record dicts (see ``iter_warc_records``). Logs a
    warning with counts if malformed records were skipped."""
    errors: dict = {}
    out = list(iter_warc_records(_open_stream(raw), errors))
    if errors["bad_records"] or errors["skipped_lines"]:
        _log.warning(
            "parse_warc_records: skipped %d malformed record(s), "
            "%d desynced line(s); %d response record(s) parsed",
            errors["bad_records"], errors["skipped_lines"], len(out))
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


def _dechunk(data: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing. Returns the input
    unchanged if the framing is malformed (best effort — better the
    raw bytes than dropping the page)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            return data
        try:
            size = int(data[pos:eol].split(b";", 1)[0], 16)
        except ValueError:
            return data
        if size < 0:                       # hostile "-6\r\n" framing
            return data
        if size == 0:
            break
        start = eol + 2
        if start + size > n:
            return data
        out.append(data[start:start + size])
        pos = start + size + 2             # skip the chunk's CRLF
    return b"".join(out)


def _decompress_entity(body: bytes, encoding: str) -> bytes:
    """Undo Content-Encoding gzip/deflate; raw bytes on failure."""
    try:
        if encoding in ("gzip", "x-gzip"):
            return gzip.decompress(body)
        if encoding == "deflate":
            try:
                return zlib.decompress(body)
            except zlib.error:             # raw deflate (no zlib hdr)
                return zlib.decompress(body, -zlib.MAX_WBITS)
    except Exception:
        pass
    return body


def _split_http_payload(body: bytes) -> tuple[int, str, bytes]:
    """A WARC response payload is an HTTP/1.x message: split status +
    headers from the entity body, undoing ``Transfer-Encoding:
    chunked`` framing and ``Content-Encoding: gzip/deflate`` so the
    html column holds markup, not framing or compressed bytes (CC
    archives store pages as served). Returns (status, content_type,
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
    tenc = ""
    cenc = ""
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        key = k.strip().lower()
        if key == b"content-type" and not ctype:
            ctype = v.strip().decode("latin-1")
        elif key == b"transfer-encoding" and not tenc:
            tenc = v.strip().lower().decode("latin-1")
        elif key == b"content-encoding" and not cenc:
            cenc = v.strip().lower().decode("latin-1")
    entity = body[he + 4:]
    if "chunked" in tenc:
        entity = _dechunk(entity)
    if cenc and cenc != "identity":
        entity = _decompress_entity(entity, cenc)
    return status, ctype, entity


def _records_batch(batch: pa.Table) -> Iterator[pa.Table]:
    """Generator UDF: stream-parse each archive and yield output
    tables every ``_CHUNK_BYTES`` of body payload, so a 1 GiB .warc.gz
    (4-5 GiB raw) never sits fully decoded in one task's heap."""
    path_col = batch.column("path").to_pylist()

    def flush(buf):
        urls, tss, sts, cts, bodies, paths = buf
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "http_status": pa.array(sts, pa.int32()),
            "content_type": pa.array(cts, pa.string()),
            "html": pa.array(bodies, pa.binary()),
            "warc_path": pa.array(paths, pa.string()),
        })

    buf = ([], [], [], [], [], [])
    pending_bytes = 0
    yielded_any = False
    for raw, path in zip(batch.column("bytes").to_pylist(), path_col):
        errors: dict = {}
        for rec in iter_warc_records(_open_stream(raw), errors):
            buf[0].append(rec["url"])
            buf[1].append(rec["warc_ts"])
            buf[2].append(rec["http_status"])
            buf[3].append(rec["content_type"])
            buf[4].append(rec["html"])
            buf[5].append(path)
            pending_bytes += len(rec["html"])
            if (pending_bytes >= _CHUNK_BYTES
                    or len(buf[0]) >= _CHUNK_RECORDS):
                yield flush(buf)
                yielded_any = True
                buf = ([], [], [], [], [], [])
                pending_bytes = 0
        if errors.get("bad_records") or errors.get("skipped_lines"):
            _log.warning(
                "read_warc: %s: skipped %d malformed record(s), "
                "%d desynced line(s)", path,
                errors["bad_records"], errors["skipped_lines"])
    # only emit an empty (schema-bearing) block if the task produced no
    # other output — avoids a zero-row block per archive at CC scale
    if buf[0] or not yielded_any:
        yield flush(buf)


def read_warc(paths: str | list[str]) -> "ray.data.Dataset":
    """Read WARC (or .warc.gz) archives into a page Dataset with
    columns (url, warc_ts, http_status, content_type, html,
    warc_path) — the input shape of the extraction pipeline
    (``warc_path`` gives per-record lineage back to its archive).
    One archive = one read task; parsing streams inside a generator
    ``map_batches`` on the worker that read the bytes, yielding
    bounded chunks, so archive payloads never concentrate on the
    driver or sit fully decoded in a worker heap."""
    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(_records_batch, batch_format="pyarrow",
                             batch_size=1)


def _wet_records_batch(batch: pa.Table) -> Iterator[pa.Table]:
    """Generator UDF for WET archives: stream-parse ``conversion``
    records and yield bounded document chunks (url, warc_ts, text,
    n_chars, wet_path)."""
    path_col = batch.column("path").to_pylist()

    def flush(buf):
        urls, tss, texts, paths = buf
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "wet_path": pa.array(paths, pa.string()),
        })

    buf = ([], [], [], [])
    pending = 0
    yielded_any = False
    for raw, path in zip(batch.column("bytes").to_pylist(), path_col):
        errors: dict = {}
        for rec in iter_warc_records(_open_stream(raw), errors,
                                     record_types=("conversion",)):
            text = rec["html"].decode("utf-8", "replace")
            buf[0].append(rec["url"])
            buf[1].append(rec["warc_ts"])
            buf[2].append(text)
            buf[3].append(path)
            pending += len(text)
            if pending >= _CHUNK_BYTES or len(buf[0]) >= _CHUNK_RECORDS:
                yield flush(buf)
                yielded_any = True
                buf = ([], [], [], [])
                pending = 0
        if errors.get("bad_records") or errors.get("skipped_lines"):
            _log.warning(
                "read_wet: %s: skipped %d malformed record(s), "
                "%d desynced line(s)", path,
                errors["bad_records"], errors["skipped_lines"])
    if buf[0] or not yielded_any:
        yield flush(buf)


def read_wet(paths: str | list[str]) -> "ray.data.Dataset":
    """Read WET (extracted-text) archives — the ``.warc.wet.gz``
    companion files Common Crawl publishes, whose ``conversion``
    records carry plain text with no HTTP envelope — into a
    documents-shaped Dataset (url, warc_ts, text, n_chars, wet_path).
    Same one-task-per-archive streaming shape as ``read_warc``; feed
    the result straight into the webtext curation operators."""
    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(_wet_records_batch, batch_format="pyarrow",
                             batch_size=1)


# ---------------------------------------------------------------------------
# CDX indexing + random access.
#
# Common Crawl publishes a CDX index next to each snapshot: one row per
# record with the archive path, the byte offset and compressed length
# of the record's gzip member, so a consumer can fetch ONE page with a
# ranged read + a single-member gunzip instead of scanning a 1 GiB
# archive. The same layout powers selective re-extraction at 100-TB
# scale: filter the (small) index with ordinary Dataset ops, then fetch
# only the matching members, one task per archive.
# ---------------------------------------------------------------------------

_MEMBER_CHUNK = 1 << 20

# a single decompressed gzip member larger than this is not the CC
# per-record layout — switch to whole-file streaming entries rather
# than buffering the member (which could be the entire raw archive)
_MEMBER_MAX_BYTES = 64 << 20


class _MemberTooLarge(Exception):
    pass


def _iter_gzip_member_spans(raw: bytes) -> Iterator[tuple[int, int, bytes | None]]:
    """Walk the concatenated gzip members of ``raw``, yielding
    (offset, compressed_length, decompressed_bytes) per member.
    Feeds zlib in bounded chunks so total copying is O(file), not
    O(members x file). Raises ValueError on a truncated member,
    zlib.error on corrupt bytes, and _MemberTooLarge when the FIRST
    member decompresses past _MEMBER_MAX_BYTES (the whole-file-gzip
    layout signal). An oversized member LATER in the archive is
    stream-discarded to its end and yielded with data=None so the
    caller can count it without losing every member after it."""
    n = len(raw)
    mv = memoryview(raw)
    pos = 0
    while pos < n:
        start = pos
        d = zlib.decompressobj(wbits=31)   # single gzip member
        out: list | None = []
        size = 0
        while not d.eof:
            chunk = mv[pos:pos + _MEMBER_CHUNK]
            if len(chunk) == 0:
                raise ValueError(
                    f"truncated gzip member at offset {start}")
            piece = d.decompress(chunk)
            size += len(piece)
            if out is not None:
                out.append(piece)
                if size > _MEMBER_MAX_BYTES:
                    if start == 0:
                        raise _MemberTooLarge(str(start))
                    out = None             # discard mode: keep walking
            pos += len(chunk) - len(d.unused_data)
        yield start, pos - start, (b"".join(out)
                                   if out is not None else None)


def _cdx_entry(rec: dict, warc_path: str, offset: int, length: int,
               rec_seq: int, compressed: bool) -> dict:
    """THE index-row shape (single definition — every branch of the
    indexer builds rows through here so the schema cannot diverge)."""
    import hashlib
    return {
        "url": rec["url"], "warc_ts": rec["warc_ts"],
        "http_status": rec["http_status"],
        "content_type": rec["content_type"],
        "digest": hashlib.sha1(rec["html"]).hexdigest(),
        "warc_path": warc_path, "offset": offset, "length": length,
        "rec_seq": rec_seq, "compressed": compressed,
    }


def _resolve_fs(path: str):
    """pyarrow FileSystem + relative path, tolerating bare local
    paths that FileSystem.from_uri rejects."""
    from pyarrow import fs as pafs
    try:
        return pafs.FileSystem.from_uri(path)
    except (ValueError, pa.ArrowInvalid):
        return pafs.LocalFileSystem(), path


def _whole_file_entries(raw: bytes, warc_path: str,
                        errors: dict | None) -> Iterator[dict]:
    """Fallback CDX entries for an archive that is NOT per-record gzip
    members (whole-file gzip): every record addresses the full file
    (offset 0, length = file size) with a global ``rec_seq`` — a fetch
    decompresses the archive once and picks the seq'th record, which is
    the only random access such a layout permits. Streams via GzipFile;
    the raw archive is never held decompressed."""
    for seq, rec in enumerate(
            iter_warc_records(_open_stream(raw), errors)):
        yield _cdx_entry(rec, warc_path, 0, len(raw), seq, True)


def iter_cdx_entries(raw: bytes, warc_path: str,
                     errors: dict | None = None) -> Iterator[dict]:
    """Index a WARC archive: one dict per ``response`` record with the
    byte span needed to fetch it back without scanning the file —
    (url, warc_ts, http_status, content_type, digest, warc_path,
    offset, length, rec_seq, compressed).

    For ``.warc.gz`` in the Common Crawl layout (one gzip member per
    record), offset/length address the record's compressed member;
    ``rec_seq`` disambiguates the rare member holding several records.
    A whole-file-gzipped archive (one giant member) falls back to
    whole-file entries (offset 0, global rec_seq) WITHOUT buffering the
    raw archive; a truncated/corrupt member tail stops that archive's
    walk with ``errors['bad_members']`` counted instead of failing the
    task. For plain ``.warc``, offset/length address the record bytes
    directly. ``digest`` is the sha1 hex of the DECODED html payload
    (framing and content-encoding undone), so two index rows with equal
    digests hold identical page bytes."""
    err = errors if errors is not None else {}
    err.setdefault("bad_members", 0)
    if raw[:2] == b"\x1f\x8b":
        emitted = False
        try:
            for off, ln, data in _iter_gzip_member_spans(raw):
                if data is None:           # oversized member skipped
                    err["bad_members"] += 1
                    continue
                for seq, rec in enumerate(
                        iter_warc_records(io.BytesIO(data), errors)):
                    emitted = True
                    yield _cdx_entry(rec, warc_path, off, ln, seq,
                                     True)
        except _MemberTooLarge:
            # only raised for the FIRST member now (emitted is False):
            # whole-file gzip layout — stream it instead
            assert not emitted
            yield from _whole_file_entries(raw, warc_path, errors)
        except (ValueError, zlib.error):   # truncated/corrupt tail
            err["bad_members"] += 1
    else:
        for rec in iter_warc_records(io.BytesIO(raw), errors):
            yield _cdx_entry(rec, warc_path, rec["offset"],
                             rec["length"], 0, False)


_CDX_SCHEMA = {
    "url": pa.string(), "warc_ts": pa.timestamp("us", tz="UTC"),
    "http_status": pa.int32(), "content_type": pa.string(),
    "digest": pa.string(), "warc_path": pa.string(),
    "offset": pa.int64(), "length": pa.int64(),
    "rec_seq": pa.int32(),
}


def _read_raw_bytes(path: str) -> bytes:
    """Read a file's bytes WITHOUT codec auto-detection (pyarrow — and
    Ray's read_binary_files on top of it — transparently gunzips
    ``.gz`` paths, which would destroy the compressed member offsets
    the CDX index exists to record)."""
    fsys, rel = _resolve_fs(path)
    with fsys.open_input_stream(rel, compression=None) as f:
        return f.read()


def _cdx_batch(batch: pa.Table) -> Iterator[pa.Table]:
    """Generator UDF: index each archive, yielding bounded chunks.
    Index rows are tiny (~200 B), so chunks are record-count bound."""
    cols: dict[str, list] = {k: [] for k in _CDX_SCHEMA}
    yielded_any = False

    def flush():
        return pa.table({k: pa.array(v, _CDX_SCHEMA[k])
                         for k, v in cols.items()})

    paths = batch.column("path").to_pylist()
    for path in paths:
        raw = _read_raw_bytes(path)
        errors: dict = {}
        for e in iter_cdx_entries(raw, path, errors):
            for k in cols:
                cols[k].append(e[k])
            if len(cols["url"]) >= 65536:
                yield flush()
                yielded_any = True
                cols = {k: [] for k in _CDX_SCHEMA}
        if (errors.get("bad_records") or errors.get("skipped_lines")
                or errors.get("bad_members")):
            _log.warning(
                "cdx_index: %s: skipped %d malformed record(s), "
                "%d desynced line(s), %d bad gzip member(s)", path,
                errors.get("bad_records", 0),
                errors.get("skipped_lines", 0),
                errors.get("bad_members", 0))
    if cols["url"] or not yielded_any:
        yield flush()


def cdx_index(paths: str | list[str]) -> "ray.data.Dataset":
    """Build a CDX index Dataset over WARC archives: one row per
    response record with (url, warc_ts, http_status, content_type,
    digest, warc_path, offset, length, rec_seq). One archive = one
    task, same parallelism unit as ``read_warc``; the index is ~10^4x
    smaller than the archives, so downstream filters/joins over it are
    cheap Dataset ops. Archive bytes are opened inside each task with
    codec detection OFF (offsets must address the file as stored)."""
    import os
    if isinstance(paths, str):
        paths = [paths]
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            # archives only: skip subdirectories and marker/sidecar
            # files (e.g. warcgen's .complete)
            expanded.extend(
                fp for f in sorted(os.listdir(p))
                if os.path.isfile(fp := os.path.join(p, f))
                and f.endswith((".warc", ".warc.gz", ".gz")))
        else:
            expanded.append(p)
    if not expanded:
        return ray.data.from_arrow(pa.table(
            {k: pa.array([], t) for k, t in _CDX_SCHEMA.items()}))
    files = ray.data.from_items([{"path": p} for p in expanded],
                                override_num_blocks=len(expanded))
    return files.map_batches(_cdx_batch, batch_format="pyarrow",
                             batch_size=1)


def fetch_cdx_spans(warc_path: str,
                    spans: list[tuple[int, int, int]],
                    errors: dict | None = None) -> list[dict]:
    """Random-access fetch: read only the given (offset, length,
    rec_seq) spans from one archive — a ranged read + single-member
    gunzip per record, never a full-archive scan. Spans are read in
    offset order (one forward pass over the file regions). A span
    whose bytes no longer parse to ``rec_seq`` records (stale index
    after an archive rewrite) is counted in ``errors['missing_spans']``
    and logged — never silently dropped. Spans sharing one byte range
    (multi-record members; the whole-file fallback where EVERY span is
    the full archive) are grouped so each distinct range is read and
    parsed exactly once — k records from a whole-file archive cost one
    decompression, not k."""
    fsys, rel = _resolve_fs(warc_path)
    err = errors if errors is not None else {}
    err.setdefault("missing_spans", 0)
    wanted: dict[tuple[int, int], list[int]] = {}
    for off, ln, seq in spans:
        wanted.setdefault((off, ln), []).append(seq)
    out = []
    with fsys.open_input_file(rel) as f:
        for off, ln in sorted(wanted):
            f.seek(off)
            blob = f.read(ln)
            recs = list(iter_warc_records(_open_stream(blob), err))
            for seq in sorted(wanted[(off, ln)]):
                if seq < len(recs):
                    rec = dict(recs[seq])
                    rec["warc_path"] = warc_path
                    out.append(rec)
                else:
                    err["missing_spans"] += 1
    if err["missing_spans"]:
        _log.warning(
            "fetch_cdx_spans: %s: %d requested span(s) did not parse "
            "to their rec_seq (stale index?)", warc_path,
            err["missing_spans"])
    return out


def read_warc_selective(cdx: "ray.data.Dataset | pa.Table"
                        ) -> "ray.data.Dataset":
    """Fetch exactly the records named by a (filtered) CDX index as a
    page Dataset with the ``read_warc`` schema. Groups the index by
    archive so each task does one open + ranged reads — the selective
    path for re-extracting a slice of a 100-TB snapshot (the shuffle
    moves only tiny index rows, never page bytes)."""
    if isinstance(cdx, pa.Table):
        cdx = ray.data.from_arrow(cdx)

    def fetch_group(df):
        path = df["warc_path"].iloc[0]
        spans = list(zip(df["offset"].astype(int),
                         df["length"].astype(int),
                         df["rec_seq"].astype(int)))
        recs = fetch_cdx_spans(path, spans)
        # explicit Arrow table so warc_ts stays timestamp[us, tz=UTC]
        # — byte-identical to read_warc's schema (a pandas build would
        # widen it to ns and break unions/concats with read_warc)
        return pa.table({
            "url": pa.array([r["url"] for r in recs], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in recs],
                                pa.timestamp("us", tz="UTC")),
            "http_status": pa.array([r["http_status"] for r in recs],
                                    pa.int32()),
            "content_type": pa.array([r["content_type"] for r in recs],
                                     pa.string()),
            "html": pa.array([r["html"] for r in recs], pa.binary()),
            "warc_path": pa.array([r["warc_path"] for r in recs],
                                  pa.string()),
        })

    cols = ["warc_path", "offset", "length", "rec_seq"]
    return (cdx.select_columns(cols)
            .groupby("warc_path").map_groups(fetch_group))
