"""Deterministic WARC archive synthesis for the ingest bench: wrap an
existing page-corpus parquet (url, html) into ``.warc.gz`` archives in
the Common Crawl layout — one gzip MEMBER per record, concatenated —
so ``read_warc`` is exercised against the exact framing a CC snapshot
ships (ISO 28500 record heads + HTTP response payloads + per-record
gzip members). Cached like ``docgen.gen_docs_corpus``: archives are
written once per (corpus, n_archives) and reused across bench runs.
"""

from __future__ import annotations

import glob
import gzip
import os

import pyarrow.parquet as pq

_DATE = "2024-01-01T00:00:00Z"


def _warc_record(url: str, html: bytes) -> bytes:
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b"Content-Length: " + str(len(html)).encode()
               + b"\r\n\r\n" + html)
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {_DATE}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


def wet_record(url: str, text: str) -> bytes:
    """One WET ``conversion`` record (plain-text payload, no HTTP
    envelope) in the Common Crawl companion-file layout."""
    payload = text.encode("utf-8")
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {_DATE}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


def _write_archive(args) -> None:
    files, shard, n_archives, out_path = args
    # each worker re-reads only its rows: archive k takes row i where
    # i % n_archives == k, per input file — deterministic, no IPC of
    # page bodies through the pool
    with open(out_path + ".tmp", "wb") as f:
        for path in files:
            t = pq.read_table(path, columns=["url", "html"])
            urls = t.column("url").to_pylist()
            htmls = t.column("html").to_pylist()
            for i in range(shard, len(urls), n_archives):
                f.write(gzip.compress(
                    _warc_record(urls[i], htmls[i]), compresslevel=1))
    os.replace(out_path + ".tmp", out_path)


def gen_warc_archives(pages_path: str, root: str,
                      n_archives: int = 16) -> list[str]:
    """Write (or reuse) ``n_archives`` .warc.gz files under
    ``{root}/warc{n_archives}/`` wrapping every page of the corpus at
    ``pages_path`` (a parquet file or directory with url/html
    columns). Returns the sorted archive paths."""
    out_dir = os.path.join(root, f"warc{n_archives}")
    done = os.path.join(out_dir, ".complete")
    paths = [os.path.join(out_dir, f"part-{k:04d}.warc.gz")
             for k in range(n_archives)]
    if os.path.exists(done):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(pages_path, "*.parquet"))
                   if os.path.isdir(pages_path) else [pages_path])
    from concurrent.futures import ThreadPoolExecutor

    args = [(files, k, n_archives, paths[k]) for k in range(n_archives)]
    # threads, not fork: the caller (bench.py) has Ray gRPC + pyarrow
    # threadpools live, and forking a thread-holding process can
    # deadlock the child; the work is gzip + parquet reads (both
    # release the GIL), so threads parallelize it safely
    with ThreadPoolExecutor(max_workers=min(8, n_archives)) as pool:
        list(pool.map(_write_archive, args))
    with open(done, "w") as f:
        f.write(str(n_archives))
    return paths
