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
