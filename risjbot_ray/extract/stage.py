"""Batch-level extraction stage: pages -> extracted NewsItems.

This is the single stateless ``map_batches`` stage of SURVEY.md 2.3 M8/M10:
Arrow batch in (zero-copy ``html`` binary column), Arrow batch out
(EXTRACTED schema). The per-document unit of work is the HTML parse — the
batch loop is over documents, with all string kernels vectorized inside the
per-field processors.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa

from .. import schemas
from .page import ExtractStats, extract_page

# Column order for the output table — EXTRACTED then enrichment slots are
# appended by later stages.
_STR_FIELDS = ("url", "originalurl", "source", "section", "headline",
               "summary", "bodytext", "fetchtime", "modtime", "firstpubtime",
               "language", "articleid")
_LIST_FIELDS = ("bylines", "keywords", "notes")


def _ts_to_datetime(v) -> datetime:
    if isinstance(v, datetime):
        return v if v.tzinfo else v.replace(tzinfo=timezone.utc)
    # pyarrow timestamp scalars arrive as datetime already via as_py()
    return datetime.fromtimestamp(0, tz=timezone.utc)


def extract_batch(batch: pa.Table, *, include_rawpage: bool = False,
                  stats: ExtractStats | None = None,
                  passthrough: tuple[str, ...] = ()) -> pa.Table:
    """Extract every page row in the batch.

    Input columns: url, warc_ts, html (binary); optional ``meta`` (JSON
    string from the frontier join). Dropped pages (fake 404) produce no
    output row. ``include_rawpage=False`` is the StripRawPage default
    (pipelines/striprawpage.py:26-31, settings.py:228). ``passthrough``
    columns are copied verbatim onto each emitted row (the crawl pipeline
    uses this to carry the ledger key to the commit stage — ≙ Scrapy's
    ``meta['refetchcontrol_key']`` ride-along, refetchcontrol.py:240).
    """
    stats = stats if stats is not None else ExtractStats()
    n = batch.num_rows
    urls = batch.column("url").to_pylist()
    tss = batch.column("warc_ts").to_pylist()
    htmls = batch.column("html").to_pylist()
    metas = (batch.column("meta").to_pylist()
             if "meta" in batch.column_names else [None] * n)

    cols: dict[str, list] = {f: [] for f in _STR_FIELDS}
    for f in _LIST_FIELDS:
        cols[f] = []
    cols["previousfetches"] = []
    cols["rawpagegzipb64"] = []
    emitted_idx: list[int] = []

    for i in range(n):
        meta = json.loads(metas[i]) if metas[i] else {}
        item = extract_page(urls[i], htmls[i] or b"",
                            _ts_to_datetime(tss[i]), meta, stats=stats,
                            include_rawpage=include_rawpage)
        if item is None:
            continue
        emitted_idx.append(i)
        for f in _STR_FIELDS:
            v = item.get(f)
            cols[f].append(v if isinstance(v, str) else None)
        for f in _LIST_FIELDS:
            v = item.get(f)
            cols[f].append(v if isinstance(v, list) else None)
        pf = item.get("previousfetches")
        cols["previousfetches"].append(int(pf) if pf is not None else None)
        cols["rawpagegzipb64"].append(
            item.get("rawpagegzipb64") if include_rawpage else None)

    arrays = []
    fields = []
    for field in schemas.EXTRACTED:
        name = field.name
        if name == "rawpagegzipb64" and not include_rawpage:
            # column stays in the schema but all-null → negligible bytes
            arrays.append(pa.nulls(len(cols["url"]), field.type))
        else:
            arrays.append(pa.array(cols[name], type=field.type))
        fields.append(field)
    out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    if passthrough:
        take = pa.array(emitted_idx, type=pa.int64())
        for name in passthrough:
            col = batch.column(name).take(take)
            out = out.append_column(
                pa.field(name, col.type), col)
    return out
