"""Arrow schemas for the engine's logical tables (SURVEY.md section 1.3).

The ``pages`` shape is authoritative per BASELINE.json ``input_hint``:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# Frontier rows (≙ Scrapy Request + meta; SURVEY.md 1.3). ``meta`` is a JSON
# blob column — schema-stable across the free-form nested metadata the
# reference rides on Request.meta.
FRONTIER = pa.schema([
    ("url", pa.string()),
    ("canon_url", pa.string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("priority", pa.int32()),
    ("depth", pa.int32()),
    ("source_kind", pa.string()),  # sitemap|rss|atom|csv|specified|link|trawl|seed
    ("meta", pa.string()),
])

# Seen/fetch ledger (≙ RefetchControl sqlite records table,
# refetchcontrol.py:112-115).
SEEN = pa.schema([
    ("key", pa.binary()),
    ("url", pa.string()),
    ("fetches", pa.int32()),
    ("time", pa.timestamp("us", tz="UTC")),
])

# Extracted NewsItem (items.py:12-40 + pipeline fields). Timestamps are
# ISO-8601 strings, matching the reference's JSONLines export
# (loaders.py:78-82).
EXTRACTED = pa.schema([
    ("url", pa.string()),
    ("originalurl", pa.string()),
    ("source", pa.string()),
    ("section", pa.string()),
    ("headline", pa.string()),
    ("summary", pa.string()),
    ("bodytext", pa.string()),
    ("fetchtime", pa.string()),
    ("modtime", pa.string()),
    ("firstpubtime", pa.string()),
    ("bylines", pa.list_(pa.string())),
    ("keywords", pa.list_(pa.string())),
    ("language", pa.string()),
    ("articleid", pa.string()),
    ("rawpagegzipb64", pa.string()),
    ("previousfetches", pa.int32()),
    ("notes", pa.list_(pa.string())),
])

# Enrichment adds (pipelines/*.py): wordcount, sentiment, subjectivity,
# namedpeople, fleschreadingease, kincaidgradelevel.
ENRICHED = pa.schema(
    list(EXTRACTED)
    + [
        ("wordcount", pa.int32()),
        ("sentiment", pa.float64()),
        ("subjectivity", pa.float64()),
        ("namedpeople", pa.list_(pa.string())),
        ("fleschreadingease", pa.float64()),
        ("kincaidgradelevel", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
