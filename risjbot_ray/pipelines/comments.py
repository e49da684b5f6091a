"""Article ⋈ comments join (SURVEY.md 2.5 J5).

The reference's liverpoolecho spider pages a viafoura comment API per
article and attaches raw + flattened comment bodies
(uk/liverpoolecho.py:102-190). Offline analogue: a ``comments`` table
keyed by articleid joined onto extracted articles.

Small side (one site's comments) -> broadcast hash join: the comments
table is ``ray.put`` once and probed per batch; no shuffle. A
large-large variant would bucket both sides by hash(articleid) like the
fetch join.
"""

from __future__ import annotations

import pyarrow as pa
import ray

COMMENTS_SCHEMA = pa.schema([
    ("articleid", pa.string()),
    ("comment_id", pa.int64()),
    ("author", pa.string()),
    ("body", pa.string()),
])


def join_comments(extracted_ds, comments: pa.Table):
    """Attach rawcomments (list of bodies, ≙ item['rawcomments']) and
    n_comments per article; articles without an articleid or without
    comments pass through with nulls."""
    lookup: dict[str, list[str]] = {}
    for row in comments.to_pylist():
        lookup.setdefault(row["articleid"], []).append(row["body"])
    lookup_ref = ray.put(lookup)

    def attach(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        ids = (batch.column("articleid").to_pylist()
               if "articleid" in batch.column_names
               else [None] * batch.num_rows)
        raw = [lk.get(a) if a else None for a in ids]
        n = [len(r) if r else 0 for r in raw]
        for name in ("rawcomments", "n_comments"):
            if name in batch.column_names:
                batch = batch.drop_columns([name])
        batch = batch.append_column(
            "rawcomments", pa.array(raw, pa.list_(pa.string())))
        return batch.append_column("n_comments", pa.array(n, pa.int32()))

    return extracted_ds.map_batches(attach, batch_format="pyarrow")
