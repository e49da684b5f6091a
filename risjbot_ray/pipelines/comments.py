"""Article ⋈ comments join (SURVEY.md 2.5 J5).

The reference's liverpoolecho spider pages a viafoura comment API per
article and attaches raw + flattened comment bodies
(uk/liverpoolecho.py:102-190). Offline analogue: a ``comments`` table
keyed by articleid joined onto extracted articles.

Two plans behind one count gate, the ``_collect_pairs`` pattern:

- BROADCAST (the reference's in-practice case — one site's comments):
  the comments table is ``ray.put`` once and probed per batch; no
  shuffle.
- BUCKETED (large-large): comments pre-aggregate per articleid inside
  a ``groupby`` (bodies packed into one JSON-array string — Ray's hash
  join rejects list payload columns, and JSON round-trips ANY body
  content including embedded separators and NULLs exactly), then ONE
  distributed left-outer hash join on articleid, the same layout as
  the fetch join. Only the per-article aggregate rides the join,
  never the raw comment rows.

Both paths order each article's bodies by (comment_id) so the output
is plan-independent and SQL-checkable (string_agg ORDER BY
comment_id)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

COMMENTS_SCHEMA = pa.schema([
    ("articleid", pa.string()),
    ("comment_id", pa.int64()),
    ("author", pa.string()),
    ("body", pa.string()),
])

#: comments-table rows at or under which the broadcast plan runs; a
#: body is ~100s of bytes, so the cap keeps the ray.put value ~O(100MB)
_COMMENTS_BCAST_MAX = 200_000

def _attach_from_lookup(extracted_ds, lookup_ref):
    def attach(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        ids = (batch.column("articleid").to_pylist()
               if "articleid" in batch.column_names
               else [None] * batch.num_rows)
        # '' is a real key (matched by the bucketed hash join too);
        # only NULL articleids skip the lookup — Arrow joins never
        # match null keys, and both plans must agree row for row
        raw = [lk.get(a) if a is not None else None for a in ids]
        n = [len(r) if r else 0 for r in raw]
        for name in ("rawcomments", "n_comments"):
            if name in batch.column_names:
                batch = batch.drop_columns([name])
        batch = batch.append_column(
            "rawcomments", pa.array(raw, pa.list_(pa.string())))
        return batch.append_column("n_comments", pa.array(n, pa.int32()))

    return extracted_ds.map_batches(attach, batch_format="pyarrow")


def join_comments(extracted_ds, comments, num_partitions: int | None = None,
                  bcast_max: int | None = None):
    """Attach rawcomments (list of bodies ordered by comment_id, ≙
    item['rawcomments']) and n_comments per article; articles without
    an articleid or without comments pass through with null/0.

    ``comments`` may be an Arrow Table or a Dataset; the row count
    picks the plan (broadcast at or under ``bcast_max``, default
    ``_COMMENTS_BCAST_MAX``; pass 0 to force the bucketed plan) —
    the count gates BEFORE any comment row reaches the driver."""
    if bcast_max is None:
        bcast_max = _COMMENTS_BCAST_MAX
    if isinstance(comments, pa.Table):
        n = comments.num_rows
        cds = None
    else:
        cds = comments
        n = cds.count()

    if n <= bcast_max:
        tbl = comments if cds is None else pa.concat_tables(
            [t for t in ray.get(cds.to_arrow_refs()) if t.num_rows]
        ) if n else COMMENTS_SCHEMA.empty_table()
        import pyarrow.compute as pc
        if tbl.num_rows:
            tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[
                ("articleid", "ascending"), ("comment_id", "ascending")]))
        lookup: dict[str, list[str]] = {}
        for row in tbl.to_pylist():
            lookup.setdefault(row["articleid"], []).append(row["body"])
        return _attach_from_lookup(extracted_ds, ray.put(lookup))

    # BUCKETED plan: per-article aggregate first (comments for one
    # article can span blocks, so this is a real groupby — but the
    # exchange carries comment rows exactly once and the join side
    # shrinks to one row per commented article), then one distributed
    # left-outer hash join on articleid.
    if cds is None:
        cds = ray.data.from_arrow(comments)
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, cpus // 2))

    def pack(df):
        import json

        import pandas as pd
        df = df.sort_values(["articleid", "comment_id"],
                            kind="mergesort")
        # JSON array, not a join on a separator char: bodies may
        # contain ANY byte sequence (or be NULL) and both plans must
        # emit identical lists — the broadcast plan preserves bodies
        # verbatim, so the packed form must round-trip exactly too
        g = df.groupby("articleid", sort=False)["body"].agg(
            lambda s: json.dumps([None if pd.isna(x) else x
                                  for x in s]))
        nn = df.groupby("articleid", sort=False)["body"].size()
        return pd.DataFrame({"articleid": g.index,
                             "packed": g.to_numpy(),
                             "n_comments": nn.to_numpy()})

    packed_schema = pa.schema([("articleid", pa.string()),
                               ("packed", pa.string()),
                               ("n_comments", pa.int64())])

    def _norm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "articleid" not in b.column_names:
            return packed_schema.empty_table()
        return b.select(["articleid", "packed",
                         "n_comments"]).cast(packed_schema)

    agg = (cds.groupby("articleid").map_groups(pack,
                                               batch_format="pandas")
           .map_batches(_norm, batch_format="pyarrow"))

    j = extracted_ds.join(agg, join_type="left_outer",
                          on=("articleid",),
                          num_partitions=num_partitions)

    def unpack(batch: pa.Table) -> pa.Table:
        import json
        packed = batch.column("packed").to_pylist()
        nc = batch.column("n_comments").to_pylist()
        raw = [json.loads(p) if p is not None else None
               for p in packed]
        n = [int(x) if x is not None else 0 for x in nc]
        batch = batch.drop_columns(["packed", "n_comments"])
        if "rawcomments" in batch.column_names:
            batch = batch.drop_columns(["rawcomments"])
        batch = batch.append_column(
            "rawcomments", pa.array(raw, pa.list_(pa.string())))
        return batch.append_column("n_comments",
                                   pa.array(n, pa.int32()))

    return j.map_batches(unpack, batch_format="pyarrow")
