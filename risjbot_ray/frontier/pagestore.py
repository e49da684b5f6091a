"""PageStore: the offline "web" — hash-bucketed pages for the fetch join.

The reference fetches over the network; the offline analogue is a hash
join ``frontier ⋈ pages ON url`` (SURVEY.md 2.5 J4). Joining a bounded
scheduled wave against a 100 TB pages table must NOT scan the pages table
per wave, so the store is laid out once as hash-bucketed Parquet
(``bucket = url_hash64(url) % B``); each wave then reads only the buckets
its URLs fall in, with a row-level ``url IN (...)`` filter pushed into the
Parquet read. This is the partitioned-hash-join pattern from the Ray Data
join guidance, with the partitioning key reused across all stages
(url_hash drives seen-shards, fetch buckets, and output layout).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.urlnorm import url_hash64


def _hash_column(urls: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return np.fromiter((url_hash64(u) for u in urls.to_pylist()),
                       dtype=np.uint64, count=len(urls))


def _finalize_bucket(merged: pa.Table) -> pa.Table:
    """Shared finalize kernel for one bucket (both build paths):

    - sort by url (+warc_ts) + small row groups so the per-wave
      ``url IN (...)`` filter prunes whole row groups via min/max
      statistics instead of decoding every html column in the bucket;
    - ONE row per url (latest warc_ts wins): duplicate snapshots of a
      page — normal in WARC-derived corpora — would fan out the inner
      fetch join and silently duplicate extracted output."""
    keys = [("url", "ascending")]
    if "warc_ts" in merged.column_names:
        keys.append(("warc_ts", "ascending"))
    merged = merged.take(pc.sort_indices(merged, sort_keys=keys))
    if merged.num_rows:
        u = np.asarray(merged.column("url").to_pylist(), dtype=object)
        keep = np.ones(len(u), bool)
        keep[:-1] = u[:-1] != u[1:]
        if not keep.all():
            merged = merged.filter(pa.array(keep))
    return merged


def _write_bucket(merged: pa.Table, store_dir: str, bucket: int) -> None:
    """Finalize + publish one bucket file (atomic tmp→rename so a crashed
    build never leaves a half-written file that a later read trusts)."""
    merged = _finalize_bucket(merged)
    path = os.path.join(store_dir, f"bucket-{bucket:05d}.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(merged, tmp, row_group_size=512)
    os.replace(tmp, path)


# below this input size the Ray job's fixed scheduling cost exceeds the
# layout work itself; tiny (test-scale) corpora build driver-side
_DISTRIBUTED_MIN_BYTES = 64 << 20


def build_page_store(pages_path: str | list[str], store_dir: str,
                     num_buckets: int = 32,
                     columns: list[str] | None = None,
                     distributed: bool | None = None) -> "PageStore":
    """One-time layout: read pages parquet, write one file per url-hash
    bucket.

    The layout is itself a Ray Data job (``read_parquet → add bucket
    column → groupby(bucket).map_groups(finalize+write)``): at corpus
    scale the one-time layout IS a job, so hashing/sorting/writing runs
    distributed, one task per bucket, with the driver touching only the
    per-bucket row counts. ``store_dir`` must be storage every worker can
    reach (true single-node; a shared filesystem or object store on a
    real cluster). ``distributed=None`` picks the Ray path automatically
    when Ray is up and the input is big enough to amortize the job.

    Idempotent: an existing complete layout (DONE marker) is reused, so
    repeated runs over the same corpus skip the rebuild and its page-cache
    write-back does not bleed into the timed pipeline. A rebuild after a
    crashed (marker-less) build first clears stale bucket files."""
    done = os.path.join(store_dir, f"DONE-{num_buckets}")
    if os.path.exists(done):
        return PageStore(store_dir, num_buckets)
    os.makedirs(store_dir, exist_ok=True)
    # clear stale bucket files AND stale DONE markers from builds with a
    # different num_buckets — a surviving DONE-{M} would short-circuit a
    # later M-bucket build onto this layout's files, silently misrouting
    # every url_hash % M lookup
    for name in os.listdir(store_dir):
        if name.startswith("bucket-") or name.startswith("DONE-"):
            os.remove(os.path.join(store_dir, name))
    dataset = pads.dataset(pages_path, format="parquet")
    if distributed is None:
        import ray
        fs = dataset.filesystem
        total = sum(fs.get_file_info(frag.path).size
                    for frag in dataset.get_fragments())
        distributed = (ray.is_initialized()
                       and total >= _DISTRIBUTED_MIN_BYTES)
    if distributed:
        _build_distributed(pages_path, store_dir, num_buckets, columns)
    else:
        _build_local(dataset, store_dir, num_buckets, columns)
    if hasattr(os, "sync"):
        os.sync()
    with open(done, "w") as f:
        f.write("ok")
    return PageStore(store_dir, num_buckets)


def _build_local(dataset, store_dir: str, num_buckets: int,
                 columns: list[str] | None) -> None:
    """Driver-side fallback for tiny corpora / Ray-less contexts."""
    pending: dict[int, list[pa.Table]] = {}
    for batch in dataset.to_batches(columns=columns):
        table = pa.Table.from_batches([batch])
        if table.num_rows == 0:
            continue
        buckets = _hash_column(table.column("url")) % num_buckets
        for b in np.unique(buckets):
            pending.setdefault(int(b), []).append(
                table.filter(pa.array(buckets == b)))
    for b, parts in pending.items():
        _write_bucket(pa.concat_tables(parts, promote_options="default"),
                      store_dir, b)


def _build_distributed(pages_path: str | list[str], store_dir: str,
                       num_buckets: int,
                       columns: list[str] | None) -> None:
    """Ray Data layout job: one all-to-all exchange keyed by the SAME
    url-hash that drives seen-shards and the per-wave fetch join, then one
    finalize+write task per bucket."""
    import ray

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_ps_bucket",
                                       pa.array([], pa.int64()))
        b = (_hash_column(batch.column("url")) % num_buckets)
        return batch.append_column("_ps_bucket",
                                   pa.array(b.astype(np.int64)))

    def write_group(group: pa.Table) -> pa.Table:
        bucket = int(group.column("_ps_bucket")[0].as_py())
        _write_bucket(group.drop_columns(["_ps_bucket"]), store_dir, bucket)
        return pa.table({"bucket": pa.array([bucket], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    ds = ray.data.read_parquet(pages_path, columns=columns)
    counts = (ds.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("_ps_bucket")
                .map_groups(write_group, batch_format="pyarrow"))
    # materialize only the per-bucket count rows (≤ num_buckets of them)
    counts.take_all()


class PageStore:
    def __init__(self, store_dir: str, num_buckets: int):
        self.store_dir = store_dir
        self.num_buckets = num_buckets

    def bucket_path(self, bucket: int) -> str:
        return os.path.join(self.store_dir, f"bucket-{bucket:05d}.parquet")

    def bucket_of(self, url_hashes: np.ndarray) -> np.ndarray:
        return (url_hashes % np.uint64(self.num_buckets)).astype(np.int64)

    def fetch_bucket(self, bucket: int, urls: list[str],
                     columns: list[str] = ("url", "warc_ts", "html")
                     ) -> pa.Table:
        """Read one bucket with a pushed-down ``url IN urls`` filter."""
        path = self.bucket_path(bucket)
        if not os.path.exists(path) or not urls:
            return None
        return pq.read_table(
            path, columns=list(columns),
            filters=pc.field("url").isin(urls))

    def fetch_group(self, frontier_group: pa.Table,
                    columns: list[str] = ("url", "warc_ts", "html")
                    ) -> pa.Table:
        """Join one bucket-aligned frontier group against its bucket file.
        Shaped for ``groupby('fetch_bucket').map_groups`` — the Ray-native
        realization of the wave's fetch join. Joins on ``canon_url`` (the
        stored page URL is the canonical one). Unmatched frontier rows are
        fetch failures and produce nothing (they were never committed to
        the ledger, so they age out exactly like the reference's failed
        fetches, refetchcontrol.py:54-57)."""
        if frontier_group.num_rows == 0:
            return None
        bucket = int(frontier_group.column("fetch_bucket")[0].as_py())
        urls = frontier_group.column("canon_url").to_pylist()
        pages = self.fetch_bucket(bucket, urls, columns=columns)
        if pages is None or pages.num_rows == 0:
            return None
        pages = pages.rename_columns(
            ["canon_url" if c == "url" else c for c in pages.column_names])
        return frontier_group.join(pages, keys=["canon_url"],
                                   join_type="inner")
