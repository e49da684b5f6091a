"""Snapshot-to-corpus dump loop — the composed end-to-end workflow a
Common-Crawl-style training-data operation runs per dump (Penedo et
al. 2024, FineWeb §3: ingest each snapshot, extract, dedup against
everything previously kept, keep the survivors):

    .warc.gz archives -> read_warc (streaming per-member parse)
      -> extract_batch (the reference-parity article extractor)
      -> documents-shaped table (doc_id = url fingerprint, text =
         bodytext, source = host)
      -> minhash_dedup_incremental vs the persisted band ledger
         (cross-dump fuzzy dedup + within-dump clustering)
      -> curated parquet under out_dir/dump=<tag>/

Every stage reuses the operator it names — this module only composes
and carries the per-dump manifest. One dump ingests ONCE per ledger:
the ledger remembers its kept docs, so re-processing the same dump
against the same ledger marks everything prior_dup by design (crash
recovery mid-dump is the pending->commit protocol inside the
incremental dedup; replaying a COMMITTED dump needs a ledger
snapshot, exactly like re-running a committed crawl wave needs its
checkpoint)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray


def _docs_shape(batch: pa.Table) -> pa.Table:
    """Extracted articles -> the documents-table shape the webtext
    operators consume. doc_id is the low 63 bits of the sha1 URL
    fingerprint (the crawl's key convention — stable across dumps and
    cluster sizes); rows without bodytext drop here (CheckContent
    already counted them)."""
    import pyarrow.compute as pc

    from risjbot_ray.functions.urlnorm import url_fingerprint

    mask = pc.and_(
        pc.is_valid(batch.column("bodytext")),
        pc.not_equal(pc.fill_null(batch.column("bodytext"), ""), ""))
    b = batch.filter(mask)
    urls = b.column("url").to_pylist()
    ids = np.empty(len(urls), np.int64)
    hosts = []
    for i, u in enumerate(urls):
        fp = url_fingerprint(u or "")
        ids[i] = int.from_bytes(fp[:8], "big") >> 1
        hosts.append((u or "").split("/", 3)[2] if "//" in (u or "")
                     else "")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "url": b.column("url"),
        "source": pa.array(hosts, pa.string()),
        "lang": pa.array(
            [x or "" for x in b.column("language").to_pylist()],
            pa.string()),
        "text": b.column("bodytext").cast(pa.string()),
    })


def process_dump(warc_paths: list[str] | str, ledger_dir: str,
                 out_dir: str, dump_tag: str,
                 threshold: float = 0.7) -> dict:
    """Run one dump through the full loop and write the curated
    corpus to ``{out_dir}/dump={dump_tag}/``. Returns the manifest
    dict (n_pages, n_docs, n_kept, n_prior_dup, n_shard_dup,
    out_path). ``ledger_dir`` must live on shared storage (the
    incremental dedup's contract); ``out_dir`` writes are atomic at
    the parquet-part level via the ray parquet sink."""
    import pyarrow.parquet as pq

    from risjbot_ray.extract.stage import extract_batch
    from risjbot_ray.pipelines.dedup import minhash_dedup_incremental
    from risjbot_ray.sources.warc import read_warc

    pages = read_warc(warc_paths)
    n_pages = pages.count()
    docs = (pages.map_batches(extract_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
            .map_batches(_docs_shape, batch_format="pyarrow",
                         zero_copy_batch=True))

    # the incremental dedup consumes a shard DIRECTORY (its public
    # contract — shards arrive as parquet); spill the shaped docs once
    shard_dir = os.path.join(out_dir, f"shard={dump_tag}")
    os.makedirs(shard_dir, exist_ok=True)
    docs.write_parquet(os.path.join(shard_dir, "documents.parquet"))

    verdict = minhash_dedup_incremental(shard_dir, ledger_dir,
                                        threshold=threshold)
    kept_ids = np.sort(np.asarray(
        [r["doc_id"] for r in verdict.to_pylist() if r["kept"]],
        dtype=np.int64))
    kref = ray.put(kept_ids)

    def keep_only(b: pa.Table) -> pa.Table:
        ka = ray.get(kref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ka, ids)
        pos = np.minimum(pos, max(len(ka) - 1, 0))
        return b.filter(pa.array(
            (len(ka) > 0) & (ka[pos] == ids)))

    final_dir = os.path.join(out_dir, f"dump={dump_tag}")
    (ray.data.read_parquet(os.path.join(shard_dir,
                                        "documents.parquet"))
     .map_batches(keep_only, batch_format="pyarrow",
                  zero_copy_batch=True)
     .write_parquet(final_dir))

    reasons = [r["reason"] for r in verdict.to_pylist()]
    return {
        "n_pages": int(n_pages),
        "n_docs": len(reasons),
        "n_kept": sum(1 for r in reasons if r == "kept"),
        "n_prior_dup": sum(1 for r in reasons if r == "prior_dup"),
        "n_shard_dup": sum(1 for r in reasons if r == "shard_dup"),
        "out_path": final_dir,
    }
