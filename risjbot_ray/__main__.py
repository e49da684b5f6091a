"""CLI entry point — the ``ray job submit`` surface (north_star).

Examples::

    # full crawl over a pages corpus
    ray job submit -- python -m risjbot_ray crawl \
        --pages /data/pages --store /data/store \
        --seeds seeds.json --out /data/out --checkpoint /data/ckpt

    # resume after interruption
    ray job submit -- python -m risjbot_ray crawl ... --resume

    # extraction only (no frontier)
    ray job submit -- python -m risjbot_ray extract \
        --pages /data/pages --out /data/extracted

The script owns its Ray session (guarded init; `RAY_ADDRESS` / local).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    return ray


def cmd_crawl(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.crawl import CrawlConfig, CrawlPipeline

        seeds = []
        robots = {}
        eq = None
        if args.seeds:
            with open(args.seeds) as f:
                sj = json.load(f)
            seeds = sj.get("seeds", sj if isinstance(sj, list) else [])
            robots = sj.get("robots", {}) if isinstance(sj, dict) else {}
            if isinstance(sj, dict):
                eq = sj.get("equivalent_domains")
        cfg = CrawlConfig(
            out_dir=args.out, checkpoint_dir=args.checkpoint,
            per_host_budget=args.budget,
            num_seen_shards=args.seen_shards,
            num_fetch_buckets=args.fetch_buckets,
            refetchfromdb=args.trawl,
            equivalent_domains=eq,
            max_waves=args.max_waves)
        pipe = CrawlPipeline(cfg, args.pages, args.store,
                             robots_bodies=robots)
        try:
            res = pipe.run(seeds=seeds, resume=args.resume)
        finally:
            pipe.shutdown()
        print(json.dumps(res))
        return 0
    finally:
        ray.shutdown()


def cmd_extract(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .extract.stage import extract_batch

        ds = ray.data.read_parquet(args.pages)
        ds.map_batches(extract_batch, batch_format="pyarrow",
                       zero_copy_batch=True).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_ingest_warc(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .sources.warc import read_warc

        read_warc(args.warc).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_write_warc(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        import ray as _r

        from .sinks import write_warc

        manifest = write_warc(
            _r.data.read_parquet(args.pages), args.out,
            records_per_archive=args.records_per_archive)
        print(json.dumps({
            "out": args.out,
            "n_archives": manifest.num_rows,
            "n_records": sum(manifest.column("n_records").to_pylist()),
            "n_bytes": sum(manifest.column("n_bytes").to_pylist())}))
        return 0
    finally:
        ray.shutdown()


def cmd_process_dump(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.dumps import process_dump

        m = process_dump(args.warc, args.ledger, args.out, args.tag,
                         threshold=args.threshold)
        print(json.dumps(m))
        return 0
    finally:
        ray.shutdown()


def cmd_dedup_incr(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        import pyarrow.parquet as pq

        from .pipelines.dedup import minhash_dedup_incremental

        res = minhash_dedup_incremental(
            args.shard, args.ledger, threshold=args.threshold)
        pq.write_table(res, args.out)
        kept = sum(1 for k in res.column("kept").to_pylist() if k)
        print(json.dumps({"out": args.out, "n_docs": res.num_rows,
                          "n_kept": kept}))
        return 0
    finally:
        ray.shutdown()


def cmd_ingest_wet(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .sources.warc import read_wet

        read_wet(args.wet).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_cdx(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .sources.warc import cdx_index

        cdx_index(args.warc if len(args.warc) > 1
                  else args.warc[0]).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_curate(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.webtext import curate_corpus

        (curate_corpus(args.docs, checkpoint_dir=args.checkpoint)
         .write_parquet(args.out))
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_media_features(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.multimodal import media_features_ds

        (media_features_ds(path=args.media, batch_size=args.batch_size,
                           concurrency=(1, args.concurrency))
         .write_parquet(args.out))
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_media_neardup(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.multimodal import media_phash_pairs

        (media_phash_pairs(path=args.media, modality=args.modality,
                           max_hamming=args.max_hamming,
                           batch_size=args.batch_size)
         .write_parquet(args.out))
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_perplexity(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.lm import perplexity_score

        perplexity_score(args.docs,
                         ref_mod=args.ref_mod).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_dsir(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.lm import dsir_score

        dsir_score(args.docs, ref_mod=args.ref_mod,
                   n_buckets=args.buckets or None).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0
    finally:
        ray.shutdown()


def cmd_bpe(args: argparse.Namespace) -> int:
    ray = _ray_init()
    try:
        from .pipelines.bpe import bpe_tokencount, train_bpe, vocab_table
        import os
        import pyarrow.parquet as pq

        os.makedirs(args.out, exist_ok=True)
        merges = train_bpe(args.docs, n_merges=args.merges,
                           min_count=args.min_count,
                           max_words=args.max_words)
        pq.write_table(vocab_table(merges), f"{args.out}/vocab.parquet")
        bpe_tokencount(args.docs, merges=merges).write_parquet(
            f"{args.out}/token_counts")
        print(json.dumps({"out": args.out, "n_merges": len(merges)}))
        return 0
    finally:
        ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="risjbot_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="frontier crawl over a pages corpus")
    c.add_argument("--pages", required=True)
    c.add_argument("--store", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--checkpoint", required=True)
    c.add_argument("--seeds", help="JSON: {seeds: [...], robots: {...}}")
    c.add_argument("--budget", type=int, default=100_000)
    c.add_argument("--seen-shards", type=int, default=8)
    c.add_argument("--fetch-buckets", type=int, default=64)
    c.add_argument("--max-waves", type=int, default=25)
    c.add_argument("--trawl", action="store_true")
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("extract", help="extraction only")
    e.add_argument("--pages", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_extract)

    w = sub.add_parser("ingest-warc",
                       help="WARC/.warc.gz archives -> pages parquet")
    w.add_argument("--warc", required=True, nargs="+",
                   help="archive files or directories")
    w.add_argument("--out", required=True)
    w.set_defaults(fn=cmd_ingest_warc)

    we = sub.add_parser("ingest-wet",
                        help="WET extracted-text archives -> "
                             "documents parquet")
    we.add_argument("--wet", required=True, nargs="+",
                    help="WET files or directories")
    we.add_argument("--out", required=True)
    we.set_defaults(fn=cmd_ingest_wet)

    x = sub.add_parser("cdx-index",
                       help="WARC archives -> CDX index parquet "
                            "(url, digest, offset, length per record)")
    x.add_argument("--warc", required=True, nargs="+",
                   help="archive files or directories")
    x.add_argument("--out", required=True)
    x.set_defaults(fn=cmd_cdx)

    u = sub.add_parser(
        "curate", help="documents table -> curated training corpus")
    u.add_argument("--docs", required=True,
                   help="sf_dir containing documents.parquet")
    u.add_argument("--out", required=True)
    u.add_argument("--checkpoint", default=None,
                   help="persist the gated stage; resume skips it")
    u.set_defaults(fn=cmd_curate)

    m = sub.add_parser(
        "media-features",
        help="media parquet -> decoded feature vectors (real "
             "BMP/PPM/WAV/y4m codecs; JPEG/MP4 rows flagged stub)")
    m.add_argument("--media", required=True,
                   help="parquet dir with (media_id, kind, payload)")
    m.add_argument("--out", required=True)
    m.add_argument("--batch-size", type=int, default=16,
                   help="rows per batch; keep payload bytes per batch "
                        "well under worker heap")
    m.add_argument("--concurrency", type=int, default=16)
    m.set_defaults(fn=cmd_media_features)

    d = sub.add_parser(
        "media-neardup",
        help="media parquet -> perceptual near-dup pairs "
             "(visual aHash or audio fingerprint, banded pigeonhole)")
    d.add_argument("--media", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--modality", choices=["visual", "audio", "video"],
                   default="visual")
    d.add_argument("--max-hamming", type=int, default=3)
    d.add_argument("--batch-size", type=int, default=64)
    d.set_defaults(fn=cmd_media_neardup)

    b = sub.add_parser(
        "bpe", help="train a BPE vocabulary on documents.parquet and "
                    "write vocab + per-doc token counts")
    b.add_argument("--docs", required=True,
                   help="sf_dir containing documents.parquet")
    b.add_argument("--out", required=True)
    b.add_argument("--merges", type=int, default=512)
    b.add_argument("--min-count", type=int, default=1,
                   help="prune words rarer than this before training")
    b.add_argument("--max-words", type=int, default=None,
                   help="cap the driver-side frequency table "
                        "(top-by-count) — the 100-TB scale knob")
    b.set_defaults(fn=cmd_bpe)

    x = sub.add_parser(
        "perplexity",
        help="score each document's bigram-LM perplexity (CCNet-style; "
             "LM trained on the doc_id%%ref_mod reference slice)")
    x.add_argument("--docs", required=True,
                   help="sf_dir containing documents.parquet")
    x.add_argument("--out", required=True)
    x.add_argument("--ref-mod", type=int, default=10)
    x.set_defaults(fn=cmd_perplexity)

    ds = sub.add_parser(
        "dsir",
        help="DSIR importance weights (bigram likelihood ratio vs the "
             "doc_id%%ref_mod target slice)")
    ds.add_argument("--docs", required=True)
    ds.add_argument("--out", required=True)
    ds.add_argument("--ref-mod", type=int, default=10)
    ds.add_argument("--buckets", type=int, default=10_000,
                    help="hashed feature buckets (DSIR default 10k); "
                         "0 = exact bigram features")
    ds.set_defaults(fn=cmd_dsir)

    ww = sub.add_parser(
        "write-warc",
        help="write a pages parquet (url, html[, warc_ts]) as "
             "CC-layout .warc.gz archives (the inverse of ingest-warc; "
             "content-addressed resumable parts)")
    ww.add_argument("--pages", required=True)
    ww.add_argument("--out", required=True)
    ww.add_argument("--records-per-archive", type=int, default=8192)
    ww.set_defaults(fn=cmd_write_warc)

    pd_ = sub.add_parser(
        "process-dump",
        help="one full snapshot-to-corpus dump: .warc.gz -> extract "
             "-> incremental cross-dump dedup vs the ledger -> "
             "curated parquet under out/dump=<tag>/")
    pd_.add_argument("--warc", nargs="+", required=True)
    pd_.add_argument("--ledger", required=True)
    pd_.add_argument("--out", required=True)
    pd_.add_argument("--tag", required=True,
                     help="dump id (the output partition name)")
    pd_.add_argument("--threshold", type=float, default=0.7)
    pd_.set_defaults(fn=cmd_process_dump)

    di = sub.add_parser(
        "dedup-incr",
        help="incremental MinHash dedup of a new shard against a "
             "persisted band ledger (FineWeb per-dump rule); folds "
             "kept docs back into the ledger")
    di.add_argument("--shard", required=True,
                    help="dir containing the shard's documents.parquet")
    di.add_argument("--ledger", required=True,
                    help="shared-storage ledger dir (created if absent)")
    di.add_argument("--out", required=True,
                    help="verdict parquet (doc_id, kept, reason)")
    di.add_argument("--threshold", type=float, default=0.7)
    di.set_defaults(fn=cmd_dedup_incr)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
