"""Benchmark harness: headline crawl pipeline + operator suite.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "throughput": {...}}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32). ``--scaling`` runs the headline pipeline in two fresh
processes (8 and 32 CPUs) on the same input and reports both throughputs
plus scaling efficiency (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        import shutil

        from __ray_entry__ import _corpus_paths
        from risjbot_ray.extract.stage import extract_batch
        from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
        from risjbot_ray.testsupport.pagegen import EQUIVALENT_DOMAINS

        # ---- untimed setup: corpus synth (cached) + OS page-cache warm.
        # Bench corpus scales with the sf tier's lineitem rows (sf0.1 ->
        # 100k pages, the BASELINE.md bench-tier target), independent of
        # the small documents table.
        import pyarrow.parquet as pq
        n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
        bench_n = int(os.environ.get("GRAFT_BENCH_N",
                                     max(10_000, n_li // 6)))
        pages_path, root = _corpus_paths(sf_dir, n=bench_n)
        with open(f"{root}/seeds.json") as f:
            sj = json.load(f)
        import glob as _glob
        for p in (_glob.glob(f"{pages_path}/*.parquet")
                  if os.path.isdir(pages_path) else [pages_path]):
            with open(p, "rb") as f:
                while f.read(1 << 24):
                    pass

        queries: dict[str, float] = {}
        throughput: dict[str, float] = {}

        # ---- headline: full crawl (frontier + politeness + fetch join +
        # extraction + ledger + checkpoint). Run twice, record the MIN —
        # identical runs on this host swing 2-3x under invisible VM
        # steal, and min-of-N is the documented damping protocol.
        crawl_sec = float("inf")
        # scaling mode does its own min-of-N across subprocesses — one
        # crawl per subprocess there; min-of-2 in-process otherwise
        n_attempts = 1 if os.environ.get("GRAFT_HEADLINE_ONLY") else 2
        for attempt in range(n_attempts):
            run_dir = f"{root}/bench-{num_cpus}"
            shutil.rmtree(run_dir, ignore_errors=True)
            cfg = CrawlConfig(out_dir=f"{run_dir}/out",
                              checkpoint_dir=f"{run_dir}/ckpt",
                              per_host_budget=1_000_000,
                              equivalent_domains=EQUIVALENT_DOMAINS,
                              num_seen_shards=8,
                              num_fetch_buckets=128,
                              max_waves=12)
            # store layout is corpus-keyed and shared across CPU levels —
            # built once, reused (same input at both parallelism levels)
            pipe = CrawlPipeline(cfg, pages_path, f"{root}/store128",
                                 robots_bodies=sj["robots"])
            if attempt == 0:
                # untimed page-cache warm of the STORE layout too — the
                # crawl reads bucket files, not the raw pages; a cold
                # first read of ~3 GB otherwise dominates the first wave
                for p in _glob.glob(f"{root}/store128/bucket-*.parquet"):
                    with open(p, "rb") as f:
                        while f.read(1 << 24):
                            pass
            t0 = time.time()
            res = pipe.run(seeds=sj["seeds"])
            crawl_sec = min(crawl_sec, time.time() - t0)
            pipe.shutdown()
        queries["crawl_full"] = round(crawl_sec, 3)
        throughput["frontier_scheduled_urls_per_sec"] = round(
            res["scheduled_urls"] / crawl_sec, 1)
        throughput["extracted_pages_per_sec"] = round(
            res["extracted_pages"] / crawl_sec, 1)
        throughput["scheduled_urls"] = res["scheduled_urls"]
        throughput["extracted_pages"] = res["extracted_pages"]

        if os.environ.get("GRAFT_HEADLINE_ONLY"):
            # scaling runs time ONLY the headline crawl (the other
            # queries don't feed the efficiency ratio)
            return {
                "metric": "crawl_pipeline_wall_sec",
                "value": queries["crawl_full"],
                "unit": "sec",
                "queries": queries,
                "sf": sf_dir,
                "num_cpus": num_cpus,
                "throughput": throughput,
            }

        # ---- politeness-bound crawl: a BINDING per-host budget (~1/3 of
        # each host's volume) exercises the distributed cutoff scheduler
        # and the deferred-spill requeue chain — the semantics the
        # reference enforces per-domain (settings.py:88-94). Recorded so
        # the headline numbers are not only measured with politeness off.
        hosts: set[str] = set()
        for p in (_glob.glob(f"{pages_path}/*.parquet")
                  if os.path.isdir(pages_path) else [pages_path]):
            hosts.update(
                u.split("/", 3)[2]
                for u in pq.read_table(p, columns=["url"])
                .column("url").to_pylist())
        budget = max(50, bench_n // max(1, len(hosts)) // 3)
        budget_sec = float("inf")
        for _ in range(2):  # min-of-2: same damping as the headline
            run_dir_b = f"{root}/bench-budget-{num_cpus}"
            shutil.rmtree(run_dir_b, ignore_errors=True)
            cfg_b = CrawlConfig(out_dir=f"{run_dir_b}/out",
                                checkpoint_dir=f"{run_dir_b}/ckpt",
                                per_host_budget=budget,
                                equivalent_domains=EQUIVALENT_DOMAINS,
                                num_seen_shards=8,
                                num_fetch_buckets=128,
                                max_waves=40)
            pipe_b = CrawlPipeline(cfg_b, pages_path, f"{root}/store128",
                                   robots_bodies=sj["robots"])
            t0 = time.time()
            res_b = pipe_b.run(seeds=sj["seeds"])
            budget_sec = min(budget_sec, time.time() - t0)
            pipe_b.shutdown()
        queries["crawl_budget_bound"] = round(budget_sec, 3)
        throughput["budget_bound_pages_per_sec"] = round(
            res_b["extracted_pages"] / budget_sec, 1)
        throughput["budget_bound_waves"] = res_b["waves"]
        throughput["per_host_budget"] = budget

        # ---- extract-only: the pure map_batches throughput path over
        # ARTICLE pages (the corpus also holds multi-MB feed/sitemap
        # bodies — those go through discovery in the crawl, not the
        # article extractor, so excluding them mirrors the real pipeline)
        import pyarrow.compute as _pc

        def _articles_only(b):
            mask = _pc.invert(_pc.match_substring_regex(
                b.column("url"), r"(robots\.txt|sitemap[^/]*\.xml|feed\.)"))
            return b.filter(mask)

        t0 = time.time()
        ds = ray.data.read_parquet(pages_path)
        out_dir = f"{run_dir}/extract_only"
        (ds.map_batches(_articles_only, batch_format="pyarrow",
                        zero_copy_batch=True)
           .map_batches(extract_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
           .write_parquet(out_dir))
        queries["extract_only"] = round(time.time() - t0, 3)

        # ---- WARC ingest: .warc.gz archives (per-record gzip members,
        # the CC layout) -> page table — the 100-TB entry path. Archive
        # synthesis is untimed and cached; the timed part is
        # read_warc's streaming parse + parquet sink.
        from risjbot_ray.sources.warc import read_warc
        from risjbot_ray.testsupport.warcgen import gen_warc_archives
        warc_files = gen_warc_archives(pages_path, root)
        warc_bytes = sum(os.path.getsize(p) for p in warc_files)
        t0 = time.time()
        (read_warc(warc_files)
         .write_parquet(f"{run_dir}/warc_ingest"))
        warc_sec = time.time() - t0
        queries["warc_ingest"] = round(warc_sec, 3)
        throughput["warc_gz_mb_per_sec"] = round(
            warc_bytes / 1e6 / warc_sec, 1)
        throughput["warc_pages_per_sec"] = round(bench_n / warc_sec, 1)

        # ---- the composed dump loop: .warc.gz -> extract -> cross-
        # dump incremental dedup -> curated parquet, end to end over
        # the same 16 archives warc_ingest reads (fresh ledger)
        from risjbot_ray.pipelines.dumps import process_dump
        dump_led = "/tmp/bench_dump_ledger"
        dump_out = "/tmp/bench_dump_out"
        shutil.rmtree(dump_led, ignore_errors=True)
        shutil.rmtree(dump_out, ignore_errors=True)
        t0 = time.time()
        dm = process_dump(warc_files, dump_led, dump_out, "bench")
        queries["dump_loop"] = round(time.time() - t0, 3)
        throughput["dump_loop_pages_per_sec"] = round(
            dm["n_pages"] / queries["dump_loop"], 1)
        throughput["dump_loop_kept_docs"] = dm["n_kept"]

        # ---- WARC sink: page table -> CC-layout .warc.gz archives
        # (per-record gzip members written inside the map tasks,
        # content-addressed resumable parts) — the inverse of
        # warc_ingest, the 100-TB exit path for a snapshot store.
        from risjbot_ray.sinks import write_warc
        warc_out = f"{run_dir}/warc_write"
        shutil.rmtree(warc_out, ignore_errors=True)
        t0 = time.time()
        manifest = write_warc(ray.data.read_parquet(
            pages_path, columns=["url", "warc_ts", "html"]),
            warc_out, records_per_archive=8192)
        warc_w_sec = time.time() - t0
        queries["warc_write"] = round(warc_w_sec, 3)
        throughput["warc_write_gz_mb_per_sec"] = round(
            sum(manifest.column("n_bytes").to_pylist())
            / 1e6 / warc_w_sec, 1)
        throughput["warc_write_pages_per_sec"] = round(
            sum(manifest.column("n_records").to_pylist())
            / warc_w_sec, 1)

        # ---- CDX index build + selective ranged fetch (~1/16 of the
        # corpus): the random-access path for re-extracting a slice of
        # a snapshot without scanning whole archives.
        from risjbot_ray.sources.warc import cdx_index, read_warc_selective
        t0 = time.time()
        idx = cdx_index(warc_files).materialize()
        n_idx = idx.count()
        queries["warc_cdx_index"] = round(time.time() - t0, 3)
        throughput["cdx_records_per_sec"] = round(
            n_idx / max(queries["warc_cdx_index"], 1e-9), 1)
        t0 = time.time()
        import pyarrow.compute as _pc
        sel = idx.map_batches(
            lambda t: t.filter(_pc.equal(
                _pc.bit_wise_and(t.column("offset"), 15), 0)),
            batch_format="pyarrow")
        n_fetched = read_warc_selective(sel).count()
        queries["warc_cdx_fetch"] = round(time.time() - t0, 3)
        throughput["cdx_fetched_pages"] = n_fetched

        # ---- operator suite over driver testdata tables
        from risjbot_ray.pipelines import dedup, relational, similarity

        def timed(name, fn):
            t = time.time()
            r = fn()
            if hasattr(r, "materialize"):
                r = r.materialize()
            queries[name] = round(time.time() - t, 3)

        timed("exact_dedup", lambda: dedup.exact_dedup(sf_dir))
        timed("ann_topk", lambda: similarity.ann_topk(
            sf_dir, query_ids=[0, 1, 2], k=10))
        timed("ann_hamming", lambda: similarity.ann_hamming_topk(
            sf_dir, query_ids=[0, 1, 2], k=10))
        timed("ann_pq", lambda: similarity.ann_pq_topk(
            sf_dir, query_ids=[0, 1, 2], k=10))
        timed("pricing_summary", lambda: relational.q1_pricing_summary(
            sf_dir))
        timed("events_hourly", lambda: relational.events_hourly(sf_dir))

        # ---- webtext training-data operators at bench scale (the
        # driver's documents table is tiny; generate a deterministic
        # 100k-doc corpus — cached across runs — and time the two
        # heavyweights end-to-end with a parquet sink)
        from risjbot_ray.pipelines import webtext
        from risjbot_ray.testsupport.docgen import gen_docs_corpus
        n_docs = int(os.environ.get("GRAFT_DOCS_N", 100_000))
        docs_root = gen_docs_corpus(n_docs)
        from risjbot_ray.pipelines import dedup as dedup_mod
        from risjbot_ray.pipelines import textstats as ts_wt
        for name, fn in (("tile_dedup", webtext.tile_dedup),
                         ("curate_corpus", webtext.curate_corpus),
                         ("quality_rank", webtext.quality_rank),
                         ("line_dedup", webtext.line_dedup),
                         ("host_line_dedup", webtext.host_line_dedup),
                         ("paragraph_dedup", webtext.paragraph_dedup),
                         # Bloom (Dolma-BFF) variant: ~10 bits per
                         # distinct paragraph at this corpus size
                         ("bloom_para_dedup",
                          lambda sf: webtext.bloom_paragraph_dedup(
                              sf, n_bits=1 << 25, n_shards=8)),
                         ("c4_clean", webtext.c4_clean),
                         ("url_filter", webtext.url_filter),
                         ("gram_dup", webtext.gram_duplication),
                         ("window_dedup", webtext.window_dedup),
                         ("domain_filter", webtext.domain_quality_filter),
                         ("token_budget", webtext.quality_token_budget),
                         ("tfidf_topk", webtext.tfidf_topk),
                         ("curate_cascade",
                          lambda sf: ray.data.from_arrow(
                              webtext.curate_cascade(sf))),
                         ("gopher_quality", ts_wt.q_gopher),
                         ("decontaminate_fuzzy",
                          dedup_mod.decontaminate_fuzzy)):
            out = f"/tmp/bench_wt_{name}"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            fn(docs_root).write_parquet(out)
            queries[name] = round(time.time() - t0, 3)
            throughput[f"{name}_docs_per_sec"] = round(
                n_docs / queries[name], 1)
        # full NLP enrichment (Sentiment + WordCount + NamedPeople +
        # ReadingAge) as ONE actor pool over the same corpus: the
        # per-doc regex loops are correct-but-unmeasured (VERDICT r4
        # item 9) — this row makes regressions in them visible
        from risjbot_ray.enrich.stages import Enrich

        def _as_body(b):
            import pyarrow as _pa
            return b.select(["doc_id"]).append_column(
                "bodytext", b.column("text"))

        out = "/tmp/bench_enrich_full"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        # fixed pool + block override: an autoscaling pool ramps on
        # the critical path (the decontaminate_fuzzy lesson) and one
        # parquet file would otherwise underfeed the actors
        (ray.data.read_parquet(f"{docs_root}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=64)
         .map_batches(_as_body, batch_format="pyarrow",
                      zero_copy_batch=True)
         .map_batches(Enrich, batch_format="pyarrow",
                      fn_constructor_kwargs={"namedpeople": True,
                                             "readingage": True},
                      concurrency=16)
         .write_parquet(out))
        queries["enrich_full"] = round(time.time() - t0, 3)
        throughput["enrich_full_docs_per_sec"] = round(
            n_docs / queries["enrich_full"], 1)
        # BPE: train on the corpus (one combiner groupby + driver merge
        # loop), then the actor-pool apply with a parquet sink
        from risjbot_ray.pipelines import bpe
        t0 = time.time()
        merges = bpe.train_bpe(docs_root, n_merges=512)
        queries["bpe_train"] = round(time.time() - t0, 3)
        out = "/tmp/bench_bpe_apply"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        bpe.bpe_tokencount(docs_root, merges=merges).write_parquet(out)
        queries["bpe_apply"] = round(time.time() - t0, 3)
        throughput["bpe_apply_docs_per_sec"] = round(
            n_docs / queries["bpe_apply"], 1)
        throughput["bpe_n_merges"] = len(merges)

        # incremental MinHash dedup: split the 100k corpus into two
        # shards, ingest A then B through a fresh band ledger (the
        # FineWeb per-dump workflow: B dedups against A's kept docs
        # without re-reading A)
        import pyarrow as _pa
        import pyarrow.parquet as _pqm

        from risjbot_ray.pipelines.dedup import minhash_dedup_incremental
        incr_root = "/tmp/bench_minhash_incr"
        shard_root = f"{docs_root}_shards"
        if not os.path.exists(f"{shard_root}/.complete"):
            t = _pqm.read_table(f"{docs_root}/documents.parquet",
                                columns=["doc_id", "text"])
            dids = t.column("doc_id").to_numpy()
            for name, mask in (("A", dids % 2 == 0),
                               ("B", dids % 2 == 1)):
                os.makedirs(f"{shard_root}/{name}", exist_ok=True)
                _pqm.write_table(
                    t.filter(_pa.array(mask)),
                    f"{shard_root}/{name}/documents.parquet")
            with open(f"{shard_root}/.complete", "w") as f:
                f.write("ok")
        shutil.rmtree(incr_root, ignore_errors=True)
        t0 = time.time()
        minhash_dedup_incremental(f"{shard_root}/A", incr_root)
        minhash_dedup_incremental(f"{shard_root}/B", incr_root)
        queries["minhash_incr"] = round(time.time() - t0, 3)
        throughput["minhash_incr_docs_per_sec"] = round(
            n_docs / queries["minhash_incr"], 1)

        # LM curation signals: CCNet perplexity + bucketed DSIR (both
        # train a broadcast model then run a zero-exchange scoring map)
        from risjbot_ray.pipelines import lm
        out = "/tmp/bench_perplexity"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        lm.perplexity_score(docs_root,
                            concurrency=16).write_parquet(out)
        queries["perplexity"] = round(time.time() - t0, 3)
        throughput["perplexity_docs_per_sec"] = round(
            n_docs / queries["perplexity"], 1)
        out = "/tmp/bench_trigram"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        lm.trigram_perplexity_score(
            docs_root, concurrency=16).write_parquet(out)
        queries["trigram_ppl"] = round(time.time() - t0, 3)
        throughput["trigram_ppl_docs_per_sec"] = round(
            n_docs / queries["trigram_ppl"], 1)
        out = "/tmp/bench_dsir"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        lm.dsir_score(docs_root, n_buckets=10_000,
                      concurrency=16).write_parquet(out)
        queries["dsir_bucketed"] = round(time.time() - t0, 3)
        throughput["dsir_docs_per_sec"] = round(
            n_docs / queries["dsir_bucketed"], 1)
        # CCNet tercile split: LM train + fp-NLL scoring + the exact
        # per-language prefix-sum rank exchange, end to end
        out = "/tmp/bench_ccnet"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        lm.ccnet_ppl_buckets(docs_root,
                             concurrency=16).write_parquet(out)
        queries["ccnet_buckets"] = round(time.time() - t0, 3)
        throughput["ccnet_buckets_docs_per_sec"] = round(
            n_docs / queries["ccnet_buckets"], 1)

        # model-based quality: logistic-regression trainer (featurize
        # once + 12 full-batch GD streaming passes) and the mojibake
        # repair path (1/3 of docs corrupted by the check's injector,
        # RE2 prefilter + strict round-trip repair)
        from risjbot_ray.pipelines import textstats as ts_mod
        t0 = time.time()
        clf_row = ts_mod.quality_classifier(
            docs_root, iters=12, min_words=250).to_pylist()[0]
        queries["quality_classifier"] = round(time.time() - t0, 3)
        throughput["quality_classifier_docs_per_sec"] = round(
            n_docs / queries["quality_classifier"], 1)
        throughput["quality_classifier_check_ok"] = bool(
            clf_row["check_ok"])
        t0 = time.time()
        moji_row = ts_mod.q_mojibake_check(docs_root).to_pylist()[0]
        queries["mojibake_repair"] = round(time.time() - t0, 3)
        throughput["mojibake_docs_per_sec"] = round(
            n_docs / queries["mojibake_repair"], 1)
        throughput["mojibake_check_ok"] = bool(moji_row["check_ok"])

        t0 = time.time()
        hll_row = webtext.hll_distinct(docs_root).to_pylist()[0]
        queries["hll_distinct"] = round(time.time() - t0, 3)
        throughput["hll_distinct_docs_per_sec"] = round(
            n_docs / queries["hll_distinct"], 1)
        throughput["hll_within_bound"] = bool(hll_row["within_bound"])

        # mergeable summaries + graph analytics over the same corpus
        from risjbot_ray.pipelines import sketch as sk_mod
        from risjbot_ray.pipelines.graph import (PAGERANK_ITERS,
                                                 doc_link_pagerank)
        t0 = time.time()
        sk_mod.wordcount_quantiles(docs_root)
        queries["wordcount_quantiles"] = round(time.time() - t0, 3)
        t0 = time.time()
        sk_mod.heavy_hitters(docs_root, m=256)
        queries["heavy_hitters"] = round(time.time() - t0, 3)
        throughput["heavy_hitters_docs_per_sec"] = round(
            n_docs / queries["heavy_hitters"], 1)
        t0 = time.time()
        doc_link_pagerank(docs_root)
        queries["pagerank"] = round(time.time() - t0, 3)
        # 2 out-edges per non-dangling node, PAGERANK_ITERS sweeps
        throughput["pagerank_edge_iters_per_sec"] = round(
            2 * n_docs * (16 / 17) * PAGERANK_ITERS
            / queries["pagerank"], 1)

        # ---- multimodal operators over a real-encoded media corpus
        # (BMP/PPM/WAV/y4m payloads; decode is real, see media/codecs)
        from risjbot_ray.pipelines.multimodal import (media_features_ds,
                                                      media_phash_pairs)
        from risjbot_ray.testsupport.mediagen import gen_media_corpus
        n_media = int(os.environ.get("GRAFT_MEDIA_N", 100_000))
        mdir = gen_media_corpus(n_media)
        media_mb = sum(
            os.path.getsize(os.path.join(mdir, f))
            for f in os.listdir(mdir)) / 1e6
        out = "/tmp/bench_media_features"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        # fixed pool (media_pool_size) + ~4 MB batches: the bench
        # corpus is KB-scale rows, so batch_size=1024 keeps the pool
        # compute-bound rather than task-launch-bound
        media_features_ds(path=mdir,
                          batch_size=1024).write_parquet(out)
        queries["media_features"] = round(time.time() - t0, 3)
        throughput["media_decode_rows_per_sec"] = round(
            n_media / queries["media_features"], 1)
        throughput["media_decode_mb_per_sec"] = round(
            media_mb / queries["media_features"], 1)
        t0 = time.time()
        n_pairs = media_phash_pairs(path=mdir, batch_size=1024).count()
        queries["media_phash_pairs"] = round(time.time() - t0, 3)
        throughput["media_phash_rows_per_sec"] = round(
            n_media / queries["media_phash_pairs"], 1)
        throughput["media_neardup_pairs"] = int(n_pairs)

        return {
            "metric": "crawl_pipeline_wall_sec",
            "value": queries["crawl_full"],
            "unit": "sec",
            "queries": queries,
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "throughput": throughput,
        }
    finally:
        ray.shutdown()


def run_subprocess(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.abspath(__file__)]
    # HONEST parallelism levels: ray.init(num_cpus=N) only caps task
    # SCHEDULING — in-task thread pools (fetch IO, pyarrow decode) would
    # still borrow idle physical cores, silently flattering the LOW
    # level and deflating the measured N->4N ratio. taskset pins the
    # whole process tree to exactly N cores so each level behaves like
    # an N-core node. Disable with GRAFT_NO_PIN=1.
    if not os.environ.get("GRAFT_NO_PIN") and os.path.exists(
            "/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{ncpu - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise subprocess.CalledProcessError(
            out.returncode, cmd, out.stdout, out.stderr)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_level_steady(ncpu: int) -> dict:
    """N+1 runs per level: the first warms caches / absorbs write-back
    from earlier runs; of the remaining N (GRAFT_SCALE_RUNS, default 3),
    the FASTEST is recorded (min-of-N damps interference from unrelated
    host load). os.sync + settle keeps one run's dirty-page flush out of
    the next's timing. All raw timings are reported alongside the min."""
    n_runs = int(os.environ.get("GRAFT_SCALE_RUNS", "3"))
    os.sync()
    run_subprocess(ncpu)          # warm-up, discarded
    results = []
    for _ in range(n_runs):
        os.sync()
        time.sleep(3)
        results.append(run_subprocess(ncpu))
    best = min(results, key=lambda r: r["value"])
    best["all_runs_sec"] = [r["value"] for r in results]
    return best


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        # the scaling criterion uses a larger corpus so parallel work
        # dominates fixed per-wave costs (same input at both levels);
        # override with GRAFT_BENCH_N
        if "GRAFT_BENCH_N" not in os.environ:
            import pyarrow.parquet as pq
            n_li = pq.read_metadata(
                f"{sf_dir}/lineitem.parquet").num_rows
            os.environ["GRAFT_BENCH_N"] = str(max(100_000, n_li))
        os.environ["GRAFT_HEADLINE_ONLY"] = "1"
        levels = os.environ.get("GRAFT_SCALE_LEVELS", "8,32")
        lo, hi = (int(x) for x in levels.split(","))
        r_lo = run_level_steady(lo)
        r_hi = run_level_steady(hi)
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
            f"runs_{lo}": r_lo.get("all_runs_sec"),
            f"runs_{hi}": r_hi.get("all_runs_sec"),
            f"throughput_{lo}": r_lo["throughput"],
            f"throughput_{hi}": r_hi["throughput"],
            "levels": [lo, hi],
            "sf": sf_dir,
        }))
        return

    print(json.dumps(run_bench(sf_dir, ncpu)))


if __name__ == "__main__":
    main()
