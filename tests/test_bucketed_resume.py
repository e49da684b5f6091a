"""Resume semantics for BucketedFrontier spills: a crash between the
discovery spill and the bucketed wave must not lose the spilled articles,
and a COMPLETED bucketed wave must not be clobbered on resume."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from risjbot_ray.pipelines.crawl import CrawlConfig, CrawlPipeline
from risjbot_ray.testsupport.pagegen import EQUIVALENT_DOMAINS, gen_corpus


def _read_out(out_dir):
    parts = sorted(glob.glob(f"{out_dir}/wave=*/*.parquet"))
    return (pa.concat_tables([pq.read_table(p) for p in parts],
                             promote_options="default")
            if parts else None)


def test_pending_bucketed_survives_crash(ray_session, tmp_path):
    pages, expected, seeds, robots = gen_corpus(120, seed=7)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)

    # ray_discovery_rows=0 forces the spill path even for small waves;
    # max_waves cuts the run right after the spill wave commits, before
    # the bucketed article wave runs — simulating a crash at the worst
    # point
    cfg = CrawlConfig(out_dir=str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      per_host_budget=100000, num_seen_shards=2,
                      num_fetch_buckets=4, max_waves=3,
                      ray_discovery_rows=0, small_wave_rows=0,
                      equivalent_domains=EQUIVALENT_DOMAINS)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    pipe.run(seeds=seeds)
    pipe.shutdown()

    latest = int(open(tmp_path / "ckpt" / "LATEST").read())
    manifest = json.load(open(tmp_path / "ckpt" / f"wave-{latest:04d}.json"))
    # at least one pending spill must be recorded somewhere in the chain
    pend_any = any(
        json.load(open(p)).get("pending_bucketed")
        for p in glob.glob(str(tmp_path / "ckpt" / "wave-*.json")))
    extracted_so_far = _read_out(cfg.out_dir)
    n_before = extracted_so_far.num_rows if extracted_so_far else 0

    # resume: the pending spill must be restored and processed
    cfg2 = CrawlConfig(out_dir=str(tmp_path / "out"),
                       checkpoint_dir=str(tmp_path / "ckpt"),
                       per_host_budget=100000, num_seen_shards=2,
                       num_fetch_buckets=4, max_waves=25,
                       ray_discovery_rows=0, small_wave_rows=0,
                       equivalent_domains=EQUIVALENT_DOMAINS)
    pipe2 = CrawlPipeline(cfg2, ppath, str(tmp_path / "store2"),
                          robots_bodies=robots)
    pipe2.run(resume=True)
    pipe2.shutdown()

    ext = _read_out(cfg.out_dir)
    live = sorted(r["url"] for r in expected.to_pylist() if not r["dropped"])
    got = sorted(ext.column("url").to_pylist())
    assert got == live, (len(got), len(live))
    assert pend_any or n_before == len(live)

    # resuming AGAIN after full completion must not clobber outputs
    pipe3 = CrawlPipeline(cfg2, ppath, str(tmp_path / "store3"),
                          robots_bodies=robots)
    pipe3.run(resume=True)
    pipe3.shutdown()
    ext2 = _read_out(cfg.out_dir)
    assert sorted(ext2.column("url").to_pylist()) == live


def test_resume_mid_deferral_chain(ray_session, tmp_path):
    """A run stopped in the middle of a politeness deferral-rank chain
    (look-ahead cutoffs, NEXT-linked rank spills) must resume and finish
    with the exact live set — the pending rank and its successors are
    recovered from the manifests + NEXT files."""
    pages, expected, seeds, robots = gen_corpus(150, seed=23)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    base = dict(out_dir=str(tmp_path / "out"),
                checkpoint_dir=str(tmp_path / "ckpt"),
                per_host_budget=2, num_seen_shards=2,
                num_fetch_buckets=4, ray_discovery_rows=0,
                small_wave_rows=0,
                equivalent_domains=EQUIVALENT_DOMAINS)
    cfg = CrawlConfig(max_waves=5, **base)
    pipe = CrawlPipeline(cfg, ppath, str(tmp_path / "store"),
                         robots_bodies=robots)
    pipe.run(seeds=seeds)
    pipe.shutdown()
    partial = _read_out(cfg.out_dir)
    live = sorted(r["url"] for r in expected.to_pylist()
                  if not r["dropped"])
    assert partial is not None and partial.num_rows < len(live), \
        "run must stop mid-chain for this test to mean anything"
    # mid-chain: rank spills exist, some without COMPLETE markers
    ranks = glob.glob(str(tmp_path / "ckpt" / "deferred-*-r*"))
    assert ranks
    assert any(not os.path.exists(os.path.join(r, "COMPLETE"))
               for r in ranks)

    cfg2 = CrawlConfig(max_waves=80, **base)
    pipe2 = CrawlPipeline(cfg2, ppath, str(tmp_path / "store2"),
                          robots_bodies=robots)
    pipe2.run(resume=True)
    pipe2.shutdown()
    ext = _read_out(cfg.out_dir)
    assert sorted(ext.column("url").to_pylist()) == live


def _live_urls(expected):
    return sorted(r["url"] for r in expected.to_pylist() if not r["dropped"])


def _crash_on_mode(monkeypatch, mode, nth=1):
    """Patch CheckpointManager.commit_wave to raise just before the
    ``nth`` manifest of the given mode lands — i.e. after outputs +
    OUTPUTS marker + seen snapshot, the exact window where a naive
    reprocess would rmtree complete outputs and then seen-skip every
    row."""
    from risjbot_ray.state.checkpoint import CheckpointManager
    orig = CheckpointManager.commit_wave
    state = {"left": nth}

    def boom(self, wave, manifest):
        if state["left"] > 0 and manifest.get("mode") == mode:
            state["left"] -= 1
            if state["left"] == 0:
                state["left"] = -1
                raise RuntimeError("injected crash before manifest commit")
        return orig(self, wave, manifest)

    monkeypatch.setattr(CheckpointManager, "commit_wave", boom)
    return state


def _assert_replay_recovers(tmp_path, mode, monkeypatch, *,
                            per_host_budget, n_pages, seed):
    pages, expected, seeds, robots = gen_corpus(n_pages, seed=seed)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    base = dict(out_dir=str(tmp_path / "out"),
                checkpoint_dir=str(tmp_path / "ckpt"),
                per_host_budget=per_host_budget, num_seen_shards=2,
                num_fetch_buckets=4, max_waves=60,
                ray_discovery_rows=0, small_wave_rows=0,
                equivalent_domains=EQUIVALENT_DOMAINS)
    _crash_on_mode(monkeypatch, mode)
    pipe = CrawlPipeline(CrawlConfig(**base), ppath,
                         str(tmp_path / "store"), robots_bodies=robots)
    try:
        pipe.run(seeds=seeds)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    finally:
        pipe.shutdown()

    # crash state: OUTPUTS marker on disk for a spill with no COMPLETE
    markers = glob.glob(str(tmp_path / "ckpt" / "*" / "OUTPUTS.json"))
    crashed = [m for m in markers
               if not os.path.exists(os.path.join(os.path.dirname(m),
                                                  "COMPLETE"))]
    assert crashed, "crash must land after the marker, before COMPLETE"
    payload = json.load(open(crashed[0]))
    assert payload["mode"] == mode

    monkeypatch.undo()
    pipe2 = CrawlPipeline(CrawlConfig(**base), ppath,
                          str(tmp_path / "store2"), robots_bodies=robots)
    pipe2.run(resume=True)
    pipe2.shutdown()

    ext = _read_out(base["out_dir"])
    assert sorted(ext.column("url").to_pylist()) == _live_urls(expected)
    replayed = [json.load(open(p))
                for p in glob.glob(str(tmp_path / "ckpt" / "wave-*.json"))]
    replayed = [m for m in replayed if m.get("replayed")]
    assert replayed and replayed[0]["mode"] == mode
    # replay must not re-fetch: the resumed run's store was never built
    # with these pages' buckets read — the recorded schedule count must
    # carry over from the crashed run's marker, not a second fetch pass
    assert replayed[0]["scheduled"] == payload["scheduled"]


def test_single_wave_epilogue_crash_replays(ray_session, tmp_path,
                                            monkeypatch):
    """A crash between the seen snapshot and the manifest commit of a
    plain bucketed wave must resume via commit replay with the exact
    live set — a destructive reprocess would seen-skip every committed
    row after rmtree'ing its complete output."""
    _assert_replay_recovers(tmp_path, "bucketed", monkeypatch,
                            per_host_budget=100000, n_pages=130, seed=41)


def test_window_epilogue_crash_replays(ray_session, tmp_path, monkeypatch):
    """Same crash window, but for the multi-wave politeness window job
    (_run_bucketed_window): the replayed manifest must preserve the
    window's recorded schedule and the resumed run must finish the
    deferral chain."""
    _assert_replay_recovers(tmp_path, "bucketed-window", monkeypatch,
                            per_host_budget=2, n_pages=130, seed=43)


def test_rank_wave_crash_replay_releases_next(ray_session, tmp_path,
                                              monkeypatch):
    """Crash at the commit of a DEFERRAL-RANK wave (NEXT-chained spill,
    politeness_lookahead=1 forces the per-wave chain): the replay must
    release the successor rank recorded in the OUTPUTS payload, or the
    chain stalls and under-fetches."""
    pages, expected, seeds, robots = gen_corpus(130, seed=47)
    ppath = str(tmp_path / "pages.parquet")
    pq.write_table(pages, ppath)
    base = dict(out_dir=str(tmp_path / "out"),
                checkpoint_dir=str(tmp_path / "ckpt"),
                per_host_budget=3, politeness_lookahead=1,
                num_seen_shards=2, num_fetch_buckets=4, max_waves=80,
                ray_discovery_rows=0, small_wave_rows=0,
                equivalent_domains=EQUIVALENT_DOMAINS)
    # nth=2: the first "bucketed" manifest is the over-budget article
    # wave (creates the rank chain); the second is rank 1's wave
    _crash_on_mode(monkeypatch, "bucketed", nth=2)
    pipe = CrawlPipeline(CrawlConfig(**base), ppath,
                         str(tmp_path / "store"), robots_bodies=robots)
    try:
        pipe.run(seeds=seeds)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    finally:
        pipe.shutdown()

    ranks = glob.glob(str(tmp_path / "ckpt" / "deferred-*-r*"))
    assert ranks, "budget must have produced a rank chain"
    crashed = [d for d in ranks
               if os.path.exists(os.path.join(d, "OUTPUTS.json"))
               and not os.path.exists(os.path.join(d, "COMPLETE"))]
    assert crashed, "crash must land on a rank spill's epilogue"

    monkeypatch.undo()
    pipe2 = CrawlPipeline(CrawlConfig(**base), ppath,
                          str(tmp_path / "store2"), robots_bodies=robots)
    pipe2.run(resume=True)
    pipe2.shutdown()
    ext = _read_out(base["out_dir"])
    assert sorted(ext.column("url").to_pylist()) == _live_urls(expected)
