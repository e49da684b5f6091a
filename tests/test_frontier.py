"""Frontier-semantics tests: RefetchControl truth table, filters,
politeness scheduling, discovery parsing (SURVEY.md section 5 item 3)."""

import numpy as np
import pyarrow as pa

from risjbot_ray.frontier.canon import canonicalize_batch, dedupe_wave
from risjbot_ray.frontier.politeness import RobotsIndex, schedule_wave
from risjbot_ray.frontier.seen import SeenShardLogic
from risjbot_ray.functions.urlnorm import url_fingerprint
from risjbot_ray.sources import discovery as D
from risjbot_ray.state.filters import BloomFilter, CuckooFilter, keys_to_array

US = 1_000_000
MAXF, REFETCH, AGELIM = 8, 10_800, 86_400  # settings.py:131-134


def _key(i: int) -> bytes:
    return url_fingerprint(f"https://h.example/{i}")


def make_shard() -> SeenShardLogic:
    return SeenShardLogic(maxfetches=MAXF, refetchsecs=REFETCH,
                          agelimit=AGELIM)


class TestRefetchTruthTable:
    """refetchcontrol.py:246-271 gate semantics."""

    def test_never_seen_allowed_prev0(self):
        s = make_shard()
        allowed, prev = s.check([_key(1)], now_us=0)
        assert allowed[0] and prev[0] == 0
        assert s.counters["firstfetch"] == 1

    def test_maxfetches_reached_drops(self):
        s = make_shard()
        k = _key(1)
        for w in range(MAXF):
            s.commit([k], ["u"], now_us=w, wave=w)
        allowed, _ = s.check([k], now_us=(REFETCH + 1) * US)
        assert not allowed[0]
        assert s.counters["skipped"] == 1

    def test_too_recent_drops(self):
        s = make_shard()
        k = _key(1)
        s.commit([k], ["u"], now_us=0, wave=0)
        allowed, _ = s.check([k], now_us=(REFETCH - 1) * US)
        assert not allowed[0]

    def test_window_eligible_refetches_with_prev(self):
        s = make_shard()
        k = _key(1)
        s.commit([k], ["u"], now_us=0, wave=0)
        allowed, prev = s.check([k], now_us=(REFETCH + 5) * US)
        assert allowed[0] and prev[0] == 1
        assert s.counters["refetched"] == 1

    def test_older_than_agelimit_drops(self):
        s = make_shard()
        k = _key(1)
        s.commit([k], ["u"], now_us=0, wave=0)
        allowed, _ = s.check([k], now_us=(AGELIM + 1) * US)
        assert not allowed[0]

    def test_pass_flag_bypasses(self):
        s = make_shard()
        k = _key(1)
        for w in range(MAXF):
            s.commit([k], ["u"], now_us=w, wave=w)
        allowed, _ = s.check([k], now_us=0, pass_flags=[True])
        assert allowed[0]
        assert s.counters["passed"] == 1

    def test_commit_idempotent_within_wave(self):
        # reserve-then-commit: a retried task must not double-count
        s = make_shard()
        k = _key(1)
        s.commit([k], ["u"], now_us=0, wave=3)
        s.commit([k], ["u"], now_us=0, wave=3)  # retry replay
        assert s.ledger[k][1] == 1
        s.new_wave()
        s.commit([k], ["u"], now_us=1, wave=4)
        assert s.ledger[k][1] == 2

    def test_trawl_window_and_trim(self):
        # refetchcontrol.py:161-193
        s = make_shard()
        now = (AGELIM + 100) * US
        s.commit([_key(1)], ["eligible"], now_us=now - (REFETCH + 10) * US,
                 wave=0)
        s.commit([_key(2)], ["too_recent"], now_us=now - 5 * US, wave=0)
        s.commit([_key(3)], ["too_old"], now_us=now - (AGELIM + 50) * US,
                 wave=0)
        maxed = _key(4)
        for w in range(MAXF):
            s.commit([maxed], ["maxed"], now_us=now - (REFETCH + 10) * US,
                     wave=w + 10)
        eligible, trimmed = s.trawl(now_us=now)
        urls = sorted(u for _, u, _ in eligible)
        assert urls == ["eligible"]
        assert trimmed == 1
        assert _key(3) not in s.ledger
        assert s.counters["dbkeystrimmed"] == 1

    def test_cuckoo_fast_path_after_trim(self):
        """The cuckoo tier is load-bearing: after an agelimit trim the
        add-only bloom still claims the trimmed key, but the delete-
        maintained cuckoo certifies it new WITHOUT a ledger lookup —
        and a first-fetch decision results (the north rule's
        bloom-pre-filter + cuckoo design)."""
        s = make_shard()
        now = (AGELIM + 100) * US
        k = _key(1)
        s.commit([k], ["old"], now_us=now - (AGELIM + 50) * US, wave=0)
        assert s.cuckoo.contains(keys_to_array([k]))[0]
        _, trimmed = s.trawl(now_us=now)
        assert trimmed == 1 and k not in s.ledger
        assert s.bloom.contains(keys_to_array([k]))[0]    # stale
        assert not s.cuckoo.contains(keys_to_array([k]))[0]
        before = s.counters["cuckoo_negative"]
        allowed, prev = s.check([k], now_us=now)
        assert allowed[0] and prev[0] == 0
        assert s.counters["cuckoo_negative"] == before + 1

    def test_trim_protects_requested_keys(self):
        # refetchcontrol.py:180: keys requested this run are not trimmed
        s = make_shard()
        now = (AGELIM + 100) * US
        k = _key(1)
        s.commit([k], ["old"], now_us=now - (AGELIM + 50) * US, wave=0)
        s.check([k], now_us=now)  # marks keysrqd
        _, trimmed = s.trawl(now_us=now)
        assert trimmed == 0 and k in s.ledger

    def test_snapshot_restore_roundtrip(self, tmp_path):
        s = make_shard()
        for i in range(50):
            s.commit([_key(i)], [f"u{i}"], now_us=i, wave=0)
        s.snapshot(str(tmp_path))
        s2 = make_shard()
        assert s2.restore(str(tmp_path))
        assert s2.ledger == s.ledger
        # filters rebuilt: membership still works
        arr = keys_to_array([_key(5)])
        assert s2.bloom.contains(arr)[0]
        assert s2.cuckoo.contains(arr)[0]

    def test_snapshot_deltas_proportional_to_wave_commits(self, tmp_path):
        """Per-wave snapshot rows ~ wave commits, never ledger size; the
        replayed chain restores exactly."""
        import glob

        import pyarrow.parquet as pq
        s = make_shard()
        for i in range(1000):
            s.commit([_key(i)], [f"u{i}"], now_us=i, wave=0)
        p0 = s.snapshot(str(tmp_path))       # full base
        assert "-base-" in p0
        assert pq.read_metadata(p0).num_rows == 1000
        s.commit([_key(2000)], ["new"], now_us=5, wave=1)
        s.commit([_key(3)], ["u3b"], now_us=6, wave=1)  # refetch upsert
        p1 = s.snapshot(str(tmp_path))       # delta with 2 rows only
        assert "-delta-" in p1
        assert pq.read_metadata(p1).num_rows == 2
        s2 = make_shard()
        assert s2.restore(str(tmp_path))
        assert s2.ledger == s.ledger
        assert s2.ledger[_key(3)][1] == 2    # upsert replayed
        # an unchanged wave adds no snapshot file
        n_files = len(glob.glob(str(tmp_path / "seen-shard-*")))
        s.snapshot(str(tmp_path))
        assert len(glob.glob(str(tmp_path / "seen-shard-*"))) == n_files

    def test_snapshot_tombstones_and_compaction(self, tmp_path):
        s = SeenShardLogic(maxfetches=MAXF, refetchsecs=REFETCH,
                           agelimit=AGELIM, compact_every=3)
        now = (AGELIM + 100) * US
        s.commit([_key(1)], ["old"], now_us=now - (AGELIM + 50) * US,
                 wave=0)
        s.commit([_key(2)], ["live"], now_us=now - (REFETCH + 1) * US,
                 wave=0)
        s.snapshot(str(tmp_path))            # base holds both
        s.trawl(now_us=now)                  # trims key 1 -> tombstone
        s.snapshot(str(tmp_path))            # delta carries the delete
        s2 = make_shard()
        assert s2.restore(str(tmp_path))
        assert _key(1) not in s2.ledger and _key(2) in s2.ledger
        assert not s2.cuckoo.contains(keys_to_array([_key(1)]))[0]
        # after compact_every deltas a fresh base replaces the chain
        import glob
        for w in range(2, 6):
            s.commit([_key(100 + w)], [f"u{w}"], now_us=now, wave=w)
            s.snapshot(str(tmp_path))
        bases = glob.glob(str(tmp_path / "seen-shard-*-base-*.parquet"))
        deltas = glob.glob(str(tmp_path / "seen-shard-*-delta-*.parquet"))
        assert len(bases) == 1 and len(deltas) <= 1
        s3 = make_shard()
        assert s3.restore(str(tmp_path))
        assert s3.ledger == s.ledger


class TestFilters:
    def test_bloom_no_false_negatives(self):
        b = BloomFilter(n_bits=1 << 16)
        keys = keys_to_array([_key(i) for i in range(500)])
        b.add(keys)
        assert b.contains(keys).all()

    def test_bloom_mostly_negative_for_unseen(self):
        b = BloomFilter(n_bits=1 << 18)
        b.add(keys_to_array([_key(i) for i in range(500)]))
        other = keys_to_array([_key(i) for i in range(10_000, 11_000)])
        assert b.contains(other).mean() < 0.05

    def test_bloom_serialization(self):
        b = BloomFilter(n_bits=1 << 16)
        keys = keys_to_array([_key(i) for i in range(100)])
        b.add(keys)
        b2 = BloomFilter.from_bytes(b.to_bytes())
        assert b2.contains(keys).all()

    def test_cuckoo_insert_contains_delete(self):
        c = CuckooFilter(n_buckets=1 << 12)
        keys = keys_to_array([_key(i) for i in range(2000)])
        assert c.insert(keys) == 2000
        assert c.contains(keys).all()
        sub = keys_to_array([_key(i) for i in range(100)])
        assert c.delete(sub) == 100
        assert c.contains(sub).mean() < 0.05  # tiny fp rate remains
        # untouched keys still present
        rest = keys_to_array([_key(i) for i in range(100, 2000)])
        assert c.contains(rest).all()

    def test_cuckoo_serialization(self):
        c = CuckooFilter(n_buckets=1 << 10)
        keys = keys_to_array([_key(i) for i in range(300)])
        c.insert(keys)
        c2 = CuckooFilter.from_bytes(c.to_bytes())
        assert c2.contains(keys).all()
        assert c2.count == c.count


def _frontier(rows):
    tbl = pa.Table.from_pylist(
        [{"url": u, "priority": p, "depth": 0, "source_kind": "article",
          "meta": None} for u, p in rows],
        schema=pa.schema([("url", pa.string()), ("priority", pa.int32()),
                          ("depth", pa.int32()),
                          ("source_kind", pa.string()),
                          ("meta", pa.string())]))
    return canonicalize_batch(tbl)


class TestScheduling:
    def test_per_host_budget_and_priority_order(self):
        rows = ([(f"https://a.example/p{i}", i % 3) for i in range(10)]
                + [(f"https://b.example/p{i}", 0) for i in range(2)])
        tbl = _frontier(rows)
        sched, deferred = schedule_wave(tbl, per_host_budget=4)
        hosts = sched.column("host").to_pylist()
        assert hosts.count("a.example") == 4
        assert hosts.count("b.example") == 2
        assert deferred.num_rows == 6
        # top-4 for a.example = all priority-2 then priority-1 by canon_url
        a_rows = [r for r in sched.to_pylist() if r["host"] == "a.example"]
        prios = [r["priority"] for r in a_rows]
        assert prios == sorted(prios, reverse=True)

    def test_salting_preserves_exact_budget(self):
        rows = [(f"https://hot.example/p{i}", i % 5) for i in range(3000)]
        tbl = _frontier(rows)
        sched, deferred = schedule_wave(tbl, per_host_budget=100,
                                        salt_threshold=500)
        assert sched.num_rows == 100
        assert deferred.num_rows == 2900
        # identical result to the unsalted path (exactness of two-phase)
        sched2, _ = schedule_wave(tbl, per_host_budget=100,
                                  salt_threshold=10**9)
        assert (sorted(sched.column("canon_url").to_pylist())
                == sorted(sched2.column("canon_url").to_pylist()))

    def test_deterministic_schedule(self):
        rows = [(f"https://h.example/p{i}", i % 7) for i in range(200)]
        s1, _ = schedule_wave(_frontier(rows), per_host_budget=50)
        s2, _ = schedule_wave(_frontier(rows), per_host_budget=50)
        assert s1.column("canon_url").to_pylist() == \
            s2.column("canon_url").to_pylist()

    def test_dedupe_wave_keeps_highest_priority(self):
        tbl = _frontier([("https://h.example/same", 1),
                         ("https://h.example/same", 5),
                         ("https://h.example/other", 0)])
        out = dedupe_wave(tbl)
        assert out.num_rows == 2
        same = [r for r in out.to_pylist()
                if r["canon_url"].endswith("same")][0]
        assert same["priority"] == 5

    def test_robots_gate(self):
        idx = RobotsIndex({"h.example":
                           "User-agent: *\nDisallow: /private/\n"})
        mask = idx.allowed_mask(
            ["h.example", "h.example", "other.example"],
            ["https://h.example/ok", "https://h.example/private/x",
             "https://other.example/anything"])
        assert list(mask) == [True, False, True]


class TestDiscovery:
    def test_sitemapindex_and_urlset(self):
        idx = (b'<?xml version="1.0"?><sitemapindex xmlns="http://www.'
               b'sitemaps.org/schemas/sitemap/0.9"><sitemap><loc>'
               b'https://h/s1.xml</loc></sitemap></sitemapindex>')
        t, entries = D.parse_sitemap(idx)
        assert t == "sitemapindex" and entries[0]["loc"] == "https://h/s1.xml"
        us = (b'<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/'
              b'schemas/sitemap/0.9" xmlns:news="http://www.google.com/'
              b'schemas/sitemap-news/0.9"><url><loc>https://h/a</loc>'
              b'<lastmod>2017-03-01</lastmod><news:news><news:title>T'
              b'</news:title></news:news></url></urlset>')
        t, entries = D.parse_sitemap(us)
        assert t == "urlset"
        assert entries[0]["loc"] == "https://h/a"
        assert entries[0]["lastmod"] == "2017-03-01"
        assert entries[0]["news"]["title"] == "T"

    def test_gzipped_sitemap(self):
        import gzip
        us = (b'<?xml version="1.0"?><urlset><url><loc>https://h/a</loc>'
              b"</url></urlset>")
        t, entries = D.parse_sitemap(gzip.compress(us))
        assert t == "urlset" and entries[0]["loc"] == "https://h/a"

    def test_robots_sitemap_lines(self):
        assert D.sitemap_urls_from_robots(
            "User-agent: *\nSitemap: https://h/s.xml\nsitemap: https://h/t.xml"
        ) == ["https://h/s.xml", "https://h/t.xml"]

    def test_rss_items(self):
        rss = (b'<rss version="2.0"><channel><item><title>T</title>'
               b"<link>https://h/a</link><description>D</description>"
               b"</item></channel></rss>")
        items = D.parse_rss(rss)
        assert items[0]["link"] == "https://h/a"
        assert items[0]["title"] == "T"

    def test_atom_entries(self):
        atom = (b'<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
                b'<link href="https://h/a"/></entry></feed>')
        assert D.parse_atom(atom) == ["https://h/a"]

    def test_csv_and_specified(self):
        assert D.parse_csv_urls(b"url,x\nhttps://h/a,1\n,2\n") == \
            ["https://h/a"]
        assert D.parse_specified(b"https://h/a\n\n https://h/b \n") == \
            ["https://h/a", "https://h/b"]

    def test_extract_links_allow_deny_restrict(self):
        html = (b'<html><body><div id="nav"><a href="/nav1">n</a></div>'
                b'<div class="content"><a href="/news/a1">a</a>'
                b'<a href="/sport/a2">s</a>'
                b'<a href="https://other.example/x">x</a>'
                b'<a href="/news/a1">dup</a></div></body></html>')
        links = D.extract_links(html, "https://h.example/",
                                allow=[r"h\.example/news/"])
        assert links == ["https://h.example/news/a1"]
        links = D.extract_links(
            html, "https://h.example/", deny=[r"/sport/"],
            restrict_xpaths=['//div[contains(@class, "content")]'])
        assert links == ["https://h.example/news/a1",
                         "https://other.example/x"]

    def test_broken_xml_returns_empty(self):
        assert D.parse_sitemap(b"<urlset><url>") in ((None, []),
                                                     ("urlset", []))
        assert D.parse_rss(b"not xml at all") == []
