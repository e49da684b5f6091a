"""The sharded URL-seen set / fetch ledger — RefetchControl as an actor pool.

Reference semantics (spmiddlewares/refetchcontrol.py, sqlite
``records(key, url, fetches, time)``):

- gate (``_process_request``, lines 227-279): allow iff never fetched, or
  ``fetches < maxfetches AND refetchsecs <= age <= agelimit``; a
  ``refetchcontrol_pass`` flag bypasses the gate and the ledger entirely.
- commit (``_process_item``, lines 281-316): on successful item, upsert
  ``fetches+1, now`` keyed by the *request* fingerprint. Pass-flagged
  responses are not stored.
- trawl (``spider_idle``, lines 132-195): end-of-wave sweep scheduling
  under-fetched entries (``time<=now-refetchsecs AND time>now-agelimit AND
  fetches<maxfetches``) and trimming entries older than agelimit that were
  not requested this run.

Scaled out: N shard actors keyed by ``url_hash % N`` (url_hash is derived
from the same sha1 fingerprint as the ledger key, so routing and identity
agree). Each shard holds bloom pre-filter + cuckoo filter + an exact dict
ledger; the bloom/cuckoo tiers answer "definitely new" / "probably seen"
without touching the exact map.

RAM bound (honest): the exact tier is an in-RAM dict of ~100 B/entry, so
one shard holds ~10^7 keys per GiB of actor heap. At 10^10 ledger keys
the deployment answer is MORE SHARDS across MORE NODES (the shard count
is a constructor parameter and routing is pure ``hash % N``, so 1024
shards over a 256-node cluster hold ~10^7 keys each at ~1 GiB/actor);
a single node cannot hold the exact tier of a 10^10-key ledger and this
module does not pretend otherwise. What IS paged to Parquet is the
snapshot stream: ``snapshot()`` writes per-wave DELTAS (keys
upserted/trimmed since the last snapshot, tombstones as ``fetches=-1``)
and compacts into a fresh base every ``compact_every`` deltas, so
per-wave checkpoint bytes are proportional to the wave's commits, never
to ledger size, and ``restore()`` replays base + suffix deltas.

Idempotence under task retries: ``commit`` carries the wave id; a key
already committed in the same wave is not double-counted
(reserve-then-commit, SURVEY.md section 7.4 item 3).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..state.checkpoint import _fsync_dir, _fsync_file
from ..state.filters import BloomFilter, CuckooFilter, keys_to_array

DEFAULT_MAXFETCHES = 8       # settings.py:131
DEFAULT_REFETCHSECS = 10800  # settings.py:132
# agelimit default = refetchsecs * maxfetches (refetchcontrol.py:56-57)


def _now_us() -> int:
    return int(datetime.now(timezone.utc).timestamp() * 1_000_000)


def _snap_seq_of(path: str) -> int:
    """Sequence number from a snapshot file name (…-{base,delta}-NNNNNN
    .parquet)."""
    return int(os.path.basename(path).rsplit("-", 1)[-1].split(".")[0])


class SeenShardLogic:
    """Pure (non-actor) shard logic, unit-testable without Ray."""

    def __init__(self, shard_id: int = 0,
                 maxfetches: int = DEFAULT_MAXFETCHES,
                 refetchsecs: int = DEFAULT_REFETCHSECS,
                 agelimit: int | None = None,
                 bloom_bits: int = 1 << 22,
                 cuckoo_buckets: int = 1 << 16,
                 compact_every: int = 16):
        self.shard_id = shard_id
        self.maxfetches = maxfetches
        self.refetchsecs = refetchsecs
        self.agelimit = (agelimit if agelimit is not None
                         else refetchsecs * maxfetches)
        # key(bytes sha1) -> [url, fetches, time_us]
        self.ledger: dict[bytes, list] = {}
        self.bloom = BloomFilter(n_bits=bloom_bits)
        self.cuckoo = CuckooFilter(n_buckets=cuckoo_buckets)
        # set when any cuckoo insert failed (table full): a failed
        # insert would make cuckoo-negative a FALSE negative, so the
        # fast path disables itself until the next rebuild
        self._cuckoo_overflow = False
        # per-RUN set (reference RefetchControl semantics: keys
        # requested this run are exempt from the agelimit trim,
        # refetchcontrol.py:62,231-232). RAM is O(keys probed this
        # run) — part of the shard's documented memory budget, reset
        # only when the actor restarts for a new run.
        self.keysrqd: set[bytes] = set()
        self._wave_committed: dict[bytes, int] = {}
        # delta-snapshot state: keys changed since the last snapshot
        self.compact_every = compact_every
        self._dirty: set[bytes] = set()
        self._tombstones: set[bytes] = set()
        self._snap_seq = 0
        self._delta_count = 0
        self.counters = {
            "firstfetch": 0, "refetched": 0, "skipped": 0, "passed": 0,
            "stored": 0, "trawled": 0, "dbkeystrimmed": 0,
            "bloom_negative": 0, "cuckoo_negative": 0,
        }

    # -- gate -------------------------------------------------------------
    def check(self, keys: list[bytes], now_us: int,
              pass_flags: list[bool] | None = None,
              dry: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """Returns (allowed bool mask, previousfetches int32).

        Truth table per refetchcontrol.py:246-271. ``dry=True`` is a pure
        read (no counters, no keysrqd) — used by the politeness-cutoff
        pre-pass, which gates the same rows a second time for real."""
        n = len(keys)
        allowed = np.zeros(n, dtype=bool)
        prev = np.zeros(n, dtype=np.int32)
        if n == 0:
            return allowed, prev
        counters = (dict(self.counters) if dry else self.counters)
        arr = keys_to_array(keys)
        maybe_seen = self.bloom.contains(arr)
        # cuckoo tier: delete-maintained, so after agelimit trims it
        # stays precise where the add-only bloom goes stale — a
        # cuckoo-negative is as authoritative as a bloom-negative
        # (no false negatives while no insert has ever overflowed)
        cuckoo_seen = (self.cuckoo.contains(arr)
                       if not self._cuckoo_overflow else None)
        for i, key in enumerate(keys):
            if not dry:
                self.keysrqd.add(key)
            if pass_flags is not None and pass_flags[i]:
                counters["passed"] += 1
                allowed[i] = True
                continue
            if not maybe_seen[i]:
                # bloom-certified new — no ledger lookup needed
                counters["bloom_negative"] += 1
                counters["firstfetch"] += 1
                allowed[i] = True
                continue
            if cuckoo_seen is not None and not cuckoo_seen[i]:
                # bloom stale (e.g. trimmed key) but cuckoo-certified
                # new — same no-ledger-lookup fast path
                counters["cuckoo_negative"] += 1
                counters["firstfetch"] += 1
                allowed[i] = True
                continue
            rec = self.ledger.get(key)
            if rec is None:
                counters["firstfetch"] += 1
                allowed[i] = True
                continue
            _, nf, t_us = rec
            age = (now_us - t_us) / 1e6
            if (nf >= self.maxfetches or age < self.refetchsecs
                    or age > self.agelimit):
                counters["skipped"] += 1
                continue
            prev[i] = nf
            counters["refetched"] += 1
            allowed[i] = True
        return allowed, prev

    # -- commit -----------------------------------------------------------
    def commit(self, keys: list[bytes], urls: list[str], now_us: int,
               wave: int = -1) -> int:
        """Upsert fetches+1/time for each key (refetchcontrol.py:290-310);
        wave-scoped idempotence for retried tasks."""
        stored = 0
        fresh = []
        for key, url in zip(keys, urls):
            if wave >= 0 and self._wave_committed.get(key) == wave:
                continue  # retried task — already counted this wave
            self._wave_committed[key] = wave
            rec = self.ledger.get(key)
            if rec is None:
                self.ledger[key] = [url, 1, now_us]
                fresh.append(key)
            else:
                rec[0] = url
                rec[1] += 1
                rec[2] = now_us
            self._dirty.add(key)
            self._tombstones.discard(key)
            stored += 1
        if fresh:
            arr = keys_to_array(fresh)
            self.bloom.add(arr)
            if self.cuckoo.insert(arr) < len(fresh):
                self._cuckoo_overflow = True
        self.counters["stored"] += stored
        return stored

    # -- trawl + trim (spider_idle) ---------------------------------------
    def trawl(self, now_us: int, trim: bool = True
              ) -> tuple[list[tuple[bytes, str, int]], int]:
        """Returns (eligible refetch entries [(key, url, fetches)], trimmed
        count). Eligibility/trim per refetchcontrol.py:161-193."""
        cutoff_t = now_us - self.refetchsecs * 1_000_000
        cutoff_old = now_us - self.agelimit * 1_000_000
        eligible = []
        to_delete = []
        for key, (url, nf, t_us) in self.ledger.items():
            if t_us <= cutoff_t and t_us > cutoff_old and nf < self.maxfetches:
                eligible.append((key, url, nf))
                self.counters["trawled"] += 1
            elif t_us <= cutoff_old and trim and key not in self.keysrqd:
                to_delete.append(key)
        if trim and to_delete:
            for key in to_delete:
                del self.ledger[key]
                self._tombstones.add(key)
                self._dirty.discard(key)
            self.cuckoo.delete(keys_to_array(to_delete))
            # bloom is add-only and keeps trimmed keys until the next
            # restore() rebuild; the delete-maintained cuckoo restores
            # the fast-negative path for them in the meantime
            self.counters["dbkeystrimmed"] += len(to_delete)
        return eligible, len(to_delete)

    def trawl_spill(self, now_us: int, spill_dir: str, num_buckets: int,
                    trim: bool = True) -> int:
        """Shard-side trawl: write this shard's eligible refetch entries
        DIRECTLY as a bucketed frontier spill (per-fetch-bucket parquet +
        sidecar counts) instead of returning them to the driver — at
        design scale the trawl IS the frontier (refetchcontrol.py:132-195
        semantics, spilled like any discovery wave). Returns rows spilled.
        """
        import json as _json

        from ..sources.stage import CHILD_SCHEMA
        from .canon import canonicalize_batch
        from .spill import spill_bucketed

        eligible, _ = self.trawl(now_us, trim=trim)
        if not eligible:
            return 0
        rows = [{"url": url, "priority": 0, "depth": 0,
                 "source_kind": "trawl",
                 "meta": _json.dumps({"refetchcontrol_trawled": True,
                                      "refetchcontrol_previous": nf})}
                for _key, url, nf in eligible]
        # trawled URLs are stored canonical; canonicalize_batch sees the
        # trawled flag and does not re-normalize (refetchcontrol.py:205-212)
        cand = canonicalize_batch(
            pa.Table.from_pylist(rows, schema=CHILD_SCHEMA))
        return spill_bucketed(cand, spill_dir, num_buckets)

    def new_wave(self) -> None:
        self._wave_committed.clear()

    # -- checkpoint -------------------------------------------------------
    def to_table(self) -> pa.Table:
        keys, urls, fetches, times = [], [], [], []
        for key, (url, nf, t_us) in self.ledger.items():
            keys.append(key)
            urls.append(url)
            fetches.append(nf)
            times.append(t_us)
        return pa.table({
            "key": pa.array(keys, type=pa.binary()),
            "url": pa.array(urls, type=pa.string()),
            "fetches": pa.array(fetches, type=pa.int32()),
            "time_us": pa.array(times, type=pa.int64()),
        })

    def restore_table(self, table: pa.Table) -> None:
        self.ledger = {}
        for row in table.to_pylist():
            self.ledger[row["key"]] = [row["url"], row["fetches"],
                                       row["time_us"]]
        self._rebuild_filters()

    def _rebuild_filters(self) -> None:
        self.bloom = BloomFilter(n_bits=self.bloom.n_bits)
        self.cuckoo = CuckooFilter(n_buckets=self.cuckoo.n_buckets)
        self._cuckoo_overflow = False
        if self.ledger:
            arr = keys_to_array(list(self.ledger))
            self.bloom.add(arr)
            if self.cuckoo.insert(arr) < len(arr):
                self._cuckoo_overflow = True

    def _snap_prefix(self, directory: str) -> str:
        return os.path.join(directory, f"seen-shard-{self.shard_id:04d}")

    def _delta_table(self) -> pa.Table:
        keys, urls, fetches, times = [], [], [], []
        for key in self._dirty:
            url, nf, t_us = self.ledger[key]
            keys.append(key)
            urls.append(url)
            fetches.append(nf)
            times.append(t_us)
        for key in self._tombstones:
            keys.append(key)
            urls.append("")
            fetches.append(-1)  # tombstone: delete on replay
            times.append(0)
        return pa.table({
            "key": pa.array(keys, type=pa.binary()),
            "url": pa.array(urls, type=pa.string()),
            "fetches": pa.array(fetches, type=pa.int32()),
            "time_us": pa.array(times, type=pa.int64()),
        })

    def snapshot(self, directory: str) -> str:
        """Incremental checkpoint: per-wave DELTA files (dirty upserts +
        trim tombstones — O(wave commits) bytes), compacted into a fresh
        full base every ``compact_every`` deltas. File names carry a
        sequence number; a base at seq S supersedes every delta with
        seq <= S, so a crash between base publish and delta GC replays
        only already-included idempotent upserts."""
        import glob as _glob
        os.makedirs(directory, exist_ok=True)
        prefix = self._snap_prefix(directory)
        bases = _glob.glob(prefix + "-base-*.parquet")
        if not bases or self._delta_count >= self.compact_every:
            path = f"{prefix}-base-{self._snap_seq:06d}.parquet"
            tmp = path + ".tmp"
            pq.write_table(self.to_table(), tmp)
            _fsync_file(tmp)
            os.replace(tmp, path)  # durable atomic publish
            _fsync_dir(directory)
            # GC superseded bases/deltas (correctness never depends on it)
            for p in _glob.glob(prefix + "-base-*.parquet"):
                if p != path:
                    os.remove(p)
            for p in _glob.glob(prefix + "-delta-*.parquet"):
                if _snap_seq_of(p) <= self._snap_seq:
                    os.remove(p)
            legacy = prefix + ".parquet"
            if os.path.exists(legacy):
                os.remove(legacy)
            self._delta_count = 0
        elif not self._dirty and not self._tombstones:
            return max(bases)  # nothing changed since the last snapshot
        else:
            path = f"{prefix}-delta-{self._snap_seq:06d}.parquet"
            tmp = path + ".tmp"
            pq.write_table(self._delta_table(), tmp)
            _fsync_file(tmp)
            os.replace(tmp, path)
            _fsync_dir(directory)
            self._delta_count += 1
        self._snap_seq += 1
        self._dirty.clear()
        self._tombstones.clear()
        return path

    def restore(self, directory: str) -> bool:
        """Load the newest base, then replay suffix deltas in sequence
        order (upserts overwrite, ``fetches=-1`` tombstones delete);
        filters are rebuilt once from the final ledger."""
        import glob as _glob
        prefix = self._snap_prefix(directory)
        bases = sorted(_glob.glob(prefix + "-base-*.parquet"))
        base_seq = -1
        if bases:
            base = bases[-1]
            base_seq = _snap_seq_of(base)
        elif os.path.exists(prefix + ".parquet"):
            base = prefix + ".parquet"  # legacy single-file snapshot
        else:
            return False
        self.ledger = {}
        for row in pq.read_table(base).to_pylist():
            self.ledger[row["key"]] = [row["url"], row["fetches"],
                                       row["time_us"]]
        max_seq = base_seq
        n_deltas = 0
        for dpath in sorted(_glob.glob(prefix + "-delta-*.parquet")):
            seq = _snap_seq_of(dpath)
            if seq <= base_seq:
                continue
            max_seq = max(max_seq, seq)
            n_deltas += 1
            for row in pq.read_table(dpath).to_pylist():
                if row["fetches"] < 0:
                    self.ledger.pop(row["key"], None)
                else:
                    self.ledger[row["key"]] = [row["url"], row["fetches"],
                                               row["time_us"]]
        self._rebuild_filters()
        self._snap_seq = max_seq + 1
        self._delta_count = n_deltas
        self._dirty.clear()
        self._tombstones.clear()
        return True

    def size(self) -> int:
        return len(self.ledger)

    def get_counters(self) -> dict[str, int]:
        return dict(self.counters)


# One actor per shard; num_cpus=0 so shards don't starve the data plane —
# probe calls are short dictionary lookups, not compute.
SeenShard = ray.remote(num_cpus=0)(SeenShardLogic)


class SeenSet:
    """Driver-side handle to the shard pool. Routes batched probes/commits
    by ``url_hash % num_shards`` (url_hash = first 8 bytes of the sha1 key,
    urlnorm.url_hash64 — routing and ledger identity always agree)."""

    def __init__(self, num_shards: int = 8, pool_name: str | None = None,
                 **shard_kwargs):
        import uuid

        self.num_shards = num_shards
        # unique pool id per SeenSet — a second pipeline in the same Ray
        # session must NOT silently reuse another pool's (stale) ledgers
        pool = pool_name or uuid.uuid4().hex[:8]
        self.shards = [
            SeenShard.options(name=f"seen-{pool}-{i}", get_if_exists=True)
            .remote(shard_id=i, **shard_kwargs)
            for i in range(num_shards)
        ]

    def _route(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes % np.uint64(self.num_shards)).astype(np.int64)

    def check(self, keys: list[bytes], hashes: np.ndarray, now_us: int,
              pass_flags: np.ndarray | None = None, dry: bool = False
              ) -> tuple[np.ndarray, np.ndarray]:
        """Batched gate across shards; preserves input order."""
        n = len(keys)
        allowed = np.zeros(n, dtype=bool)
        prev = np.zeros(n, dtype=np.int32)
        if n == 0:
            return allowed, prev
        shard_of = self._route(hashes)
        futures, idx_of = [], []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx) == 0:
                continue
            pf = (list(map(bool, pass_flags[idx]))
                  if pass_flags is not None else None)
            futures.append(self.shards[s].check.remote(
                [keys[i] for i in idx], now_us, pf, dry))
            idx_of.append(idx)
        for idx, (a, p) in zip(idx_of, ray.get(futures)):
            allowed[idx] = a
            prev[idx] = p
        return allowed, prev

    def commit(self, keys: list[bytes], urls: list[str],
               hashes: np.ndarray, now_us: int, wave: int = -1) -> int:
        shard_of = self._route(hashes)
        futures = []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx) == 0:
                continue
            futures.append(self.shards[s].commit.remote(
                [keys[i] for i in idx], [urls[i] for i in idx], now_us, wave))
        return sum(ray.get(futures)) if futures else 0

    def trawl(self, now_us: int, trim: bool = True) -> list[tuple[bytes, str, int]]:
        results = ray.get([s.trawl.remote(now_us, trim) for s in self.shards])
        out: list[tuple[bytes, str, int]] = []
        for eligible, _ in results:
            out.extend(eligible)
        return out

    def trawl_spill(self, now_us: int, spill_dir: str, num_buckets: int,
                    trim: bool = True) -> int:
        """Each shard spills its eligible set in parallel; the driver sees
        only the per-shard row counts."""
        return sum(ray.get([
            s.trawl_spill.remote(now_us, spill_dir, num_buckets, trim)
            for s in self.shards]))

    def new_wave(self) -> None:
        ray.get([s.new_wave.remote() for s in self.shards])

    def snapshot(self, directory: str) -> list[str]:
        return ray.get([s.snapshot.remote(directory) for s in self.shards])

    def restore(self, directory: str) -> int:
        return sum(ray.get([s.restore.remote(directory) for s in self.shards]))

    def counters(self) -> dict[str, int]:
        totals: dict[str, int] = {}
        for c in ray.get([s.get_counters.remote() for s in self.shards]):
            for k, v in c.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
