"""Per-wave checkpointing with partition lineage + metrics.

Replaces the reference's end-of-run sqlite + S3 sync
(extensions/dotscrapy.py:34-55; refetchcontrol.py:90-129) with per-wave
atomic snapshots (north rule: "resumable from checkpoint with
per-partition lineage + metrics"):

checkpoint_dir/
  seen/seen-shard-XXXX.parquet      # one ledger snapshot per shard actor
  frontier-wave-KKKK.parquet        # the NEXT wave's input frontier
  wave-KKKK.json                    # manifest: counters, row lineage
  LATEST                            # last complete wave id (atomic rename)

A run resumes by reading LATEST, restoring shard ledgers, and continuing
from the recorded next-wave frontier; completed waves' outputs are laid
out as out_dir/wave=K/ so finished partitions are skipped.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_dir(path: str) -> None:
    """Durable rename needs the DIRECTORY entry synced too."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:        # non-POSIX fs: rename-atomicity still holds
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class CheckpointManager:
    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        os.makedirs(os.path.join(directory, "seen"), exist_ok=True)

    @property
    def seen_dir(self) -> str:
        return os.path.join(self.dir, "seen")

    def frontier_path(self, wave: int) -> str:
        return os.path.join(self.dir, f"frontier-wave-{wave:04d}.parquet")

    def write_frontier(self, wave: int, table: pa.Table) -> str:
        path = self.frontier_path(wave)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        _fsync_file(tmp)
        os.replace(tmp, path)
        _fsync_dir(self.dir)
        return path

    def read_frontier(self, wave: int) -> pa.Table | None:
        path = self.frontier_path(wave)
        return pq.read_table(path) if os.path.exists(path) else None

    def commit_wave(self, wave: int, manifest: dict) -> None:
        """Publish the wave manifest then advance LATEST (atomic rename
        order with data fsynced BEFORE each rename: a crash — including
        power loss, which plain os.replace alone does not cover because
        the rename can be journaled before the data blocks land — leaves
        a replayable, never a corrupt, state)."""
        mpath = os.path.join(self.dir, f"wave-{wave:04d}.json")
        self._write_json_durable(mpath, manifest)
        ltmp = os.path.join(self.dir, "LATEST.tmp")
        with open(ltmp, "w") as f:
            f.write(str(wave))
            f.flush()
            os.fsync(f.fileno())
        os.replace(ltmp, os.path.join(self.dir, "LATEST"))
        _fsync_dir(self.dir)

    def _write_json_durable(self, path: str, payload: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        _fsync_dir(os.path.dirname(path))

    def commit_wave_suffixed(self, wave: int, suffix: str,
                             manifest: dict) -> None:
        """Secondary manifest for an extra frontier piece processed in the
        same wave index (does not advance LATEST)."""
        mpath = os.path.join(self.dir, f"wave-{wave:04d}{suffix}.json")
        self._write_json_durable(mpath, manifest)

    def latest_wave(self) -> int | None:
        path = os.path.join(self.dir, "LATEST")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return int(f.read().strip())

    def read_manifest(self, wave: int) -> dict | None:
        path = os.path.join(self.dir, f"wave-{wave:04d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
