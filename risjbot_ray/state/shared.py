"""Cluster-shared storage root for every stateful on-disk layout.

Every layout that one task WRITES and another task (or the driver, or a
later run) READS — the IVF ANN index, the incremental tile-dedup
ledger, crawl spill/checkpoint dirs — must live on storage visible to
all workers AND the driver. On a single node any local path qualifies;
on a multi-node cluster a node-local path (e.g. ``/tmp``) silently
shards the layout per node: each node sees only its own fragment and a
reader gets a partial view with no error.

The contract here is the same one the tile ledger documents
(``pipelines/webtext.py``, "ledger_dir must live on storage visible to
every worker AND the driver"): set ``RISJBOT_SHARED_DIR`` to a path on
the cluster's shared filesystem (NFS/Lustre/FSx/...) when running
multi-node. The default is a local path — correct for the single-node
test/bench environment, WRONG for multi-node, which is why writers of
multi-file layouts must call :func:`verify_visible` after building so a
violated contract fails loudly instead of returning partial results.
"""

from __future__ import annotations

import os

_ENV = "RISJBOT_SHARED_DIR"


def shared_root() -> str:
    """The shared-storage root. ``$RISJBOT_SHARED_DIR`` when set (the
    multi-node requirement), else a single-node local default."""
    return os.environ.get(_ENV, "/tmp/risjbot_shared")


def shared_subdir(*parts: str) -> str:
    """``shared_root()/parts...``, created."""
    p = os.path.join(shared_root(), *parts)
    os.makedirs(p, exist_ok=True)
    return p


def verify_visible(expected_rows: int, actual_rows: int,
                   layout: str, path: str) -> None:
    """Fail LOUDLY when a distributed-written layout is partially
    visible — the signature of a node-local path on a multi-node
    cluster (each worker wrote to its own disk; the reader sees only
    the local fragment). Raises with the remediation instead of
    letting a partial index/ledger silently return wrong results."""
    if actual_rows != expected_rows:
        raise RuntimeError(
            f"{layout} at {path} is partially visible: manifest says "
            f"{expected_rows} rows, storage shows {actual_rows}. On a "
            f"multi-node cluster this means the path is node-local; "
            f"set ${_ENV} to a cluster-shared filesystem and rebuild.")
