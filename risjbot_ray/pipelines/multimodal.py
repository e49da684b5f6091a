"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature stages as actor pools.

The container has no image/audio codecs, so the decode kernels are
deterministic STUBS (clearly marked); everything Ray-side — schema, batch
sizing for large binary rows, actor signature, output layout — is real and
tested. Swapping ``_decode_stub`` for a real codec (PIL/ffmpeg) is the
only change needed on a cluster with the libs installed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                               dtype=np.uint8).tobytes()
        rows.append({
            "media_id": i, "kind": kind, "payload": payload,
            "mime": {"image": "image/jpeg", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "width": int(rng.integers(64, 1920)) if kind != "audio" else None,
            "height": int(rng.integers(64, 1080)) if kind != "audio" else None,
            "duration_ms": (int(rng.integers(1000, 600000))
                            if kind != "image" else None),
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder: a real deployment replaces this with PIL/libav.
    Deterministic: derives a fixed-length feature vector from the payload
    bytes via blake2b expansion (so tests can assert exact values)."""
    h = hashlib.blake2b(payload, digest_size=32,
                        salt=kind[:8].encode().ljust(8, b"\0")).digest()
    return (np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0)


class MediaFeatures:
    """Actor-pool stage: decode + feature-extract per media row.

    Use with small ``batch_size`` — payload rows are MB-scale, so batch
    bytes (not row count) bound worker heap:
    ``map_batches(MediaFeatures, batch_size=16, concurrency=N)``."""

    def __init__(self, feature_dim: int = 32):
        self.feature_dim = feature_dim  # "model load" happens here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = [
            _decode_stub(p or b"", k)[: self.feature_dim].tolist()
            for p, k in zip(payloads, kinds)
        ]
        sizes = [len(p) if p else 0 for p in payloads]
        return pa.table({
            "media_id": ids,
            "kind": pa.array(kinds, pa.string()),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class FrameSampler:
    """Video frame-sampling plumbing: emits one row per sampled frame
    offset (real decode stubbed). Output explodes rows — the flat_map
    shape for video pipelines."""

    def __init__(self, every_ms: int = 10_000, max_frames: int = 8):
        self.every_ms = every_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_off, out_feat = [], [], []
        for row in batch.to_pylist():
            if row["kind"] != "video" or not row["duration_ms"]:
                continue
            offsets = range(0, row["duration_ms"], self.every_ms)
            for j, off in zip(range(self.max_frames), offsets):
                out_id.append(row["media_id"])
                out_off.append(off)
                out_feat.append(_decode_stub(
                    row["payload"] + off.to_bytes(4, "big"),
                    "frame").tolist())
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_ms": pa.array(out_off, pa.int32()),
            "features": pa.array(out_feat, pa.list_(pa.float32())),
        })


def media_features_ds(n: int = 300, seed: int = 42,
                      concurrency: int = 2):
    """End-to-end media pipeline over a synthesized table."""
    ds = ray.data.from_arrow(synth_media_table(n, seed))
    return ds.map_batches(MediaFeatures, batch_format="pyarrow",
                          batch_size=16, concurrency=concurrency)
