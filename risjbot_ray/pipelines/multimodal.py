"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample as actor-pool stages.

Decode is REAL for formats whose wire layout needs no external codec
libraries — BMP, PPM/PGM, RIFF-PCM WAV, YUV4MPEG2 — via the pure-numpy
kernels in ``risjbot_ray.media.codecs`` (round-trip exactness pinned by
``tests/test_media_codecs.py``). Formats that genuinely need libjpeg /
libav (JPEG, MP4, ...) fall back to a clearly-marked deterministic STUB
feature so the pipeline shape stays total; the ``decoded`` output column
records which path a row took. Swapping the stub for PIL/libav is the
only change needed on a cluster with the libs installed.

Scale notes: payload rows are MB-scale, so stages bound worker heap by
batch BYTES — callers pass small ``batch_size`` (rows) to
``map_batches``; the feature vectors that leave the stage are 32 floats
per row, so the expensive bytes never ride a shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

from risjbot_ray.media import codecs

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 32


# ---------------------------------------------------------------------------
# synthetic corpus (real encoded payloads)
# ---------------------------------------------------------------------------

def _synth_image(rng: np.random.Generator) -> tuple[bytes, str, int, int]:
    h = int(rng.integers(16, 64))
    w = int(rng.integers(16, 64))
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy * 255 // max(h - 1, 1))[..., None]
            * np.array([1.0, 0.5, 0.25]))
    grad = (xx * 255 // max(w - 1, 1))[..., None] * 0.3
    noise = rng.integers(0, 32, size=(h, w, 3))
    img = np.clip(base + grad + noise, 0, 255).astype(np.uint8)
    if int(rng.integers(0, 2)):
        return codecs.encode_bmp(img), "image/bmp", w, h
    return codecs.encode_ppm(img), "image/x-portable-pixmap", w, h


def _synth_audio(rng: np.random.Generator) -> tuple[bytes, str, int]:
    sr = 8000
    dur_s = float(rng.uniform(0.05, 0.5))
    n = max(int(sr * dur_s), 16)
    t = np.arange(n) / sr
    freq = float(rng.uniform(100, 2000))
    sig = (0.6 * np.sin(2 * np.pi * freq * t)
           + 0.1 * rng.standard_normal(n)).astype(np.float32)
    sig = np.clip(sig, -1.0, 1.0)
    return (codecs.encode_wav(sig, sr), "audio/wav",
            int(round(n * 1000 / sr)))


def _synth_video(rng: np.random.Generator) -> tuple[bytes, str, int, int, int]:
    h = int(rng.integers(8, 16)) * 2
    w = int(rng.integers(8, 16)) * 2
    n_frames = int(rng.integers(3, 11))
    yy = np.mgrid[0:h, 0:w][0]
    frames = np.stack([
        np.clip(yy * 255 // max(h - 1, 1) + i * 12
                + rng.integers(0, 16, size=(h, w)), 0, 255)
        for i in range(n_frames)
    ]).astype(np.uint8)
    payload = codecs.encode_y4m(frames, fps_num=25, fps_den=1)
    return payload, "video/x-yuv4mpeg", w, h, n_frames * 40


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows with REAL encoded payloads (BMP/PPM
    images, PCM WAV audio, y4m video). Every 5th row carries an opaque
    payload under a codec-library mime (JPEG/MP4) to exercise the
    declared stub fallback path."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        width = height = duration_ms = None
        if i % 5 == 4:                      # undecodable: stub path
            payload = rng.integers(
                0, 256, size=int(rng.integers(256, 4096)),
                dtype=np.uint8).tobytes()
            mime = {"image": "image/jpeg", "audio": "audio/mpeg",
                    "video": "video/mp4"}[kind]
            if kind != "audio":
                width = int(rng.integers(64, 1920))
                height = int(rng.integers(64, 1080))
            if kind != "image":
                duration_ms = int(rng.integers(1000, 600000))
        elif kind == "image":
            payload, mime, width, height = _synth_image(rng)
        elif kind == "audio":
            payload, mime, duration_ms = _synth_audio(rng)
        else:
            payload, mime, width, height, duration_ms = _synth_video(rng)
        rows.append({
            "media_id": i, "kind": kind, "payload": payload,
            "mime": mime, "width": width, "height": height,
            "duration_ms": duration_ms,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# feature kernels (real decode)
# ---------------------------------------------------------------------------

def image_features(img: np.ndarray) -> np.ndarray:
    """32-dim image descriptor: mean RGB (3) + luma std (1) + 12-bin
    luma histogram + flattened 4x4 area-mean luma thumbnail (16) — the
    thumbnail doubles as a tiny perceptual fingerprint for near-dup
    grouping downstream."""
    f = np.empty(FEATURE_DIM, np.float32)
    rgb = img.astype(np.float32)
    luma = rgb @ np.float32([0.299, 0.587, 0.114])
    f[0:3] = rgb.reshape(-1, 3).mean(0) / 255.0
    f[3] = float(luma.std()) / 255.0
    hist = np.histogram(luma, bins=12, range=(0.0, 256.0))[0]
    f[4:16] = hist.astype(np.float32) / max(luma.size, 1)
    f[16:32] = codecs.thumbnail_mean(luma, 4, 4).ravel() / 255.0
    return f


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """32-dim audio descriptor: duration_s, RMS, zero-crossing rate,
    normalized spectral centroid, then 28 L1-normalized rFFT magnitude
    bands over the (first 8192 samples of the) mono mix."""
    f = np.zeros(FEATURE_DIM, np.float32)
    mono = samples.mean(axis=1)
    n = len(mono)
    f[0] = n / sample_rate
    if n == 0:
        return f
    f[1] = float(np.sqrt(np.mean(mono * mono)))
    f[2] = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono[:8192]))
    freqs = np.fft.rfftfreq(min(n, 8192), 1.0 / sample_rate)
    total = spec.sum()
    if total > 0:
        f[3] = float((spec * freqs).sum() / total / (sample_rate / 2))
        bands = np.array_split(spec, 28)
        f[4:32] = np.array([b.sum() for b in bands],
                           np.float32) / np.float32(total)
    return f


def frame_features(luma: np.ndarray) -> np.ndarray:
    """32-dim per-frame descriptor: mean, std, 14-bin histogram, 4x4
    area-mean thumbnail."""
    f = np.empty(FEATURE_DIM, np.float32)
    g = luma.astype(np.float32)
    f[0] = float(g.mean()) / 255.0
    f[1] = float(g.std()) / 255.0
    hist = np.histogram(g, bins=14, range=(0.0, 256.0))[0]
    f[2:16] = hist.astype(np.float32) / max(g.size, 1)
    f[16:32] = codecs.thumbnail_mean(g, 4, 4).ravel() / 255.0
    return f


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB for codec-library formats (JPEG/MP4/...): a real deployment
    replaces this with PIL/libav. Deterministic blake2b expansion so
    the fallback path is still exactly testable."""
    h = hashlib.blake2b(payload, digest_size=32,
                        salt=kind[:8].encode().ljust(8, b"\0")).digest()
    return (np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0)


def decode_features(payload: bytes, kind: str) -> tuple[
        np.ndarray, bool, int | None, int | None, int | None]:
    """(features, decoded, width, height, duration_ms) for one payload.

    Real decode when the payload sniffs as a supported codec; stub
    features (decoded=False, no derived metadata) otherwise.
    """
    codec = codecs.sniff(payload)
    if codec in ("bmp", "ppm", "pgm"):
        img = codecs.decode_image(payload)
        return (image_features(img), True,
                img.shape[1], img.shape[0], None)
    if codec == "wav":
        samples, sr = codecs.decode_wav(payload)
        return (audio_features(samples, sr), True, None, None,
                int(round(len(samples) * 1000 / sr)))
    if codec == "y4m":
        info = codecs.parse_y4m(payload)
        luma0 = codecs.y4m_frame_luma(payload, info, 0)
        return (frame_features(luma0), True,
                info.width, info.height, info.duration_ms)
    return _decode_stub(payload, kind), False, None, None, None


class MediaFeatures:
    """Actor-pool stage: decode + feature-extract per media row.

    Use with small ``batch_size`` — payload rows are MB-scale, so batch
    bytes (not row count) bound worker heap:
    ``map_batches(MediaFeatures, batch_size=16, concurrency=N)``."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim  # "model load" happens here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, decs, ws, hs, durs = [], [], [], [], []
        for p, k in zip(payloads, kinds):
            f, dec, w, h, dur = decode_features(p or b"", k)
            feats.append(f[: self.feature_dim].tolist())
            decs.append(dec)
            ws.append(w)
            hs.append(h)
            durs.append(dur)
        sizes = [len(p) if p else 0 for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": pa.array(kinds, pa.string()),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "decoded": pa.array(decs, pa.bool_()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class FrameSampler:
    """Video frame sampling: one output row per sampled frame offset.

    y4m payloads are sampled for REAL — O(1) seeks to each target
    frame's luma plane (no full-stream scan), then per-frame features.
    Codec-library containers (MP4 ...) keep the declared stub path,
    deriving offsets from the metadata ``duration_ms``. Output explodes
    rows — the flat_map shape for video pipelines."""

    def __init__(self, every_ms: int = 10_000, max_frames: int = 8):
        self.every_ms = every_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_off, out_dec, out_feat = [], [], [], []
        for row in batch.to_pylist():
            if row["kind"] != "video":
                continue
            payload = row["payload"] or b""
            if codecs.sniff(payload) == "y4m":
                info = codecs.parse_y4m(payload)
                for j in range(self.max_frames):
                    off = j * self.every_ms
                    if off >= max(info.duration_ms, 1) and j > 0:
                        break
                    idx = min(int(off * info.fps_num
                                  / (1000 * info.fps_den)),
                              info.n_frames - 1)
                    luma = codecs.y4m_frame_luma(payload, info, idx)
                    out_id.append(row["media_id"])
                    out_off.append(off)
                    out_dec.append(True)
                    out_feat.append(frame_features(luma).tolist())
            elif row["duration_ms"]:
                offsets = range(0, row["duration_ms"], self.every_ms)
                for j, off in zip(range(self.max_frames), offsets):
                    out_id.append(row["media_id"])
                    out_off.append(off)
                    out_dec.append(False)
                    out_feat.append(_decode_stub(
                        payload + off.to_bytes(4, "big"),
                        "frame").tolist())
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_ms": pa.array(out_off, pa.int32()),
            "decoded": pa.array(out_dec, pa.bool_()),
            "features": pa.array(out_feat, pa.list_(pa.float32())),
        })


def media_features_ds(n: int = 300, seed: int = 42,
                      concurrency: int = 2):
    """End-to-end media pipeline over a synthesized table."""
    ds = ray.data.from_arrow(synth_media_table(n, seed))
    return ds.map_batches(MediaFeatures, batch_format="pyarrow",
                          batch_size=16, concurrency=concurrency)
