"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample as actor-pool stages.

Decode is REAL for formats whose wire layout needs no external codec
libraries — BMP, PPM/PGM, RIFF-PCM WAV, YUV4MPEG2 — via the pure-numpy
kernels in ``risjbot_ray.media.codecs`` (round-trip exactness pinned by
``tests/test_media_codecs.py``) — including a pure-numpy baseline
JPEG codec, Sun AU PCM, and MJPEG streams, so the whole synthetic
corpus decodes for real. Payloads this module cannot decode (corrupt
streams, true container formats like MP4) fall back to a
clearly-marked deterministic STUB
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

from risjbot_ray.functions.hamming import band_run_pairs
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

def _synth_image(rng: np.random.Generator,
                 jpeg: bool = False) -> tuple[bytes, str, int, int]:
    h = int(rng.integers(16, 64))
    w = int(rng.integers(16, 64))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # per-image random sinusoidal texture: random orientation, spatial
    # frequency and phase per channel, so the corpus is perceptually
    # DIVERSE (distinct images land far apart in aHash space — the
    # near-dup self-checks rely on non-planted pairs being rare)
    img = np.empty((h, w, 3))
    for c in range(3):
        fy, fx = rng.uniform(0.5, 4.0, 2)
        phase = rng.uniform(0, 2 * np.pi)
        img[:, :, c] = 127 + 80 * np.sin(
            2 * np.pi * (fy * yy / h + fx * xx / w) + phase)
    # a random 8x8 block pattern per image dominates the aHash grid,
    # so distinct images are far apart in hash space (smooth sinusoids
    # alone cluster into a handful of coarse sign patterns)
    coarse = rng.integers(-60, 61, size=(8, 8)).astype(np.float64)
    img += codecs.resize_nearest(coarse, h, w)[:, :, None]
    img += rng.integers(0, 32, size=(h, w, 3))
    img = np.clip(img, 0, 255).astype(np.uint8)
    if jpeg:
        return codecs.encode_jpeg(img), "image/jpeg", w, h
    if int(rng.integers(0, 2)):
        return codecs.encode_bmp(img), "image/bmp", w, h
    return codecs.encode_ppm(img), "image/x-portable-pixmap", w, h


def _synth_audio(rng: np.random.Generator,
                 au: bool = False) -> tuple[bytes, str, int]:
    sr = 8000
    dur_s = float(rng.uniform(0.05, 0.5))
    n = max(int(sr * dur_s), 16)
    t = np.arange(n) / sr
    # 2-4 tones, each gated by a random 8-segment on/off envelope, so
    # distinct clips land far apart in the 8x8 time-frequency
    # fingerprint grid (a single steady sine gives every clip nearly
    # the same one-hot-band grid)
    sig = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        freq = float(rng.uniform(100, 3500))
        env = rng.random(8).round()          # per-segment gate
        env_t = env[np.minimum((np.arange(n) * 8) // max(n, 1), 7)]
        sig += 0.3 * env_t * np.sin(2 * np.pi * freq * t)
    sig = np.clip(sig + 0.05 * rng.standard_normal(n),
                  -1.0, 1.0).astype(np.float32)
    if au:
        return (codecs.encode_au(sig, sr), "audio/basic",
                int(round(n * 1000 / sr)))
    return (codecs.encode_wav(sig, sr), "audio/wav",
            int(round(n * 1000 / sr)))


def _synth_video(rng: np.random.Generator) -> tuple[bytes, str, int, int, int]:
    h = int(rng.integers(8, 16)) * 2
    w = int(rng.integers(8, 16)) * 2
    n_frames = int(rng.integers(3, 11))
    yy = np.mgrid[0:h, 0:w][0]
    # per-FRAME random block identity (same reason as _synth_image:
    # keep distinct videos far apart in hash space) — varying it
    # frame-to-frame gives each clip real temporal structure, so the
    # temporal fingerprint has full entropy; the i*12 ramp adds a
    # global brightness drift on top
    frames = np.stack([
        np.clip(yy * 160 // max(h - 1, 1) + 50 + i * 12
                + codecs.resize_nearest(
                    rng.integers(-100, 101, size=(8, 8)).astype(np.int64),
                    h, w)
                + rng.integers(0, 16, size=(h, w)), 0, 255)
        for i in range(n_frames)
    ]).astype(np.uint8)
    payload = codecs.encode_y4m(frames, fps_num=25, fps_den=1)
    return payload, "video/x-yuv4mpeg", w, h, n_frames * 40


#: MJPEG carries no container timing; frame offsets and durations use
#: this declared fps convention on both the synth and decode sides
MJPEG_FPS = 25


def _synth_video_mjpeg(rng: np.random.Generator
                       ) -> tuple[bytes, str, int, int, int]:
    """A REAL motion-JPEG clip: concatenated baseline JPEG frames
    (same texture model as :func:`_synth_video`)."""
    h = int(rng.integers(8, 16)) * 2
    w = int(rng.integers(8, 16)) * 2
    n_frames = int(rng.integers(2, 6))
    yy = np.mgrid[0:h, 0:w][0]
    parts = []
    for i in range(n_frames):
        luma = np.clip(
            yy * 160 // max(h - 1, 1) + 50 + i * 12
            + codecs.resize_nearest(
                rng.integers(-100, 101, size=(8, 8)).astype(np.int64),
                h, w)
            + rng.integers(0, 16, size=(h, w)), 0, 255).astype(np.uint8)
        parts.append(codecs.encode_jpeg(
            np.repeat(luma[:, :, None], 3, axis=2)))
    return (b"".join(parts), "video/x-motion-jpeg", w, h,
            n_frames * 1000 // MJPEG_FPS)


def synth_media_rows(ids, seed: int = 42) -> pa.Table:
    """Deterministic media rows for the given ids, with REAL encoded
    payloads for EVERY row: BMP/PPM/JPEG images, PCM WAV / Sun AU
    audio, y4m / motion-JPEG video. Every 5th row exercises the
    codec-library formats (baseline JPEG, AU, MJPEG) through the
    pure-numpy implementations; the declared stub fallback keeps its
    coverage via corrupt-payload unit tests.

    Each row is seeded by (seed, media_id) so generation is
    embarrassingly parallel — `testsupport/mediagen.py` fans this out
    over ``ray.data.range(n)`` to build bench-scale parquet corpora
    that are row-for-row identical to the driver-side table."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in ids:
        i = int(i)
        rng = np.random.default_rng((seed, i))
        kind = kinds[i % 3]
        width = height = duration_ms = None
        if i % 5 == 4:          # codec-library formats — now REAL too
            # (baseline JPEG / Sun AU / MJPEG, all decoded by the
            # pure-numpy codecs; the declared stub path keeps its own
            # coverage via corrupt-payload unit tests)
            if kind == "image":
                payload, mime, width, height = _synth_image(rng,
                                                            jpeg=True)
            elif kind == "audio":
                payload, mime, duration_ms = _synth_audio(rng, au=True)
            else:
                (payload, mime, width, height,
                 duration_ms) = _synth_video_mjpeg(rng)
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


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Driver-side convenience wrapper over ``synth_media_rows``."""
    return synth_media_rows(range(n), seed)


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


def _rgb_luma(img: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 -> HxW uint8 BT.601 luma (the y4m frame analogue)."""
    f = img.astype(np.float64)
    return np.clip(np.round(0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
                            + 0.114 * f[:, :, 2]), 0, 255) \
        .astype(np.uint8)


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
    try:
        if codec == "jpeg" and kind == "video":
            # motion-JPEG: concatenated baseline JPEGs; duration from
            # the declared MJPEG_FPS convention (no container timing)
            offs = codecs.mjpeg_frame_offsets(payload)
            if not offs:
                raise ValueError("MJPEG stream with no frames")
            frame0 = codecs.mjpeg_frame(payload, offs, 0)
            return (frame_features(_rgb_luma(frame0)), True,
                    frame0.shape[1], frame0.shape[0],
                    len(offs) * 1000 // MJPEG_FPS)
        if codec in ("bmp", "ppm", "pgm", "jpeg"):
            img = codecs.decode_image(payload)
            return (image_features(img), True,
                    img.shape[1], img.shape[0], None)
        if codec == "wav":
            samples, sr = codecs.decode_wav(payload)
            return (audio_features(samples, sr), True, None, None,
                    int(round(len(samples) * 1000 / sr)))
        if codec == "au":
            samples, sr = codecs.decode_au(payload)
            return (audio_features(samples, sr), True, None, None,
                    int(round(len(samples) * 1000 / sr)))
        if codec == "y4m":
            info = codecs.parse_y4m(payload)
            luma0 = codecs.y4m_frame_luma(payload, info, 0)
            return (frame_features(luma0), True,
                    info.width, info.height, info.duration_ms)
    except (ValueError, ZeroDivisionError):
        # sniffed-but-corrupt payload (truncated pixel array, zero
        # sample rate, ...): the STAGE contract is decoded=False
        # pass-through, never a task-killing exception
        pass
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


class MediaResize:
    """Actor-pool stage: decode -> resize -> re-encode still images.

    Real work end-to-end for decodable payloads (BMP/PPM/PGM in, BMP
    out): nearest-neighbor for upscale, area-mean for downscale (the
    anti-aliased reduction a thumbnail needs). Non-image or
    codec-library payloads pass through with ``resized=False`` and a
    null output payload — the stage never drops rows, so it composes
    with downstream joins on media_id. Output payloads are the only
    bytes that leave; inputs stay inside the map."""

    def __init__(self, out_h: int = 64, out_w: int = 64):
        self.out_h = out_h
        self.out_w = out_w

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        if h <= self.out_h and w <= self.out_w:
            return codecs.resize_nearest(img, self.out_h, self.out_w)
        planes = [codecs.thumbnail_mean(img[:, :, c],
                                        self.out_h, self.out_w)
                  for c in range(3)]
        return np.clip(np.stack(planes, axis=2).round(),
                       0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        # kind-gate when the column rides along: an MJPEG VIDEO stream
        # sniffs as jpeg (it IS concatenated JPEGs), and resizing its
        # first frame as if it were a still image would be wrong
        kinds = (batch.column("kind").to_pylist()
                 if "kind" in batch.column_names
                 else ["image"] * len(ids))
        out_p, out_ok = [], []
        for p, kind in zip(payloads, kinds):
            img = None
            if kind == "image":
                try:
                    img = codecs.decode_image(p or b"")
                except ValueError:      # sniffed-but-corrupt payload
                    img = None
            if img is None:
                out_p.append(None)
                out_ok.append(False)
            else:
                out_p.append(codecs.encode_bmp(self._resize(img)))
                out_ok.append(True)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "resized": pa.array(out_ok, pa.bool_()),
            "payload": pa.array(out_p, pa.binary()),
            "width": pa.array(
                [self.out_w if ok else None for ok in out_ok],
                pa.int32()),
            "height": pa.array(
                [self.out_h if ok else None for ok in out_ok],
                pa.int32()),
        })


def media_resize_ds(n: int = 300, seed: int = 42, out_h: int = 64,
                    out_w: int = 64, concurrency=None,
                    path: str | None = None, batch_size: int = 16):
    """Decode -> resize -> re-encode pipeline over a media corpus."""
    ds = _media_source(n, seed, path, ["media_id", "kind", "payload"])
    if concurrency is None:
        concurrency = media_pool_size()
    return ds.map_batches(MediaResize,
                          fn_constructor_args=(out_h, out_w),
                          batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency)


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
            sampled_real = False
            if codecs.sniff(payload) == "jpeg":
                frames_mj: list[tuple[int, list]] = []
                try:
                    offs = codecs.mjpeg_frame_offsets(payload)
                    if not offs:
                        raise ValueError("MJPEG with no frames")
                    dur = len(offs) * 1000 // MJPEG_FPS
                    for j in range(self.max_frames):
                        off = j * self.every_ms
                        if off >= max(dur, 1) and j > 0:
                            break
                        idx = min(off * MJPEG_FPS // 1000,
                                  len(offs) - 1)
                        luma = _rgb_luma(codecs.mjpeg_frame(
                            payload, offs, idx))
                        frames_mj.append(
                            (off, frame_features(luma).tolist()))
                    sampled_real = True
                except (ValueError, ZeroDivisionError, IndexError):
                    pass
                if sampled_real:
                    for off, feat in frames_mj:
                        out_id.append(row["media_id"])
                        out_off.append(off)
                        out_dec.append(True)
                        out_feat.append(feat)
            if not sampled_real and codecs.sniff(payload) == "y4m":
                frames: list[tuple[int, list]] = []
                try:
                    info = codecs.parse_y4m(payload)
                    if info.n_frames < 1:
                        raise ValueError("y4m header with no frames")
                    for j in range(self.max_frames):
                        off = j * self.every_ms
                        if off >= max(info.duration_ms, 1) and j > 0:
                            break
                        idx = min(int(off * info.fps_num
                                      / (1000 * info.fps_den)),
                                  info.n_frames - 1)
                        luma = codecs.y4m_frame_luma(payload, info,
                                                     idx)
                        frames.append(
                            (off, frame_features(luma).tolist()))
                    sampled_real = True
                except (ValueError, ZeroDivisionError):
                    # corrupt/frameless/zero-fps (F0:1 headers parse
                    # fine but divide by zero here): fall to stub path
                    pass
                if sampled_real:        # commit only complete decodes
                    for off, feat in frames:
                        out_id.append(row["media_id"])
                        out_off.append(off)
                        out_dec.append(True)
                        out_feat.append(feat)
            if not sampled_real and row["duration_ms"]:
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


def _media_source(n: int, seed: int, path: str | None,
                  columns: list[str] | None = None):
    """Media Dataset: a parquet corpus when ``path`` is given (the
    at-scale shape — payload bytes stream from storage in small blocks,
    never through the driver, and only the stage's ``columns`` leave
    the row groups), else the tiny driver-side synth table the 300-row
    self-checks use."""
    if path is not None:
        return ray.data.read_parquet(path, columns=columns)
    tbl = synth_media_table(n, seed)
    return ray.data.from_arrow(tbl.select(columns) if columns else tbl)


def media_pool_size() -> "int | tuple[int, int]":
    """Actor-pool sizing for the decode stages: 3/4 of the cluster's
    CPUs, always leaving >= 2 CPUs for the upstream read tasks (a
    fixed pool acquires every actor up front; a pool as large as the
    cluster starves the producer). Measured on the 100k-row bench
    corpus at 32 CPUs: fixed 24 = 3.2 s vs fixed 30 = 6.8 s (producer
    starvation) vs autoscaling (1, 24) = 12.4 s (spawn latency
    dominates a short stage). On a 1-3 CPU cluster the fixed shape
    can't leave a free CPU, so fall back to an AUTOSCALING (1, 2)
    pool — it releases actors between waves instead of pinning the
    only CPU (the same small-cluster guard _gate_pool_size has)."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if cpus < 4:
        return (1, 2)
    return max(1, min(3 * cpus // 4, cpus - 2))


def media_features_ds(n: int = 300, seed: int = 42,
                      concurrency=None, path: str | None = None,
                      batch_size: int = 16):
    """End-to-end media decode + feature pipeline.

    ``batch_size`` trades scheduling overhead against per-batch heap:
    16 (default) suits MB-scale payloads; raise it toward ~64 MB of
    payload per batch for small-object corpora (KB-scale thumbnails /
    clips) so the actor pool isn't task-launch-bound. ``concurrency``
    defaults to a FIXED pool of ``media_pool_size()`` actors."""
    ds = _media_source(n, seed, path, ["media_id", "kind", "payload"])
    if concurrency is None:
        concurrency = media_pool_size()
    return ds.map_batches(MediaFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# perceptual near-dup over decoded pixels (aHash + banded pigeonhole)
# ---------------------------------------------------------------------------

_PAIR_DEDUP_CUTOFF = 2_000_000   # single-block pair dedup below this


def _dedup_pairs_min(df):
    """Vectorized (a, b) dedup keeping the minimum hamming — the
    single-block fast path for bounded pair sets."""
    import pandas as pd
    if not len(df):
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    a = df["a"].to_numpy()
    b = df["b"].to_numpy()
    h = df["hamming"].to_numpy()
    order = np.lexsort((h, b, a))
    a, b, h = a[order], b[order], h[order]
    first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return pd.DataFrame({"a": pd.Series(a[first], dtype="int64"),
                         "b": pd.Series(b[first], dtype="int64"),
                         "hamming": pd.Series(h[first], dtype="int64")})


def ahash64(luma: np.ndarray) -> int:
    """64-bit average-hash of an HxW luma plane: 8x8 area-mean
    thumbnail, one bit per cell (cell > thumbnail mean). Invariant to
    global brightness shifts (both sides of the strict compare move
    together) and to lossless re-encoding (BMP vs PPM of the same
    pixels hash identically), which is exactly what makes it a
    near-dup key."""
    thumb = codecs.thumbnail_mean(luma, 8, 8)
    bits = (thumb > thumb.mean()).ravel()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def audio_fingerprint64(samples: np.ndarray, sr: int) -> int:
    """64-bit audio fingerprint: an 8x8 time-frequency energy grid
    (8 equal time segments x 8 log-spaced rFFT bands), one bit per
    cell (cell energy > grid median). Invariant to volume scaling
    (every energy scales together, so comparisons to the median are
    unchanged) and stable under mild additive noise — the audio
    counterpart of ``ahash64``."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n < 16:
        return 0
    seg_len = n // 8
    grid = np.zeros((8, 8), np.float64)
    for t in range(8):
        seg = mono[t * seg_len:(t + 1) * seg_len]
        spec = np.abs(np.fft.rfft(seg))[1:]  # drop DC: tracks offset
        m = len(spec)
        if m == 0:
            continue
        # log-spaced band start indices over the segment spectrum
        # (duplicates collapse for short segments -> fewer bands)
        starts = np.unique(np.clip(
            np.geomspace(1, m, num=9)[:-1].astype(int) - 1, 0, m - 1))
        bands = np.add.reduceat(spec * spec, starts)
        grid[t, :min(8, len(bands))] = bands[:8]
    bits = (grid > np.median(grid)).ravel()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def video_fingerprint64(payload: bytes) -> int | None:
    """64-bit TEMPORAL video fingerprint over a y4m payload: 8 evenly
    sampled frames x 8 difference bits (2x5 area-mean luma grid,
    cell[r,c] > cell[r,c+1] -> 2 rows x 4 horizontal comparisons).
    Difference bits are exactly brightness-shift invariant and —
    unlike a median/mean threshold — immune to global gradients
    (sky-on-top composition) that would otherwise collapse a whole
    corpus onto one hash; even sampling makes the hash track the
    clip's temporal structure, which the frame-0-only 'visual'
    modality cannot see. Frames are fetched by O(1) seek (y4m) or by
    frame offset (MJPEG), so cost is 8 frames regardless of clip
    length. Returns None for non-video payloads."""
    sniffed = codecs.sniff(payload)
    bits = np.empty(64, bool)
    if sniffed == "y4m":
        info = codecs.parse_y4m(payload)
        for k in range(8):
            idx = (k * info.n_frames) // 8
            luma = codecs.y4m_frame_luma(payload, info, idx)
            cells = codecs.thumbnail_mean(luma, 2, 5)
            bits[k * 8:(k + 1) * 8] = (cells[:, :-1]
                                       > cells[:, 1:]).ravel()
        return int.from_bytes(np.packbits(bits).tobytes(), "big")
    if sniffed == "jpeg":
        offs = codecs.mjpeg_frame_offsets(payload)
        if not offs:
            return None
        for k in range(8):
            idx = (k * len(offs)) // 8
            luma = _rgb_luma(codecs.mjpeg_frame(payload, offs, idx))
            cells = codecs.thumbnail_mean(luma.astype(np.float64), 2, 5)
            bits[k * 8:(k + 1) * 8] = (cells[:, :-1]
                                       > cells[:, 1:]).ravel()
        return int.from_bytes(np.packbits(bits).tobytes(), "big")
    return None


def _payload_luma(payload: bytes) -> np.ndarray | None:
    """Luma plane a perceptual hash can be computed from: decoded
    pixels for stills (incl. baseline JPEG), frame 0 for y4m/MJPEG
    video, None for audio and sniffed-but-corrupt payloads (those
    rows are excluded from hashing, per the stage contract)."""
    kind = codecs.sniff(payload)
    try:
        if kind in ("bmp", "ppm", "pgm"):
            img = codecs.decode_image(payload)
            return (img.astype(np.float32)
                    @ np.float32([0.299, 0.587, 0.114]))
        if kind == "jpeg":
            # a lone baseline JPEG decodes directly; an MJPEG stream's
            # leading frame decodes the same way (trailing frames are
            # simply not part of the first scan)
            img = codecs.decode_jpeg(payload)
            return (img.astype(np.float32)
                    @ np.float32([0.299, 0.587, 0.114]))
        if kind == "y4m":
            info = codecs.parse_y4m(payload)
            if info.n_frames < 1:
                return None
            return codecs.y4m_frame_luma(payload, info, 0)
    except ValueError:
        return None
    return None


class MediaPHash:
    """Actor-pool stage: payload -> 64-bit perceptual hash of one
    modality ('visual': aHash of decoded pixels / y4m frame 0;
    'audio': time-frequency fingerprint of decoded WAV; 'video':
    temporal 8-frame fingerprint of y4m clips). Rows outside the
    modality, or whose payload cannot be decoded, are dropped here
    (never ride the shuffle); only (media_id, phash) leaves the stage
    — the MB-scale payload bytes stay inside the map. Modalities are
    kept in separate pair spaces on purpose: a visual hash landing
    within hamming-3 of an audio hash would be a meaningless pair."""

    def __init__(self, modality: str = "visual"):
        if modality not in ("visual", "audio", "video"):
            raise ValueError(f"unknown modality {modality!r}")
        self.modality = modality

    def _hash(self, payload: bytes) -> int | None:
        # every modality drops corrupt payloads (None) instead of
        # letting a decode ValueError kill the task — the audio/video
        # decoders raise on truncated/float-PCM/parameterized inputs a
        # real crawl does contain, same contract as _payload_luma
        try:
            if self.modality == "visual":
                luma = _payload_luma(payload)
                return None if luma is None else ahash64(luma)
            if self.modality == "video":
                return video_fingerprint64(payload)
            sniffed = codecs.sniff(payload)
            if sniffed == "wav":
                samples, sr = codecs.decode_wav(payload)
            elif sniffed == "au":
                samples, sr = codecs.decode_au(payload)
            else:
                return None
            return audio_fingerprint64(samples, sr)
        except (ValueError, ZeroDivisionError):
            return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_h = [], []
        for mid, p in zip(ids, payloads):
            h = self._hash(p or b"")
            if h is None:
                continue
            out_id.append(mid)
            # store as signed int64 (Arrow has no uint64 arithmetic
            # downstream); the bit pattern is what matters
            out_h.append(np.uint64(h).astype(np.int64))
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "phash": pa.array(out_h, pa.int64())})


def media_phash_pairs(n: int = 300, seed: int = 42,
                      max_hamming: int = 3, bands: int = 4,
                      table: pa.Table | None = None,
                      path: str | None = None,
                      batch_size: int = 64,
                      modality: str = "visual",
                      concurrency=None):
    """Near-duplicate media pairs within Hamming<=max_hamming of their
    perceptual hashes, via banded pigeonhole bucketing + exact popcount
    verify — the same scale shape as ``dedup.simhash_near_pairs``: a
    pair within distance d < ``bands`` shares at least one exact
    (64/bands)-bit band, so recall is 1.0 for d <= bands-1; only
    (media_id, band, key, phash) rows — never pixels — enter the
    exchange, and the groupby key is the small band id with vectorized
    per-bucket work inside."""
    import pandas as pd

    if max_hamming >= bands:
        raise ValueError("pigeonhole recall needs max_hamming < bands")
    band_bits = 64 // bands
    mask = np.uint64((1 << band_bits) - 1)

    src = (ray.data.from_arrow(table.select(["media_id", "payload"]))
           if table is not None
           else _media_source(n, seed, path, ["media_id", "payload"]))
    if concurrency is None:
        concurrency = media_pool_size()
    sigs = src.map_batches(MediaPHash,
                           fn_constructor_args=(modality,),
                           batch_format="pyarrow",
                           batch_size=batch_size,
                           concurrency=concurrency)

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("media_id").to_pylist(), np.int64)
        ph = np.asarray(batch.column("phash").to_pylist(),
                        np.int64).astype(np.uint64)
        n_rows = len(ids)
        out_id = np.repeat(ids, bands)
        out_band = np.tile(np.arange(bands, dtype=np.int32), n_rows)
        shifts = np.tile(np.arange(bands, dtype=np.uint64) *
                         np.uint64(band_bits), n_rows)
        out_key = ((np.repeat(ph, bands) >> shifts) & mask)
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key.astype(np.int64), pa.int64()),
            "phash": pa.array(np.repeat(ph, bands).astype(np.int64),
                              pa.int64()),
        })

    def pairs(group) -> "pd.DataFrame":
        # one band per group: vectorized run-length bucket pairing +
        # SWAR popcount, with exact recursive pigeonhole sub-banding
        # for HOT buckets (shared kernel; see functions/hamming.py)
        band_id = int(group["band"].iloc[0]) if len(group) else 0
        a, b, h = band_run_pairs(
            group["media_id"].to_numpy().astype(np.int64),
            group["key"].to_numpy().astype(np.int64),
            group["phash"].to_numpy().astype(np.int64)
            .astype(np.uint64),
            max_hamming, int(mask) << (band_id * band_bits))
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64"),
                             "hamming": pd.Series(h, dtype="int64")})

    from risjbot_ray.pipelines.webtext import _coalesce_for_exchange

    # coalesce before the band exchange: the explode leaves one sub-MB
    # block per upstream read task, and a sort's map x reduce fan-out
    # is quadratic in block count (the fragmented shape cost ~25 s of
    # pure scheduling/split overhead at 100k items; coalesced it's
    # ~1 s). ``bands`` output groups also caps map_groups invocations.
    exploded = _coalesce_for_exchange(
        sigs.map_batches(explode, batch_format="pyarrow"),
        floor_blocks=bands)
    p = (exploded.groupby("band")
         .map_groups(pairs, batch_format="pandas")
         .materialize())

    # cross-band dedup (keep min hamming per pair). The verified pair
    # set is output-bounded and tiny next to the corpus; below the
    # cutoff a single-block vectorized dedup avoids a full groupby
    # exchange (which costs ~5 s of pure scheduling on a kilorow
    # result); above it, fall back to the distributed aggregate.
    if p.count() <= _PAIR_DEDUP_CUTOFF:
        return (p.repartition(1)
                .map_batches(_dedup_pairs_min, batch_format="pandas"))
    from ray.data.aggregate import Min
    return _coalesce_for_exchange(p).groupby(["a", "b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def synth_media_with_neardups(n: int = 300, seed: int = 42,
                              n_planted: int = 40) -> tuple[
                                  pa.Table, list[tuple[int, int]]]:
    """Base synth corpus + ``n_planted`` planted near-duplicate rows
    (ids n, n+1, ...), each a perceptual variant of a decodable base
    row: lossless format re-encode (hamming 0 by construction),
    global brightness shift (hamming 0 unless clipping bites), or mild
    seeded pixel noise (small hamming). Returns (table, planted pairs
    as (base_id, dup_id))."""
    rng = np.random.default_rng(seed + 1)
    base = synth_media_table(n, seed)
    rows = base.to_pylist()
    decodable = [r for r in rows
                 if codecs.sniff(r["payload"]) in ("bmp", "ppm")]
    planted: list[tuple[int, int]] = []
    extra = []
    for j in range(n_planted):
        src = decodable[int(rng.integers(0, len(decodable)))]
        img = codecs.decode_image(src["payload"])
        mode = j % 3
        if mode == 0:                       # lossless re-encode
            var = img
            payload = (codecs.encode_ppm(var)
                       if src["mime"] == "image/bmp"
                       else codecs.encode_bmp(var))
        elif mode == 1:                     # brightness shift
            var = np.clip(img.astype(np.int16) + 12,
                          0, 255).astype(np.uint8)
            payload = codecs.encode_bmp(var)
        else:                               # mild noise
            noise = rng.integers(-6, 7, size=img.shape)
            var = np.clip(img.astype(np.int16) + noise,
                          0, 255).astype(np.uint8)
            payload = codecs.encode_bmp(var)
        new_id = n + j
        planted.append((src["media_id"], new_id))
        extra.append({
            "media_id": new_id, "kind": "image", "payload": payload,
            "mime": ("image/bmp" if payload[:2] == b"BM"
                     else "image/x-portable-pixmap"),
            "width": var.shape[1], "height": var.shape[0],
            "duration_ms": None,
        })
    tbl = pa.concat_tables(
        [base, pa.Table.from_pylist(extra, schema=MEDIA_SCHEMA)])
    return tbl, planted


def synth_video_with_neardups(n: int = 300, seed: int = 42,
                              n_planted: int = 24) -> tuple[
                                  pa.Table, list[tuple[int, int]]]:
    """Base synth corpus + ``n_planted`` planted video near-duplicates
    (ids n, n+1, ...): brightness-shifted or mildly-noised re-encodes
    of y4m rows, same frame count/rate (the temporal fingerprint keys
    on frame structure). Returns (table, planted (base_id, dup_id))."""
    rng = np.random.default_rng(seed + 3)
    base = synth_media_table(n, seed)
    rows = base.to_pylist()
    clips = [r for r in rows if codecs.sniff(r["payload"]) == "y4m"]
    planted: list[tuple[int, int]] = []
    extra = []
    for j in range(n_planted):
        src = clips[int(rng.integers(0, len(clips)))]
        info = codecs.parse_y4m(src["payload"])
        frames = np.stack([
            codecs.y4m_frame_luma(src["payload"], info, i)
            for i in range(info.n_frames)])
        if j % 2 == 0:                      # brightness shift
            var = np.clip(frames.astype(np.int16) + 10,
                          0, 255).astype(np.uint8)
        else:                               # mild per-pixel noise
            noise = rng.integers(-4, 5, size=frames.shape)
            var = np.clip(frames.astype(np.int16) + noise,
                          0, 255).astype(np.uint8)
        new_id = n + j
        planted.append((src["media_id"], new_id))
        extra.append({
            "media_id": new_id, "kind": "video",
            "payload": codecs.encode_y4m(var, info.fps_num,
                                         info.fps_den),
            "mime": "video/x-yuv4mpeg",
            "width": info.width, "height": info.height,
            "duration_ms": info.duration_ms,
        })
    tbl = pa.concat_tables(
        [base, pa.Table.from_pylist(extra, schema=MEDIA_SCHEMA)])
    return tbl, planted


def synth_audio_with_neardups(n: int = 300, seed: int = 42,
                              n_planted: int = 30) -> tuple[
                                  pa.Table, list[tuple[int, int]]]:
    """Base synth corpus + ``n_planted`` planted audio near-duplicates
    (ids n, n+1, ...): volume-scaled or mildly-noised re-encodes of
    decodable WAV rows. Returns (table, planted (base_id, dup_id))."""
    rng = np.random.default_rng(seed + 2)
    base = synth_media_table(n, seed)
    rows = base.to_pylist()
    wavs = [r for r in rows if codecs.sniff(r["payload"]) == "wav"]
    planted: list[tuple[int, int]] = []
    extra = []
    for j in range(n_planted):
        src = wavs[int(rng.integers(0, len(wavs)))]
        samples, sr = codecs.decode_wav(src["payload"])
        if j % 2 == 0:                      # volume scale
            var = samples * 0.6
        else:                               # mild noise
            var = np.clip(samples + 0.01 * rng.standard_normal(
                samples.shape), -1.0, 1.0)
        new_id = n + j
        planted.append((src["media_id"], new_id))
        extra.append({
            "media_id": new_id, "kind": "audio",
            "payload": codecs.encode_wav(var, sr),
            "mime": "audio/wav", "width": None, "height": None,
            "duration_ms": src["duration_ms"],
        })
    tbl = pa.concat_tables(
        [base, pa.Table.from_pylist(extra, schema=MEDIA_SCHEMA)])
    return tbl, planted
