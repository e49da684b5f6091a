"""Pure-numpy media codecs: round-trip exactness, hostile-input
rejection, and the real-decode feature path through the Ray stages."""

import numpy as np
import pyarrow as pa
import pytest

from risjbot_ray.media import codecs


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_exact_including_padded_widths():
    # widths 3, 5 exercise the 4-byte row padding; 4 exercises pad=0
    for h, w in [(5, 3), (7, 4), (2, 5), (1, 1), (33, 31)]:
        img = _img(h, w, seed=h * 100 + w)
        assert (codecs.decode_bmp(codecs.encode_bmp(img)) == img).all()


def test_bmp_sniff_and_32bit_and_topdown():
    import struct
    img = _img(6, 4)
    data = codecs.encode_bmp(img)
    assert codecs.sniff(data) == "bmp"
    # hand-build a 32-bit TOP-DOWN bmp of the same pixels
    h, w = img.shape[:2]
    bgra = np.zeros((h, w, 4), np.uint8)
    bgra[:, :, :3] = img[:, :, ::-1]
    px = bgra.tobytes()                    # top-down: no flip
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0,
                       len(px), 0, 0, 0, 0)
    assert (codecs.decode_bmp(hdr + info + px) == img).all()


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"not a bmp at all" * 10)
    data = codecs.encode_bmp(_img(8, 8))
    with pytest.raises(ValueError):
        codecs.decode_bmp(data[: len(data) // 2])


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------

def test_ppm_roundtrip_and_comment_header():
    img = _img(9, 5)
    data = codecs.encode_ppm(img)
    assert codecs.sniff(data) == "ppm"
    assert (codecs.decode_ppm(data) == img).all()
    # netpbm allows comments anywhere between header tokens
    commented = (b"P6\n# a comment\n5 # trailing\n9\n# more\n255\n"
                 + img.tobytes())
    assert (codecs.decode_ppm(commented) == img).all()


def test_pgm_decode_and_image_dispatch():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    data = b"P5\n6 4\n255\n" + g.tobytes()
    assert (codecs.decode_pgm(data) == g).all()
    rgb = codecs.decode_image(data)
    assert rgb.shape == (4, 6, 3)
    assert (rgb[:, :, 0] == g).all() and (rgb[:, :, 2] == g).all()
    # JPEG is a supported format now: corrupt streams raise (callers
    # catch ValueError as the decoded=False path), unknown formats
    # still return None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff junk jpeg")
    assert codecs.decode_image(b"GIF89a not supported") is None


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    for ch in (1, 2):
        sig = rng.uniform(-1, 1, size=(200, ch)).astype(np.float32)
        data = codecs.encode_wav(sig, 8000)
        assert codecs.sniff(data) == "wav"
        out, sr = codecs.decode_wav(data)
        assert sr == 8000 and out.shape == (200, ch)
        # PCM16 bound: scale skew (x*32767/32768) + rounding half-step
        assert np.abs(out - sig).max() <= 1.5 / 32768


def test_wav_chunk_walk_tolerates_metadata_chunks():
    import struct
    sig = np.linspace(-1, 1, 64, dtype=np.float32)
    data = codecs.encode_wav(sig, 16000)
    # splice a LIST chunk between WAVE and fmt
    lst = struct.pack("<4sI", b"LIST", 10) + b"INFOabcdef"
    hacked = data[:12] + lst + data[12:]
    hacked = hacked[:4] + struct.pack(
        "<I", len(hacked) - 8) + hacked[8:]
    out, sr = codecs.decode_wav(hacked)
    assert sr == 16000 and len(out) == 64


def test_wav_8bit_and_rejects():
    import struct
    # hand-built 8-bit mono wav: values 0..255 -> [-1, 1)
    raw = bytes(range(0, 256, 8))
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    data_ck = struct.pack("<4sI", b"data", len(raw)) + raw
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_ck),
                      b"WAVE") + fmt + data_ck
    out, sr = codecs.decode_wav(wav)
    assert out.shape == (32, 1)
    assert abs(out[0, 0] - (-1.0)) < 1e-6
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxWAVE")       # no chunks


# ---------------------------------------------------------------------------
# y4m
# ---------------------------------------------------------------------------

def test_y4m_roundtrip_and_random_access():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(7, 12, 16), dtype=np.uint8)
    data = codecs.encode_y4m(frames, fps_num=30, fps_den=1)
    assert codecs.sniff(data) == "y4m"
    info = codecs.parse_y4m(data)
    assert (info.width, info.height, info.n_frames) == (16, 12, 7)
    assert info.fps_num == 30
    assert info.duration_ms == int(7 * 1000 / 30)
    # random access == the stored frame, for every frame, out of order
    for i in [6, 0, 3, 5, 1]:
        assert (codecs.y4m_frame_luma(data, info, i) == frames[i]).all()
    with pytest.raises(IndexError):
        codecs.y4m_frame_luma(data, info, 7)


def test_y4m_rejects_parameterized_frames_and_truncation():
    frames = np.zeros((2, 4, 4), np.uint8)
    data = codecs.encode_y4m(frames)
    hacked = data.replace(b"FRAME\n", b"FRAME Ixyz\n", 1)
    with pytest.raises(ValueError):
        codecs.parse_y4m(hacked)
    with pytest.raises(ValueError):
        codecs.parse_y4m(b"YUV4MPEG2 W4 H4 F25:1\n")   # no frames


# ---------------------------------------------------------------------------
# resize / thumbnail
# ---------------------------------------------------------------------------

def test_resize_nearest_known_values():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = codecs.resize_nearest(img, 2, 2)
    assert (out == [[0, 2], [8, 10]]).all()
    up = codecs.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8) and up[0, 0] == 0 and up[7, 7] == 15


def test_thumbnail_mean_is_exact_area_average():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    thumb = codecs.thumbnail_mean(img, 2, 2)
    # each 2x2 cell's true mean
    assert np.allclose(thumb, [[2.5, 4.5], [10.5, 12.5]])
    # non-divisible edges still cover every pixel exactly once
    img2 = np.ones((5, 7))
    assert np.allclose(codecs.thumbnail_mean(img2, 2, 2), 1.0)


# ---------------------------------------------------------------------------
# decode -> features through the Ray stages
# ---------------------------------------------------------------------------

def test_media_pipeline_real_decode_flags_and_metadata():
    import ray

    from risjbot_ray.pipelines.multimodal import (media_features_ds,
                                                  synth_media_table)

    src = synth_media_table(60, seed=42).to_pylist()
    out = media_features_ds(n=60, seed=42).to_pandas() \
        .set_index("media_id").sort_index()
    for row in src:
        g = out.loc[row["media_id"]]
        # EVERY row decodes for real now — the %5==4 fifths carry
        # baseline JPEG / Sun AU / MJPEG payloads, decoded by the
        # pure-numpy codecs
        assert bool(g["decoded"]), row["media_id"]
        if row["kind"] == "image":
            # decoded dimensions must equal the synthesized metadata
            assert int(g["width"]) == row["width"]
            assert int(g["height"]) == row["height"]
        if row["kind"] == "audio":
            assert int(g["duration_ms"]) == row["duration_ms"]
        if row["kind"] == "video":
            assert int(g["duration_ms"]) == row["duration_ms"]
    assert all(len(f) == 32 for f in out["features"])


def test_frame_sampler_real_y4m_frames():
    import ray

    from risjbot_ray.media import codecs as cd
    from risjbot_ray.pipelines.multimodal import (FrameSampler,
                                                  frame_features)

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(60, 8, 8), dtype=np.uint8)
    payload = cd.encode_y4m(frames, fps_num=25, fps_den=1)  # 2400 ms
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([payload], pa.binary()),
        "duration_ms": pa.array([2400], pa.int32()),
    })
    out = FrameSampler(every_ms=1000, max_frames=8)(batch).to_pylist()
    # offsets 0/1000/2000 ms -> frames 0/25/50 at 25 fps
    assert [r["frame_ms"] for r in out] == [0, 1000, 2000]
    assert all(r["decoded"] for r in out)
    for r, idx in zip(out, [0, 25, 50]):
        exp = frame_features(frames[idx])
        assert np.allclose(np.asarray(r["features"], np.float32), exp)


def test_image_features_constant_color_exact():
    from risjbot_ray.pipelines.multimodal import image_features
    img = np.full((10, 10, 3), 200, np.uint8)
    f = image_features(img)
    assert np.allclose(f[0:3], 200 / 255)
    assert f[3] == 0.0                       # zero luma variance
    assert np.isclose(f[4:16].sum(), 1.0)    # histogram sums to 1
    hist = f[4:16]
    assert hist[int(200 // (256 / 12))] == 1.0
    assert np.allclose(f[16:32], 200 / 255)  # flat thumbnail


def test_ahash_invariances():
    from risjbot_ray.pipelines.multimodal import ahash64
    rng = np.random.default_rng(9)
    # keep pixels clear of 255 so the brightness shift never clips
    img = rng.integers(20, 200, size=(24, 24, 3), dtype=np.uint8)
    luma = img.astype(np.float32) @ np.float32([0.299, 0.587, 0.114])
    h0 = ahash64(luma)
    assert 0 <= h0 < (1 << 64)
    # lossless re-encode -> identical pixels -> identical hash
    from risjbot_ray.media.codecs import decode_ppm, encode_ppm
    rt = decode_ppm(encode_ppm(img))
    assert ahash64(rt.astype(np.float32)
                   @ np.float32([0.299, 0.587, 0.114])) == h0
    # global brightness shift (no clipping) -> identical hash
    assert ahash64(luma + 30.0) == h0
    # heavy structural change -> different hash
    assert ahash64(luma[::-1].copy()) != h0 or (luma == luma[::-1]).all()


def test_media_phash_pairs_planted_ground_truth():
    import ray  # noqa: F401  (session fixture owns the cluster)

    from risjbot_ray.pipelines.multimodal import (_payload_luma, ahash64,
                                                  media_phash_pairs,
                                                  synth_media_with_neardups)

    tbl, planted = synth_media_with_neardups(120, seed=7, n_planted=18)
    got_df = media_phash_pairs(table=tbl, max_hamming=3).to_pandas()
    got = {(int(r.a), int(r.b)): int(r.hamming)
           for r in got_df.itertuples()}

    hashes = {}
    for row in tbl.to_pylist():
        luma = _payload_luma(row["payload"])
        if luma is not None:
            hashes[row["media_id"]] = ahash64(luma)
    ids = sorted(hashes)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= 3:
                exp[(a, b)] = ham
    # exact pair-set AND per-pair hamming equality vs brute force
    assert got == exp
    # the planted lossless re-encodes (mode 0) are hamming-0 and MUST
    # all be present
    zero_plants = [(min(a, b), max(a, b))
                   for j, (a, b) in enumerate(planted) if j % 3 == 0]
    assert zero_plants and all(got.get(p) == 0 for p in zero_plants)


def test_media_resize_stage_roundtrip_and_passthrough():
    import ray

    from risjbot_ray.media.codecs import decode_bmp
    from risjbot_ray.pipelines.multimodal import (MediaResize,
                                                  media_resize_ds)

    # kernel: downscale of a known 2x-block image is exact area means
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4, :4] = 100
    img[4:, 4:] = 200
    small = MediaResize(2, 2)._resize(img)
    assert (small[0, 0] == 100).all() and (small[1, 1] == 200).all()
    assert (small[0, 1] == 0).all() and (small[1, 0] == 0).all()
    # upscale path keeps exact pixels (nearest)
    up = MediaResize(16, 16)._resize(img)
    assert up.shape == (16, 16, 3) and up[0, 0, 0] == 100

    out = media_resize_ds(n=60, seed=42, out_h=32, out_w=32) \
        .to_pandas().set_index("media_id").sort_index()
    assert len(out) == 60
    for mid, row in out.iterrows():
        if row["resized"]:
            dec = decode_bmp(row["payload"])
            assert dec.shape == (32, 32, 3)
            assert int(row["width"]) == 32
        else:
            # audio/video rows pass through with null payloads
            assert row["payload"] is None
    # ALL image rows resize now (JPEG fifths decode for real too)
    assert int(out["resized"].sum()) == 20


def test_audio_fingerprint_invariances_and_planted_pairs():
    import ray  # noqa: F401

    from risjbot_ray.media.codecs import decode_wav
    from risjbot_ray.pipelines.multimodal import (audio_fingerprint64,
                                                  media_phash_pairs,
                                                  synth_audio_with_neardups)

    # volume invariance on float samples is EXACT
    rng = np.random.default_rng(4)
    sig = rng.uniform(-0.8, 0.8, size=(4000, 1)).astype(np.float32)
    f0 = audio_fingerprint64(sig, 8000)
    assert audio_fingerprint64(sig * 0.25, 8000) == f0
    assert 0 <= f0 < (1 << 64)
    # structural change -> different fingerprint
    assert audio_fingerprint64(sig[::-1].copy(), 8000) != f0

    tbl, planted = synth_audio_with_neardups(90, seed=7, n_planted=12)
    got_df = media_phash_pairs(table=tbl, modality="audio").to_pandas()
    got = {(int(r.a), int(r.b)) for r in got_df.itertuples()}
    fps = {}
    for row in tbl.to_pylist():
        sn = codecs.sniff(row["payload"] or b"")
        if sn == "wav":
            samples, sr = decode_wav(row["payload"])
        elif sn == "au":
            samples, sr = codecs.decode_au(row["payload"])
        else:
            continue
        fps[row["media_id"]] = audio_fingerprint64(samples, sr)
    ids = sorted(fps)
    exp = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
           if bin(fps[a] ^ fps[b]).count("1") <= 3}
    assert got == exp
    # every planted pair inside the radius must be found; most plants
    # survive quantization (volume-scaled ones are near-exact)
    within = [(min(a, b), max(a, b)) for a, b in planted
              if bin(fps[a] ^ fps[b]).count("1") <= 3]
    assert len(within) >= len(planted) // 2
    assert all(p in got for p in within)


def test_video_fingerprint_invariances_and_planted_pairs():
    import ray  # noqa: F401

    from risjbot_ray.media.codecs import encode_y4m
    from risjbot_ray.pipelines.multimodal import (media_phash_pairs,
                                                  synth_video_with_neardups,
                                                  video_fingerprint64)

    rng = np.random.default_rng(6)
    # pixels clear of the clip range so the brightness shift is exact
    frames = rng.integers(30, 200, size=(20, 12, 16), dtype=np.uint8)
    f0 = video_fingerprint64(encode_y4m(frames))
    assert f0 is not None and 0 <= f0 < (1 << 64)
    # adjacent-cell difference bits are exactly brightness-shift invariant
    shifted = (frames.astype(np.int16) + 25).astype(np.uint8)
    assert video_fingerprint64(encode_y4m(shifted)) == f0
    # temporal reordering changes the hash (frame 0 stays in place so
    # the 'visual' modality would NOT see this)
    assert video_fingerprint64(encode_y4m(frames[::-1].copy())) != f0
    assert video_fingerprint64(b"RIFF....WAVE") is None

    tbl, planted = synth_video_with_neardups(90, seed=7, n_planted=10)
    got_df = media_phash_pairs(table=tbl, modality="video").to_pandas()
    got = {(int(r.a), int(r.b)) for r in got_df.itertuples()}
    fps = {}
    for row in tbl.to_pylist():
        h = video_fingerprint64(row["payload"])
        if h is not None:
            fps[row["media_id"]] = h
    ids = sorted(fps)
    exp = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
           if bin(fps[a] ^ fps[b]).count("1") <= 3}
    assert got == exp
    within = [(min(a, b), max(a, b)) for a, b in planted
              if bin(fps[a] ^ fps[b]).count("1") <= 3]
    assert len(within) >= len(planted) // 2
    assert all(p in got for p in within)


def test_audio_features_pure_tone_centroid():
    from risjbot_ray.pipelines.multimodal import audio_features
    sr = 8000
    t = np.arange(4096) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[:, None]
    f = audio_features(tone, sr)
    assert np.isclose(f[0], 4096 / sr)
    assert np.isclose(f[1], np.sqrt(0.5), atol=1e-3)   # sine RMS
    # centroid of a 1 kHz tone ~ 1000/4000 of Nyquist
    assert abs(f[3] - 0.25) < 0.02
    assert np.isclose(f[4:32].sum(), 1.0, atol=1e-5)


def test_corrupt_payloads_drop_instead_of_crash():
    """MediaPHash audio/video and FrameSampler must DROP undecodable
    payloads (truncated WAV/y4m, zero-fps headers), never raise — a
    real crawl contains them and one bad row must not kill the task."""
    from risjbot_ray.media import codecs as cd
    from risjbot_ray.pipelines.multimodal import FrameSampler, MediaPHash

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    good_y4m = cd.encode_y4m(frames, fps_num=25, fps_den=1)
    trunc_y4m = good_y4m[: len(good_y4m) // 2]
    zerofps = good_y4m.replace(b"F25:1", b"F0:1", 1)
    trunc_wav = b"RIFF\x10\x00\x00\x00WAVEfmt "  # sniffs wav, truncated

    # truncated y4m still decodes its complete prefix frames (kept);
    # outright garbage and truncated WAV must DROP, never raise
    for modality, payloads, max_kept in (
            ("video", [trunc_y4m, zerofps, b"garbage"], 2),
            ("audio", [trunc_wav, b"RIFFxxxxWAVE", b""], 0)):
        batch = pa.table({
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })
        out = MediaPHash(modality=modality)(batch)
        assert out.num_rows <= max_kept  # bad rows dropped, no raise
        assert 2 not in out.column("media_id").to_pylist()  # garbage/''

    fs_batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["video", "video"], pa.string()),
        "payload": pa.array([zerofps, trunc_y4m], pa.binary()),
        "duration_ms": pa.array([160, 160], pa.int32()),
    })
    out = FrameSampler(every_ms=100, max_frames=2)(fs_batch).to_pylist()
    # the zero-fps doc must fall to the stub path (ZeroDivisionError
    # caught), not crash; the truncated doc may decode prefix frames
    z = [r for r in out if r["media_id"] == 1]
    assert z and all(not r["decoded"] for r in z)


def test_jpeg_roundtrip_smooth_and_shapes():
    """Baseline JPEG: decode(encode(img)) reproduces a smooth image
    closely (lossy by design), at every odd/even dimension mix."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:40, 0:56].astype(np.float64)
    base = 127 + 70 * np.sin(xx / 6.0) + 40 * np.cos(yy / 9.0)
    img = np.clip(np.stack([base, base * 0.8 + 20, 255 - base],
                           axis=2), 0, 255).astype(np.uint8)
    for (h, w) in [(40, 56), (33, 17), (8, 8), (9, 25)]:
        sub = img[:h, :w]
        dec = codecs.decode_jpeg(codecs.encode_jpeg(sub))
        assert dec.shape == sub.shape
        err = np.abs(dec.astype(float) - sub.astype(float)).mean()
        assert err < 6.0, (h, w, err)
    # grayscale-coded 3-channel (equal channels) survives too
    g = np.repeat(np.clip(base, 0, 255).astype(np.uint8)[:, :, None],
                  3, axis=2)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(g))
    assert np.abs(dec.astype(float) - g.astype(float)).mean() < 6.0
    # corrupt / truncated / non-baseline -> ValueError, never crashes
    good = codecs.encode_jpeg(img)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(good[:40])
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"\xff\xd8\xff\xe0garbage")
    assert codecs.sniff(good) == "jpeg"


def test_au_roundtrip_and_contract():
    sig = (0.4 * np.sin(np.arange(4000) / 15.0)).astype(np.float64)
    au = codecs.encode_au(sig, 8000)
    assert codecs.sniff(au) == "au"
    dec, sr = codecs.decode_au(au)
    assert sr == 8000 and dec.shape == (4000, 1)
    assert np.abs(dec[:, 0] - sig).max() < 1e-3
    # stereo
    st = np.stack([sig, -sig], axis=1)
    dec2, _ = codecs.decode_au(codecs.encode_au(st, 8000))
    assert dec2.shape == (4000, 2)
    with pytest.raises(ValueError):
        codecs.decode_au(b".snd" + b"\0" * 20)   # encoding 0


def test_mjpeg_frame_offsets_and_decode():
    rng = np.random.default_rng(5)
    frames = []
    for i in range(5):
        img = np.full((16, 24, 3), 40 * i, dtype=np.uint8)
        img[4:12, 6:18] = 255 - 40 * i
        frames.append(codecs.encode_jpeg(img))
    mj = b"".join(frames)
    offs = codecs.mjpeg_frame_offsets(mj)
    assert len(offs) == 5 and offs[0] == 0
    f3 = codecs.mjpeg_frame(mj, offs, 3)
    assert f3.shape == (16, 24, 3)
    # frame identity survives: corner value ~ 40*3
    assert abs(int(f3[0, 0, 0]) - 120) < 12


def test_jpeg_restart_interval_decode():
    """A conforming baseline stream WITH restart markers (DRI=1, one
    RSTn per MCU) must decode exactly like the plain stream: the
    reader consumes restarts at interval boundaries and resets DC
    predictors (a silently-drifting decode was a round-5 review
    find). Hostile SOF dimensions raise before any allocation."""
    import struct

    from risjbot_ray.media.codecs import (_BitWriter, _DCTM, _ENC_AC,
                                          _ENC_DC, _QC, _QY, _ZZ,
                                          _blocks_of, _category)
    img = np.zeros((8, 24, 3), dtype=np.uint8)
    img[:, :8] = 130
    img[:, 8:16] = 60
    img[:, 16:] = 200
    base = codecs.encode_jpeg(img)
    dec = codecs.decode_jpeg(base)

    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    planes = [0.299 * r + 0.587 * g + 0.114 * b,
              -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
              0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    coeffs = []
    for plane, q in zip(planes, [_QY, _QC, _QC]):
        blocks = _blocks_of(plane) - 128.0
        f = np.einsum("ux,nxy,vy->nuv", _DCTM, blocks, _DCTM)
        qz = np.round(f.reshape(-1, 64) / q.astype(np.float64))
        coeffs.append(qz.astype(np.int64)[:, _ZZ])
    nblocks = coeffs[0].shape[0]
    parts = []
    for bi in range(nblocks):
        bw = _BitWriter()
        pred = [0, 0, 0]                 # DRI=1: reset every MCU
        for ci in range(3):
            zz = coeffs[ci][bi]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            cat = _category(diff)
            code, length = _ENC_DC[cat]
            bw.put(code, length)
            if cat:
                v = diff if diff > 0 else diff + (1 << cat) - 1
                bw.put(v, cat)
            last_nz = np.flatnonzero(zz[1:])
            last = int(last_nz[-1]) + 1 if len(last_nz) else 0
            run = 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _ENC_AC[0xF0]
                    bw.put(code, length)
                    run -= 16
                cat = _category(v)
                code, length = _ENC_AC[(run << 4) | cat]
                bw.put(code, length)
                vv = v if v > 0 else v + (1 << cat) - 1
                bw.put(vv, cat)
                run = 0
            if last < 63:
                code, length = _ENC_AC[0x00]
                bw.put(code, length)
        parts.append(bw.flush())
    scan = b""
    for i, part in enumerate(parts):
        scan += part
        if i < nblocks - 1:
            scan += bytes([0xFF, 0xD0 + (i % 8)])
    sos_at = base.find(b"\xff\xda")
    sos_len = struct.unpack(">H", base[sos_at + 2:sos_at + 4])[0]
    dri = struct.pack(">HHH", 0xFFDD, 4, 1)
    stream = (base[:sos_at] + dri + base[sos_at:sos_at + 2 + sos_len]
              + scan + b"\xff\xd9")
    dec2 = codecs.decode_jpeg(stream)
    assert (dec2 == dec).all()

    bad = bytearray(base)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 5:sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="sanity cap"):
        codecs.decode_jpeg(bytes(bad))


def test_jpeg_decoder_never_crashes_on_fuzz():
    """The decoder's contract is ValueError-or-correct: random bytes,
    truncations and bit flips of valid streams must never raise
    anything else (the media stage maps ValueError to its
    decoded=False path; any other exception kills the task)."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    good = codecs.encode_jpeg(img)
    cases = []
    for _ in range(40):                       # random noise with SOI
        n = int(rng.integers(4, 2000))
        cases.append(b"\xff\xd8\xff" + rng.integers(
            0, 256, size=n, dtype=np.uint8).tobytes())
    for _ in range(40):                       # truncations
        cases.append(good[:int(rng.integers(2, len(good)))])
    for _ in range(40):                       # single-byte corruption
        b = bytearray(good)
        b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    decoded = failed = 0
    for payload in cases:
        try:
            out = codecs.decode_jpeg(payload)
            assert out.dtype == np.uint8 and out.ndim == 3
            decoded += 1
        except ValueError:
            failed += 1
    assert decoded + failed == len(cases)
