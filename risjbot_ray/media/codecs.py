"""Pure-numpy encoders/decoders for simple public media formats.

Why these formats: the sandbox (and many hardened cluster images) has no
PIL/libav, but BMP, PPM/PGM, RIFF-PCM WAV and YUV4MPEG2 are fully
specified byte layouts decodable with ``struct`` + numpy alone — so the
multimodal stages can do REAL decode work (round-trip-exact, pinned by
tests) instead of hashing opaque bytes. Reference semantics: the
multimodal axis of the engine brief (decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` stages); see
``risjbot_ray/pipelines/multimodal.py`` for the Ray-side plumbing.

Scale notes: every decoder is a per-row kernel run inside an actor-pool
``map_batches`` stage whose batch SIZE (not row count) bounds worker
heap — callers keep ``batch_size`` small for MB-scale payloads. Decoders
are zero-copy where the wire layout allows (``np.frombuffer`` views over
the payload bytes; copies only for the axis flips BMP's bottom-up rows
require).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------------

#: magic-byte prefixes -> codec name understood by decode_image / decode_*
_MAGIC = (
    (b"BM", "bmp"),
    (b"P6", "ppm"),
    (b"P5", "pgm"),
    (b"YUV4MPEG2 ", "y4m"),
)


def sniff(payload: bytes) -> str | None:
    """Codec name for a payload this module can decode, else None.

    WAV needs a two-part check (RIFF container + WAVE form type), the
    rest are plain prefixes.
    """
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    for magic, name in _MAGIC:
        if payload[: len(magic)] == magic:
            return name
    return None


# ---------------------------------------------------------------------------
# BMP (Windows DIB, uncompressed BI_RGB, 24/32-bit)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit BI_RGB BMP.

    Rows are stored bottom-up in BGR order and padded to 4 bytes, per
    the DIB spec.
    """
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects HxWx3 uint8 RGB")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    # RGB -> BGR, top-down -> bottom-up
    bgr = img[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        pixel_data = rows.tobytes()
    else:
        pixel_data = np.ascontiguousarray(bgr).tobytes()
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    # BITMAPINFOHEADER: size, w, h(+ = bottom-up), planes, bpp,
    # compression(0 = BI_RGB), image size, ppm x/y, colors used/important
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BI_RGB BMP to HxWx3 uint8 RGB.

    Handles bottom-up AND top-down (negative height) bitmaps, row
    padding, and the common BITMAPINFOHEADER/V4/V5 header sizes (the
    pixel-array offset in the file header is authoritative).
    """
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp, compression = struct.unpack_from("<xxH I", data, 26)
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    end = data_off + row_bytes * h
    if len(data) < end:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(data, np.uint8, row_bytes * h, data_off)
    px = rows.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    rgb = px[:, :, 2::-1]                      # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5, maxval <= 255)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 RGB as binary P6 PPM."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects HxWx3 uint8 RGB")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def _pnm_header(data: bytes) -> tuple[int, int, int, int]:
    """Parse a PNM header: returns (width, height, maxval, data offset).

    Tokens are whitespace-separated; '#' comments run to end of line and
    may appear between any tokens, per the netpbm spec.
    """
    pos, tokens = 2, []
    n = len(data)
    while len(tokens) < 3:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos : pos + 1] == b"#":
            while pos < n and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(int(data[start:pos]))
    # exactly ONE whitespace byte separates maxval from the raster
    return tokens[0], tokens[1], tokens[2], pos + 1


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary P6 PPM (maxval <= 255) to HxWx3 uint8 RGB."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    w, h, maxval, off = _pnm_header(data)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    if len(data) < off + need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(data, np.uint8, need, off).reshape(h, w, 3).copy()


def decode_pgm(data: bytes) -> np.ndarray:
    """Decode binary P5 PGM (maxval <= 255) to HxW uint8 grayscale."""
    if data[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    w, h, maxval, off = _pnm_header(data)
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    need = w * h
    if len(data) < off + need:
        raise ValueError("truncated PGM raster")
    return np.frombuffer(data, np.uint8, need, off).reshape(h, w).copy()


def decode_image(payload: bytes) -> np.ndarray | None:
    """Decode any supported still-image payload to HxWx3 uint8 RGB.

    Returns None for formats this module cannot decode (the caller
    falls back to its declared stub path).
    """
    kind = sniff(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "pgm":
        g = decode_pgm(payload)
        return np.repeat(g[:, :, None], 3, axis=2)
    return None


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM 8/16-bit, any channel count)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float32/float64 samples in [-1, 1] (shape (n,) or (n, ch))
    as 16-bit PCM RIFF WAV."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    frames = np.ascontiguousarray(pcm).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch,
                      sample_rate, byte_rate, ch * 2, 16)
    data = struct.pack("<4sI", b"data", len(frames)) + frames
    riff_len = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM RIFF WAV to (float32 samples (n, ch) in [-1, 1],
    sample_rate).

    Walks the chunk list (tolerating LIST/fact/cue chunks and odd-length
    chunk padding) instead of assuming fmt/data at fixed offsets —
    real-world WAVs carry metadata chunks before the data.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data_span = None
    while pos + 8 <= n:
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt " and clen >= 16:
            fmt = struct.unpack_from("<HHIIHH", payload, body)
        elif cid == b"data":
            data_span = (body, min(clen, n - body))
        pos = body + clen + (clen & 1)         # chunks are word-aligned
    if fmt is None or data_span is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or ch < 1:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits})")
    off, nbytes = data_span
    if bits == 16:
        count = (nbytes // (2 * ch)) * ch
        raw = np.frombuffer(payload, "<i2", count, off)
        samples = raw.astype(np.float32) / 32768.0
    else:                                      # 8-bit PCM is unsigned
        count = (nbytes // ch) * ch
        raw = np.frombuffer(payload, np.uint8, count, off)
        samples = (raw.astype(np.float32) - 128.0) / 128.0
    return samples.reshape(-1, ch), sample_rate


# ---------------------------------------------------------------------------
# YUV4MPEG2 (y4m) — uncompressed planar video with a text header
# ---------------------------------------------------------------------------

class Y4MInfo:
    """Parsed y4m stream parameters + frame geometry for random access."""

    __slots__ = ("width", "height", "fps_num", "fps_den", "colorspace",
                 "header_len", "frame_header_len", "frame_data_len",
                 "n_frames")

    def __init__(self, width, height, fps_num, fps_den, colorspace,
                 header_len, frame_header_len, frame_data_len, n_frames):
        self.width = width
        self.height = height
        self.fps_num = fps_num
        self.fps_den = fps_den
        self.colorspace = colorspace
        self.header_len = header_len
        self.frame_header_len = frame_header_len
        self.frame_data_len = frame_data_len
        self.n_frames = n_frames

    @property
    def duration_ms(self) -> int:
        return int(self.n_frames * 1000 * self.fps_den / self.fps_num)

    def frame_offset(self, i: int) -> int:
        """Byte offset of frame i's pixel data — O(1) random access,
        which is what makes y4m frame-sampling cheap: seek, don't scan.
        """
        stride = self.frame_header_len + self.frame_data_len
        return self.header_len + i * stride + self.frame_header_len


def encode_y4m(frames: np.ndarray, fps_num: int = 25,
               fps_den: int = 1) -> bytes:
    """Encode (n, h, w) uint8 LUMA frames as C420 y4m (chroma planes
    filled neutral-gray 128)."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_y4m expects (n, h, w) uint8 luma")
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (
        w, h, fps_num, fps_den)
    chroma = np.full((h // 2) * (w // 2) * 2, 128, np.uint8).tobytes()
    parts = [header]
    for f in frames:
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(f).tobytes())
        parts.append(chroma)
    return b"".join(parts)


def parse_y4m(payload: bytes) -> Y4MInfo:
    """Parse the stream header and derive frame geometry.

    Only fixed-size FRAME headers (no per-frame parameters) are
    supported — that is what every common y4m producer emits, and it is
    what makes O(1) ``frame_offset`` seeking valid; a stream with
    parameterized frame headers raises rather than mis-seeking.
    """
    if payload[:10] != b"YUV4MPEG2 ":
        raise ValueError("not a y4m payload")
    nl = payload.index(b"\n")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "C420"
    for tok in payload[10:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"F":
            a, b = val.split(b":")
            fps_num, fps_den = int(a), int(b)
        elif key == b"C":
            colorspace = "C" + val.decode()
    if not width or not height:
        raise ValueError("y4m header missing W/H")
    if colorspace.startswith("C420"):
        frame_data_len = width * height * 3 // 2
    elif colorspace == "C422":
        frame_data_len = width * height * 2
    elif colorspace == "C444":
        frame_data_len = width * height * 3
    elif colorspace == "Cmono":
        frame_data_len = width * height
    else:
        raise ValueError(f"unsupported y4m colorspace {colorspace}")
    header_len = nl + 1
    if payload[header_len : header_len + 5] != b"FRAME":
        raise ValueError("y4m stream has no frames")
    fh_end = payload.index(b"\n", header_len)
    frame_header = payload[header_len : fh_end + 1]
    if frame_header != b"FRAME\n":
        raise ValueError("parameterized y4m FRAME headers not supported")
    frame_header_len = len(frame_header)
    stride = frame_header_len + frame_data_len
    n_frames = (len(payload) - header_len) // stride
    if n_frames < 1:
        raise ValueError("truncated y4m frame data")
    return Y4MInfo(width, height, fps_num, fps_den, colorspace,
                   header_len, frame_header_len, frame_data_len, n_frames)


def y4m_frame_luma(payload: bytes, info: Y4MInfo, i: int) -> np.ndarray:
    """Luma plane of frame i as HxW uint8 (zero-copy view)."""
    if not 0 <= i < info.n_frames:
        raise IndexError(f"frame {i} out of range (n={info.n_frames})")
    off = info.frame_offset(i)
    if payload[off - info.frame_header_len : off] != b"FRAME\n":
        raise ValueError(f"frame {i} marker missing — corrupt stream")
    return np.frombuffer(payload, np.uint8, info.width * info.height,
                         off).reshape(info.height, info.width)


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an HxW[,C] array via index gathers
    (pure numpy, no loops)."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows][:, cols]


def thumbnail_mean(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean (out_h, out_w) float32 thumbnail of an HxW array — the
    perceptual-fingerprint reduction (each output cell averages its
    source rectangle, so the thumbnail is stable under small noise,
    unlike nearest-neighbor sampling). An axis where out > in has
    duplicate integer edges (an empty source rectangle): clamping each
    cell's far edge to at least start+1 degrades that axis to
    nearest-neighbor instead of emitting 0-valued stripes — matters
    for mixed-aspect inputs where one dimension upscales while the
    other downscales."""
    h, w = gray.shape[:2]
    row_edges = (np.arange(out_h + 1) * h) // out_h
    col_edges = (np.arange(out_w + 1) * w) // out_w
    csum = np.zeros((h + 1, w + 1), np.float64)
    csum[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    r0 = np.minimum(row_edges[:-1], h - 1)
    r1 = np.minimum(np.maximum(row_edges[1:], r0 + 1), h)
    c0 = np.minimum(col_edges[:-1], w - 1)
    c1 = np.minimum(np.maximum(col_edges[1:], c0 + 1), w)
    area = ((r1 - r0)[:, None] * (c1 - c0)[None, :]).astype(np.float64)
    tot = (csum[r1][:, c1] - csum[r1][:, c0]
           - csum[r0][:, c1] + csum[r0][:, c0])
    return (tot / np.maximum(area, 1)).astype(np.float32)
