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
    (b"\xff\xd8\xff", "jpeg"),
    (b".snd", "au"),
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
    if kind == "jpeg":
        return decode_jpeg(payload)
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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 / JFIF). Pure numpy + struct.
#
# Encoder: baseline sequential, 8-bit, 4:4:4 (no chroma subsampling),
# Annex-K example quantization tables, and SIMPLE VALID Huffman tables
# (fixed-length canonical codes, emitted in the DHT segments — any
# conforming reader decodes them; compression is a little worse than
# the Annex-K tables, which is irrelevant here). Decoder: general
# baseline — parses DQT/DHT/SOF0/SOS, canonical-Huffman-decodes the
# interleaved scan, dequantizes, vectorized IDCT across all blocks,
# JFIF YCbCr -> RGB. Supports grayscale and any h=v=1 component
# layout; progressive/subsampled streams raise ValueError (the media
# stage's decoded=False contract catches it).
# ---------------------------------------------------------------------------

def _zigzag() -> np.ndarray:
    """The 64-entry zigzag scan order, generated (not transcribed):
    diagonals s=0..14, odd diagonals walk down-left, even up-right."""
    order = []
    for s in range(15):
        ys = range(max(0, s - 7), min(s, 7) + 1)
        for y in (ys if s % 2 else reversed(ys)):
            order.append(y * 8 + (s - y))
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)

#: Annex K example quantization tables (row-major 8x8)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5                       # orthonormal DCT-II


_DCTM = _dct_matrix()

# encoder Huffman tables: canonical fixed-length codes. DC: 12
# categories, all 5 bits (Kraft 12/32). AC: EOB at 8 bits, the other
# 255 (run,size) bytes at 9 bits (Kraft 2^-8 + 255*2^-9 < 1; the DHT
# per-length count stays <= 255 as the segment format requires).
_ENC_DC_BITS = [0] * 16
_ENC_DC_BITS[4] = 12                     # 12 symbols of length 5
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 16
_ENC_AC_BITS[7] = 1                      # EOB (0x00) at length 8
_ENC_AC_BITS[8] = 255
_ENC_AC_VALS = [0x00] + [v for v in range(1, 256)]


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) for a DHT-style (BITS, VALS) pair."""
    out = {}
    code = 0
    k = 0
    for li, n in enumerate(bits):
        length = li + 1
        for _ in range(n):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:                # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64 -> (nblocks, 8, 8) with edge-replication pad."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (plane.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(img: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 RGB as baseline JFIF (4:4:4)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects HxWx3 uint8 RGB")
    h, w = img.shape[:2]
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    planes = [0.299 * r + 0.587 * g + 0.114 * b,
              -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
              0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    qts = [_QY, _QC, _QC]
    coeffs = []
    for plane, q in zip(planes, qts):
        blocks = _blocks_of(plane) - 128.0
        f = np.einsum("ux,nxy,vy->nuv", _DCTM, blocks, _DCTM)
        qz = np.round(f.reshape(-1, 64) / q.astype(np.float64))
        coeffs.append(qz.astype(np.int64)[:, _ZZ])

    bw = _BitWriter()
    pred = [0, 0, 0]
    nblocks = coeffs[0].shape[0]
    for bi in range(nblocks):
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
            run = 0
            last_nz = np.flatnonzero(zz[1:])
            last = int(last_nz[-1]) + 1 if len(last_nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _ENC_AC[0xF0]     # ZRL
                    bw.put(code, length)
                    run -= 16
                cat = _category(v)
                code, length = _ENC_AC[(run << 4) | cat]
                bw.put(code, length)
                vv = v if v > 0 else v + (1 << cat) - 1
                bw.put(vv, cat)
                run = 0
            if last < 63:
                code, length = _ENC_AC[0x00]         # EOB
                bw.put(code, length)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in q[_ZZ]))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    out = bytearray()
    out += b"\xff\xd8"                                   # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, _QY) + dqt(1, _QC)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)        # h=v=1
    out += seg(0xFFC0, sof)
    out += dht(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += dht(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
    out += dht(0, 1, _ENC_DC_BITS, _ENC_DC_VALS)
    out += dht(1, 1, _ENC_AC_BITS, _ENC_AC_VALS)
    sos = struct.pack(">B", 3)
    for cid, td_ta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, td_ta)
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    RSTn markers are surfaced to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # any marker here (incl. RSTn) means the entropy
                # stream ended mid-symbol — callers consume restarts
                # explicitly at interval boundaries via restart()
                raise ValueError("unexpected marker in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def restart(self) -> None:
        """Byte-align (discarding the interval's pad bits) and consume
        the RSTn marker — T.81 restart semantics; the caller resets
        its DC predictors."""
        self.acc = 0
        self.nbits = 0
        if not (self.d[self.pos] == 0xFF
                and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_tables(bits, vals):
    """Canonical (mincode, maxcode, valptr) per length for decoding."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for li in range(16):
        length = li + 1
        n = bits[li]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, list(vals), valptr


def _huff_read(br: _BitReader, tbl) -> int:
    mincode, maxcode, vals, valptr = tbl
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if maxcode[length] >= 0 and code <= maxcode[length]:
            return vals[valptr[length] + code - mincode[length]]
    raise ValueError("bad Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


#: decode-side cap on declared pixel count (64 MP ~ 1.5 GB of int64
#: coefficients across 3 components) — hostile headers beyond it raise
#: instead of allocating
_JPEG_MAX_PIXELS = 64_000_000


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG (grayscale or h=v=1 color) to HxWx3
    uint8 RGB. Raises ValueError on unsupported OR corrupt streams
    (progressive, subsampled, arithmetic, truncated) — the media
    stage treats that as its decoded=False path."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error, KeyError, MemoryError) as e:
        raise ValueError(f"corrupt JPEG stream: {e}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps = []      # (cid, tq)
    h = w = 0
    ri = 0          # restart interval in MCUs (DRI)
    scan_comps = []
    while True:
        if d[pos] != 0xFF:
            raise ValueError("bad marker")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before scan")
        ln = struct.unpack(">H", d[pos:pos + 2])[0]
        body = d[pos + 2:pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tid = body[i] >> 4, body[i] & 0xF
                if pq:
                    raise ValueError("16-bit quant unsupported")
                qt[tid] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(cls, tid)] = _huff_decode_tables(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            ri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:
            h, w = struct.unpack(">HH", body[1:5])
            nf = body[5]
            # sanity caps BEFORE any allocation keyed on header
            # fields: a hostile/corrupt few-hundred-byte payload can
            # otherwise declare 65535x65535x3 and OOM the actor while
            # the stage contract promises decoded=False pass-through
            if h * w > _JPEG_MAX_PIXELS or nf > 4:
                raise ValueError(
                    f"JPEG dimensions {w}x{h}x{nf} over sanity cap")
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("subsampled JPEG unsupported")
                comps.append((cid, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cid, tdta = body[1 + 2 * c:3 + 2 * c]
                scan_comps.append((cid, tdta >> 4, tdta & 0xF))
            pos = pos + ln
            break
        pos += ln
    if not comps or not scan_comps or h == 0:
        raise ValueError("incomplete JPEG headers")

    br = _BitReader(d, pos)
    nbx, nby = -(-w // 8), -(-h // 8)
    nblocks = nbx * nby
    tq_of = dict(comps)
    ncomp = len(scan_comps)
    coeffs = [np.zeros((nblocks, 64), dtype=np.int64)
              for _ in range(ncomp)]
    tables = []
    for cid, td, ta in scan_comps:
        tables.append((huff[(0, td)], huff[(1, ta)]))
    pred = [0] * ncomp
    for bi in range(nblocks):
        if ri and bi and bi % ri == 0:
            br.restart()
            pred = [0] * ncomp
        for ci in range(ncomp):
            dct_tbl, act_tbl = tables[ci]
            zz = coeffs[ci][bi]
            cat = _huff_read(br, dct_tbl)
            diff = _extend(br.bits(cat), cat) if cat else 0
            pred[ci] += diff
            zz[0] = pred[ci]
            k = 1
            while k <= 63:
                rs = _huff_read(br, act_tbl)
                if rs == 0x00:           # EOB
                    break
                if rs == 0xF0:           # ZRL
                    k += 16
                    continue
                k += rs >> 4
                cat = rs & 0xF
                if k > 63:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(br.bits(cat), cat)
                k += 1

    planes = []
    for ci, (cid, td, ta) in enumerate(scan_comps):
        q = qt[tq_of[cid]]
        f64 = np.zeros((nblocks, 64), dtype=np.float64)
        f64[:, _ZZ] = coeffs[ci] * q[np.newaxis, :]   # q is zigzag-order
        blocks = f64.reshape(-1, 8, 8)
        sp = np.einsum("xu,nuv,yv->nxy", _DCTM.T.copy(), blocks,
                       _DCTM.T.copy()) + 128.0
        full = (sp.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
                .reshape(nby * 8, nbx * 8))
        planes.append(full[:h, :w])
    if ncomp == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Sun AU (.snd): 16-bit linear PCM big-endian — the second real audio
# container (alongside RIFF WAV), fully specified by a 24-byte header.
# ---------------------------------------------------------------------------

def encode_au(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] (shape (n,) or (n, ch)) -> Sun AU,
    encoding 3 (16-bit linear PCM, big-endian)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype(">i2")
    data = np.ascontiguousarray(pcm).tobytes()
    hdr = struct.pack(">4sIIIII", b".snd", 24, len(data), 3,
                      sample_rate, ch)
    return hdr + data


def decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """Sun AU -> (float64 samples in [-1, 1] shape (n,) or (n, ch),
    sample_rate). Supports encoding 3 (16-bit linear PCM)."""
    magic, off, size, enc, rate, ch = struct.unpack(
        ">4sIIIII", payload[:24])
    if magic != b".snd":
        raise ValueError("not an AU file")
    if enc != 3:
        raise ValueError(f"AU encoding {enc} unsupported")
    if ch < 1 or rate < 1:
        raise ValueError("bad AU header")
    data = payload[off:off + size] if size != 0xFFFFFFFF \
        else payload[off:]
    pcm = np.frombuffer(data[:len(data) - len(data) % (2 * ch)],
                        dtype=">i2").astype(np.float64) / 32767.0
    # always (n, ch) — the decode_wav contract audio_features expects
    return pcm.reshape(-1, ch), int(rate)


# ---------------------------------------------------------------------------
# MJPEG: a motion-JPEG stream is literally concatenated baseline JPEGs
# (the multipart/x-mixed-replace payload shape without HTTP framing).
# No container timing exists, so duration derives from a declared fps.
# ---------------------------------------------------------------------------

def mjpeg_frame_offsets(payload: bytes) -> list[int]:
    """Byte offsets of each JPEG SOI in an MJPEG stream. Safe because
    inside entropy-coded data 0xFF is always stuffed (0xFF00) or a
    marker, so a raw SOI+marker prefix only occurs at frame starts."""
    offs = []
    i = 0
    while True:
        j = payload.find(b"\xff\xd8\xff", i)
        if j < 0:
            break
        offs.append(j)
        # skip past this frame's EOI to avoid false positives inside
        # headers (APPn segments may contain arbitrary bytes)
        e = payload.find(b"\xff\xd9", j + 2)
        if e < 0:
            break
        i = e + 2
    return offs


def mjpeg_frame(payload: bytes, offsets: list[int], idx: int
                ) -> np.ndarray:
    """Decode frame ``idx`` of an MJPEG stream."""
    start = offsets[idx]
    end = payload.find(b"\xff\xd9", start) + 2
    return decode_jpeg(payload[start:end])
