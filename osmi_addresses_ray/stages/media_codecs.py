"""Pure-numpy image codecs for the multimodal decode boundary.

The sandbox image has no PIL/ffmpeg, but uncompressed formats need no
library: P6 PPM (netpbm) and 24-bit BI_RGB BMP are decodable with a header
parse plus a numpy reshape — and PNG needs only zlib (which IS in the
sandbox): CRC-checked chunk walk, inflate, and the five-filter unfilter
pass, all implemented here. These codecs make the decode stage REAL — the
actor pool parses actual encoded bytes into actual pixel arrays — while
DCT/entropy codecs (JPEG/MP3/h264) remain behind the documented
NotImplementedError boundary (swap in PIL/torchaudio on a cluster image
that has them; see ``multimodal.MediaDecoder``).

Reference parity note: the reference engine has no media path; this family
is part of the LLM-training-data operator set (SURVEY §"beyond the
reference").
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6, binary, maxval <= 255)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6 bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"encode_ppm expects (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 bytes -> (H, W, 3) uint8.

    Handles the full netpbm header grammar: any whitespace between tokens
    and ``#`` comments running to end-of-line, then EXACTLY one whitespace
    byte before the raster.
    """
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    w, h, maxval = tokens
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # single whitespace byte after maxval
    n = w * h * 3
    raster = data[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"PPM raster truncated: want {n} bytes, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up, BGR,
    4-byte-padded rows)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"encode_bmp expects (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    # bottom-up row order, BGR channel order
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    pixel_off = 14 + 40
    size = pixel_off + raster.nbytes
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, raster.nbytes, 2835, 2835, 0, 0
    )
    return file_header + info_header + raster.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB.

    Supports positive biHeight (bottom-up, the common case) and negative
    (top-down); rejects compressed / non-24-bit variants explicitly.
    """
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h_signed, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    n = row_bytes * h
    raster = data[pixel_off : pixel_off + n]
    if len(raster) != n:
        raise ValueError(f"BMP raster truncated: want {n} bytes, have {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return img.copy()


# ---------------------------------------------------------------------------
# PNG (zlib deflate — bit depth 8, color types 0/2/6, no interlace)
# ---------------------------------------------------------------------------
#
# zlib IS in the sandbox (the PBF reader already depends on it), so PNG is
# decodable without any image library: signature + CRC-checked chunk walk,
# zlib-inflate of the IDAT stream, then per-row unfiltering (all five PNG
# filter types). This closes the "compressed codecs need a cluster image"
# boundary for PNG; JPEG/MP3/h264 (DCT/entropy codecs) remain behind the
# MediaDecoder injection seam.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8 image -> PNG bytes. (H, W) / (H, W, 1) -> gray (color type 0),
    (H, W, 3) -> RGB (2), (H, W, 4) -> RGBA (6); bit depth 8, no interlace.

    ``filter_type`` (0-4) applies that PNG filter to EVERY row — all are
    valid streams per the spec; non-zero types exist so fixtures exercise
    the decoder's Sub/Up/Average/Paeth unfilter paths, not just None."""
    import zlib

    if img.dtype != np.uint8:
        raise ValueError(f"encode_png expects uint8, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    ch = img.shape[2]
    try:
        color_type = {1: 0, 3: 2, 4: 6}[ch]
    except KeyError:
        raise ValueError(f"encode_png: unsupported channel count {ch}")
    if filter_type not in range(5):
        raise ValueError(f"invalid PNG filter type {filter_type}")
    h, w = img.shape[:2]
    raw = img.astype(np.int16)
    prev = np.zeros((w, ch), np.int16)
    lines = []
    for y in range(h):
        row = raw[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prev
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            filt = row - ((left + prev) >> 1)
        else:  # Paeth
            filt = np.empty_like(row)
            for x in range(w):
                for c in range(ch):
                    a = int(row[x - 1, c]) if x else 0
                    b = int(prev[x, c])
                    cc = int(prev[x - 1, c]) if x else 0
                    filt[x, c] = int(row[x, c]) - _paeth(a, b, cc)
        lines.append(bytes([filter_type]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(b"".join(lines), 9)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (H, W) for gray, (H, W, 3) RGB,
    (H, W, 4) RGBA. Bit depth 8, color types 0/2/6, no interlace; every
    chunk CRC is verified and all five row filters are unfiltered per the
    spec. The per-row unfilter is numpy for None/Sub/Up (Sub is a cumsum
    per channel) and a scalar loop for Average/Paeth (their predictor is
    sequential in x by definition)."""
    import zlib

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(typ + payload) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = payload
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt_method, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant: depth={depth} compression={comp} "
            f"filter={filt_method} interlace={interlace}"
        )
    try:
        ch = {0: 1, 2: 3, 6: 4}[color]
    except KeyError:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * ch
    if len(raw) != stride * h:
        raise ValueError(
            f"PNG scanline data: want {stride * h} bytes, have {len(raw)}"
        )
    out = np.empty((h, w, ch), np.uint8)
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        f = line[0]
        filt = (
            np.frombuffer(line, np.uint8, count=w * ch, offset=1)
            .reshape(w, ch)
            .astype(np.int32)
        )
        if f == 0:
            recon = filt
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-1] per channel
            recon = np.cumsum(filt, axis=0) & 0xFF
        elif f == 2:  # Up
            recon = (filt + prev) & 0xFF
        elif f == 3:  # Average
            recon = np.empty_like(filt)
            for x in range(w):
                for c in range(ch):
                    left = int(recon[x - 1, c]) if x else 0
                    recon[x, c] = (filt[x, c] + ((left + int(prev[x, c])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            recon = np.empty_like(filt)
            for x in range(w):
                for c in range(ch):
                    a = int(recon[x - 1, c]) if x else 0
                    b = int(prev[x, c])
                    cc = int(prev[x - 1, c]) if x else 0
                    recon[x, c] = (filt[x, c] + _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter byte {f} on row {y}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out[:, :, 0] if ch == 1 else out


def _decode_png_rgb(data: bytes) -> np.ndarray:
    """PNG -> (H, W, 3) for the image-stage decoder table: gray replicates
    to 3 channels, RGBA drops alpha (the feature stages are RGB-defined)."""
    img = decode_png(data)
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 4:
        return img[:, :, :3].copy()
    return img


# ---------------------------------------------------------------------------
# Format sniffing + the deterministic stand-in binary store
# ---------------------------------------------------------------------------

_DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "png": _decode_png_rgb}


def sniff_format(data: bytes) -> str | None:
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    return None


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt is None:
        raise ValueError(f"unrecognized image payload (magic {data[:2]!r})")
    return _DECODERS[fmt](data)


_MUL = np.uint64(6364136223846793005)
_SHIFT = np.uint64(33)


def synthesize_pixels(ref: str) -> np.ndarray:
    """Deterministic (H, W, 3) uint8 pixels for a media ref.

    This is the spec of the sandbox's fake binary store content — the
    oracle reimplements it independently (oracle/layers.py) so the decode
    path is checked end to end. An LCG-mixed index stream keyed by the
    ref's sha256 gives full-entropy pixels with no RNG state dependence.
    """
    d = hashlib.sha256(ref.encode()).digest()
    w = 8 + d[1] % 25
    h = 8 + d[2] % 25
    seed = np.uint64(int.from_bytes(d[4:12], "little"))
    idx = np.arange(h * w * 3, dtype=np.uint64)
    vals = ((idx * _MUL + seed) >> _SHIFT) & np.uint64(0xFF)
    return vals.astype(np.uint8).reshape(h, w, 3)


def synthesize_media_payload(ref: str) -> bytes:
    """Deterministic ENCODED image bytes for a media ref (the stand-in for a
    binary-store fetch): ~1/3 of refs encode as BMP, ~1/3 as PNG (filter
    type cycling 0-4 so every unfilter path runs), the rest as PPM — all
    three decoders are exercised end to end in every fixture run. The
    pixel-level oracles (oracle/layers.py) never see the encoding, so a
    codec bug in any of the three breaks the hash gate."""
    d = hashlib.sha256(ref.encode()).digest()
    img = synthesize_pixels(ref)
    if d[0] % 3 == 0:
        return encode_bmp(img)
    if d[0] % 3 == 1:
        return encode_png(img, filter_type=d[3] % 5)
    return encode_ppm(img)


def grid_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """(H, W, 3) uint8 -> grid×grid grayscale cell means scaled to [-1, 1]
    (float32). The per-cell reduction is np.mean over float64 — the oracle
    must mirror that primitive exactly (pairwise summation) for bit parity."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    rb = (np.arange(grid + 1) * h) // grid
    cb = (np.arange(grid + 1) * w) // grid
    out = np.empty(grid * grid, dtype=np.float32)
    for i in range(grid):
        for j in range(grid):
            cell = g[rb[i] : rb[i + 1], cb[j] : cb[j + 1]]
            out[i * grid + j] = np.float32(cell.mean() / 255.0 * 2.0 - 1.0)
    return out


# --- audio (WAV / PCM16) and video (PPM frame stack) -------------------------
#
# These make the remaining multimodal kinds REAL in this sandbox: WAV/PCM16
# needs no codec library (a RIFF header walk), and the "video" container is
# an explicit frame-stack format (magic + dims + concatenated raw frames) —
# a stand-in for a real codec with genuinely parsed structure. Compressed
# audio/video (mp3/h264/...) remain behind NotImplementedError in the
# decoder stage.

_VID_MAGIC = b"FSTK"


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE PCM16 mono encoder."""
    pcm = samples.astype("<i2").tobytes()
    import struct

    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF chunk walk → (int16 samples, sample_rate). Handles extra chunks
    between fmt and data (a real-world RIFF quirk)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} of {size} bytes")
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only PCM16 mono WAV is decodable here")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            return np.frombuffer(body, dtype="<i2"), rate
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def synthesize_audio_samples(ref: str, n: int = 2048) -> np.ndarray:
    """Deterministic int16 PCM for a media ref (same LCG spec family as
    synthesize_pixels; the oracle reimplements it independently)."""
    d = hashlib.sha256(ref.encode()).digest()
    seed = np.uint64(int.from_bytes(d[12:20], "little"))
    idx = np.arange(n, dtype=np.uint64)
    vals = ((idx * _MUL + seed) >> _SHIFT) & np.uint64(0xFFFF)
    return (vals.astype(np.int64) - 32768).astype(np.int16)


def synthesize_audio_payload(ref: str) -> bytes:
    return encode_wav(synthesize_audio_samples(ref))


def encode_frame_stack(frames: np.ndarray) -> bytes:
    """(T, H, W, 3) uint8 → explicit frame-stack container."""
    import struct

    t, h, w, _ = frames.shape
    return _VID_MAGIC + struct.pack("<III", t, h, w) + frames.tobytes()


def decode_frame_stack(data: bytes) -> np.ndarray:
    import struct

    if data[:4] != _VID_MAGIC:
        raise ValueError("not a frame-stack payload")
    t, h, w = struct.unpack("<III", data[4:16])
    body = np.frombuffer(data[16 : 16 + t * h * w * 3], dtype=np.uint8)
    if len(body) != t * h * w * 3:
        raise ValueError("truncated frame stack")
    return body.reshape(t, h, w, 3)


def synthesize_video_frames(ref: str) -> np.ndarray:
    """Deterministic (T, H, W, 3) frames: T in 4..11, dims in 8..23."""
    d = hashlib.sha256(ref.encode()).digest()
    t = 4 + d[3] % 8
    w = 8 + d[1] % 16
    h = 8 + d[2] % 16
    seed = np.uint64(int.from_bytes(d[20:28], "little"))
    idx = np.arange(t * h * w * 3, dtype=np.uint64)
    vals = ((idx * _MUL + seed) >> _SHIFT) & np.uint64(0xFF)
    return vals.astype(np.uint8).reshape(t, h, w, 3)


def synthesize_video_payload(ref: str) -> bytes:
    return encode_frame_stack(synthesize_video_frames(ref))
