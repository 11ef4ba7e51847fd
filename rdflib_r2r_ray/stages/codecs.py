"""Real, dependency-free media codecs for the multimodal stages.

The container has no PIL / libvips / ffmpeg, so the round-3 multimodal
stages stubbed "real formats" behind NotImplementedError.  PNG, BMP, GIF,
baseline JPEG, WAV and RIFF-AVI (uncompressed 'DIB ' video), however, are
fully decodable with the standard library (zlib + struct) and numpy — so
those formats get REAL codecs here, and only formats that genuinely require
external libraries (WebP/AVIF, compressed video codecs) remain stubbed.

- PNG: chunk parsing (IHDR/IDAT/IEND), zlib inflate, scanline UNFILTERING
  for all five filter types (None/Sub/Up/Average/Paeth), 8-bit gray /
  gray+alpha / RGB / RGBA.  Encoder emits filter-0 scanlines (valid PNG,
  decodable by any viewer).
- WAV: RIFF/fmt/data parsing for PCM16 (the dominant interchange form),
  returning the int16 sample array + rate/channels.  Encoder writes
  canonical 44-byte-header PCM16.

Reference parity note: the reference engine has NO multimodal surface at
all — this exceeds it; the pipelines exercising these codecs live in
``driver_api.q_mm_*``.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples per pixel


def png_info(buf: bytes) -> Optional[dict]:
    """Parse the IHDR of a PNG byte string (None if not a PNG)."""
    if len(buf) < 33 or buf[:8] != PNG_SIG:
        return None
    length, ctype = struct.unpack_from(">I4s", buf, 8)
    if ctype != b"IHDR" or length != 13:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack_from(">IIBBBBB", buf, 16)
    return dict(width=w, height=h, bit_depth=depth, color_type=color,
                interlace=interlace, channels=_CHANNELS.get(color))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array.  Supports 8-bit depth,
    color types 0/2/4/6, no interlacing (the overwhelmingly common web
    subset); anything else raises ValueError."""
    info = png_info(buf)
    if info is None:
        raise ValueError("not a PNG")
    if info["bit_depth"] != 8 or info["channels"] is None or info["interlace"]:
        raise ValueError("unsupported PNG variant (non-8-bit / palette / interlaced)")
    w, h, ch = info["width"], info["height"], info["channels"]

    # walk chunks, concatenate IDAT
    pos, idat = 8, []
    while pos + 8 <= len(buf):
        (length,), ctype = struct.unpack_from(">I", buf, pos), buf[pos + 4:pos + 8]
        data = buf[pos + 8: pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG scanline data")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 1:  # Sub: per-channel-lane prefix sum mod 256
            lanes = cur.reshape(w, ch)
            line = np.cumsum(lanes, axis=0).reshape(-1)
        elif ftype == 2:  # Up
            line = cur + prev
        elif ftype == 3:  # Average (left-dependent: sequential in x)
            line = cur.copy()
            p = prev.astype(np.int32)
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (cur[i] + ((left + p[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (left/upper-left dependent: sequential)
            line = cur.copy()
            p = prev.astype(np.int32)
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                ul = int(p[i - ch]) if i >= ch else 0
                line[i] = (cur[i] + _paeth(left, int(p[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = (line & 0xFF).astype(np.uint8)
        out[y] = prev
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 → PNG bytes (filter-0 scanlines)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def wav_info(buf: bytes) -> Optional[dict]:
    """Parse a RIFF/WAVE header (None if not a WAV)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos = 12
    info: dict = {}
    while pos + 8 <= len(buf):
        cid, ln = buf[pos:pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"fmt ":
            fmt, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", buf, pos + 8)
            info.update(format=fmt, channels=nch, rate=rate, bits=bits)
        elif cid == b"data":
            info.update(data_offset=pos + 8, data_len=ln)
        pos += 8 + ln + (ln & 1)
    return info if "rate" in info and "data_offset" in info else None


def decode_wav(buf: bytes) -> Tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 samples [n, channels], rate, channels).
    PCM16 only; other encodings raise ValueError."""
    info = wav_info(buf)
    if info is None:
        raise ValueError("not a WAV")
    if info.get("format") != 1 or info.get("bits") != 16:
        raise ValueError("unsupported WAV encoding (PCM16 only)")
    pcm = np.frombuffer(buf, dtype="<i2", count=info["data_len"] // 2,
                        offset=info["data_offset"])
    ch = info["channels"]
    return pcm.reshape(-1, ch), info["rate"], ch


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples [n] or [n, channels] → canonical PCM16 WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = rate * ch * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


# ---------------------------------------------------------------------------
# DIB helpers (shared by BMP and AVI: bottom-up BGR rows padded to 4 bytes)
# ---------------------------------------------------------------------------

def _dib_encode_frame(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → raw 24-bit DIB bytes (bottom-up, BGR, 4-byte
    row padding) — the pixel layout BMP files and 'DIB ' AVI streams share."""
    h, w, _ = img.shape
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _dib_decode_frame(data: bytes, w: int, h: int) -> np.ndarray:
    row_len = (w * 3 + 3) & ~3
    if len(data) < h * row_len:
        raise ValueError("truncated DIB frame")
    arr = np.frombuffer(data, dtype=np.uint8, count=h * row_len).reshape(h, row_len)
    return arr[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB — the canonical interchange subset)
# ---------------------------------------------------------------------------

def bmp_info(buf: bytes) -> Optional[dict]:
    """Parse a BITMAPFILEHEADER+BITMAPINFOHEADER (None if not a BMP)."""
    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h, planes, bits, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if hdr_size < 40:
        return None
    return dict(width=w, height=abs(h), top_down=h < 0, bits=bits,
                compression=comp, data_offset=data_offset)


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) RGB uint8.  24-bit BI_RGB only."""
    info = bmp_info(buf)
    if info is None:
        raise ValueError("not a BMP")
    if info["bits"] != 24 or info["compression"] != 0:
        raise ValueError("unsupported BMP variant (24-bit BI_RGB only)")
    w, h = info["width"], info["height"]
    img = _dib_decode_frame(buf[info["data_offset"]:], w, h)
    return img[::-1].copy() if info["top_down"] else img


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → 24-bit BI_RGB BMP bytes."""
    h, w, _ = img.shape
    data = _dib_encode_frame(img)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return file_hdr + info + data


# ---------------------------------------------------------------------------
# GIF (87a/89a, real LZW both directions; first frame, no interlace)
# ---------------------------------------------------------------------------

def gif_info(buf: bytes) -> Optional[dict]:
    if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h, flags = struct.unpack_from("<HHB", buf, 6)
    gct = (flags & 0x80) != 0
    gct_size = 2 << (flags & 0x07) if gct else 0
    return dict(width=w, height=h, gct_size=gct_size)


def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """GIF-variant LZW: LSB-first bit packing, growing code width, clear and
    end-of-information codes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = bits = pos = 0
    prev: Optional[bytes] = None
    while True:
        while bits < width:
            if pos >= len(data):
                return out  # tolerant of missing explicit EOI
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(buf: bytes) -> np.ndarray:
    """GIF bytes → first frame as (h, w, 3) RGB uint8 (real LZW inflate;
    interlaced images are rejected)."""
    info = gif_info(buf)
    if info is None:
        raise ValueError("not a GIF")
    pos = 13
    gct = None
    if info["gct_size"]:
        n = info["gct_size"]
        gct = np.frombuffer(buf, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(buf):
        block = buf[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, flags = struct.unpack_from("<HHHHB", buf, pos + 1)
            pos += 10
            if flags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            pal = gct
            if flags & 0x80:
                n = 2 << (flags & 0x07)
                pal = np.frombuffer(buf, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = buf[pos]
            pos += 1
            data = bytearray()
            while buf[pos] != 0:
                ln = buf[pos]
                data.extend(buf[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(bytes(_lzw_decode(min_code, bytes(data))),
                                dtype=np.uint8, count=w * h)
            return pal[idx].reshape(h, w, 3)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image")


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → GIF89a bytes
    (real LZW compression)."""
    h, w = indices.shape
    n = len(palette)
    size_exp = max(1, (int(n) - 1).bit_length())
    full = np.zeros((2 ** size_exp, 3), dtype=np.uint8)
    full[:n] = palette
    min_code = max(2, size_exp)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_exp - 1) & 0x07), 0, 0)
    out += full.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    lzw = _lzw_encode(min_code, indices.astype(np.uint8).tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI (RIFF container, uncompressed 'DIB ' video stream — a REAL demuxable
# video format, closing the round-3 "video demux is a stub" seam)
# ---------------------------------------------------------------------------

def _riff_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, data_offset, data_len) for sibling RIFF chunks."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        ln = struct.unpack_from("<I", buf, pos + 4)[0]
        yield cid, pos + 8, min(ln, end - pos - 8)
        pos += 8 + ln + (ln & 1)


def avi_info(buf: bytes) -> Optional[dict]:
    """Parse the 'avih' main header of a RIFF-AVI (None if not an AVI)."""
    if len(buf) < 24 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    for cid, off, ln in _riff_chunks(buf, 12, len(buf)):
        if cid == b"LIST" and buf[off:off + 4] == b"hdrl":
            for c2, o2, l2 in _riff_chunks(buf, off + 4, off + ln):
                if c2 == b"avih" and l2 >= 40:
                    v = struct.unpack_from("<10I", buf, o2)
                    return dict(us_per_frame=v[0], frames=v[4], width=v[8], height=v[9])
    return None


def demux_avi(buf: bytes) -> list:
    """AVI bytes → list of (h, w, 3) RGB uint8 frames.  Uncompressed
    'DIB ' streams ('00db'/'00dc' movi chunks) only — real containers with
    compressed codecs (MP4/H.264, VP9) would need ffmpeg and raise."""
    info = avi_info(buf)
    if info is None:
        raise ValueError("not an AVI")
    w, h = info["width"], info["height"]
    frames = []
    for cid, off, ln in _riff_chunks(buf, 12, len(buf)):
        if cid == b"LIST" and buf[off:off + 4] == b"movi":
            for c2, o2, l2 in _riff_chunks(buf, off + 4, off + ln):
                if c2[2:4] in (b"db", b"dc") and l2 >= 8:
                    frames.append(_dib_decode_frame(buf[o2:o2 + l2], w, h))
    return frames


def encode_avi(frames: list, fps: int = 10) -> bytes:
    """List of (h, w, 3) RGB uint8 frames → RIFF-AVI bytes with an
    uncompressed 24-bit 'DIB ' video stream (playable by any player)."""
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    dibs = [_dib_encode_frame(f) for f in frames]
    fsize = len(dibs[0])

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack("<10I4x12x", 1000000 // fps, fsize * fps, 0, 0,
                       len(frames), 0, 1, fsize, w, h)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                            len(frames), fsize, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU-T T.81), dependency-free.
#
# Encoder: level shift → 8×8 DCT-II (orthonormal matrix product, vectorized
# over all blocks) → quantize (Annex-K tables scaled by the libjpeg quality
# formula) → zigzag → DC-difference / AC run-length → canonical Huffman
# (Annex-K tables) with 0xFF byte stuffing.  Grayscale (1 component) and
# RGB (JFIF YCbCr, 4:4:4 — no subsampling) supported.
# Decoder: marker walk (SOI/APP/DQT/SOF0/DHT/SOS/EOI), canonical Huffman
# decode, dequantize, IDCT, level shift, clip; YCbCr→RGB for 3 components.
# Baseline 8-bit only; progressive / subsampled / arithmetic streams raise
# ValueError.  (The reference engine has no multimodal surface at all.)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# ITU-T T.81 Annex K.1 — the quality-50 reference tables
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,   12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,   14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68,109,103, 77,   24, 35, 55, 64, 81,104,113, 92,
    49, 64, 78, 87,103,121,120,101,   72, 92, 95, 98,112,100,103, 99],
    dtype=np.int64).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,   18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,   47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,   99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,   99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64).reshape(8, 8)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
_HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    t = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    t[0] = np.sqrt(1.0 / 8.0)
    return t


_DCT8 = _dct_matrix()


def _quality_tables(quality: int):
    """libjpeg quality scaling: 50 → the Annex-K tables verbatim."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def q(tbl):
        return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)
    return q(_QT_LUMA), q(_QT_CHROMA)


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): symbol} for the bit-serial reader."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane (h, w multiples of 8) → (n, 8, 8) block array."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _encode_component(blocks_q: np.ndarray, dc_codes, ac_codes, bw: _BitWriter):
    """(n, 64) zigzagged quantized coefficients → entropy-coded bits."""
    prev_dc = 0
    for zz in blocks_q:
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        s = _category(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]   # ZRL
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]       # EOB
            bw.write(code, ln)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(img: np.ndarray, quality: int = 75) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 → baseline JFIF
    JPEG bytes (4:4:4, Annex-K Huffman tables)."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        qts = [qt_l]
    else:
        r, g, b = (img[:, :, c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate([qt_l] if gray else [qt_l, qt_c]):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + bytes(int(x) for x in qt.flat[_ZIGZAG])
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, 0 if c == 0 else 1)
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    hts = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if not gray:
        hts += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc_th, (bits, vals) in hts:
        seg = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(seg) + 2) + seg
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _canonical_codes(*_HT_DC_LUMA)
    ac_l = _canonical_codes(*_HT_AC_LUMA)
    dc_c = _canonical_codes(*_HT_DC_CHROMA)
    ac_c = _canonical_codes(*_HT_AC_CHROMA)
    bw = _BitWriter()
    # quantize every component up front (vectorized over all blocks)
    comp_q = []
    for ci, (plane, qt) in enumerate(zip(planes, qts)):
        blocks = _blocks_of(_pad_to_8(plane) - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _DCT8, blocks, _DCT8)
        zz = np.round(coef / qt).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
        comp_q.append(zz)
    if gray:
        _encode_component(comp_q[0], dc_l, ac_l, bw)
    else:
        # 4:4:4, all sampling factors 1 → MCU = one block of each component,
        # interleaved Y Cb Cr per T.81 A.2.3
        n = comp_q[0].shape[0]
        prev = [0, 0, 0]
        tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
        for b in range(n):
            for ci in range(3):
                zz = comp_q[ci][b]
                dct, act = tabs[ci]
                diff = int(zz[0]) - prev[ci]
                prev[ci] = int(zz[0])
                s = _category(diff)
                code, ln = dct[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = act[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, ln = act[0x00]
                    bw.write(code, ln)
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


def jpeg_info(buf: bytes) -> Optional[dict]:
    """Parse the SOF0/SOF1 frame header (None if not a baseline JPEG)."""
    if len(buf) < 4 or buf[:2] != b"\xFF\xD8":
        return None
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack_from(">H", buf, pos + 2)[0]
        if marker in (0xC0, 0xC1):
            prec, h, w, ncomp = struct.unpack_from(">BHHB", buf, pos + 4)
            return dict(width=w, height=h, bit_depth=prec, channels=ncomp)
        if marker == 0xDA:
            return None
        pos += 2 + seglen
    return None


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1      # stuffed byte
                else:
                    raise ValueError("JPEG: unexpected marker in scan")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes → (h, w, channels) uint8 array (1 or 3
    channels, 4:4:4 only; progressive/subsampled streams raise)."""
    if len(buf) < 4 or buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict = {}
    htabs: dict = {}
    frame = None
    comps = []
    scan = None
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG: bad marker sync")
        marker = buf[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        seglen = struct.unpack_from(">H", buf, pos + 2)[0]
        seg = buf[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(seg[o + 1 : o + 65], dtype=np.uint8)
                qtabs[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker in (0xC0, 0xC1):
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("JPEG: only 8-bit baseline supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + c * 3)
                if hv != 0x11:
                    raise ValueError("JPEG: chroma subsampling unsupported (4:4:4 only)")
                comps.append(dict(id=cid, tq=tq))
            frame = (h, w, ncomp)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: non-baseline frame type unsupported")
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                htabs[(tc, th)] = _decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xDD:
            raise ValueError("JPEG: restart intervals unsupported")
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + c * 2], seg[2 + c * 2]
                scan.append((cs, tdta >> 4, tdta & 15))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF/SOS")
    h, w, ncomp = frame
    # entropy-coded data runs from pos to the next real marker (EOI)
    end = len(buf) - 2 if buf.endswith(b"\xFF\xD9") else len(buf)
    br = _BitReader(buf[pos:end])
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    nblocks = bh * bw_
    coefs = [np.zeros((nblocks, 64), dtype=np.int64) for _ in range(ncomp)]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = [(by_id[cs], td, ta) for cs, td, ta in scan]
    prev = [0] * ncomp
    for b in range(nblocks):
        for ci, td, ta in order:
            dct = htabs[(0, td)]
            act = htabs[(1, ta)]
            s = _huff_decode(br, dct)
            diff = _extend(br.receive(s), s) if s else 0
            prev[ci] += diff
            zz = coefs[ci][b]
            zz[0] = prev[ci]
            k = 1
            while k < 64:
                rs = _huff_decode(br, act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break                      # EOB
                k += r
                if k > 63:
                    raise ValueError("JPEG: coefficient index overflow")
                zz[k] = _extend(br.receive(s), s)
                k += 1
    planes = []
    for ci, comp in enumerate(comps):
        qt = qtabs[comp["tq"]]
        deq = np.zeros((nblocks, 64), dtype=np.float64)
        deq[:, _ZIGZAG] = coefs[ci]
        blocks = deq.reshape(-1, 8, 8) * qt
        px = np.einsum("ji,njk,kl->nil", _DCT8, blocks, _DCT8) + 128.0
        plane = (px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw_ * 8))[:h, :w]
        planes.append(plane)
    if ncomp == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
