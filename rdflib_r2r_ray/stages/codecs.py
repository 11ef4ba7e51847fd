"""Real, dependency-free media codecs for the multimodal stages.

The container has no PIL / libvips / ffmpeg, so the round-3 multimodal
stages stubbed "real formats" behind NotImplementedError.  PNG, BMP, GIF,
WAV and RIFF-AVI (uncompressed 'DIB ' video), however, are fully decodable
with the standard library (zlib + struct) and numpy — so those formats get
REAL codecs here, and only formats that genuinely require external
libraries (JPEG/WebP, compressed video codecs) remain stubbed.

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
