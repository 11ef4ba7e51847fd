"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

Decode support: PNG/BMP/GIF/JPEG images, PCM16 WAV audio, and RIFF-AVI
video (uncompressed 'DIB ' streams) decode FOR REAL via the
dependency-free codecs in :mod:`.codecs` (zlib inflate + scanline
unfiltering, DIB rows, GIF LZW, baseline-JPEG Huffman+DCT, RIFF chunk
walking).  The deterministic ``MMB1`` container (see ``pack_payload``)
remains for synthetic corpora whose content features a SQL oracle can
recompute.  Only formats that genuinely require external libraries
(WebP/AVIF, compressed video codecs — H.264/VP9 in MP4/WebM) raise
``NotImplementedError`` at the single clearly-marked point where
PIL/ffmpeg would go.

Scale notes: binary payloads are MBs, so these stages run with small
``batch_size`` (caller passes e.g. 16-64) and actor pools; payload columns
are dropped as soon as features are extracted (``select_columns``) so
shuffles never move raw bytes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data as rd

# module level, NOT function level: worker-side relative imports fail when
# the package ships by value
from .codecs import (avi_info, bmp_info, decode_bmp, decode_gif, decode_jpeg,
                     decode_png, decode_wav, demux_avi, gif_info, jpeg_info,
                     png_info, wav_info)

MAGIC = b"MMB1"
# struct.Struct objects don't pickle (the package ships by value to Ray
# workers), so keep the format string and call module-level struct functions
_HEADER_FMT = "<4s4sIIII"  # magic, kind, width/rate, height/ch, frames, payload_len
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def pack_payload(kind: str, width: int, height: int, frames: int, payload: bytes) -> bytes:
    """Deterministic fake container: a typed header + raw bytes.  Stands in
    for JPEG/WAV/MP4 so the pipeline plumbing is exercised end to end."""
    return struct.pack(_HEADER_FMT, MAGIC, kind.encode()[:4].ljust(4, b"\x00"), width, height, frames, len(payload)) + payload


def unpack_header(buf: bytes):
    if len(buf) < _HEADER_SIZE or buf[:4] != MAGIC:
        return None
    magic, kind, w, h, frames, plen = struct.unpack_from(_HEADER_FMT, buf)
    return dict(kind=kind.rstrip(b"\x00 ").decode(), width=w, height=h, frames=frames, payload_len=plen)


IMAGE_META_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_bytes", pa.int64()),
        pa.field("px_sum", pa.int64()),
        pa.field("sha1", pa.string()),
        pa.field("mean_luma", pa.float64()),
    ]
)


class ImageDecoder:
    """Actor-pool stage: binary image column → typed metadata + features.

    ``__init__`` is where a real pipeline would load the codec / model once
    per actor; here it precomputes the luma weight table.  ``__call__``
    handles a whole batch; unknown containers raise at the marked point."""

    def __init__(self, bin_col: str = "payload", id_col: str = "doc_id", strict: bool = False):
        self.bin_col, self.id_col, self.strict = bin_col, id_col, strict
        self.luma = np.array([0.299, 0.587, 0.114])  # per-actor state

    def decode_pixels(self, header: dict, body: bytes) -> Optional[np.ndarray]:
        if header is not None and header["kind"] == "img":
            n = header["width"] * header["height"] * 3
            px = np.frombuffer(body[: n], dtype=np.uint8)
            if len(px) == n:
                return px.reshape(header["height"], header["width"], 3)
            return None
        if self.strict:
            # formats needing external libraries (WebP/AVIF) would decode
            # here via PIL/libvips; PNG/BMP/GIF/JPEG decode for real below
            raise NotImplementedError("WebP/AVIF image codecs unavailable in this environment")
        return None

    def _decode_real(self, buf: bytes):
        """Real decode paths (dependency-free codecs in ``stages.codecs``):
        PNG, BMP, GIF → (kind, width, height, RGB pixel array) or None."""
        pinfo = png_info(buf)
        if pinfo is not None:
            px = decode_png(buf)
            if px.shape[2] == 1:  # grayscale -> RGB for the luma dot
                px = np.repeat(px, 3, axis=2)
            elif px.shape[2] == 4:
                px = px[:, :, :3]
            elif px.shape[2] == 2:
                px = np.repeat(px[:, :, :1], 3, axis=2)
            return "png", pinfo["width"], pinfo["height"], px
        binfo = bmp_info(buf)
        if binfo is not None:
            return "bmp", binfo["width"], binfo["height"], decode_bmp(buf)
        ginfo = gif_info(buf)
        if ginfo is not None:
            return "gif", ginfo["width"], ginfo["height"], decode_gif(buf)
        jinfo = jpeg_info(buf)
        if jinfo is not None:
            px = decode_jpeg(buf)
            if px.shape[2] == 1:  # grayscale -> RGB for the luma dot
                px = np.repeat(px, 3, axis=2)
            return "jpeg", jinfo["width"], jinfo["height"], px
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch[self.bin_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        rows = {name: [] for name in IMAGE_META_SCHEMA.names}
        for i, buf in zip(ids, bufs):
            buf = buf or b""
            hdr = unpack_header(buf)
            if hdr is None:
                decoded = self._decode_real(buf)
                if decoded is not None:
                    kind, wpx, hpx, px = decoded
                    rows["doc_id"].append(i)
                    rows["kind"].append(kind)
                    rows["width"].append(wpx)
                    rows["height"].append(hpx)
                    rows["n_bytes"].append(len(buf))
                    rows["px_sum"].append(int(px.sum()))
                    rows["sha1"].append(hashlib.sha1(buf).hexdigest())
                    rows["mean_luma"].append(float((px @ self.luma).mean()))
                    continue
            px = self.decode_pixels(hdr, buf[_HEADER_SIZE:] if hdr else b"")
            rows["doc_id"].append(i)
            rows["kind"].append(hdr["kind"] if hdr else "unknown")
            rows["width"].append(hdr["width"] if hdr else 0)
            rows["height"].append(hdr["height"] if hdr else 0)
            rows["n_bytes"].append(len(buf))
            # integer pixel-byte sum: exact content feature (SQL-oracle-able,
            # unlike the float luma) proving decode → pixels round-trip
            rows["px_sum"].append(int(px.sum()) if px is not None else -1)
            rows["sha1"].append(hashlib.sha1(buf).hexdigest())
            rows["mean_luma"].append(float((px @ self.luma).mean()) if px is not None else -1.0)
        return pa.Table.from_pydict(rows, schema=IMAGE_META_SCHEMA)


class ImageResizer:
    """Actor-pool stage: nearest-neighbor resize of MMB1 'img' payloads to a
    fixed (w, h); re-packs the container so downstream stages see the same
    schema.  Real formats would go through the decode stub first."""

    def __init__(self, width: int, height: int, bin_col: str = "payload", id_col: str = "doc_id"):
        self.w, self.h = width, height
        self.bin_col, self.id_col = bin_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[Optional[bytes]] = []
        for buf in batch[self.bin_col].to_pylist():
            buf = buf or b""
            hdr = unpack_header(buf)
            if hdr is None or hdr["kind"] != "img":
                out.append(None)
                continue
            n = hdr["width"] * hdr["height"] * 3
            px = np.frombuffer(buf[_HEADER_SIZE : _HEADER_SIZE + n], dtype=np.uint8)
            if len(px) != n:
                out.append(None)
                continue
            img = px.reshape(hdr["height"], hdr["width"], 3)
            yi = (np.arange(self.h) * hdr["height"] // self.h)
            xi = (np.arange(self.w) * hdr["width"] // self.w)
            resized = img[yi][:, xi]
            out.append(pack_payload("img", self.w, self.h, 1, resized.tobytes()))
        return pa.table({self.id_col: batch[self.id_col], self.bin_col: pa.array(out, pa.binary())})


class ImageAHash:
    """Actor-pool stage: MMB1 'img' payloads → 64-bit perceptual AVERAGE
    HASH (aHash: grayscale each pixel, threshold against the image mean,
    one bit per pixel — the classic near-duplicate-image key; pHash swaps
    the mean threshold for a DCT, same plumbing).  All-integer math
    (channel sum // 3, ``gray·npix >= total`` threshold) so the hash is
    bit-exact and replayable by a SQL oracle over the synthetic pixel
    formula.  Emitted as a bitstring key, ready for a grouped dedup
    exchange."""

    def __init__(self, bin_col: str = "payload", id_col: str = "doc_id"):
        self.bin_col, self.id_col = bin_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[Optional[str]] = []
        for buf in batch[self.bin_col].to_pylist():
            buf = buf or b""
            hdr = unpack_header(buf)
            if hdr is None or hdr["kind"] != "img":
                out.append(None)
                continue
            n = hdr["width"] * hdr["height"] * 3
            px = np.frombuffer(buf[_HEADER_SIZE : _HEADER_SIZE + n], dtype=np.uint8)
            if len(px) != n:
                out.append(None)
                continue
            gray = px.astype(np.int64).reshape(-1, 3).sum(axis=1) // 3
            bits = gray * len(gray) >= gray.sum()
            out.append("".join(np.where(bits, "1", "0").tolist()))
        return pa.table(
            {self.id_col: batch[self.id_col],
             "ahash": pa.array(out, pa.string())})


class ImageDHash:
    """Actor-pool stage: MMB1 'img' payloads → row-gradient DIFFERENCE
    HASH (dHash: grayscale, one bit per horizontally adjacent pixel pair,
    ``gray[r,c+1] > gray[r,c]``) — the near-duplicate key that, unlike
    aHash's global mean threshold, is invariant to uniform brightness
    shifts (each bit compares neighbours, not the image mean).  All-integer
    math ⇒ bit-exact and replayable by a SQL oracle over the synthetic
    pixel formula.  Emits height·(width-1) bits as a bitstring key for a
    grouped dedup exchange."""

    def __init__(self, bin_col: str = "payload", id_col: str = "doc_id"):
        self.bin_col, self.id_col = bin_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[Optional[str]] = []
        for buf in batch[self.bin_col].to_pylist():
            buf = buf or b""
            hdr = unpack_header(buf)
            if hdr is None or hdr["kind"] != "img":
                out.append(None)
                continue
            w, h = hdr["width"], hdr["height"]
            n = w * h * 3
            px = np.frombuffer(buf[_HEADER_SIZE : _HEADER_SIZE + n], dtype=np.uint8)
            if len(px) != n:
                out.append(None)
                continue
            gray = (px.astype(np.int64).reshape(-1, 3).sum(axis=1) // 3).reshape(h, w)
            bits = gray[:, 1:] > gray[:, :-1]
            out.append("".join(np.where(bits.reshape(-1), "1", "0").tolist()))
        return pa.table(
            {self.id_col: batch[self.id_col],
             "dhash": pa.array(out, pa.string())})


class AudioFrameSampler:
    """Actor-pool stage: MMB1 'aud' payloads (int16 PCM) → per-clip frame
    stats sampled every ``hop`` samples (RMS energy proxy). Real audio
    formats would decode via ffmpeg at the marked stub."""

    def __init__(self, hop: int = 1024, bin_col: str = "payload", id_col: str = "doc_id",
                 strict: bool = False):
        self.hop, self.bin_col, self.id_col, self.strict = hop, bin_col, id_col, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List = []
        frame_idx: List[int] = []
        n_samples: List[int] = []
        rms: List[float] = []
        abs_sum: List[int] = []  # integer content feature (SQL-oracle-able)
        for i, buf in zip(batch[self.id_col].to_pylist(), batch[self.bin_col].to_pylist()):
            buf = buf or b""
            hdr = unpack_header(buf)
            if hdr is None and wav_info(buf) is not None:
                # REAL decode path (dependency-free PCM16 WAV codec);
                # multi-channel clips mix down to mono for the frame stats
                samples, _rate, _ch = decode_wav(buf)
                pcm = samples.mean(axis=1).astype(np.int16) if _ch > 1 else samples[:, 0]
            elif hdr is None or hdr["kind"] != "aud":
                if self.strict:
                    raise NotImplementedError(
                        "non-WAV audio codecs unavailable in this environment")
                continue
            else:
                pcm = np.frombuffer(buf[_HEADER_SIZE : _HEADER_SIZE + hdr["payload_len"]], dtype=np.int16)
            for f, start in enumerate(range(0, len(pcm), self.hop)):
                frame = pcm[start : start + self.hop].astype(np.float64)
                ids_out.append(i)
                frame_idx.append(f)
                n_samples.append(len(frame))
                rms.append(float(np.sqrt((frame * frame).mean())) if len(frame) else 0.0)
                abs_sum.append(int(np.abs(frame).sum()))
        return pa.table(
            {
                self.id_col: pa.array(ids_out, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "n_samples": pa.array(n_samples, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "abs_sum": pa.array(abs_sum, pa.int64()),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: video payloads → every ``stride``-th frame's
    integer pixel sum (content feature).  RIFF-AVI containers with
    uncompressed 'DIB ' streams DEMUX FOR REAL (``codecs.demux_avi``);
    MMB1 'vid' payloads (concatenated w×h×3 RGB frames) remain for
    synthetic corpora.  Compressed codecs (H.264/VP9 in MP4/WebM) would
    demux via ffmpeg at the marked stub."""

    def __init__(self, stride: int = 2, bin_col: str = "payload", id_col: str = "doc_id",
                 strict: bool = False):
        self.stride, self.bin_col, self.id_col, self.strict = stride, bin_col, id_col, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List = []
        frame_idx: List[int] = []
        px_sum: List[int] = []
        for i, buf in zip(batch[self.id_col].to_pylist(), batch[self.bin_col].to_pylist()):
            buf = buf or b""
            hdr = unpack_header(buf)
            if hdr is None and avi_info(buf) is not None:
                # REAL demux path (dependency-free RIFF-AVI, DIB frames)
                for f in range(0, len(frames_ := demux_avi(buf)), self.stride):
                    ids_out.append(i)
                    frame_idx.append(f)
                    px_sum.append(int(frames_[f].sum()))
                continue
            if hdr is None or hdr["kind"] != "vid":
                if self.strict:
                    raise NotImplementedError(
                        "compressed video codecs (MP4/H.264/VP9) unavailable in this environment")
                continue
            w, h, n_frames = hdr["width"], hdr["height"], hdr["frames"]
            fsize = w * h * 3
            data = buf[_HEADER_SIZE : _HEADER_SIZE + hdr["payload_len"]]
            for f in range(0, n_frames, self.stride):
                frame = np.frombuffer(data[f * fsize : (f + 1) * fsize], dtype=np.uint8)
                if len(frame) != fsize:
                    continue
                ids_out.append(i)
                frame_idx.append(f)
                px_sum.append(int(frame.sum()))
        return pa.table(
            {
                self.id_col: pa.array(ids_out, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "px_sum": pa.array(px_sum, pa.int64()),
            }
        )


def synthesize_payloads(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Deterministic fake media per document (test/bench corpus synthesis):
    an 8×8 RGB image with pixel j = (doc_id·31 + j·7) mod 256 — pure id
    arithmetic, so a SQL oracle can recompute content features
    (``SELECT SUM((doc_id*31 + j*7)%256) ...``) without decoding bytes."""
    ids = batch[id_col].to_pylist()
    payloads: List[bytes] = []
    j = np.arange(8 * 8 * 3, dtype=np.int64)
    for i in ids:
        px = ((i * 31 + j * 7) % 256).astype(np.uint8)
        payloads.append(pack_payload("img", 8, 8, 1, px.tobytes()))
    return pa.table({id_col: pa.array(ids, pa.int64()), "payload": pa.array(payloads, pa.binary())})


class AudioEnergyTrimmer:
    """Actor-pool stage: MMB1 'aud' payloads (int16 PCM) → SILENCE-TRIM
    stats per clip (frame size ``hop``): frame count, active-frame count,
    first/last non-silent frame index (−1 when the whole clip is silent)
    and total energy — the lead-in/lead-out trimming primitive of speech
    curation (VAD's integer-exact little sibling).  Frame energy is the
    exact int64 Σ pcm² via one ``np.add.reduceat`` per clip — no
    per-sample Python, and fully SQL-replayable when the PCM is integer
    arithmetic."""

    def __init__(self, hop: int = 1024, bin_col: str = "payload",
                 id_col: str = "doc_id"):
        self.hop, self.bin_col, self.id_col = hop, bin_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, na, fa, la, te = [], [], [], [], [], []
        for i, buf in zip(batch[self.id_col].to_pylist(),
                          batch[self.bin_col].to_pylist()):
            buf = buf or b""
            hdr = unpack_header(buf)
            if hdr is None or hdr["kind"] != "aud":
                continue
            pcm = np.frombuffer(
                buf[_HEADER_SIZE : _HEADER_SIZE + hdr["payload_len"]],
                dtype=np.int16).astype(np.int64)
            if len(pcm) == 0:
                continue
            offs = np.arange(0, len(pcm), self.hop)
            e = np.add.reduceat(pcm * pcm, offs)
            act = np.nonzero(e > 0)[0]
            ids.append(i)
            nf.append(len(offs))
            na.append(len(act))
            fa.append(int(act[0]) if len(act) else -1)
            la.append(int(act[-1]) if len(act) else -1)
            te.append(int(e.sum()))
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
            "n_active": pa.array(na, pa.int64()),
            "first_active": pa.array(fa, pa.int64()),
            "last_active": pa.array(la, pa.int64()),
            "total_energy": pa.array(te, pa.int64()),
        })


class SceneCutDetector:
    """Actor-pool stage: video payloads → per-consecutive-frame absolute
    pixel-difference sums + cut flags (``diff_sum ≥ threshold``) — the
    shot-boundary / keyframe-selection primitive of video curation
    pipelines.  RIFF-AVI containers demux FOR REAL (``codecs.demux_avi``);
    MMB1 'vid' payloads decode by frame slicing.  One numpy ``diff`` over
    the stacked frame matrix per payload — no per-pixel Python."""

    def __init__(self, threshold: int = 1, bin_col: str = "payload",
                 id_col: str = "doc_id"):
        self.threshold, self.bin_col, self.id_col = threshold, bin_col, id_col

    def _frames(self, buf: bytes) -> Optional[np.ndarray]:
        hdr = unpack_header(buf)
        if hdr is None and avi_info(buf) is not None:
            fr = demux_avi(buf)
            return np.stack([f.reshape(-1) for f in fr]) if fr else None
        if hdr is None or hdr["kind"] != "vid":
            return None
        w, h, n = hdr["width"], hdr["height"], hdr["frames"]
        fsize = w * h * 3
        data = buf[_HEADER_SIZE : _HEADER_SIZE + hdr["payload_len"]]
        if len(data) < n * fsize:
            return None
        return np.frombuffer(data[: n * fsize], np.uint8).reshape(n, fsize)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List = []
        frame_idx: List[int] = []
        diffs: List[int] = []
        for i, buf in zip(batch[self.id_col].to_pylist(),
                          batch[self.bin_col].to_pylist()):
            m = self._frames(buf or b"")
            if m is None or len(m) < 2:
                continue
            d = np.abs(np.diff(m.astype(np.int64), axis=0)).sum(axis=1)
            ids_out.extend([i] * len(d))
            frame_idx.extend(range(1, len(d) + 1))
            diffs.extend(int(x) for x in d)
        diff_arr = np.asarray(diffs, np.int64) if diffs else np.empty(0, np.int64)
        return pa.table({
            self.id_col: pa.array(ids_out, pa.int64()),
            "frame": pa.array(frame_idx, pa.int32()),
            "diff_sum": pa.array(diff_arr),
            "is_cut": pa.array((diff_arr >= self.threshold).astype(np.int64)),
        })
