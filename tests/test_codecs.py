"""Dependency-free PNG/WAV codecs: round-trips, all five PNG filter types,
and the multimodal stages' real-decode paths."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from rdflib_r2r_ray.stages.codecs import (
    decode_png, decode_wav, encode_png, encode_wav, png_info, wav_info)


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    img = _rng(ch).integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
    buf = encode_png(img)
    info = png_info(buf)
    assert info["width"] == 9 and info["height"] == 13 and info["channels"] == ch
    out = decode_png(buf)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _encode_with_filters(img: np.ndarray, ftypes) -> bytes:
    """Test-local PNG encoder applying a GIVEN filter type per scanline
    (the library encoder always writes filter 0) — exercises the decoder's
    Sub/Up/Average/Paeth unfiltering."""
    h, w, ch = img.shape
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        for i in range(stride):
            left = int(cur[i - ch]) if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                v = cur[i]
            elif ft == 1:
                v = cur[i] - left
            elif ft == 2:
                v = cur[i] - up
            elif ft == 3:
                v = cur[i] - ((left + up) >> 1)
            else:
                v = cur[i] - paeth(left, up, ul)
            raw.append(v & 0xFF)
        prev = cur

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decoder_handles_all_filter_types():
    img = _rng(11).integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        buf = _encode_with_filters(img, ftypes)
        assert np.array_equal(decode_png(buf), img), f"filters {ftypes}"


def test_png_rejects_non_png_and_bad_variants():
    assert png_info(b"JFIF....") is None
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")


def test_wav_roundtrip_mono_and_stereo():
    mono = (_rng(3).integers(-500, 500, size=4096)).astype(np.int16)
    buf = encode_wav(mono, rate=16000)
    info = wav_info(buf)
    assert info["rate"] == 16000 and info["channels"] == 1 and info["bits"] == 16
    out, rate, ch = decode_wav(buf)
    assert rate == 16000 and ch == 1
    assert np.array_equal(out[:, 0], mono)

    stereo = (_rng(4).integers(-500, 500, size=(1024, 2))).astype(np.int16)
    out2, rate2, ch2 = decode_wav(encode_wav(stereo, rate=8000))
    assert rate2 == 8000 and ch2 == 2 and np.array_equal(out2, stereo)


def test_image_decoder_real_png_batch(ray_session):
    from rdflib_r2r_ray.stages.multimodal import ImageDecoder

    imgs = [_rng(i).integers(0, 256, size=(5, 4, 3), dtype=np.uint8) for i in range(3)]
    batch = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "payload": pa.array([encode_png(im) for im in imgs], pa.binary()),
    })
    out = ImageDecoder()(batch)
    assert out["kind"].to_pylist() == ["png"] * 3
    assert out["width"].to_pylist() == [4] * 3 and out["height"].to_pylist() == [5] * 3
    assert out["px_sum"].to_pylist() == [int(im.sum()) for im in imgs]


def test_audio_sampler_real_wav_batch(ray_session):
    from rdflib_r2r_ray.stages.multimodal import AudioFrameSampler

    pcm = np.arange(-1024, 1536, dtype=np.int16)  # 2560 samples -> 3 frames
    batch = pa.table({
        "doc_id": pa.array([42], pa.int64()),
        "payload": pa.array([encode_wav(pcm)], pa.binary()),
    })
    out = AudioFrameSampler(hop=1024)(batch)
    assert out["frame"].to_pylist() == [0, 1, 2]
    assert out["n_samples"].to_pylist() == [1024, 1024, 512]
    assert out["abs_sum"].to_pylist() == [
        int(np.abs(pcm[:1024]).sum()),
        int(np.abs(pcm[1024:2048]).sum()),
        int(np.abs(pcm[2048:]).sum()),
    ]


# ---------------------------------------------------------------------------
# BMP / GIF / AVI codecs
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_and_padding():
    from rdflib_r2r_ray.stages.codecs import bmp_info, decode_bmp, encode_bmp

    # width 9 → 27-byte rows padded to 28: exercises the 4-byte row padding
    img = _rng(3).integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    buf = encode_bmp(img)
    info = bmp_info(buf)
    assert info["width"] == 9 and info["height"] == 5 and info["bits"] == 24
    assert np.array_equal(decode_bmp(buf), img)
    assert bmp_info(b"not a bmp") is None


def test_gif_lzw_roundtrip_including_table_growth():
    from rdflib_r2r_ray.stages.codecs import decode_gif, encode_gif, gif_info

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    # enough pixels that the LZW code width grows past its initial 9 bits
    idx = _rng(11).integers(0, 256, size=(40, 50), dtype=np.uint8)
    buf = encode_gif(idx, pal)
    info = gif_info(buf)
    assert info["width"] == 50 and info["height"] == 40
    assert np.array_equal(decode_gif(buf), pal[idx])
    # small palette (non-power-of-2 count) path
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx4 = _rng(3).integers(0, 3, size=(7, 6), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx4, pal4)), pal4[idx4])
    assert gif_info(b"JFIF") is None


def test_avi_demux_roundtrip():
    from rdflib_r2r_ray.stages.codecs import avi_info, demux_avi, encode_avi

    frames = [_rng(f).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
              for f in range(4)]
    buf = encode_avi(frames, fps=25)
    info = avi_info(buf)
    assert (info["width"], info["height"], info["frames"]) == (5, 6, 4)
    assert info["us_per_frame"] == 1000000 // 25
    out = demux_avi(buf)
    assert len(out) == 4
    for a, b in zip(out, frames):
        assert np.array_equal(a, b)
    assert avi_info(b"RIFFxxxxWAVE") is None


def test_image_decoder_real_bmp_gif_batch(ray_session):
    from rdflib_r2r_ray.stages.codecs import encode_bmp, encode_gif
    from rdflib_r2r_ray.stages.multimodal import ImageDecoder

    img = _rng(5).integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    idx = _rng(6).integers(0, 256, size=(3, 7), dtype=np.uint8)
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_bmp(img), encode_gif(idx, pal)], pa.binary()),
    })
    out = ImageDecoder()(batch)
    assert out["kind"].to_pylist() == ["bmp", "gif"]
    assert out["width"].to_pylist() == [6, 7]
    assert out["px_sum"].to_pylist() == [int(img.sum()), 3 * int(idx.sum())]


def test_video_sampler_real_avi_batch(ray_session):
    from rdflib_r2r_ray.stages.codecs import encode_avi
    from rdflib_r2r_ray.stages.multimodal import VideoFrameSampler

    frames = [np.full((2, 2, 3), f + 1, dtype=np.uint8) for f in range(5)]
    batch = pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "payload": pa.array([encode_avi(frames)], pa.binary()),
    })
    out = VideoFrameSampler(stride=2)(batch)
    assert out["frame"].to_pylist() == [0, 2, 4]
    assert out["px_sum"].to_pylist() == [12 * 1, 12 * 3, 12 * 5]


# ---------------------------------------------------------------------------
# JPEG codec (baseline sequential, T.81)
# ---------------------------------------------------------------------------

def test_jpeg_dc_only_blocks_roundtrip_exactly():
    """Per-8x8-block-constant EVEN pixel values survive the full lossy path
    exactly at quality 50 (luma DC quantizer 16) — the invariant the
    mm_image_jpeg_meta SQL oracle relies on."""
    from rdflib_r2r_ray.stages.codecs import decode_jpeg, encode_jpeg, jpeg_info

    vals = (2 * _rng(7).integers(0, 128, size=(3, 4))).astype(np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    buf = encode_jpeg(img, quality=50)
    info = jpeg_info(buf)
    assert (info["width"], info["height"], info["channels"]) == (32, 24, 1)
    assert np.array_equal(decode_jpeg(buf)[:, :, 0], img)
    assert jpeg_info(b"\x89PNG") is None


def test_jpeg_gray_and_rgb_lossy_roundtrip_bounded():
    from rdflib_r2r_ray.stages.codecs import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 64)
    gray = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=90))[:, :, 0]
    err = np.abs(out.astype(int) - gray.astype(int))
    assert err.max() <= 12 and err.mean() < 3

    yy, xx = np.mgrid[0:40, 0:56]
    rgb = np.stack([(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256],
                   axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert out.shape == (40, 56, 3)
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.max() <= 40 and err.mean() < 4


def test_jpeg_odd_size_and_noise():
    from rdflib_r2r_ray.stages.codecs import decode_jpeg, encode_jpeg

    img = _rng(13).integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(img, quality=85)).shape == (9, 13, 3)
    noisy = _rng(14).integers(0, 256, size=(16, 16), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy, quality=95))[:, :, 0]
    # noise is the worst case for DCT coding; q95 keeps it within ~8 levels
    assert np.abs(out.astype(int) - noisy.astype(int)).max() <= 16


def test_image_decoder_real_jpeg_batch(ray_session):
    from rdflib_r2r_ray.stages.codecs import encode_jpeg
    from rdflib_r2r_ray.stages.multimodal import ImageDecoder

    vals = (2 * _rng(21).integers(0, 128, size=(2, 2))).astype(np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    batch = pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "payload": pa.array([encode_jpeg(img, quality=50)], pa.binary()),
    })
    out = ImageDecoder()(batch)
    assert out["kind"].to_pylist() == ["jpeg"]
    assert out["width"].to_pylist() == [16] and out["height"].to_pylist() == [16]
    # gray → RGB repeat inside the decoder
    assert out["px_sum"].to_pylist() == [3 * int(img.sum())]


def test_turtle_roundtrip_nasty_terms(ray_session, tmp_path):
    """Turtle sink → source round-trip is byte-exact on the storage form:
    prefix compression, 'a' for rdf:type, ';' predicate lists, bnodes,
    escaped literals (quotes/newlines/tabs/backslashes), literals that LOOK
    like terminators or IRIs, @lang and ^^xsd decorations."""
    import ray.data as rd

    from rdflib_r2r_ray.sources.tables import read_turtle
    from rdflib_r2r_ray.state.checkpoint import write_turtle

    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        ("<http://kg.ex/doc/1>",
         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         "<http://kg.ex/c/Document>"),
        ("<http://kg.ex/doc/1>", "<http://kg.ex/p/lang>", "en"),
        ("<http://kg.ex/doc/1>", "<http://kg.ex/p/note>",
         'he said "hi" .\nnew\tline\\slash'),
        ("<http://kg.ex/doc/1>", "<http://kg.ex/p/n_chars>",
         f'"42"^^<{XSD}integer>'),
        ("<http://kg.ex/doc/2>", "<http://kg.ex/p/label>", '"bonjour"@fr'),
        ("_:b7", "<http://kg.ex/p/lang>", "de ; tricky ."),
        ("<http://kg.ex/doc/2>", "<http://other.org/x#y>",
         "<http://kg.ex/doc/1>"),
        ("<http://kg.ex/weird/3>", "<http://kg.ex/p/v>", "looks like <iri>"),
    ]
    t = pa.table({"subj": [r[0] for r in rows],
                  "pred": [r[1] for r in rows],
                  "obj": [r[2] for r in rows]})
    out = str(tmp_path / "ttl")
    write_turtle(rd.from_arrow(t).repartition(3), out,
                 prefixes={"kgd": "http://kg.ex/doc/",
                           "kgp": "http://kg.ex/p/",
                           "kgc": "http://kg.ex/c/", "xsd": XSD},
                 num_partitions=2, resume=False)
    back = read_turtle(out).to_pandas()
    got = set(map(tuple, back.itertuples(index=False)))
    assert got == set(rows)
    # the compression actually happened: shards contain prefixed names and
    # predicate-list continuations, and rdf:type became 'a'
    import glob

    body = "".join(open(f).read()
                   for f in glob.glob(out + "/**/data.ttl", recursive=True))
    assert "kgd:1 a kgc:Document" in body or "\n    a kgc:Document" in body
    assert "kgp:lang" in body and " ;\n" in body
    assert '"42"^^xsd:integer' in body


def test_image_ahash_bits_and_nulls():
    """aHash semantics: mean-threshold bits (>= sets the bit), bitstring
    length 64, and non-image payloads hash to null."""
    import numpy as np

    from rdflib_r2r_ray.stages.multimodal import ImageAHash, pack_payload

    dark_bright = np.zeros((64, 3), np.uint8)
    dark_bright[32:] = 200
    flat = np.full((64, 3), 7, np.uint8)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([
            pack_payload("img", 8, 8, 1, dark_bright.tobytes()),
            pack_payload("img", 8, 8, 1, flat.tobytes()),
            b"notamedia",
        ], pa.binary()),
    })
    out = ImageAHash()(batch)
    h = out["ahash"].to_pylist()
    assert h[0] == "0" * 32 + "1" * 32
    assert h[1] == "1" * 64  # equality with the mean sets the bit
    assert h[2] is None
