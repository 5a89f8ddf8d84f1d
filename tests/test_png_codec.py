"""Pure-Python PNG/WAV codec: the REAL multimodal decode path that
works in this container with no external library. The oracle strategy
relies on these being exact, so the filters and the closed-form payload
formulas are pinned here."""

import struct
import zlib

import numpy as np

from icat_lucene_ray.ops.multimodal import (
    _decode_audio_real, _decode_image_real, decode_png, encode_png,
    iter_png_video, make_png_image, make_png_video, make_wav_audio)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def test_roundtrip_shapes():
    rng = np.random.default_rng(1)
    for shape in [(24, 32, 3), (5, 7, 1), (4, 4, 4), (1, 1, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px), shape


def test_all_five_filters_reconstruct():
    """Hand-encode one image using a different filter per scanline
    (None/Sub/Up/Average/Paeth cycling) — the reader must reconstruct
    the original pixels exactly, including the mod-256 chaining of
    left-dependent predictions."""
    h, w, c = 6, 8, 3
    src = np.random.default_rng(2).integers(0, 256, (h, w, c),
                                            dtype=np.uint8).astype(np.int64)
    rows = []
    for y in range(h):
        cur = src[y].reshape(-1)
        prev = src[y - 1].reshape(-1) if y else np.zeros(w * c, np.int64)
        ft = y % 5
        line = np.empty(w * c, np.int64)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                line[x] = cur[x]
            elif ft == 1:
                line[x] = cur[x] - a
            elif ft == 2:
                line[x] = cur[x] - b
            elif ft == 3:
                line[x] = cur[x] - (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else cc)
                line[x] = cur[x] - pred
        rows.append(bytes([ft]) + bytes((line & 0xFF).astype(np.uint8)))
    blob = (_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(blob), src.astype(np.uint8))


def test_closed_form_image_formula():
    """Decoded pixels of make_png_image equal the documented formula —
    the invariant the mm_image_features SQL oracle recomputes."""
    px = decode_png(make_png_image(42))
    i = np.arange(32 * 24 * 3, dtype=np.int64)
    ref = ((42 * 1009 + i * 31) % 256).astype(np.uint8).reshape(24, 32, 3)
    assert np.array_equal(px, ref)


def test_decode_image_real_handles_png_without_pil():
    out = _decode_image_real(make_png_image(3))
    assert out.shape == (24, 32, 3)
    assert np.array_equal(out, decode_png(make_png_image(3)))


def test_png_video_container():
    frames = list(iter_png_video(make_png_video(8, n_frames=4)))
    assert len(frames) == 4 and frames[0].shape == (6, 8, 3)
    i = np.arange(6 * 8 * 3, dtype=np.int64)
    ref = ((8001 * 1009 + i * 31) % 256).astype(np.uint8).reshape(6, 8, 3)
    assert np.array_equal(frames[1], ref)  # frame f keyed by id*1000+f


def test_wav_closed_form():
    x, sr = _decode_audio_real(make_wav_audio(12))
    assert sr == 16000 and len(x) == 4800
    i = np.arange(4800, dtype=np.int64)
    ref = ((12 * 7919 + i * 631) % 65536 - 32768) / 32768.0
    assert np.allclose(x, ref, atol=0)


def test_decode_png_rejects_non_png():
    import pytest

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
