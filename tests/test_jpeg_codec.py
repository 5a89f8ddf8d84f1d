"""Pure-Python baseline JPEG codec — the second real in-container image
decode path (PNG is the first). Lossy format, so the oracles are: exact
round-trip for DC-only content, PSNR floors for smooth content, marker
plumbing (dims, grayscale/RGB, odd sizes, byte stuffing)."""

import numpy as np
import pytest

from icat_lucene_ray.ops.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_flat_blocks_roundtrip_exact():
    """DC-only content survives quantization exactly — pins the marker
    segments, Huffman tables, DC prediction and IDCT scaling."""
    for val, shape in [(128, (16, 24, 3)), (200, (13, 19, 3)),
                       (90, (8, 8))]:
        img = np.full(shape, val, np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape[:2] == shape[:2]
        assert np.abs(out.astype(int) - val).max() == 0, (val, shape)


def test_smooth_gradient_psnr():
    x = np.linspace(0, 255, 64)
    grad = np.tile(x, (48, 1))
    img = np.stack([grad, grad[:, ::-1], np.full_like(grad, 77)],
                   axis=2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 35.0


def test_grayscale_and_odd_dims():
    g = np.random.default_rng(0).integers(0, 256, (24, 32), np.uint8)
    dg = decode_jpeg(encode_jpeg(g))
    assert dg.shape == (24, 32, 1)
    o = np.random.default_rng(1).integers(0, 256, (13, 19, 3), np.uint8)
    assert decode_jpeg(encode_jpeg(o)).shape == (13, 19, 3)


def test_deterministic_bytes():
    img = np.random.default_rng(2).integers(0, 256, (16, 16, 3), np.uint8)
    assert encode_jpeg(img) == encode_jpeg(img)


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")
    # progressive (SOF2) must raise NotImplementedError, not mis-decode
    blob = bytearray(encode_jpeg(np.full((8, 8), 1, np.uint8)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_real_image_decoder_routes_jpeg():
    from icat_lucene_ray.ops.multimodal import _decode_image_real

    img = np.full((8, 16, 3), 128, np.uint8)
    out = _decode_image_real(encode_jpeg(img))
    assert out.shape == (8, 16, 3)
    assert np.abs(out.astype(int) - 128).max() == 0


def test_truncated_jpeg_raises_valueerror():
    """Corrupt input fails with ValueError, not a raw IndexError —
    the error contract actor-pool decode stages catch on."""
    img = np.random.default_rng(1).integers(0, 256, (16, 16, 3), np.uint8)
    blob = encode_jpeg(img)
    # cut inside a header segment
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])
    # cut inside the entropy-coded stream (past SOS, before EOI)
    sos = blob.find(b"\xff\xda")
    assert sos > 0
    with pytest.raises(ValueError):
        decode_jpeg(blob[: sos + 20])
