"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the actual pixel/sample decode is STUBBED behind
``NotImplementedError`` with a deterministic fake used in tests; the
Ray-side plumbing — schema, small-batch actor stages, output layout —
is real and tested. Swap ``_decode_image_real`` for a real decoder in
production.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

#: fake 16-byte header our synthetic blobs carry: magic, width, height, chans
_MAGIC = b"FIMG"
_HDR = struct.Struct("<4sIII")

IMAGE_META_SCHEMA = pa.struct([
    ("width", pa.int32()), ("height", pa.int32()), ("channels", pa.int32()),
    ("format", pa.string()),
])


def make_fake_image(doc_id: int, width: int = 32, height: int = 24,
                    channels: int = 3) -> bytes:
    """Deterministic fake blob: header + blake2b-keyed pseudo-pixels."""
    seed = hashlib.blake2b(str(doc_id).encode(), digest_size=8).digest()
    n = width * height * channels
    reps = -(-n // 8)
    body = (seed * reps)[:n]
    return _HDR.pack(_MAGIC, width, height, channels) + body


def _decode_image_real(blob: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real image decode needs PIL/libjpeg — not available in this "
        "container; the fake-format decoder below exercises the pipeline"
    )


def decode_fake_image(blob: bytes) -> tuple[np.ndarray, dict]:
    magic, w, h, c = _HDR.unpack_from(blob, 0)
    if magic != _MAGIC:
        raise ValueError("not a fake image blob")
    px = np.frombuffer(blob, np.uint8, count=w * h * c, offset=_HDR.size)
    return px.reshape(h, w, c), {"width": w, "height": h, "channels": c,
                                 "format": "fimg"}


class ImageDecoder:
    """Actor-pool decode stage. Small ``batch_size`` is the point: binary
    payloads are MBs/row, so batch × concurrency must fit worker heaps
    (ray_guide memory notes). Emits metadata + a feature vector
    (channel-mean histogram) per image."""

    def __init__(self, blob_col: str = "image", use_fake: bool = True):
        self.blob_col = blob_col
        self.decode = decode_fake_image if use_fake else _wrap_real()

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats = [], []
        for blob in batch[self.blob_col].to_pylist():
            px, meta = self.decode(blob)
            metas.append(meta)
            hist = [float(px[:, :, ch].mean()) for ch in range(px.shape[2])]
            feats.append(hist)
        out = batch.drop_columns([self.blob_col])  # blobs don't flow on
        out = out.append_column("image_meta", pa.array(metas, IMAGE_META_SCHEMA))
        out = out.append_column("image_feat",
                                pa.array(feats, pa.list_(pa.float64())))
        return out


def _wrap_real():
    def f(blob: bytes):
        px = _decode_image_real(blob)
        h, w, c = px.shape
        return px, {"width": w, "height": h, "channels": c, "format": "real"}

    return f


class FrameSampler:
    """Video frame-sampling plumbing: treats the blob as a sequence of
    fake-image frames; samples every ``stride``-th frame. Real ffmpeg
    decode is stubbed the same way."""

    def __init__(self, blob_col: str = "video", stride: int = 10):
        self.blob_col, self.stride = blob_col, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = []
        for blob in batch[self.blob_col].to_pylist():
            # fake container: frame count in first 4 bytes
            n_frames = struct.unpack_from("<I", blob, 0)[0]
            counts.append(len(range(0, n_frames, self.stride)))
        out = batch.drop_columns([self.blob_col])
        return out.append_column("sampled_frames",
                                 pa.array(counts, pa.int32()))
