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


def make_fake_video(doc_id: int, n_frames: int = 24, width: int = 8,
                    height: int = 6, channels: int = 3) -> bytes:
    """Deterministic fake video container: ``<I frame_count`` header +
    that many fake-image frames back to back."""
    frames = b"".join(
        make_fake_image(doc_id * 1000 + f, width, height, channels)
        for f in range(n_frames))
    return struct.pack("<I", n_frames) + frames


def _decode_video_real(blob: bytes):
    raise NotImplementedError(
        "real video decode needs ffmpeg — not available in this "
        "container; the fake-container decoder exercises the pipeline"
    )


class FrameSampler:
    """Video frame-sampling plumbing (flat-map shape): one INPUT row per
    video, one OUTPUT row per sampled frame (every ``stride``-th), each
    carrying the frame's feature vector — the layout a frame-level
    training pipeline consumes. Real ffmpeg decode is stubbed; the fake
    container (``make_fake_video``) exercises schema/batching. Use a
    SMALL batch_size: videos are the largest payloads in the corpus."""

    def __init__(self, blob_col: str = "video", id_col: str = "doc_id",
                 stride: int = 10, use_fake: bool = True):
        self.blob_col, self.id_col, self.stride = blob_col, id_col, stride
        if not use_fake:
            _decode_video_real(b"")  # raises: real decode unavailable

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_feat = [], [], []
        for did, blob in zip(batch[self.id_col].to_pylist(),
                             batch[self.blob_col].to_pylist()):
            n_frames = struct.unpack_from("<I", blob, 0)[0]
            off = 4
            frame_offsets = []
            for _f in range(n_frames):
                frame_offsets.append(off)
                _m, w, h, c = _HDR.unpack_from(blob, off)
                off += _HDR.size + w * h * c
            for f in range(0, n_frames, self.stride):
                px, _meta = decode_fake_image(blob[frame_offsets[f]:])
                out_id.append(did)
                out_frame.append(f)
                out_feat.append(
                    [float(px[:, :, ch].mean()) for ch in range(px.shape[2])])
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame_feat": pa.array(out_feat, pa.list_(pa.float64())),
        })


# ---------------------------------------------------------------------------
# audio plumbing
# ---------------------------------------------------------------------------

_AHDR = struct.Struct("<4sII")  # magic, sample_rate, n_samples
_AMAGIC = b"FAUD"


def make_fake_audio(doc_id: int, n_samples: int = 4800,
                    sample_rate: int = 16000) -> bytes:
    """Deterministic fake waveform: header + int16 samples derived from
    a keyed hash (stands in for a real PCM/opus payload)."""
    seed = hashlib.blake2b(str(doc_id).encode(), digest_size=8).digest()
    reps = -(-n_samples * 2 // 8)
    body = (seed * reps)[: n_samples * 2]
    return _AHDR.pack(_AMAGIC, sample_rate, n_samples) + body


def _decode_audio_real(blob: bytes):
    raise NotImplementedError(
        "real audio decode needs torchaudio/ffmpeg — not available in "
        "this container; the fake-format decoder exercises the pipeline"
    )


class AudioFeaturizer:
    """Actor-pool audio stage: decodes the (fake) waveform, emits
    metadata (sample rate, duration) + a per-window RMS-energy feature
    vector — the schema/batching shape of a real MFCC/embedding stage.
    Use a small batch_size: audio rows are large."""

    def __init__(self, blob_col: str = "audio", n_windows: int = 8,
                 use_fake: bool = True):
        self.blob_col, self.n_windows = blob_col, n_windows
        if not use_fake:
            _decode_audio_real(b"")

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats = [], []
        for blob in batch[self.blob_col].to_pylist():
            magic, sr, n = _AHDR.unpack_from(blob, 0)
            if magic != _AMAGIC:
                raise ValueError("not a fake audio blob")
            x = np.frombuffer(blob, np.int16, count=n, offset=_AHDR.size) \
                .astype(np.float64) / 32768.0
            w = max(1, n // self.n_windows)
            rms = [float(np.sqrt(np.mean(x[i * w:(i + 1) * w] ** 2)))
                   for i in range(self.n_windows) if len(x[i * w:(i + 1) * w])]
            metas.append({"sample_rate": sr, "n_samples": n,
                          "duration_s": n / sr})
            feats.append(rms)
        out = batch.drop_columns([self.blob_col])
        out = out.append_column("audio_meta", pa.array(
            metas, pa.struct([("sample_rate", pa.int32()),
                              ("n_samples", pa.int32()),
                              ("duration_s", pa.float64())])))
        return out.append_column("audio_feat",
                                 pa.array(feats, pa.list_(pa.float64())))
