"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata.

Real decoders are GUARDED behind import/binary probes so a production
container that carries the libraries gets real decode with no code
change: images via PIL when importable, audio via the stdlib ``wave``
reader (PCM WAV works even in this container), video behind an ffmpeg
probe. Where the probe fails, decode raises ``NotImplementedError`` and
the deterministic fake formats (used by tests and the rows-only driver
checks) exercise the identical Ray-side plumbing — schema, small-batch
actor stages, output layout.
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
    """Decode a real image payload (PNG/JPEG/…) via PIL when the library
    is present; otherwise raise so callers fall back to the fake-format
    path (tests) or fail loudly (production misconfiguration)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - container lacks PIL
        raise NotImplementedError(
            "real image decode needs PIL/libjpeg — not installed in this "
            "container; the fake-format decoder exercises the pipeline"
        ) from e
    import io

    img = Image.open(io.BytesIO(blob))
    px = np.asarray(img)
    if px.ndim == 2:  # grayscale -> 1-channel
        px = px[:, :, None]
    return px


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
        if not use_fake and not have_image_decoder():
            _decode_image_real(b"")  # fail fast: PIL missing
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


def have_image_decoder() -> bool:
    """True when real image decode (PIL) is importable here."""
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def have_video_decoder() -> bool:
    """True when an ffmpeg binary is on PATH for real video decode."""
    import shutil

    return shutil.which("ffmpeg") is not None


def make_fake_video(doc_id: int, n_frames: int = 24, width: int = 8,
                    height: int = 6, channels: int = 3) -> bytes:
    """Deterministic fake video container: ``<I frame_count`` header +
    that many fake-image frames back to back."""
    frames = b"".join(
        make_fake_image(doc_id * 1000 + f, width, height, channels)
        for f in range(n_frames))
    return struct.pack("<I", n_frames) + frames


def _decode_video_real(blob: bytes) -> np.ndarray:
    """All frames of a real container (mp4/webm/…) as (n, h, w, 3)
    uint8, via an ffmpeg rawvideo pipe — used only when the binary
    probe passes (no ffmpeg in this test container)."""
    if not have_video_decoder():
        raise NotImplementedError(
            "real video decode needs ffmpeg — not on PATH in this "
            "container; the fake-container decoder exercises the pipeline"
        )
    import json
    import subprocess

    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height", "-of", "json", "pipe:0"],
        input=blob, capture_output=True, check=True)
    st = json.loads(probe.stdout)["streams"][0]
    w, h = int(st["width"]), int(st["height"])
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", "pipe:0", "-f", "rawvideo",
         "-pix_fmt", "rgb24", "pipe:1"],
        input=blob, capture_output=True, check=True)
    arr = np.frombuffer(out.stdout, np.uint8)
    n = len(arr) // (w * h * 3)
    return arr[: n * w * h * 3].reshape(n, h, w, 3)


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
        self.use_fake = use_fake
        if not use_fake and not have_video_decoder():
            _decode_video_real(b"")  # raises: real decode unavailable

    def _sampled_frames(self, blob: bytes):
        """(frame_idx, pixels) pairs at every ``stride``-th frame."""
        if not self.use_fake:
            px = _decode_video_real(blob)
            for f in range(0, px.shape[0], self.stride):
                yield f, px[f]
            return
        n_frames = struct.unpack_from("<I", blob, 0)[0]
        off = 4
        frame_offsets = []
        for _f in range(n_frames):
            frame_offsets.append(off)
            _m, w, h, c = _HDR.unpack_from(blob, off)
            off += _HDR.size + w * h * c
        for f in range(0, n_frames, self.stride):
            px, _meta = decode_fake_image(blob[frame_offsets[f]:])
            yield f, px

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_feat = [], [], []
        for did, blob in zip(batch[self.id_col].to_pylist(),
                             batch[self.blob_col].to_pylist()):
            for f, px in self._sampled_frames(blob):
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


def _decode_audio_real(blob: bytes) -> tuple[np.ndarray, int]:
    """(mono float64 samples in [-1, 1), sample_rate) of a REAL PCM WAV
    payload via the stdlib ``wave`` reader — no external library, so
    this real path works (and is tested) even in this container.
    Compressed formats (opus/mp3) would need ffmpeg; they raise."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(blob)) as w:
            nch, width, sr = w.getnchannels(), w.getsampwidth(), \
                w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            "real audio decode handles PCM WAV only (stdlib wave); "
            "compressed formats need ffmpeg/torchaudio — not in this "
            "container"
        ) from e
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:  # unsigned 8-bit PCM
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)  # downmix to mono
    return x, sr


class AudioFeaturizer:
    """Actor-pool audio stage: decodes the (fake) waveform, emits
    metadata (sample rate, duration) + a per-window RMS-energy feature
    vector — the schema/batching shape of a real MFCC/embedding stage.
    Use a small batch_size: audio rows are large."""

    def __init__(self, blob_col: str = "audio", n_windows: int = 8,
                 use_fake: bool = True):
        self.blob_col, self.n_windows = blob_col, n_windows
        self.use_fake = use_fake

    def _decode(self, blob: bytes) -> tuple[np.ndarray, int]:
        if not self.use_fake:
            return _decode_audio_real(blob)
        magic, sr, n = _AHDR.unpack_from(blob, 0)
        if magic != _AMAGIC:
            raise ValueError("not a fake audio blob")
        x = np.frombuffer(blob, np.int16, count=n, offset=_AHDR.size) \
            .astype(np.float64) / 32768.0
        return x, sr

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats = [], []
        for blob in batch[self.blob_col].to_pylist():
            x, sr = self._decode(blob)
            n = len(x)
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
