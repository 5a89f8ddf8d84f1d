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


# ---------------------------------------------------------------------------
# pure-Python PNG codec — REAL image decode with no external library
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: colortype -> channels (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(px: np.ndarray) -> bytes:
    """Minimal standards-compliant PNG writer: 8-bit grayscale/RGB/RGBA,
    filter 0 on every scanline, one zlib IDAT. Output opens in any PNG
    reader — used to synthesize REAL image payloads for the multimodal
    pipeline tests/queries."""
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    colortype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = px.astype(np.uint8).reshape(h, w * c)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(blob: bytes) -> np.ndarray:
    """Pure-Python PNG reader: 8-bit grayscale / RGB / RGBA,
    non-interlaced, all five scanline filters (None/Sub/Up/Average/
    Paeth). Returns (h, w, c) uint8. Small-image oriented (the filter
    reconstruction walks scanlines in Python with numpy row ops) —
    exactly the thumbnail/feature-extract regime of the multimodal
    stages; production containers with PIL take the compiled path."""
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(blob):
        (length,), tag = struct.unpack_from(">I", blob, pos), \
            blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or colortype not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} colortype={colortype} "
                    f"interlace={interlace} beyond the pure-Python reader")
            meta = (w, h, _PNG_CHANNELS[colortype])
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, c = meta
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = 1 + w * c
    raw = raw[: h * stride].reshape(h, stride)
    out = np.zeros((h, w * c), dtype=np.uint8)
    for y in range(h):
        ftype, line = int(raw[y, 0]), raw[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(w * c, np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            rec = np.empty(w * c, dtype=np.int64)
            for i in range(w * c):
                a = rec[i - c] if i >= c else 0
                if ftype == 1:
                    rec[i] = line[i] + a
                elif ftype == 3:
                    rec[i] = line[i] + (a + prev[i]) // 2
                else:
                    cc = prev[i - c] if i >= c else 0
                    rec[i] = line[i] + _paeth(int(a), int(prev[i]), int(cc))
                rec[i] &= 0xFF  # mod-256 BEFORE feeding the next prediction
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec & 0xFF
    return out.reshape(h, w, c)


def _decode_image_real(blob: bytes) -> np.ndarray:
    """Decode a real image payload: PIL when importable (compiled, any
    format); else the built-in pure-Python readers — PNG
    (:func:`decode_png`) and baseline JPEG
    (:func:`icat_lucene_ray.ops.jpeg.decode_jpeg`) — so real decode of
    the two dominant web formats works in this container with no
    external library. Other formats without PIL raise."""
    try:
        from PIL import Image
    except ImportError:
        if blob[:8] == _PNG_SIG:
            return decode_png(blob)
        if blob[:2] == b"\xff\xd8":
            from icat_lucene_ray.ops.jpeg import decode_jpeg

            return decode_jpeg(blob)
        raise NotImplementedError(
            "real decode of non-PNG/JPEG images needs PIL — not "
            "installed in this container (PNG and baseline JPEG decode "
            "via the built-in pure-Python readers)")
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
    """True when real image decode is available — always in this engine:
    PIL when importable, else the built-in pure-Python PNG reader."""
    return True


def make_png_image(doc_id: int, width: int = 32, height: int = 24,
                   channels: int = 3) -> bytes:
    """REAL PNG payload with closed-form pixels: flat byte ``i`` is
    ``(doc_id*1009 + i*31) % 256``. The formula lets an independent SQL
    oracle recompute any feature of the DECODED image (e.g. channel
    means) without a PNG reader — verifying the whole
    encode→zlib→unfilter chain, not just the plumbing."""
    n = width * height * channels
    i = np.arange(n, dtype=np.int64)
    px = ((doc_id * 1009 + i * 31) % 256).astype(np.uint8)
    return encode_png(px.reshape(height, width, channels))


def have_video_decoder() -> bool:
    """True when real video-container decode is possible: the built-in
    PNG-frame container always is; external containers (mp4/webm) need
    BOTH ffmpeg and ffprobe on PATH (probing only ffmpeg would pass on
    hosts lacking ffprobe and then crash mid-decode)."""
    return True


def have_ffmpeg() -> bool:
    import shutil

    return (shutil.which("ffmpeg") is not None
            and shutil.which("ffprobe") is not None)


_VMAGIC = b"FVID"


def make_png_video(doc_id: int, n_frames: int = 24, width: int = 8,
                   height: int = 6, channels: int = 3) -> bytes:
    """REAL-decode video container: ``FVID`` + frame count + length-
    prefixed PNG frames (frame ``f`` keyed by ``doc_id*1000 + f`` with
    the closed-form pixels of :func:`make_png_image`). Container
    parsing is trivially ours; FRAME decode exercises the real PNG
    path."""
    frames = [encode_png(
        (((doc_id * 1000 + f) * 1009
          + np.arange(width * height * channels, dtype=np.int64) * 31) % 256)
        .astype(np.uint8).reshape(height, width, channels))
        for f in range(n_frames)]
    return (_VMAGIC + struct.pack("<I", n_frames)
            + b"".join(struct.pack("<I", len(p)) + p for p in frames))


def iter_png_video(blob: bytes):
    """Yield decoded (h, w, c) frames of a ``FVID`` container."""
    n_frames = struct.unpack_from("<I", blob, 4)[0]
    off = 8
    for _ in range(n_frames):
        ln = struct.unpack_from("<I", blob, off)[0]
        yield decode_png(blob[off + 4:off + 4 + ln])
        off += 4 + ln


def make_fake_video(doc_id: int, n_frames: int = 24, width: int = 8,
                    height: int = 6, channels: int = 3) -> bytes:
    """Deterministic fake video container: ``<I frame_count`` header +
    that many fake-image frames back to back."""
    frames = b"".join(
        make_fake_image(doc_id * 1000 + f, width, height, channels)
        for f in range(n_frames))
    return struct.pack("<I", n_frames) + frames


def _decode_video_real(blob: bytes) -> np.ndarray:
    """All frames of a real external container (mp4/webm/…) as
    (n, h, w, 3) uint8, via an ffmpeg rawvideo pipe — used only when
    BOTH ffmpeg and ffprobe are on PATH (``FVID`` PNG containers decode
    via :func:`iter_png_video` without either)."""
    if not have_ffmpeg():
        raise NotImplementedError(
            "decode of external video containers needs ffmpeg+ffprobe — "
            "not on PATH in this container; FVID PNG containers decode "
            "via the built-in pure-Python path"
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
            if blob[:4] == _VMAGIC:  # PNG-frame container: real decode
                for f, px in enumerate(iter_png_video(blob)):
                    if f % self.stride == 0:
                        yield f, px
                return
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


def make_wav_audio(doc_id: int, n_samples: int = 4800,
                   sample_rate: int = 16000) -> bytes:
    """REAL PCM WAV payload (stdlib ``wave`` writer) with closed-form
    int16 samples ``s[i] = (doc_id*7919 + i*631) % 65536 - 32768`` —
    like :func:`make_png_image`, the formula lets a SQL oracle
    recompute features of the DECODED waveform (window RMS) and so
    verify the real wave-reader path end-to-end."""
    import io
    import wave

    i = np.arange(n_samples, dtype=np.int64)
    s = ((doc_id * 7919 + i * 631) % 65536 - 32768).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


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
