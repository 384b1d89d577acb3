"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with metadata columns;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages.

Decode kernels, by format:

* **REAL, dependency-free**: BMP (24-bit uncompressed) and PPM (P6) images
  are decoded/encoded in pure numpy; WAV (PCM16) audio via the stdlib
  ``wave`` module.  These run end-to-end on actual bytes — no fakes.
* **Gated stubs**: formats that genuinely need an external codec
  (JPEG/PNG → PIL, MP3 → librosa, MP4 → ffmpeg, all absent from this
  container) raise ``NotImplementedError`` with the exact integration
  point; the deterministic ``LFRM`` fake container remains for exercising
  the video frame-sampler plumbing.

Batch-size note (the 100 TB concern): binary payloads are wide; callers
should pass a SMALL ``batch_size`` (e.g. 64) so batch × concurrency fits
worker heaps, and keep ``batch_format="pyarrow"`` so payload bytes stay in
the object store (never pandas-boxed).
"""

from __future__ import annotations

import io
import json
import struct
import wave

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON sidecar metadata
    ]
)

_MAGIC = b"LFRM"  # our deterministic fake container format


def make_fake_media(num_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table.  Payload = MAGIC + packed header
    (width, height, channels, n_frames) + seeded random bytes."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, metas = [], [], [], []
    kinds = ["image", "audio", "video"]
    for i in range(num_rows):
        kind = kinds[i % 3]
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        frames = int(rng.integers(4, 16)) if kind == "video" else 1
        body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        payload = _MAGIC + struct.pack("<IIII", w, h, 3, frames) + body
        ids.append(i)
        types.append(kind)
        payloads.append(payload)
        metas.append(json.dumps({"w": w, "h": h, "frames": frames}, sort_keys=True))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


def _parse_header(payload: bytes) -> tuple[int, int, int, int]:
    if payload[:4] != _MAGIC:
        raise ValueError("not a fake-container payload")
    return struct.unpack("<IIII", payload[4:20])


# ---------------------------------------------------------------------------
# Real, dependency-free codecs: BMP / PPM images, WAV audio
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, _ = img.shape
    row = w * 3
    stride = (row + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :row] = img[:, :, ::-1].reshape(h, row)  # BGR, bottom-up
    body = rows[::-1].tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    ah = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    data = np.frombuffer(payload, np.uint8, count=stride * ah, offset=off)
    img = data.reshape(ah, stride)[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 RGB (handles comments/whitespace)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    return (
        np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 samples → mono PCM16 WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 in int16 units, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        sw = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if sw == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float64)
    elif sw == 1:
        samples = np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return samples, rate


def make_real_media(num_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic media table with REAL payload bytes: BMP and PPM
    images, WAV audio — decodable by the dependency-free kernels above."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, metas = [], [], [], []
    for i in range(num_rows):
        kind = ("image", "image", "audio")[i % 3]
        if kind == "image":
            w, h = int(rng.integers(4, 32)), int(rng.integers(4, 32))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(img) if i % 3 == 0 else encode_ppm(img))
            metas.append(json.dumps({"w": w, "h": h}, sort_keys=True))
        else:
            n = int(rng.integers(100, 2000))
            samples = rng.integers(-20000, 20000, size=n).astype(np.int16)
            payloads.append(encode_wav(samples))
            metas.append(json.dumps({"n_samples": n, "rate": 8000}, sort_keys=True))
        ids.append(i)
        types.append(kind)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecoder:
    """Decode stage: payload → (width, height, n_pixels, mean_intensity).

    Per-payload format sniffing: BMP and PPM decode for REAL with the
    dependency-free numpy codecs above; the ``LFRM`` fake container uses
    its header; anything else (JPEG/PNG) needs PIL — attempted once per
    actor in ``__init__``, else a gated NotImplementedError.
    """

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_other(self, payload: bytes) -> tuple[int, int, float]:
        if self._pil is not None:  # pragma: no cover - PIL absent here
            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img)
            return img.width, img.height, float(arr.mean())
        raise NotImplementedError(
            "JPEG/PNG decode requires PIL (absent from this container); "
            "BMP/PPM/WAV/LFRM payloads decode without it"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means = [], [], []
        for payload in batch["payload"].to_pylist():
            if payload[:2] == b"BM":
                img = decode_bmp(payload)
                h, w, _ = img.shape
                mean = float(img.mean()) if img.size else 0.0
            elif payload[:2] == b"P6":
                img = decode_ppm(payload)
                h, w, _ = img.shape
                mean = float(img.mean()) if img.size else 0.0
            elif payload[:4] == _MAGIC:
                w, h, _c, _f = _parse_header(payload)
                body = np.frombuffer(payload[20:], dtype=np.uint8)
                mean = float(body.mean()) if body.size else 0.0
            else:
                w, h, mean = self._decode_other(payload)
            widths.append(int(w))
            heights.append(int(h))
            means.append(mean)
        batch = batch.append_column("width", pa.array(widths, pa.int32()))
        batch = batch.append_column("height", pa.array(heights, pa.int32()))
        batch = batch.append_column(
            "n_pixels", pa.array([w * h for w, h in zip(widths, heights)], pa.int64())
        )
        return batch.append_column("mean_intensity", pa.array(means, pa.float64()))


class ImageResizer:
    """Resize stage: fixed-size thumbnail payloads.  BMP/PPM inputs get a
    REAL nearest-neighbor resize (pure numpy) emitted as PPM; LFRM fakes
    keep the tiled-body placeholder."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def _nn_resize(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        rows = (np.arange(self.out_h) * h) // self.out_h
        cols = (np.arange(self.out_w) * w) // self.out_w
        return img[rows][:, cols]

    def __call__(self, batch: pa.Table) -> pa.Table:
        size = self.out_w * self.out_h
        thumbs = []
        for payload in batch["payload"].to_pylist():
            if payload[:2] == b"BM":
                thumbs.append(encode_ppm(self._nn_resize(decode_bmp(payload))))
            elif payload[:2] == b"P6":
                thumbs.append(encode_ppm(self._nn_resize(decode_ppm(payload))))
            else:
                body = np.frombuffer(payload[20:], dtype=np.uint8)
                tiled = np.resize(body, size) if body.size else np.zeros(size, np.uint8)
                thumbs.append(
                    _MAGIC + struct.pack("<IIII", self.out_w, self.out_h, 3, 1) + tiled.tobytes()
                )
        return batch.append_column("thumbnail", pa.array(thumbs, pa.binary()))


class AudioFeaturizer:
    """payload → (duration_ms, rms).  RIFF/WAV payloads decode for REAL via
    the stdlib ``wave`` module (PCM16/PCM8); LFRM fakes treat body bytes as
    8 kHz u8 samples; MP3/OGG would need librosa (absent) and raise."""

    SAMPLE_RATE = 8000

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rmss = [], []
        for payload in batch["payload"].to_pylist():
            if payload[:4] == b"RIFF":
                samples, rate = decode_wav(payload)
                durs.append(1000.0 * samples.size / rate)
                rmss.append(
                    float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
                )
            elif payload[:4] == _MAGIC:
                body = np.frombuffer(payload[20:], dtype=np.uint8).astype(np.float64)
                durs.append(1000.0 * body.size / self.SAMPLE_RATE)
                rmss.append(
                    float(np.sqrt(np.mean((body - 128.0) ** 2))) if body.size else 0.0
                )
            else:
                raise NotImplementedError(
                    "compressed audio (MP3/OGG) needs librosa — absent here; "
                    "WAV and LFRM payloads decode without it"
                )
        batch = batch.append_column("duration_ms", pa.array(durs, pa.float64()))
        return batch.append_column("rms", pa.array(rmss, pa.float64()))


class FrameSampler:
    """Video frame sampling: ONE INPUT ROW → N OUTPUT ROWS (every
    ``stride``-th frame), the flat-map shape done batch-wise.  Output schema:
    (media_id, frame_idx, frame: binary)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, _c, n_frames = _parse_header(payload)
            body = payload[20:]
            frame_bytes = max(1, len(body) // max(1, n_frames))
            for f in range(0, n_frames, self.stride):
                ids.append(mid)
                idxs.append(f)
                frames.append(body[f * frame_bytes : (f + 1) * frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


class SpectrogramFeaturizer:
    """payload → fixed-size log-spectral embedding (``list<float32>`` of
    ``n_bands``) — a REAL, dependency-free audio feature kernel (numpy
    rfft), not a stub: frame the signal (Hann window, ``win``/``hop``),
    power spectrum per frame, time-mean, then mean-pool into ``n_bands``
    geometrically spaced frequency bands and ``log1p``.  The mel-scale
    shape without librosa; embeddings compose directly with ``ops/ann.py``
    (cosine top-k / near-dup) for audio similarity at corpus scale.

    WAV (PCM16/PCM8) and LFRM payloads decode as in :class:`AudioFeaturizer`;
    compressed codecs raise with the same actionable message."""

    SAMPLE_RATE = 8000

    def __init__(self, win: int = 256, hop: int = 128, n_bands: int = 16):
        self.win = win
        self.hop = hop
        self.n_bands = n_bands
        self._hann = np.hanning(win)
        # geometric band edges over the rfft bins (skip DC), made strictly
        # increasing inside [1, n_bins-1] (rounding collapses low edges)
        n_bins = win // 2 + 1
        if n_bins <= n_bands:
            raise ValueError("win//2+1 must exceed n_bands")
        edges = np.rint(np.geomspace(1, n_bins - 1, n_bands + 1)).astype(
            np.int64
        )
        for i in range(1, n_bands + 1):
            if edges[i] <= edges[i - 1]:
                edges[i] = edges[i - 1] + 1
        edges = np.minimum(edges, n_bins - 1)
        for i in range(n_bands - 1, -1, -1):
            if edges[i] >= edges[i + 1]:
                edges[i] = edges[i + 1] - 1
        self._edges = edges

    def _embed(self, samples: np.ndarray) -> np.ndarray:
        x = np.asarray(samples, np.float64)
        if x.size < self.win:
            x = np.pad(x, (0, self.win - x.size))
        frames = np.lib.stride_tricks.sliding_window_view(x, self.win)[
            :: self.hop
        ]
        spec = np.abs(np.fft.rfft(frames * self._hann, axis=1)) ** 2
        mean_spec = spec.mean(axis=0)  # (win//2+1,)
        bands = np.add.reduceat(mean_spec, self._edges[:-1]) / np.maximum(
            np.diff(self._edges), 1
        )
        return np.log1p(bands).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = np.zeros((len(batch), self.n_bands), np.float32)
        for i, payload in enumerate(batch["payload"].to_pylist()):
            if payload[:4] == b"RIFF":
                samples, _rate = decode_wav(payload)
            elif payload[:4] == _MAGIC:
                samples = (
                    np.frombuffer(payload[20:], dtype=np.uint8).astype(
                        np.float64
                    )
                    - 128.0
                )
            else:
                raise NotImplementedError(
                    "compressed audio (MP3/OGG) needs librosa — absent "
                    "here; WAV and LFRM payloads decode without it"
                )
            if samples.size:
                embs[i] = self._embed(samples)
        emb_col = pa.FixedSizeListArray.from_arrays(
            pa.array(embs.reshape(-1)), self.n_bands
        )
        return batch.append_column("spec_embedding", emb_col)


def make_tonal_audio(n_base: int = 8, n_dups: int = 4,
                     rate: int = 8000) -> pa.Table:
    """Deterministic tonal WAV corpus with PLANTED near-duplicates:
    ``n_base`` clips at geometrically spaced frequencies (media_id
    0..n_base-1; the spacing exceeds one log-spectral band at the
    featurizer defaults, so base embeddings are pairwise distinct), plus
    ``n_dups`` amplitude-scaled (×0.97) copies of the first ``n_dups``
    base clips (media_id ``1000+i`` duplicates clip ``i`` — same spectrum
    shape ⇒ cosine ≈ 1).  Fully deterministic ground truth for audio
    near-dup pipelines (spectral embedding → cosine LSH): the expected
    pair set is exactly {(i, 1000+i)}."""
    rows_id, rows_payload = [], []
    t = np.arange(rate // 2) / rate  # 0.5 s clips
    freqs = np.geomspace(200, 3400, n_base)
    for i, f in enumerate(freqs):
        sig = np.sin(2 * np.pi * f * t) * 11000
        rows_id.append(i)
        rows_payload.append(encode_wav(sig.astype(np.int16), rate))
        if i < n_dups:
            rows_id.append(1000 + i)
            rows_payload.append(
                encode_wav((sig * 0.97).astype(np.int16), rate)
            )
    return pa.table(
        {
            "media_id": pa.array(rows_id, pa.int64()),
            "payload": pa.array(rows_payload, pa.binary()),
        }
    )
