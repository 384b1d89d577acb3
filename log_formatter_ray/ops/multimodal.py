"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with metadata columns;
decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages.  The decode KERNELS are stubbed (PIL/librosa/ffmpeg
are not in this container): each stage tries the real library in
``__init__`` and otherwise uses a deterministic fake decoder over our
self-describing payload header.  The Ray-side plumbing — schema, batch
sizing, actor signatures, output layout — is real and tested.

Batch-size note (the 100 TB concern): binary payloads are wide; callers
should pass a SMALL ``batch_size`` (e.g. 64) so batch × concurrency fits
worker heaps, and keep ``batch_format="pyarrow"`` so payload bytes stay in
the object store (never pandas-boxed).
"""

from __future__ import annotations

import json
import struct

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


class ImageDecoder:
    """Decode stage: payload → (width, height, n_pixels, mean_intensity).

    Real path (PIL) is attempted once per actor in ``__init__``; this
    container has no PIL, so the deterministic fake header decode runs.
    """

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None
        # STUB GATE: flip to True only after implementing _decode_real —
        # probing _pil alone would abort the stage wherever pillow happens
        # to be importable even though the real kernel is not written.
        self._use_real = False

    def _decode_real(self, payload: bytes) -> tuple[int, int, float]:  # pragma: no cover
        raise NotImplementedError(
            "real image decode requires PIL; implement "
            "Image.open(BytesIO(payload)) -> (width, height, mean) and set "
            "self._use_real = True in __init__"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means = [], [], []
        for payload in batch["payload"].to_pylist():
            if self._use_real:  # pragma: no cover
                w, h, mean = self._decode_real(payload)
                widths.append(w); heights.append(h); means.append(mean)
                continue
            w, h, _c, _f = _parse_header(payload)
            body = np.frombuffer(payload[20:], dtype=np.uint8)
            widths.append(w)
            heights.append(h)
            means.append(float(body.mean()) if body.size else 0.0)
        batch = batch.append_column("width", pa.array(widths, pa.int32()))
        batch = batch.append_column("height", pa.array(heights, pa.int32()))
        batch = batch.append_column(
            "n_pixels", pa.array([w * h for w, h in zip(widths, heights)], pa.int64())
        )
        return batch.append_column("mean_intensity", pa.array(means, pa.float64()))


class ImageResizer:
    """Resize stage: emits a fixed-size thumbnail payload (fake: truncated /
    tiled body) — demonstrates binary-out plumbing and stable output schema."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        size = self.out_w * self.out_h
        thumbs = []
        for payload in batch["payload"].to_pylist():
            body = np.frombuffer(payload[20:], dtype=np.uint8)
            tiled = np.resize(body, size) if body.size else np.zeros(size, np.uint8)
            thumbs.append(
                _MAGIC + struct.pack("<IIII", self.out_w, self.out_h, 3, 1) + tiled.tobytes()
            )
        return batch.append_column("thumbnail", pa.array(thumbs, pa.binary()))


class AudioFeaturizer:
    """payload → (duration_ms, rms) — fake decode treats body bytes as
    8 kHz u8 samples; real path would use soundfile/librosa (absent)."""

    SAMPLE_RATE = 8000

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rmss = [], []
        for payload in batch["payload"].to_pylist():
            body = np.frombuffer(payload[20:], dtype=np.uint8).astype(np.float64)
            durs.append(1000.0 * body.size / self.SAMPLE_RATE)
            rmss.append(float(np.sqrt(np.mean((body - 128.0) ** 2))) if body.size else 0.0)
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
