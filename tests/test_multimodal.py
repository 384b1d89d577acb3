"""Multimodal plumbing: schema, actor stages, 1→N frame sampling.
Decode kernels are deterministic fakes (real libs absent by design)."""

import json

import pyarrow as pa
import pytest

import ray.data as rd

from log_formatter_ray.ops.multimodal import (
    MEDIA_SCHEMA,
    AudioFeaturizer,
    FrameSampler,
    ImageDecoder,
    ImageResizer,
    make_fake_media,
    _parse_header,
)


@pytest.fixture(scope="module")
def media():
    return make_fake_media(30)


def test_media_schema(media):
    assert media.schema.equals(MEDIA_SCHEMA)
    assert media.schema.field("payload").type == pa.binary()


def test_image_decoder_stage(media):
    ds = rd.from_arrow(media).map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=8, concurrency=2
    )
    df = ds.to_pandas()
    for _, r in df.iterrows():
        meta = json.loads(r["meta"])
        assert r["width"] == meta["w"] and r["height"] == meta["h"]
        assert r["n_pixels"] == meta["w"] * meta["h"]
        assert 0.0 <= r["mean_intensity"] <= 255.0


def test_image_resizer_stage(media):
    ds = rd.from_arrow(media).map_batches(
        ImageResizer, fn_constructor_kwargs={"out_w": 4, "out_h": 4},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    )
    for thumb in ds.to_pandas()["thumbnail"]:
        w, h, _c, _f = _parse_header(thumb)
        assert (w, h) == (4, 4)
        assert len(thumb) == 20 + 16


def test_audio_featurizer_stage(media):
    ds = rd.from_arrow(media).map_batches(
        AudioFeaturizer, batch_format="pyarrow", batch_size=8, concurrency=2
    )
    df = ds.to_pandas()
    assert (df["duration_ms"] > 0).all()
    assert (df["rms"] >= 0).all()


def test_frame_sampler_one_to_many(media):
    videos = media.filter(pa.compute.equal(media["media_type"], "video"))
    ds = rd.from_arrow(videos).map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    )
    df = ds.to_pandas()
    metas = {m: json.loads(meta)["frames"] for m, meta in zip(
        videos["media_id"].to_pylist(), videos["meta"].to_pylist())}
    counts = df.groupby("media_id").size().to_dict()
    for mid, n_frames in metas.items():
        assert counts[mid] == (n_frames + 1) // 2  # every 2nd frame
    assert set(df.columns) == {"media_id", "frame_idx", "frame"}


def test_bad_payload_raises():
    with pytest.raises(ValueError):
        _parse_header(b"JUNKJUNKJUNKJUNKJUNK")
