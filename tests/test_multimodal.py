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


def test_bmp_ppm_roundtrip():
    import numpy as np

    from log_formatter_ray.ops.multimodal import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm,
    )

    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (3, 5), (17, 9), (32, 31)):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img), (h, w)


def test_ppm_decode_with_comments():
    import numpy as np

    from log_formatter_ray.ops.multimodal import decode_ppm

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)


def test_wav_roundtrip_and_featurizer():
    import numpy as np
    import pyarrow as pa

    from log_formatter_ray.ops.multimodal import (
        AudioFeaturizer, decode_wav, encode_wav,
    )

    rng = np.random.default_rng(6)
    samples = rng.integers(-30000, 30000, size=1600).astype(np.int16)
    payload = encode_wav(samples, rate=8000)
    got, rate = decode_wav(payload)
    assert rate == 8000 and np.array_equal(got.astype(np.int16), samples)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([payload], pa.binary()),
        }
    )
    out = AudioFeaturizer()(t)
    assert abs(out["duration_ms"][0].as_py() - 200.0) < 1e-9  # 1600/8000 s
    exp_rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    assert abs(out["rms"][0].as_py() - exp_rms) < 1e-9


def test_real_media_decode_matches_meta():
    import json

    from log_formatter_ray.ops.multimodal import ImageDecoder, make_real_media

    media = make_real_media(60)
    imgs = media.filter(
        __import__("pyarrow").compute.equal(media["media_type"], "image")
    )
    out = ImageDecoder()(imgs)
    for w, h, meta in zip(
        out["width"].to_pylist(), out["height"].to_pylist(), out["meta"].to_pylist()
    ):
        m = json.loads(meta)
        assert (w, h) == (m["w"], m["h"])


def test_real_resize_emits_decodable_thumbnail():
    import numpy as np

    from log_formatter_ray.ops.multimodal import (
        ImageResizer, decode_ppm, make_real_media,
    )

    media = make_real_media(6)
    imgs = media.filter(
        __import__("pyarrow").compute.equal(media["media_type"], "image")
    )
    out = ImageResizer(out_w=8, out_h=8)(imgs)
    for t in out["thumbnail"].to_pylist():
        thumb = decode_ppm(t)
        assert thumb.shape == (8, 8, 3)
        assert thumb.dtype == np.uint8


def test_spectrogram_featurizer_separates_tones():
    """Pure-numpy spectral embeddings: two pure tones at well-separated
    frequencies must peak in different bands and be deterministic; the
    actor stage runs over a Dataset and emits fixed-size list<float32>."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.multimodal import (
        SpectrogramFeaturizer,
        encode_wav,
    )

    rate = 8000
    t = np.arange(rate) / rate  # 1 s
    low = (np.sin(2 * np.pi * 200 * t) * 12000).astype(np.int16)
    high = (np.sin(2 * np.pi * 3000 * t) * 12000).astype(np.int16)
    tbl = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [encode_wav(low, rate), encode_wav(high, rate)], pa.binary()
            ),
        }
    )
    feat = SpectrogramFeaturizer(n_bands=16)
    out = feat(tbl)
    embs = np.asarray(
        out["spec_embedding"].combine_chunks().flatten()
    ).reshape(2, 16)
    assert np.argmax(embs[0]) < np.argmax(embs[1])  # low tone → lower band
    # deterministic
    out2 = SpectrogramFeaturizer(n_bands=16)(tbl)
    embs2 = np.asarray(
        out2["spec_embedding"].combine_chunks().flatten()
    ).reshape(2, 16)
    assert np.array_equal(embs, embs2)

    # as an actor-pool Dataset stage
    ds = rd.from_arrow(tbl).map_batches(
        SpectrogramFeaturizer, concurrency=1, batch_size=None,
        batch_format="pyarrow",
    )
    got = ds.to_pandas()
    assert len(got) == 2 and len(got["spec_embedding"].iloc[0]) == 16


def test_audio_near_dup_composition_finds_planted_pairs():
    """decode → spectral featurize → hyperplane-LSH cosine: the planted
    amplitude-scaled copies (and ONLY them) surface as near-dup pairs."""
    from log_formatter_ray.pipelines.queries import q_media_audio_near_dups

    df = q_media_audio_near_dups("/root/testdata/sf0.001").to_pandas()
    got = sorted(map(tuple, df[["a", "b"]].to_numpy()))
    assert got == [(i, 1000 + i) for i in range(4)]
