"""Multimodal binary-column plumbing: metadata decode, feature extraction,
resize planning, frame sampling — real Spark plumbing, stubbed codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from edspdf_spark.functions.multimodal import (
    decode_image_pixels,
    encode_audio,
    encode_image,
    encode_video,
    resize_plan,
    sample_frame_indices,
    with_byte_histogram,
    with_media_meta,
)

MEDIA_ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
    ]
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, encode_image(640, 480, 3, b"pixels" * 100)),
        (1, encode_image(32, 32, 1, b"\x00" * 64)),
        (2, encode_audio(44100, 88200, b"pcm" * 50)),
        (3, encode_video(1920, 1080, 300, 29970, b"frames" * 20)),
        (4, encode_video(640, 360, 12, 25000, b"x" * 10)),
        (5, b"JUNKNOTAMEDIA"),
        (6, None),
    ]
    return spark.createDataFrame(rows, MEDIA_ROW_SCHEMA)


def test_media_meta_decode(media_df):
    got = {r.id: r for r in with_media_meta(media_df).collect()}
    assert got[0].media_type == "image" and (got[0].width, got[0].height, got[0].channels) == (640, 480, 3)
    assert got[1].media_type == "image" and got[1].n_bytes == 13 + 64
    assert got[2].media_type == "audio" and (got[2].sample_rate, got[2].n_samples) == (44100, 88200)
    assert got[3].media_type == "video" and (got[3].n_frames, got[3].fps_milli) == (300, 29970)
    assert got[5].media_type is None  # unknown magic → typed nulls, no error
    assert got[6].media_type is None and got[6].n_bytes == 0


def test_byte_histogram(media_df):
    got = {r.id: r.byte_hist for r in with_byte_histogram(media_df, n_bins=16).collect()}
    for h in got.values():
        assert len(h) == 16
        assert abs(sum(h) - 1.0) < 1e-9 or sum(h) == 0.0
    # all-zero payload (id=1, skipping 13-byte header) → all mass in bin 0
    hist1 = with_byte_histogram(
        media_df.filter(F.col("id") == 1), n_bins=16, skip_header=13
    ).collect()[0].byte_hist
    assert hist1[0] == 1.0 and sum(hist1[1:]) == 0.0


def test_resize_plan(media_df):
    meta = with_media_meta(media_df.filter(F.col("id").isin(0, 1)))
    got = {r.id: r for r in resize_plan(meta, max_side=224).collect()}
    assert (got[0].target_w, got[0].target_h) == (224, 168)  # 640x480 → 224x168
    assert (got[1].target_w, got[1].target_h) == (32, 32)  # already small → 1.0
    assert got[1].scale == 1.0


def test_sample_frame_indices(media_df):
    meta = with_media_meta(media_df)
    got = sample_frame_indices(meta, every_n=10, max_frames=8).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.id, []).append((r.frame_idx, r.frame_ts_milli))
    # 300 frames → capped at 8 samples, stride 10
    assert [i for i, _ in sorted(by_id[3])] == [0, 10, 20, 30, 40, 50, 60, 70]
    # 12 frames → only 0 and 10
    assert [i for i, _ in sorted(by_id[4])] == [0, 10]
    # non-video rows contribute nothing
    assert set(by_id) == {3, 4}
    # timestamp math: frame 10 at 29.97 fps → 333 ms
    assert dict(by_id[3])[10] == int(10 * 1000 * 1000 / 29970)


def test_pixel_decode_is_stubbed(media_df):
    with pytest.raises(NotImplementedError):
        decode_image_pixels(media_df)


def test_meta_decode_pushes_passthrough_columns(media_df):
    out = with_media_meta(media_df.withColumn("extra", F.col("id") * 2))
    row = out.filter(F.col("id") == 0).collect()[0]
    assert row.extra == 0 and row.media_type == "image"
