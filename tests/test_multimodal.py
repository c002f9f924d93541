"""Multimodal column operators: metadata, stubbed decode, frame sampling."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators import multimodal


def _media(spark):
    return spark.createDataFrame(
        [("a", b"fake-image-bytes-1"), ("b", b"fake-image-bytes-22")],
        "media_id string, content binary",
    )


def test_media_metadata_catalyst_only(spark):
    out = {r.media_id: r for r in multimodal.with_media_columns(_media(spark)).collect()}
    assert out["a"].media_bytes == len(b"fake-image-bytes-1")
    assert out["a"].media_sha256 == hashlib.sha256(b"fake-image-bytes-1").hexdigest()


def test_decode_stub_matches_sql_mirror(spark):
    """The Pandas-UDF decode and the Catalyst fake_dims_sql mirror must
    agree — that's what makes the multimodal path oracle-checkable."""
    df = _media(spark)
    udf_out = {r.media_id: (r.img_width, r.img_height)
               for r in multimodal.decode_images(df).collect()}
    w, h = multimodal.fake_dims_sql("CAST(content AS STRING)")
    sql_out = {r.media_id: (r.w, r.h)
               for r in df.select("media_id", F.expr(w).alias("w"), F.expr(h).alias("h")).collect()}
    assert udf_out == sql_out
    assert all(16 <= w <= 256 for w, _ in udf_out.values())


def test_decode_images_pixel_math(spark):
    for r in multimodal.decode_images(_media(spark)).collect():
        assert r.img_n_pixels == r.img_width * r.img_height
        assert r.img_format == "fake"


def test_frame_sampling(spark):
    out = multimodal.frame_sample_stub(_media(spark), every_n=5).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_index)
    for media_id, frames in by_id.items():
        assert frames == sorted(frames)
        assert all(f % 5 == 0 for f in frames)


def test_audio_features_stub(spark):
    import pyspark.sql.functions as F

    from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
        extract_audio_features,
        fake_audio_decode,
    )

    df = spark.createDataFrame(
        [(1, b"x" * 64000), (2, b"")], "id long, content binary"
    )
    out = {r.id: r for r in extract_audio_features(df).collect()}
    assert out[1].audio_duration_seconds == 2.0
    assert out[1].audio_sample_rate == 16000
    assert out[2].audio_duration_seconds == 0.0
    assert 0.0 <= out[1].audio_rms_level <= 1.0
    assert out[1].audio_rms_level == fake_audio_decode(b"x" * 64000)["rms_level"]


def test_resize_stub(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.multimodal import resize_images_stub

    df = spark.createDataFrame([(1, b"a" * 100)], "id long, content binary")
    out = resize_images_stub(df, width=4, height=4).first()
    assert len(out.content) == 16
    assert (out.resize_width, out.resize_height) == (4, 4)
