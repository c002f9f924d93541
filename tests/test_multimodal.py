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


# ---- round 8: REAL pure-Python decoders (BMP/PPM/PGM, WAV/RIFF) ----


def test_real_bmp_decode_roundtrip(spark):
    """Engine-built BMP blobs (pure Catalyst hex/concat) parse back to
    the dims that built them — in Spark AND via the python parser on
    DuckDB-built bytes (cross-engine builder parity)."""
    import duckdb

    df = spark.createDataFrame([(7, 5), (16, 13), (1, 1)], "w int, h int")
    blob = multimodal.bmp_bytes_sql("w", "h")
    rows = df.selectExpr("w", "h", f"{blob} AS content")
    out = {(r.w, r.h): r for r in multimodal.decode_images(rows).collect()}
    for (w, h), r in out.items():
        assert (r.img_width, r.img_height, r.img_format) == (w, h, "bmp")
        assert r.img_n_pixels == w * h
    # same SQL text on DuckDB produces byte-identical blobs
    spark_blob = rows.filter("w = 7").first().content
    duck_blob = duckdb.sql(
        f"SELECT {multimodal.bmp_bytes_sql('7', '5')} AS b"
    ).fetchone()[0]
    assert bytes(spark_blob) == bytes(duck_blob)


def test_real_bmp_decode_parses_foreign_bmp():
    """The parser handles BMPs we did NOT build: top-down (negative
    height) and BITMAPCOREHEADER variants."""
    import struct

    # BITMAPINFOHEADER (40 bytes) with top-down rows (negative height)
    info = struct.pack("<IiiHHIIiiII", 40, 6, -4, 1, 24, 0, 72, 2835, 2835, 0, 0)
    content = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info
    meta = multimodal.decode_image_bytes(content)
    assert meta == {"width": 6, "height": 4, "n_pixels": 24, "format": "bmp"}
    core = b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + struct.pack(
        "<IHHHH", 12, 9, 3, 1, 24
    )
    meta = multimodal.decode_image_bytes(core)
    assert meta == {"width": 9, "height": 3, "n_pixels": 27, "format": "bmp"}


def test_real_ppm_pgm_decode():
    ppm = b"P6\n# comment line\n12 9\n255\n" + b"\x00" * (12 * 9 * 3)
    assert multimodal.decode_image_bytes(ppm) == {
        "width": 12, "height": 9, "n_pixels": 108, "format": "ppm",
    }
    pgm = b"P5 3 4 255 " + b"\x00" * 12
    assert multimodal.decode_image_bytes(pgm)["format"] == "pgm"
    # truncated header and non-digit garbage are rejected (fake fallback)
    assert multimodal.decode_image_bytes(b"P6\n12") is None
    assert multimodal.decode_image_bytes(b"P6\nxy 3\n255\n") is None
    assert multimodal.real_image_decode(b"not-an-image")["format"] == "fake"


def test_real_wav_decode_against_stdlib_wave():
    """Independent oracle: the stdlib ``wave`` module reads the same
    engine-built blob and must agree on rate/channels/frames."""
    import io
    import wave

    import duckdb

    blob = bytes(
        duckdb.sql(
            f"SELECT {multimodal.wav_bytes_sql('16000', '2', '25')} AS b"
        ).fetchone()[0]
    )
    wf = wave.open(io.BytesIO(blob))
    assert (wf.getframerate(), wf.getnchannels(), wf.getnframes()) == (16000, 2, 25)
    meta = multimodal.decode_audio_bytes(blob)
    assert meta["sample_rate"] == 16000 and meta["channels"] == 2
    assert meta["duration_seconds"] == 25 / 16000
    assert meta["rms_level"] == 0.0  # zeroed PCM payload


def test_real_wav_rms_against_numpy():
    """True int16 RMS on a nonzero sine payload matches numpy."""
    import struct

    import numpy as np

    t = np.arange(1600)
    samples = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    meta = multimodal.decode_audio_bytes(hdr + data)
    exp = round(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) / 32768.0, 6)
    assert meta["rms_level"] == exp
    assert meta["duration_seconds"] == 0.1
    assert multimodal.real_audio_decode(b"mp3-ish-bytes")["sample_rate"] == 16000
