"""Multimodal column handling (SURVEY §2.h).

Convention: media travel as opaque ``binary`` columns + a typed metadata
struct — exactly how the reference moves files (bytes body + header map,
docs/goanywhere-config.md:186-198), generalized to image/audio/video.

The decode/feature-extract steps are Pandas-UDF operators over
``mapInPandas``; real codecs (PIL/ffmpeg/torchaudio) aren't in this
container, so the decode backend is STUBBED with a deterministic fake
that derives plausible metadata from the content hash — the Spark-side
plumbing (schema, batching, partition flow) is real and tested, and a
real backend plugs in by replacing ``fake_image_decode``.

Scale: binary columns ride parquet untouched by metadata-only queries
(column pruning skips them — the reason this layout works at 100 TB).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def with_media_columns(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Standard multimodal metadata projection: byte length + sha256 —
    all Catalyst-native, never decodes the payload."""
    return df.withColumn("media_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "media_sha256", F.sha2(F.col(content_col), 256)
    )


def _hex_val(expr: str, pos: int) -> str:
    """Portable SQL: value 0-15 of hex digit ``pos`` (1-based) of md5(expr)."""
    return f"(instr('0123456789abcdef', substring(md5({expr}), {pos}, 1)) - 1)"


def fake_dims_sql(content_expr: str) -> tuple[str, str]:
    """Deterministic fake (width, height) from the content's md5 — the
    SQL-expressible mirror of ``fake_image_decode`` (shared Spark/DuckDB
    text): width = 16·(1 + digit1), height = 16·(1 + digit2)."""
    w = f"CAST(16 * (1 + {_hex_val(content_expr, 1)}) AS INTEGER)"
    h = f"CAST(16 * (1 + {_hex_val(content_expr, 2)}) AS INTEGER)"
    return w, h


def fake_image_decode(content: bytes) -> dict:
    """Deterministic stand-in for a real image decoder: derives dims from
    md5(content) the same way fake_dims_sql does.

    Replace with a PIL/libvips-backed decoder in production:
        def real_decode(content): img = PIL.Image.open(io.BytesIO(content)); ...
    """
    digest = hashlib.md5(content).hexdigest()
    width = 16 * (1 + int(digest[0], 16))
    height = 16 * (1 + int(digest[1], 16))
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "format": "fake",
    }


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    decoder: Callable[[bytes], dict] = fake_image_decode,
) -> DataFrame:
    """Arrow-batched decode: appends IMAGE_META_SCHEMA fields.

    This is the real 100 TB plumbing — mapInPandas over binary batches —
    with the codec stubbed (see module docstring).
    """
    from ..sources.tables import ensure_parallelism

    df = ensure_parallelism(df)  # decode is CPU-bound, per-row independent
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [T.StructField(f"img_{f.name}", f.dataType) for f in IMAGE_META_SCHEMA.fields]
    )
    passthrough = [f.name for f in df.schema.fields if f.name != content_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {f"img_{f.name}": [] for f in IMAGE_META_SCHEMA.fields}
            for content in pdf[content_col]:
                meta = decoder(bytes(content) if content is not None else b"")
                for f in IMAGE_META_SCHEMA.fields:
                    cols[f"img_{f.name}"].append(meta[f.name])
            out = pdf[passthrough].copy()
            for k, v in cols.items():
                out[k] = v
            yield out

    return df.mapInPandas(run, out_schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("duration_seconds", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms_level", T.DoubleType()),
    ]
)


def fake_audio_decode(content: bytes) -> dict:
    """Deterministic stand-in for an audio feature extractor (no
    torchaudio/ffmpeg in container): duration from byte length at a fake
    16 kHz/16-bit rate, RMS from the md5 digest. Replace with a real
    backend that decodes and computes true features."""
    digest = hashlib.md5(content).hexdigest()
    return {
        "duration_seconds": round(len(content) / 32000.0, 6),
        "sample_rate": 16000,
        "rms_level": round(int(digest[:4], 16) / 65535.0, 6),
    }


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    decoder: Callable[[bytes], dict] = fake_audio_decode,
) -> DataFrame:
    """Arrow-batched audio feature extraction: appends AUDIO_META_SCHEMA
    fields (``audio_*``). Same plumbing contract as ``decode_images``."""
    from ..sources.tables import ensure_parallelism

    df = ensure_parallelism(df)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [T.StructField(f"audio_{f.name}", f.dataType) for f in AUDIO_META_SCHEMA.fields]
    )
    passthrough = [f.name for f in df.schema.fields if f.name != content_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {f"audio_{f.name}": [] for f in AUDIO_META_SCHEMA.fields}
            for content in pdf[content_col]:
                meta = decoder(bytes(content) if content is not None else b"")
                for f in AUDIO_META_SCHEMA.fields:
                    cols[f"audio_{f.name}"].append(meta[f.name])
            out = pdf[passthrough].copy()
            for k, v in cols.items():
                out[k] = v
            yield out

    return df.mapInPandas(run, out_schema)


def resize_images_stub(
    df: DataFrame, content_col: str = "content", width: int = 224, height: int = 224
) -> DataFrame:
    """Image-resize operator shape: replaces the binary with a 'resized'
    payload and records target dims. Codec STUBBED (no PIL in
    container): the fake resize truncates/pads bytes to width*height so
    batch sizing and schema flow are real; a real backend swaps in
    actual decode→resize→encode."""
    target = width * height
    return (
        df.withColumn(
            content_col,
            F.substring(F.col(content_col), 1, target),
        )
        .withColumn("resize_width", F.lit(width))
        .withColumn("resize_height", F.lit(height))
    )


def frame_sample_stub(df: DataFrame, content_col: str = "content",
                      every_n: int = 10) -> DataFrame:
    """Video frame-sampling operator shape: one output row per sampled
    frame index. Codec STUBBED (no ffmpeg in container): frame count is
    derived deterministically from byte length; a real backend replaces
    ``n_frames`` and attaches decoded frame bytes."""
    n_frames = (F.length(F.col(content_col)) % 100 + 1).cast("int")
    return (
        df.withColumn("_n_frames", n_frames)
        .withColumn(
            "frame_index",
            F.explode(F.sequence(F.lit(0), F.col("_n_frames") - 1, F.lit(every_n))),
        )
        .drop("_n_frames")
    )
