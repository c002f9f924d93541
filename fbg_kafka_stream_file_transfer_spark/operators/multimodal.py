"""Multimodal column handling (SURVEY §2.h).

Convention: media travel as opaque ``binary`` columns + a typed metadata
struct — exactly how the reference moves files (bytes body + header map,
docs/goanywhere-config.md:186-198), generalized to image/audio/video.

The decode/feature-extract steps are Pandas-UDF operators over
``mapInPandas``. Formats whose containers are parseable in pure Python
are decoded FOR REAL — BMP and binary PPM/PGM image headers, and WAV
(RIFF/PCM) audio including true int16 RMS — so ``decode_images`` /
``extract_audio_features`` return genuine dimensions / sample rates /
durations for those bytes. Only formats that genuinely require codec
libraries (JPEG/PNG entropy decode, MP3/AAC — no PIL/ffmpeg in this
container) fall back to a deterministic content-hash fake, clearly
labeled ``format='fake'``; a production backend replaces the fallback.

Scale: binary columns ride parquet untouched by metadata-only queries
(column pruning skips them — the reason this layout works at 100 TB).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional

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


def _le_hex_sql(expr: str, nbytes: int) -> str:
    """Shared Spark/DuckDB SQL: little-endian hex of integer ``expr`` in
    ``nbytes`` bytes — lpad the big-endian hex, then emit byte pairs in
    reverse order. Both engines: uppercase hex(), 1-based substring."""
    width = nbytes * 2
    p = f"lpad(hex({expr}), {width}, '0')"
    pairs = " || ".join(
        f"substring({p}, {i}, 2)" for i in range(width - 1, 0, -2)
    )
    return f"({pairs})"


def bmp_bytes_sql(w_expr: str, h_expr: str) -> str:
    """Shared Spark/DuckDB SQL building a REAL, spec-valid 24-bpp BMP
    blob (BITMAPINFOHEADER, zeroed pixel rows padded to 4-byte
    boundaries) with the given integer width/height expressions — pure
    engine-side string/hex ops, no UDF. Feeding these bytes to
    ``decode_images`` certifies the real BMP parser end-to-end: the
    decoder must recover the dims that built the blob."""
    row = f"(CAST(floor((3 * ({w_expr}) + 3) / 4) AS INTEGER) * 4)"
    ds = f"({row} * ({h_expr}))"
    hex_str = (
        "'424D' || "                      # 'BM'
        f"{_le_hex_sql(f'(54 + {ds})', 4)} || "  # file size
        "'0000000036000000' || "          # reserved + data offset 54
        "'28000000' || "                  # header size 40
        f"{_le_hex_sql(w_expr, 4)} || {_le_hex_sql(h_expr, 4)} || "
        "'0100' || '1800' || '00000000' || "  # planes=1, bpp=24, no compression
        f"{_le_hex_sql(ds, 4)} || "       # image size
        "'00000000' || '00000000' || '00000000' || '00000000' || "  # ppm/colors
        f"repeat('00', {ds})"             # zeroed pixel data
    )
    return f"unhex({hex_str})"


def wav_bytes_sql(rate_expr: str, ch_expr: str, nsamp_expr: str) -> str:
    """Shared Spark/DuckDB SQL building a REAL, spec-valid PCM16 WAV
    blob (RIFF header + fmt + zeroed data chunk) from integer sample
    rate / channel / sample-count expressions. Same certification idea
    as ``bmp_bytes_sql`` for ``extract_audio_features``."""
    ds = f"(2 * ({ch_expr}) * ({nsamp_expr}))"
    byte_rate = f"(2 * ({ch_expr}) * ({rate_expr}))"
    block = f"(2 * ({ch_expr}))"
    hex_str = (
        "'52494646' || "                  # 'RIFF'
        f"{_le_hex_sql(f'(36 + {ds})', 4)} || "
        "'57415645' || '666D7420' || '10000000' || '0100' || "  # 'WAVE','fmt ',16,PCM
        f"{_le_hex_sql(ch_expr, 2)} || {_le_hex_sql(rate_expr, 4)} || "
        f"{_le_hex_sql(byte_rate, 4)} || {_le_hex_sql(block, 2)} || '1000' || "
        "'64617461' || "                  # 'data'
        f"{_le_hex_sql(ds, 4)} || repeat('00', {ds})"
    )
    return f"unhex({hex_str})"


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


def decode_image_bytes(content: bytes) -> Optional[dict]:
    """REAL pure-Python image header parse — no codec library needed.

    Supported containers:
    - BMP: ``BM`` magic; BITMAPINFOHEADER (and later, all start with a
      little-endian header size >= 40) carries int32 width/height at
      offsets 18/22 — height may be negative for top-down rows;
      BITMAPCOREHEADER (size 12) carries uint16 dims.
    - Binary PPM/PGM (``P6``/``P5``): ASCII header of
      whitespace-separated width, height, maxval with ``#`` comments.

    Returns None for unrecognized bytes (caller decides the fallback).
    """
    if len(content) >= 26 and content[:2] == b"BM":
        # 'BM' alone is two ASCII letters — arbitrary text ("BMW sales
        # rose...") starts with it. Sniff the fixed-value fields a real
        # writer cannot vary (planes MUST be 1, bpp from the closed set,
        # header size from the known DIB revisions, pixel offset inside
        # the file) before trusting width/height.
        (pixel_offset,) = struct.unpack_from("<I", content, 10)
        (hdr_size,) = struct.unpack_from("<I", content, 14)
        if hdr_size in (40, 52, 56, 64, 108, 124) and len(content) >= 54:
            w, h = struct.unpack_from("<ii", content, 18)
            planes, bpp = struct.unpack_from("<HH", content, 26)
        elif hdr_size == 12:
            w, h = struct.unpack_from("<HH", content, 18)
            planes, bpp = struct.unpack_from("<HH", content, 22)
        else:
            return None
        w, h = int(w), abs(int(h))
        if (
            w <= 0
            or h <= 0
            or planes != 1
            or bpp not in (1, 2, 4, 8, 16, 24, 32)
            or not (14 + hdr_size <= pixel_offset <= len(content))
        ):
            return None
        return {"width": w, "height": h, "n_pixels": w * h, "format": "bmp"}
    if content[:2] in (b"P5", b"P6") and len(content) > 2 and content[2:3].isspace():
        fields: list[int] = []
        i = 2
        while len(fields) < 3 and i < len(content):
            c = content[i : i + 1]
            if c == b"#":  # comment runs to end of line
                j = content.find(b"\n", i)
                i = len(content) if j < 0 else j + 1
            elif c.isspace():
                i += 1
            elif c.isdigit():
                j = i
                while j < len(content) and content[j : j + 1].isdigit():
                    j += 1
                fields.append(int(content[i:j]))
                i = j
            else:
                return None
        if len(fields) < 3 or fields[0] <= 0 or fields[1] <= 0:
            return None
        w, h = fields[0], fields[1]
        fmt = "ppm" if content[:2] == b"P6" else "pgm"
        return {"width": w, "height": h, "n_pixels": w * h, "format": fmt}
    return None


def real_image_decode(content: bytes) -> dict:
    """Default decoder: parse BMP/PPM/PGM for real; anything else (JPEG,
    PNG, ... — need entropy codecs absent from this container) falls
    back to the labeled deterministic fake."""
    meta = decode_image_bytes(content)
    return meta if meta is not None else fake_image_decode(content)


def backend_image_decode(
    backend: Optional[Callable[[bytes], Optional[dict]]] = None,
) -> Callable[[bytes], dict]:
    """Compose the production fallback chain for ``decode_images``:

    1. REAL pure-Python header parse (BMP/PPM/PGM — no codec needed);
    2. the INJECTED codec backend — e.g. ``pil_image_backend(PIL.Image)``
       — tried only for bytes the header parsers don't recognize
       (JPEG/PNG/...); a backend returning None (or raising inside its
       adapter) falls through;
    3. the labeled deterministic fake (``format='fake'``), so absent or
       failing codecs degrade HONESTLY instead of crashing the batch.

    This is the dispatch seam a cluster with real codec libraries
    plugs into: ``decode_images(df, decoder=backend_image_decode(
    pil_image_backend(PIL.Image)))``. With ``backend=None`` it equals
    ``real_image_decode``."""

    def decode(content: bytes) -> dict:
        meta = decode_image_bytes(content)
        if meta is not None:
            return meta
        if backend is not None:
            got = backend(content)
            if got is not None:
                return got
        return fake_image_decode(content)

    return decode


def pil_image_backend(pil_image_module) -> Callable[[bytes], Optional[dict]]:
    """Adapt a PIL-like module (anything exposing ``open(file_obj)`` →
    object with ``width``/``height``/``format``) to the backend
    callable ``backend_image_decode`` consumes. Failures return None so
    the chain falls through to the labeled fake instead of poisoning
    the Arrow batch."""

    def call(content: bytes) -> Optional[dict]:
        import io

        try:
            img = pil_image_module.open(io.BytesIO(content))
            w, h = int(img.width), int(img.height)
            return {
                "width": w,
                "height": h,
                "n_pixels": w * h,
                "format": str(getattr(img, "format", None) or "unknown").lower(),
            }
        except Exception:  # noqa: BLE001 — undecodable: fall through
            return None

    return call


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    decoder: Callable[[bytes], dict] = real_image_decode,
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
        T.StructField("channels", T.IntegerType()),
        T.StructField("rms_level", T.DoubleType()),
    ]
)


def fake_audio_decode(content: bytes) -> dict:
    """Deterministic fallback for codec-requiring audio (MP3/AAC — no
    ffmpeg/torchaudio in container): duration from byte length at a fake
    16 kHz/16-bit mono rate, RMS from the md5 digest."""
    digest = hashlib.md5(content).hexdigest()
    return {
        "duration_seconds": round(len(content) / 32000.0, 6),
        "sample_rate": 16000,
        "channels": 1,
        "rms_level": round(int(digest[:4], 16) / 65535.0, 6),
    }


def decode_audio_bytes(content: bytes) -> Optional[dict]:
    """REAL pure-Python WAV (RIFF) parse: walks the chunk list for
    ``fmt `` (channels, sample rate, bits/sample) and ``data`` (payload
    size), derives duration = data_bytes / byte_rate, and computes TRUE
    RMS over the int16 PCM samples (normalized to [0,1] by 32768).
    Returns None for non-RIFF/WAVE bytes (caller picks the fallback).
    """
    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    channels = rate = bits = None
    data = None
    i = 12
    while i + 8 <= len(content):
        cid = content[i : i + 4]
        (csize,) = struct.unpack_from("<I", content, i + 4)
        body = content[i + 8 : i + 8 + csize]
        # Guard on the bytes actually present, not the declared csize: a
        # truncated download can declare csize=16 with an empty body, and
        # struct.unpack_from on it would crash the whole mapInPandas task.
        if cid == b"fmt " and len(body) >= 16:
            _, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
        elif cid == b"data":
            data = body
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if not channels or not rate or data is None:
        return None
    byte_rate = rate * channels * max(bits or 8, 8) // 8
    rms = None
    if bits == 16:
        n = len(data) // 2
        if n:
            import numpy as np  # vectorized: RMS is O(samples), keep it off the interpreter

            samples = np.frombuffer(data[: 2 * n], dtype="<i2").astype(np.float64)
            rms = round(float(np.sqrt(np.mean(samples * samples))) / 32768.0, 6)
        else:
            rms = 0.0
    # duration is NOT rounded: both this parser and any SQL oracle
    # divide integers with the same rational value, and IEEE division
    # is correctly rounded — bit-identical doubles. Rounding would
    # INTRODUCE divergence on exact decimal ties (9/16000 = 0.0005625:
    # Python rounds half-even, DuckDB half-away).
    return {
        "duration_seconds": len(data) / byte_rate,
        "sample_rate": int(rate),
        "channels": int(channels),
        "rms_level": rms,
    }


def real_audio_decode(content: bytes) -> dict:
    """Default decoder: parse WAV/RIFF for real; other containers fall
    back to the labeled deterministic fake."""
    meta = decode_audio_bytes(content)
    return meta if meta is not None else fake_audio_decode(content)


def backend_audio_decode(
    backend: Optional[Callable[[bytes], Optional[dict]]] = None,
) -> Callable[[bytes], dict]:
    """Audio twin of ``backend_image_decode``: real WAV/RIFF parse →
    injected codec backend (ffmpeg/torchaudio adapter returning an
    AUDIO_META_SCHEMA dict or None) → labeled deterministic fake."""

    def decode(content: bytes) -> dict:
        meta = decode_audio_bytes(content)
        if meta is not None:
            return meta
        if backend is not None:
            got = backend(content)
            if got is not None:
                return got
        return fake_audio_decode(content)

    return decode


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    decoder: Callable[[bytes], dict] = real_audio_decode,
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
