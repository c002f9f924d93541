"""Envelope validation and routing split (reference F2/F4).

The reference documents a file-type + size policy
(docs/goanywhere-config.md:349,364-371: pdf/docx/xlsx/pptx/png/jpg/tiff/
txt/csv, ≤ 100 MB) and an implicit required-header contract
(README.md:163-169) but never enforces either in-route. This engine makes
the contract explicit: a single projection adds ``valid`` +
``reject_reason``, and the pipeline splits on it. Pure Catalyst filters —
they push down to the scan when applied early.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.derivations import MAX_FILE_SIZE_BYTES, MIME_MAP, file_extension

SUPPORTED_EXTENSIONS: tuple[str, ...] = tuple(MIME_MAP.keys())
REQUIRED_FIELDS: tuple[str, ...] = (
    "correlation_id",
    "file_name",
    "content_type",
    "file_size",
    "checksum",
)


def reject_reason(
    max_size: int = MAX_FILE_SIZE_BYTES,
    extensions: tuple[str, ...] = SUPPORTED_EXTENSIONS,
) -> Column:
    """NULL when valid, else the first failed rule (checked in contract order)."""
    missing = None
    for f in REQUIRED_FIELDS:
        cond = F.col(f).isNull()
        missing = cond if missing is None else (missing | cond)
    return (
        F.when(missing, F.lit("MISSING_REQUIRED_FIELD"))
        .when(~file_extension(F.col("file_name")).isin(*extensions), F.lit("UNSUPPORTED_FILE_TYPE"))
        .when(F.col("file_size") > max_size, F.lit("FILE_TOO_LARGE"))
        .when(F.col("file_size") <= 0, F.lit("EMPTY_FILE"))
    )


def with_validation(df: DataFrame, max_size: int = MAX_FILE_SIZE_BYTES) -> DataFrame:
    reason = reject_reason(max_size=max_size)
    # one analysis pass, not two (r17 — withColumn chains re-analyze
    # the whole plan per call); both expressions see the input columns
    return df.withColumns(
        {"reject_reason": reason, "valid": reason.isNull()}
    )


def split_valid(df: DataFrame, max_size: int = MAX_FILE_SIZE_BYTES) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejected) — rejected rows feed the DLQ leg directly,
    mirroring how the reference's unprocessable messages end up in the
    dead-letter channel (file-pipeline.yaml:265-277)."""
    v = with_validation(df, max_size=max_size)
    return v.filter(F.col("valid")).drop("valid", "reject_reason"), v.filter(~F.col("valid")).drop("valid")
