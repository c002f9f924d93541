"""Validation (F2/F4) and failure routing (F1) against hand-built rows."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.routing import (
    CIRCUIT_BREAKER,
    EXTRACTION_FAILED,
    STORAGE_FAILED,
    UNKNOWN,
    classify_failure,
    route_by_failure,
)
from fbg_kafka_stream_file_transfer_spark.operators.validate import split_valid, with_validation

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _env(spark, rows):
    return spark.createDataFrame(
        rows,
        "correlation_id string, file_name string, content_type string, "
        "file_size long, checksum string, event_time timestamp",
    )


def test_validation_reasons(spark):
    df = _env(
        spark,
        [
            ("1", "ok.pdf", "application/pdf", 100, "aa", TS),
            ("2", "bad.exe", "application/exe", 100, "aa", TS),
            ("3", "big.pdf", "application/pdf", 200 * 1024 * 1024, "aa", TS),
            ("4", "empty.pdf", "application/pdf", 0, "aa", TS),
            ("5", None, None, 100, "aa", TS),
        ],
    )
    got = {r.correlation_id: r.reject_reason for r in with_validation(df).collect()}
    assert got == {
        "1": None,
        "2": "UNSUPPORTED_FILE_TYPE",
        "3": "FILE_TOO_LARGE",
        "4": "EMPTY_FILE",
        "5": "MISSING_REQUIRED_FIELD",
    }
    ok, rej = split_valid(df)
    assert ok.count() == 1 and rej.count() == 4


def test_failure_routing(spark):
    df = spark.createDataFrame(
        [
            ("1", "CircuitBreakerOpenException: circuit breaker open"),
            ("2", "docling convert timed out"),
            ("3", "S3 upload failed: 503"),
            ("4", "NullPointerException"),
        ],
        "id string, error_msg string",
    )
    got = {
        r.id: r.cls
        for r in df.select("id", classify_failure(F.col("error_msg")).alias("cls")).collect()
    }
    assert got == {
        "1": CIRCUIT_BREAKER,
        "2": EXTRACTION_FAILED,
        "3": STORAGE_FAILED,
        "4": UNKNOWN,
    }
    legs = route_by_failure(df)
    assert legs[CIRCUIT_BREAKER].count() == 1
    assert sum(leg.count() for leg in legs.values()) == 4
