"""Failure classification / content-based routing (reference F1, E-family).

The reference routes exceptions by type + message predicate — circuit-
breaker failures get a distinct handler (file-pipeline.yaml:180-202,
``${exception.message} contains 'circuit breaker'``). In DataFrame form
routing is a CASE column plus filter splits; Catalyst will collapse the
split predicates into the scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Failure classes, in match order.
CIRCUIT_BREAKER = "CIRCUIT_BREAKER_OPEN"
EXTRACTION_FAILED = "EXTRACTION_FAILED"
STORAGE_FAILED = "STORAGE_FAILED"
UNKNOWN = "UNKNOWN_FAILURE"


def classify_failure(error_msg: Column) -> Column:
    """Map an exception message to a failure class (file-pipeline.yaml:184)."""
    lower = F.lower(F.coalesce(error_msg, F.lit("")))
    return (
        F.when(lower.contains("circuit breaker"), F.lit(CIRCUIT_BREAKER))
        .when(lower.contains("docling") | lower.contains("convert"), F.lit(EXTRACTION_FAILED))
        .when(lower.contains("s3") | lower.contains("storage"), F.lit(STORAGE_FAILED))
        .otherwise(F.lit(UNKNOWN))
    )


def route_by_failure(df: DataFrame, error_col: str = "error_msg") -> dict[str, DataFrame]:
    """Split a failure stream into per-class legs."""
    classified = df.withColumn("failure_class", classify_failure(F.col(error_col)))
    return {
        cls: classified.filter(F.col("failure_class") == cls)
        for cls in (CIRCUIT_BREAKER, EXTRACTION_FAILED, STORAGE_FAILED, UNKNOWN)
    }
