"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose the oracle-checked operator inventory from
``fbg_kafka_stream_file_transfer_spark.queries`` (one entry per
implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from fbg_kafka_stream_file_transfer_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the file-pipeline route in batch form on sf0.001 —
    envelope ingest → validation split → derivations → per-date/outcome
    rollup (the A1/A6 monitoring view of the reference's main route)."""
    from pyspark.sql import functions as F

    from fbg_kafka_stream_file_transfer_spark.envelope import (
        from_events_table,
        with_derived,
    )
    from fbg_kafka_stream_file_transfer_spark.operators.validate import with_validation
    from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    env = with_validation(with_derived(from_events_table(events)))
    return (
        env.groupBy(
            "processing_date",
            F.coalesce(F.col("reject_reason"), F.lit("ACCEPTED")).alias("outcome"),
        )
        .agg(
            F.count("*").alias("n_files"),
            F.sum("file_size").alias("total_bytes"),
            F.round(F.avg("file_size"), 2).alias("avg_bytes"),
        )
        .orderBy("processing_date", "outcome")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
