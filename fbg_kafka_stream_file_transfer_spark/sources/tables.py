"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

The driver generated them with nanosecond-precision parquet timestamps,
which Spark's vectorized parquet reader rejects
(PARQUET_TYPE_ILLEGAL INT64 TIMESTAMP(NANOS)). We read nanos as longs
(`spark.sql.legacy.parquet.nanosAsLong`) and cast to microsecond
timestamps at load — truncation toward zero, matching DuckDB's own
nanos→micros conversion so oracle comparisons agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: timestamp columns per table (stored as TIMESTAMP(NANOS) in the files)
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # defensive: callers (e.g. the driver harness) may hand us a session
    # without UTC pinned; timestamp formatting must not depend on it
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            # integer DIV: `/` would go through double and lose ns precision
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return df


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition up to cluster parallelism when the scan is too coarse.

    File sources parallelize at row-group granularity; a table written as
    one row group (or a few huge ones) otherwise pins CPU-bound work —
    shingling, hashing, pandas-UDF extraction — to a handful of cores. At
    scale inputs have many splits and this is a no-op; the guard means we
    never pay a shuffle when the source is already parallel enough.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
