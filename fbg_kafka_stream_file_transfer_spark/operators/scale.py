"""Scale machinery: skew salting and bucketed co-located joins.

Two techniques the 100 TB design leans on when AQE alone isn't enough
(SCALE.md):

- **Salting** — a hot grouping key (one customer, one boilerplate
  document fingerprint) overloads its shuffle partition. Two-stage
  aggregation splits each key into ``n_salts`` sub-keys, pre-aggregates
  per sub-key (map-side + first shuffle spread over n_salts
  partitions), then merges. Works for any algebraic aggregate.
- **Bucketing** — fact tables co-partitioned on their join key at write
  time join WITHOUT a shuffle: both sides' bucket layout satisfies the
  join's distribution requirement. This is how the incoming/processed/
  failed correlation joins (E6 replay) stay shuffle-free when the
  tables are petabyte-scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max} (algebraic: merge(fn) = fn except count →
    sum). ``salt_source`` defaults to a deterministic spread
    (crc32 of all key+value columns); pass a column for custom salting.

    Equivalent to ``df.groupBy(*key_cols).agg(...)`` — the oracle checks
    exactly that — but the first shuffle distributes each key over
    ``n_salts`` partitions, so a single hot key can no longer pin one
    reducer.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    # mix the physical partition id into the salt: value-only hashing
    # would give IDENTICAL duplicate rows one salt and leave a
    # row-duplication hot key exactly as skewed as before
    salt = (
        salt_source
        if salt_source is not None
        else F.crc32(F.concat_ws("\x1f", *[F.col(c) for c in df.columns]))
        + F.spark_partition_id()
    ) % n_salts

    stage1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt")
    first = stage1.agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return first.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Joining two tables bucketed identically on the join key compiles to
    a SortMergeJoin with NO Exchange on either side — verified by the
    plan assertion in tests. At 100 TB this converts the replay join's
    two full shuffles into local merges. ``path`` makes the table
    external at that location (warehouse dir is a static conf).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables (see ``write_bucketed``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
