"""Corpus / table profiling — the data-quality pass of a training-data
pipeline: per-column counts, null rates, distinct cardinality, and
min/max, computed in ONE scan.

Scale: a single groupBy().agg() with every statistic as a column —
map-side partial aggregation, one reduce of a single row. The wide row
is then unpivoted driver-free with a stack() projection. Use
``approx=True`` at 100 TB for HLL distinct counts (mergeable sketch);
exact mode exists for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null, n_distinct,
    min_value, max_value) — min/max stringified so heterogeneous column
    types share one schema."""
    aggs = []
    for i, c in enumerate(cols):
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        # positional internal aliases: raw column names may contain
        # spaces/quotes/keywords that would break the stack() expression
        aggs += [
            F.count(F.lit(1)).alias(f"_c{i}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_c{i}__nulls"),
            distinct.alias(f"_c{i}__distinct"),
            # aggregate on the NATIVE type, stringify the result —
            # casting first would make numeric min/max lexicographic
            F.min(F.col(c)).cast("string").alias(f"_c{i}__min"),
            F.max(F.col(c)).cast("string").alias(f"_c{i}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c.replace(chr(39), chr(39)*2)}', _c{i}__n, _c{i}__nulls, _c{i}__distinct, _c{i}__min, _c{i}__max"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_rows, n_null, n_distinct, min_value, max_value)"
    )
