"""Data-layout operators: Z-order (Morton) clustering for multi-
dimensional scan pruning.

At 100 TB the scan is the query: a table sorted by one column prunes
row groups for predicates on that column only. Interleaving the bits of
TWO bucketed dimensions into one Morton key and range-partitioning the
write by it keeps every file narrow in BOTH dimensions, so parquet
min/max statistics prune for either predicate (the Delta/Iceberg
`ZORDER BY` capability, re-expressed with stock Spark: an expression +
`repartitionByRange` + sorted write — no table format required).

The bit math uses only shifts/AND on non-negative ints, expressible
identically in Spark and DuckDB — the portable-primitive rule
(queries.base) — so the key itself is oracle-checkable.

Scale shape: the key is map-side codegen; the clustered write is ONE
range shuffle (sampling + exchange) — the same cost as any sorted
write, paid once at layout time to make every later scan cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key_n(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of ``k`` non-negative bucketed
    ints: column ``j``'s bit ``i`` lands at position ``i·k + j`` (for
    ``k = 2`` this is exactly the classic 2-D Morton order
    :func:`morton_key` has always produced). Inputs must already be
    bucketed into [0, 2^bits); values are masked to ``bits`` so an
    out-of-range input degrades to wraparound rather than corrupting
    high bits. Returns a BIGINT (``k·bits`` ≤ 62).

    The expression is pure shifts/AND/multiply — map-side whole-stage
    codegen, no UDF — which is what lets ``ManifestTable.compact(
    zorder_by=[...])`` sort by it without ever materializing a key
    column."""
    k = len(cols)
    if k < 1:
        raise ValueError("morton_key_n needs at least one column")
    if bits < 1 or k * bits > 62:
        raise ValueError(
            f"k*bits must be in [1, 62], got k={k} bits={bits}"
        )
    masked = [c.cast("long").bitwiseAND((1 << bits) - 1) for c in cols]
    parts = []
    for i in range(bits):
        for j, c in enumerate(masked):
            parts.append(
                F.shiftright(c, i).bitwiseAND(1) * F.lit(1 << (i * k + j))
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative bucketed
    ints: ``a``'s bit i lands at position 2i, ``b``'s at 2i+1. Inputs
    must already be bucketed into [0, 2^bits) — see
    :func:`minmax_bucket`; values are masked to ``bits`` so an
    out-of-range input degrades to wraparound rather than corrupting
    high bits. Returns a BIGINT (2·bits ≤ 62). Thin wrapper over the
    k-ary :func:`morton_key_n` (bit placement identical for k = 2)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return morton_key_n([a, b], bits)


def morton_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL (DuckDB oracle mirror),
    generated from the same loop so the two can't drift."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({a}) & {mask}) >> {i} & 1) * {1 << (2 * i)}")
        terms.append(f"((({b}) & {mask}) >> {i} & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def minmax_bucket(
    df: DataFrame, col: str, bits: int, out_col: str = "bucket"
) -> DataFrame:
    """Bucket a numeric column into [0, 2^bits) by its global min/max —
    the quantization step before interleaving. The min/max pair is a
    1-row aggregate broadcast back onto every row (the centroid-join
    pattern); constant columns collapse to bucket 0. Returns ``df``
    with ``out_col`` added (a DataFrame, not a bare Column — the
    bucket needs the joined bounds in scope)."""
    n = 1 << bits
    stats = df.agg(
        F.min(F.col(col)).cast("double").alias("_lo"),
        F.max(F.col(col)).cast("double").alias("_hi"),
    )
    span = F.col("_hi") - F.col("_lo")
    raw = F.when(span <= 0, F.lit(0)).otherwise(
        F.floor((F.col(col).cast("double") - F.col("_lo")) / span * n)
    )
    bucket = F.least(raw, F.lit(n - 1)).cast("long")
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, bucket)
        .drop("_lo", "_hi")
    )


def cluster_by_morton(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 10,
    num_files: int = 8,
) -> DataFrame:
    """Return ``df`` re-arranged for a Z-order-clustered write: bucket
    both dimensions by global min/max, interleave into a ``_zkey``, and
    range-partition + locally sort by it. Writing the result yields
    ``num_files``-ish files each narrow in BOTH ``col_a`` and
    ``col_b``, so parquet footer min/max stats prune scans filtered on
    either — verified measurably in the unit test via pyarrow footer
    statistics against an unclustered write of the same rows."""
    stats = df.agg(
        F.min(F.col(col_a)).cast("double").alias("_loa"),
        F.max(F.col(col_a)).cast("double").alias("_hia"),
        F.min(F.col(col_b)).cast("double").alias("_lob"),
        F.max(F.col(col_b)).cast("double").alias("_hib"),
    )
    n = 1 << bits

    def bucket(col: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        raw = F.when(span <= 0, F.lit(0)).otherwise(
            F.floor((F.col(col).cast("double") - F.col(lo)) / span * n)
        )
        return F.least(raw, F.lit(n - 1)).cast("long")

    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "_zkey",
        morton_key(bucket(col_a, "_loa", "_hia"), bucket(col_b, "_lob", "_hib"), bits),
    )
    return (
        keyed.drop("_loa", "_hia", "_lob", "_hib")
        .repartitionByRange(num_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
    )
