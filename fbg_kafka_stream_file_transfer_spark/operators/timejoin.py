"""Time-series joins Spark lacks as built-ins: as-of join and range
(interval) join — named explicitly in the engine mandate as operators to
re-express Spark-first.

Both are compositions of existing DataFrame ops (no UDF, no collect):

- **as-of join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as a tagged union +
  per-key ordered window with ``last(ignorenulls)``: ONE shuffle on the
  key (the union sorts within partitions), versus the naive
  inequality-join which is quadratic per key. This is the classic
  sort-based as-of strategy (kdb/Pandas ``merge_asof`` semantics).
- **range join** — pairs where a left timestamp falls inside a right
  interval. Implemented by bucketing time into ``bucket_seconds`` cells
  and exploding each interval over the cells it covers: the join
  becomes an equi-join on (key, cell) + an exact residual filter —
  work scales with interval_length/bucket instead of |left|×|right|
  per key. Pick ``bucket_seconds`` ≈ typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.derivations import epoch_seconds


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the as-of (most recent ``right_time <= left_time``)
    values of ``value_cols`` per ``on`` key. Right rows with equal
    timestamps to a left row DO match (<= semantics, like DuckDB ASOF).
    ``direction='forward'`` flips the match to the NEAREST
    ``right_time >= left_time`` — the "next reading after" lookup
    (merge_asof direction semantics) — by reversing the window order;
    ties among right rows at the identical (key, time) then resolve to
    the window's last in the REVERSED order, i.e. the earliest.

    Ties among right rows at the identical (key, time) resolve to the
    window's last — pre-aggregate the right side if that matters.
    Values ride inside a struct marker, so a right row whose value IS
    NULL still counts as the latest match (merge_asof semantics) rather
    than being skipped for a stale older value.
    """
    overlap = (set(left.columns) - set(on)) & set(value_cols)
    if overlap:
        raise ValueError(
            f"as_of_join: left already has value column(s) {sorted(overlap)}; "
            "rename them or the window would silently prefer the left row's own values"
        )
    reserved = {"_pri", "_t", "_asof"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"as_of_join: column name(s) {sorted(reserved)} are reserved")

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tag = left.withColumn("_pri", F.lit(1)).withColumn("_t", F.col(left_time))
    # malformed-event contract: a right row with NULL time has no
    # position in the series and can never be a valid match — without
    # this filter asc()'s NULLS FIRST would make it the running match
    # for every left row before the first real right row
    right = right.filter(F.col(right_time).isNotNull())
    r_tag = (
        right.select(
            *on,
            F.col(right_time).alias("_t"),
            F.struct(*[F.col(c) for c in value_cols]).alias("_asof"),
        )
        .withColumn("_pri", F.lit(0))
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows order before left rows at equal _t so <=/>= matches;
    # forward direction = the same running-last window over time
    # DESCENDING (nearest right_time >= left_time)
    # NULL-time LEFT rows must sort to the window head in BOTH
    # directions (nothing precedes them -> no match, mirroring
    # merge_asof): asc() is already NULLS FIRST; desc() is NULLS LAST
    # and would hand a NULL-ts left row the running match of the whole
    # partition, so the forward order pins desc_nulls_first explicitly.
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_pri").asc()]
    else:
        order = [F.col("_t").desc_nulls_first(), F.col("_pri").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_asof", F.last(F.col("_asof"), ignorenulls=True).over(w))
    for c in value_cols:
        u = u.withColumn(c, F.col("_asof")[c])
    return u.filter(F.col("_pri") == 1).drop("_pri", "_t", "_asof")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    range_start: str,
    range_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Pairs where ``range_start <= left_time < range_end`` per key.

    Right intervals explode over the time cells they cover; the pair
    join is then an equi-join on (key, cell) with an exact residual
    filter. No dedup pass is needed: a left row occupies exactly one
    cell, so each (left, interval) pair joins at most once.
    """
    cell = lambda c: F.floor(epoch_seconds(F.col(c)) / bucket_seconds)  # noqa: E731
    cells = F.sequence(cell(range_start), cell(range_end))
    r = right.withColumn("_cell", F.explode(cells))
    l = left.withColumn("_cell", cell(left_time))
    lt = epoch_seconds(F.col(left_time))
    # a left row occupies exactly one cell, so each (left, interval)
    # pair joins at most once — no dedup pass needed
    joined = l.join(r, [*on, "_cell"]).filter(
        (epoch_seconds(F.col(range_start)) <= lt)
        & (lt < epoch_seconds(F.col(range_end)))
    )
    return joined.drop("_cell")


def interval_overlap_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval×interval overlap join — the third temporal-join shape
    (as-of = point×latest, range = point×interval, this = interval×
    interval, e.g. SCD2 history against SCD2 history: "which states
    coexisted?"). Overlap is the half-open test
    ``l.start < r.end AND r.start < l.end``.

    Same bucketing strategy as :func:`range_join_bucketed`: both sides
    explode over the time cells their interval covers, the pair join is
    an equi-join on (key, cell) + exact residual filter. Unlike the
    point form an overlapping pair shares SEVERAL cells, so the
    residual keeps only the pair's FIRST shared cell (the cell of the
    overlap's start instant, covered by both sides by construction) —
    each input-row pair emits exactly once, and duplicated input rows
    duplicate the output exactly like the naive quadratic join (no
    distinct collapsing legitimate multiplicities). Work scales with
    interval_length/bucket per row; pick ``bucket_seconds`` near the
    typical interval length.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    cell = lambda c: F.floor(epoch_seconds(F.col(c)) / bucket_seconds)  # noqa: E731
    l = left.withColumn("_cell", F.explode(F.sequence(cell(left_start), cell(left_end))))
    r = right.withColumn("_cell", F.explode(F.sequence(cell(right_start), cell(right_end))))
    ls, le = epoch_seconds(F.col(left_start)), epoch_seconds(F.col(left_end))
    rs, re_ = epoch_seconds(F.col(right_start)), epoch_seconds(F.col(right_end))
    first_shared = F.floor(F.greatest(ls, rs) / bucket_seconds)
    return (
        l.join(r, [*on, "_cell"])
        .filter((ls < re_) & (rs < le) & (F.col("_cell") == first_shared))
        .drop("_cell")
    )
