"""Changelog compaction: change-data-capture shapes over an event stream.

The reference pipeline emits a status event per file transition
(incoming → processing → processed/failed — camel-integration's route
legs set a fresh status header at each hop, file-pipeline.yaml); replayed
or re-delivered events make the raw stream an append-only CHANGELOG, not
a state table. These operators derive the two standard downstream views:

- :func:`changelog_to_scd2` — the full validity-interval history
  (slowly-changing-dimension type 2): one row per *state run* with
  ``valid_from``/``valid_to``, no-op repeats collapsed.
- :func:`latest_state` — the type-1 "current state" compaction (one row
  per key, last writer wins).

Scale shape (100 TB): both are single-shuffle window plans on the key.
SCD2's two windows (lag-collapse, then lead-intervals) share the same
partitioning and ordering, so Catalyst plans ONE exchange + one sort and
reuses them across both window operators — verified in the plan-shape
unit test. Keys (file ids / users) are high-cardinality and uniform; a
pathological hot key is bounded by its own history length, not corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def changelog_to_scd2(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: tuple[str, ...] = (),
    fmt: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Collapse an append-only change stream into SCD2 validity
    intervals: consecutive rows with an unchanged state are no-ops and
    dropped; each surviving row opens an interval ``[valid_from,
    valid_to)`` closed by the NEXT state change (NULL = still current).

    ``tiebreak_cols`` break ordering ties for equal timestamps (pass a
    unique event id — required for a deterministic result when a key
    changes state twice in one tick). Timestamps are emitted as
    formatted strings (queries.base timestamp rule).

    Events with a NULL timestamp are malformed (no event-time position
    in the changelog) and are dropped — the same contract as the
    streaming twin (streaming.state.streaming_funnel skips NaT rows).
    Keeping them would also be engine-divergent: Spark sorts NULLs
    FIRST on ASC while SQL oracles sort them LAST.

    Returns (key, state, valid_from, valid_to, is_current).
    """
    df = df.filter(F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    # row_number (not prev IS NULL) marks the run opener, so a genuine
    # NULL state in the first event isn't mistaken for "no previous row"
    marked = df.withColumn("_prev", F.lag(F.col(state_col)).over(w)).withColumn(
        "_rn", F.row_number().over(w)
    )
    changes = marked.filter(
        (F.col("_rn") == 1) | ~F.col(state_col).eqNullSafe(F.col("_prev"))
    )
    nxt = F.lead(F.col(ts_col)).over(w)
    return changes.select(
        F.col(key_col),
        F.col(state_col),
        F.date_format(F.col(ts_col), fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


def latest_state(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Type-1 compaction: the last row per key (max ts, ties broken by
    ``tiebreak_cols`` DESC so the result is deterministic and matches a
    ``row_number() = 1`` oracle). One shuffle on the key; partial
    aggregation does NOT apply to row_number, but the window's sort is
    per-key and AQE handles stragglers — for the pure "latest value of
    a few columns" case prefer a ``max_by`` aggregation, which does
    combine map-side; this keeps the WHOLE row, which max_by can't.

    NULL-timestamp events are dropped (malformed-event contract shared
    with :func:`changelog_to_scd2` and the streaming twin).
    """
    df = df.filter(F.col(ts_col).isNotNull())
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changelog(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str,
    tiebreak_cols: tuple[str, ...] = (),
    delete_op: str = "D",
) -> DataFrame:
    """Materialize a keyed changelog with DELETE tombstones into the
    current table: last writer wins per key (ts, then ``tiebreak_cols``
    DESC), and a key whose LATEST operation is ``delete_op`` vanishes
    from the result — the upsert/delete MERGE a CDC sink applies,
    expressed as one window plan (same single-exchange shape as
    :func:`latest_state`, which this extends with tombstone
    semantics). Earlier deletes overwritten by a later upsert
    correctly resurrect the key. NULL-timestamp events are dropped
    (shared malformed-event contract). A NULL op is an UPSERT, not a
    tombstone — deleting a key requires an explicit ``delete_op``
    (a bare ``!=`` filter would silently drop NULL-op winners).

    Scale: one shuffle on the key; a hot key costs its own history
    length only. The op column is kept in the output (always a
    non-delete op) so a downstream audit can see the surviving write.
    """
    current = latest_state(df, key_col, ts_col, tiebreak_cols=tiebreak_cols)
    return current.filter(~F.col(op_col).eqNullSafe(F.lit(delete_op)))
