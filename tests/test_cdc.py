"""Changelog-compaction operators (operators/cdc.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.cdc import (
    changelog_to_scd2,
    latest_state,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, datetime(2024, 1, 1, 0, 0, s), i, st) for i, (k, s, st) in enumerate(rows)],
        ["key", "ts", "eid", "state"],
    )


def test_scd2_collapses_noops_and_builds_intervals(spark):
    df = _events(
        spark,
        [
            ("f1", 0, "incoming"),
            ("f1", 10, "processing"),
            ("f1", 20, "processing"),  # no-op repeat (redelivery) — collapsed
            ("f1", 30, "processed"),
            ("f2", 5, "incoming"),
        ],
    )
    out = changelog_to_scd2(df, "key", "ts", "state", tiebreak_cols=("eid",))
    got = {
        (r.key, r.state, r.valid_from[-2:], r.valid_to[-2:] if r.valid_to else None, r.is_current)
        for r in out.collect()
    }
    assert got == {
        ("f1", "incoming", "00", "10", 0),
        ("f1", "processing", "10", "30", 0),  # interval spans the collapsed repeat
        ("f1", "processed", "30", None, 1),
        ("f2", "incoming", "05", None, 1),
    }


def test_scd2_null_state_in_first_event_kept(spark):
    df = _events(spark, [("f1", 0, None), ("f1", 10, "processing")])
    out = changelog_to_scd2(df, "key", "ts", "state", tiebreak_cols=("eid",))
    states = [r.state for r in out.orderBy("valid_from").collect()]
    assert states == [None, "processing"]  # rn=1 opener survives eqNullSafe


def test_scd2_single_exchange(spark):
    """All three window ops share one partitioning: exactly one shuffle."""
    df = _events(spark, [("f1", 0, "a"), ("f1", 1, "b")])
    plan = (
        changelog_to_scd2(df, "key", "ts", "state", tiebreak_cols=("eid",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_latest_state_last_writer_wins_with_tiebreak(spark):
    df = _events(spark, [("f1", 0, "a"), ("f1", 10, "b"), ("f1", 10, "c")])
    r = latest_state(df, "key", "ts", tiebreak_cols=("eid",)).collect()
    assert len(r) == 1 and r[0].state == "c"  # same ts → higher eid wins
