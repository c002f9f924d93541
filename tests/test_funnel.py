"""Funnel analysis (operators/funnel.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.funnel import (
    funnel_completion,
    funnel_histogram,
)

T0 = datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s), i, e) for i, (u, s, e) in enumerate(rows)],
        "user string, ts timestamp, eid long, etype string",
    )


def _steps():
    return [F.col("etype") == s for s in ("a", "b", "c")]


def test_greedy_order_and_strictly_after(spark):
    df = _df(
        spark,
        [
            ("u1", 0, "a"), ("u1", 10, "b"), ("u1", 20, "c"),   # full funnel
            ("u2", 0, "b"), ("u2", 10, "a"), ("u2", 20, "b"),   # b before a ignored
            ("u3", 0, "a"), ("u3", 0, "b"),                      # same ts: not after
        ],
    )
    out = {
        r.user: (r.steps_completed, r.step_times)
        for r in funnel_completion(df, "user", "ts", _steps(), "eid").collect()
    }
    assert out["u1"][0] == 3
    assert out["u2"][0] == 2  # a at t=10, then the LATER b at t=20
    assert out["u2"][1][1] > out["u2"][1][0]
    assert out["u3"][0] == 1  # strict >: the equal-ts b doesn't count


def test_conversion_window_binds_to_earliest(spark):
    """Amplitude-style greedy: step binds to its EARLIEST qualifying
    event even when a later one would let the tail fit the window."""
    rows = [("u1", 0, "a"), ("u1", 5, "b"), ("u1", 100, "c")]
    df = _df(spark, rows)
    full = funnel_completion(df, "user", "ts", _steps(), "eid").collect()[0]
    assert full.steps_completed == 3
    narrow = funnel_completion(
        df, "user", "ts", _steps(), "eid", max_gap_seconds=50
    ).collect()[0]
    assert narrow.steps_completed == 2  # c is 95s after b — out of window


def test_histogram_counts_all_levels_one_shuffle(spark):
    df = _df(spark, [("u1", 0, "a"), ("u2", 0, "x"), ("u3", 0, "a"), ("u3", 1, "b")])
    out = funnel_histogram(df, "user", "ts", _steps(), "eid")
    got = {r.steps_completed: r.n_keys for r in out.collect()}
    assert got == {0: 1, 1: 1, 2: 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # per-key rollup is the only data-sized exchange; the histogram agg
    # re-shuffles only the per-key frame
    assert "Join" not in plan and "Cartesian" not in plan


def test_validation(spark):
    df = _df(spark, [("u1", 0, "a")])
    with pytest.raises(ValueError):
        funnel_completion(df, "user", "ts", [])
    with pytest.raises(ValueError):
        funnel_completion(df, "user", "ts", _steps(), max_gap_seconds=0)


def test_cohort_retention_triangle(spark):
    """u1,u2 cohort week 0 (u2 churns); u3 cohorts week 1. Rates are
    relative to each cohort's own week-0 size."""
    rows = [
        ("u1", 0, "a"), ("u1", 604800 + 5, "a"),       # active w0, w1
        ("u2", 10, "a"),                               # active w0 only
        ("u3", 604800 + 50, "a"),                      # cohort w1
    ]
    df = _df(spark, rows)
    from fbg_kafka_stream_file_transfer_spark.operators.funnel import (
        cohort_retention,
    )

    out = cohort_retention(df, "user", "ts", bucket_seconds=604800)
    got = {
        (r.cohort_start[:10], r.week_offset): (r.n_active, r.retention_rate)
        for r in out.collect()
    }
    # epoch week boundaries: T0 (2024-01-01) sits inside week starting 2023-12-28
    starts = sorted({k[0] for k in got})
    w0, w1 = starts[0], starts[1]
    assert got[(w0, 0)] == (2, 1.0)
    assert got[(w0, 1)] == (1, 0.5)
    assert got[(w1, 0)] == (1, 1.0)
    with pytest.raises(ValueError):
        cohort_retention(df, "user", "ts", bucket_seconds=0)


def test_streaming_funnel_matches_batch_twin(spark, tmp_path):
    """Two in-order micro-batches: final per-key funnel state equals the
    batch operator on the concatenated events; unchanged keys emit
    nothing in the second batch."""
    from fbg_kafka_stream_file_transfer_spark.streaming.state import (
        streaming_funnel,
    )

    batch1 = [("u1", 0, "a"), ("u1", 10, "b"), ("u2", 0, "a")]
    batch2 = [("u1", 20, "c"), ("u2", 5, "x")]  # u2: no progress → no emit
    schema = "user string, ts timestamp, eid long, etype string"
    src = tmp_path / "funnel_src"
    _df(spark, batch1).coalesce(1).write.parquet(str(src / "b1"))
    _df(spark, batch2).coalesce(1).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    flagged = stream.select(
        "user", "ts", "eid",
        *[(F.col("etype") == s).alias(f"s{i}") for i, s in enumerate(("a", "b", "c"))],
    )
    out = streaming_funnel(
        flagged, "user", "ts", ["s0", "s1", "s2"], tiebreak_col="eid"
    )
    q = (
        out.writeStream.format("memory").queryName("funnel_stream")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM funnel_stream").collect()
    finally:
        q.stop()
    per_key = {}
    for r in emitted:
        per_key.setdefault(r.key, []).append(r)
    assert len(per_key["u1"]) == 2 and len(per_key["u2"]) == 1
    final = {k: max(v, key=lambda r: r.steps_completed) for k, v in per_key.items()}
    batch = {
        r.user: r
        for r in funnel_completion(
            _df(spark, batch1 + batch2), "user", "ts", _steps(), "eid"
        ).collect()
    }
    for k, br in batch.items():
        assert final[k].steps_completed == br.steps_completed, k
        assert list(final[k].step_times) == list(br.step_times), k


def test_association_pairs_support_confidence_lift(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.funnel import (
        association_pairs,
    )

    # 4 users: a+b together twice, a alone once, c alone once
    rows = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"), ("u2", "b"), ("u2", "b"),  # duplicate (u2,b) collapses
        ("u3", "a"),
        ("u4", "c"),
    ]
    df = spark.createDataFrame(rows, "user string, item string")
    out = {(r.item_a, r.item_b): r for r in association_pairs(df, "user", "item").collect()}
    r = out[("a", "b")]
    assert r.n_keys_both == 2
    assert r.support == 0.5              # 2 of 4 users
    assert r.confidence_a_to_b == round(2 / 3, 6)  # a appears for 3 users
    assert r.lift == round(0.5 / ((3 / 4) * (2 / 4)), 6)  # > 1: associated
    assert ("a", "c") not in out         # never co-occur → no pair row

    import pytest as _pytest

    with _pytest.raises(ValueError):
        association_pairs(df, "user", "item", min_support=1.5)
