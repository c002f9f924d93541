"""Changelog-compaction operators (operators/cdc.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

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


def test_streaming_latest_state_matches_batch_and_emits_changes_only(spark, tmp_path):
    """Batch/stream parity for type-1 compaction, plus the changelog
    contract: a micro-batch whose events all lose the (ts, tiebreak)
    comparison emits nothing."""
    from fbg_kafka_stream_file_transfer_spark.streaming.state import (
        streaming_latest_state,
    )

    schema = "key string, ts timestamp, eid long, state string"
    batch1 = [
        ("f1", datetime(2024, 1, 1, 0, 0, 0), 1, "incoming"),
        ("f1", datetime(2024, 1, 1, 0, 0, 30), 2, "processing"),
        ("f2", datetime(2024, 1, 1, 0, 0, 10), 3, "incoming"),
    ]
    batch2 = [  # f1: stale redelivery (loses); f2: genuine advance
        ("f1", datetime(2024, 1, 1, 0, 0, 0), 1, "incoming"),
        ("f2", datetime(2024, 1, 1, 0, 0, 40), 4, "processed"),
    ]
    src = tmp_path / "changelog"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = streaming_latest_state(stream, "key", "ts", "eid", "state")
    q = (
        out.writeStream.format("memory").queryName("latest_test")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM latest_test").collect()
    finally:
        q.stop()
    # f1 emitted once (batch2's stale redelivery mutates nothing),
    # f2 twice (it advanced in both batches)
    per_key = {}
    for r in emitted:
        per_key.setdefault(r.key, []).append(r)
    assert len(per_key["f1"]) == 1 and len(per_key["f2"]) == 2
    final = {k: max(v, key=lambda r: (r.last_ts, r.last_tiebreak)) for k, v in per_key.items()}
    batch = latest_state(
        spark.createDataFrame(batch1 + batch2, schema), "key", "ts", tiebreak_cols=("eid",)
    ).collect()
    assert {(r.key, r.ts, r.eid, r.state) for r in batch} == {
        (k, r.last_ts, r.last_tiebreak, r.last_state) for k, r in final.items()
    }


def test_streaming_latest_state_skips_malformed_events(spark, tmp_path):
    """NULL ts / NULL tiebreak events must not kill the query or win."""
    from fbg_kafka_stream_file_transfer_spark.streaming.state import (
        streaming_latest_state,
    )

    schema = "key string, ts timestamp, eid long, state string"
    rows = [
        ("f1", datetime(2024, 1, 1, 0, 0, 0), 1, "good"),
        ("f1", None, 2, "null-ts"),
        ("f1", datetime(2024, 1, 1, 0, 1, 0), None, "null-eid"),
    ]
    src = tmp_path / "mal"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_latest_state(stream, "key", "ts", "eid", "state")
        .writeStream.format("memory").queryName("mal_test")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM mal_test").collect()
    finally:
        q.stop()
    assert len(got) == 1 and got[0].last_state == "good"


def test_streaming_latest_state_ttl_evicts_idle_keys(spark, tmp_path):
    """Event-time TTL: a key whose newest event falls ttl behind the
    watermark is evicted with a tombstone on a later batch; active keys
    are untouched. Deterministic — driven by event time, no sleeps."""
    from fbg_kafka_stream_file_transfer_spark.streaming.state import (
        streaming_latest_state,
    )

    schema = "key string, ts timestamp, eid long, state string"
    src = tmp_path / "ttl_src"
    src.mkdir()
    t0 = datetime(2024, 1, 1)

    def drop(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )

    drop([("idle", t0, 1, "a")], "b1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = streaming_latest_state(
        stream, "key", "ts", "eid", "state", ttl_seconds=3600.0
    )
    q = (
        out.writeStream.format("memory").queryName("ttl_test")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # watermark jumps 10h past idle's event → way past its 1h ttl
        drop([("live", t0 + timedelta(hours=10), 2, "b")], "b2")
        q.processAllAvailable()
        # timeouts process on the batch after the watermark advanced
        drop([("live", t0 + timedelta(hours=11), 3, "c")], "b3")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ttl_test").collect()
    finally:
        q.stop()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    states = [(r.last_tiebreak, r.last_state) for r in by_key["idle"]]
    assert (1, "a") in states and (-1, None) in states  # emit + tombstone
    assert (-1, None) not in [
        (r.last_tiebreak, r.last_state) for r in by_key["live"]
    ]
