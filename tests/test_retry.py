"""Retry/DLQ state machine (E2/E3/ST4/ST5): the reference's redelivery
policy — 3 attempts, 5 s initial, ×2 backoff, 60 s cap
(file-pipeline.yaml:269-273) — as deterministic scenario tests."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.retry import (
    DEFAULT_POLICY,
    RetryPolicy,
    due_for_retry,
    expire_by_ttl,
    split_retry_dlq,
    with_retry_schedule,
)

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _failures(spark, attempts):
    return spark.createDataFrame(
        [(str(i), a, TS) for i, a in enumerate(attempts)],
        "correlation_id string, delivery_count int, event_time timestamp",
    )


def test_backoff_schedule(spark):
    df = _failures(spark, [1, 2, 3, 4])
    out = {r.delivery_count: r for r in with_retry_schedule(df).collect()}
    # 5 s, then 10 s; attempts >= 3 are exhausted (no backoff, DLQ)
    assert out[1].retry_status == "RETRY" and out[1].backoff_seconds == 5
    assert out[2].retry_status == "RETRY" and out[2].backoff_seconds == 10
    assert out[3].retry_status == "DLQ" and out[3].backoff_seconds is None
    assert out[4].retry_status == "DLQ"
    assert out[1].next_attempt_time == TS + datetime.timedelta(seconds=5)


def test_backoff_cap(spark):
    policy = RetryPolicy(max_attempts=10, initial_delay_s=5, multiplier=2.0, max_delay_s=60)
    df = _failures(spark, [1, 3, 5, 6])
    out = {r.delivery_count: r.backoff_seconds for r in
           with_retry_schedule(df, policy=policy).collect()}
    assert out == {1: 5, 3: 20, 5: 60, 6: 60}  # 5,20,80→60,160→60


def test_poison_message_exactly_three_attempts(spark):
    """ST5: N poison rows surface in DLQ after exactly max_attempts."""
    df = _failures(spark, [1, 1, 2, 3, 3])
    retry, dlq = split_retry_dlq(df)
    assert retry.count() == 3 and dlq.count() == 2


def test_due_for_retry_increments_attempt(spark):
    df = _failures(spark, [1, 2])
    buf, _ = split_retry_dlq(df)
    now = F.lit((TS + datetime.timedelta(seconds=7)).isoformat()).cast("timestamp")
    due = due_for_retry(buf, now).collect()
    # only the 5 s backoff row is due at +7 s; its attempt count advanced
    assert len(due) == 1 and due[0].delivery_count == 2


def test_ttl_expiry(spark):
    old = TS - datetime.timedelta(days=10)
    df = spark.createDataFrame(
        [("old", 1, old), ("new", 1, TS)],
        "correlation_id string, delivery_count int, event_time timestamp",
    )
    got = {r.correlation_id: r.expiry_status
           for r in expire_by_ttl(df, ttl_seconds=7 * 24 * 3600).collect()}
    assert got == {"old": "EXPIRED", "new": "LIVE"}
