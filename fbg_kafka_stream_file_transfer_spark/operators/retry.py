"""Retry-with-backoff / DLQ / expiry semantics (reference E2/E3/ST4/ST5).

The reference delegates retries to Camel's redelivery policy (3 attempts,
5 s initial delay, ×2 backoff, 60 s cap — camel/file-pipeline.yaml:265-277,
application.properties:88-94) and the broker's DLQ/expiry addresses
(k8s/amq-broker.yaml:76-82). Spark has no broker, so the engine owns the
state machine: attempt counts and next-attempt times are *columns*, the
retry buffer is a table/topic, and each micro-batch (or batch round)
re-admits rows whose backoff elapsed. Deterministic and replayable —
everything derives from event time + attempt count, never wall clock.

Anchor semantics: ``with_retry_schedule`` anchors the backoff at the
row's EVENT time — deterministic, so it is the batch/oracle form — which
means a failure older than ``max_delay_s`` is instantly due at the next
drain. The streaming drain (``streaming.pipeline.replay_due_retries``)
therefore re-anchors reschedules at drain time (now + backoff), matching
the reference's redeliveryDelay-counts-from-the-failure semantics
(application.properties:88-94).

Scale: pure projections + filters (no shuffle); the retry buffer is
partitioned by next_attempt bucket so re-admission prunes partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RetryPolicy:
    """Mirrors the reference redelivery policy (file-pipeline.yaml:269-273)."""

    max_attempts: int = 3
    initial_delay_s: int = 5
    multiplier: float = 2.0
    max_delay_s: int = 60

    def delay_for_attempt(self, attempt: Column) -> Column:
        """Backoff before retry #`attempt` (1-based): min(init·mult^(a-1), cap).

        Integer-valued by construction (5·2^k) so it is engine-portable.
        """
        raw = F.lit(self.initial_delay_s) * F.pow(F.lit(self.multiplier), attempt - 1)
        return F.least(F.floor(raw).cast("long"), F.lit(self.max_delay_s).cast("long"))


DEFAULT_POLICY = RetryPolicy()

#: Row dispositions after a failed attempt.
RETRY, DLQ = "RETRY", "DLQ"


def classify_attempt(
    attempt: Column, policy: RetryPolicy = DEFAULT_POLICY
) -> Column:
    """RETRY while attempts remain, DLQ at exhaustion (ST5 poison handling)."""
    return F.when(attempt >= policy.max_attempts, F.lit(DLQ)).otherwise(F.lit(RETRY))


def with_retry_schedule(
    df: DataFrame,
    attempt_col: str = "delivery_count",
    time_col: str = "event_time",
    policy: RetryPolicy = DEFAULT_POLICY,
) -> DataFrame:
    """Annotate failures with disposition + next-attempt schedule.

    Epoch-integer arithmetic (not interval types) keeps the derivation
    identical across engines and checkpoint-safe.
    """
    attempt = F.col(attempt_col)
    delay = policy.delay_for_attempt(attempt)
    next_ts = F.timestamp_seconds(F.unix_timestamp(F.col(time_col)) + delay)
    status = classify_attempt(attempt, policy)
    # one analysis pass, not three (r17): the downstream columns
    # reference the status EXPRESSION instead of the intermediate
    # column — same values (classify_attempt is a deterministic CASE,
    # and codegen subexpression elimination folds the repeats)
    return df.withColumns(
        {
            "retry_status": status,
            "backoff_seconds": F.when(status == RETRY, delay),
            "next_attempt_time": F.when(status == RETRY, next_ts),
        }
    )


def split_retry_dlq(
    df: DataFrame,
    attempt_col: str = "delivery_count",
    time_col: str = "event_time",
    policy: RetryPolicy = DEFAULT_POLICY,
) -> tuple[DataFrame, DataFrame]:
    """(retry_buffer, dlq) legs."""
    s = with_retry_schedule(df, attempt_col, time_col, policy)
    return (
        s.filter(F.col("retry_status") == RETRY),
        s.filter(F.col("retry_status") == DLQ),
    )


def due_for_retry(retry_buffer: DataFrame, now: Column) -> DataFrame:
    """Rows whose backoff has elapsed (re-admission filter).

    When the buffer carries the ``nab`` next-attempt hour-bucket column
    (``floor(unix(next_attempt_time)/3600)`` — the streaming sinks and
    the drain rebuild write the buffer PARTITIONED BY it,
    pipeline.py:_retry_partition_cols), an extra ``nab <= hour(now)``
    predicate is applied first: it reaches the scan as a
    ``PartitionFilters`` entry (plan-asserted in test_retry.py), so a
    due-probe touches only the elapsed buckets, not the whole buffer —
    at scale the buffer is dominated by far-future backoff rows. The
    bucket predicate is a strict superset of the row predicate
    (bucket(t) ≤ hour(now) whenever t ≤ now), so semantics are
    unchanged. A NULL bucket is ADMITTED to the row-level filter rather
    than excluded: a buffer that mixed legacy dt-only rows with
    bucketed ones carries NULLs under ``__HIVE_DEFAULT_PARTITION__``,
    and ``NULL <= h`` would silently drop those rows from every drain
    (the rebuild re-derives nab so the state self-heals, but the rows
    already written with NULL must still be eligible)."""
    df = retry_buffer
    if "nab" in df.columns:
        bucket = F.floor(F.unix_timestamp(now) / F.lit(3600))
        df = df.filter(F.col("nab").isNull() | (F.col("nab") <= bucket))
    return df.filter(F.col("next_attempt_time") <= now).withColumn(
        "delivery_count", F.col("delivery_count") + 1
    )


def expire_by_ttl(
    df: DataFrame,
    ttl_seconds: int,
    time_col: str = "event_time",
    now: Column | None = None,
) -> DataFrame:
    """ST4/E3 — broker message-expiry analogue: rows older than the TTL are
    tagged EXPIRED (the `file-transfer-expiry` address, amq-address.yaml:43-48).
    ``now`` defaults to max(event_time) so batch runs stay deterministic."""
    added_now = False
    if now is None:
        mx = df.agg(F.max(time_col).alias("__ttl_now__"))
        df = df.crossJoin(F.broadcast(mx))
        now = F.col("__ttl_now__")
        added_now = True
    age = F.unix_timestamp(now) - F.unix_timestamp(F.col(time_col))
    out = df.withColumn(
        "expiry_status", F.when(age > ttl_seconds, F.lit("EXPIRED")).otherwise(F.lit("LIVE"))
    )
    return out.drop("__ttl_now__") if added_now else out
