"""Streaming duplicate suppression (ST7).

The reference gets idempotence implicitly: at-least-once JMS delivery +
deterministic S3 keys mean a redelivered message overwrites its own
output (file-pipeline.yaml:80 — key = date/correlationId/fileName). The
engine makes both halves explicit:

- deterministic output keys (envelope.with_derived), and
- watermark-bounded duplicate suppression on ``correlation_id`` before
  the sinks, so redeliveries don't even reach them.

``dropDuplicatesWithinWatermark`` keeps state only within the watermark
horizon — bounded memory at any scale, unlike a plain
``dropDuplicates`` whose state grows forever on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def suppress_redeliveries(
    env: DataFrame,
    time_col: str = "event_time",
    key_col: str = "correlation_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate envelope rows (same correlation id) arriving within
    the watermark horizon. Batch DataFrames fall back to plain
    ``dropDuplicates`` (same semantics when the whole input is one
    'batch')."""
    if not env.isStreaming:
        return env.dropDuplicates([key_col])
    return env.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark([key_col])
