#!/usr/bin/env python3
"""End-to-end example: the monitoring/alerting stack over an event log.

The reference's analytical workload is its Prometheus rules
(k8s/monitoring/alerts.yaml); this engine reproduces them as DataFrame
aggregations and extends them with self-calibrating anomaly detection.
Composed below over the synthetic ``events`` table:

1. A1 error rate, 5-minute sliding windows     — the headline SLO
2. A3 p95 processing time per window           — latency envelope
3. `for: N` debounce of the error-rate alert   — batch form
4. rolling z-score spike detection per event type
   (batch form + the stateful streaming twin on the same series,
    printed side by side to show bucket-for-bucket parity)

    python examples/run_monitoring.py [sf_dir]

Default sf_dir=/root/testdata/sf0.001. Every step is a plain DataFrame
transform; the streaming twin runs the identical math from the state
store.
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from fbg_kafka_stream_file_transfer_spark import get_spark
from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
    error_rate,
    p95_processing_time,
    rolling_zscore_spikes,
    sustained_breach,
)
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table
from fbg_kafka_stream_file_transfer_spark.streaming.state import (
    streaming_zscore_spikes,
)


def main(sf_dir: str) -> None:
    spark = get_spark("monitoring-example")
    ev = load_table(spark, sf_dir, "events")
    pipe = ev.select(
        F.col("ts").alias("event_time"),
        F.when(F.col("event_type") == "error", F.lit("FAILED"))
        .otherwise(F.lit("COMPLETED"))
        .alias("status"),
        F.col("value").alias("processing_seconds"),
    )

    # 1. A1 — sliding error rate (alerts.yaml:28-38)
    rates = error_rate(pipe, window="5 minutes", slide="1 minute")
    print("== A1 error rate (worst 5 sliding windows) ==")
    rates.orderBy(F.col("error_rate").desc()).limit(5).show(truncate=False)

    # 2. A3 — p95 processing time per window (alerts.yaml:51-60)
    print("== A3 p95 processing seconds (first 5 windows) ==")
    p95_processing_time(pipe).orderBy("window_start").limit(5).show()

    # 3. `for: N` debounce — alert only after 3 consecutive breaches
    print("== debounced error-rate alert (breached windows only) ==")
    breach = sustained_breach(
        rates, "error_rate", threshold=0.15, consecutive=3,
        window_step_seconds=60,
    )
    breach.filter(F.col("alert")).orderBy("window_start").limit(5).show()

    # 4. rolling z-score spikes per event type — batch form
    buckets = ev.groupBy(
        F.col("event_type").alias("group_key"),
        F.window(F.col("ts"), "5 minutes").start.alias("bucket_start"),
    ).agg(F.count("*").cast("long").alias("n_events"))
    batch = rolling_zscore_spikes(
        buckets, "group_key", "bucket_start", "n_events"
    )
    print("== z-score spikes (batch) ==")
    batch.filter(F.col("spike") == 1).orderBy("bucket_start").limit(5).show()

    # ...and the streaming twin over the identical series: park the
    # buckets as a file stream, run the stateful operator, compare
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/buckets"
        buckets.write.parquet(src)
        stream = spark.readStream.schema(
            "group_key string, bucket_start timestamp, n_events long"
        ).parquet(src)
        q = (
            streaming_zscore_spikes(
                stream, "group_key", "bucket_start", "n_events"
            )
            .writeStream.format("memory")
            .queryName("live_spikes")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            live_n = spark.sql(
                "SELECT count(*) AS n FROM live_spikes WHERE spike = 1"
            ).collect()[0]["n"]
        finally:
            q.stop()
    batch_n = batch.filter(F.col("spike") == 1).count()
    print(f"spikes flagged — batch: {batch_n}  streaming twin: {live_n}")
    assert batch_n == live_n, "batch/streaming parity violated"

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
