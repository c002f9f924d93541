"""Real-broker Kafka E2E (S1/S10 + route + sinks) — guarded.

Runs ONLY when ``SPARK_GRAFT_KAFKA`` points at a reachable bootstrap
server (e.g. ``SPARK_GRAFT_KAFKA=localhost:9092 pytest tests/
test_kafka_integration.py``); this container ships no broker (verified:
connect to 9092 → ECONNREFUSED) and no spark-sql-kafka connector JAR,
so the test self-skips here and activates the day the environment has
both. The wire-format itself is fully covered broker-less in
test_kafka_wire.py (to_kafka_wire ∘ from_kafka_wire = identity).

Exercises the reference's full broker loop (file-pipeline.yaml:17-21,
89-96): produce envelopes onto a fresh topic with ``to_kafka_wire``
(S10), consume with ``read_kafka_stream`` → ``from_kafka_wire`` (S1),
push each micro-batch through the route, and check the partitioned
sinks — the exact composition a cluster deployment runs.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set SPARK_GRAFT_KAFKA=host:port to run against a real broker",
)


def test_kafka_roundtrip_through_route_and_sinks(spark, tmp_path):
    from pyspark.sql import functions as F

    from fbg_kafka_stream_file_transfer_spark.envelope import (
        from_events_table,
        from_kafka_wire,
    )
    from fbg_kafka_stream_file_transfer_spark.sources.kafka import (
        read_kafka_stream,
        to_kafka_wire,
    )
    from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table
    from fbg_kafka_stream_file_transfer_spark.streaming.pipeline import (
        process_envelope_batch,
        write_batch_sinks,
    )

    topic = f"spark_graft_it_{uuid.uuid4().hex[:8]}"  # fresh per run
    env = from_events_table(load_table(spark, "/root/testdata/sf0.001", "events"))
    n_in = env.count()

    # S10 producer leg: envelope → (key, value) → broker
    (
        to_kafka_wire(env)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    # S1 consumer leg: broker → envelope → route → partitioned sinks
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    parsed = from_kafka_wire(
        read_kafka_stream(spark, BOOTSTRAP, topic, max_offsets_per_trigger=5000)
    )

    def sink(batch_df, epoch_id):
        write_batch_sinks(process_envelope_batch(batch_df), str(out), epoch_id)

    q = (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()

    # every produced envelope lands on exactly one leg, none vanish or
    # duplicate (keyed by correlation_id → per-file partition ordering)
    legs = []
    for leg in ("processed", "retry", "failed"):
        p = out / leg
        if p.exists():
            legs.append(
                spark.read.parquet(str(p)).select("correlation_id").distinct()
            )
    routed = legs[0]
    for other in legs[1:]:
        routed = routed.unionByName(other)
    assert routed.distinct().count() == n_in

    # payload bytes survived the broker round trip bit-exact
    inc = spark.read.parquet(str(out / "incoming"))
    assert inc.filter(F.sha2(F.col("content"), 256) != F.col("checksum")).count() == 0
