"""Kafka wire-format adapters (S1/S2/S10 — the broker boundary).

The reference's broker legs: GoAnywhere publishes bytes+headers to an
Artemis queue (docs/goanywhere-config.md:180-198); Camel consumes with 5
competing consumers (file-pipeline.yaml:17-21) and the DLQ route with 1
(dlq-handler.yaml:16-20). On Spark the broker is a Kafka topic:

- ``to_kafka_wire``       envelope → (key, value) producer projection
  (the engine's ingest-producer tool, S10),
- ``envelope.from_kafka_wire``  the inverse (consumer side),
- ``read_kafka_stream``   readStream builder for the consumer legs.

No broker runs in this container, so tests cover the wire projections'
round-trip (to_kafka_wire ∘ from_kafka_wire = identity on the envelope)
and the builders are exercised against the format only; on a cluster the
same code points at real bootstrap servers. Keying by correlation_id
gives per-file partition ordering (ST2) — the strongest ordering the
reference had (none across files, per-message within a consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_kafka_wire(env: DataFrame) -> DataFrame:
    """Producer projection: envelope → Kafka (key, value).

    value = JSON metadata + base64 content (WIRE_METADATA_SCHEMA);
    key = correlation_id so redeliveries land on the same partition and
    compaction/ordering work per transfer. Feed to
    ``df.write.format("kafka")`` / ``writeStream.format("kafka")``.
    """
    return env.select(
        F.col("correlation_id").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                F.col("file_name").alias("fileName"),
                F.col("content_type").alias("contentType"),
                F.col("file_size").alias("fileSize"),
                F.col("transfer_id").alias("transferId"),
                F.col("checksum").alias("checksum"),
                F.col("correlation_id").alias("correlationId"),
                F.base64(F.col("content")).alias("content"),
                # full microsecond precision: millisecond truncation would
                # let event-time ordering invert across a broker round trip
                F.date_format("event_time", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias(
                    "eventTime"
                ),
                F.col("delivery_count").alias("deliveryCount"),
            )
        ).cast("binary").alias("value"),
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int | None = None,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Consumer leg builder (S1/S2): Kafka source → raw wire DataFrame.

    ``max_offsets_per_trigger`` is the engine's admission control — the
    analogue of the broker's paging/connection caps (ST3,
    amq-broker.yaml:81-82). Compose with ``envelope.from_kafka_wire``.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()
