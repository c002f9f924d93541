"""Kafka wire-format adapters (S1/S10) and streaming dedupe (ST7)."""

import pyspark.sql.functions as F

from fbg_kafka_stream_file_transfer_spark.envelope import from_events_table, from_kafka_wire
from fbg_kafka_stream_file_transfer_spark.sources.kafka import to_kafka_wire
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table
from fbg_kafka_stream_file_transfer_spark.streaming.dedupe import suppress_redeliveries

SF_DIR = "/root/testdata/sf0.001"


def test_wire_roundtrip_identity(spark):
    env = from_events_table(load_table(spark, SF_DIR, "events"))
    wire = to_kafka_wire(env).withColumn("timestamp", F.lit(None).cast("timestamp"))
    back = from_kafka_wire(wire)

    cols = ["correlation_id", "transfer_id", "file_name", "content_type", "file_size", "checksum"]
    orig = {tuple(r) for r in env.select(*cols).collect()}
    rt = {tuple(r) for r in back.select(*cols).collect()}
    assert orig == rt

    # payload bytes survive base64: re-hash equals the original checksum
    bad = back.filter(F.sha2(F.col("content"), 256) != F.col("checksum")).count()
    assert bad == 0


def test_wire_key_is_correlation_id(spark):
    env = from_events_table(load_table(spark, SF_DIR, "events"))
    wire = to_kafka_wire(env)
    assert wire.columns == ["key", "value"]
    row = wire.select(F.col("key").cast("string")).first()
    assert row[0].isdigit()  # event_id-derived correlation id


def test_suppress_redeliveries_batch(spark):
    env = from_events_table(load_table(spark, SF_DIR, "events"))
    doubled = env.unionAll(env)
    out = suppress_redeliveries(doubled)
    assert out.count() == env.count()


def test_suppress_redeliveries_streaming_plan(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.col("value").cast("string").alias("correlation_id"),
            F.col("timestamp").alias("event_time"),
        )
    )
    out = suppress_redeliveries(stream)
    assert out.isStreaming
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan


def test_incremental_dedup_against_index(spark, tmp_path):
    """Batch 2's near-copy of a batch-1 doc is flagged against the
    index; batch 1 itself (empty index) flags nothing; an unrelated doc
    never flags."""
    from fbg_kafka_stream_file_transfer_spark.streaming.dedupe import dedup_against_index

    idx = str(tmp_path / "lsh_index")
    base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    batch1 = spark.createDataFrame(
        [(1, base), (2, "completely different content about spark streaming engines at scale")],
        "doc_id long, text string",
    )
    out1 = dedup_against_index(batch1, idx)
    assert out1.count() == 0  # nothing indexed yet

    batch2 = spark.createDataFrame(
        [(10, base + " extra"), (11, "totally unrelated words nothing shared here at all today")],
        "doc_id long, text string",
    )
    out2 = dedup_against_index(batch2, idx).collect()
    assert [(r.doc, r.dup_of) for r in out2] == [(10, 1)]
    assert out2[0].jaccard > 0.7
