"""Envelope model: binaryFile source, Kafka wire parse, derivations."""

from __future__ import annotations

import base64
import hashlib
import json

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.envelope import (
    ENVELOPE_SCHEMA,
    from_binary_files,
    from_events_table,
    from_kafka_wire,
    with_derived,
)
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table


def test_binary_file_source(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(b"hello pdf")
    (tmp_path / "b.txt").write_bytes(b"text file")
    env = from_binary_files(spark, str(tmp_path))
    rows = {r.file_name: r for r in env.collect()}
    assert set(rows) == {"a.pdf", "b.txt"}
    a = rows["a.pdf"]
    assert a.content_type == "application/pdf"
    assert a.file_size == len(b"hello pdf")
    assert a.checksum == hashlib.sha256(b"hello pdf").hexdigest()
    assert a.transfer_id.startswith("GOANYWHERE-")
    # correlation id is deterministic (content+name hash) for idempotence
    again = from_binary_files(spark, str(tmp_path)).collect()
    assert {r.correlation_id for r in again} == {r.correlation_id for r in rows.values()}


def test_binary_file_glob_pushdown(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(b"x")
    (tmp_path / "b.exe").write_bytes(b"y")
    env = from_binary_files(spark, str(tmp_path), glob="*.pdf")
    assert [r.file_name for r in env.collect()] == ["a.pdf"]


def test_kafka_wire_roundtrip(spark):
    content = b"file-bytes-here"
    msg = {
        "fileName": "report.pdf",
        "contentType": "application/pdf",
        "fileSize": len(content),
        "transferId": "GOANYWHERE-20240101120000000",
        "checksum": hashlib.sha256(content).hexdigest(),
        "correlationId": "abc-123",
        "content": base64.b64encode(content).decode(),
        "eventTime": "2024-01-01T12:00:00.000Z",
    }
    kafka_shaped = spark.createDataFrame(
        [(json.dumps(msg).encode(), None)], "value binary, timestamp timestamp"
    )
    env = from_kafka_wire(kafka_shaped)
    assert env.schema["content"].dataType.typeName() == "binary"
    row = env.collect()[0]
    assert row.file_name == "report.pdf"
    assert bytes(row.content) == content
    assert row.correlation_id == "abc-123"


def test_derived_keys(spark, sf_dir):
    env = with_derived(from_events_table(load_table(spark, sf_dir, "events")))
    row = env.filter(F.col("correlation_id") == "0").collect()[0]
    assert row.incoming_key == f"incoming/{row.processing_date}/0/{row.file_name}"
    assert row.processed_key.endswith(".json")
    assert row.failed_key.endswith(".failure.json")
    assert row.processing_date.count("/") == 2


def test_envelope_schema_is_explicit():
    names = [f.name for f in ENVELOPE_SCHEMA.fields]
    assert names == [
        "correlation_id", "transfer_id", "file_name", "content_type",
        "file_size", "checksum", "content", "event_time", "delivery_count",
    ]


def test_binary_files_min_age_stability(spark, tmp_path):
    """S9 parity: the monitor's file-stability age check via
    modifiedBefore — only files older than the cutoff are picked up."""
    import os

    from fbg_kafka_stream_file_transfer_spark.envelope import from_binary_files

    old, new = tmp_path / "old.pdf", tmp_path / "new.pdf"
    old.write_bytes(b"settled")
    new.write_bytes(b"still being written")
    os.utime(old, (1700000000, 1700000000))  # 2023-11-14
    os.utime(new, (1900000000, 1900000000))  # 2030-03-17
    env = from_binary_files(spark, str(tmp_path), min_age="2024-01-01T00:00:00")
    assert [r.file_name for r in env.collect()] == ["old.pdf"]
