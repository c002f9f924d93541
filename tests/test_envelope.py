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


def _names_and_types(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_all_builders_match_envelope_schema(spark, tmp_path, sf_dir):
    """ENVELOPE_SCHEMA is the single authoritative contract: every
    ingestion builder must produce exactly its column names and types.
    Two deliberate slacks: nullability is advisory (builders derive some
    fields from literals whose nullability Catalyst narrows), and
    event_time may be TIMESTAMP or TIMESTAMP_NTZ — tz-less parquet
    sources yield NTZ (see tests/test_ntz.py) and the engine's time
    helpers (functions.derivations.epoch_seconds) accept both."""

    def check(schema):
        got = _names_and_types(schema)
        for (gn, gt), f in zip(got, ENVELOPE_SCHEMA.fields, strict=True):
            assert gn == f.name
            if gn == "event_time":
                assert gt.typeName() in ("timestamp", "timestamp_ntz")
            else:
                assert gt == f.dataType, gn

    (tmp_path / "a.pdf").write_bytes(b"x")
    check(from_binary_files(spark, str(tmp_path)).schema)

    kafka_shaped = spark.createDataFrame(
        [(b"{}", None)], "value binary, timestamp timestamp"
    )
    check(from_kafka_wire(kafka_shaped).schema)

    check(from_events_table(load_table(spark, sf_dir, "events")).schema)


def test_heartbeat_tick_matches_envelope_schema(spark):
    """The streaming heartbeat's typed-NULL row is generated FROM
    ENVELOPE_SCHEMA (streaming/pipeline.py) — pin that the generated
    select yields envelope columns + the _hb marker, unionByName-safe
    against a real envelope frame."""
    from pyspark.sql import types as T

    tick_cols = [
        (F.lit(1) if f.name == "delivery_count" else F.lit(None))
        .cast(f.dataType)
        .alias(f.name)
        for f in ENVELOPE_SCHEMA.fields
    ]
    tick = (
        spark.range(1).select(*tick_cols, F.lit(True).alias("_hb"))
    )
    expected = _names_and_types(ENVELOPE_SCHEMA) + [("_hb", T.BooleanType())]
    assert _names_and_types(tick.schema) == expected
    row = tick.collect()[0]
    assert row.delivery_count == 1 and row.correlation_id is None


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
