"""The transfer-envelope data model.

The reference's unit of data is one JMS message per file transfer: raw
bytes body + a flat header map (reference README.md:163-169,
docs/goanywhere-config.md:353-371). Here that becomes an explicit
``StructType`` — schema enforced up-front instead of by convention, which
is a deliberate improvement the survey calls out (SURVEY.md §1.5).

Builders exist for the three ingestion shapes:

- ``from_binary_files``: Spark's ``binaryFile`` source is a near-exact
  match for the reference's GoAnywhere file monitor
  (docs/goanywhere-config.md:115-136) — path, modificationTime, length,
  content.
- ``from_kafka_wire``: parse the Kafka wire format (headers + binary
  value) the way the reference's JMS consumer reads header properties
  (camel/file-pipeline.yaml:27-56).
- ``from_events_table``: adapter from the driver's synthetic ``events``
  table, which stands in for the envelope stream in oracle-checked tests
  (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.derivations import (
    file_extension,
    mime_from_filename,
    processing_date,
    sha256_checksum,
    transfer_id,
)

#: Envelope schema, mirroring the reference's required message headers
#: (README.md:163-169) plus the bytes body and event time.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("correlation_id", T.StringType(), False),
        T.StructField("transfer_id", T.StringType(), True),
        T.StructField("file_name", T.StringType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("file_size", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("delivery_count", T.IntegerType(), True),
    ]
)

#: Kafka wire-format JSON value schema for envelope metadata (the bytes
#: body travels as the Kafka value when binary, or base64 inside JSON).
WIRE_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("fileName", T.StringType(), True),
        T.StructField("contentType", T.StringType(), True),
        T.StructField("fileSize", T.LongType(), True),
        T.StructField("transferId", T.StringType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("correlationId", T.StringType(), True),
        T.StructField("content", T.StringType(), True),  # base64
        T.StructField("eventTime", T.TimestampType(), True),
        T.StructField("deliveryCount", T.IntegerType(), True),
    ]
)


def from_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    stream: bool = False,
    max_files_per_trigger: int | None = None,
    min_age: str | None = None,
    archive_dir: str | None = None,
) -> DataFrame:
    """Envelope stream/table from a directory of files.

    Maps the reference's GoAnywhere file monitor + "prepare" workflow
    (docs/goanywhere-config.md:115-176): read bytes, SHA-256 checksum,
    correlation id, transferId, MIME from extension, size. ``glob``
    mirrors the monitor's ``*.pdf;*.docx`` file pattern
    (docs/goanywhere-config.md:123) via pushed-down ``pathGlobFilter``.

    Monitor-parity options:
    - ``min_age`` (batch only): the monitor's 5-second file-stability
      check (docs/goanywhere-config.md:127) via ``modifiedBefore`` —
      e.g. ``"2024-01-01T00:00:05"``; pass a concrete cutoff because
      Spark takes a timestamp, not a duration.
    - ``archive_dir`` (stream only): archive-after-send
      (docs/goanywhere-config.md:201-209) via
      ``cleanSource=archive`` + ``sourceArchiveDir``.
    """
    reader = spark.readStream if stream else spark.read
    reader = reader.format("binaryFile")
    if stream:
        # streaming sources require an explicit schema; binaryFile's is fixed
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if stream and max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if min_age and not stream:
        reader = reader.option("modifiedBefore", min_age)
    if archive_dir and stream:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    raw = reader.load(path)
    file_name = F.element_at(F.split(F.col("path"), "/"), -1)
    return raw.select(
        # correlation id must be deterministic for replay/idempotence
        # (SURVEY.md §7 risk (d)): derive from content hash + name instead
        # of uuid().
        sha256_checksum(F.concat(F.to_binary(file_name, F.lit("utf-8")), F.col("content"))).alias(
            "correlation_id"
        ),
        transfer_id(F.col("modificationTime")).alias("transfer_id"),
        file_name.alias("file_name"),
        mime_from_filename(file_name).alias("content_type"),
        F.col("length").alias("file_size"),
        sha256_checksum(F.col("content")).alias("checksum"),
        F.col("content"),
        F.col("modificationTime").alias("event_time"),
        F.lit(1).alias("delivery_count"),
    )


def from_kafka_wire(kafka_df: DataFrame) -> DataFrame:
    """Envelope from a Kafka source DataFrame (key/value/headers wire shape).

    The reference consumes JMS messages whose header properties carry the
    envelope metadata and whose bytes body is the file
    (camel/file-pipeline.yaml:17-66). With a Kafka topic the same contract
    is a JSON value (metadata + base64 content). Works identically on
    ``spark.read.format("kafka")`` and ``spark.readStream``.
    """
    meta = F.from_json(F.col("value").cast("string"), WIRE_METADATA_SCHEMA)
    return kafka_df.select(
        meta["correlationId"].alias("correlation_id"),
        meta["transferId"].alias("transfer_id"),
        meta["fileName"].alias("file_name"),
        meta["contentType"].alias("content_type"),
        meta["fileSize"].alias("file_size"),
        meta["checksum"].alias("checksum"),
        F.unbase64(meta["content"]).alias("content"),
        F.coalesce(meta["eventTime"], F.col("timestamp")).alias("event_time"),
        # preserve attempt state across broker round trips (retry topics
        # republish failures — resetting to 1 would retry forever);
        # messages from foreign producers default to first delivery
        F.coalesce(meta["deliveryCount"], F.lit(1)).alias("delivery_count"),
    )


#: event_type → file extension for the events→envelope adapter. ``error``
#: maps to an unsupported type so the validation/DLQ legs get traffic.
EVENT_TYPE_EXTENSION: dict[str, str] = {
    "click": "png",
    "purchase": "pdf",
    "signup": "docx",
    "view": "txt",
    "error": "exe",
}


def from_events_table(events: DataFrame) -> DataFrame:
    """Adapter: the driver's synthetic ``events`` table → envelope columns.

    ``events(event_id, ts, user_id, event_type, value, props)`` plays the
    role of the transfer envelope in oracle-checked queries (FIXTURES.md §1):
    event_id → correlation id, event_type → a file-kind discriminator,
    value → file size surrogate, ts → event time.
    """
    from .sources.tables import ensure_parallelism

    # checksum + derivations are per-row CPU work; don't let a coarse
    # source split serialize them
    events = ensure_parallelism(events)
    ext = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in EVENT_TYPE_EXTENSION.items() for x in kv]
        ),
        F.col("event_type"),
    )
    file_name = F.concat_ws(
        ".", F.concat(F.lit("file-"), F.col("event_id")), ext
    )
    return events.select(
        F.col("event_id").cast("string").alias("correlation_id"),
        transfer_id(F.col("ts")).alias("transfer_id"),
        file_name.alias("file_name"),
        mime_from_filename(file_name).alias("content_type"),
        # floor before cast: Spark cast(double→long) truncates but DuckDB
        # CAST rounds; floor() agrees on both for nonnegative sizes
        F.floor(F.col("value")).cast("long").alias("file_size"),
        sha256_checksum(F.to_binary(F.col("props"), F.lit("utf-8"))).alias("checksum"),
        F.to_binary(F.col("props"), F.lit("utf-8")).alias("content"),
        F.col("ts").alias("event_time"),
        (F.col("event_id") % 4 + 1).cast("int").alias("delivery_count"),
    )


def with_derived(df: DataFrame) -> DataFrame:
    """Standard route derivations (reference camel/file-pipeline.yaml:27-66):

    processing_date (P3), the three object-store keys (P4-P6), and the
    file extension. All Catalyst-native ``withColumn`` projections — the
    reference does the same work as per-message property assignments.
    """
    from .functions.derivations import object_key

    date = processing_date(F.col("event_time"))
    cid, fname = F.col("correlation_id"), F.col("file_name")
    # ONE withColumns call: every chained withColumn re-analyzes the
    # whole (deep) route plan on the driver — five passes became one
    # (r17; the route spent ~0.77 s/run in plan analysis, and the
    # streaming pipeline re-plans per micro-batch). Same columns, same
    # order, expressions all derive from base columns.
    return df.withColumns(
        {
            "processing_date": date,
            "extension": file_extension(fname),
            "incoming_key": object_key("incoming", date, cid, fname),
            "processed_key": object_key("processed", date, cid, fname, ".json"),
            "failed_key": object_key("failed", date, cid, fname, ".failure.json"),
        }
    )
