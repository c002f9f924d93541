"""Envelope projection / derivation / validation queries (SURVEY §2.b, §2.c).

The Spark side exercises the engine's envelope adapter and derivation
functions; the oracle side re-states the same derivations in DuckDB SQL
over the raw ``events`` view (FIXTURES.md §1: events stands in for the
transfer envelope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..envelope import from_events_table, with_derived
from ..functions.derivations import docling_request
from ..operators.validate import with_validation
from ..sources.tables import load_table
from .base import Q

#: DuckDB mirror of envelope.from_events_table + with_derived.
ENV_CTE = """
WITH envelope AS (
  SELECT CAST(event_id AS VARCHAR) AS correlation_id,
         'GOANYWHERE-' || strftime(ts, '%Y%m%d%H%M%S') || left(strftime(ts, '%f'), 3) AS transfer_id,
         'file-' || event_id || '.' || CASE event_type
             WHEN 'click' THEN 'png' WHEN 'purchase' THEN 'pdf'
             WHEN 'signup' THEN 'docx' WHEN 'view' THEN 'txt'
             WHEN 'error' THEN 'exe' END AS file_name,
         CASE event_type
             WHEN 'click' THEN 'image/png'
             WHEN 'purchase' THEN 'application/pdf'
             WHEN 'signup' THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
             WHEN 'view' THEN 'text/plain'
             ELSE 'application/octet-stream' END AS content_type,
         CAST(floor(value) AS BIGINT) AS file_size,
         sha256(props) AS checksum,
         ts AS event_time,
         CAST(event_id % 4 + 1 AS INTEGER) AS delivery_count,
         strftime(ts, '%Y/%m/%d') AS processing_date,
         event_type
  FROM events
)
"""

#: DuckDB mirror of operators.validate.reject_reason (same rule order).
REJECT_CASE = """CASE
  WHEN correlation_id IS NULL OR file_name IS NULL OR content_type IS NULL
       OR file_size IS NULL OR checksum IS NULL THEN 'MISSING_REQUIRED_FIELD'
  WHEN lower(regexp_extract(file_name, '\\.([^.]+)$', 1)) NOT IN
       ('pdf','docx','xlsx','pptx','png','jpg','jpeg','tiff','txt','csv')
       THEN 'UNSUPPORTED_FILE_TYPE'
  WHEN file_size > 104857600 THEN 'FILE_TOO_LARGE'
  WHEN file_size <= 0 THEN 'EMPTY_FILE' END"""


def _envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_derived(from_events_table(load_table(spark, sf_dir, "events")))


def _env_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P5, P13, P15-P17: full derivation projection."""
    return _envelope(spark, sf_dir).select(
        "correlation_id",
        "transfer_id",
        "file_name",
        "content_type",
        "file_size",
        "checksum",
        "processing_date",
        "incoming_key",
        "processed_key",
        "failed_key",
    )


def _env_validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F4 validation split — counts per outcome."""
    v = with_validation(_envelope(spark, sf_dir))
    return (
        v.groupBy(F.coalesce(F.col("reject_reason"), F.lit("ACCEPTED")).alias("outcome"))
        .agg(F.count("*").alias("n"), F.sum("file_size").alias("total_bytes"))
    )


def _env_rejected_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 rejected leg — rows routed to the DLQ path."""
    v = with_validation(_envelope(spark, sf_dir))
    return v.filter(~F.col("valid")).select(
        "correlation_id", "file_name", "content_type", "file_size", "reject_reason"
    )


def _env_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON field access (the reference stores JSON payloads as
    opaque strings, SURVEY §1.3 — we parse them natively)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("correlation_id"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


def _env_docling_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — extraction-request JSON templating."""
    env = _envelope(spark, sf_dir)
    source = F.concat(F.lit("s3://file-transfer-bucket/"), F.col("incoming_key"))
    return env.select(
        "correlation_id",
        docling_request(source).alias("request_json"),
    )


QUERIES: dict[str, Q] = {
    "env_projection": Q(
        _env_projection,
        ENV_CTE
        + """
SELECT correlation_id, transfer_id, file_name, content_type, file_size, checksum,
       processing_date,
       'incoming/' || processing_date || '/' || correlation_id || '/' || file_name AS incoming_key,
       'processed/' || processing_date || '/' || correlation_id || '/' || file_name || '.json' AS processed_key,
       'failed/' || processing_date || '/' || correlation_id || '/' || file_name || '.failure.json' AS failed_key
FROM envelope
""",
        doc="P1-P6,P13,P15-P17 envelope derivations (file-pipeline.yaml:27-66)",
    ),
    "env_validation_counts": Q(
        _env_validation_counts,
        ENV_CTE
        + f"""
SELECT coalesce({REJECT_CASE}, 'ACCEPTED') AS outcome,
       count(*) AS n,
       CAST(sum(file_size) AS BIGINT) AS total_bytes
FROM envelope GROUP BY 1
""",
        doc="F2/F4 validation policy (docs/goanywhere-config.md:364-371)",
    ),
    "env_rejected_rows": Q(
        _env_rejected_rows,
        ENV_CTE
        + f"""
SELECT correlation_id, file_name, content_type, file_size,
       {REJECT_CASE} AS reject_reason
FROM envelope
WHERE {REJECT_CASE} IS NOT NULL
""",
        doc="F2 rejected leg → DLQ routing",
    ),
    "env_json_extract": Q(
        _env_json_extract,
        """
SELECT CAST(event_id AS VARCHAR) AS correlation_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
""",
        doc="opaque-JSON field extraction (SURVEY §1.3)",
    ),
    "env_docling_request": Q(
        _env_docling_request,
        ENV_CTE
        + """
SELECT correlation_id,
       '{"from_format":null,"to_format":"json","ocr":true,"table_structure":true}' AS _opts,
       NULL AS request_json
FROM envelope LIMIT 0
""",
        doc="P8 request templating (file-pipeline.yaml:124-142) — oracle set separately below",
    ),
}

# Docling request JSON: build the exact string in DuckDB (field order and
# null handling must match Spark's to_json with ignoreNullFields=false).
QUERIES["env_docling_request"] = Q(
    _env_docling_request,
    ENV_CTE
    + """
SELECT correlation_id,
       '{"source":"s3://file-transfer-bucket/incoming/' || processing_date || '/' ||
       correlation_id || '/' || file_name ||
       '","options":{"from_format":null,"to_format":"json","ocr":true,"table_structure":true}}'
       AS request_json
FROM envelope
""",
    doc="P8 request templating (file-pipeline.yaml:124-142)",
)


def _env_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 ∘ S1 — envelope → Kafka wire (JSON value, base64 body) →
    envelope again; the oracle reads the same fields straight from the
    source, so any encode/decode loss would hash-mismatch. content
    survival is proven by re-hashing the decoded bytes."""
    from ..envelope import from_kafka_wire
    from ..sources.kafka import to_kafka_wire

    env = _envelope(spark, sf_dir)
    wire = to_kafka_wire(env).withColumn("timestamp", F.lit(None).cast("timestamp"))
    back = from_kafka_wire(wire)
    return back.select(
        "correlation_id",
        "transfer_id",
        "file_name",
        "content_type",
        "file_size",
        "checksum",
        F.date_format("event_time", "yyyy-MM-dd HH:mm:ss").alias("event_time_s"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


QUERIES["env_kafka_roundtrip"] = Q(
    _env_kafka_roundtrip,
    ENV_CTE
    + """
SELECT correlation_id, transfer_id, file_name, content_type, file_size, checksum,
       strftime(event_time, '%Y-%m-%d %H:%M:%S') AS event_time_s,
       checksum AS content_sha
FROM envelope
""",
    doc="S10/S1 Kafka wire-format round trip (docs/goanywhere-config.md:180-198)",
)
