"""Envelope derivation functions (reference operators P1-P17).

The reference computes these upstream in GoAnywhere workflow tasks and
Camel `simple` expressions (docs/goanywhere-config.md:150-176,
camel/file-pipeline.yaml:27-66). Here each is a pure Catalyst column
expression — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Extension → MIME map; the reference's supported file-type policy
#: (docs/goanywhere-config.md:174,364-370).
MIME_MAP: dict[str, str] = {
    "pdf": "application/pdf",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "tiff": "image/tiff",
    "txt": "text/plain",
    "csv": "text/csv",
}

#: Max accepted file size (docs/goanywhere-config.md:371, amq-broker.yaml:81).
MAX_FILE_SIZE_BYTES = 100 * 1024 * 1024

def _mime_map_col() -> Column:
    # built lazily: F.lit needs an active SparkContext
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(MIME_MAP.items())])


def sha256_checksum(content: Column) -> Column:
    """P13 — SHA-256 hex of bytes (docs/goanywhere-config.md:160-165)."""
    return F.sha2(content, 256)


def transfer_id(ts: Column) -> Column:
    """P15 — ``GOANYWHERE-yyyyMMddHHmmssSSS`` (docs/goanywhere-config.md:172)."""
    return F.concat(F.lit("GOANYWHERE-"), F.date_format(ts, "yyyyMMddHHmmssSSS"))


def file_extension(file_name: Column) -> Column:
    """Lower-cased extension, '' when none."""
    return F.lower(F.regexp_extract(file_name, r"\.([^.]+)$", 1))


def mime_from_filename(file_name: Column) -> Column:
    """P16 — MIME type from filename extension (docs/goanywhere-config.md:174).

    A literal-map lookup: Catalyst folds this to a constant-keyed map
    probe — the degenerate broadcast join. Unknown extensions map to
    application/octet-stream like the reference's default.
    """
    return F.coalesce(
        F.element_at(_mime_map_col(), file_extension(file_name)),
        F.lit("application/octet-stream"),
    )


def processing_date(event_time: Column) -> Column:
    """P3 — ``yyyy/MM/dd`` partition-path component.

    The reference uses wall-clock `${date:now:yyyy/MM/dd}`
    (camel/file-pipeline.yaml:66); we derive from event time for
    determinism and replayability (SURVEY.md §2.b P3 note).
    """
    return F.date_format(event_time, "yyyy/MM/dd")


def epoch_seconds(ts: Column) -> Column:
    """Fractional epoch seconds for ANY timestamp flavor (LTZ or NTZ).

    Tz-less parquet (``timestamp[us]``) loads as TIMESTAMP_NTZ in
    Spark 4, and ``CAST(ntz AS DOUBLE)`` is an analysis error — so every
    timestamp→numeric conversion in this engine routes through here.
    The chain ``CAST(ts AS TIMESTAMP_LTZ) → DOUBLE`` re-interprets NTZ
    wall-clock under the session zone; with the zone pinned to UTC
    (session.py) that is value-preserving and equals DuckDB
    ``epoch(ts)`` to the microsecond. Numeric epoch columns round-trip
    unchanged (seconds → timestamp → seconds), so callers that accept
    either timestamps or epoch numbers may apply this uniformly.
    """
    return ts.cast("timestamp_ltz").cast("double")


def iso_timestamp(ts: Column) -> Column:
    """P12 — failure-report timestamp format (dlq-handler.yaml:40).

    Pattern 'Z' renders +0000 like the reference's SimpleDateFormat
    ('XX' would render the literal 'Z' at UTC).
    """
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSZ")


def object_key(prefix: str, date: Column, correlation_id: Column, file_name: Column,
               suffix: str = "") -> Column:
    """P4-P6 — deterministic object-store keys (file-pipeline.yaml:80,215;
    dlq-handler.yaml:95). Deterministic keys make at-least-once delivery
    idempotent (ST7)."""
    key = F.concat_ws("/", F.lit(prefix), date, correlation_id, file_name)
    return F.concat(key, F.lit(suffix)) if suffix else key


def docling_request(source_url: Column, to_format: str = "json", ocr: bool = True,
                    table_structure: bool = True) -> Column:
    """P8 — extraction-request JSON (camel/file-pipeline.yaml:124-142)."""
    return F.to_json(
        F.struct(
            source_url.alias("source"),
            F.struct(
                F.lit(None).cast("string").alias("from_format"),
                F.lit(to_format).alias("to_format"),
                F.lit(ocr).alias("ocr"),
                F.lit(table_structure).alias("table_structure"),
            ).alias("options"),
        ),
        # keep explicit nulls: the reference's request template carries
        # "from_format": null verbatim (file-pipeline.yaml:128-135)
        {"ignoreNullFields": "false"},
    )


def failure_report(file_name: Column, correlation_id: Column, transfer_id_col: Column,
                   failure_time: Column, redelivery_count: Column, exception: Column,
                   content_type: Column, file_size: Column, checksum: Column) -> Column:
    """P10 — DLQ failure-report JSON (dlq-handler.yaml:69-86)."""
    return F.to_json(
        F.struct(
            F.lit("FAILED").alias("status"),
            file_name.alias("fileName"),
            correlation_id.alias("correlationId"),
            transfer_id_col.alias("transferId"),
            iso_timestamp(failure_time).alias("failureTimestamp"),
            redelivery_count.alias("redeliveryCount"),
            exception.alias("exception"),
            F.struct(
                content_type.alias("contentType"),
                file_size.cast("string").alias("fileSize"),
                checksum.alias("checksum"),
            ).alias("headers"),
        )
    )


def pseudonymize(col: Column, salt: str) -> Column:
    """Deterministic keyed tokenization of an identifier: md5 over
    ``salt || ':' || value``. Same input + salt → same token (joins
    across pseudonymized tables still line up); without the salt the
    token is not reversible by rainbow lookup of the raw id space.
    NOT cryptographic HMAC (md5, no secret-key construction) — this is
    the referential-integrity-preserving tokenization pass of a data-
    clearing pipeline, not an anonymity guarantee against an adversary
    holding the salt. Map-side, engine-portable (md5 hex everywhere).
    """
    if not salt:
        raise ValueError("salt must be non-empty")
    return F.md5(F.concat(F.lit(salt), F.lit(":"), col.cast("string")))
