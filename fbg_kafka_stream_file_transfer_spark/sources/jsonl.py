"""JSONL corpus source with schema enforcement and bad-line accounting.

Training corpora ship as JSON-Lines far more often than parquet (Common
Crawl derivatives, Dolma, chat logs). Reading them "permissively" and
silently nulling malformed rows is how corpora rot — this source makes
the failure surface explicit:

- an EXPLICIT schema (never inferSchema: a schema-inference pass reads
  the whole corpus twice and a single bad file can flip a column's
  type for every downstream job);
- PERMISSIVE mode with a captured ``_corrupt_record`` column, split
  into a clean frame and a quarantine frame — the same
  validate-then-route shape as the envelope pipeline's F-series;
- per-batch accounting (clean/corrupt counts) for the ingestion log.

Scale: Spark's JSON reader splits by line across the cluster; the
corrupt split is a column filter, not a second pass. Gzip-compressed
inputs are line-splittable only per-file — ship many files, as every
public corpus does.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents-table schema in JSONL form (FIXTURES.md), the default
#: corpus contract
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


@dataclass(frozen=True)
class JsonlRead:
    """clean rows, quarantined raw lines, and the accounting counts."""

    clean: DataFrame
    quarantine: DataFrame
    n_clean: int
    n_corrupt: int


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    count: bool = True,
) -> JsonlRead:
    """Read a JSONL corpus against an explicit schema, splitting rows
    that failed to parse (or matched no schema field) into a quarantine
    frame of raw lines instead of silently nulling them.

    ``count=False`` skips the accounting action for callers embedding
    this in a larger lazy plan (counts come back as -1).

    The parsed frame is CACHED: Spark disallows querying the corrupt
    column straight off the scan (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN — the reader would have to re-parse and could
    disagree with itself), and its prescribed fix is exactly this
    cache. MEMORY_AND_DISK with eviction is safe here; corpora larger
    than the cluster's cache should write clean/quarantine out in one
    pass (the production shape) rather than hold the split lazily."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .cache()
    )
    # a row is corrupt iff the capture column is set; cache the split
    # point so clean/quarantine/counts share one parse when counted
    is_bad = F.col(_CORRUPT).isNotNull()
    clean = df.filter(~is_bad).drop(_CORRUPT)
    quarantine = df.filter(is_bad).select(F.col(_CORRUPT).alias("raw_line"))
    if not count:
        return JsonlRead(clean, quarantine, -1, -1)
    counts = df.select(
        F.sum((~is_bad).cast("long")).alias("ok"),
        F.sum(is_bad.cast("long")).alias("bad"),
    ).collect()[0]
    return JsonlRead(
        clean, quarantine, int(counts["ok"] or 0), int(counts["bad"] or 0)
    )
