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


def shard_column(key: F.Column, n_shards: int) -> F.Column:
    """Deterministic, engine-portable shard id: md5-bucket of the key
    mod ``n_shards`` (same convention as sampling.rate_bucket, so split
    and shard selections stay mutually consistent)."""
    from ..operators.sampling import rate_bucket

    return (rate_bucket(key) % n_shards).cast("int")


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 8,
    compression: str | None = None,
) -> None:
    """Export a corpus as deterministic JSONL shards — the format
    tokenizer/training jobs actually consume (Dolma, RedPajama, chat
    logs all ship this way).

    - shard = md5-bucket(key) mod n_shards: reproducible on any engine
      and any cluster size — re-exporting yields the same doc→shard map,
      so downstream epoch seeds and resume offsets stay valid;
    - one ``to_json(struct(...))`` line per row (JVM-side, codegen —
      no Python in the path), written via the text sink partitioned by
      shard: readers stream one directory per shard;
    - ``compression='gzip'`` for the wire format public corpora use
      (gzip is per-file splittable only — many shards IS the
      parallelism, which the explicit repartition provides).

    Scale: one shuffle on the uniform shard key; output file count is
    O(n_shards), never O(tasks × shards) — the small-files guard.
    """
    cols = [c for c in df.columns]
    lines = df.select(
        shard_column(F.col(key_col), n_shards).alias("shard"),
        F.to_json(F.struct(*cols)).alias("value"),
    )
    writer = (
        lines.repartition(n_shards, "shard")
        .write.partitionBy("shard")
        .mode("overwrite")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)
