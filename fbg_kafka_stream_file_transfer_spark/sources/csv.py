"""CSV corpus source/sink with RFC 4180 conventions and quarantine.

CSV remains the interchange format the long tail of upstream systems
actually emit (exports from RDBMSes, spreadsheets, labeling tools).
It is also the format where silent corruption is easiest: a bare quote
or an embedded newline shifts every subsequent field. This source
pins the failure surface the same way ``sources.jsonl`` does:

- RFC 4180 dialect EXPLICITLY: fields quoted with ``"``, embedded
  quotes DOUBLED (``escape='"'`` — Spark's default backslash escaping
  is not RFC 4180 and round-trips incompatibly with most writers),
  embedded newlines allowed inside quoted fields;
- an EXPLICIT schema (never inferSchema — one bad file must not flip
  a column type corpus-wide);
- PERMISSIVE parse with a captured ``_corrupt_record`` column split
  into clean/quarantine frames, mirroring the envelope pipeline's
  validate-then-route shape;
- deterministic md5-bucket sharding shared with the JSONL exporter,
  so doc→shard maps agree across output formats.

Scale: with ``multiLine=true`` (required for RFC 4180 embedded
newlines) each FILE is one parse unit — files, not line-splits, are
the parallelism, exactly like gzip JSONL; export many shards. When a
corpus is known newline-free, pass ``multi_line=False`` to restore
intra-file line splitting.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jsonl import DOCUMENTS_JSONL_SCHEMA, shard_column

#: same corpus contract as the JSONL source (FIXTURES.md)
DOCUMENTS_CSV_SCHEMA = DOCUMENTS_JSONL_SCHEMA

_CORRUPT = "_corrupt_record"

#: RFC 4180 dialect, shared by reader and writer so a Spark round-trip
#: is lossless AND interoperable with non-Spark RFC readers. RFC 4180
#: has no NULL concept, so the dialect pins the Hive/MySQL ``\N``
#: sentinel for NULL and keeps the empty field as the EMPTY STRING —
#: without the sentinel, ``nullValue=""`` (the Spark default) folds
#: text='' to NULL on the way back (r8 review finding). The one
#: documented collision: a field whose literal content is exactly
#: ``\N`` reads back as NULL (same trade Hive makes). DuckDB interop:
#: ``read_csv(..., nullstr='\\N')``.
_NULL_SENTINEL = "\\N"
_DIALECT = {"quote": '"', "escape": '"', "nullValue": _NULL_SENTINEL}
#: write-only: keep empty string distinguishable (quoted ""), and do
#: NOT trim whitespace-only fields — Spark's CSV WRITER defaults
#: ignoreLeading/TrailingWhiteSpace to TRUE (the reader defaults them
#: to false), silently folding ' ' to '' on the way out (caught by the
#: hypothesis dialect fuzz)
_WRITE_ONLY = {
    "emptyValue": '""',
    "ignoreLeadingWhiteSpace": False,
    "ignoreTrailingWhiteSpace": False,
}
#: read-only: quoted "" parses back to the empty string
_READ_ONLY = {"emptyValue": ""}


@dataclass(frozen=True)
class CsvRead:
    """clean rows, quarantined raw records, and accounting counts."""

    clean: DataFrame
    quarantine: DataFrame
    n_clean: int
    n_corrupt: int


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_CSV_SCHEMA,
    count: bool = True,
    multi_line: bool = True,
) -> CsvRead:
    """Read a CSV corpus against an explicit schema, quarantining rows
    that fail to parse (type mismatch, field-count mismatch) instead of
    silently nulling them.

    Cached at the split point for the same reason as ``read_jsonl``:
    Spark refuses to query the corrupt column straight off the scan
    (it would have to re-parse and could disagree with itself) and
    prescribes exactly this cache.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("multiLine", multi_line)
    )
    for k, v in {**_DIALECT, **_READ_ONLY}.items():
        reader = reader.option(k, v)
    df = reader.csv(path).cache()
    is_bad = F.col(_CORRUPT).isNotNull()
    clean = df.filter(~is_bad).drop(_CORRUPT)
    quarantine = df.filter(is_bad).select(F.col(_CORRUPT).alias("raw_record"))
    if not count:
        return CsvRead(clean, quarantine, -1, -1)
    counts = df.select(
        F.sum((~is_bad).cast("long")).alias("ok"),
        F.sum(is_bad.cast("long")).alias("bad"),
    ).collect()[0]
    return CsvRead(
        clean, quarantine, int(counts["ok"] or 0), int(counts["bad"] or 0)
    )


def write_csv_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 8,
    compression: str | None = None,
) -> None:
    """Export a corpus as deterministic RFC 4180 CSV shards.

    Same shard convention as ``write_jsonl_shards`` (md5-bucket of the
    key mod ``n_shards``): re-exporting — in either format — yields the
    same doc→shard map, so resume offsets and split selections made
    against one export remain valid against the other.

    Scale: one shuffle on the uniform shard key; O(n_shards) output
    files (the small-files guard). The writer quotes only when needed
    and doubles embedded quotes, so any RFC 4180 reader (DuckDB,
    pandas, csv.reader) consumes the shards directly.
    """
    if "shard" in df.columns:
        # the select below would produce DUPLICATE 'shard' columns and
        # partitionBy would bind ambiguously (or fail) — refuse, same
        # contract as the salted helpers' '_salt' guard
        raise ValueError(
            "input already has a 'shard' column; rename it first"
        )
    writer = (
        df.select(shard_column(F.col(key_col), n_shards).alias("shard"), *df.columns)
        .repartition(n_shards, "shard")
        .write.partitionBy("shard")
        .option("header", True)
        .mode("overwrite")
    )
    for k, v in {**_DIALECT, **_WRITE_ONLY}.items():
        writer = writer.option(k, v)
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)
