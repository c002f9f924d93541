"""Streaming tail of a manifest table's commit feed — the
Delta-CDF-streaming-source analog for ``operators.table.ManifestTable``.

The write side of the manifest story commits atomically (merge sink,
batch merges, compaction); THIS module closes the read side: a
downstream consumer subscribes to the table and receives every
commit's row-level diff as it lands, instead of re-reading the table
on a schedule. Together they form the incremental loop a 100 TB
curation pipeline runs: batch/streaming merges land atomically, and
consumers tail O(delta) change feeds.

Built on machinery Spark already hardens, not a custom source:

- the SOURCE is the file stream source over ``<table>/_manifests`` —
  manifest JSONs are tiny, land via tmp-write + atomic rename (so a
  discovered file is always complete), dot-prefixed tmp files are
  invisible to the source, and the stream checkpoint guarantees each
  version is delivered exactly once in commit order (commits are
  serial under the single-writer lease);
- the DATA never flows through Python: ``foreachBatch`` receives only
  the tiny manifest rows, and computes each version's diff JVM-side
  through :meth:`ManifestTable.changes` (manifest-pruned scans, one
  shuffle, O(changed partitions));
- the FEED is idempotent: version ``v``'s diff lands at
  ``<feed>/v<v>`` via deterministic naming + overwrite, so the
  crash-between-write-and-checkpoint replay window re-emits the same
  bytes over itself. A feed directory is complete exactly when its
  ``_SUCCESS`` marker exists; :func:`read_changes_feed` selects only
  complete directories, so feed readers never observe a torn batch.

Version 1 (table creation) is emitted as the initial snapshot — every
row as an ``insert`` — matching what a consumer that starts from
nothing needs to bootstrap its own state.

Retention contract (the honest limit, same shape as Delta CDF's):
version ``v``'s diff needs manifests ``v-1`` and ``v`` retained. A
consumer lagging more than ``retain_versions`` commits behind finds
the older manifest GC'd and the stream FAILS with the explicit
"not retained" error naming what is still available — size
``retain_versions`` above the maximum expected consumer lag; data
is never silently skipped.

Reference parity: this is the consumer side of the effectively-once
sink contract (SURVEY §2.f ST1) — what the processed-bucket consumer
(camel-integration file-pipeline S4/S5 output) would tail instead of
re-listing the bucket.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scale import _hadoop_fs
from ..operators.table import ManifestTable

_FEED_DIR_RE = re.compile(r"^v(\d{8})$")


def start_table_changes_tail(
    spark: SparkSession,
    table_path: str,
    feed_dir: str,
    checkpoint: str,
    change_col: str = "_change_type",
    max_versions_per_trigger: int | None = None,
):
    """Start tailing ``table_path``'s commits into ``feed_dir``;
    returns the :class:`StreamingQuery`.

    Each discovered manifest version ``v`` becomes one feed directory
    ``<feed_dir>/v<v>`` holding the row-level diff of commit ``v``
    (``change_col`` ∈ ``insert``/``delete``; v1 = initial snapshot as
    inserts). ``max_versions_per_trigger`` paces how many commits one
    micro-batch may process (file-source ``maxFilesPerTrigger``)."""
    mt = ManifestTable(spark, table_path)
    reader = spark.readStream.schema("version int")
    if max_versions_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_versions_per_trigger)
    src = reader.json(f"{mt.path}/_manifests")

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        # the batch holds manifest METADATA rows only — tiny by
        # construction (one short row per commit), so this collect is
        # O(commits in batch), never data-sized
        versions = sorted(
            r.version for r in batch_df.select("version").collect()
        )
        for v in versions:
            if v == 1:
                diff = mt.read(version=1).withColumn(
                    change_col, F.lit("insert")
                )
            else:
                diff = mt.changes(v - 1, v, change_col=change_col)
            # deterministic name + overwrite = idempotent replay
            diff.write.mode("overwrite").parquet(f"{feed_dir}/v{v:08d}")

    return (
        src.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_changes_feed(
    spark: SparkSession,
    table_path: str,
    feed_dir: str,
    change_col: str = "_change_type",
) -> DataFrame:
    """Read every COMPLETE feed directory as one DataFrame with a
    ``_commit_version`` column. Only directories whose ``_SUCCESS``
    marker exists are scanned (an in-flight or crashed emit is
    invisible); the schema is the table's current one (older feed
    files missing later-added columns read as NULL — the add-only
    evolution contract), so the read is a single explicit-schema scan,
    O(retained feed) with no schema inference."""
    mt = ManifestTable(spark, table_path)
    schema = mt.schema().add(change_col, "string")
    fs, jdir = _hadoop_fs(spark, feed_dir)
    dirs = []
    if fs.exists(jdir):
        for status in fs.listStatus(jdir):
            name = status.getPath().getName()
            if not _FEED_DIR_RE.match(name):
                continue
            _, jsucc = _hadoop_fs(spark, f"{feed_dir}/{name}/_SUCCESS")
            if fs.exists(jsucc):
                dirs.append(f"{feed_dir}/{name}")
    if not dirs:
        return (
            spark.createDataFrame([], schema)
            .withColumn("_commit_version", F.lit(None).cast("int"))
        )
    return (
        spark.read.schema(schema)
        .parquet(*sorted(dirs))
        .withColumn(
            "_commit_version",
            F.regexp_extract(
                F.input_file_name(), r"/v(\d{8})/", 1
            ).cast("int"),
        )
    )
