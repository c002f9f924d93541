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

- the SOURCE is the file stream source over the table's manifest
  directory — manifest JSONs are tiny, land via tmp-write + atomic
  rename (so a discovered file is always complete), dot-prefixed tmp
  files are invisible to the source, and the stream checkpoint
  guarantees each version is delivered exactly once in commit order
  (commits are serial under the single-writer lease);
- the DATA never flows through Python: ``foreachBatch`` receives only
  the tiny manifest rows, and computes each version's diff JVM-side
  through :meth:`ManifestTable.changes` (manifest-pruned scans, one
  shuffle, O(changed partitions));
- the FEED is idempotent AND published versions never flicker: a
  version whose feed directory is already committed is SKIPPED on
  replay (the diff is deterministic given the manifests, so there is
  nothing to re-say); an uncommitted emit stages into a dot-prefixed
  tmp directory, writes the module's own ``_FEED_COMMITTED`` marker
  (deliberately not Spark's ``_SUCCESS``, whose emission is committer
  config-dependent), and renames into place. A feed directory is
  complete exactly when the marker exists; :func:`read_changes_feed`
  selects only complete directories, so feed readers never observe a
  torn batch or a transiently-deleted version.

Bootstrap semantics: the FIRST version a fresh consumer can discover
is emitted as an initial snapshot — every row of that version as an
``insert`` — whether that is v1 of a new table or the oldest retained
version of a pre-existing one (what a consumer starting from nothing
needs to build its own state). A consumer that HAS prior feed state
always diffs forward from it.

Retention contract (the honest limit, same shape as Delta CDF's):
version ``v``'s diff needs manifests ``v-1`` and ``v`` retained. A
consumer that previously emitted ``v-1`` but returns after the
manifest was GC'd finds the gap unreconstructable and the stream
FAILS with the explicit "not retained" error — size
``retain_versions`` above the maximum expected consumer lag; data is
never silently skipped. (At the exact retention boundary a WRITER's
concurrent GC can also surface as a FileNotFoundException from the
data scan rather than the explicit message — loud either way.)

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
from ..operators.table import _MANIFEST_DIR, ManifestTable, _write_small_file

_FEED_DIR_RE = re.compile(r"^v(\d{8})$")
_FEED_MARKER = "_FEED_COMMITTED"


def _feed_committed(spark: SparkSession, feed_dir: str, version: int) -> bool:
    fs, jmark = _hadoop_fs(
        spark, f"{feed_dir}/v{version:08d}/{_FEED_MARKER}"
    )
    return fs.exists(jmark)


def _reject_column_collisions(schema_names: list[str], change_col: str) -> None:
    for reserved in (change_col, "_commit_version"):
        if reserved in schema_names:
            raise ValueError(
                f"table column {reserved!r} collides with a feed "
                "column; pass a different change_col or rename the "
                "table column"
            )


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
    (``change_col`` ∈ ``insert``/``delete``; the first discoverable
    version = initial snapshot as inserts). ``max_versions_per_
    trigger`` paces how many commits one micro-batch may process
    (file-source ``maxFilesPerTrigger``)."""
    mt = ManifestTable(spark, table_path)
    _reject_column_collisions(
        [f.name for f in mt.schema().fields], change_col
    )
    reader = spark.readStream.schema("version int")
    if max_versions_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_versions_per_trigger)
    src = reader.json(f"{mt.path}/{_MANIFEST_DIR}")

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        # the batch holds manifest METADATA rows only — tiny by
        # construction (one short row per commit), so this collect is
        # O(commits in batch), never data-sized. A stray non-manifest
        # file in the directory parses to version NULL — ignore it
        # rather than dying on an unorderable None.
        versions = sorted(
            r.version
            for r in batch_df.select("version").collect()
            if r.version is not None
        )
        emitted_prev: set[int] = set()
        for v in versions:
            if _feed_committed(spark, feed_dir, v):
                emitted_prev.add(v)  # replay of a published version:
                continue  # nothing to re-say, and readers never flicker
            have_prev = (
                v - 1 in emitted_prev
                or _feed_committed(spark, feed_dir, v - 1)
            )
            if v > 1 and not have_prev and v - 1 not in set(mt.versions()):
                # fresh consumer on a pre-existing table: the oldest
                # discoverable version bootstraps as a full snapshot
                diff = mt.read(version=v).withColumn(
                    change_col, F.lit("insert")
                )
            elif v == 1:
                diff = mt.read(version=1).withColumn(
                    change_col, F.lit("insert")
                )
            else:
                # raises the explicit retention error if v-1's
                # manifest is gone but the consumer HAS prior state
                diff = mt.changes(v - 1, v, change_col=change_col)
            final = f"{feed_dir}/v{v:08d}"
            tmp = f"{feed_dir}/.v{v:08d}.tmp"
            diff.write.mode("overwrite").parquet(tmp)
            _write_small_file(spark, f"{tmp}/{_FEED_MARKER}", f"v{v:08d}")
            fs, jfinal = _hadoop_fs(spark, final)
            _, jtmp = _hadoop_fs(spark, tmp)
            fs.delete(jfinal, True)  # clears a crashed partial husk
            # (no marker → invisible to readers); committed dirs were
            # skipped above, so a published version never vanishes
            if not fs.rename(jtmp, jfinal):
                raise IOError(f"could not publish feed dir {final}")
            emitted_prev.add(v)

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
    ``_commit_version`` column. Only directories whose
    ``_FEED_COMMITTED`` marker exists are scanned (an in-flight or
    crashed emit is invisible); the schema is the table's current one
    (older feed files missing later-added columns read as NULL — the
    add-only evolution contract), so the read is a single
    explicit-schema scan, O(retained feed) with no schema inference."""
    mt = ManifestTable(spark, table_path)
    schema_names = [f.name for f in mt.schema().fields]
    _reject_column_collisions(schema_names, change_col)
    schema = mt.schema().add(change_col, "string")
    fs, jdir = _hadoop_fs(spark, feed_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    dirs = []
    if fs.exists(jdir):
        for status in fs.listStatus(jdir):
            name = status.getPath().getName()
            if not _FEED_DIR_RE.match(name):
                continue
            # reuse the listed path + fs: one RPC per dir, not three
            if fs.exists(jvm_path(status.getPath(), _FEED_MARKER)):
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
            # anchored to the parquet file's PARENT dir — a
            # /vNNNNNNNN/ segment in feed_dir itself cannot match
            F.regexp_extract(
                F.input_file_name(), r"/v(\d{8})/[^/]+$", 1
            ).cast("int"),
        )
    )
