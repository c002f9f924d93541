"""Round-14 feature and regression tests.

Pins the four r13 external-review advice items first:

- ``update_where`` refuses SET expressions that do not cast cleanly
  to the declared column type (ANSI UPDATE semantics — a plain cast
  would silently write NULLs);
- ``compact(lock_stale_after_seconds=)`` threads the lease TTL into
  the write lock (and the sink passes its own through);
- the streaming sink's auto-compaction is best-effort — a transient
  sweep failure after a committed merge must not kill the query;
- ``clone_to`` resolves a RELATIVE source table path through the
  Hadoop FileSystem (fs.makeQualified), not driver-local abspath.

Then the r14 features (file-granular DML etc.) in later classes.
"""
import os
import shutil
import time
import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.operators.table import (
    ConcurrentWriterError,
    ManifestTable,
    _is_abs_dir,
    _partition_key,
)


def _mk_table(spark, path, retain=5):
    """pt ∈ {a,b,c}; two delta merges into pt=a (accretes files)."""
    base = spark.createDataFrame(
        [(i, "abc"[i % 3], float(i)) for i in range(30)],
        "id int, pt string, v double",
    )
    mt = ManifestTable(spark, path)
    mt.create(base, ["pt"])
    for k in range(2):
        d = spark.createDataFrame(
            [(100 + k, "a", 1.0)], "id int, pt string, v double"
        )
        merge_into_partitioned(
            spark, path, d, ["id"], ["pt"], retain_versions=retain
        )
    return mt


def _state(mt):
    return sorted(tuple(r) for r in mt.read().collect())


class TestUpdateCastProbe:
    """update_where SET-expression cast soundness (r13 advice): a
    non-ANSI cast maps un-castable values to NULL; the statement must
    refuse instead, like Delta/ANSI UPDATE."""

    def test_uncastable_expression_refused_table_unchanged(
        self, spark, tmp_path
    ):
        mt = _mk_table(spark, str(tmp_path / "t"))
        before, ver = _state(mt), mt.current_version()
        with pytest.raises(ValueError, match="cast cleanly"):
            mt.update_where([("pt", "=", "a")], set={"v": "'oops'"})
        assert mt.current_version() == ver  # no version published
        assert _state(mt) == before

    def test_castable_string_expression_passes(self, spark, tmp_path):
        mt = _mk_table(spark, str(tmp_path / "t"))
        r = mt.update_where([("id", "=", 0)], set={"v": "'1.5'"})
        assert r["rows_updated"] == 1
        assert mt.read().filter("id = 0").collect()[0].v == 1.5

    def test_explicit_null_set_allowed(self, spark, tmp_path):
        # SET col = NULL is legitimate ANSI UPDATE — the probe only
        # fires when a NON-null expression casts to null
        mt = _mk_table(spark, str(tmp_path / "t"))
        r = mt.update_where([("id", "=", 3)], set={"v": "NULL"})
        assert r["rows_updated"] == 1
        assert mt.read().filter("id = 3").collect()[0].v is None

    def test_probe_scoped_to_matched_rows(self, spark, tmp_path):
        # an un-castable value reachable only through NON-matched
        # rows must not refuse the statement (hit & viol, not viol)
        mt = _mk_table(spark, str(tmp_path / "t"))
        # expression casts cleanly exactly on the matched row (id=0)
        r = mt.update_where(
            [("id", "=", 0)],
            set={"v": "CASE WHEN id = 0 THEN '2.5' ELSE 'oops' END"},
        )
        assert r["rows_updated"] == 1
        assert mt.read().filter("id = 0").collect()[0].v == 2.5

    def test_same_type_expression_skips_probe(self, spark, tmp_path):
        # identity-cast SET goes straight through (no probe job) —
        # asserted behaviorally: plain column arithmetic succeeds
        mt = _mk_table(spark, str(tmp_path / "t"))
        r = mt.update_where([("pt", "=", "b")], set={"v": "v + 1.0"})
        assert r["rows_updated"] == 10


class TestCompactLockStale:
    """compact() threads lock_stale_after_seconds into the write
    lease (r13 advice): a crashed holder's stale lock breaks instead
    of wedging the sweep forever."""

    def _stale_lock(self, mt):
        with open(f"{mt.path}/_lock", "w") as fh:
            fh.write('{"holder": "crashed", "token": "dead"}')
        past = time.time() - 3600
        os.utime(f"{mt.path}/_lock", (past, past))

    def test_default_stays_loud(self, spark, tmp_path):
        mt = _mk_table(spark, str(tmp_path / "t"))
        self._stale_lock(mt)
        with pytest.raises(ConcurrentWriterError):
            mt.compact()
        os.remove(f"{mt.path}/_lock")

    def test_ttl_breaks_stale_and_compacts(self, spark, tmp_path):
        mt = _mk_table(spark, str(tmp_path / "t"))
        before = _state(mt)
        self._stale_lock(mt)
        assert mt.compact(lock_stale_after_seconds=1.0) == 3
        assert _state(mt) == before

    def test_optimistic_publish_breaks_stale(self, spark, tmp_path):
        mt = _mk_table(spark, str(tmp_path / "t"))
        before = _state(mt)
        self._stale_lock(mt)
        assert mt.compact(
            optimistic=True, lock_stale_after_seconds=1.0
        ) == 3
        assert _state(mt) == before


class TestSinkBestEffortCompaction:
    """Auto-compaction in the CDC sink is best-effort (r13 advice):
    the batch's merge already committed, so a transient sweep failure
    logs and the stream lives; the sink's lease TTL threads through."""

    def _drive(self, spark, tmp_path, nbatches=3, **sink_kw):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "id long, pt int, ts long, v double, op string"
        for i in range(nbatches):
            rows = [
                (100 * i + j, j % 2, 100 * i, float(i), "U")
                for j in range(6)
            ]
            b = spark.createDataFrame(rows, schema)
            tmp = str(tmp_path / f"w{i}")
            b.coalesce(1).write.parquet(tmp)
            pf = [
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            ][0]
            os.rename(f"{tmp}/{pf}", f"{src}/{i:03d}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = str(tmp_path / "table")
        q = start_changelog_merge_sink(
            spark, stream, table, "id", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"), layout="manifest",
            retain_versions=10, **sink_kw,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return table

    def test_transient_sweep_failure_does_not_kill_stream(
        self, spark, tmp_path, monkeypatch
    ):
        calls = []

        def boom(self, **kw):
            calls.append(kw)
            raise RuntimeError("transient: lost lock race")

        monkeypatch.setattr(ManifestTable, "compact", boom)
        table = self._drive(
            spark, tmp_path, compact_min_files=2, compact_every=1,
        )
        # every armed sweep raised (batch 0 bootstraps the table and
        # returns before the sweep), yet every batch's merge committed
        assert len(calls) == 2
        assert ManifestTable.__dict__  # monkeypatch active sanity
        mt = ManifestTable(spark, table)
        assert mt.read().count() == 18

    def test_lock_ttl_threads_into_sweep(
        self, spark, tmp_path, monkeypatch
    ):
        seen = []
        real = ManifestTable.compact

        def spy(self, **kw):
            seen.append(kw.get("lock_stale_after_seconds"))
            return real(self, **kw)

        monkeypatch.setattr(ManifestTable, "compact", spy)
        self._drive(
            spark, tmp_path, compact_min_files=2, compact_every=1,
            lock_stale_after_seconds=123.0,
        )
        assert seen and all(v == 123.0 for v in seen)


class TestCloneRelativePath:
    """clone_to on a RELATIVE source path resolves through the Hadoop
    FileSystem (r13 advice) — borrowed entries become fully-qualified
    URIs valid on the cluster's default FS, not driver-local paths."""

    def test_relative_source_qualifies_and_reads(self, spark, tmp_path):
        rel = f"tmp_r14_clone_src_{_uuid.uuid4().hex[:8]}"
        try:
            mt = _mk_table(spark, rel)
            before = _state(mt)
            cl = mt.clone_to(str(tmp_path / "cl"))
            for e in cl.manifest()["entries"]:
                assert _is_abs_dir(e["dir"]), e["dir"]
                # fs.makeQualified on the local FS yields a scheme
                # URI — proof the path went through Hadoop, not
                # os.path.abspath
                assert e["dir"].startswith("file:"), e["dir"]
            assert _state(cl) == before
        finally:
            shutil.rmtree(rel, ignore_errors=True)
