"""Round-9 tests: atomic manifest-committed merge, the single-writer
lease, and the r9 external-review regressions (ordered-merge column
collisions, all-NULL-ts contested keys, NaN partition deletes, CSV
shard-column collision)."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.operators.table import (
    ConcurrentWriterError,
    ManifestTable,
    force_unlock,
    is_manifest_table,
    read_table,
    table_write_lock,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3"), (4, "c", "x4")],
        "id int, pt string, v string",
    )


def _upd(spark):
    """update id=1, delete id=3 (empties pt=b), insert id=9 into pt=c."""
    return spark.createDataFrame(
        [(1, "a", "X1", "U"), (3, "b", "x3", "D"), (9, "c", "x9", "U")],
        "id int, pt string, v string, op string",
    )


_EXPECTED = [(1, "a", "X1"), (2, "a", "x2"), (4, "c", "x4"), (9, "c", "x9")]


class TestManifestTable:
    def test_create_read_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        assert mt.create(_base(spark), ["pt"]) == 3
        assert is_manifest_table(spark, path)
        assert mt.current_version() == 1
        got = sorted(tuple(r) for r in read_table(spark, path).collect())
        assert got == [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3"), (4, "c", "x4")]

    def test_merge_routes_through_manifest_and_matches_plain(
        self, spark, tmp_path
    ):
        mpath, ppath = str(tmp_path / "m"), str(tmp_path / "p")
        ManifestTable(spark, mpath).create(_base(spark), ["pt"])
        _base(spark).write.partitionBy("pt").parquet(ppath)
        for path in (mpath, ppath):
            assert (
                merge_into_partitioned(
                    spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
                )
                == 3
            )
        # compare by NAME: the Hive layout appends partition columns
        # last, the manifest layout keeps the creation order
        m = sorted((r.id, r.pt, r.v) for r in read_table(spark, mpath).collect())
        p = sorted((r.id, r.pt, r.v) for r in read_table(spark, ppath).collect())
        assert m == p == _EXPECTED

    def test_emptied_partition_leaves_manifest_not_a_dir_race(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        man = mt.manifest()
        assert all(e["values"] != [["str", "b"]] for e in man["entries"])
        assert read_table(spark, path).filter(F.col("pt") == "b").count() == 0

    def test_time_travel_and_gc_retention(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        # v1 still retained (retain_versions=2): full old snapshot
        v1 = sorted(tuple(r) for r in mt.read(version=1).collect())
        assert v1 == [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3"), (4, "c", "x4")]
        upd2 = spark.createDataFrame(
            [(2, "a", "Z2", "U")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd2, ["id"], ["pt"], op_col="op"
        )
        assert mt.versions() == [2, 3]
        with pytest.raises(ValueError, match="not retained"):
            mt.read(version=1)

    def test_full_tombstone_then_reinsert(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        dele = spark.createDataFrame(
            [(i, p, "_", "D") for i, p in [(1, "a"), (2, "a"), (3, "b"), (4, "c")]],
            "id int, pt string, v string, op string",
        )
        merge_into_partitioned(spark, path, dele, ["id"], ["pt"], op_col="op")
        # empty table stays READABLE (schema from the manifest) — the
        # plain layout's UNABLE_TO_INFER_SCHEMA wedge cannot occur
        assert read_table(spark, path).count() == 0
        assert mt.manifest()["entries"] == []
        ins = spark.createDataFrame([(7, "z", "n7")], "id int, pt string, v string")
        assert merge_into_partitioned(spark, path, ins, ["id"], ["pt"]) == 1
        assert [tuple(r) for r in read_table(spark, path).collect()] == [
            (7, "z", "n7")
        ]

    def test_create_refuses_existing_table(self, spark, tmp_path):
        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(_base(spark), ["pt"])
        with pytest.raises(ValueError, match="already exists"):
            ManifestTable(spark, path).create(_base(spark), ["pt"])


class TestIncrementalChanges:
    """ManifestTable.changes(): the CDF-style version-diff read."""

    def _merged(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        return mt

    def test_update_delete_insert_diff(self, spark, tmp_path):
        mt = self._merged(spark, tmp_path)
        got = sorted(
            (r.id, r.pt, r.v, r._change_type)
            for r in mt.changes(1, 2).collect()
        )
        # update id=1 = delete old + insert new; delete id=3 (empties
        # pt=b entirely — entry-removed partition still diffs); insert
        # id=9; unchanged rows (2,a) and (4,c) never appear
        assert got == [
            (1, "a", "X1", "insert"),
            (1, "a", "x1", "delete"),
            (3, "b", "x3", "delete"),
            (9, "c", "x9", "insert"),
        ]

    def test_untouched_partitions_never_scanned(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        upd = spark.createDataFrame(
            [(1, "a", "X1", "U")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(spark, path, upd, ["id"], ["pt"], op_col="op")
        diff = mt.changes(1, 2)
        files = diff.inputFiles()
        assert files, "diff over a real change must scan something"
        assert all("_p_pt=a" in f for f in files), files
        assert sorted(
            (r.id, r.v, r._change_type) for r in diff.collect()
        ) == [(1, "X1", "insert"), (1, "x1", "delete")]

    def test_compaction_diff_is_empty(self, spark, tmp_path):
        mt = self._merged(spark, tmp_path)
        mt.compact(retain_versions=3)
        assert mt.versions() == [1, 2, 3]
        assert mt.changes(2, 3).count() == 0
        # while the data diff across the merge itself is still visible
        assert mt.changes(1, 3).count() == 4

    def test_schema_evolution_null_backfill(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        evolved = spark.createDataFrame(
            [(1, "a", "X1", 10), (2, "a", "x2", 20)],
            "id int, pt string, v string, extra int",
        )
        mt.overwrite_partitions(evolved, [("a",)])
        got = sorted(
            (
                (r.id, r.v, r.extra, r._change_type)
                for r in mt.changes(1, 2).collect()
            ),
            key=lambda t: (t[0], t[1], t[2] is not None, t[2] or 0, t[3]),
        )
        # old rows carry extra=NULL (add-only evolution): the rewritten
        # id=2 row differs from its old self only via the new column
        assert got == [
            (1, "X1", 10, "insert"),
            (1, "x1", None, "delete"),
            (2, "x2", None, "delete"),
            (2, "x2", 20, "insert"),
        ]

    def test_dropped_column_raises(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        narrowed = spark.createDataFrame([(1, "a")], "id int, pt string")
        mt.overwrite_partitions(narrowed, [("a",)])
        with pytest.raises(ValueError, match="cannot be expressed"):
            mt.changes(1, 2)

    def test_retyped_column_raises(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        retyped = spark.createDataFrame(
            [(1, "a", 7)], "id int, pt string, v int"  # v was string
        )
        mt.overwrite_partitions(retyped, [("a",)])
        with pytest.raises(ValueError, match="changed type"):
            mt.changes(1, 2)

    def test_duplicate_rows_multiset_semantics(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        # v1 holds the same row twice plus one singleton
        mt.create(
            spark.createDataFrame(
                [(1, "a", "x"), (1, "a", "x"), (2, "a", "y")],
                "id int, pt string, v string",
            ),
            ["pt"],
        )
        # v2: the duplicate row now appears 3x, the singleton is gone
        mt.overwrite_partitions(
            spark.createDataFrame(
                [(1, "a", "x")] * 3, "id int, pt string, v string"
            ),
            [("a",)],
        )
        got = sorted(
            (r.id, r.v, r._change_type) for r in mt.changes(1, 2).collect()
        )
        # net +1 copy of (1,a,x) and -1 copy of (2,a,y)
        assert got == [(1, "x", "insert"), (2, "y", "delete")]

    def test_guards(self, spark, tmp_path):
        mt = self._merged(spark, tmp_path)
        with pytest.raises(ValueError, match="collides"):
            mt.changes(1, 2, change_col="v")
        with pytest.raises(ValueError, match="newer than"):
            mt.changes(2, 1)
        upd2 = mt.spark.createDataFrame(
            [(2, "a", "Z2", "U")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(
            mt.spark, mt.path, upd2, ["id"], ["pt"], op_col="op"
        )
        with pytest.raises(ValueError, match="not retained"):
            mt.changes(1)  # v1 fell out of the retain window


class TestTableChangesTail:
    """Streaming commit-feed tail (streaming/table_tail.py)."""

    def _run_tail(self, spark, tmp_path, ckpt="ckpt"):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / ckpt)
        )
        try:
            q.processAllAvailable()  # v1 initial snapshot
            merge_into_partitioned(
                spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
            )
            q.processAllAvailable()  # v2 diff
        finally:
            q.stop()
        return path

    def _feed_rows(self, spark, tmp_path, path):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
        )

        feed = read_changes_feed(spark, path, str(tmp_path / "feed"))
        return sorted(
            (r._commit_version, r.id, r.pt, r.v, r._change_type)
            for r in feed.collect()
        )

    _EXPECTED_FEED = [
        (1, 1, "a", "x1", "insert"),
        (1, 2, "a", "x2", "insert"),
        (1, 3, "b", "x3", "insert"),
        (1, 4, "c", "x4", "insert"),
        (2, 1, "a", "X1", "insert"),
        (2, 1, "a", "x1", "delete"),
        (2, 3, "b", "x3", "delete"),
        (2, 9, "c", "x9", "insert"),
    ]

    def test_snapshot_then_diff(self, spark, tmp_path):
        path = self._run_tail(spark, tmp_path)
        assert self._feed_rows(spark, tmp_path, path) == self._EXPECTED_FEED

    def test_replay_is_idempotent(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            start_table_changes_tail,
        )

        path = self._run_tail(spark, tmp_path)
        # a second tail with a FRESH checkpoint re-discovers every
        # manifest and overwrites the same deterministic dirs — the
        # crash-replay window, deliberately maximized
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / "ckpt2")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert self._feed_rows(spark, tmp_path, path) == self._EXPECTED_FEED

    def test_incomplete_dir_invisible(self, spark, tmp_path):
        path = self._run_tail(spark, tmp_path)
        # simulate a crashed emit: rows present, no _SUCCESS
        junk = tmp_path / "feed" / "v00000099"
        junk.mkdir()
        import shutil

        src = next((tmp_path / "feed" / "v00000001").glob("part-*.parquet"))
        shutil.copy(src, junk / src.name)
        assert self._feed_rows(spark, tmp_path, path) == self._EXPECTED_FEED

    def test_lagging_consumer_fails_loudly(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        feed, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
        q = start_table_changes_tail(spark, path, feed, ckpt)
        try:
            q.processAllAvailable()  # consumer has state up to v1
        finally:
            q.stop()
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        upd2 = spark.createDataFrame(
            [(2, "a", "Z2", "U")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(spark, path, upd2, ["id"], ["pt"], op_col="op")
        # retain_versions=2 → v1's manifest is gone; this consumer HAS
        # prior state (v1 emitted), so the v1→v2 gap cannot be
        # reconstructed and the stream must fail with the explicit
        # retention error, never skip data silently
        q = start_table_changes_tail(spark, path, feed, ckpt)
        try:
            with pytest.raises(Exception, match="not retained"):
                q.processAllAvailable()
        finally:
            q.stop()

    def test_fresh_consumer_bootstraps_from_oldest_retained(
        self, spark, tmp_path
    ):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        upd2 = spark.createDataFrame(
            [(2, "a", "Z2", "U")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(spark, path, upd2, ["id"], ["pt"], op_col="op")
        assert mt.versions() == [2, 3]
        # a consumer with NO prior state on a pre-existing table:
        # oldest retained version (v2) = initial snapshot, then diffs
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        feed = read_changes_feed(spark, path, str(tmp_path / "feed"))
        got = sorted(
            (r._commit_version, r.id, r.v, r._change_type)
            for r in feed.collect()
        )
        assert got == [
            (2, 1, "X1", "insert"),  # v2 state as the snapshot
            (2, 2, "x2", "insert"),
            (2, 4, "x4", "insert"),
            (2, 9, "x9", "insert"),
            (3, 2, "Z2", "insert"),  # then the v3 diff
            (3, 2, "x2", "delete"),
        ]

    def test_change_col_collision_raises(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(_base(spark), ["pt"])
        with pytest.raises(ValueError, match="collides"):
            start_table_changes_tail(
                spark, path, str(tmp_path / "f"), str(tmp_path / "c"),
                change_col="v",
            )

    def test_merge_retain_versions_widens_the_tail_window(
        self, spark, tmp_path
    ):
        """retain_versions plumbs through merge_into_partitioned, so a
        slow consumer's window is a merge-side knob: 3 commits with
        retain_versions=5 keep every version, and a tail started
        AFTERWARDS replays the full history instead of dying on the
        default window's retention error."""
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op",
            retain_versions=5,
        )
        upd2 = spark.createDataFrame(
            [(2, "a", "Z2", "U")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd2, ["id"], ["pt"], op_col="op",
            retain_versions=5,
        )
        assert mt.versions() == [1, 2, 3]  # nothing GC'd
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        feed = read_changes_feed(spark, path, str(tmp_path / "feed"))
        by_version = {
            r["_commit_version"]: r["n"]
            for r in feed.groupBy("_commit_version")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # v1 snapshot (4 rows) + v2 diff (4) + v3 diff (2)
        assert by_version == {1: 4, 2: 4, 3: 2}


class TestAtomicCommit:
    """Crash injection: a reader must see old-or-new, never mixed."""

    def test_crash_before_publish_leaves_old_version(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])

        def boom(self, version, man):
            raise RuntimeError("injected crash before publish")

        monkeypatch.setattr(ManifestTable, "_publish", boom)
        with pytest.raises(RuntimeError, match="injected"):
            merge_into_partitioned(
                spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
            )
        monkeypatch.undo()
        # reader: the WHOLE old version, nothing mixed in — the plain
        # layout's partition-granular tear cannot happen here
        got = sorted(tuple(r) for r in read_table(spark, path).collect())
        assert got == [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3"), (4, "c", "x4")]
        assert ManifestTable(spark, path).current_version() == 1
        # the crashed writer released its lease (context manager exit),
        # so the retry needs no manual unlock and fully lands
        assert (
            merge_into_partitioned(
                spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
            )
            == 3
        )
        got = sorted((r.id, r.pt, r.v) for r in read_table(spark, path).collect())
        assert got == _EXPECTED

    def test_crash_inside_pointer_swap_recovers_to_new(self, spark, tmp_path):
        """Between pointer delete and rename the pointer is absent; the
        highest-manifest fallback must resolve to the NEW version (its
        manifest was fully renamed into place before the pointer
        moved)."""
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        os.remove(f"{path}/_latest")  # simulate dying mid-swap
        mt2 = ManifestTable(spark, path)
        assert mt2.current_version() == 2
        got = sorted(tuple(r) for r in read_table(spark, path).collect())
        assert got == _EXPECTED

    def test_stale_reader_of_retained_version_survives_one_commit(
        self, spark, tmp_path
    ):
        """Snapshot isolation inside the retain window: a reader that
        resolved version N keeps working through the N+1 commit (GC
        only deletes generations no retained manifest references)."""
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        old = mt.read(version=1)  # plan resolved against v1
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        got = sorted(tuple(r) for r in old.collect())  # evaluated AFTER commit
        assert got == [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3"), (4, "c", "x4")]


class TestSingleWriterLease:
    def test_concurrent_merge_fails_loudly(self, spark, tmp_path):
        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(_base(spark), ["pt"])
        with table_write_lock(spark, path, holder="maintenance"):
            with pytest.raises(ConcurrentWriterError, match="maintenance"):
                merge_into_partitioned(
                    spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
                )
        # lease released: the same merge now lands
        assert (
            merge_into_partitioned(
                spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
            )
            == 3
        )

    def test_plain_mode_merge_also_locked(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark).write.partitionBy("pt").parquet(path)
        with table_write_lock(spark, path, holder="compaction"):
            with pytest.raises(ConcurrentWriterError, match="compaction"):
                merge_into_partitioned(
                    spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
                )

    def test_optimistic_version_check(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )  # table is now v2
        with pytest.raises(ConcurrentWriterError, match="moved"):
            mt.overwrite_partitions(
                _base(spark).limit(1), [("a",)], expected_version=1
            )

    def test_stale_lock_ttl_break_and_token_safety(self, spark, tmp_path):
        path = str(tmp_path / "t")
        os.makedirs(path)
        lock = f"{path}/_lock"
        with open(lock, "w") as f:
            json.dump({"holder": "dead-writer", "token": "aaa"}, f)
        old = 1_000_000_000  # 2001 — far beyond any TTL
        os.utime(lock, (old, old))
        # default: no TTL → loud failure
        with pytest.raises(ConcurrentWriterError, match="dead-writer"):
            with table_write_lock(spark, path):
                pass
        # TTL opt-in: the stale lease is broken and the new holder's
        # release removes ONLY its own token'd lock
        with table_write_lock(spark, path, stale_after_seconds=60.0):
            assert json.load(open(lock))["token"] != "aaa"
        assert not os.path.exists(lock)

    def test_release_does_not_delete_foreign_lock(self, spark, tmp_path):
        path = str(tmp_path / "t")
        ctx = table_write_lock(spark, path, holder="A")
        ctx.__enter__()
        lock = f"{path}/_lock"
        # another writer TTL-breaks A's lease and takes its own
        os.remove(lock)
        with open(lock, "w") as f:
            json.dump({"holder": "B", "token": "bbb"}, f)
        ctx.__exit__(None, None, None)
        assert json.load(open(lock))["holder"] == "B"  # B's lease intact
        assert force_unlock(spark, path)

    def test_force_unlock_absent_returns_false(self, spark, tmp_path):
        assert force_unlock(spark, str(tmp_path / "nope")) is False


class TestOrderedMergeR9Regressions:
    def test_op_col_collision_with_stored_column_raises(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a", "keep-me", 10)], "id int, pt string, op string, ts int"
        ).write.partitionBy("pt").parquet(path)
        upd = spark.createDataFrame(
            [(1, "a", "U", 20)], "id int, pt string, op string, ts int"
        )
        with pytest.raises(ValueError, match="reserves column"):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"],
                op_col="op", ts_col="ts",
            )
        # the stored column survived untouched
        assert spark.read.parquet(path).collect()[0]["op"] == "keep-me"

    def test_mrg_src_in_delta_raises(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a", "x", 10)], "id int, pt string, v string, ts int"
        ).write.partitionBy("pt").parquet(path)
        upd = spark.createDataFrame(
            [(1, "a", "y", 20, "U", 0)],
            "id int, pt string, v string, ts int, o string, _mrg_src int",
        )
        with pytest.raises(ValueError, match="_mrg_src"):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="o", ts_col="ts"
            )

    def test_all_null_ts_contested_key_keeps_current_row(self, spark, tmp_path):
        """NULL-ts current + only NULL-ts updates = all-malformed pool:
        the key must SURVIVE with its current row, not silently vanish
        (r9 external review)."""
        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a", "cur", None), (2, "a", "cur2", 5)],
            "id int, pt string, v string, ts int",
        ).write.partitionBy("pt").parquet(path)
        upd = spark.createDataFrame(
            [(1, "a", "upd", None, "U"), (2, "a", "upd2", None, "D")],
            "id int, pt string, v string, ts int, op string",
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op", ts_col="ts"
        )
        got = {r.id: r.v for r in spark.read.parquet(path).collect()}
        # id=1: all-NULL pool → current survives; id=2: current has a
        # valid ts, the NULL-ts delete is malformed → current wins
        assert got == {1: "cur", 2: "cur2"}

    def test_null_ts_current_still_loses_to_valid_update(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a", "cur", None)], "id int, pt string, v string, ts int"
        ).write.partitionBy("pt").parquet(path)
        upd = spark.createDataFrame(
            [(1, "a", "new", 1, "U")],
            "id int, pt string, v string, ts int, op string",
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op", ts_col="ts"
        )
        assert [r.v for r in spark.read.parquet(path).collect()] == ["new"]


def test_nan_partition_empty_delete(spark, tmp_path):
    """A merge that empties a NaN-keyed float partition must delete its
    directory (plain mode) — NaN != NaN would otherwise skip the
    delete and resurrect the tombstoned rows (r9 external review)."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, float("nan"), "x"), (2, 1.5, "y")], "id int, pk double, v string"
    ).write.partitionBy("pk").parquet(path)
    dele = spark.createDataFrame(
        [(1, float("nan"), "x", "D")], "id int, pk double, v string, op string"
    )
    merge_into_partitioned(spark, path, dele, ["id"], ["pk"], op_col="op")
    left = spark.read.parquet(path).collect()
    assert [(r.id, r.v) for r in left] == [(2, "y")]
    assert not any(
        "NaN" in d for d in os.listdir(path)
    ), os.listdir(path)


def test_partition_value_matches_nan():
    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        _partition_value_matches,
    )

    assert _partition_value_matches(float("nan"), "NaN")
    assert not _partition_value_matches(float("nan"), "1.5")
    assert not _partition_value_matches(1.5, "NaN")
    assert _partition_value_matches(1.5, "1.5")


def test_write_csv_shards_rejects_shard_column(spark, tmp_path):
    from fbg_kafka_stream_file_transfer_spark.sources.csv import (
        write_csv_shards,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id int, shard string")
    with pytest.raises(ValueError, match="shard"):
        write_csv_shards(df, str(tmp_path / "out"), "doc_id")


def test_manifest_partition_value_types_roundtrip(spark, tmp_path):
    """int / date / NULL / float-NaN partition values survive the
    manifest encode→match→read cycle with exact types (no
    directory-name inference in the manifest layout)."""
    import datetime

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, 7, datetime.date(2024, 1, 2), "a"),
            (2, None, datetime.date(2024, 1, 3), "b"),
        ],
        "id int, num int, d date, v string",
    )
    mt = ManifestTable(spark, path)
    assert mt.create(df, ["num", "d"]) == 2
    got = sorted((r.id, r.num, r.d, r.v) for r in mt.read().collect())
    assert got == [
        (1, 7, datetime.date(2024, 1, 2), "a"),
        (2, None, datetime.date(2024, 1, 3), "b"),
    ]
    # manifest-level pruning reads only the named partition
    pruned = mt.read(partitions=[(7, datetime.date(2024, 1, 2))])
    assert [r.id for r in pruned.collect()] == [1]


class TestBackendDispatch:
    """The injectable-codec seam (VERDICT r8 #4): a supplied real
    backend must actually be routed to, with the documented fallback
    ordering real-parser → injected backend → labeled fake."""

    JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"\x00" * 64

    class _PilLike:
        """Minimal PIL-like module: open(file_obj) → image object."""

        def __init__(self):
            self.calls = []

        def open(self, fobj):
            data = fobj.read()
            self.calls.append(data)
            if not data.startswith(b"\xff\xd8"):
                raise ValueError("not a jpeg")

            class Img:
                width, height, format = 640, 480, "JPEG"

            return Img()

    def test_injected_backend_handles_jpeg_magic(self):
        from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
            backend_image_decode,
            pil_image_backend,
        )

        pil = self._PilLike()
        decode = backend_image_decode(pil_image_backend(pil))
        meta = decode(self.JPEG_MAGIC)
        assert meta == {
            "width": 640, "height": 480, "n_pixels": 640 * 480,
            "format": "jpeg",
        }
        assert len(pil.calls) == 1  # dispatch actually reached PIL

    def test_real_parser_wins_before_backend(self):
        from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
            backend_image_decode,
            pil_image_backend,
        )

        pil = self._PilLike()
        decode = backend_image_decode(pil_image_backend(pil))
        ppm = b"P6\n4 3\n255\n" + b"\x00" * 36
        meta = decode(ppm)
        assert (meta["width"], meta["height"], meta["format"]) == (4, 3, "ppm")
        assert pil.calls == []  # header parser answered; backend never hit

    def test_backend_failure_falls_through_to_labeled_fake(self):
        from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
            backend_image_decode,
            pil_image_backend,
        )

        pil = self._PilLike()
        decode = backend_image_decode(pil_image_backend(pil))
        meta = decode(b"\x89PNG not really decodable")
        assert meta["format"] == "fake"  # honest labeled fallback
        assert len(pil.calls) == 1  # the backend WAS tried first

    def test_no_backend_equals_default_chain(self):
        from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
            backend_image_decode,
            real_image_decode,
        )

        blob = b"\x00garbage"
        assert backend_image_decode(None)(blob) == real_image_decode(blob)

    def test_audio_backend_dispatch(self):
        from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
            backend_audio_decode,
        )

        seen = []

        def ffmpeg_like(content):
            seen.append(content)
            if content.startswith(b"ID3"):
                return {
                    "duration_seconds": 12.5, "sample_rate": 44100,
                    "channels": 2, "rms_level": 0.25,
                }
            return None

        decode = backend_audio_decode(ffmpeg_like)
        mp3 = b"ID3\x04" + b"\x00" * 32
        assert decode(mp3)["sample_rate"] == 44100
        # undecodable by the backend → labeled fake (16 kHz marker)
        other = b"\x01junk"
        assert decode(other)["sample_rate"] == 16000
        assert seen == [mp3, other]

    def test_decode_images_routes_injected_backend_through_arrow(
        self, spark
    ):
        """End-to-end through the mapInPandas plumbing: the injected
        backend's metadata must land in the DataFrame columns."""
        from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
            backend_image_decode,
            decode_images,
        )

        def backend(content):
            return {
                "width": 111, "height": 222, "n_pixels": 111 * 222,
                "format": "jpeg",
            }

        df = spark.createDataFrame(
            [(1, bytearray(self.JPEG_MAGIC))], "id int, content binary"
        )
        out = decode_images(
            df, decoder=backend_image_decode(backend)
        ).collect()[0]
        assert (out.img_width, out.img_height, out.img_format) == (
            111, 222, "jpeg",
        )

    def test_injected_docling_client_is_dispatched(self, spark):
        """A supplied Docling-like client must be the one the extract
        operator calls (reference S8's HTTP extractor slots into the
        same seam as the stub)."""
        from fbg_kafka_stream_file_transfer_spark.operators.extract import (
            extract_documents,
        )

        def fake_docling(content: bytes) -> dict:
            return {
                "status": "SUCCESS",
                "text": f"docling:{len(content)}",
                "page_count": 7,
                "n_tables": 0,
                "texts": [],
                "tables": [],
                "error": None,
            }

        df = spark.createDataFrame(
            [("f1", bytearray(b"pdfbytes"))], "name string, content binary"
        )
        row = extract_documents(df, extractor=fake_docling).collect()[0]
        assert row.extract_text == "docling:8"
        assert row.extract_page_count == 7


class TestR9ReviewRegressions:
    """Second review pass over the round's new code (r8 lesson: new
    operator families get two passes)."""

    def test_sink_on_manifest_table_merges_not_destroys(
        self, spark, tmp_path
    ):
        """r9 review #1: the sink's bootstrap probe used to misread a
        manifest table (all-underscore entries) as 'absent' and WIPE it
        during the debris-clear. It must be recognized as a live table
        and merged into — atomically."""
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        table = str(tmp_path / "table")
        base = spark.createDataFrame(
            [(1, 0, 100, "old1"), (2, 1, 100, "old2")],
            "id long, pt int, ts long, props string",
        )
        mt = ManifestTable(spark, table)
        mt.create(base, ["pt"])

        src = str(tmp_path / "src")
        os.makedirs(src)
        batch = spark.createDataFrame(
            [(1, 0, 200, "new1", "U"), (3, 1, 200, "new3", "U")],
            "id long, pt int, ts long, props string, op string",
        )
        batch.coalesce(1).write.parquet(str(tmp_path / "w"))
        pf = [
            f for f in os.listdir(str(tmp_path / "w")) if f.endswith(".parquet")
        ][0]
        os.rename(f"{tmp_path}/w/{pf}", f"{src}/000.parquet")
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_changelog_merge_sink(
            spark, stream, table, "id", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert is_manifest_table(spark, table)  # layout survived
        got = {r["id"]: r["props"] for r in read_table(spark, table).collect()}
        assert got == {1: "new1", 2: "old2", 3: "new3"}
        assert ManifestTable(spark, table).current_version() == 2

    @pytest.mark.parametrize("layout", ["plain", "manifest"])
    def test_empty_string_partition_value_rejected(
        self, spark, tmp_path, layout
    ):
        """r9 review #2: '' and NULL share __HIVE_DEFAULT_PARTITION__
        on disk — an empty-string partition value must be refused, not
        silently conflated/lost."""
        path = str(tmp_path / "t")
        if layout == "plain":
            _base(spark).write.partitionBy("pt").parquet(path)
        else:
            ManifestTable(spark, path).create(_base(spark), ["pt"])
        upd = spark.createDataFrame(
            [(9, "", "x", "U")], "id int, pt string, v string, op string"
        )
        with pytest.raises(ValueError, match="empty-string"):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op"
            )

    def test_create_rejects_empty_string_partition(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "", "x")], "id int, pt string, v string")
        with pytest.raises(ValueError, match="empty-string"):
            ManifestTable(spark, str(tmp_path / "t")).create(df, ["pt"])

    def test_plain_full_tombstone_still_removes_root_and_lock(
        self, spark, tmp_path
    ):
        """r9 review #4: the last-partition cleanup must not delete the
        HELD lock mid-merge; the empty root (and the lease file with
        it) goes after release. Net observable: root absent after the
        call returns, and a follow-up bootstrap works."""
        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a", "x")], "id int, pt string, v string"
        ).write.partitionBy("pt").parquet(path)
        dele = spark.createDataFrame(
            [(1, "a", "x", "D")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(spark, path, dele, ["id"], ["pt"], op_col="op")
        assert not os.path.exists(path)
        # absent root: a fresh merge raises does-not-exist, as before
        ins = spark.createDataFrame([(2, "b", "y")], "id int, pt string, v string")
        with pytest.raises(ValueError, match="does not exist"):
            merge_into_partitioned(spark, path, ins, ["id"], ["pt"])


class TestManifestCompactionAndSinkLayout:
    def test_compact_is_a_semantic_noop_and_collapses_generations(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        merge_into_partitioned(
            spark, path, _upd(spark), ["id"], ["pt"], op_col="op"
        )
        before = sorted((r.id, r.pt, r.v) for r in mt.read().collect())
        n = mt.compact()
        assert n == 2  # two live partitions rewritten
        after = sorted((r.id, r.pt, r.v) for r in mt.read().collect())
        assert after == before == _EXPECTED
        # the current manifest references exactly ONE generation
        gens = {e["dir"].split("/")[1] for e in mt.manifest()["entries"]}
        assert len(gens) == 1
        # one more commit and GC drops everything pre-compaction
        merge_into_partitioned(
            spark,
            path,
            spark.createDataFrame(
                [(2, "a", "z", "U")], "id int, pt string, v string, op string"
            ),
            ["id"],
            ["pt"],
            op_col="op",
        )
        live = sorted(os.listdir(f"{path}/_data"))
        assert live == [f"g{v:08d}" for v in mt.versions()]

    def test_compact_respects_lease(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        with table_write_lock(spark, path, holder="other"):
            with pytest.raises(ConcurrentWriterError):
                mt.compact()

    def test_compact_empty_table_is_noop(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(_base(spark), ["pt"])
        dele = spark.createDataFrame(
            [(i, p, "_", "D") for i, p in [(1, "a"), (2, "a"), (3, "b"), (4, "c")]],
            "id int, pt string, v string, op string",
        )
        merge_into_partitioned(spark, path, dele, ["id"], ["pt"], op_col="op")
        assert mt.compact() == 0

    def test_sink_manifest_layout_bootstraps_and_merges_atomically(
        self, spark, tmp_path
    ):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        b0 = spark.createDataFrame(
            [(1, 0, 100, "one"), (2, 1, 100, "two")],
            "id long, pt int, ts long, props string",
        ).withColumn("op", F.lit("U"))
        b1 = spark.createDataFrame(
            [(1, 0, 200, "one-v2"), (2, 1, 150, "late-del")],
            "id long, pt int, ts long, props string",
        ).withColumn(
            "op", F.when(F.col("id") == 2, "D").otherwise("U")
        )
        for i, b in enumerate([b0, b1]):
            tmp = str(tmp_path / f"w{i}")
            b.coalesce(1).write.parquet(tmp)
            pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            os.rename(f"{tmp}/{pf}", f"{src}/{i:03d}.parquet")
            os.utime(f"{src}/{i:03d}.parquet", (1700000000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = str(tmp_path / "table")
        q = start_changelog_merge_sink(
            spark, stream, table, "id", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"), layout="manifest",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        mt = ManifestTable(spark, table)
        assert is_manifest_table(spark, table)
        assert mt.current_version() == 2  # bootstrap + one merge
        got = {r["id"]: r["props"] for r in read_table(spark, table).collect()}
        assert got == {1: "one-v2"}  # id=2 tombstoned (newest write)

    def test_sink_rejects_unknown_layout(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        stream = spark.readStream.schema("id long").parquet(src)
        with pytest.raises(ValueError, match="layout"):
            start_changelog_merge_sink(
                spark, stream, str(tmp_path / "t"), "id", ["pt"], "ts",
                "op", str(tmp_path / "c"), layout="iceberg",
            )


class TestReviewPass2Regressions:
    def test_torn_manifest_create_is_not_a_table_and_self_heals(
        self, spark, tmp_path
    ):
        """r9 review pass 2: a create that died before renaming its
        first manifest leaves _manifests/ holding only a .tmp — that
        husk must NOT classify as a manifest table (it would wedge
        every merge on 'does not exist' forever), and a fresh create
        over it must succeed."""
        path = str(tmp_path / "t")
        os.makedirs(f"{path}/_manifests")
        os.makedirs(f"{path}/_data/g00000001")
        with open(f"{path}/_manifests/.v00000001.json.tmp", "w") as f:
            f.write('{"version": 1}')
        assert not is_manifest_table(spark, path)
        mt = ManifestTable(spark, path)
        assert mt.current_version() is None
        assert mt.create(_base(spark), ["pt"]) == 3  # self-heal
        assert is_manifest_table(spark, path)
        assert read_table(spark, path).count() == 4

    def test_hive_sink_bootstrap_rejects_empty_string_partition(
        self, spark, tmp_path
    ):
        """r9 review pass 2: the hive bootstrap must refuse an
        empty-string partition value BEFORE seeding the conflated
        table that every later merge refuses."""
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        b0 = spark.createDataFrame(
            [(1, "", 100, "x", "U")],
            "id long, pt string, ts long, props string, op string",
        )
        b0.coalesce(1).write.parquet(str(tmp_path / "w"))
        pf = [
            f for f in os.listdir(str(tmp_path / "w")) if f.endswith(".parquet")
        ][0]
        os.rename(f"{tmp_path}/w/{pf}", f"{src}/000.parquet")
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = str(tmp_path / "table")
        q = start_changelog_merge_sink(
            spark, stream, table, "id", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"),
        )
        try:
            with pytest.raises(StreamingQueryException, match="empty-string"):
                q.processAllAvailable()
        finally:
            q.stop()
        # nothing was seeded: no partition directories exist
        assert not os.path.exists(f"{table}/pt=__HIVE_DEFAULT_PARTITION__")
