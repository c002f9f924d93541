"""Round-11 tests: shard-write crash safety (tmp+rename +
length-verified reuse), the whole-feed pruned-read guard, the
``.stale`` husk sweep, and the date-partition exact fast path in the
single-walk partition mapping (all four from the r11 external
review)."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.operators.table import (
    ManifestTable,
    _read_small_file,
    _write_small_file,
)
from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
    _FEED_MARKER,
    prune_changes_feed,
    read_changes_feed,
    start_table_changes_tail,
)


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


class TestShardCrashSafety:
    """A crash mid-shard-write must never leave a truncated file AT
    the content-addressed name that a later commit could reuse
    blindly (external review r11: the exists-check reuse would
    publish a list referencing the corrupt shard — persistently
    unreadable, never GC'd because referenced)."""

    def _mk(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i % 12, f"x{i}") for i in range(36)],
            "id int, pt int, v string",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path, shard_target=4)
        mt.create(df, ["pt"])
        return mt, path

    def test_truncated_husk_at_final_name_is_repaired(
        self, spark, tmp_path
    ):
        mt, path = self._mk(spark, tmp_path)
        entries = mt.manifest(1)["entries"]
        # deterministic re-shard of the same entries at the same
        # version: every bucket's content-address equals a name that
        # already exists and is INTACT — nothing may be rewritten
        rels, nb = mt._shard_entries(1, entries, 4)
        mtimes = {r: os.path.getmtime(f"{path}/{r}") for r in rels}
        rels2, _ = mt._shard_entries(1, entries, 4)
        assert rels2 == rels
        for r in rels:
            assert os.path.getmtime(f"{path}/{r}") == mtimes[r]
        # now simulate the crash: one shard truncated at its final
        # content-addressed name (file exists, wrong length)
        victim = f"{path}/{rels[0]}"
        good = open(victim, "r", encoding="utf-8").read()
        with open(victim, "w", encoding="utf-8") as fh:
            fh.write(good[: len(good) // 2])
        rels3, _ = mt._shard_entries(1, entries, 4)
        assert rels3 == rels
        assert open(victim, encoding="utf-8").read() == good
        # and the repaired table still expands fully
        mt._man_cache.clear()
        assert len(mt.manifest(1)["entries"]) == 12

    def test_no_tmp_husks_survive_commit(self, spark, tmp_path):
        mt, path = self._mk(spark, tmp_path)
        upd = spark.createDataFrame(
            [(0, 0, "X0", "U")], "id int, pt int, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        leftover = [
            n
            for n in os.listdir(f"{path}/_manifests")
            if n.endswith(".tmp") and not n.endswith(".crc")
        ]
        assert leftover == []
        assert mt.read().filter("pt = 0").count() == 3


class TestWholeFeedPrunedGuard:
    """read_changes_feed(since_version=None) on a pruned feed must
    fail loudly unless the caller acknowledges rolling-window
    semantics (external review r11, medium)."""

    def _feed(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a", "x1"), (2, "b", "x2")], "id int, pt string, v string"
        )
        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(df, ["pt"])
        for i in range(2):
            upd = spark.createDataFrame(
                [(10 + i, "a", f"z{i}", "U")],
                "id int, pt string, v string, op string",
            )
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op",
                retain_versions=10,
            )
        feed = str(tmp_path / "feed")
        _drain(start_table_changes_tail(
            spark, path, feed, str(tmp_path / "ckpt")
        ))
        return path, feed

    def test_unpruned_whole_read_needs_no_flag(self, spark, tmp_path):
        path, feed = self._feed(spark, tmp_path)
        assert read_changes_feed(spark, path, feed).count() > 0

    def test_pruned_whole_read_raises_unless_acknowledged(
        self, spark, tmp_path
    ):
        path, feed = self._feed(spark, tmp_path)
        prune_changes_feed(spark, feed, keep_versions=1)
        with pytest.raises(ValueError, match="whole-feed"):
            read_changes_feed(spark, path, feed)
        got = read_changes_feed(
            spark, path, feed, allow_pruned_feed=True
        )
        assert sorted(
            r[0]
            for r in got.select("_commit_version").distinct().collect()
        ) == [3]


class TestStaleHuskSweep:
    """A crash between the stale-swap's two renames leaves the
    displaced diff as an invisible ``.vNNNNNNNN.stale`` husk that
    nothing else deletes (external review r11, low)."""

    def _feed(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a", "x1")], "id int, pt string, v string"
        )
        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(df, ["pt"])
        feed = str(tmp_path / "feed")
        _drain(start_table_changes_tail(
            spark, path, feed, str(tmp_path / "ckpt")
        ))
        return path, feed

    def _plant_husk(self, tmp_path):
        husk = tmp_path / "feed" / ".v00000001.stale"
        husk.mkdir()
        (husk / "part-0.parquet").write_bytes(b"displaced diff")
        return husk

    def test_prune_sweeps_husks(self, spark, tmp_path):
        path, feed = self._feed(spark, tmp_path)
        husk = self._plant_husk(tmp_path)
        prune_changes_feed(spark, feed, keep_versions=5)
        assert not husk.exists()
        assert read_changes_feed(spark, path, feed).count() == 1

    def test_emit_batch_sweeps_husks_on_append_only_feed(
        self, spark, tmp_path
    ):
        path, feed = self._feed(spark, tmp_path)
        husk = self._plant_husk(tmp_path)
        upd = spark.createDataFrame(
            [(2, "a", "x2", "U")], "id int, pt string, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        _drain(start_table_changes_tail(
            spark, path, feed, str(tmp_path / "ckpt")
        ))
        assert not husk.exists()
        assert read_changes_feed(spark, path, feed).filter(
            "_commit_version = 2"
        ).count() == 1


class TestDatePartitionFastPath:
    """Date partition values take the exact str(val) fast path in
    the single-walk mapping (external review r11: the by-value
    linear scan reintroduced O(N²) for the archetypal
    date-partitioned many-partition scheme); behavior must be
    identical — Spark writes date dirs as zero-padded ISO."""

    def test_date_partitions_map_merge_and_empty(self, spark, tmp_path):
        days = [datetime.date(2026, 1, d) for d in (1, 2, 9, 31)]
        df = spark.createDataFrame(
            [(i, days[i % 4], f"x{i}") for i in range(16)],
            "id int, d date, v string",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(df, ["d"])
        assert len(mt.manifest(1)["entries"]) == 4
        assert mt.read(partitions=[(days[2],)]).count() == 4
        # empty one date partition through a merge: the mapping must
        # match the date key exactly (absent dir -> entry dropped)
        dele = spark.createDataFrame(
            [(i, days[1], f"x{i}", "D") for i in range(16)],
            "id int, d date, v string, op string",
        )
        merge_into_partitioned(
            spark, path, dele, ["id"], ["d"], op_col="op",
            retain_versions=10,
        )
        keys = {e["key"] for e in mt.manifest(2)["entries"]}
        assert len(keys) == 3
        assert mt.read().count() == 12
        assert mt.read(partitions=[(days[1],)]).count() == 0

    def test_datetime_partitions_still_match_by_value(
        self, spark, tmp_path
    ):
        """Timestamps stay on the by-parsed-value path (Spark trims
        trailing zeros in dir names, str() does not) — pin that the
        datetime-is-a-date subclass ordering keeps them OFF the
        exact path."""
        ts = [
            datetime.datetime(2026, 1, 1, 0, 0, 0),
            datetime.datetime(2026, 1, 1, 12, 30, 0),
        ]
        df = spark.createDataFrame(
            [(i, ts[i % 2], f"x{i}") for i in range(8)],
            "id int, t timestamp, v string",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(df, ["t"])
        assert len(mt.manifest(1)["entries"]) == 2
        assert mt.read(partitions=[(ts[0],)]).count() == 4


class TestStringBounds:
    """_stats_upper_string must return a VALID upper bound or None —
    a plain truncation sorts below the original and would prune
    matching partitions."""

    def test_short_strings_pass_through(self):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _stats_lower_string,
            _stats_upper_string,
        )
        assert _stats_upper_string("abc") == "abc"
        assert _stats_lower_string("abc") == "abc"

    def test_long_upper_bound_is_ge_original(self):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _STATS_MAX_STR,
            _stats_lower_string,
            _stats_upper_string,
        )
        s = "z" * 10 + "a" * 100
        up = _stats_upper_string(s)
        assert up is not None and len(up) <= _STATS_MAX_STR
        assert up > s  # valid upper bound
        lo = _stats_lower_string(s)
        assert lo <= s and len(lo) == _STATS_MAX_STR

    def test_unincrementable_returns_none(self):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _stats_upper_string,
        )
        s = "\udbff" * 100  # every position in/above the guard range
        assert _stats_upper_string(s) is None


class TestColumnStats:
    """Per-entry min/max/null stats + stats-pruned reads (the r10
    verdict's top missing scale feature)."""

    def _mk(self, spark, tmp_path, **kw):
        df = spark.createDataFrame(
            [
                (i, i % 3, float(i), f"n{i:04d}",
                 None if i % 5 == 0 else i * 10)
                for i in range(30)
            ],
            "id int, pt int, x double, nm string, opt int",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path, **kw)
        mt.create(df, ["pt"])
        return mt, path

    def test_auto_stats_recorded_with_nulls(self, spark, tmp_path):
        mt, _ = self._mk(spark, tmp_path)
        man = mt.manifest(1)
        assert man["stats_cols"] == "auto"
        for e in man["entries"]:
            st = e["stats"]
            assert st["rows"] == 10
            assert set(st["cols"]) == {"id", "x", "nm", "opt"}
            assert st["cols"]["opt"]["nulls"] == 2
            assert st["cols"]["id"]["nulls"] == 0

    def test_pruning_each_operator(self, spark, tmp_path):
        mt, _ = self._mk(spark, tmp_path)
        # ids 0..29; per-partition ranges interleave, so only value
        # ranges OUTSIDE 0..29 prune fully
        assert mt.prune_stats([("id", ">", 100)]) == (0, 3)
        assert mt.prune_stats([("id", "<", 0)]) == (0, 3)
        assert mt.prune_stats([("id", ">=", 0)]) == (3, 3)
        assert mt.prune_stats([("id", "between", (200, 300))]) == (0, 3)
        assert mt.prune_stats([("id", "in", [500, 700])]) == (0, 3)
        assert mt.prune_stats([("id", "=", 999)]) == (0, 3)
        assert mt.prune_stats([("opt", "is_null")]) == (3, 3)
        assert mt.prune_stats([("id", "is_null")]) == (0, 3)
        assert mt.prune_stats([("id", "not_null")]) == (3, 3)

    def test_where_read_matches_plain_filter(self, spark, tmp_path):
        mt, _ = self._mk(spark, tmp_path)
        got = sorted(
            r.id for r in mt.read(where=[("x", "<=", 7.0)]).collect()
        )
        want = sorted(
            r.id for r in mt.read().filter("x <= 7.0").collect()
        )
        assert got == want and len(got) == 8

    def test_where_rejects_none_comparison(self, spark, tmp_path):
        mt, _ = self._mk(spark, tmp_path)
        with pytest.raises(ValueError, match="is_null"):
            mt.read(where=[("id", "=", None)])

    def test_pre_stats_entries_never_pruned(self, spark, tmp_path):
        mt, path = self._mk(spark, tmp_path)
        # simulate a pre-r11 manifest: strip stats from every entry
        man = mt._manifest_raw(1)
        for e in man["entries"]:
            e.pop("stats", None)
        _write_small_file(
            spark, f"{path}/_manifests/v00000001.json", json.dumps(man)
        )
        mt._man_cache.clear()
        assert mt.prune_stats([("id", ">", 100)]) == (3, 3)
        assert mt.read(where=[("id", ">", 100)]).count() == 0

    def test_explicit_stats_cols_persisted_and_validated(
        self, spark, tmp_path
    ):
        mt, path = self._mk(spark, tmp_path, stats_cols=["x"])
        man = mt.manifest(1)
        assert man["stats_cols"] == ["x"]
        assert set(man["entries"][0]["stats"]["cols"]) == {"x"}
        # merges through a DEFAULT-constructed instance honor it
        upd = spark.createDataFrame(
            [(0, 0, 99.0, "zz", 1, "U")],
            "id int, pt int, x double, nm string, opt int, op string",
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        man2 = ManifestTable(spark, path).manifest(2)
        assert man2["stats_cols"] == ["x"]
        touched = [
            e for e in man2["entries"] if e["dir"].startswith("_data/g00000002")
        ]
        assert len(touched) == 1
        assert set(touched[0]["stats"]["cols"]) == {"x"}

    def test_bad_stats_cols_raise_at_create(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 1)], "id int, pt int")
        with pytest.raises(ValueError, match="stats_cols"):
            ManifestTable(
                spark, str(tmp_path / "t"), stats_cols=["nope"]
            ).create(df, ["pt"])
        with pytest.raises(ValueError, match="stats_cols"):
            ManifestTable(
                spark, str(tmp_path / "t2"), stats_cols=["pt"]
            ).create(df, ["pt"])

    def test_stats_disabled(self, spark, tmp_path):
        mt, _ = self._mk(spark, tmp_path, stats_cols=None)
        man = mt.manifest(1)
        assert man["stats_cols"] == []
        assert "stats" not in man["entries"][0]
        assert mt.prune_stats([("id", ">", 100)]) == (3, 3)

    def test_all_null_column_prunes_comparisons(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, 0, None) for i in range(4)], "id int, pt int, v string"
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        assert mt.prune_stats([("v", "=", "x")]) == (0, 1)
        assert mt.prune_stats([("v", "is_null")]) == (1, 1)
        assert mt.prune_stats([("v", "not_null")]) == (0, 1)

    def test_nan_bounds_never_prune(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 0, float("nan")), (2, 0, float("nan"))],
            "id int, pt int, x double",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        st = mt.manifest(1)["entries"][0]["stats"]["cols"]["x"]
        # NaN bounds are stored as unbounded (key omitted since r13),
        # so no comparison prunes
        assert st.get("mx") is None
        assert mt.prune_stats([("x", ">", 1e12)]) == (1, 1)

    def test_long_string_bounds_still_match(self, spark, tmp_path):
        long_a = "a" * 200
        long_z = "z" * 200
        df = spark.createDataFrame(
            [(1, 0, long_a), (2, 0, long_z)], "id int, pt int, s string"
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        # both real values must survive their own truncated bounds
        assert mt.prune_stats([("s", "=", long_a)]) == (1, 1)
        assert mt.prune_stats([("s", "=", long_z)]) == (1, 1)
        assert mt.read(where=[("s", "=", long_z)]).count() == 1
        # and a value clearly outside still prunes
        assert mt.prune_stats([("s", "<", "a")]) == (0, 1)

    def test_restore_carries_stats(self, spark, tmp_path):
        mt, path = self._mk(spark, tmp_path)
        upd = spark.createDataFrame(
            [(0, 0, 1e6, "zz", 1, "U")],
            "id int, pt int, x double, nm string, opt int, op string",
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        mt.restore(1)
        assert mt.prune_stats([("x", ">=", 1e6)]) == (0, 3)


class TestLockWait:
    """wait_seconds turns lease contention into bounded blocking."""

    def test_waiter_acquires_after_release(self, spark, tmp_path):
        import threading
        import time

        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            table_write_lock,
        )

        path = str(tmp_path / "t")
        order = []

        def holder():
            with table_write_lock(spark, path, holder="first"):
                order.append("held")
                time.sleep(1.0)
            order.append("released")

        t = threading.Thread(target=holder)
        t.start()
        time.sleep(0.3)  # let the holder acquire
        with table_write_lock(
            spark, path, holder="second", wait_seconds=10.0
        ):
            order.append("second")
        t.join()
        assert order == ["held", "released", "second"]

    def test_no_wait_still_fails_fast(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
            table_write_lock,
        )

        path = str(tmp_path / "t")
        with table_write_lock(spark, path, holder="first"):
            with pytest.raises(ConcurrentWriterError):
                with table_write_lock(spark, path, holder="second"):
                    pass


class TestOptimisticCommit:
    """stage_commit/commit_staged: the Delta-style optimistic
    concurrency path — heavy work outside the lease, rebase over
    disjoint winners, loud on overlap (the r10 verdict's #2 gap)."""

    def _mk(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i % 4, f"x{i}") for i in range(16)],
            "id int, pt int, v string",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        return mt, path

    def _pt_df(self, spark, mt, pt, extra_id, tag):
        add = spark.createDataFrame(
            [(extra_id, pt, tag)], "id int, pt int, v string"
        )
        return mt.read(partitions=[(pt,)]).unionByName(add)

    def test_staged_commit_equals_locked_commit(self, spark, tmp_path):
        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 0, 100, "S"), [(0,)])
        v = mt.commit_staged(s, retain_versions=10)
        assert v == 2
        assert mt.read(partitions=[(0,)]).count() == 5
        # stats attached, staging promoted (no .stage dirs left)
        touched = [
            e for e in mt.manifest(2)["entries"]
            if e["dir"].startswith("_data/g00000002")
        ]
        assert len(touched) == 1 and touched[0]["stats"]["rows"] == 5
        assert [
            n for n in os.listdir(f"{path}/_data")
            if n.startswith(".stage")
        ] == []

    def test_rebase_over_disjoint_winner(self, spark, tmp_path):
        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 1, 101, "A"), [(1,)])
        # winner commits a DISJOINT partition while A is staged
        upd = spark.createDataFrame(
            [(2, 2, "B", "U")], "id int, pt int, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        v = mt.commit_staged(s, retain_versions=10)
        assert v == 3
        got = mt.read()
        assert got.filter("id = 101").count() == 1  # ours
        assert got.filter("v = 'B'").count() == 1   # winner's
        # the change feed over the rebase is a clean per-version diff
        d = mt.changes(1, 3)
        assert d.filter("_change_type = 'insert'").count() == 2

    def test_overlap_fails_loudly_and_abort_cleans(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
        )

        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 3, 103, "A"), [(3,)])
        upd = spark.createDataFrame(
            [(3, 3, "W", "U")], "id int, pt int, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        with pytest.raises(ConcurrentWriterError, match="overlaps"):
            mt.commit_staged(s, retain_versions=10)
        mt.abort_staged(s)
        assert [
            n for n in os.listdir(f"{path}/_data")
            if n.startswith(".stage")
        ] == []
        # winner's update intact, loser's never visible
        assert mt.read().filter("v = 'W'").count() == 1
        assert mt.read().filter("id = 103").count() == 0

    def test_on_conflict_fail_mode(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
        )

        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 1, 101, "A"), [(1,)])
        upd = spark.createDataFrame(
            [(2, 2, "B", "U")], "id int, pt int, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        with pytest.raises(ConcurrentWriterError, match="moved"):
            mt.commit_staged(s, on_conflict="fail")
        mt.abort_staged(s)

    def test_unprovable_rebase_base_gcd(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
        )

        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 1, 101, "A"), [(1,)])
        # winner advances THREE versions with retain_versions=2 — the
        # staged base (v1) falls out of retention
        for i in range(3):
            upd = spark.createDataFrame(
                [(2, 2, f"B{i}", "U")],
                "id int, pt int, v string, op string",
            )
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op",
                retain_versions=2,
            )
        with pytest.raises(ConcurrentWriterError, match="no longer retained"):
            mt.commit_staged(s, retain_versions=10)
        mt.abort_staged(s)

    def test_schema_change_blocks_rebase(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
        )

        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 1, 101, "A"), [(1,)])
        # winner evolves the schema (add-only) through a locked
        # overwrite of a DISJOINT partition — disjoint data, but the
        # rebase must still refuse: evolution and optimistic
        # concurrency don't compose
        evolved = mt.read(partitions=[(2,)]).withColumn(
            "extra", F.lit(7)
        )
        mt.overwrite_partitions(evolved, [(2,)], retain_versions=10)
        with pytest.raises(ConcurrentWriterError, match="schema"):
            mt.commit_staged(s, retain_versions=10)
        mt.abort_staged(s)

    def test_vacuum_sweeps_aged_staging_husks(self, spark, tmp_path):
        import time

        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 0, 100, "A"), [(0,)])
        husk = f"{path}/_data/{s['rel'].split('/')[-1]}"
        assert os.path.isdir(husk)
        # a YOUNG staging survives vacuum (a live stager may own it)
        mt.vacuum(staging_ttl_seconds=3600)
        assert os.path.isdir(husk)
        # age it past the TTL: swept
        old = time.time() - 7200
        os.utime(husk, (old, old))
        mt.vacuum(staging_ttl_seconds=3600)
        assert not os.path.isdir(husk)

    def test_staging_survives_winner_gc(self, spark, tmp_path):
        mt, path = self._mk(spark, tmp_path)
        s = mt.stage_commit(self._pt_df(spark, mt, 1, 101, "A"), [(1,)])
        # winner churns several commits with a tight retain window —
        # its per-commit GC must never delete the dot-staging
        for i in range(3):
            upd = spark.createDataFrame(
                [(2, 2, f"B{i}", "U")],
                "id int, pt int, v string, op string",
            )
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op",
                retain_versions=2,
            )
        assert os.path.isdir(f"{path}/_data/{s['rel'].split('/')[-1]}")
        mt.abort_staged(s)


class TestOptimisticMerge:
    """merge_into_partitioned(optimistic=True): compute + write fully
    outside the lease, publish with disjoint rebase."""

    def _mk(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i % 4, f"x{i}") for i in range(16)],
            "id int, pt int, v string",
        )
        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(df, ["pt"])
        return path

    def test_optimistic_merge_e2e(self, spark, tmp_path):
        path = self._mk(spark, tmp_path)
        upd = spark.createDataFrame(
            [(1, 1, "OPT", "U"), (5, 1, "x5", "D")],
            "id int, pt int, v string, op string",
        )
        n = merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10, optimistic=True,
        )
        assert n == 1
        mt = ManifestTable(spark, path)
        assert mt.current_version() == 2
        got = sorted(
            (r.id, r.v)
            for r in mt.read(partitions=[(1,)]).collect()
        )
        assert got == [(1, "OPT"), (9, "x9"), (13, "x13")]
        leftovers = [
            d for d in os.listdir(f"{path}/_data")
            if d.startswith(".stage")
        ] + [
            d for d in os.listdir(path) if d.startswith("_merge_delta")
        ]
        assert leftovers == []

    def test_optimistic_requires_manifest_table(self, spark, tmp_path):
        plain = str(tmp_path / "plain")
        spark.createDataFrame(
            [(1, 0, "a")], "id int, pt int, v string"
        ).write.partitionBy("pt").parquet(plain)
        upd = spark.createDataFrame(
            [(1, 0, "b", "U")], "id int, pt int, v string, op string"
        )
        with pytest.raises(ValueError, match="manifest-committed"):
            merge_into_partitioned(
                spark, plain, upd, ["id"], ["pt"], op_col="op",
                optimistic=True,
            )

    def test_concurrent_disjoint_optimistic_merges(self, spark, tmp_path):
        import threading

        path = self._mk(spark, tmp_path)
        out = {}

        def run(pt, tag):
            try:
                upd = spark.createDataFrame(
                    [(100 + pt, pt, tag, "U")],
                    "id int, pt int, v string, op string",
                )
                out[tag] = merge_into_partitioned(
                    spark, path, upd, ["id"], ["pt"], op_col="op",
                    retain_versions=10, optimistic=True,
                    lock_wait_seconds=30,
                )
            except Exception as exc:  # noqa: BLE001 — assert below
                out[tag] = repr(exc)

        ts = [
            threading.Thread(target=run, args=(0, "T0")),
            threading.Thread(target=run, args=(3, "T3")),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert out == {"T0": 1, "T3": 1}
        mt = ManifestTable(spark, path)
        assert mt.current_version() == 3  # both committed
        vals = sorted(
            r.v for r in mt.read().filter("id >= 100").collect()
        )
        assert vals == ["T0", "T3"]
        assert [
            d for d in os.listdir(f"{path}/_data")
            if d.startswith(".stage")
        ] == []


class TestFeedPruneReaderRace:
    """r10 verdict item 7: a prune landing between a feed reader's
    listing and its scan must yield either a complete frame from the
    old listing or the explicit retention error — never a partial
    frame."""

    def _feed(self, spark, tmp_path, commits=3):
        df = spark.createDataFrame(
            [(1, "a", "x1"), (2, "b", "x2")], "id int, pt string, v string"
        )
        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(df, ["pt"])
        for i in range(commits - 1):
            upd = spark.createDataFrame(
                [(10 + i, "a", f"z{i}", "U")],
                "id int, pt string, v string, op string",
            )
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op",
                retain_versions=10,
            )
        feed = str(tmp_path / "feed")
        _drain(start_table_changes_tail(
            spark, path, feed, str(tmp_path / "ckpt")
        ))
        return path, feed

    def test_prune_between_listing_and_scan_raises(
        self, spark, tmp_path, monkeypatch
    ):
        import fbg_kafka_stream_file_transfer_spark.streaming.table_tail as tt

        path, feed = self._feed(spark, tmp_path)
        real = tt._committed_feed_versions
        fired = []

        def listed_then_pruned(s, d):
            vs = real(s, d)
            if not fired:  # prune exactly once (prune itself lists)
                fired.append(True)
                prune_changes_feed(s, d, keep_versions=1)
            return vs

        monkeypatch.setattr(
            tt, "_committed_feed_versions", listed_then_pruned
        )
        # cursor read: the post-listing high-water check must catch
        # the race and raise the explicit retention error
        with pytest.raises(ValueError, match="pruned through"):
            tt.read_changes_feed(spark, path, feed, since_version=1)
        # whole-feed read: same race, same explicit error
        with pytest.raises(ValueError, match="whole-feed"):
            tt.read_changes_feed(spark, path, feed)

    def test_prune_after_df_build_is_loud_not_partial(
        self, spark, tmp_path
    ):
        """A prune AFTER the DataFrame is built (reader mid-scan):
        the lazy scan over the deleted dirs must error, not return a
        partial frame (ignoreMissingFiles stays false)."""
        path, feed = self._feed(spark, tmp_path)
        df = read_changes_feed(spark, path, feed, since_version=1)
        prune_changes_feed(spark, feed, keep_versions=1)
        with pytest.raises(Exception, match="(?i)exist|found"):
            df.collect()
        # repeat 3x-stability of the raced cursor read
        for _ in range(3):
            with pytest.raises(ValueError, match="pruned through"):
                read_changes_feed(spark, path, feed, since_version=1)


class TestReviewFixesR11:
    """Regressions from the round-11 code review of the new stats +
    optimistic machinery."""

    def test_nan_predicate_value_never_prunes(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 0, float("nan")), (2, 0, 5.0), (3, 1, 1.0)],
            "id int, pt int, x double",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        nan = float("nan")
        # no clause with a NaN probe may prune anything…
        assert mt.prune_stats([("x", "=", nan)]) == (2, 2)
        assert mt.prune_stats([("x", "<", nan)]) == (2, 2)
        assert mt.prune_stats([("x", "between", (0.0, nan))]) == (2, 2)
        assert mt.prune_stats([("x", "in", [nan, 99.0])]) == (2, 2)
        # …and the residual filter decides: Spark orders NaN greatest
        # and NaN = NaN true, so the NaN row survives an equality read
        assert [
            r.id for r in mt.read(where=[("x", "=", nan)]).collect()
        ] == [1]

    def test_read_scope_all_refuses_any_rebase(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
        )

        df = spark.createDataFrame(
            [(i, i % 4, f"x{i}") for i in range(16)],
            "id int, pt int, v string",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        # a whole-table summary staged into partition 0
        summary = spark.createDataFrame(
            [(999, 0, "summary")], "id int, pt int, v string"
        ).unionByName(mt.read(partitions=[(0,)]))
        s = mt.stage_commit(summary, [(0,)], read_partitions="all")
        # winner touches a DISJOINT partition — still a conflict,
        # because the summary was derived from the whole table
        upd = spark.createDataFrame(
            [(2, 2, "W", "U")], "id int, pt int, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        with pytest.raises(ConcurrentWriterError, match="WHOLE table"):
            mt.commit_staged(s, retain_versions=10)
        mt.abort_staged(s)

    def test_read_partitions_list_widens_conflict_check(
        self, spark, tmp_path
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
        )

        df = spark.createDataFrame(
            [(i, i % 4, f"x{i}") for i in range(16)],
            "id int, pt int, v string",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        # writes pt=0, but declares it READ pt=2
        derived = mt.read(partitions=[(0,)])
        s = mt.stage_commit(
            derived, [(0,)], read_partitions=[(2,)]
        )
        upd = spark.createDataFrame(
            [(2, 2, "W", "U")], "id int, pt int, v string, op string"
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10,
        )
        with pytest.raises(ConcurrentWriterError, match="overlaps"):
            mt.commit_staged(s, retain_versions=10)
        mt.abort_staged(s)

    def test_vacuum_sweeps_aged_merge_delta_husks(self, spark, tmp_path):
        import time

        df = spark.createDataFrame(
            [(1, 0, "a")], "id int, pt int, v string"
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        husk = tmp_path / "t" / "_merge_delta-deadbeef"
        husk.mkdir()
        (husk / "part-0.parquet").write_bytes(b"orphan delta")
        mt.vacuum(staging_ttl_seconds=3600)
        assert husk.exists()  # young: a live merge may own it
        old = time.time() - 7200
        os.utime(husk, (old, old))
        mt.vacuum(staging_ttl_seconds=3600)
        assert not husk.exists()

    def test_optimistic_merge_breaks_stale_lock(self, spark, tmp_path):
        import time

        df = spark.createDataFrame(
            [(i, i % 2, f"x{i}") for i in range(4)],
            "id int, pt int, v string",
        )
        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(df, ["pt"])
        # a dead writer's leftover lease
        _write_small_file(
            spark, f"{path}/_lock",
            json.dumps({"holder": "dead", "token": "t0"}),
        )
        old = time.time() - 600
        os.utime(f"{path}/_lock", (old, old))
        upd = spark.createDataFrame(
            [(0, 0, "NEW", "U")], "id int, pt int, v string, op string"
        )
        n = merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=10, optimistic=True,
            lock_wait_seconds=1, lock_stale_after_seconds=60,
        )
        assert n == 1
        mt = ManifestTable(spark, path)
        assert mt.read().filter("v = 'NEW'").count() == 1


class TestColumnWhereExtraction:
    """read(where=<pyspark Column>): prunable conjuncts are extracted
    from the Catalyst expression tree; everything else falls back to
    the exact filter with zero pruning (never-wrong by design)."""

    def _mk(self, spark, tmp_path):
        import datetime as dt

        days = [dt.date(2026, 1, d) for d in (1, 15)]
        df = spark.createDataFrame(
            [
                (i, i % 4, float(i), f"n{i:03d}", days[i % 2],
                 None if i % 5 == 0 else i)
                for i in range(40)
            ],
            "id int, pt int, x double, nm string, d date, opt int",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        # RANGE partitioning so id bounds are disjoint per entry
        df2 = df.withColumn("pt", (F.col("id") / 10).cast("int"))
        mt.create(df2, ["pt"])
        return mt

    def test_extraction_each_shape(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _clauses_from_column,
        )
        import datetime as dt

        c = (
            (F.col("id") >= 10)
            & (F.lit(35) > F.col("id"))          # swapped operand order
            & F.col("nm").isin("a", "b")
            & F.col("opt").isNull()
            & F.col("d").isNotNull()
            & (F.col("d") == dt.date(2026, 1, 15))
            & (F.col("x") < 2.5)
        )
        got = _clauses_from_column(c)
        assert ("id", ">=", 10) in got
        assert ("id", "<", 35) in got
        assert ("nm", "in", ["a", "b"]) in got
        assert ("opt", "is_null", None) in got
        assert ("d", "not_null", None) in got
        assert ("d", "=", dt.date(2026, 1, 15)) in got
        assert ("x", "<", 2.5) in got

    def test_unrecognized_shapes_extract_nothing(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _clauses_from_column,
        )

        assert _clauses_from_column(
            (F.col("a") > 1) | (F.col("b") > 2)
        ) == []
        assert _clauses_from_column(~(F.col("a") > 1)) == []
        assert _clauses_from_column(F.col("a") + 1 > 2) == []
        # an AND with one opaque side still yields the clean side
        got = _clauses_from_column(
            (F.col("a") > 1) & (F.col("b") % 2 == 0)
        )
        assert got == [("a", ">", 1)]

    def test_column_where_prunes_and_matches_filter(self, spark, tmp_path):
        mt = self._mk(spark, tmp_path)
        c = (F.col("id") >= 10) & (F.col("id") < 20)
        assert mt.prune_stats(c) == (1, 4)
        got = sorted(r.id for r in mt.read(where=c).collect())
        assert got == list(range(10, 20))

    def test_opaque_column_where_is_exact_unpruned(self, spark, tmp_path):
        mt = self._mk(spark, tmp_path)
        c = (F.col("id") % 7 == 0) | (F.col("x") > 38.0)
        assert mt.prune_stats(c) == (4, 4)  # nothing extractable
        got = sorted(r.id for r in mt.read(where=c).collect())
        want = sorted(
            r.id for r in mt.read().filter(c).collect()
        )
        assert got == want and len(got) > 0

    def test_timestamp_and_decimal_literals_extract(self, spark, tmp_path):
        import decimal
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _clauses_from_column,
        )

        ts = datetime.datetime(2026, 3, 1, 12, 30, 45, 123456)
        got = _clauses_from_column(
            (F.col("t") >= ts) & (F.col("p") == decimal.Decimal("12.50"))
        )
        assert ("t", ">=", ts) in got
        assert ("p", "=", decimal.Decimal("12.50")) in got

    def test_timestamp_column_where_prunes(self, spark, tmp_path):
        # day-granularity spans: timestamp bounds carry a ±2 day
        # timezone slack, so pruning bites on ranges ≫ two days
        base = datetime.datetime(2026, 3, 1)
        df = spark.createDataFrame(
            [
                (i, i // 10, base + datetime.timedelta(days=i))
                for i in range(40)
            ],
            "id int, pt int, t timestamp",
        )
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        cut = base + datetime.timedelta(days=30)
        c = F.col("t") >= cut
        # partition 2 ends at day 29; the 2-day slack keeps it
        assert mt.prune_stats(c) == (2, 4)
        assert mt.read(where=c).count() == 10


class TestStatsSparkComparisonSemantics:
    """Pass-2 review: the driver-side bounds comparison must mimic
    SPARK's comparison semantics, never Python's exact ones."""

    def test_float_literal_vs_long_bounds_past_2_53(self, spark, tmp_path):
        """Spark compares long-vs-double by casting the long lossily;
        exact Python comparison pruned a partition whose rows the
        exact filter matches (probe-confirmed wrong result)."""
        big = 2**63 - 2
        df = spark.createDataFrame([(1, 0, big)], "id int, pt int, c long")
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        lit = 9.223372036854776e18  # == float(2**63) == float(big)
        assert mt.prune_stats([("c", "=", lit)]) == (1, 1)
        assert mt.read(where=[("c", "=", lit)]).count() == 1
        assert mt.read(where=(F.col("c") == lit)).count() == 1

    def test_timestamp_bounds_widened_by_tz_slack(self, spark, tmp_path):
        """Timestamp bounds carry a ±2 day slack (wider than the 26 h
        gap between the extreme zone offsets, UTC+14 session vs
        UTC−12 OS — external review r12) so frame mismatches can
        never drop matching rows; pruning still works past it."""
        base = datetime.datetime(2026, 6, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [(i, 0, base + datetime.timedelta(minutes=i)) for i in range(10)],
            "id int, pt int, t timestamp",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        # within the slack past the max bound (26 h — the worst real
        # conversion-frame gap): kept
        probe = base + datetime.timedelta(hours=26)
        assert mt.prune_stats([("t", ">=", probe)]) == (1, 1)
        # beyond the slack: pruned
        probe2 = base + datetime.timedelta(hours=50)
        assert mt.prune_stats([("t", ">=", probe2)]) == (0, 1)
        # and exactness is untouched (the filter decides)
        assert mt.read(where=[("t", ">=", probe)]).count() == 0

    def test_ntz_columns_not_stats_eligible(self, spark, tmp_path):
        """NTZ comparisons coerce through the session timezone, which
        the driver cannot see — NTZ columns record no stats and are
        never pruned (probe-confirmed silent row drop otherwise)."""
        df = spark.createDataFrame(
            [(1, 0, datetime.datetime(2026, 1, 1, 0, 0))],
            "id int, pt int, t timestamp_ntz",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        assert "t" not in mt.manifest(1)["entries"][0]["stats"]["cols"]
        old_tz = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set(
                "spark.sql.session.timeZone", "America/Los_Angeles"
            )
            probe = datetime.datetime(2026, 1, 1, 4, 0)
            c = F.col("t") >= probe
            assert mt.prune_stats(c) == (1, 1)  # never pruned
            assert (
                mt.read(where=c).count()
                == mt.read().filter(c).count()
            )
        finally:
            spark.conf.set("spark.sql.session.timeZone", old_tz)


_CHILD_OPTIMISTIC_MERGE = """
import sys
sys.path.insert(0, {repo!r})
from fbg_kafka_stream_file_transfer_spark import get_spark
from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    merge_into_partitioned,
)
path = sys.argv[1]
spark = get_spark("child-optimistic", cpus=2)
upd = spark.createDataFrame(
    [(2, "b", "CHILD", "U")], "id int, pt string, v string, op string"
)
n = merge_into_partitioned(
    spark, path, upd, ["id"], ["pt"], op_col="op",
    retain_versions=10, optimistic=True,
)
print("CHILD_DONE", n, flush=True)
spark.stop()
"""


class TestCrossProcessOptimistic:
    """The optimistic rebase across REAL OS processes, each with its
    own SparkSession/JVM: the parent stages against v1, a child
    process commits a disjoint optimistic merge (v2), and the
    parent's publish rebases over it — the two-independent-pipelines
    shape the feature exists for."""

    def test_parent_rebases_over_child_process_commit(
        self, spark, tmp_path
    ):
        import subprocess
        import sys as _sys

        repo = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "a", "x1"), (2, "b", "x2"), (3, "c", "x3"),
             (4, "d", "x4")],
            "id int, pt string, v string",
        )
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        # parent stages a rewrite of partition 'c' against v1
        rewritten = mt.read(partitions=[("c",)]).withColumn(
            "v", F.lit("PARENT")
        )
        staged = mt.stage_commit(rewritten, [("c",)], base_version=1)
        # child process (own JVM) lands a disjoint optimistic merge
        out = subprocess.run(
            [_sys.executable, "-c",
             _CHILD_OPTIMISTIC_MERGE.format(repo=repo), path],
            capture_output=True, timeout=300,
            env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "2g"},
        )
        assert b"CHILD_DONE 1" in out.stdout, (
            out.stdout.decode()[-1000:] + out.stderr.decode()[-1000:]
        )
        assert mt.current_version() == 2
        # parent's publish detects the move and rebases to v3
        v = mt.commit_staged(staged, retain_versions=10)
        assert v == 3
        got = sorted((r.id, r.v) for r in mt.read().collect())
        assert got == [
            (1, "x1"), (2, "CHILD"), (3, "PARENT"), (4, "x4"),
        ]


class TestTimestampAsOf:
    """version_at / read(as_of=...): TIMESTAMP AS OF time travel
    resolved from the commit log's committed_utc stamps."""

    def test_as_of_resolves_between_commits(self, spark, tmp_path):
        import time as _time

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(
            spark.createDataFrame(
                [(1, "a", "x1")], "id int, pt string, v string"
            ),
            ["pt"],
        )
        t_after_v1 = datetime.datetime.now(datetime.timezone.utc)
        _time.sleep(0.05)
        merge_into_partitioned(
            spark, path,
            spark.createDataFrame(
                [(1, "a", "X1", "U")],
                "id int, pt string, v string, op string",
            ),
            ["id"], ["pt"], op_col="op", retain_versions=10,
        )
        assert mt.version_at(t_after_v1) == 1
        now = datetime.datetime.now(datetime.timezone.utc)
        assert mt.version_at(now) == 2
        assert [
            r.v for r in mt.read(as_of=t_after_v1).collect()
        ] == ["x1"]
        assert [r.v for r in mt.read(as_of=now).collect()] == ["X1"]
        # naive datetimes are taken as UTC
        assert mt.version_at(t_after_v1.replace(tzinfo=None)) == 1
        with pytest.raises(ValueError, match="not both"):
            mt.read(version=1, as_of=now)

    def test_as_of_before_retention_raises(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        mt.create(
            spark.createDataFrame(
                [(1, "a", "x1")], "id int, pt string, v string"
            ),
            ["pt"],
        )
        ancient = datetime.datetime(
            2000, 1, 1, tzinfo=datetime.timezone.utc
        )
        with pytest.raises(ValueError, match="retain window"):
            mt.version_at(ancient)

    def test_read_table_passthrough(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            read_table,
        )

        path = str(tmp_path / "t")
        ManifestTable(spark, path).create(
            spark.createDataFrame(
                [(i, "a", f"x{i}") for i in range(6)],
                "id int, pt string, v string",
            ),
            ["pt"],
        )
        assert read_table(
            spark, path, where=(F.col("id") < 3)
        ).count() == 3
        # plain layout: where degrades to a pushed-down filter
        plain = str(tmp_path / "plain")
        spark.createDataFrame(
            [(i, f"x{i}") for i in range(6)], "id int, v string"
        ).write.parquet(plain)
        assert read_table(
            spark, plain, where=[("id", "<", 3)]
        ).count() == 3
        with pytest.raises(ValueError, match="plain table"):
            read_table(
                spark, plain,
                as_of=datetime.datetime.now(datetime.timezone.utc),
            )


class TestStaleBreakInsideWaitLoop:
    """r11: the stale-break runs inside the wait loop — a dead
    writer's leftover lease is broken as soon as its TTL allows, not
    after the whole wait window burns on a lock that never frees."""

    def test_dead_lock_broken_well_before_deadline(self, spark, tmp_path):
        import time

        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            table_write_lock,
        )

        path = str(tmp_path / "t")
        os.makedirs(path)
        _write_small_file(
            spark, f"{path}/_lock",
            json.dumps({"holder": "dead", "token": "t0"}),
        )
        old = time.time() - 600
        os.utime(f"{path}/_lock", (old, old))
        t0 = time.monotonic()
        with table_write_lock(
            spark, path, holder="w",
            wait_seconds=60.0, stale_after_seconds=30.0,
        ):
            elapsed = time.monotonic() - t0
        # broken on the FIRST poll, nowhere near the 60 s window
        assert elapsed < 10.0, elapsed


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_fuzz_table = {}


def _fuzz_mt(spark, tmp_path_factory):
    """One shared stats table for the soundness fuzz (per-example
    table creation would dwarf the property being tested). Values
    deliberately include negatives, huge ints, NaN/±inf, NULLs, and
    unicode strings."""
    if "mt" not in _fuzz_table:
        root = tmp_path_factory.mktemp("stats_fuzz")
        rows = [
            (0, 0, -(2**62), float("nan"), None),
            (1, 0, -1, float("-inf"), ""),
            (2, 0, 0, -0.0, "a"),
            (3, 1, 7, 1.5, "Z" * 100),
            (4, 1, 2**53 + 1, float("inf"), "héllo"),
            (5, 2, 2**63 - 2, 9.9e17, "é中"),
            (6, 2, None, None, None),
        ]
        df = spark.createDataFrame(
            rows, "id int, pt int, i long, f double, s string"
        )
        mt = ManifestTable(spark, str(root / "t"))
        mt.create(df, ["pt"])
        _fuzz_table["mt"] = mt
    return _fuzz_table["mt"]


_val_by_col = {
    # long range only: F.lit raises NumberFormatException beyond it
    # on BOTH the pruned and plain paths (same loud error, verified)
    "i": st.one_of(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.sampled_from([-(2**62), -1, 0, 7, 2**53 + 1, 2**63 - 2]),
    ),
    "f": st.one_of(
        st.floats(allow_nan=True, allow_infinity=True),
        st.sampled_from([-0.0, 1.5, 9.9e17, 9.223372036854776e18]),
    ),
    "s": st.one_of(
        st.text(max_size=120),
        st.sampled_from(["", "a", "Z" * 100, "héllo", "中"]),
    ),
}


_val_by_col["pt"] = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.sampled_from([0, 1, 2]),
)


@st.composite
def _clause(draw):
    # "pt" is the PARTITION column: r12 prunes on it via the entry's
    # exact key values — same soundness property must hold
    col = draw(st.sampled_from(["i", "f", "s", "pt"]))
    # CROSS-TYPE values too (external review r12): the float-vs-string
    # hole survived the original fuzz precisely because values were
    # always drawn same-typed as the column. ANSI is off, so the
    # residual filter's implicit casts NULL out rather than raise —
    # both paths stay comparable.
    vcol = draw(st.sampled_from([col, col, "i", "f", "s"]))
    vals = _val_by_col[vcol]
    op = draw(st.sampled_from(
        ["=", "<", "<=", ">", ">=", "between", "in",
         "is_null", "not_null"]
    ))
    if op in ("is_null", "not_null"):
        return (col, op)
    if op == "between":
        return (col, op, (draw(vals), draw(vals)))
    if op == "in":
        return (col, op, draw(
            st.lists(vals, min_size=1, max_size=3)
        ))
    return (col, op, draw(vals))


class TestStatsPruningSoundnessFuzz:
    """Property: for ANY where-conjunction, the stats-pruned read
    returns exactly the rows the equivalent plain filter returns —
    pruning may only skip work, never change results (the invariant
    both pass-1 and pass-2 review bugs violated)."""

    @given(where=st.lists(_clause(), min_size=1, max_size=3))
    @settings(
        max_examples=25, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_pruned_read_equals_plain_filter(
        self, spark, tmp_path_factory, where
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        mt = _fuzz_mt(spark, tmp_path_factory)
        norm = _normalize_where(where)
        got = sorted(
            r.id for r in mt.read(where=where).select("id").collect()
        )
        want = sorted(
            r.id
            for r in mt.read()
            .filter(_where_to_filter(norm))
            .select("id")
            .collect()
        )
        assert got == want, (where, got, want)

    @given(where=st.lists(_clause(), min_size=1, max_size=3))
    @settings(
        max_examples=15, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_column_spelling_equals_tuple_spelling(
        self, spark, tmp_path_factory, where
    ):
        """The SAME conjunction spelled as a pyspark Column (built by
        _where_to_filter itself) must return identical rows through
        the extraction path — every op round-trips through the
        ColumnNode walk or degrades to no-pruning, never to a
        different result."""
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        mt = _fuzz_mt(spark, tmp_path_factory)
        norm = _normalize_where(where)
        col = _where_to_filter(norm)
        got = sorted(
            r.id for r in mt.read(where=col).select("id").collect()
        )
        want = sorted(
            r.id for r in mt.read(where=where).select("id").collect()
        )
        assert got == want, (where, got, want)
