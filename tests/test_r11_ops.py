"""Round-11 tests: shard-write crash safety (tmp+rename +
length-verified reuse), the whole-feed pruned-read guard, the
``.stale`` husk sweep, and the date-partition exact fast path in the
single-walk partition mapping (all four from the r11 external
review)."""

from __future__ import annotations

import datetime
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
