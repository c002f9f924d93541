"""Round-12 regression and feature tests.

Pins the three external-review r12 findings (float-vs-string stats
coercion, 2-day timestamp slack — asserted in test_r11_ops — and the
poll_seconds busy-spin clamp), then the r12 features as they land
(partition-column where-pruning, per-file stats, changes(where=)).
"""
import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.table import (
    ManifestTable,
)


class TestFloatPredicateVsStringBounds:
    """External review r12 (high): _le/_lt coerced through float()
    whenever EITHER operand was a float — numeric-looking string
    bounds then compared numerically, pruning entries whose rows the
    residual filter (string→double cast) matches. Probe: entry with
    s ∈ {"9","10"} has lexicographic mx="9"; ('s','>',9.5) pruned it,
    silently dropping the matching "10" row."""

    @pytest.fixture()
    def mt(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 0, "9"), (2, 0, "10")], "id int, pt int, s string"
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        return mt

    def test_tuple_clause_keeps_entry_and_row(self, mt):
        # the entry must survive pruning (cross-type → exact filter)
        assert mt.prune_stats([("s", ">", 9.5)]) == (1, 1)
        rows = mt.read(where=[("s", ">", 9.5)]).collect()
        assert [r.s for r in rows] == ["10"]

    def test_column_clause_keeps_entry_and_row(self, mt):
        c = F.col("s") > 9.5
        rows = mt.read(where=c).collect()
        assert [r.s for r in rows] == ["10"]

    def test_float_between_and_in_vs_string_bounds(self, mt):
        # same hole through the other comparison ops: the pruned read
        # must equal the plain residual filter (Spark's IN coerces the
        # double literal to STRING — "10" ≠ "10.0" → 0 rows — so the
        # invariant is pruned ≡ plain, not a hardcoded count)
        assert mt.read(where=[("s", "between", (9.5, 10.5))]).count() == 1
        plain_in = mt.read().filter(F.col("s").isin([10.0])).count()
        assert mt.read(where=[("s", "in", [10.0])]).count() == plain_in
        assert mt.read(where=[("s", "<", 9.5)]).count() == 1  # "9"

    def test_numeric_numeric_still_prunes(self, spark, tmp_path):
        # the fix must not disable the legitimate long-vs-double path
        df = spark.createDataFrame(
            [(1, 0, 5), (2, 1, 100)], "id int, pt int, c long"
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        assert mt.prune_stats([("c", ">", 50.0)]) == (1, 2)
        assert mt.read(where=[("c", ">", 50.0)]).count() == 1
        import decimal

        assert mt.prune_stats([("c", ">", decimal.Decimal("50.0"))]) == (
            1,
            2,
        )


class TestPollSecondsClamp:
    """External review r12 (low): poll_seconds=0 (or negative) with a
    wait window must not busy-spin create() RPCs — the sleep is
    floored at 50 ms."""

    def test_zero_poll_sleeps_floored(self, spark, tmp_path, monkeypatch):
        import time as time_mod

        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
            table_write_lock,
        )

        path = str(tmp_path / "t")
        os.makedirs(path)
        with open(f"{path}/_lock", "w") as f:
            json.dump({"holder": "other", "token": "tX"}, f)

        import threading

        slept: list[float] = []
        real_sleep = time_mod.sleep
        me = threading.get_ident()

        def spy_sleep(s):
            # the patch is process-global: Spark/py4j daemon threads
            # also call time.sleep during the window — record (and
            # shorten) only THIS thread's polls or the assertion
            # flakes under a full-suite run
            if threading.get_ident() != me:
                real_sleep(s)
                return
            slept.append(s)
            real_sleep(min(s, 0.05))

        # table_write_lock does `import time as _time` locally — it
        # resolves to this same module object, so patch the module
        monkeypatch.setattr(time_mod, "sleep", spy_sleep)
        with pytest.raises(ConcurrentWriterError):
            with table_write_lock(
                spark, path, holder="me",
                wait_seconds=0.3, poll_seconds=0.0,
            ):
                pass
        assert slept, "wait window must actually poll"
        # every sleep is floored at 50 ms except the last, which the
        # r12 deadline cap may truncate to the remaining window
        assert all(s >= 0.05 for s in slept[:-1]), slept
        # no busy spin: a 0.3 s window fits ~6 floored polls, not 100s
        assert len(slept) <= 10, len(slept)


class TestPartitionColumnWherePruning:
    """r12 verdict item 2: where-clauses naming PARTITION columns
    prune from the entry's exact key values — before this, the
    natural ``read(where=[("pt", "=", 3)])`` answered correctly but
    silently full-scanned."""

    @pytest.fixture()
    def mt(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(40)],
            "id int, pt int, v double",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        return mt

    def test_where_on_pcol_equals_partitions(self, mt):
        a = sorted(r.id for r in mt.read(where=[("pt", "=", 3)]).collect())
        b = sorted(r.id for r in mt.read(partitions=[(3,)]).collect())
        assert a == b and len(a) == 10

    def test_tuple_and_column_spellings_prune(self, mt):
        assert mt.prune_stats([("pt", "=", 3)]) == (1, 4)
        assert mt.prune_stats(F.col("pt") == 3) == (1, 4)
        assert mt.prune_stats([("pt", ">=", 2)]) == (2, 4)
        assert mt.prune_stats([("pt", "in", [0, 9])]) == (1, 4)
        assert mt.prune_stats([("pt", "between", (1, 2))]) == (2, 4)
        assert mt.prune_stats([("pt", "is_null")]) == (0, 4)
        assert mt.prune_stats([("pt", "not_null")]) == (4, 4)

    def test_mixed_pcol_and_stats_clauses(self, mt):
        # pt=1 keeps one entry; v > 100 excludes it via stats
        assert mt.prune_stats([("pt", "=", 1), ("v", ">", 100.0)]) == (0, 4)
        assert mt.read(
            where=[("pt", "=", 1), ("v", ">", 100.0)]
        ).count() == 0

    def test_float_predicate_on_int_pcol_prunes_exactly(self, mt):
        # both numeric → double-space comparison, pruning allowed
        assert mt.prune_stats([("pt", "=", 3.0)]) == (1, 4)
        assert mt.read(where=[("pt", "=", 3.0)]).count() == 10

    def test_float_predicate_on_string_pcol_kept(self, spark, tmp_path):
        # the r12 cross-type rule applies to key values too: "9"/"10"
        # sort lexicographically but Spark's residual casts to double
        df = spark.createDataFrame(
            [(1, "9"), (2, "10")], "id int, ps string"
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["ps"])
        assert mt.prune_stats([("ps", ">", 9.5)]) == (2, 2)
        assert [r.ps for r in mt.read(where=[("ps", ">", 9.5)]).collect()] == ["10"]
        # same-type string predicate prunes exactly
        assert mt.prune_stats([("ps", "=", "9")]) == (1, 2)

    def test_null_partition_value(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a"), (2, None)], "id int, ps string"
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["ps"])
        assert mt.prune_stats([("ps", "is_null")]) == (1, 2)
        assert mt.prune_stats([("ps", "not_null")]) == (1, 2)
        assert mt.prune_stats([("ps", "=", "a")]) == (1, 2)
        assert mt.read(where=[("ps", "is_null")]).count() == 1
        assert mt.read(where=[("ps", "=", "a")]).count() == 1

    def test_date_pcol_prunes_exactly(self, spark, tmp_path):
        d0 = datetime.date(2026, 1, 1)
        df = spark.createDataFrame(
            [(i, d0 + datetime.timedelta(days=i % 3)) for i in range(9)],
            "id int, pd date",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pd"])
        # dates carry no conversion-frame slack: exact pruning
        assert mt.prune_stats([("pd", "=", d0)]) == (1, 3)
        assert mt.prune_stats([("pd", ">", d0)]) == (2, 3)
        assert mt.read(where=[("pd", "=", d0)]).count() == 3

    def test_timestamp_pcol_gets_tz_slack(self, spark, tmp_path):
        t0 = datetime.datetime(2026, 1, 10, 12, 0)
        df = spark.createDataFrame(
            [(i, t0 + datetime.timedelta(days=7 * (i % 2))) for i in range(4)],
            "id int, pts timestamp",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pts"])
        # within the ±2 day slack of the other partition's value: kept
        assert mt.prune_stats([("pts", "=", t0 + datetime.timedelta(days=6))]) == (1, 2)
        # far from both: pruned
        assert mt.prune_stats([("pts", "=", t0 + datetime.timedelta(days=70))]) == (0, 2)
        # correctness unaffected either way
        assert mt.read(where=[("pts", "=", t0)]).count() == 2

    def test_ntz_pcol_never_prunes(self, spark, tmp_path):
        t0 = datetime.datetime(2026, 1, 10, 12, 0)
        df = spark.createDataFrame(
            [(1, t0), (2, t0 + datetime.timedelta(days=30))],
            "id int, pn timestamp_ntz",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pn"])
        # session-tz coercion is invisible driver-side: no pruning
        assert mt.prune_stats([("pn", "=", t0)]) == (2, 2)
        assert mt.read(where=[("pn", "=", t0)]).count() == 1

    def test_pre_values_entry_kept(self, mt):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _entry_may_match,
        )

        # a manifest shape without key values cannot prune on pcols
        entry = {"key": "x", "dir": "d"}
        assert _entry_may_match(entry, [("pt", "=", 3)], ["pt"])


def _mk_multifile_table(spark, path, rows=400, per_file=25):
    """A 4-partition table with v-blocked files per dir: one writer
    task, sorted by (pt, v, id), rolled every ``per_file`` records —
    the alias-aware output ordering means partitionBy(_p_pt) adds no
    re-sort, so file j of a dir covers the j-th v-block exactly."""
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(per_file))
    try:
        df = (
            spark.range(rows)
            .select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 4).cast("int").alias("pt"),
                F.col("id").cast("double").alias("v"),
            )
            .repartition(1)
            .sortWithinPartitions("pt", "v", "id")
        )
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        return mt
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")


class TestPerFileStats:
    """r12 verdict item 3: per-file min/max bounds captured at commit
    (same single aggregation, keyed by input_file_name) let
    read(where=) select FILES within surviving partitions."""

    def test_file_bounds_recorded_and_fold_to_entry(self, spark, tmp_path):
        mt = _mk_multifile_table(spark, str(tmp_path / "t"))
        e0 = mt.manifest()["entries"][0]
        files = e0["files"]
        assert len(files) == 4
        assert sum(st["rows"] for st in files.values()) == e0["stats"]["rows"]
        mns = sorted(float(st["cols"]["v"]["mn"][1]) for st in files.values())
        mxs = sorted(float(st["cols"]["v"]["mx"][1]) for st in files.values())
        assert float(e0["stats"]["cols"]["v"]["mn"][1]) == mns[0]
        assert float(e0["stats"]["cols"]["v"]["mx"][1]) == mxs[-1]

    def test_file_pruned_read_equals_plain(self, spark, tmp_path):
        mt = _mk_multifile_table(spark, str(tmp_path / "t"))
        w = [("v", ">=", 300.0)]
        ps = mt.prune_file_stats(w)
        assert ps["files_total"] == 16
        assert ps["files_scanned"] == 4  # last v-block of each dir
        assert ps["entries_without_file_stats"] == 0
        pruned = mt.read(where=w)
        assert len(pruned.inputFiles()) == 4
        got = sorted(r.id for r in pruned.collect())
        want = sorted(
            r.id for r in mt.read().filter(F.col("v") >= 300.0).collect()
        )
        assert got == want and len(got) == 100

    def test_column_spelling_prunes_files(self, spark, tmp_path):
        mt = _mk_multifile_table(spark, str(tmp_path / "t"))
        pred = (F.col("v") >= 300.0) & (F.col("pt") == 2)
        pruned = mt.read(where=pred)
        assert len(pruned.inputFiles()) == 1
        assert pruned.count() == 25

    def test_single_file_partition_has_no_files_key(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(10)],
            "id int, pt int, v double",
        ).repartition(1)
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        for e in mt.manifest()["entries"]:
            assert "files" not in e  # zero information: not stored
        # and reads still work (whole-dir scan)
        assert mt.read(where=[("v", ">=", 4.0)]).count() == 6

    def test_file_cap_skips_per_file_stats(self, spark, tmp_path, monkeypatch):
        from fbg_kafka_stream_file_transfer_spark.operators import (
            table as table_mod,
        )

        monkeypatch.setattr(table_mod, "_FILE_STATS_MAX", 2)
        mt = _mk_multifile_table(spark, str(tmp_path / "t"))  # 4 files/dir
        for e in mt.manifest()["entries"]:
            assert "files" not in e
        # degrades to dir scans, never to missing rows
        assert mt.read(where=[("v", ">=", 300.0)]).count() == 100

    def test_nulls_and_nan_in_file_bounds(self, spark, tmp_path):
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "2")
        try:
            rows = [
                (0, 0, None),
                (1, 0, None),
                (2, 0, float("nan")),
                (3, 0, 5.0),
                (4, 0, -1.0),
                (5, 0, 2.0),
            ]
            df = (
                spark.createDataFrame(rows, "id int, pt int, v double")
                .repartition(1)
                .sortWithinPartitions("pt", "id")
            )
            mt = ManifestTable(spark, str(tmp_path / "t"))
            mt.create(df, ["pt"])
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        e0 = mt.manifest()["entries"][0]
        st = e0["stats"]["cols"]["v"]
        # folded entry bounds: min ignores NaN, max is NaN → unbounded
        # — and an unbounded side OMITS its key entirely (r13 external
        # review: one shape across entry, file, and virtual pcol
        # stats; readers use .get)
        assert st["mn"] == ["float", "-1.0"], st
        assert "mx" not in st, st
        assert st["nulls"] == 2
        for fst in (e0.get("files") or {}).values():
            vcs = fst["cols"]["v"]
            assert None not in vcs.values(), vcs
        # NaN file's max bound is unbounded → every range keeps it;
        # pruned read still equals the plain filter
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        for w in ([("v", ">", 100.0)], [("v", "<", 0.0)], [("v", "is_null")]):
            got = sorted(r.id for r in mt.read(where=w).collect())
            want = sorted(
                r.id
                for r in mt.read()
                .filter(_where_to_filter(_normalize_where(w)))
                .collect()
            )
            assert got == want, (w, got, want)

    def test_merge_preserves_and_refreshes_file_stats(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        mt = _mk_multifile_table(spark, path)
        v1_files = {
            e["key"]: e.get("files", {}) for e in mt.manifest()["entries"]
        }
        # merge touches only pt=1: its entry is rewritten, others keep
        # their v1 file stats verbatim
        delta = spark.createDataFrame(
            [(1001, 1, 9999.0)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, path, delta, ["id"], ["pt"], retain_versions=5
        )
        m2 = mt.manifest()
        for e in m2["entries"]:
            pt = e["values"][0][1]
            if pt != 1:
                assert e.get("files", {}) == v1_files[e["key"]]
        # and the read still prunes correctly across old + new entries
        got = mt.read(where=[("v", ">=", 9000.0)])
        assert [r.id for r in got.collect()] == [1001]

    def test_sharded_manifest_carries_file_stats(self, spark, tmp_path):
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
        try:
            df = (
                spark.range(200)
                .select(
                    F.col("id").cast("int").alias("id"),
                    (F.col("id") % 2).cast("int").alias("pt"),
                    F.col("id").cast("double").alias("v"),
                )
                .repartition(1)
                .sortWithinPartitions("pt", "v", "id")
            )
            mt = ManifestTable(spark, str(tmp_path / "t"), shard_target=1)
            mt.create(df, ["pt"])
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        man = mt.manifest()
        # the table really is sharded (shard_target=1 forces it) and
        # manifest() returned the EXPANDED view
        assert man.get("num_buckets"), man.keys()
        assert man["entry_count"] == len(man["entries"]) == 2
        assert all(len(e.get("files", {})) == 4 for e in man["entries"])
        pruned = mt.read(where=[("v", ">=", 150.0)])
        assert len(pruned.inputFiles()) == 2
        assert pruned.count() == 50

    def test_prune_file_stats_reports_unknown_entries(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(10)],
            "id int, pt int, v double",
        ).repartition(1)
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        ps = mt.prune_file_stats([("v", ">=", 0.0)])
        assert ps["entries_without_file_stats"] == 2
        assert ps["files_total"] == 0


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from tests.test_r11_ops import _clause  # noqa: E402

_mf_fuzz = {}


def _mf_fuzz_mt(spark, tmp_path_factory):
    """Multi-file twin of the r11 stats-fuzz table: same adversarial
    values, 2 rows per file, so every soundness property also covers
    the per-FILE pruning path."""
    if "mt" not in _mf_fuzz:
        root = tmp_path_factory.mktemp("fstats_fuzz")
        rows = [
            (0, 0, -(2**62), float("nan"), None),
            (1, 0, -1, float("-inf"), ""),
            (2, 0, 0, -0.0, "a"),
            (3, 1, 7, 1.5, "Z" * 100),
            (4, 1, 2**53 + 1, float("inf"), "héllo"),
            (5, 2, 2**63 - 2, 9.9e17, "é中"),
            (6, 2, None, None, None),
            (7, 0, 3, 2.5, "m"),
            (8, 1, -(2**40), -3.5, "0"),
            (9, 2, 41, 0.25, "zz"),
        ]
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "2")
        try:
            df = (
                spark.createDataFrame(
                    rows, "id int, pt int, i long, f double, s string"
                )
                .repartition(1)
                .sortWithinPartitions("pt", "id")
            )
            mt = ManifestTable(spark, str(root / "t"))
            mt.create(df, ["pt"])
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        assert any("files" in e for e in mt.manifest()["entries"])
        _mf_fuzz["mt"] = mt
    return _mf_fuzz["mt"]


class TestFilePruningSoundnessFuzz:
    """Property: per-file pruning may only skip work, never change
    results — for ANY where-conjunction (cross-type values included),
    the file-pruned read equals the plain filter."""

    @given(where=st.lists(_clause(), min_size=1, max_size=3))
    @settings(
        max_examples=25, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_file_pruned_read_equals_plain_filter(
        self, spark, tmp_path_factory, where
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        mt = _mf_fuzz_mt(spark, tmp_path_factory)
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


class TestChangesWherePassthrough:
    """r12 verdict item 7: changes() accepts the same where predicate
    as read(), pruning entries and files on EACH side before listing;
    semantically identical to changes().filter(where)."""

    @pytest.fixture()
    def mt(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(40)],
            "id int, pt int, v double",
        )
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        # v2 touches pt=1 (update id=5's v) and pt=2 (insert id=100)
        delta = spark.createDataFrame(
            [(5, 1, 500.0), (100, 2, 100.0)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, path, delta, ["id"], ["pt"], retain_versions=5
        )
        return mt

    def test_pruned_changes_equals_filtered_full(self, mt):
        full = mt.changes(1).filter(F.col("pt") == 1)
        pruned = mt.changes(1, where=[("pt", "=", 1)])
        key = lambda r: (r.id, r.pt, r.v, r._change_type)  # noqa: E731
        assert sorted(map(key, pruned.collect())) == sorted(
            map(key, full.collect())
        )
        # the update shows as delete(old)+insert(new)
        assert pruned.count() == 2

    def test_column_spelling_and_prune_info(self, mt):
        info = {}
        got = mt.changes(1, where=F.col("pt") == 1, prune_info=info)
        assert got.count() == 2
        # both versions' changed-entry sets pruned from 2 to 1
        assert info == {
            "from_entries_total": 2,
            "from_entries_scanned": 1,
            "to_entries_total": 2,
            "to_entries_scanned": 1,
        }

    def test_where_on_stats_column(self, mt):
        # v >= 400 matches only the new side of the update
        rows = mt.changes(1, where=[("v", ">=", 400.0)]).collect()
        assert [(r.id, r._change_type) for r in rows] == [(5, "insert")]

    def test_where_on_column_added_in_to_version(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, 0, 1.0), (2, 1, 2.0)], "id int, pt int, v double"
        )
        mt = ManifestTable(spark, path)
        mt.create(df, ["pt"])
        evolved = spark.createDataFrame(
            [(1, 0, 1.0, None), (3, 0, 3.0, "x")],
            "id int, pt int, v double, tag string",
        )
        mt.overwrite_partitions(evolved, [(0,)])
        # tag doesn't exist at v1: from-side prunes nothing on it, the
        # exact post-alignment filter decides (old rows align to NULL)
        rows = mt.changes(1, where=[("tag", "=", "x")]).collect()
        assert [(r.id, r._change_type) for r in rows] == [(3, "insert")]
        # is_null on tag keeps the old-side rows of the touched entry
        got = mt.changes(1, where=[("tag", "is_null")])
        full = mt.changes(1).filter(F.col("tag").isNull())
        key = lambda r: (r.id, r._change_type)  # noqa: E731
        assert sorted(map(key, got.collect())) == sorted(
            map(key, full.collect())
        )

    def test_file_pruning_inside_changes(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        mt = _mk_multifile_table(spark, path)  # 4 dirs x 4 v-blocks
        delta = spark.createDataFrame(
            [(1001, 1, 50.0)], "id int, pt int, v double"
        )
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
        try:
            merge_into_partitioned(
                spark, path, delta, ["id"], ["pt"], retain_versions=5
            )
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        # only pt=1 changed; v < 60 selects the first v-block files of
        # each side, not each side's whole directory
        got = mt.changes(1, where=[("v", "=", 50.0)])
        assert [(r.id, r._change_type) for r in got.collect()] == [
            (1001, "insert")
        ]
        # both sides' scans list a strict subset of the changed dirs'
        # files (4 v1 files + >=4 v2 files exist for pt=1)
        assert len(got.inputFiles()) < 8


class TestCodeReviewR12Findings:
    """Regression pins for the r12 code-review pass on the round's
    new machinery."""

    def test_decimal_nan_predicate_never_prunes_or_crashes(
        self, spark, tmp_path
    ):
        """Decimal('NaN') must hit the same never-prune guard as float
        NaN: it previously CRASHED pruning against int/str bounds
        (decimal.InvalidOperation) and silently PRUNED against float
        bounds via the double-space cast."""
        import decimal

        df = spark.createDataFrame(
            [(1, 0, 5, 1.5, "a")], "id int, pt int, i long, f double, s string"
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        dnan = decimal.Decimal("NaN")
        for col in ("i", "f", "s"):
            assert mt.prune_stats([(col, ">", dnan)]) == (1, 1), col
            assert mt.prune_stats([(col, "in", [dnan])]) == (1, 1), col
        # the residual filter is the correctness story: both the
        # pruned and plain paths fail the SAME loud way (F.lit cannot
        # encode Decimal NaN), never a silent empty result
        for fn in (
            lambda: mt.read(where=[("f", ">", dnan)]).count(),
            lambda: mt.read()
            .filter(F.col("f") > F.lit(dnan))
            .count(),
        ):
            with pytest.raises(Exception):  # noqa: B017 — parity pin
                fn()

    def test_poll_larger_than_wait_respects_deadline(
        self, spark, tmp_path
    ):
        """poll_seconds > wait_seconds must not overshoot the caller's
        wait budget by a full poll interval."""
        import time

        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ConcurrentWriterError,
            table_write_lock,
        )

        path = str(tmp_path / "t")
        os.makedirs(path)
        with open(f"{path}/_lock", "w") as f:
            json.dump({"holder": "other", "token": "tX"}, f)
        t0 = time.monotonic()
        with pytest.raises(ConcurrentWriterError):
            with table_write_lock(
                spark, path, holder="me",
                wait_seconds=0.5, poll_seconds=60.0,
            ):
                pass
        assert time.monotonic() - t0 < 5.0

    def test_prune_file_stats_mirrors_read_selection(self, spark, tmp_path):
        """The observability counts and the actual scan come from ONE
        shared selection implementation — pin they agree on a mixed
        workload (entry-pruned + file-pruned + whole-dir entries)."""
        mt = _mk_multifile_table(spark, str(tmp_path / "t"))
        for w in (
            [("v", ">=", 300.0)],
            [("v", "between", (110.0, 130.0)), ("pt", "in", [1, 2])],
            [("pt", "=", 0)],
        ):
            ps = mt.prune_file_stats(w)
            df = mt.read(where=w)
            n_files = len(df.inputFiles())
            # whole-dir entries contribute their real file count via
            # the filesystem listing; here every entry carries stats
            assert ps["entries_without_file_stats"] == 0
            assert n_files == ps["files_scanned"], (w, ps, n_files)


_chg_fuzz = {}


def _chg_fuzz_mt(spark, tmp_path_factory):
    """changes(where=) fuzz fixture: the multi-file adversarial table
    plus one merge (v2) that updates, inserts, and leaves rows alone
    across partitions — so the diff has both sides populated."""
    if "mt" not in _chg_fuzz:
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        root = tmp_path_factory.mktemp("chg_fuzz")
        rows = [
            (0, 0, -(2**62), float("nan"), None),
            (1, 0, -1, float("-inf"), ""),
            (2, 0, 0, -0.0, "a"),
            (3, 1, 7, 1.5, "Z" * 100),
            (4, 1, 2**53 + 1, float("inf"), "héllo"),
            (5, 2, 2**63 - 2, 9.9e17, "é中"),
            (6, 2, None, None, None),
            (7, 0, 3, 2.5, "m"),
            (8, 1, -(2**40), -3.5, "0"),
            (9, 2, 41, 0.25, "zz"),
        ]
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "2")
        try:
            df = (
                spark.createDataFrame(
                    rows, "id int, pt int, i long, f double, s string"
                )
                .repartition(1)
                .sortWithinPartitions("pt", "id")
            )
            mt = ManifestTable(spark, str(root / "t"))
            mt.create(df, ["pt"])
            delta = spark.createDataFrame(
                [
                    (2, 0, 17, 0.5, "updated"),   # update in pt=0
                    (20, 1, 99, 1.25, "new"),     # insert in pt=1
                ],
                "id int, pt int, i long, f double, s string",
            )
            merge_into_partitioned(
                spark, str(root / "t"), delta, ["id"], ["pt"],
                retain_versions=5,
            )
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        _chg_fuzz["mt"] = mt
    return _chg_fuzz["mt"]


class TestChangesWhereSoundnessFuzz:
    """Property: for ANY where-conjunction (cross-type and pcol
    clauses included), changes(1, where=w) returns exactly
    changes(1).filter(w) — per-side pruning and pre-filters may only
    skip work, never change the diff."""

    @given(where=st.lists(_clause(), min_size=1, max_size=3))
    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_pruned_changes_equals_filtered_full(
        self, spark, tmp_path_factory, where
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        mt = _chg_fuzz_mt(spark, tmp_path_factory)
        norm = _normalize_where(where)
        key = lambda r: (r.id, str(r.i), str(r.f), str(r.s), r._change_type)  # noqa: E731
        got = sorted(
            map(key, mt.changes(1, where=where).collect())
        )
        want = sorted(
            map(
                key,
                mt.changes(1)
                .filter(_where_to_filter(norm))
                .collect(),
            )
        )
        assert got == want, (where, got, want)

    @given(where=st.lists(_clause(), min_size=1, max_size=2))
    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_column_spelling_matches_tuple_spelling(
        self, spark, tmp_path_factory, where
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        mt = _chg_fuzz_mt(spark, tmp_path_factory)
        norm = _normalize_where(where)
        col = _where_to_filter(norm)
        key = lambda r: (r.id, str(r.i), str(r.f), str(r.s), r._change_type)  # noqa: E731
        got = sorted(map(key, mt.changes(1, where=col).collect()))
        want = sorted(map(key, mt.changes(1, where=where).collect()))
        assert got == want, (where, got, want)


class TestClusteredCompaction:
    """r12: compact(cluster_by=) — the OPTIMIZE ZORDER-lite rewrite
    that makes per-file bounds selective."""

    @pytest.fixture()
    def mt(self, spark, tmp_path):
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
        try:
            df = spark.createDataFrame(
                [(i, i % 4, float(i)) for i in range(400)],
                "id int, pt int, v double",
            ).repartition(4)  # round-robin: every file spans everything
            mt = ManifestTable(spark, str(tmp_path / "t"))
            mt.create(df, ["pt"])
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        return mt

    def test_clustered_rewrite_makes_bounds_selective(self, spark, mt):
        w = [("v", ">=", 300.0)]
        before = mt.prune_file_stats(w)
        # round-robin layout: (nearly) nothing prunes — a stray
        # boundary file may, the layout as a whole must not
        assert before["files_total"] >= 8
        assert before["files_scanned"] >= 0.9 * before["files_total"]
        n = mt.compact(
            cluster_by=["v"], target_records_per_file=25, retain_versions=3
        )
        assert n == 4
        after = mt.prune_file_stats(w)
        assert 0 < after["files_scanned"] < after["files_total"]
        assert (
            after["files_scanned"] / after["files_total"]
            < 0.9 * before["files_scanned"] / before["files_total"]
        )
        # data unchanged: the diff across the compaction is empty and
        # the pruned read equals the plain filter
        assert mt.changes(1, 2).count() == 0
        got = sorted(r.id for r in mt.read(where=w).collect())
        want = sorted(
            r.id for r in mt.read().filter(F.col("v") >= 300.0).collect()
        )
        assert got == want and len(got) == 100
        # the maxRecordsPerFile override is restored afterwards
        assert spark.conf.get("spark.sql.files.maxRecordsPerFile") == "0"

    def test_unknown_cluster_column_raises(self, mt):
        with pytest.raises(ValueError, match="cluster_by"):
            mt.compact(cluster_by=["nope"])

    def test_conf_override_restored_to_prior_value(self, spark, mt):
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "777")
        try:
            mt.compact(cluster_by=["v"], target_records_per_file=25)
            assert (
                spark.conf.get("spark.sql.files.maxRecordsPerFile") == "777"
            )
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")

    def test_plain_compact_unchanged(self, mt):
        # no cluster_by: the r12 params default off, same behavior
        assert mt.compact(retain_versions=3) == 4
        assert mt.changes(1, 2).count() == 0


class TestFilteredChangesTail:
    """r12: start_table_changes_tail(where=) is a FILTERED
    subscription — the folded feed equals the filtered table state,
    with the predicate applied to the snapshot bootstrap AND every
    per-version diff."""

    def _run(self, spark, tmp_path, where):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        base = spark.createDataFrame(
            [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3"), (4, "c", "x4")],
            "id int, pt string, v string",
        )
        mt.create(base, ["pt"])
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / "ckpt"),
            where=where,
        )
        try:
            q.processAllAvailable()  # v1 snapshot (filtered)
            upd = spark.createDataFrame(
                [(1, "a", "X1", "U"), (3, "b", "x3", "D"), (9, "c", "x9", "U")],
                "id int, pt string, v string, op string",
            )
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op"
            )
            q.processAllAvailable()  # v2 diff (filtered)
        finally:
            q.stop()
        return mt

    def _feed(self, spark, tmp_path, path):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
        )

        feed = read_changes_feed(spark, path, str(tmp_path / "feed"))
        return sorted(
            (r._commit_version, r.id, r.pt, r.v, r._change_type)
            for r in feed.collect()
        )

    def test_pcol_filtered_feed(self, spark, tmp_path):
        mt = self._run(spark, tmp_path, [("pt", "=", "a")])
        rows = self._feed(spark, tmp_path, mt.path)
        # only partition 'a' ever appears; the v2 update shows as
        # delete(old)+insert(new); pt=b's delete and pt=c's insert
        # are outside the subscription
        assert rows == [
            (1, 1, "a", "x1", "insert"),
            (1, 2, "a", "x2", "insert"),
            (2, 1, "a", "X1", "insert"),
            (2, 1, "a", "x1", "delete"),
        ]

    def test_folded_feed_equals_filtered_table(self, spark, tmp_path):
        mt = self._run(spark, tmp_path, F.col("id") >= 2)
        rows = self._feed(spark, tmp_path, mt.path)
        # fold the feed: apply inserts minus deletes in version order
        state: dict = {}
        for _ver, rid, pt, v, kind in rows:
            k = (rid, pt, v)
            state[k] = state.get(k, 0) + (1 if kind == "insert" else -1)
        folded = sorted(k for k, n in state.items() if n > 0)
        want = sorted(
            (r.id, r.pt, r.v)
            for r in mt.read().filter(F.col("id") >= 2).collect()
        )
        assert folded == want


class TestPcolPruningCompletes:
    """pcol where-pruning over the r10 hard cases: multi-level keys
    and filesystem-hostile partition values."""

    def test_second_level_pcol_clause_prunes(self, spark, tmp_path):
        df = spark.createDataFrame(
            [
                (i, ["A", "B"][i % 2], ["x", "y", "z"][i % 3], float(i))
                for i in range(30)
            ],
            "id int, p1 string, p2 string, v double",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["p1", "p2"])  # 6 entries
        assert mt.prune_stats([("p2", "=", "y")]) == (2, 6)
        assert mt.prune_stats([("p1", "=", "A"), ("p2", "=", "y")]) == (1, 6)
        a = sorted(
            r.id
            for r in mt.read(
                where=[("p1", "=", "A"), ("p2", "=", "y")]
            ).collect()
        )
        b = sorted(r.id for r in mt.read(partitions=[("A", "y")]).collect())
        assert a == b and a

    def test_tricky_partition_values_prune_exactly(self, spark, tmp_path):
        vals = ["plain", "has space", "a#b", "a/b", "=eq", "dot.."]
        df = spark.createDataFrame(
            [(i, vals[i % len(vals)]) for i in range(18)],
            "id int, ps string",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["ps"])
        for v in vals:
            assert mt.prune_stats([("ps", "=", v)]) == (1, 6), v
            got = sorted(
                r.id for r in mt.read(where=[("ps", "=", v)]).collect()
            )
            want = sorted(
                r.id for r in mt.read(partitions=[(v,)]).collect()
            )
            assert got == want and len(got) == 3, v
        assert mt.prune_stats([("ps", "in", ["has space", "a/b"])]) == (2, 6)


class TestR12Interactions:
    """Cross-feature pins: the r12 machinery composed with the r11
    staged-commit path and the r10 feed-retention path."""

    def test_file_stats_survive_staged_rename(self, spark, tmp_path):
        """stage_commit captures stats on the STAGING dir; the publish
        renames it to a generation dir — file basenames (the keys of
        the per-file bounds map) must stay valid after the rename,
        including through a rebase over a disjoint winner."""
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        # nullable schema throughout (createDataFrame): the merge path
        # widens nullability, and the rebase's exact-schema check
        # rightly refuses that drift on a range-built non-nullable v1
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
        try:
            df = (
                spark.createDataFrame(
                    [(i, i % 4, float(i)) for i in range(400)],
                    "id int, pt int, v double",
                )
                .repartition(1)
                .sortWithinPartitions("pt", "v", "id")
            )
            mt = ManifestTable(spark, path)
            mt.create(df, ["pt"])
            # stage a multi-file rewrite of pt=0 against v1, no lease
            rewrite = (
                mt.read(partitions=[(0,)])
                .withColumn("v", F.col("v") + 0.5)
                .repartition(1)
                .sortWithinPartitions("pt", "v", "id")
            )
            staged = mt.stage_commit(rewrite, [(0,)], base_version=1)
            # a disjoint winner moves the table to v2 meanwhile
            delta = spark.createDataFrame(
                [(2001, 2, 7777.0)], "id int, pt int, v double"
            )
            merge_into_partitioned(
                spark, path, delta, ["id"], ["pt"], retain_versions=5
            )
            v = mt.commit_staged(staged, retain_versions=5)
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        assert v == 3  # rebase path
        man = mt.manifest()
        e0 = next(e for e in man["entries"] if e["values"][0][1] == 0)
        files = e0.get("files")
        assert files and len(files) == 4
        # the recorded basenames must exist under the RENAMED dir and
        # file pruning through them must agree with the plain filter
        import os

        for n in files:
            assert os.path.exists(f"{path}/{e0['dir']}/{n}"), n
        w = [("v", ">=", 300.0)]
        got = sorted(r.id for r in mt.read(where=w).collect())
        want = sorted(
            r.id for r in mt.read().filter(F.col("v") >= 300.0).collect()
        )
        assert got == want

    def test_filtered_tail_replay_is_idempotent(self, spark, tmp_path):
        """A fresh-checkpoint replay of a FILTERED tail rewrites the
        same deterministic filtered dirs — no duplicates, no widening
        back to the unfiltered diff."""
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
            start_table_changes_tail,
        )

        t = TestFilteredChangesTail()
        mt = t._run(spark, tmp_path, [("pt", "=", "a")])
        first = t._feed(spark, tmp_path, mt.path)
        q = start_table_changes_tail(
            spark, mt.path, str(tmp_path / "feed"), str(tmp_path / "ckpt2"),
            where=[("pt", "=", "a")],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert t._feed(spark, tmp_path, mt.path) == first

    def test_filtered_tail_with_feed_retention(self, spark, tmp_path):
        """where= composes with feed_retain_versions: the pruned,
        filtered feed still folds to the filtered current state for a
        cursor consumer."""
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        base = spark.createDataFrame(
            [(i, ["a", "b"][i % 2], f"x{i}") for i in range(8)],
            "id int, pt string, v string",
        )
        mt.create(base, ["pt"])
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / "ckpt"),
            where=[("pt", "=", "a")], feed_retain_versions=2,
        )
        try:
            q.processAllAvailable()
            for step in range(2):
                upd = spark.createDataFrame(
                    [(step, ["a", "b"][step % 2], f"y{step}", "U")],
                    "id int, pt string, v string, op string",
                )
                merge_into_partitioned(
                    spark, path, upd, ["id"], ["pt"], op_col="op",
                    retain_versions=10,
                )
                q.processAllAvailable()
        finally:
            q.stop()
        # the whole-feed guard still applies to a filtered feed (it
        # was pruned); read the surviving rolling window explicitly
        feed = read_changes_feed(
            spark, path, str(tmp_path / "feed"), allow_pruned_feed=True
        )
        # only pt='a' rows ever appear, across every retained version
        assert feed.filter(F.col("pt") != "a").count() == 0
        # v3 touched pt='b' only: its filtered diff is EMPTY (the dir
        # exists as a zero-row commit, not a missing version)
        assert feed.filter(F.col("_commit_version") == 3).count() == 0
