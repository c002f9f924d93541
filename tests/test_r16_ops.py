"""Round 16: cast safety for the DML/MERGE family (the r15 verdict's
confirmed silent-corruption bug — with ANSI off the merge alignment
cast WRAPPED a wider-typed delta column), stored-type WIDENING via
``schema_evolution=True`` (zero-rewrite, Spark 4 parquet widening
reads), the widened change-feed contract, the reclaim-vs-optimistic
race, and the r16 advisor items (inert ``compact_cluster_by``,
``carry_files`` ⊆ touched, ``add_columns`` DDL parsing).

Reference parity notes: extends the batch side of the reference's
effectively-once sink contract (SURVEY §2.f ST1,
camel-integration file-pipeline.yaml) — the reference never narrows a
payload field silently; neither may the merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    _cast_class,
    _parquet_widen_ok,
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.operators.table import (
    ConcurrentWriterError,
    ManifestTable,
)

from test_r15_ops import _mk_clustered_stable  # shared fixture

BIG = 2**40 + 7  # out of int range: the r15-verdict repro value


def _mk_int_table(spark, path, n=200, npart=2):
    """Manifest table whose ``v`` column is INT (the narrowing
    target), parquet-roundtripped so the schema is stable-nullable."""
    df = spark.range(0, n).select(
        F.col("id").alias("id"),  # bigint, like every delta below
        (F.col("id") % npart).cast("int").alias("pt"),
        (F.col("id") * 10).cast("int").alias("v"),
    )
    stage = f"{path}__seed"
    df.write.mode("overwrite").parquet(stage)
    mt = ManifestTable(spark, path)
    mt.create(spark.read.parquet(stage), ["pt"])
    return mt


class TestCastClass:
    def _t(self, ddl):
        return T._parse_datatype_string(ddl)

    @pytest.mark.parametrize(
        "src,dst,cls",
        [
            ("int", "int", "identical"),
            ("int", "bigint", "widen"),
            ("byte", "bigint", "widen"),
            ("smallint", "int", "widen"),
            ("bigint", "int", "wrap"),
            ("int", "smallint", "wrap"),
            ("float", "double", "widen"),
            ("double", "float", "wrap"),
            ("int", "double", "widen"),
            ("bigint", "double", "wrap"),  # rounds past 2^53
            ("smallint", "float", "widen"),
            ("int", "float", "wrap"),  # 24-bit mantissa
            ("double", "int", "wrap"),  # truncates + wraps
            ("float", "bigint", "wrap"),
            ("decimal(5,2)", "decimal(10,2)", "widen"),
            ("decimal(5,2)", "decimal(12,4)", "widen"),
            ("decimal(10,2)", "decimal(5,2)", "wrap"),
            ("decimal(10,2)", "decimal(10,4)", "wrap"),  # int digits shrink
            ("int", "decimal(12,2)", "widen"),
            ("int", "decimal(9,2)", "wrap"),  # needs 10 int digits
            ("bigint", "decimal(38,0)", "widen"),
            ("decimal(5,2)", "double", "wrap"),
            ("double", "decimal(20,5)", "wrap"),
            ("date", "timestamp", "widen"),
            ("date", "timestamp_ntz", "widen"),
            ("timestamp", "date", "wrap"),
            ("string", "int", "cross"),
            ("int", "string", "cross"),
            ("boolean", "int", "cross"),
            ("timestamp", "timestamp_ntz", "cross"),
        ],
    )
    def test_matrix(self, src, dst, cls, spark):
        assert _cast_class(self._t(src), self._t(dst)) == cls

    def test_parquet_widen_pairs(self, spark):
        ok = [
            ("int", "bigint"),
            ("byte", "int"),
            ("smallint", "bigint"),
            ("float", "double"),
            ("int", "double"),
            ("int", "decimal(12,2)"),
            ("decimal(5,2)", "decimal(12,4)"),
            ("bigint", "decimal(38,0)"),
        ]
        no = [
            ("bigint", "int"),  # not widen at all
            ("smallint", "float"),  # widen-class but reader-unoffered
            ("date", "timestamp_ntz"),  # stats-frame exclusion
            ("string", "bigint"),
            ("int", "float"),
        ]
        for s, d in ok:
            assert _parquet_widen_ok(self._t(s), self._t(d)), (s, d)
        for s, d in no:
            assert not _parquet_widen_ok(self._t(s), self._t(d)), (s, d)

    def test_widen_pairs_actually_read(self, spark, tmp_path):
        """Every pair _parquet_widen_ok claims must be readable by
        THIS runtime's parquet readers (vectorized on) — the
        zero-rewrite widening contract's load-bearing fact."""
        p = str(tmp_path / "wp")
        spark.sql(
            "select cast(3 as byte) b, cast(7 as int) i,"
            " cast(2.5 as float) f, cast(12.34 as decimal(5,2)) d"
        ).write.parquet(p)
        wide = (
            "b bigint, i decimal(12,2), f double, d decimal(12,4)"
        )
        row = spark.read.schema(wide).parquet(p).collect()[0]
        assert (row["b"], row["f"]) == (3, 2.5)
        assert str(row["i"]) == "7.00" and str(row["d"]) == "12.3400"


class TestMergeNarrowingRefusal:
    """The headline r16 fix: a delta column WIDER than the stored
    column must never align via a silent ANSI-off down-cast."""

    def _delta(self, spark, v=BIG):
        return spark.createDataFrame(
            [(3, 1, v)], "id bigint, pt int, v bigint"
        )

    def test_locked_manifest_refuses_pre_commit(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="wraps/truncates"):
            merge_into_partitioned(
                spark, mt.path, self._delta(spark), ["id"], ["pt"]
            )
        assert mt.current_version() == 1
        assert mt.read().filter("id = 3").collect()[0]["v"] == 30

    def test_refusal_names_the_widen_recipe(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="schema_evolution=True"):
            merge_into_partitioned(
                spark, mt.path, self._delta(spark), ["id"], ["pt"]
            )

    def test_cross_family_refuses_without_widen_recipe(
        self, spark, tmp_path
    ):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(3, 1, "oops")], "id bigint, pt int, v string"
        )
        with pytest.raises(ValueError, match="NULLs unconvertible"):
            merge_into_partitioned(spark, mt.path, delta, ["id"], ["pt"])
        assert mt.current_version() == 1

    def test_optimistic_refuses(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="wraps/truncates"):
            merge_into_partitioned(
                spark, mt.path, self._delta(spark), ["id"], ["pt"],
                optimistic=True,
            )
        assert mt.current_version() == 1

    def test_plain_hive_refuses(self, spark, tmp_path):
        p = str(tmp_path / "plain")
        spark.range(0, 20).select(
            F.col("id").alias("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 10).cast("int").alias("v"),
        ).write.partitionBy("pt").parquet(p)
        with pytest.raises(ValueError, match="hive layout"):
            merge_into_partitioned(
                spark, p, self._delta(spark), ["id"], ["pt"]
            )
        assert (
            spark.read.parquet(p).filter("id = 3").collect()[0]["v"]
            == 30
        )

    def test_plain_partition_col_stays_exempt(self, spark, tmp_path):
        """The plain path's documented reason for aligning at all:
        directory-name inference retypes partition columns. A delta
        whose pt is BIGINT (vs inferred int) must still merge."""
        p = str(tmp_path / "plain")
        spark.range(0, 20).select(
            F.col("id").alias("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 10).cast("int").alias("v"),
        ).write.partitionBy("pt").parquet(p)
        delta = spark.createDataFrame(
            [(3, 1, 999)], "id bigint, pt bigint, v int"
        )
        merge_into_partitioned(spark, p, delta, ["id"], ["pt"])
        assert (
            spark.read.parquet(p).filter("id = 3").collect()[0]["v"]
            == 999
        )

    def test_conditional_mode_alignment_refuses(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="wraps/truncates"):
            merge_into_partitioned(
                spark, mt.path, self._delta(spark), ["id"], ["pt"],
                when_matched_update={"v": "s.v"},
            )
        assert mt.current_version() == 1

    def test_explicit_cast_opts_in(self, spark, tmp_path):
        """Casting the delta explicitly makes the alignment an
        identity — the documented lossy-intent recipe."""
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = self._delta(spark).withColumn(
            "v", F.col("v").cast("int")
        )
        merge_into_partitioned(spark, mt.path, delta, ["id"], ["pt"])
        got = mt.read().filter("id = 3").collect()[0]["v"]
        assert got == 7  # the wrap, now explicit and chosen

    def test_widen_class_delta_still_merges(self, spark, tmp_path):
        """An int delta column into an int stored column (identical)
        and a smallint delta into int stored (widen) keep working —
        only wrap/cross refuse."""
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(3, 1, 777)], "id bigint, pt int, v smallint"
        )
        merge_into_partitioned(spark, mt.path, delta, ["id"], ["pt"])
        assert mt.read().filter("id = 3").collect()[0]["v"] == 777


class TestMergeTypeWidening:
    def test_blind_widen_end_to_end(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(3, 1, BIG), (201, 1, BIG + 1)],
            "id bigint, pt int, v bigint",
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            schema_evolution=True, retain_versions=5,
        )
        assert mt.current_version() == 2
        cur = mt.read()
        assert cur.schema["v"].dataType.simpleString() == "bigint"
        byid = {r["id"]: r["v"] for r in cur.collect()}
        assert byid[3] == BIG and byid[201] == BIG + 1
        # survivors in the touched partition and every untouched
        # partition read back exact through the wide schema
        assert byid[5] == 50 and byid[4] == 40
        assert len(byid) == 201
        # time travel keeps the narrow shape
        old = mt.read(version=1)
        assert old.schema["v"].dataType.simpleString() == "int"
        assert old.count() == 200
        # stats-pruned point read through pre-widen (narrow) bounds
        got = mt.read(where=[("v", ">=", BIG)]).collect()
        assert sorted(r["id"] for r in got) == [3, 201]

    def test_ordered_mode_widens(self, spark, tmp_path):
        delta = spark.createDataFrame(
            [(3, 1, BIG, 99.0, "U"), (7, 1, 0, 99.0, "D")],
            "id bigint, pt int, v bigint, ts double, op string",
        )
        # ordered merge needs a ts col in the table: add one narrow
        mt2 = ManifestTable(spark, str(tmp_path / "t2"))
        df = spark.range(0, 50).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 10).cast("int").alias("v"),
            F.lit(1.0).alias("ts"),
        )
        stage = str(tmp_path / "seed2")
        df.write.parquet(stage)
        mt2.create(spark.read.parquet(stage), ["pt"])
        merge_into_partitioned(
            spark, mt2.path, delta, ["id"], ["pt"],
            op_col="op", ts_col="ts", schema_evolution=True,
        )
        cur = {r["id"]: r["v"] for r in mt2.read().collect()}
        assert cur[3] == BIG and 7 not in cur and cur[5] == 50
        assert (
            mt2.read().schema["v"].dataType.simpleString() == "bigint"
        )

    def test_float_to_double_and_decimal_growth(self, spark, tmp_path):
        mt = ManifestTable(spark, str(tmp_path / "t"))
        df = spark.sql(
            "select cast(id as int) id, cast(id % 2 as int) pt,"
            " cast(id * 0.5 as float) f,"
            " cast(id as decimal(5,2)) d from range(40)"
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        mt.create(spark.read.parquet(stage), ["pt"])
        delta = spark.sql(
            "select cast(3 as int) id, cast(1 as int) pt,"
            " cast(1e300 as double) f,"
            " cast(123456789.1234 as decimal(13,4)) d"
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            schema_evolution=True,
        )
        sch = {
            f.name: f.dataType.simpleString()
            for f in mt.read().schema.fields
        }
        assert sch["f"] == "double" and sch["d"] == "decimal(13,4)"
        row = mt.read().filter("id = 3").collect()[0]
        assert row["f"] == 1e300
        assert str(row["d"]) == "123456789.1234"
        # survivors exact through the widened read
        other = mt.read().filter("id = 5").collect()[0]
        assert other["f"] == 2.5 and str(other["d"]) == "5.0000"

    def test_widen_composes_with_file_granular_carry(
        self, spark, tmp_path
    ):
        """A point-key wide upsert into a clustered partition still
        carries the untouched files — they keep narrow bytes and read
        back exact through the wide manifest schema."""
        mt2 = ManifestTable(spark, str(tmp_path / "t2"))
        df = spark.range(0, 1000).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 10).cast("int").alias("v"),
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        back = (
            spark.read.parquet(stage)
            .repartitionByRange(8, "pt", "id")
            .sortWithinPartitions("pt", "id")
        )
        mt2.create(back, ["pt"])
        e1 = next(
            e
            for e in mt2.manifest()["entries"]
            if e["values"] == [["int", 1]]
        )
        nfiles = len(e1["files"])
        assert nfiles >= 2
        delta = spark.createDataFrame(
            [(3, 1, BIG)], "id bigint, pt int, v bigint"
        )
        merge_into_partitioned(
            spark, mt2.path, delta, ["id"], ["pt"],
            schema_evolution=True,
        )
        e1b = next(
            e
            for e in mt2.manifest()["entries"]
            if e["values"] == [["int", 1]]
        )
        carried = [k for k in e1b["files"] if "/" in k]
        assert carried, "expected carried (never-rewritten) files"
        cur = mt2.read().filter("pt = 1")
        byid = {r["id"]: r["v"] for r in cur.collect()}
        assert byid[3] == BIG and byid[5] == 50 and byid[999] == 9990
        assert cur.schema["v"].dataType.simpleString() == "bigint"

    def test_partition_column_never_widens(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(3, BIG, 999)], "id bigint, pt bigint, v int"
        )
        with pytest.raises(ValueError, match="partition column"):
            merge_into_partitioned(
                spark, mt.path, delta, ["id"], ["pt"],
                schema_evolution=True,
            )
        assert mt.current_version() == 1

    def test_widen_plus_new_column_in_one_merge(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(3, 1, BIG, "gold")],
            "id bigint, pt int, v bigint, tier string",
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            schema_evolution=True,
        )
        cur = mt.read()
        assert cur.schema["v"].dataType.simpleString() == "bigint"
        assert cur.schema["tier"].dataType.simpleString() == "string"
        assert cur.filter("id = 3").collect()[0]["tier"] == "gold"
        assert cur.filter("tier is not null").count() == 1

    def test_compact_after_widen_folds_clean(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(3, 1, BIG)], "id bigint, pt int, v bigint"
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            schema_evolution=True,
        )
        before = mt.read().orderBy("id").collect()
        mt.compact(partitions=[(0,), (1,)])
        after = mt.read().orderBy("id").collect()
        assert before == after
        assert (
            mt.read().schema["v"].dataType.simpleString() == "bigint"
        )


class TestChangesAcrossWiden:
    def test_feed_emits_wide_schema(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(3, 1, BIG)], "id bigint, pt int, v bigint"
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            schema_evolution=True, retain_versions=5,
        )
        d = mt.changes(1, 2)
        assert d.schema["v"].dataType.simpleString() == "bigint"
        rows = {
            (r["id"], r["_change_type"]): r["v"] for r in d.collect()
        }
        # the upserted key: one delete of the narrow old row (read
        # up-cast), one insert of the wide new row
        assert rows[(3, "delete")] == 30
        assert rows[(3, "insert")] == BIG
        assert len(rows) == 2

    def test_feed_spans_widen_plus_later_dml(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        merge_into_partitioned(
            spark, mt.path,
            spark.createDataFrame(
                [(3, 1, BIG)], "id bigint, pt int, v bigint"
            ),
            ["id"], ["pt"], schema_evolution=True, retain_versions=6,
        )
        mt.delete_where([("id", "=", 8)], retain_versions=6)
        d = mt.changes(1, 3)
        rows = {
            (r["id"], r["_change_type"]): r["v"] for r in d.collect()
        }
        assert rows[(8, "delete")] == 80
        assert rows[(3, "insert")] == BIG
        assert len(rows) == 3

    def test_non_widening_retype_still_refuses(self, spark, tmp_path):
        """Only supported widenings cross the boundary; any other
        type change (here: a manifest whose stored type moved in a
        non-widening direction) still raises."""
        import json
        import os

        mt = _mk_int_table(spark, str(tmp_path / "t"))
        merge_into_partitioned(
            spark, mt.path,
            spark.createDataFrame(
                [(3, 1, BIG)], "id bigint, pt int, v bigint"
            ),
            ["id"], ["pt"], schema_evolution=True, retain_versions=5,
        )
        # simulate an out-of-band narrow change: rewrite v2's manifest
        # so v reads 'string' — a cross-family retype
        mdir = os.path.join(mt.path, "_manifests")
        [mfile] = [
            f for f in os.listdir(mdir) if f == "v00000002.json"
        ]
        p = os.path.join(mdir, mfile)
        with open(p) as fh:
            man = json.load(fh)
        for f in man["schema"]["fields"]:
            if f["name"] == "v":
                f["type"] = "string"
        with open(p, "w") as fh:
            json.dump(man, fh)
        crc = os.path.join(mdir, ".v00000002.json.crc")
        if os.path.exists(crc):  # hadoop local-FS checksum sidecar
            os.remove(crc)
        with pytest.raises(ValueError, match="changed type"):
            mt.changes(1, 2)


class TestUpdateWhereWrapGuard:
    def test_wide_set_expression_refuses(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="wraps/truncates"):
            mt.update_where(
                [("id", "=", 3)], {"v": F.lit(BIG).cast("bigint")}
            )
        assert mt.current_version() == 1
        assert mt.read().filter("id = 3").collect()[0]["v"] == 30

    def test_double_into_int_refuses(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="wraps/truncates"):
            mt.update_where([("id", "=", 3)], {"v": "v * 1.5"})
        assert mt.current_version() == 1

    def test_explicit_cast_opts_in(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        mt.update_where(
            [("id", "=", 3)],
            {"v": f"cast({BIG} as int)"},
        )
        assert mt.read().filter("id = 3").collect()[0]["v"] == 7

    def test_widen_class_set_still_works(self, spark, tmp_path):
        """int expression into a double column is lossless — no
        probe, no refusal (the pre-r16 behavior for safe casts)."""
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        r = mt.update_where([("id", "=", 3)], {"v": "7"})
        assert r["rows_updated"] == 1
        assert mt.read().filter("id = 3").collect()[0]["v"] == 7.0

    def test_cross_family_keeps_runtime_probe(self, spark, tmp_path):
        """String expressions: castable values pass (probe finds no
        NULLing row), garbage refuses — the r13 contract, intact."""
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        mt.update_where([("id", "=", 3)], {"v": "'41'"})
        assert mt.read().filter("id = 3").collect()[0]["v"] == 41
        with pytest.raises(ValueError, match="do not cast cleanly"):
            mt.update_where([("id", "=", 4)], {"v": "'oops'"})

    def test_conditional_merge_set_wrap_refuses(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame([(3, 1)], "id bigint, pt int")
        with pytest.raises(ValueError, match="wraps/truncates"):
            merge_into_partitioned(
                spark, mt.path, delta, ["id"], ["pt"],
                when_matched_update={
                    "v": f"cast({BIG} as bigint)"
                },
            )
        assert mt.current_version() == 1

    def test_conditional_merge_explicit_cast_opts_in(
        self, spark, tmp_path
    ):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame([(3, 1)], "id bigint, pt int")
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            when_matched_update={"v": f"cast({BIG} as int)"},
        )
        assert mt.read().filter("id = 3").collect()[0]["v"] == 7


class TestReclaimOptimisticRace:
    """r15 verdict #6: an ARMED reclaim compact racing an optimistic
    staged publish on the same carrying partition. The lease
    serializes the publishes; the rebase's whole-entry identity check
    must turn the loser into a loud conflict, never a lost carried
    ref or a resurrected generation."""

    def _carrying_table(self, spark, path):
        mt = _mk_clustered_stable(spark, path, n=1000, npart=2)
        # a pt-scoped point fg delete plants carried refs in
        # partition 1 ONLY (without the pt clause the id-bounds of
        # one file per partition admit id=3 and BOTH carry)
        mt.delete_where([("pt", "=", 1), ("id", "=", 3)])
        rep = {
            r["values"]: r["carried"]
            for r in mt.small_file_report()
        }
        assert rep[(1,)] >= 1 and rep[(0,)] == 0
        return mt

    def test_compact_between_stage_and_publish_conflicts(
        self, spark, tmp_path
    ):
        mt = self._carrying_table(spark, str(tmp_path / "t"))
        base = mt.current_version()
        # stage an optimistic fg-style rewrite of partition 1
        df = mt.read(partitions=[(1,)]).withColumn(
            "v", F.col("v") + 1
        )
        token = mt.stage_commit(df, touched=[(1,)], base_version=base)
        # the armed reclaim sweeps the SAME carrying partition and
        # wins the lease first
        assert mt.compact(min_carried=1) >= 1
        folded = mt.read().orderBy("id").collect()
        with pytest.raises(ConcurrentWriterError):
            mt.commit_staged(token)
        # loser aborted: the fold survives untouched, refs clean
        assert mt.read().orderBy("id").collect() == folded
        assert all(
            r["carried"] == 0 for r in mt.small_file_report()
        )
        mt.abort_staged(token)

    def test_compact_first_then_stage_succeeds(self, spark, tmp_path):
        mt = self._carrying_table(spark, str(tmp_path / "t"))
        assert mt.compact(min_carried=1) >= 1
        base = mt.current_version()
        df = mt.read(partitions=[(1,)]).withColumn(
            "v", F.col("v") + 1
        )
        token = mt.stage_commit(df, touched=[(1,)], base_version=base)
        mt.commit_staged(token)
        got = mt.read().filter("id = 5").collect()[0]["v"]
        assert got == 6.0
        assert all(
            r["carried"] == 0 for r in mt.small_file_report()
        )

    def test_disjoint_partition_rebase_still_proceeds(
        self, spark, tmp_path
    ):
        """The reclaim sweeping ONLY partition 1 must not fail a
        staged commit touching only partition 0."""
        mt = self._carrying_table(spark, str(tmp_path / "t"))
        base = mt.current_version()
        df = mt.read(partitions=[(0,)]).withColumn(
            "v", F.col("v") + 1
        )
        token = mt.stage_commit(df, touched=[(0,)], base_version=base)
        assert mt.compact(min_carried=1) >= 1  # sweeps partition 1
        mt.commit_staged(token)  # disjoint → rebases cleanly
        assert mt.read().filter("id = 4").collect()[0]["v"] == 5.0
        assert mt.read().filter("id = 3").count() == 0  # delete kept


class TestAdvisorItems:
    def test_cluster_by_alone_refuses_at_start(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .selectExpr(
                "value as k", "cast(0 as int) pt",
                "cast(timestamp as double) ts", "'U' as op",
            )
        )
        with pytest.raises(ValueError, match="arms nothing"):
            start_changelog_merge_sink(
                spark, src, str(tmp_path / "t"), "k", ["pt"], "ts",
                "op", str(tmp_path / "cp"),
                layout="manifest",
                compact_cluster_by=["k"],
            )

    def test_stage_commit_stray_carry_refuses(self, spark, tmp_path):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        e0 = next(
            e
            for e in mt.manifest()["entries"]
            if e["values"] == [["int", 0]]
        )
        df = mt.read(partitions=[(1,)])
        with pytest.raises(ValueError, match="not in the touched"):
            mt.stage_commit(
                df,
                touched=[(1,)],
                carry_files={
                    e0["key"]: {"files": dict(e0["files"]), "dir": e0["dir"]}
                },
            )
        # no staging husk left behind
        import glob
        import os

        husks = glob.glob(
            os.path.join(mt.path, "_data", ".stage-*")
        )
        assert husks == []

    def test_overwrite_partitions_stray_carry_refuses(
        self, spark, tmp_path
    ):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        e0 = next(
            e
            for e in mt.manifest()["entries"]
            if e["values"] == [["int", 0]]
        )
        df = mt.read(partitions=[(1,)])
        with pytest.raises(ValueError, match="not in the touched"):
            mt.overwrite_partitions(
                df,
                [(1,)],
                carry_files={
                    e0["key"]: {"files": dict(e0["files"]), "dir": e0["dir"]}
                },
            )
        assert mt.current_version() == 1

    def test_add_columns_rejects_malformed_ddl(self, spark, tmp_path):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="not a valid DDL type"):
            mt.add_columns({"x": "int); drop table y; --"})
        with pytest.raises(ValueError, match="not a valid DDL type"):
            mt.add_columns({"x": "notatype"})
        assert mt.current_version() == 1
        mt.add_columns({"x": "decimal(10,2)", "y": "array<string>"})
        sch = {
            f.name: f.dataType.simpleString()
            for f in mt.schema().fields
        }
        assert sch["x"] == "decimal(10,2)"
        assert sch["y"] == "array<string>"


class TestMergeValuePreservationFuzz:
    """The r15 verdict's closing ask: no blind/ordered merge may
    change a stored column's value except through its own matched
    key. Randomized delta types and values; every outcome is either
    a loud refusal (table unchanged) or an exact-value merge."""

    def test_fuzz_alignment_never_corrupts(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        mt = _mk_int_table(spark, str(tmp_path / "t"), n=40)
        baseline = {
            r["id"]: r["v"] for r in mt.read().collect()
        }
        ver = mt.current_version()

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(
            dtype=st.sampled_from(
                ["int", "bigint", "smallint", "double", "string"]
            ),
            val=st.sampled_from(
                [7, 30000, 2**20, 2**40 + 7, -(2**40)]
            ),
            evolve=st.booleans(),
        )
        def check(dtype, val, evolve):
            nonlocal ver
            if dtype == "string":
                delta = spark.createDataFrame(
                    [(3, 1, str(val))], "id bigint, pt int, v string"
                )
            else:
                if dtype == "smallint" and abs(val) >= 2**15:
                    return  # unrepresentable in the delta itself
                if dtype == "int" and abs(val) >= 2**31:
                    return
                pyval = float(val) if dtype == "double" else val
                delta = spark.createDataFrame(
                    [(3, 1, pyval)], f"id bigint, pt int, v {dtype}"
                )
            try:
                merge_into_partitioned(
                    spark, mt.path, delta, ["id"], ["pt"],
                    schema_evolution=evolve,
                )
            except ValueError:
                assert mt.current_version() == ver  # refusal = no-op
                return
            ver = mt.current_version()
            now = {r["id"]: r["v"] for r in mt.read().collect()}
            # the merged key holds EXACTLY the delta value…
            assert now[3] == val, (dtype, val, evolve)
            # …and no other key moved
            for k, v in now.items():
                if k != 3:
                    assert v == baseline[k], (k, dtype, val)
            baseline[3] = val

        check()


def _mk_unclustered_bloom(spark, path, n=4000, files=16, bloom=True):
    """UNCLUSTERED manifest table: scattered md5-string keys, many
    files per partition, every file's key bounds spanning the whole
    keyspace — the uuid-keyed CDC cold-start shape where min/max
    bounds prune nothing."""
    from fbg_kafka_stream_file_transfer_spark.operators.table import (
        ManifestTable,
    )

    df = spark.range(0, n).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        (F.col("id") % 2).cast("int").alias("pt"),
        (F.col("id") * 10).alias("v"),
    )
    stage = f"{path}__seed"
    df.write.mode("overwrite").parquet(stage)
    back = spark.read.parquet(stage).repartition(files)
    mt = ManifestTable(
        spark, path, bloom_cols=["k"] if bloom else None
    )
    mt.create(back, ["pt"])
    return mt


class TestBloomSkipping:
    """Per-file Bloom membership (r16): point DML/reads stay
    file-granular on UNCLUSTERED keys, where bounds degrade to
    partition-granular (r15 verdict's What's-missing #3)."""

    def test_blooms_recorded_per_file(self, spark, tmp_path):
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"))
        man = mt.manifest()
        assert man.get("bloom_cols") == ["k"]
        for e in man["entries"]:
            assert all(
                "bloom" in st and "k" in st["bloom"]
                for st in e["files"].values()
            )

    def test_point_delete_is_file_granular(self, spark, tmp_path):
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"))
        man = mt.manifest()
        total = sum(len(e["files"]) for e in man["entries"])
        target = mt.read().limit(1).collect()[0]["k"]
        r = mt.delete_where([("k", "=", target)])
        assert r["rows_deleted"] == 1
        # bounds alone admit EVERY file (scattered keys); the bloom
        # must cut the rewrite to a strict (tiny) subset
        assert 1 <= r["files_rewritten"] <= 2, r
        assert r["files_rewritten"] + r["files_carried"] < total + 1
        assert mt.read().filter(F.col("k") == target).count() == 0
        assert mt.read().count() == 3999

    def test_no_false_negatives(self, spark, tmp_path):
        """Every PRESENT key's file must admit it — sample broadly."""
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _bloom_may_contain,
        )

        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"), n=1000)
        man = mt.manifest()
        by_dir = {
            e["values"][0][1]: e for e in man["entries"]
        }
        rows = (
            mt.read()
            .withColumn("_f", F.input_file_name())
            .select("k", "pt", "_f")
            .collect()
        )
        for r in rows[::17]:  # every 17th row
            e = by_dir[r["pt"]]
            fn = r["_f"].rsplit("/", 1)[-1]
            st = e["files"][fn]
            assert _bloom_may_contain(st["bloom"]["k"], r["k"]), r

    def test_absent_key_scans_zero_files(self, spark, tmp_path):
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"))
        rep = mt.prune_file_stats([("k", "=", "no-such-key-anywhere")])
        assert rep["files_scanned"] == 0
        assert (
            mt.read(where=[("k", "=", "no-such-key-anywhere")]).count()
            == 0
        )

    def test_property_persists_across_commits(self, spark, tmp_path):
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"))
        target = mt.read().limit(1).collect()[0]["k"]
        mt.delete_where([("k", "=", target)])
        man = mt.manifest()
        assert man.get("bloom_cols") == ["k"]
        # the rewritten file in the touched entry carries a FRESH
        # bloom; carried files keep their old ones
        for e in man["entries"]:
            for st in e["files"].values():
                assert "bloom" in st

    def test_over_cap_files_skip_blooms(self, spark, tmp_path):
        """A file with more distinct keys than the cap records no
        filter (it would saturate) — reads stay correct, just
        bounds-granular."""
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ManifestTable,
        )

        df = spark.range(0, 6000).select(
            F.md5(F.col("id").cast("string")).alias("k"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.col("id").alias("v"),
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        back = spark.read.parquet(stage).repartition(2)  # ~3000/file
        mt = ManifestTable(
            spark, str(tmp_path / "t"), bloom_cols=["k"]
        )
        mt.create(back, ["pt"])
        man = mt.manifest()
        for e in man["entries"]:
            assert all(
                "bloom" not in st for st in e["files"].values()
            )
        k0 = mt.read().limit(1).collect()[0]["k"]
        assert mt.read(where=[("k", "=", k0)]).count() == 1

    def test_merge_point_keys_prune_via_bloom(self, spark, tmp_path):
        """fg MERGE keyset selection ('in' clauses) consults the
        blooms: a 2-key upsert into a 16-file scattered partition
        rewrites ≤ a few files and carries the rest."""
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"))
        two = [
            r["k"]
            for r in mt.read()
            .filter("pt = 1")
            .limit(2)
            .collect()
        ]
        delta = spark.createDataFrame(
            [(k, 1, 777) for k in two], "k string, pt int, v bigint"
        )
        merge_into_partitioned(spark, mt.path, delta, ["k"], ["pt"])
        e1 = next(
            e
            for e in mt.manifest()["entries"]
            if e["values"] == [["int", 1]]
        )
        carried = sum(1 for n in e1["files"] if "/" in n)
        assert carried >= 12, (carried, len(e1["files"]))
        got = {
            r["k"]: r["v"]
            for r in mt.read().filter(F.col("k").isin(two)).collect()
        }
        assert got == {k: 777 for k in two}

    def test_drop_columns_sheds_blooms(self, spark, tmp_path):
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"))
        mt.drop_columns(["k"])
        man = mt.manifest()
        assert man.get("bloom_cols", []) == []
        for e in man["entries"]:
            for st in (e.get("files") or {}).values():
                assert "bloom" not in st

    def test_compact_refreshes_blooms(self, spark, tmp_path):
        mt = _mk_unclustered_bloom(
            spark, str(tmp_path / "t"), n=1000, files=8
        )
        before = mt.read().orderBy("k").collect()
        mt.compact(partitions=[(0,), (1,)])
        assert mt.read().orderBy("k").collect() == before
        man = mt.manifest()
        # compacted files hold ≤ ~500 distinct each → still under the
        # cap → blooms re-recorded for the fresh generation
        for e in man["entries"]:
            fmap = e.get("files") or {}
            assert all("bloom" in st for st in fmap.values())
        k0 = before[0]["k"]
        rep = mt.prune_file_stats([("k", "=", k0)])
        assert rep["files_scanned"] <= 2

    def test_create_time_validation(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ManifestTable,
        )

        df = spark.range(0, 10).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 1.0).alias("d"),
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        back = spark.read.parquet(stage)
        with pytest.raises(ValueError, match="partition column"):
            ManifestTable(
                spark, str(tmp_path / "t1"), bloom_cols=["pt"]
            ).create(back, ["pt"])
        with pytest.raises(ValueError, match="support"):
            ManifestTable(
                spark, str(tmp_path / "t2"), bloom_cols=["d"]
            ).create(back, ["pt"])
        with pytest.raises(ValueError, match="not in table schema"):
            ManifestTable(
                spark, str(tmp_path / "t3"), bloom_cols=["zz"]
            ).create(back, ["pt"])


class TestBloomSinkAndWiden:
    """Cross-feature pins: the CDC sink bootstraps bloom_cols (the
    uuid-keyed cold-start shape the feature targets), and Bloom bits
    stay VALID across an int-family type widening (str(int) renders
    identically at every width, so the salted-md5 positions are
    width-stable)."""

    def test_sink_bootstraps_bloom_property(self, spark, tmp_path):
        import os

        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        table = str(tmp_path / "table")
        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "k string, pt int, v double, ts long, op string"
        b = spark.createDataFrame(
            [(f"key-{i:04d}", i % 2, float(i), 1, "U") for i in range(40)],
            schema,
        )
        tmp = str(tmp_path / "w0")
        b.coalesce(1).write.parquet(tmp)
        pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.rename(f"{tmp}/{pf}", f"{src}/000.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_changelog_merge_sink(
            spark, stream, table, "k", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"), layout="manifest",
            retain_versions=10, bloom_cols=["k"],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        mt = ManifestTable(spark, table)
        man = mt.manifest()
        assert man.get("bloom_cols") == ["k"]
        assert all(
            "bloom" in st
            for e in man["entries"]
            for st in e["files"].values()
        )
        rep = mt.prune_file_stats([("k", "=", "absent-key")])
        assert rep["files_scanned"] == 0

    def test_sink_bloom_requires_manifest(self, spark, tmp_path):
        import os

        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        stream = (
            spark.readStream.schema("k string, pt int, ts long, op string")
            .parquet(src)
        )
        with pytest.raises(ValueError, match="bloom_cols requires"):
            start_changelog_merge_sink(
                spark, stream, str(tmp_path / "t"), "k", ["pt"],
                "ts", "op", str(tmp_path / "ckpt"),
                bloom_cols=["k"],
            )

    def test_bloom_positions_stable_across_widening(
        self, spark, tmp_path
    ):
        """Widen an int bloom column to bigint: old files' filters
        (computed from str(int)) must still answer probes for the
        same keys arriving as Python ints of any width."""
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ManifestTable,
        )

        df = spark.range(0, 400).select(
            F.col("id").alias("rowid"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 3).cast("int").alias("code"),
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        back = spark.read.parquet(stage).repartition(8)
        mt = ManifestTable(
            spark, str(tmp_path / "t"), bloom_cols=["code"]
        )
        mt.create(back, ["pt"])
        # widen code int→bigint via an evolution merge
        merge_into_partitioned(
            spark, mt.path,
            spark.createDataFrame(
                [(9999, 1, BIG)], "rowid bigint, pt int, code bigint"
            ),
            ["rowid"], ["pt"], schema_evolution=True,
        )
        assert (
            mt.schema()["code"].dataType.simpleString() == "bigint"
        )
        assert man_bloom_cols(mt) == ["code"]
        # a pre-widen key probed post-widen: found, file-granular
        assert mt.read(where=[("code", "=", 33)]).count() == 1
        rep = mt.prune_file_stats([("code", "=", 33)])
        assert 0 < rep["files_scanned"] < rep["files_total"]
        # an absent in-range key scans only Bloom false positives
        rep2 = mt.prune_file_stats([("code", "=", 34)])
        assert rep2["files_scanned"] <= 2


def man_bloom_cols(mt):
    return mt.manifest().get("bloom_cols")


class TestAlterColumnType:
    """r16: the explicit metadata-only widening ALTER — zero data
    I/O, empty diff, narrow history reads through the wide schema."""

    def test_widen_metadata_only(self, spark, tmp_path):
        import glob
        import os

        mt = _mk_int_table(spark, str(tmp_path / "t"))
        data_files = glob.glob(
            os.path.join(mt.path, "_data", "**", "*.parquet"),
            recursive=True,
        )
        mtimes = {f: os.path.getmtime(f) for f in data_files}
        v2 = mt.alter_column_type("v", "bigint")
        assert v2 == 2
        assert {
            f: os.path.getmtime(f) for f in data_files
        } == mtimes  # zero data I/O
        assert (
            mt.read().schema["v"].dataType.simpleString() == "bigint"
        )
        assert (
            mt.read(version=1).schema["v"].dataType.simpleString()
            == "int"
        )
        # all values intact through the widening read
        assert mt.read().filter("id = 3").collect()[0]["v"] == 30
        assert mt.read().count() == 200
        # the alter itself diffs to ZERO rows
        assert mt.changes(1, 2).count() == 0

    def test_wide_write_after_alter_needs_no_evolution(
        self, spark, tmp_path
    ):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        mt.alter_column_type("v", "bigint")
        delta = spark.createDataFrame(
            [(3, 1, BIG)], "id bigint, pt int, v bigint"
        )
        merge_into_partitioned(spark, mt.path, delta, ["id"], ["pt"])
        assert mt.read().filter("id = 3").collect()[0]["v"] == BIG

    def test_refusals(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="partition column"):
            mt.alter_column_type("pt", "bigint")
        with pytest.raises(ValueError, match="not in table schema"):
            mt.alter_column_type("zz", "bigint")
        with pytest.raises(ValueError, match="already"):
            mt.alter_column_type("v", "int")
        with pytest.raises(ValueError, match="only WIDENS"):
            mt.alter_column_type("id", "int")  # bigint → int
        with pytest.raises(ValueError, match="only WIDENS"):
            mt.alter_column_type("v", "string")  # cross-family
        with pytest.raises(ValueError, match="not a valid DDL"):
            mt.alter_column_type("v", "bigint); drop table x")
        assert mt.current_version() == 1

    def test_derived_source_refuses(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ManifestTable,
            partition_transform_column,
        )

        df = spark.range(0, 40).select(
            F.col("id").alias("id"),
            F.col("id").cast("int").alias("code"),
        )
        df = df.withColumn(
            "b", partition_transform_column("bucket", "code", 4)
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        mt = ManifestTable(
            spark,
            str(tmp_path / "t"),
            derived_partitions={
                "b": {"transform": "bucket", "source": "code", "n": 4}
            },
        )
        mt.create(spark.read.parquet(stage), ["b"])
        with pytest.raises(ValueError, match="derives from it"):
            mt.alter_column_type("code", "bigint")


class TestNestedCastClass:
    """Nested types recurse: element-wise lossless up-casts align,
    element-wise narrowing refuses — never a blanket cross."""

    def _t(self, ddl):
        return T._parse_datatype_string(ddl)

    @pytest.mark.parametrize(
        "src,dst,cls",
        [
            ("array<int>", "array<bigint>", "widen"),
            ("array<bigint>", "array<int>", "wrap"),
            ("array<string>", "array<int>", "cross"),
            ("array<int>", "array<int>", "identical"),
            ("map<int,float>", "map<bigint,double>", "widen"),
            ("map<int,bigint>", "map<int,int>", "wrap"),
            (
                "struct<a:int,b:float>",
                "struct<a:bigint,b:double>",
                "widen",
            ),
            (
                "struct<a:bigint,b:float>",
                "struct<a:int,b:double>",
                "wrap",  # wrap dominates the widen
            ),
            ("struct<a:int>", "struct<x:int>", "cross"),
            ("array<array<int>>", "array<array<bigint>>", "widen"),
        ],
    )
    def test_nested_matrix(self, src, dst, cls, spark):
        assert _cast_class(self._t(src), self._t(dst)) == cls

    def test_array_delta_aligns_upward(self, spark, tmp_path):
        """An array<int> delta merges into an array<bigint> stored
        column (lossless element up-cast) — no refusal."""
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ManifestTable,
        )

        df = spark.range(0, 20).select(
            F.col("id").alias("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(spark.read.parquet(stage), ["pt"])
        delta = spark.createDataFrame(
            [(3, 1, [7, 8])], "id bigint, pt int, arr array<int>"
        )
        merge_into_partitioned(spark, mt.path, delta, ["id"], ["pt"])
        assert mt.read().filter("id = 3").collect()[0]["arr"] == [7, 8]

    def test_array_element_narrowing_refuses(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            ManifestTable,
        )

        df = spark.range(0, 20).select(
            F.col("id").alias("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.array(F.col("id").cast("int")).alias("arr"),
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(spark.read.parquet(stage), ["pt"])
        delta = spark.createDataFrame(
            [(3, 1, [BIG])], "id bigint, pt int, arr array<bigint>"
        )
        with pytest.raises(ValueError, match="wraps/truncates"):
            merge_into_partitioned(
                spark, mt.path, delta, ["id"], ["pt"]
            )
        assert mt.current_version() == 1


class TestBloomSoundnessFuzz:
    """Randomized point-DML sequences over a bloom table must equal
    the plain-dataframe recompute — the membership filter may only
    change WHICH files rewrite, never the result."""

    def test_fuzz_random_point_dml(self, spark, tmp_path):
        import random

        rng = random.Random(1631)
        mt = _mk_unclustered_bloom(
            spark, str(tmp_path / "t"), n=600, files=8
        )
        expected = {
            r["k"]: (r["pt"], r["v"])
            for r in mt.read().collect()
        }
        keys = sorted(expected)
        for step in range(6):
            k = rng.choice(keys)
            if rng.random() < 0.5:
                r = mt.delete_where([("k", "=", k)])
                assert r["rows_deleted"] == (1 if k in expected else 0)
                expected.pop(k, None)
            else:
                r = mt.update_where(
                    [("k", "=", k)], {"v": f"cast({step} as bigint)"}
                )
                if k in expected:
                    assert r["rows_updated"] == 1
                    expected[k] = (expected[k][0], step)
                else:
                    assert r["rows_updated"] == 0
            got = {
                r["k"]: (r["pt"], r["v"])
                for r in mt.read().collect()
            }
            assert got == expected, f"diverged at step {step}"

    def test_verify_table_flags_corrupt_bloom(self, spark, tmp_path):
        import json
        import os

        mt = _mk_unclustered_bloom(
            spark, str(tmp_path / "t"), n=400, files=4
        )
        assert mt.verify_table()["ok"]
        mdir = os.path.join(mt.path, "_manifests")
        p = os.path.join(mdir, "v00000001.json")
        with open(p) as fh:
            man = json.load(fh)
        e = man["entries"][0]
        fn = next(iter(e["files"]))
        e["files"][fn]["bloom"]["k"]["b"] = "dG9vc2hvcnQ="  # 8 bytes
        with open(p, "w") as fh:
            json.dump(man, fh)
        crc = os.path.join(mdir, ".v00000001.json.crc")
        if os.path.exists(crc):
            os.remove(crc)
        rep = mt.verify_table()
        kinds = {pr["kind"] for pr in rep["problems"]}
        assert "corrupt_bloom" in kinds and not rep["ok"]


class TestWideningChain:
    """Two widening boundaries stacked (merge int→bigint, then ALTER
    bigint→decimal(38,0)) with DML in between: every version reads
    its own shape, the feed crosses BOTH boundaries, and the final
    state is exact."""

    def test_chained_widenings(self, spark, tmp_path):
        from decimal import Decimal

        mt = _mk_int_table(spark, str(tmp_path / "t"))
        merge_into_partitioned(
            spark, mt.path,
            spark.createDataFrame(
                [(3, 1, BIG)], "id bigint, pt int, v bigint"
            ),
            ["id"], ["pt"], schema_evolution=True, retain_versions=8,
        )
        mt.delete_where([("id", "=", 8)], retain_versions=8)
        mt.alter_column_type("v", "decimal(38,0)", retain_versions=8)
        merge_into_partitioned(
            spark, mt.path,
            spark.createDataFrame(
                [(5, 1, Decimal(10) ** 25)],
                "id bigint, pt int, v decimal(38,0)",
            ),
            ["id"], ["pt"], retain_versions=8,
        )
        # per-version shapes
        shapes = [
            mt.read(version=i).schema["v"].dataType.simpleString()
            for i in (1, 2, 3, 4, 5)
        ]
        assert shapes == [
            "int", "bigint", "bigint", "decimal(38,0)",
            "decimal(38,0)",
        ]
        # final state exact through two widening reads
        byid = {r["id"]: r["v"] for r in mt.read().collect()}
        assert byid[3] == BIG
        assert byid[5] == Decimal(10) ** 25
        assert byid[4] == 40 and 8 not in byid
        assert len(byid) == 199
        # the feed crosses BOTH boundaries in the to-schema
        d = mt.changes(1, 5)
        assert (
            d.schema["v"].dataType.simpleString() == "decimal(38,0)"
        )
        rows = {
            (r["id"], r["_change_type"]): r["v"] for r in d.collect()
        }
        assert rows[(8, "delete")] == 80
        assert rows[(3, "insert")] == BIG
        assert rows[(5, "insert")] == Decimal(10) ** 25
        # the ALTER contributed zero rows to the diff
        assert mt.changes(3, 4).count() == 0


class TestBloomObservability:
    def test_files_bloom_pruned_counter(self, spark, tmp_path):
        """The observability hook splits bounds-pruning from
        membership-pruning: on a scattered table, bounds prune ~0 and
        the filter prunes ~everything."""
        mt = _mk_unclustered_bloom(
            spark, str(tmp_path / "t"), n=800, files=8
        )
        rep = mt.prune_file_stats([("k", "=", "absent-key")])
        assert rep["files_scanned"] == 0
        assert rep["files_bloom_pruned"] == rep["files_total"]
        # without bloom_cols the counter stays zero
        mt2 = _mk_unclustered_bloom(
            spark, str(tmp_path / "t2"), n=400, files=4, bloom=False
        )
        rep2 = mt2.prune_file_stats([("k", "=", "absent-key")])
        assert rep2["files_bloom_pruned"] == 0


class TestTailAcrossWiden:
    """r16: a table_tail feed crossing a TYPE-WIDENING boundary —
    pre-widen feed dirs hold the narrow parquet; read_changes_feed's
    current-schema explicit read widens them (the same parquet
    widening read the table itself relies on), and the folded feed
    equals the widened table state."""

    def test_feed_crosses_widen_boundary(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "id bigint, pt string, v int",
        )
        mt.create(base, ["pt"])
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()  # v1 snapshot, NARROW v
            upd = spark.createDataFrame(
                [(1, "a", BIG, "U"), (9, "c", BIG + 2, "U")],
                "id bigint, pt string, v bigint, op string",
            )
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op",
                schema_evolution=True, retain_versions=5,
            )
            q.processAllAvailable()  # v2 diff, WIDE v
        finally:
            q.stop()
        feed = read_changes_feed(spark, path, str(tmp_path / "feed"))
        assert feed.schema["v"].dataType.simpleString() == "bigint"
        rows = {
            (r._commit_version, r.id, r.v, r._change_type)
            for r in feed.collect()
        }
        # v1 snapshot rows read narrow values through the wide schema
        assert (1, 1, 10, "insert") in rows
        assert (2, 1, 10, "delete") in rows
        assert (2, 1, BIG, "insert") in rows
        assert (2, 9, BIG + 2, "insert") in rows
        from pyspark.sql import Window

        w = Window.partitionBy("id").orderBy(
            F.col("_commit_version").desc(),
            F.col("_change_type").desc(),
        )
        latest = (
            feed.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1 and _change_type = 'insert'")
            .select("id", "pt", "v")
        )
        got = sorted((tuple(r) for r in latest.collect()), key=repr)
        want = sorted((tuple(r) for r in mt.read().collect()), key=repr)
        assert got == want


class TestWidenVsOptimisticRace:
    """A widening ALTER racing a staged optimistic commit: the rebase
    refuses schema divergence (the staged df carries the narrow
    schema), never publishes narrow data as the newest wide version."""

    def test_alter_between_stage_and_publish_conflicts(
        self, spark, tmp_path
    ):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        df = mt.read(partitions=[(1,)]).withColumn(
            "v", F.col("v") + 1
        )
        token = mt.stage_commit(df, touched=[(1,)])
        mt.alter_column_type("v", "bigint")
        with pytest.raises(ConcurrentWriterError):
            mt.commit_staged(token)
        mt.abort_staged(token)
        # the widened table is intact, values unchanged
        assert (
            mt.read().schema["v"].dataType.simpleString() == "bigint"
        )
        assert mt.read().filter("id = 3").collect()[0]["v"] == 30

    def test_alter_first_then_stage_succeeds(self, spark, tmp_path):
        mt = _mk_int_table(spark, str(tmp_path / "t"))
        mt.alter_column_type("v", "bigint")
        df = mt.read(partitions=[(1,)]).withColumn(
            "v", F.col("v") + F.lit(BIG).cast("bigint")
        )
        token = mt.stage_commit(df, touched=[(1,)])
        mt.commit_staged(token)
        assert (
            mt.read().filter("id = 3").collect()[0]["v"] == 30 + BIG
        )


class TestBloomKeysetWindow:
    """Bloom-bearing entries earn a 4× keyset window (r16): a
    500-key scattered merge still plans as an IN-clause membership
    probe and selects ~|keys| files instead of falling back to the
    min-max range (which spans every file on an unclustered key)."""

    def test_large_point_delta_stays_file_granular(
        self, spark, tmp_path
    ):
        mt = _mk_unclustered_bloom(
            spark, str(tmp_path / "t"), n=8000, files=16
        )
        man = mt.manifest()
        total = sum(len(e["files"]) for e in man["entries"])
        # 400 scattered keys in one partition — over the base 256
        # cap, under the bloom-earned 1024
        keys = [
            r["k"]
            for r in mt.read()
            .filter("pt = 1")
            .limit(400)
            .collect()
        ]
        delta = spark.createDataFrame(
            [(k, 1, -1) for k in keys], "k string, pt int, v bigint"
        )
        merge_into_partitioned(spark, mt.path, delta, ["k"], ["pt"])
        e1 = next(
            e
            for e in mt.manifest()["entries"]
            if e["values"] == [["int", 1]]
        )
        carried = sum(1 for n in e1["files"] if "/" in n)
        # every file holds ~500 scattered keys, so a 400-key delta
        # plausibly touches many files — the pin is that SOME files
        # were proven key-free and carried (the range fallback
        # carries none: bounds span everything)
        assert carried >= 1, (carried, len(e1["files"]))
        got = mt.read().filter(F.col("v") == -1).count()
        assert got == 400
        assert mt.read().count() == 8000


class TestDupKeyRefusal:
    """r16 (second pass): the at-most-one-row-per-key contract blind
    and conditional merges always DOCUMENTED is now ENFORCED — a
    dup-keyed delta used to silently land both rows (blind) or fan
    the matched row out per source row (conditional), leaving the
    table with duplicate keys and no error (Delta raises
    DELTA_MULTIPLE_SOURCE_ROW_MATCHING on this shape)."""

    def _dup_delta(self, spark):
        # two competing upserts for id=3 — which wins is undefined
        return spark.createDataFrame(
            [(3, 1, 111), (3, 1, 222), (4, 0, 444)],
            "id bigint, pt int, v bigint",
        )

    def _mk_big_table(self, spark, path, n=200, npart=2):
        df = spark.range(0, n).select(
            F.col("id"),
            (F.col("id") % npart).cast("int").alias("pt"),
            (F.col("id") * 10).alias("v"),
        )
        stage = f"{path}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, path)
        mt.create(spark.read.parquet(stage), ["pt"])
        return mt

    def test_blind_manifest_refuses_pre_commit(self, spark, tmp_path):
        mt = self._mk_big_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="at most one"):
            merge_into_partitioned(
                spark, mt.path, self._dup_delta(spark), ["id"], ["pt"]
            )
        assert mt.current_version() == 1
        assert mt.read().filter("id = 3").collect()[0]["v"] == 30
        # the non-dup key in the same delta must not have landed either
        assert mt.read().filter("id = 4").collect()[0]["v"] == 40

    def test_refusal_names_the_fold_recipes(self, spark, tmp_path):
        mt = self._mk_big_table(spark, str(tmp_path / "t"))
        with pytest.raises(
            ValueError, match="apply_changelog|ts_col"
        ):
            merge_into_partitioned(
                spark, mt.path, self._dup_delta(spark), ["id"], ["pt"]
            )

    def test_conditional_refuses(self, spark, tmp_path):
        mt = self._mk_big_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="at most one"):
            merge_into_partitioned(
                spark, mt.path, self._dup_delta(spark), ["id"], ["pt"],
                when_matched_update={"v": "s.v"},
            )
        assert mt.current_version() == 1

    def test_optimistic_refuses(self, spark, tmp_path):
        mt = self._mk_big_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="at most one"):
            merge_into_partitioned(
                spark, mt.path, self._dup_delta(spark), ["id"], ["pt"],
                optimistic=True,
            )
        assert mt.current_version() == 1

    def test_plain_hive_refuses(self, spark, tmp_path):
        p = str(tmp_path / "plain")
        spark.range(0, 20).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 10).alias("v"),
        ).write.partitionBy("pt").parquet(p)
        with pytest.raises(ValueError, match="at most one"):
            merge_into_partitioned(
                spark, p, self._dup_delta(spark), ["id"], ["pt"]
            )
        got = spark.read.parquet(p).filter("id = 3").collect()
        assert len(got) == 1 and got[0]["v"] == 30

    def test_ordered_mode_still_folds(self, spark, tmp_path):
        """ts_col set = the documented multi-row-per-key path; the
        guard must not fire and the (ts)-max write must win."""
        p = str(tmp_path / "t")
        df = spark.range(0, 20).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            (F.col("id") * 10).alias("v"),
            F.lit(100).cast("bigint").alias("ts"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        delta = spark.createDataFrame(
            [
                (3, 1, 111, 200, "U"),
                (3, 1, 222, 300, "U"),
                (3, 1, 999, 250, "U"),
            ],
            "id bigint, pt int, v bigint, ts bigint, op string",
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            op_col="op", ts_col="ts",
        )
        got = mt.read().filter("id = 3").collect()
        assert len(got) == 1 and got[0]["v"] == 222

    def test_null_keyed_rows_exempt(self, spark, tmp_path):
        """NULL keys never match anything under equality joins —
        multiple NULL-keyed rows are independent deterministic
        inserts, not an ambiguity; the guard must let them through."""
        mt = self._mk_big_table(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(None, 1, 111), (None, 1, 222)],
            "id bigint, pt int, v bigint",
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"]
        )
        assert mt.read().filter("id is null").count() == 2
        assert mt.read().count() == 202

    def test_composite_key_dup_detected(self, spark, tmp_path):
        """Duplicate = the WHOLE composite key repeats; rows sharing
        only a key prefix are distinct keys and must pass."""
        p = str(tmp_path / "t")
        df = spark.range(0, 40).select(
            (F.col("id") % 10).alias("a"),
            (F.col("id") / 10).cast("bigint").alias("b"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.lit(0).cast("bigint").alias("v"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        ok = spark.createDataFrame(
            [(1, 0, 1, 7), (1, 1, 1, 8)],
            "a bigint, b bigint, pt int, v bigint",
        )
        merge_into_partitioned(spark, mt.path, ok, ["a", "b"], ["pt"])
        assert mt.read().filter("a=1 and b=0").collect()[0]["v"] == 7
        bad = spark.createDataFrame(
            [(1, 0, 1, 7), (1, 0, 1, 8)],
            "a bigint, b bigint, pt int, v bigint",
        )
        with pytest.raises(ValueError, match="at most one"):
            merge_into_partitioned(
                spark, mt.path, bad, ["a", "b"], ["pt"]
            )


class TestMetadataAgg:
    """r16 (second pass): metadata_agg — count()'s r13 metadata-first
    architecture generalized to count(col)/null_count/min/max with
    the same per-entry exactness demotions. At 100 TB these
    aggregates must be an O(live entries) driver fold, not a scan."""

    AGGS = [
        ("count", "*"), ("count", "v"), ("null_count", "v"),
        ("min", "v"), ("max", "v"), ("min", "pt"), ("max", "pt"),
    ]

    def _mk(self, spark, path, n=400):
        df = spark.range(0, n).select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("pt"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id") * 3)
            .alias("v"),
            F.concat(F.lit("k"), F.col("id")).alias("s"),
        )
        stage = f"{path}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, path)
        mt.create(spark.read.parquet(stage), ["pt"])
        return mt

    def test_matches_exact_scan(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        r = mt.metadata_agg(self.AGGS, detail=True)
        exp = mt.read().agg(
            F.count(F.lit(1)), F.count("v"),
            F.count(F.when(F.col("v").isNull(), 1)),
            F.min("v"), F.max("v"), F.min("pt"), F.max("pt"),
        ).collect()[0]
        got = [r[f"{fn}({c})"] for fn, c in self.AGGS]
        assert got == list(exp)
        assert r["_detail"]["entries_scanned"] == 0
        assert r["_detail"]["entries_metadata"] == 4

    def test_zero_data_io(self, spark, tmp_path):
        """The pin that the metadata path IS metadata: delete every
        data file; the fold still answers."""
        import shutil

        p = str(tmp_path / "t")
        mt = self._mk(spark, p)
        exp = mt.metadata_agg(self.AGGS)
        shutil.rmtree(f"{p}/_data")
        assert mt.metadata_agg(self.AGGS) == exp

    def test_partition_where_exact(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        r = mt.metadata_agg(
            self.AGGS, where=[("pt", "in", [1, 2])], detail=True
        )
        exp = mt.read().filter("pt in (1,2)").agg(
            F.count(F.lit(1)), F.count("v"),
            F.count(F.when(F.col("v").isNull(), 1)),
            F.min("v"), F.max("v"), F.min("pt"), F.max("pt"),
        ).collect()[0]
        assert [r[f"{fn}({c})"] for fn, c in self.AGGS] == list(exp)
        assert r["_detail"]["entries_scanned"] == 0

    def test_data_where_scans_and_keeps_partitions_filter(
        self, spark, tmp_path
    ):
        """A data-column clause demotes to the exact scan — which
        must keep the caller's partitions selection, not widen."""
        mt = self._mk(spark, str(tmp_path / "t"))
        r = mt.metadata_agg(
            [("count", "*"), ("min", "v")],
            where=[("v", ">", 300)],
            partitions=[(1,), (2,)],
            detail=True,
        )
        exp = (
            mt.read()
            .filter("pt in (1,2) and v > 300")
            .agg(F.count(F.lit(1)), F.min("v"))
            .collect()[0]
        )
        assert (r["count(*)"], r["min(v)"]) == tuple(exp)
        assert r["_detail"]["entries_metadata"] == 0

    def test_long_string_bounds_demote(self, spark, tmp_path):
        """String bounds at the truncation length are pruning hints,
        not attained values — min/max on them must scan, and still
        be exact."""
        p = str(tmp_path / "t")
        df = spark.range(0, 100).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.concat(
                F.lpad(F.col("id").cast("string"), 5, "0"),
                F.lit("x" * 80),
            ).alias("s"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        r = mt.metadata_agg(
            [("min", "s"), ("max", "s"), ("count", "s")], detail=True
        )
        exp = mt.read().agg(
            F.min("s"), F.max("s"), F.count("s")
        ).collect()[0]
        assert (r["min(s)"], r["max(s)"], r["count(s)"]) == tuple(exp)
        # min/max forced the scan (bounds not attained)...
        assert r["_detail"]["entries_metadata"] == 0
        # ...but counts alone stay metadata (truncation is harmless)
        r2 = mt.metadata_agg(
            [("count", "*"), ("count", "s")], detail=True
        )
        assert r2["_detail"]["entries_scanned"] == 0

    def test_timestamp_minmax_demotes_counts_stay(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "t")
        df = spark.range(0, 50).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("id") * 60
            ).alias("ts"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        r = mt.metadata_agg(
            [("min", "ts"), ("max", "ts")], detail=True
        )
        exp = mt.read().agg(F.min("ts"), F.max("ts")).collect()[0]
        assert (r["min(ts)"], r["max(ts)"]) == tuple(exp)
        assert r["_detail"]["entries_metadata"] == 0
        r2 = mt.metadata_agg(
            [("count", "ts"), ("null_count", "ts")], detail=True
        )
        assert r2["_detail"]["entries_scanned"] == 0

    def test_nan_unbounded_side_demotes(self, spark, tmp_path):
        """A float partition whose fold hit NaN records no bound —
        min/max must scan that entry (and Spark's NaN-wins max must
        survive the fold)."""
        import math

        p = str(tmp_path / "t")
        df = spark.range(0, 40).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.when(
                (F.col("id") == 7), F.lit(float("nan"))
            )
            .otherwise(F.col("id").cast("double"))
            .alias("f"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        r = mt.metadata_agg([("min", "f"), ("max", "f")], detail=True)
        assert r["min(f)"] == 0.0
        assert math.isnan(r["max(f)"])
        # the NaN-carrying entry (pt=1) scanned; the clean one didn't
        assert r["_detail"]["entries_metadata"] == 1

    def test_all_null_column(self, spark, tmp_path):
        p = str(tmp_path / "t")
        df = spark.range(0, 30).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.lit(None).cast("bigint").alias("v"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        r = mt.metadata_agg(
            [("count", "*"), ("count", "v"), ("min", "v"),
             ("max", "v"), ("null_count", "v")],
            detail=True,
        )
        assert r["count(*)"] == 30
        assert r["count(v)"] == 0
        assert r["null_count(v)"] == 30
        assert r["min(v)"] is None and r["max(v)"] is None
        assert r["_detail"]["entries_scanned"] == 0

    def test_empty_selection(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        r = mt.metadata_agg(
            self.AGGS, where=[("pt", "=", 99)]
        )
        assert r["count(*)"] == 0
        assert r["min(v)"] is None and r["max(v)"] is None

    def test_stays_exact_after_dml_and_time_travel(
        self, spark, tmp_path
    ):
        """Row counts / bounds refold through file-granular DML; the
        versioned manifest answers historical aggregates."""
        mt = self._mk(spark, str(tmp_path / "t"))
        before = mt.metadata_agg([("count", "*"), ("max", "id")])
        mt.delete_where([("id", ">=", 350)])
        r = mt.metadata_agg([("count", "*"), ("max", "id")])
        exp = mt.read().agg(
            F.count(F.lit(1)), F.max("id")
        ).collect()[0]
        assert (r["count(*)"], r["max(id)"]) == tuple(exp)
        old = mt.metadata_agg(
            [("count", "*"), ("max", "id")], version=1
        )
        assert old == before

    def test_rejects_bad_fn(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"), n=20)
        with pytest.raises(ValueError, match="supports"):
            mt.metadata_agg([("avg", "v")])
        with pytest.raises(ValueError, match="not an aggregate"):
            mt.metadata_agg([("min", "*")])


class TestMetadataSum:
    """r16 (second pass): per-file exact-sum stats (``sm``) make
    metadata_agg answer SUM from the manifest for integral/decimal
    columns; floats always scan (order-dependent addition)."""

    def _mk(self, spark, path, n=500):
        df = spark.range(0, n).select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("pt"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id") * 3)
            .alias("v"),
            (F.col("id").cast("decimal(12,2)") / 4).alias("d"),
            (F.col("id").cast("double") * 1.5).alias("f"),
        )
        stage = f"{path}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, path)
        mt.create(spark.read.parquet(stage), ["pt"])
        return mt

    def test_sum_matches_scan_zero_entries_scanned(
        self, spark, tmp_path
    ):
        mt = self._mk(spark, str(tmp_path / "t"))
        r = mt.metadata_agg(
            [("sum", "v"), ("sum", "d"), ("sum", "id"), ("sum", "pt")],
            detail=True,
        )
        exp = mt.read().agg(
            F.sum("v"), F.sum("d"), F.sum("id"), F.sum("pt")
        ).collect()[0]
        assert [
            r["sum(v)"], r["sum(d)"], r["sum(id)"], r["sum(pt)"]
        ] == list(exp)
        assert r["_detail"]["entries_scanned"] == 0

    def test_float_sum_always_scans_still_exact(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        r = mt.metadata_agg([("sum", "f")], detail=True)
        exp = mt.read().agg(F.sum("f")).collect()[0][0]
        assert r["sum(f)"] == exp
        assert r["_detail"]["entries_metadata"] == 0

    def test_sum_survives_fg_dml_metadata_only(self, spark, tmp_path):
        """File-granular DML refolds ``sm`` through carried files —
        the sum must stay manifest-answered AND exact afterwards."""
        import shutil

        mt = self._mk(spark, str(tmp_path / "t"))
        mt.delete_where([("id", "between", (100, 149))])
        r = mt.metadata_agg(
            [("sum", "v"), ("sum", "d"), ("count", "*")], detail=True
        )
        exp = mt.read().agg(
            F.sum("v"), F.sum("d"), F.count(F.lit(1))
        ).collect()[0]
        assert [r["sum(v)"], r["sum(d)"], r["count(*)"]] == list(exp)
        assert r["_detail"]["entries_scanned"] == 0
        shutil.rmtree(f"{mt.path}/_data")
        r2 = mt.metadata_agg(
            [("sum", "v"), ("sum", "d"), ("count", "*")]
        )
        assert r2 == {k: v for k, v in r.items() if k != "_detail"}

    def test_all_null_sum_is_none(self, spark, tmp_path):
        p = str(tmp_path / "t")
        df = spark.range(0, 30).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("pt"),
            F.lit(None).cast("bigint").alias("v"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        r = mt.metadata_agg([("sum", "v")], detail=True)
        assert r["sum(v)"] is None
        assert r["_detail"]["entries_scanned"] == 0

    def test_pre_sm_manifest_demotes_to_scan(self, spark, tmp_path):
        """A manifest written before ``sm`` existed (simulated by
        stripping the keys) must scan for sums — exact, never a
        guess — while counts stay metadata."""
        import glob as _glob
        import json as _json
        import os

        p = str(tmp_path / "t")
        mt = self._mk(spark, p)
        mfile = sorted(_glob.glob(f"{p}/_manifests/v*.json"))[-1]
        man = _json.load(open(mfile))
        for e in man["entries"]:
            for cs in (e.get("stats") or {}).get("cols", {}).values():
                cs.pop("sm", None)
            for fst in (e.get("stats") or {}).get("files", {}).values():
                for cs in (fst.get("cols") or {}).values():
                    cs.pop("sm", None)
        with open(mfile, "w") as fh:
            _json.dump(man, fh)
        crc = os.path.join(
            os.path.dirname(mfile), f".{os.path.basename(mfile)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        r = mt.metadata_agg(
            [("sum", "v"), ("count", "*")], detail=True
        )
        exp = mt.read().agg(F.sum("v")).collect()[0][0]
        assert r["sum(v)"] == exp
        assert r["_detail"]["entries_metadata"] == 0
        r2 = mt.metadata_agg([("count", "*"), ("count", "v")], detail=True)
        assert r2["_detail"]["entries_scanned"] == 0


class TestMetadataAggFuzz:
    """Property pin for metadata_agg's exactness contract: whatever
    the null pattern, value range (incl. int extremes), predicate,
    or post-DML state, the metadata-first answer EQUALS the exact
    scan's — demotion may change the path taken, never the answer."""

    def test_fuzz_metadata_equals_scan(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        p = str(tmp_path / "t")
        df = spark.range(0, 600).select(
            F.col("id"),
            (F.col("id") % 5).cast("int").alias("pt"),
            F.when(F.col("id") % 9 == 0, None)
            .otherwise(
                F.when(
                    F.col("id") == 13, F.lit(2**62)
                ).otherwise(F.col("id") * 7 - 2000)
            )
            .alias("v"),
            (F.col("id").cast("decimal(10,3)") / 8).alias("d"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        mt.delete_where([("id", "between", (200, 260))])
        AGGS = [
            ("count", "*"), ("count", "v"), ("null_count", "v"),
            ("min", "v"), ("max", "v"), ("sum", "v"),
            ("sum", "d"), ("sum", "pt"), ("min", "pt"),
        ]

        @settings(
            max_examples=15,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(
            where=st.sampled_from(
                [
                    None,
                    [("pt", "=", 2)],
                    [("pt", "in", [0, 3, 4])],
                    [("pt", ">", 1)],
                    [("pt", "=", 99)],
                    [("v", ">", 0)],
                    [("v", "<=", -500), ("pt", "<", 3)],
                    [("id", "between", (50, 400))],
                ]
            ),
        )
        def check(where):
            got = mt.metadata_agg(AGGS, where=where)
            exp_row = (
                mt.read(where=where)
                .agg(
                    F.count(F.lit(1)), F.count("v"),
                    F.count(F.when(F.col("v").isNull(), 1)),
                    F.min("v"), F.max("v"), F.sum("v"),
                    F.sum("d"), F.sum("pt"), F.min("pt"),
                )
                .collect()[0]
            )
            exp = {
                f"{fn}({c})": exp_row[i]
                for i, (fn, c) in enumerate(AGGS)
            }
            assert got == exp, (where, got, exp)

        check()


class TestPartitionProfile:
    """r16 (second pass): partition_profile — metadata_agg grouped by
    the partition columns. One live entry per partition means the
    grouped answer IS the per-entry stats: the O(live entries) skew /
    range / null-density profile of a 100 TB table, zero data jobs."""

    AGGS = [
        ("count", "*"), ("count", "v"), ("null_count", "v"),
        ("min", "v"), ("max", "v"), ("sum", "v"), ("sum", "pt"),
    ]

    def _mk(self, spark, path, n=800):
        df = spark.range(0, n).select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("pt"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id") * 3)
            .alias("v"),
        )
        stage = f"{path}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, path)
        mt.create(spark.read.parquet(stage), ["pt"])
        return mt

    def _exp(self, mt, flt=None):
        df = mt.read()
        if flt:
            df = df.filter(flt)
        return (
            df.groupBy("pt")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("v").alias("cv"),
                F.count(F.when(F.col("v").isNull(), 1)).alias("nv"),
                F.min("v").alias("mn"), F.max("v").alias("mx"),
                F.sum("v").alias("sv"), F.sum("pt").alias("sp"),
            )
            .orderBy("pt")
            .collect()
        )

    def _cmp(self, rows, exp):
        assert len(rows) == len(exp)
        for r, e in zip(rows, exp):
            assert (
                r["pt"], r["count(*)"], r["count(v)"],
                r["null_count(v)"], r["min(v)"], r["max(v)"],
                r["sum(v)"], r["sum(pt)"],
            ) == (
                e["pt"], e["n"], e["cv"], e["nv"], e["mn"], e["mx"],
                e["sv"], e["sp"],
            )

    def test_metadata_only_matches_grouped_scan(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        rows, d = mt.partition_profile(self.AGGS, detail=True)
        self._cmp(rows, self._exp(mt))
        assert d["entries_scanned"] == 0

    def test_zero_data_io(self, spark, tmp_path):
        import shutil

        p = str(tmp_path / "t")
        mt = self._mk(spark, p)
        before = mt.partition_profile(self.AGGS)
        shutil.rmtree(f"{p}/_data")
        assert mt.partition_profile(self.AGGS) == before

    def test_data_where_scans_grouped(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        rows, d = mt.partition_profile(
            self.AGGS, where=[("v", ">", 900)], detail=True
        )
        self._cmp(rows, self._exp(mt, "v > 900"))
        assert d["entries_metadata"] == 0

    def test_pcol_where_prunes(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        rows, d = mt.partition_profile(
            self.AGGS, where=[("pt", "in", [1, 3])], detail=True
        )
        assert [r["pt"] for r in rows] == [1, 3]
        assert d["entries_scanned"] == 0

    def test_survives_fg_dml(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        mt.delete_where([("id", "between", (100, 299))])
        rows, d = mt.partition_profile(self.AGGS, detail=True)
        self._cmp(rows, self._exp(mt))
        assert d["entries_scanned"] == 0

    def test_default_aggs_rowcounts(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        rows = mt.partition_profile()
        assert [(r["pt"], r["count(*)"]) for r in rows] == [
            (0, 200), (1, 200), (2, 200), (3, 200)
        ]


class TestKeyMoveCheck:
    """r16 (second pass): the partition-function contract becomes
    CHECKABLE — ``check_key_moves=True`` refuses, pre-commit, a delta
    that assigns a key a different partition while its stored row
    lives in an UNTOUCHED partition (silently duplicating the key was
    the old behavior; a touched stored partition folds normally and
    stays legal)."""

    def _mk(self, spark, path, n=200):
        df = spark.range(0, n).select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("pt"),
            (F.col("id") * 10).alias("v"),
        )
        stage = f"{path}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, path)
        mt.create(spark.read.parquet(stage), ["pt"])
        return mt

    def test_silent_duplicate_without_check(self, spark, tmp_path):
        """The hazard, pinned: id=5 lives in pt=1; a delta claiming
        pt=2 lands a SECOND id=5 row with no error."""
        mt = self._mk(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(5, 2, 555)], "id bigint, pt int, v bigint"
        )
        merge_into_partitioned(spark, mt.path, delta, ["id"], ["pt"])
        assert mt.read().filter("id = 5").count() == 2

    def test_check_refuses_untouched_move(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(5, 2, 555)], "id bigint, pt int, v bigint"
        )
        with pytest.raises(ValueError, match="UNTOUCHED"):
            merge_into_partitioned(
                spark, mt.path, delta, ["id"], ["pt"],
                check_key_moves=True,
            )
        assert mt.current_version() == 1
        assert mt.read().filter("id = 5").count() == 1

    def test_touched_old_partition_stays_legal(self, spark, tmp_path):
        """Including the key's CURRENT partition in the delta makes
        the move a normal fold: old row contested + dropped, new row
        lands — one row, moved, no refusal."""
        mt = self._mk(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(5, 2, 555), (9, 1, 999)],
            "id bigint, pt int, v bigint",
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            check_key_moves=True,
        )
        got = mt.read().filter("id = 5").collect()
        assert len(got) == 1 and (got[0]["pt"], got[0]["v"]) == (2, 555)

    def test_in_place_updates_pass(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(5, 1, 555), (8, 0, 888)],
            "id bigint, pt int, v bigint",
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            check_key_moves=True,
        )
        assert mt.read().filter("id = 5").collect()[0]["v"] == 555

    def test_optimistic_and_conditional_paths(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(5, 2, 555)], "id bigint, pt int, v bigint"
        )
        with pytest.raises(ValueError, match="UNTOUCHED"):
            merge_into_partitioned(
                spark, mt.path, delta, ["id"], ["pt"],
                optimistic=True, check_key_moves=True,
            )
        with pytest.raises(ValueError, match="UNTOUCHED"):
            merge_into_partitioned(
                spark, mt.path, delta, ["id"], ["pt"],
                when_matched_update={"v": "s.v"},
                check_key_moves=True,
            )
        assert mt.current_version() == 1

    def test_ordered_mode_checked_too(self, spark, tmp_path):
        p = str(tmp_path / "t")
        df = spark.range(0, 40).select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("pt"),
            (F.col("id") * 10).alias("v"),
            F.lit(100).cast("bigint").alias("ts"),
        )
        stage = f"{p}__seed"
        df.write.mode("overwrite").parquet(stage)
        mt = ManifestTable(spark, p)
        mt.create(spark.read.parquet(stage), ["pt"])
        delta = spark.createDataFrame(
            [(5, 2, 555, 200, "U")],
            "id bigint, pt int, v bigint, ts bigint, op string",
        )
        with pytest.raises(ValueError, match="UNTOUCHED"):
            merge_into_partitioned(
                spark, mt.path, delta, ["id"], ["pt"],
                op_col="op", ts_col="ts", check_key_moves=True,
            )

    def test_plain_layout_checked(self, spark, tmp_path):
        p = str(tmp_path / "plain")
        spark.range(0, 40).select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("pt"),
            (F.col("id") * 10).alias("v"),
        ).write.partitionBy("pt").parquet(p)
        delta = spark.createDataFrame(
            [(5, 2, 555)], "id bigint, pt int, v bigint"
        )
        with pytest.raises(ValueError, match="UNTOUCHED"):
            merge_into_partitioned(
                spark, p, delta, ["id"], ["pt"],
                check_key_moves=True,
            )
        assert spark.read.parquet(p).filter("id = 5").count() == 1

    def test_null_keys_ignored(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        delta = spark.createDataFrame(
            [(None, 2, 555)], "id bigint, pt int, v bigint"
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["id"], ["pt"],
            check_key_moves=True,
        )
        assert mt.read().filter("id is null").count() == 1


class TestKeyMoveCheckKeysetBloom:
    """r16 (second pass): a key-sparse delta (≤256 distinct keys)
    probes the untouched side with an IN clause instead of the key
    range, so the per-file BLOOM machinery prunes it — the
    unclustered CDC cold start where a range spans every file."""

    def test_unclustered_bloom_refuses_and_passes(
        self, spark, tmp_path
    ):
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"), n=2000)
        # an existing key from pt=0, re-homed to pt=1, pt=0 untouched
        key0 = (
            mt.read()
            .filter("pt = 0")
            .select("k")
            .limit(1)
            .collect()[0][0]
        )
        bad = spark.createDataFrame(
            [(key0, 1, -1)], "k string, pt int, v bigint"
        )
        with pytest.raises(ValueError, match="UNTOUCHED"):
            merge_into_partitioned(
                spark, mt.path, bad, ["k"], ["pt"],
                check_key_moves=True,
            )
        assert mt.current_version() == 1
        # same key kept in its own partition: passes the check
        ok = spark.createDataFrame(
            [(key0, 0, -1)], "k string, pt int, v bigint"
        )
        merge_into_partitioned(
            spark, mt.path, ok, ["k"], ["pt"], check_key_moves=True
        )
        got = mt.read().filter(F.col("v") == -1).collect()
        assert len(got) == 1 and got[0]["k"] == key0

    def test_fresh_keys_pass_fast(self, spark, tmp_path):
        """Brand-new keys exist in no untouched partition — the
        checked merge inserts them normally."""
        mt = _mk_unclustered_bloom(spark, str(tmp_path / "t"), n=1000)
        delta = spark.createDataFrame(
            [(f"newkey-{i}", i % 2, -2) for i in range(20)],
            "k string, pt int, v bigint",
        )
        merge_into_partitioned(
            spark, mt.path, delta, ["k"], ["pt"], check_key_moves=True
        )
        assert mt.read().filter(F.col("v") == -2).count() == 20
