"""Round 15: optimistic-rebase entry identity under file-granular DML,
MERGE schema evolution, carried-ref-aware maintenance (reclaim loop),
and optimistic file-granular merge.

Reference parity notes: the merge/evolution surface extends the batch
side of the reference's effectively-once sink contract (SURVEY §2.f
ST1, camel-integration file-pipeline.yaml error handling); schema
evolution mirrors the add-only contract `changes()` already documents
for the feed side (operators/table.py).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.operators.table import (
    ConcurrentWriterError,
    ManifestTable,
)

from test_r14_ops import _mk_clustered, _mtimes  # shared fixtures


def _mk_clustered_stable(spark, path, n=1000, npart=2, files_per=4):
    """Like _mk_clustered, but the create df is parquet-roundtripped
    first so every column is already NULLABLE: later DML rewrites then
    publish a byte-identical schema JSON. (From a spark.range-derived
    df the first rewrite flips nullability and the rebase's
    schema-change guard fires for that incidental reason, masking
    whatever the test actually probes.)"""
    df = spark.range(0, n).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % npart).cast("int").alias("pt"),
        (F.col("id") * 1.0).alias("v"),
    )
    stage = f"{path}__seed"
    df.write.mode("overwrite").parquet(stage)
    back = (
        spark.read.parquet(stage)
        .repartitionByRange(npart * files_per, "pt", "id")
        .sortWithinPartitions("pt", "id")
    )
    mt = ManifestTable(spark, path)
    mt.create(back, ["pt"])
    return mt


class TestRebaseEntryIdentity:
    """A file-granular DML commit can change an entry's FILES map while
    keeping its dir (rewrite output empty → survivors carried under the
    old dir, table.py _finalize_generation). The optimistic rebase must
    treat that as a conflicting change — a dir-only comparison would
    rebase a staged commit over the delete and resurrect the deleted
    rows."""

    def _first_file_bounds(self, mt, key):
        e = next(
            e for e in mt.manifest()["entries"] if e["key"] == key
        )
        first = min(
            e["files"].items(),
            key=lambda kv: kv[1]["cols"]["id"]["mn"][1],
        )
        st = first[1]
        return (
            e["dir"],
            st["cols"]["id"]["mn"][1],
            st["cols"]["id"]["mx"][1],
            st["rows"],
        )

    def test_files_only_change_blocks_rebase(self, spark, tmp_path):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        d0, lo, hi, nrows = self._first_file_bounds(mt, '[["int", 0]]')
        # stage a commit derived from (and writing) pt=0
        add = spark.createDataFrame(
            [(5000, 0, 1.0)], "id int, pt int, v double"
        )
        staged_df = mt.read(partitions=[(0,)]).unionByName(add)
        s = mt.stage_commit(staged_df, [(0,)])
        # intervening fg delete empties pt=0's first file ENTIRELY:
        # the entry keeps its old dir, only the files map shrinks
        r = mt.delete_where(
            [("pt", "=", 0), ("id", ">=", lo), ("id", "<=", hi)],
            retain_versions=5,
        )
        assert r["rows_deleted"] == nrows, r
        e1 = next(
            e for e in mt.manifest()["entries"] if e["key"] == '[["int", 0]]'
        )
        assert e1["dir"] == d0  # the dir-only blind spot, by design
        with pytest.raises(ConcurrentWriterError, match="overlap"):
            mt.commit_staged(s, retain_versions=10)
        mt.abort_staged(s)
        # the delete's effect survives; the staged rows never landed
        assert mt.read().filter(f"pt = 0 and id >= {lo} and id <= {hi}").count() == 0
        assert mt.read().filter("id = 5000").count() == 0

    def test_disjoint_partition_still_rebases(self, spark, tmp_path):
        # the fix must not over-refuse: an fg delete in pt=1 is
        # disjoint from a staged pt=0 commit — rebase proceeds
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        _, lo, hi, nrows = self._first_file_bounds(mt, '[["int", 1]]')
        add = spark.createDataFrame(
            [(5000, 0, 1.0)], "id int, pt int, v double"
        )
        s = mt.stage_commit(
            mt.read(partitions=[(0,)]).unionByName(add), [(0,)]
        )
        r = mt.delete_where(
            [("pt", "=", 1), ("id", ">=", lo), ("id", "<=", hi)],
            retain_versions=5,
        )
        assert r["rows_deleted"] == nrows
        v = mt.commit_staged(s, retain_versions=10)
        assert v == 3
        assert mt.read().filter("id = 5000").count() == 1
        assert (
            mt.read()
            .filter(f"pt = 1 and id >= {lo} and id <= {hi}")
            .count()
            == 0
        )


def _mk_status_table(spark, path):
    """Small manifest table shaped like the sink's status view:
    key=id, partition=pt, payload v."""
    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(8)],
        "id int, pt int, v string",
    )
    mt = ManifestTable(spark, path)
    mt.create(df, ["pt"])
    return mt


class TestMergeSchemaEvolution:
    """r15: the defined contract for delta columns the stored schema
    lacks — loud refusal by default, add-only NULL-backfilled
    evolution with schema_evolution=True (manifest tables, locked
    path); refusals for the paths where evolution cannot be atomic."""

    def test_default_refuses_loudly(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _mk_status_table(spark, path)
        upd = spark.createDataFrame(
            [(1, 1, "nv", "eu")], "id int, pt int, v string, region string"
        )
        with pytest.raises(ValueError, match="region.*schema_evolution"):
            merge_into_partitioned(spark, path, upd, ["id"], ["pt"])
        # refusal is pre-commit: version unchanged
        assert ManifestTable(spark, path).current_version() == 1

    def test_blind_evolution_null_backfill(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = _mk_status_table(spark, path)
        upd = spark.createDataFrame(
            [(1, 1, "nv", "eu"), (100, 0, "new", "us")],
            "id int, pt int, v string, region string",
        )
        n = merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"],
            schema_evolution=True, retain_versions=5,
        )
        assert n == 2
        got = mt.read()
        assert got.columns == ["id", "pt", "v", "region"]
        f = mt.schema().fields[-1]
        assert f.name == "region" and f.nullable
        rows = {r.id: (r.v, r.region) for r in got.collect()}
        assert rows[1] == ("nv", "eu")       # winner carries the value
        assert rows[100] == ("new", "us")    # insert carries the value
        assert rows[0][1] is None            # survivor NULL-backfills
        assert rows[2][1] is None
        assert len(rows) == 9
        # time travel to the pre-evolution version keeps the old shape
        assert mt.read(version=1).columns == ["id", "pt", "v"]
        # CDC across the evolution boundary: from-side NULL-backfills
        d = mt.changes(1, 2)
        assert "region" in d.columns
        ins = {
            r.id: r.region
            for r in d.filter("_change_type = 'insert'").collect()
        }
        assert ins[1] == "eu" and ins[100] == "us"
        dels = d.filter("_change_type = 'delete'").collect()
        assert {r.id for r in dels} == {1}
        assert all(r.region is None for r in dels)

    def test_evolution_composes_with_file_granular(self, spark, tmp_path):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        mt0 = _mtimes(mt.path)
        upd = spark.createDataFrame(
            [(500, 0, 9.9, "gold")],
            "id int, pt int, v double, tier string",
        )
        merge_into_partitioned(
            spark, mt.path, upd, ["id"], ["pt"],
            schema_evolution=True, retain_versions=5,
        )
        # file-granular: pre-existing files byte-untouched, most carried
        assert all(os.path.getmtime(p) == t for p, t in mt0.items())
        e = next(
            x
            for x in mt.manifest()["entries"]
            if x["key"] == '[["int", 0]]'
        )
        carried = [n for n in e["files"] if "/" in n]
        assert len(carried) == 3, e["files"]
        got = mt.read()
        assert got.filter("tier = 'gold'").collect()[0].id == 500
        # carried files (pre-evolution bytes) NULL-backfill on read
        assert got.filter("tier is null").count() == 999
        assert got.count() == 1000

    def test_ordered_mode_evolution(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = _mk_status_table(spark, path)
        upd = spark.createDataFrame(
            [(1, 1, "newer", 10, "U", "eu"),
             (3, 1, "gone", 11, "D", None)],
            "id int, pt int, v string, ts int, op string, region string",
        )
        # the status table stores neither ts nor region: BOTH evolve
        # in one ordered merge (op is consumed, never stored)
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            delete_op="D", ts_col="ts",
            schema_evolution=True, retain_versions=5,
        )
        got = {r.id: (r.v, r.ts, r.region) for r in mt.read().collect()}
        assert 3 not in got                    # newest write is a delete
        assert got[1] == ("newer", 10, "eu")   # ordered winner
        assert got[0] == ("v0", None, None)    # survivor NULL-backfills
        assert len(got) == 7

    def test_conditional_clauses_refuse_evolution(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _mk_status_table(spark, path)
        upd = spark.createDataFrame(
            [(1, 1, "nv")], "id int, pt int, v string"
        )
        with pytest.raises(ValueError, match="blind/ordered"):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"],
                when_matched_update={"v": "s.v"},
                schema_evolution=True,
            )

    def test_optimistic_refuses_evolution(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _mk_status_table(spark, path)
        upd = spark.createDataFrame(
            [(1, 1, "nv")], "id int, pt int, v string"
        )
        with pytest.raises(ValueError, match="optimistic"):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"],
                optimistic=True, schema_evolution=True,
            )

    def test_plain_layout_refuses_extras_and_evolution(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 2, f"v{i}") for i in range(8)],
            "id int, pt int, v string",
        )
        df.write.partitionBy("pt").parquet(path)
        upd = spark.createDataFrame(
            [(1, 1, "nv", "eu")],
            "id int, pt int, v string, region string",
        )
        with pytest.raises(ValueError, match="drop them from the delta"):
            merge_into_partitioned(spark, path, upd, ["id"], ["pt"])
        with pytest.raises(ValueError, match="manifest table"):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], schema_evolution=True
            )
        # table unchanged by both refusals
        assert spark.read.parquet(path).count() == 8

    def test_tombstoned_name_refused_before_commit(self, spark, tmp_path):
        path = str(tmp_path / "t")
        mt = _mk_status_table(spark, path)
        mt.drop_columns(["v"])
        ver = mt.current_version()
        upd = spark.createDataFrame(
            [(1, 1, "zombie")], "id int, pt int, v string"
        )
        with pytest.raises(ValueError, match="dropped"):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"],
                schema_evolution=True, retain_versions=5,
            )
        assert mt.current_version() == ver

    def test_exact_schema_delta_unaffected(self, spark, tmp_path):
        # the refusal must not fire for a delta that matches the
        # stored schema (with or without op_col)
        path = str(tmp_path / "t")
        mt = _mk_status_table(spark, path)
        upd = spark.createDataFrame(
            [(1, 1, "nv", "U"), (3, 1, "x", "D")],
            "id int, pt int, v string, op string",
        )
        merge_into_partitioned(
            spark, path, upd, ["id"], ["pt"], op_col="op",
            retain_versions=5,
        )
        got = {r.id for r in mt.read().collect()}
        assert 3 not in got and 1 in got and len(got) == 7


class TestCarriedRefReclaim:
    """r15 reclaim loop: ``compact(min_carried=)`` localizes the
    partitions whose carried refs (file-granular DML/merge survivors)
    pin old generations; the sink's ``compact_min_carried`` arms it on
    the auto-compaction cadence — closing the loop the r14 signals
    (``small_file_report`` ``carried``, vacuum dry-run pinned-gens)
    only observed."""

    def test_compact_min_carried_localizes_selectively(
        self, spark, tmp_path
    ):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        mt.delete_where([("pt", "=", 0), ("id", "=", 10)],
                        retain_versions=5)
        state = sorted(
            (r.id, r.pt, r.v) for r in mt.read().collect()
        )
        rep = {r["key"]: r for r in mt.small_file_report()}
        assert rep['[["int", 0]]']["carried"] == 3
        assert rep['[["int", 1]]']["carried"] == 0
        e1_before = next(
            e for e in mt.manifest()["entries"]
            if e["key"] == '[["int", 1]]'
        )
        vbefore = mt.current_version()
        n = mt.compact(min_carried=1, retain_versions=5)
        assert n == 1  # ONLY the carrying partition rewrote
        e1_after = next(
            e for e in mt.manifest()["entries"]
            if e["key"] == '[["int", 1]]'
        )
        assert e1_after["dir"] == e1_before["dir"]  # untouched
        rep2 = {r["key"]: r for r in mt.small_file_report()}
        assert all(r["carried"] == 0 for r in rep2.values())
        # the compaction is semantically a no-op: empty diff
        assert mt.changes(vbefore, vbefore + 1).count() == 0
        assert (
            sorted((r.id, r.pt, r.v) for r in mt.read().collect())
            == state
        )

    def test_pinned_generation_becomes_sweepable(self, spark, tmp_path):
        # ONE partition: after the fg delete its entry lives in g2
        # with carried refs into g1, so g1 is alive ONLY through the
        # refs — the dry-run names it pinned; the reclaim sweep
        # localizes, and vacuum can finally drop g1
        mt = _mk_clustered_stable(
            spark, str(tmp_path / "t"), n=1000, npart=1, files_per=4
        )
        mt.delete_where([("id", "=", 10)], retain_versions=1)
        state = sorted(r.id for r in mt.read().collect())
        plan = mt.vacuum(dry_run=True, retain_versions=1)
        assert plan["generations_pinned_by_carried_refs"] == [
            "g00000001"
        ], plan
        assert mt.compact(min_carried=1, retain_versions=1) == 1
        plan2 = mt.vacuum(dry_run=True, retain_versions=1)
        assert plan2["generations_pinned_by_carried_refs"] == []
        # the compact's own GC (retain 1) already swept the formerly
        # pinned generation — nothing pins it anymore
        assert not os.path.isdir(f"{mt.path}/_data/g00000001")
        assert sorted(r.id for r in mt.read().collect()) == state

    def test_no_carried_sweep_publishes_nothing(self, spark, tmp_path):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        v = mt.current_version()
        assert mt.compact(min_carried=1) == 0
        assert mt.current_version() == v

    def test_sink_reclaims_across_armed_batch(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        # existing clustered manifest table; the sink merges into it
        table = str(tmp_path / "table")
        mt = _mk_clustered_stable(spark, table)
        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "id int, pt int, v double, ts long, op string"
        # three point-upsert batches: each is an fg merge that carries
        # refs; batch 2 ((2+1) % 3 == 0) arms the reclaim sweep
        for i in range(3):
            b = spark.createDataFrame(
                [(500 + i, (500 + i) % 2, 777.0 + i, 100 + i, "U")],
                schema,
            )
            tmp = str(tmp_path / f"w{i}")
            b.coalesce(1).write.parquet(tmp)
            pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            os.rename(f"{tmp}/{pf}", f"{src}/{i:03d}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # the table stores no ts: the sink's ordered merge needs it —
        # evolve it in first so batches are exact-schema
        merge_into_partitioned(
            spark, table,
            spark.createDataFrame([(0, 0, 0.0, 0)],
                                  "id int, pt int, v double, ts long"),
            ["id"], ["pt"], schema_evolution=True, retain_versions=5,
        )
        q = start_changelog_merge_sink(
            spark, stream, table, "id", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"), layout="manifest",
            retain_versions=10,
            compact_min_carried=1, compact_every=3,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rep = {r["key"]: r for r in mt.small_file_report()}
        assert all(r["carried"] == 0 for r in rep.values()), rep
        got = {r.id: (r.v, r.ts) for r in mt.read().collect()}
        assert got[500] == (777.0, 100)
        assert got[501] == (778.0, 101)
        assert got[502] == (779.0, 102)
        assert len(got) == 1000  # the ts-backfill probe upserted id=0
        # feed continuity: the whole history diffs cleanly to the
        # final state (no torn version, no unreadable manifest)
        assert mt.changes(1, mt.current_version()).count() > 0


class TestOptimisticFileGranular:
    """r15: file granularity on the OPTIMISTIC path — stage_commit
    threads carry_files; sound because the rebase compares whole
    entry identities, so a rebase succeeds exactly when the carrying
    entries are unchanged between base and winner."""

    def test_optimistic_fg_delete_state_and_carry(self, spark, tmp_path):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        mt0 = _mtimes(mt.path)
        r = mt.delete_where(
            [("pt", "=", 0), ("id", "=", 10)],
            retain_versions=5, optimistic=True,
        )
        assert r["entries_file_scoped"] == 1, r
        assert r["files_rewritten"] == 1 and r["files_carried"] == 3, r
        assert r["rows_deleted"] == 1
        assert all(os.path.getmtime(p) == t for p, t in mt0.items())
        assert mt.changes(1, 2).count() == 1
        got = sorted(row.id for row in mt.read().collect())
        assert got == [i for i in range(1000) if i != 10]

    def test_optimistic_fg_merge_carries(self, spark, tmp_path):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        mt0 = _mtimes(mt.path)
        d = spark.createDataFrame(
            [(500, 0, 9.5)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"],
            retain_versions=5, optimistic=True,
        )
        op = [
            h.get("op") or {}
            for h in mt.history()
            if (h.get("op") or {}).get("name") == "merge"
        ][-1]
        assert op.get("optimistic") and op.get("file_scoped") == 1, op
        assert all(os.path.getmtime(p) == t for p, t in mt0.items())
        got = {row.id: row.v for row in mt.read().collect()}
        assert got[500] == 9.5 and len(got) == 1000

    def test_rebase_over_disjoint_winner_keeps_carry(
        self, spark, tmp_path, monkeypatch
    ):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        real = ManifestTable.commit_staged
        fired = []

        def inject(self2, staged, **kw):
            if not fired:
                fired.append(1)
                # DISJOINT winner lands between stage and publish:
                # a locked fg delete in the OTHER partition
                ManifestTable(spark, mt.path).delete_where(
                    [("pt", "=", 1), ("id", "=", 11)],
                    retain_versions=5,
                )
            return real(self2, staged, **kw)

        monkeypatch.setattr(ManifestTable, "commit_staged", inject)
        r = mt.delete_where(
            [("pt", "=", 0), ("id", "=", 10)],
            retain_versions=5, optimistic=True,
        )
        assert r["entries_file_scoped"] == 1, r
        ids = {row.id for row in mt.read().collect()}
        assert 10 not in ids and 11 not in ids and len(ids) == 998
        # both partitions still carry refs from their own fg deletes
        rep = {x["key"]: x["carried"] for x in mt.small_file_report()}
        assert all(c >= 1 for c in rep.values()), rep

    def test_conflicting_same_partition_refuses(
        self, spark, tmp_path, monkeypatch
    ):
        mt = _mk_clustered_stable(spark, str(tmp_path / "t"))
        real = ManifestTable.commit_staged
        fired = []

        def inject(self2, staged, **kw):
            if not fired:
                fired.append(1)
                # winner touches the SAME partition (files-map-only
                # change): the rebase must refuse, never resurrect
                ManifestTable(spark, mt.path).delete_where(
                    [("pt", "=", 0), ("id", "=", 12)],
                    retain_versions=5,
                )
            return real(self2, staged, **kw)

        monkeypatch.setattr(ManifestTable, "commit_staged", inject)
        with pytest.raises(ConcurrentWriterError):
            mt.delete_where(
                [("pt", "=", 0), ("id", "=", 10)],
                retain_versions=5, optimistic=True,
            )
        ids = {row.id for row in mt.read().collect()}
        # winner's delete intact; the loser's never landed
        assert 12 not in ids and 10 in ids and len(ids) == 999
        # loser aborted its staging (no leaked .stage dirs)
        assert [
            n
            for n in os.listdir(f"{mt.path}/_data")
            if n.startswith(".stage")
        ] == []

    def test_carried_gens_survive_gc_on_optimistic_path(
        self, spark, tmp_path
    ):
        mt = _mk_clustered_stable(
            spark, str(tmp_path / "t"), npart=1, files_per=4
        )
        mt.delete_where(
            [("id", "=", 10)], retain_versions=1, optimistic=True
        )
        mt.delete_where(
            [("id", "=", 700)], retain_versions=1, optimistic=True
        )
        mt.vacuum(retain_versions=1)
        got = sorted(row.id for row in mt.read().collect())
        assert got == [i for i in range(1000) if i not in (10, 700)]


class TestAddColumns:
    """r15 metadata-only ALTER TABLE ADD COLUMNS — the twin of
    drop_columns and the first step of the documented rename recipe
    (add → backfill via update_where → drop)."""

    def test_metadata_only_add_and_null_backfill(self, spark, tmp_path):
        mt = _mk_status_table(spark, str(tmp_path / "t"))
        mt0 = _mtimes(mt.path)
        v = mt.add_columns(
            {"region": "string", "score": "decimal(10,2)"},
            retain_versions=5,
        )
        assert v == 2
        # zero data I/O: every file byte-untouched, entries verbatim
        assert _mtimes(mt.path) == mt0
        assert mt.changes(1, 2).count() == 0
        got = mt.read()
        assert got.columns == ["id", "pt", "v", "region", "score"]
        assert got.filter("region is null and score is null").count() == 8
        assert mt.read(version=1).columns == ["id", "pt", "v"]
        flds = {f.name: f for f in mt.schema().fields}
        assert flds["region"].nullable and flds["score"].nullable
        assert flds["score"].dataType.simpleString() == "decimal(10,2)"

    def test_rename_recipe_end_to_end(self, spark, tmp_path):
        # add-new → backfill → drop-old: the SCALE.md r13 recipe,
        # now fully first-class
        mt = _mk_status_table(spark, str(tmp_path / "t"))
        mt.add_columns({"v2": "string"}, retain_versions=5)
        mt.update_where(
            [("id", ">=", 0)], set={"v2": "v"}, retain_versions=5
        )
        mt.drop_columns(["v"], retain_versions=5)
        got = {r.id: r.v2 for r in mt.read().collect()}
        assert got == {i: f"v{i}" for i in range(8)}
        assert mt.read().columns == ["id", "pt", "v2"]

    def test_refusals(self, spark, tmp_path):
        mt = _mk_status_table(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError, match="already exist"):
            mt.add_columns({"v": "string"})
        with pytest.raises(ValueError, match="reserved"):
            mt.add_columns({"_p_x": "int"})
        with pytest.raises(ValueError, match="at least one"):
            mt.add_columns({})
        mt.drop_columns(["v"], retain_versions=5)
        with pytest.raises(ValueError, match="dropped"):
            mt.add_columns({"v": "string"})
        # all refusals pre-commit
        assert mt.current_version() == 2  # only the drop committed

    def test_merge_after_add_fills_values(self, spark, tmp_path):
        # an added column participates in later merges like any other
        mt = _mk_status_table(spark, str(tmp_path / "t"))
        mt.add_columns({"region": "string"}, retain_versions=5)
        upd = spark.createDataFrame(
            [(1, 1, "nv", "eu")],
            "id int, pt int, v string, region string",
        )
        merge_into_partitioned(
            spark, mt.path, upd, ["id"], ["pt"], retain_versions=5
        )
        rows = {r.id: r.region for r in mt.read().collect()}
        assert rows[1] == "eu"
        assert all(v is None for k, v in rows.items() if k != 1)


class TestSinkSchemaEvolution:
    """r15: the sink threads schema_evolution into its per-batch
    ordered merge — the restart-after-producer-upgrade shape (stream
    schema has a column the TABLE predates)."""

    def _drive(self, spark, tmp_path, **sink_kw):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        table = str(tmp_path / "table")
        # the table predates the producer's new `region` column
        df = spark.createDataFrame(
            [(i, i % 2, float(i), 0) for i in range(8)],
            "id int, pt int, v double, ts long",
        )
        stage = str(tmp_path / "seed")
        df.write.parquet(stage)
        ManifestTable(spark, table).create(
            spark.read.parquet(stage), ["pt"]
        )
        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "id int, pt int, v double, ts long, region string, op string"
        b = spark.createDataFrame(
            [(1, 1, 101.0, 5, "eu", "U")], schema
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
            spark, stream, table, "id", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"), layout="manifest",
            retain_versions=10, **sink_kw,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return ManifestTable(spark, table)

    def test_evolving_sink_appends_column(self, spark, tmp_path):
        mt = self._drive(spark, tmp_path, schema_evolution=True)
        got = {r.id: (r.v, r.region) for r in mt.read().collect()}
        assert got[1] == (101.0, "eu")
        assert got[0] == (0.0, None)  # survivor NULL-backfills
        assert len(got) == 8

    def test_default_stays_loud(self, spark, tmp_path):
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        with pytest.raises(StreamingQueryException, match="schema_evolution"):
            self._drive(spark, tmp_path)

    def test_hive_layout_refuses_at_start(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = str(tmp_path / "src_empty")
        os.makedirs(src)
        with pytest.raises(ValueError, match="manifest"):
            start_changelog_merge_sink(
                spark,
                spark.readStream.schema("id int, pt int, ts long, op string")
                .parquet(src),
                str(tmp_path / "t"),
                "id", ["pt"], "ts", "op",
                str(tmp_path / "ckpt"),
                schema_evolution=True,
            )


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _mixed_table(spark, root):
    """All-nullable clustered fixture with NaN/NULL landmines (the
    r14 fuzz shape) — nullable throughout so the OPTIMISTIC path's
    schema-drift guard never fires incidentally."""
    rows = [(i, i % 3, float(i)) for i in range(400)]
    rows += [(500, 0, float("nan")), (501, 1, None), (502, 2, None)]
    df = (
        spark.createDataFrame(rows, "id int, pt int, v double")
        .repartitionByRange(12, "pt", "id")
        .sortWithinPartitions("pt", "id")
    )
    mt = ManifestTable(spark, str(root / "t"))
    mt.create(df, ["pt"])
    return mt, df


def _r15_clause():
    id_lo = st.sampled_from([0, 37, 150, 288, 399])
    return st.one_of(
        st.tuples(id_lo, st.sampled_from([1, 13, 60])).map(
            lambda t: [("id", ">=", t[0]), ("id", "<", t[0] + t[1])]
        ),
        st.sampled_from(
            [
                [("v", ">", 390.0)],
                [("pt", "=", 1), ("id", "<", 50)],
                [("id", "between", (100, 140))],
            ]
        ),
    )


class TestOptimisticFgChainFuzz:
    """Property (r15): a CHAIN of deletes alternating freely between
    the locked and optimistic commit paths — both now file-granular —
    still equals the chained filter recomputation, and the table
    verifies (carried refs resolve, no orphan membership)."""

    @given(
        seq=st.lists(
            st.tuples(_r15_clause(), st.booleans()),
            min_size=2,
            max_size=3,
        ),
    )
    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_mixed_path_chain_equals_recompute(
        self, spark, tmp_path_factory, seq
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        root = tmp_path_factory.mktemp("ofg_fuzz")
        mt, df = _mixed_table(spark, root)
        cur = df
        for where, opt in seq:
            pred = _where_to_filter(_normalize_where(where))
            mt.delete_where(where, retain_versions=2, optimistic=opt)
            cur = cur.filter(~F.coalesce(pred, F.lit(False)))
        got = sorted(row.id for row in mt.read().collect())
        want = sorted(row.id for row in cur.collect())
        assert got == want, seq
        assert mt.verify_table()["ok"], seq


class TestEvolutionMergeFuzz:
    """Property (r15): a blind evolution merge (random band, random
    tombstone mix, one new column) equals the relational
    recomputation — winners carry the new value, survivors and
    non-band rows NULL."""

    @given(
        lo=st.sampled_from([0, 50, 150, 300]),
        width=st.sampled_from([5, 40, 90]),
        with_deletes=st.booleans(),
    )
    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_blind_evolution_equals_recompute(
        self, spark, tmp_path_factory, lo, width, with_deletes
    ):
        root = tmp_path_factory.mktemp("evo_fuzz")
        mt, df = _mixed_table(spark, root)
        hi = lo + width
        del_lo, del_hi = hi, hi + (20 if with_deletes else 0)
        upd = df.filter(
            (F.col("id") >= lo) & (F.col("id") < hi)
        ).select(
            "id", "pt", (F.col("v") + 1000).alias("v"),
            F.concat(F.lit("t"), F.col("id")).alias("tag"),
            F.lit("U").alias("op"),
        )
        dele = df.filter(
            (F.col("id") >= del_lo) & (F.col("id") < del_hi)
        ).select(
            "id", "pt", "v",
            F.lit(None).cast("string").alias("tag"),
            F.lit("D").alias("op"),
        )
        merge_into_partitioned(
            spark, mt.path, upd.unionByName(dele), ["id"], ["pt"],
            op_col="op", schema_evolution=True, retain_versions=2,
        )
        def canon(rows):
            return sorted(
                (
                    r.id,
                    "NaN" if (r.v is not None and r.v != r.v) else r.v,
                    r.tag,
                )
                for r in rows
            )
        want = (
            df.filter(
                (F.col("id") < del_lo) | (F.col("id") >= del_hi)
            )
            .select(
                "id",
                "pt",
                F.when(
                    (F.col("id") >= lo) & (F.col("id") < hi),
                    F.col("v") + 1000,
                ).otherwise(F.col("v")).alias("v"),
                F.when(
                    (F.col("id") >= lo) & (F.col("id") < hi),
                    F.concat(F.lit("t"), F.col("id")),
                ).alias("tag"),
            )
        )
        assert canon(mt.read().collect()) == canon(want.collect()), (
            lo, width, with_deletes,
        )


class TestEvolutionInteractions:
    """r15 cross-feature pins: restore across an evolution boundary
    keeps the superset schema (documented contract), and evolution
    composes with the stats fold conservatively."""

    def test_restore_across_evolution_boundary(self, spark, tmp_path):
        mt = _mk_status_table(spark, str(tmp_path / "t"))
        upd = spark.createDataFrame(
            [(1, 1, "nv", "eu")],
            "id int, pt int, v string, region string",
        )
        merge_into_partitioned(
            spark, mt.path, upd, ["id"], ["pt"],
            schema_evolution=True, retain_versions=5,
        )
        v = mt.restore(1, retain_versions=5)
        got = mt.read()
        # superset schema survives the rollback; v1 files NULL-backfill
        assert got.columns == ["id", "pt", "v", "region"]
        rows = {r.id: (r.v, r.region) for r in got.collect()}
        assert rows[1] == ("v1", None)  # pre-evolution value restored
        assert len(rows) == 8
        # the rollback diff feeds like any commit
        d = mt.changes(2, v)
        assert d.filter("_change_type = 'delete' and id = 1").count() == 1

    def test_add_columns_then_evolution_merge(self, spark, tmp_path):
        # both add paths compose: metadata add, then a merge that
        # evolves a SECOND column while writing the first
        mt = _mk_status_table(spark, str(tmp_path / "t"))
        mt.add_columns({"region": "string"}, retain_versions=5)
        upd = spark.createDataFrame(
            [(1, 1, "nv", "eu", 9)],
            "id int, pt int, v string, region string, score int",
        )
        merge_into_partitioned(
            spark, mt.path, upd, ["id"], ["pt"],
            schema_evolution=True, retain_versions=5,
        )
        got = {r.id: (r.region, r.score) for r in mt.read().collect()}
        assert got[1] == ("eu", 9)
        assert all(v == (None, None) for k, v in got.items() if k != 1)
        assert mt.read().columns == ["id", "pt", "v", "region", "score"]


class TestCompactClusteringLoop:
    """r15: an UNCLUSTERED compaction rewrite silently destroys the
    key-disjoint per-file bounds the fg merges/DML depend on — the
    sink must be able to restore clustering in its armed sweeps
    (compact_cluster_by)."""

    def test_clustered_compact_restores_fg_selectivity(
        self, spark, tmp_path
    ):
        # the CDC accretion shape: files whose key bounds all span the
        # whole keyspace (hash-distributed writes), so a point delete
        # can prove nothing at the file level — then ONE clustered
        # compaction restores key-disjoint bounds and fg selectivity
        df = spark.createDataFrame(
            [(i, 0, float(i)) for i in range(1000)],
            "id int, pt int, v double",
        ).repartition(4)  # 4 files, each near-full-range on id
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        e = mt.manifest()["entries"][0]
        assert len(e["files"]) == 4
        r1 = mt.delete_where([("id", "=", 20)], retain_versions=5)
        # overlapping bounds: no file can be excluded — the statement
        # degrades to the whole partition (fg proves nothing)
        assert r1["entries_file_scoped"] == 0, r1
        mt.compact(
            retain_versions=5, cluster_by=["id"],
            target_records_per_file=250,
        )
        r2 = mt.delete_where([("id", "=", 30)], retain_versions=5)
        assert r2["entries_file_scoped"] == 1, r2
        assert r2["files_carried"] >= 1, r2
        got = sorted(row.id for row in mt.read().collect())
        assert got == [
            i for i in range(1000) if i not in (20, 30)
        ]

    def test_sink_threads_cluster_by(self, spark, tmp_path, monkeypatch):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        seen = []
        real = ManifestTable.compact

        def spy(self, **kw):
            seen.append(kw.get("cluster_by"))
            return real(self, **kw)

        monkeypatch.setattr(ManifestTable, "compact", spy)
        table = str(tmp_path / "table")
        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "id int, pt int, v double, ts long, op string"
        for i in range(2):
            b = spark.createDataFrame(
                [(100 * i + j, j % 2, float(i), 100 + i, "U") for j in range(6)],
                schema,
            )
            tmp = str(tmp_path / f"w{i}")
            b.coalesce(1).write.parquet(tmp)
            pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            os.rename(f"{tmp}/{pf}", f"{src}/{i:03d}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_changelog_merge_sink(
            spark, stream, table, "id", ["pt"], "ts", "op",
            str(tmp_path / "ckpt"), layout="manifest",
            retain_versions=10, compact_min_files=2, compact_every=1,
            compact_cluster_by=["id"],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert seen and all(cb == ["id"] for cb in seen), seen


class TestTailAcrossEvolution:
    """r15: a table_tail feed crossing a schema-evolution boundary —
    pre-evolution feed dirs lack the new column; read_changes_feed's
    current-superset explicit schema NULL-backfills them, and the
    folded feed equals the evolved table state."""

    def test_feed_crosses_evolution_boundary(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.table_tail import (
            read_changes_feed,
            start_table_changes_tail,
        )

        path = str(tmp_path / "t")
        mt = ManifestTable(spark, path)
        base = spark.createDataFrame(
            [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "x3")],
            "id int, pt string, v string",
        )
        mt.create(base, ["pt"])
        q = start_table_changes_tail(
            spark, path, str(tmp_path / "feed"), str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()  # v1 snapshot, OLD schema
            upd = spark.createDataFrame(
                [(1, "a", "X1", "eu", "U"), (9, "c", "x9", "us", "U")],
                "id int, pt string, v string, region string, op string",
            )
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col="op",
                schema_evolution=True, retain_versions=5,
            )
            q.processAllAvailable()  # v2 diff, NEW schema
        finally:
            q.stop()
        feed = read_changes_feed(spark, path, str(tmp_path / "feed"))
        assert "region" in feed.columns
        rows = {
            (r._commit_version, r.id, r.region, r._change_type)
            for r in feed.collect()
        }
        # v1 snapshot rows NULL-backfill region; v2 carries values
        assert (1, 1, None, "insert") in rows
        assert (2, 1, None, "delete") in rows
        assert (2, 1, "eu", "insert") in rows
        assert (2, 9, "us", "insert") in rows
        # folding the feed reproduces the evolved table state
        from pyspark.sql import Window

        w = Window.partitionBy("id").orderBy(
            F.col("_commit_version").desc(),
            F.col("_change_type").desc(),  # same-version update:
            # the insert IS the post-state; a bare delete means gone
        )
        latest = (
            feed.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1 and _change_type = 'insert'")
            .select("id", "pt", "v", "region")
        )
        got = sorted((tuple(r) for r in latest.collect()), key=repr)
        want = sorted((tuple(r) for r in mt.read().collect()), key=repr)
        assert got == want
