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


def _mtimes(root):
    import glob as _glob

    return {
        p: os.path.getmtime(p)
        for p in _glob.glob(f"{root}/_data/**/*.parquet", recursive=True)
    }


def _mk_clustered(spark, path, n=1000, npart=2, files_per=4):
    """id-clustered manifest table: ``files_per`` files per partition
    with DISJOINT id ranges, so per-file bounds are selective on id."""
    from pyspark.sql import functions as F2

    df = spark.range(0, n).select(
        F2.col("id").cast("int").alias("id"),
        (F2.col("id") % npart).cast("int").alias("pt"),
        (F2.col("id") * 1.0).alias("v"),
    )
    df = df.repartitionByRange(
        npart * files_per, "pt", "id"
    ).sortWithinPartitions("pt", "id")
    mt = ManifestTable(spark, path)
    mt.create(df, ["pt"])
    return mt


class TestFileGranularDML:
    """delete_where/update_where at FILE granularity (r14,
    deletion-vector-lite): per-file bounds select the files a
    predicate can touch; the rest carry forward byte-identically as
    carried references inside the same entry."""

    def test_point_delete_touches_subset_of_files(self, spark, tmp_path):
        mt = _mk_clustered(spark, str(tmp_path / "t"))
        mt0 = _mtimes(mt.path)
        r = mt.delete_where(
            [("id", ">=", 10), ("id", "<", 20)], retain_versions=5
        )
        assert r["entries_file_scoped"] == 2, r
        assert r["files_rewritten"] == 2 and r["files_carried"] == 6, r
        assert r["rows_deleted"] == 10, r
        # every pre-existing file is byte-untouched (immutable gens)
        assert all(
            os.path.getmtime(p) == t for p, t in mt0.items()
        )
        assert mt.read().count() == 990
        assert mt.read().filter("10 <= id and id < 20").count() == 0
        # CDC sees exactly the deleted rows
        assert mt.changes(1, 2).count() == 10

    def test_update_file_scoped_state_and_carry(self, spark, tmp_path):
        mt = _mk_clustered(spark, str(tmp_path / "t"))
        r = mt.update_where(
            [("id", "=", 500)], set={"v": "v + 1000"},
            retain_versions=5,
        )
        assert r["entries_file_scoped"] == 1, r
        assert r["files_rewritten"] == 1 and r["files_carried"] == 3, r
        assert r["rows_updated"] == 1
        assert mt.read().filter("id = 500").collect()[0].v == 1500.0
        # full state equals the relational recomputation
        got = sorted(
            (row.id, row.pt, row.v) for row in mt.read().collect()
        )
        want = sorted(
            (i, i % 2, float(i) + (1000.0 if i == 500 else 0.0))
            for i in range(1000)
        )
        assert got == want

    def test_emptied_file_keeps_old_dir_and_cdc_fires(
        self, spark, tmp_path
    ):
        # ONE partition, 4 id-disjoint files; the predicate swallows
        # the first file ENTIRELY → the rewrite output is empty, the
        # entry keeps the old dir with only carried references — and
        # the change feed must still see the delete (whole-entry
        # comparison, not dir-only)
        mt = _mk_clustered(
            spark, str(tmp_path / "t"), n=1000, npart=1, files_per=4
        )
        e0 = mt.manifest()["entries"][0]
        fmap0 = e0["files"]
        # bounds of the first file
        import operator

        first = min(
            fmap0.items(),
            key=lambda kv: kv[1]["cols"]["id"]["mn"][1],
        )
        lo = first[1]["cols"]["id"]["mn"][1]
        hi = first[1]["cols"]["id"]["mx"][1]
        nrows = first[1]["rows"]
        r = mt.delete_where(
            [("id", ">=", lo), ("id", "<=", hi)], retain_versions=5
        )
        assert r["rows_deleted"] == nrows, (r, nrows)
        e1 = mt.manifest()["entries"][0]
        assert e1["dir"] == e0["dir"]  # no new generation dir needed
        assert all("/" in n for n in e1["files"]), e1["files"]
        assert len(e1["files"]) == 3
        assert mt.changes(1, 2).count() == nrows
        assert mt.read().count() == 1000 - nrows

    def test_entry_admits_but_no_file_does_publishes_nothing(
        self, spark, tmp_path
    ):
        # bimodal ids: entry bounds [0,99]∪[900,999] admit id≈500 but
        # no FILE's bounds do — the statement provably matches
        # nothing and must not publish a version
        from pyspark.sql import functions as F2

        df = (
            spark.range(0, 200)
            .select(
                F2.when(F2.col("id") < 100, F2.col("id"))
                .otherwise(F2.col("id") + 700)
                .cast("int")
                .alias("id"),
                F2.lit(0).cast("int").alias("pt"),
                F2.lit(1.0).alias("v"),
            )
            .repartitionByRange(2, "id")
            .sortWithinPartitions("id")
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        ver = mt.current_version()
        r = mt.delete_where(
            [("id", ">=", 400), ("id", "<", 600)], retain_versions=5
        )
        assert r["rows_deleted"] == 0, r
        assert mt.current_version() == ver
        assert mt.read().count() == 200

    def test_chained_fg_dml_and_gc_keeps_carried_generations(
        self, spark, tmp_path
    ):
        mt = _mk_clustered(
            spark, str(tmp_path / "t"), n=1000, npart=1, files_per=4
        )
        mt.delete_where([("id", "=", 10)], retain_versions=1)
        mt.delete_where([("id", "=", 700)], retain_versions=1)
        # retention 1: only the newest manifest survives, but BOTH
        # prior generations hold carried files and must survive GC
        mt.vacuum(retain_versions=1)
        assert mt.read().count() == 998
        got = sorted(row.id for row in mt.read().collect())
        assert got == [i for i in range(1000) if i not in (10, 700)]
        # compact localizes; a fresh vacuum can then drop old gens
        mt.compact(retain_versions=1)
        mt.vacuum(retain_versions=1)
        assert mt.read().count() == 998
        import glob as _glob

        gens = {
            os.path.basename(p)
            for p in _glob.glob(f"{mt.path}/_data/g*")
        }
        assert len(gens) == 1, gens  # everything folded into one gen

    def test_restore_across_fg_dml(self, spark, tmp_path):
        mt = _mk_clustered(spark, str(tmp_path / "t"))
        before = sorted(map(tuple, mt.read().collect()))
        mt.delete_where(
            [("id", ">=", 100), ("id", "<", 200)], retain_versions=5
        )
        assert mt.read().count() == 900
        mt.restore(1)
        assert sorted(map(tuple, mt.read().collect())) == before

    def test_clone_of_mixed_entries_both_ways(self, spark, tmp_path):
        mt = _mk_clustered(spark, str(tmp_path / "t"))
        mt.delete_where([("id", "=", 42)], retain_versions=5)
        state = sorted(map(tuple, mt.read().collect()))
        sh = mt.clone_to(str(tmp_path / "sh"))
        assert sorted(map(tuple, sh.read().collect())) == state
        # every key in the shallow clone resolves without the dest
        # table's root: absolute dirs AND absolutized carried keys
        for e in sh.manifest()["entries"]:
            for n in e.get("files") or ():
                assert "/" not in n or _is_abs_dir(n), n
        dp = mt.clone_to(str(tmp_path / "dp"), deep=True)
        assert sorted(map(tuple, dp.read().collect())) == state
        # deep clone owns its bytes: source removal cannot break it
        import shutil as _shutil

        _shutil.rmtree(mt.path)
        assert sorted(map(tuple, dp.read().collect())) == state
        assert dp.verify_table()["ok"]

    def test_fg_optout_and_optimistic_file_granular(
        self, spark, tmp_path
    ):
        mt = _mk_clustered(spark, str(tmp_path / "t"))
        r = mt.delete_where(
            [("id", "=", 3)], retain_versions=5, file_granular=False
        )
        assert r["entries_file_scoped"] == 0, r
        assert r["rows_deleted"] == 1
        # r15: the optimistic path carries too (the staged publish
        # threads carry_files; the whole-entry rebase identity keeps
        # it sound) — a point delete is file-scoped on EITHER path
        r2 = mt.delete_where(
            [("id", "=", 5)], retain_versions=5, optimistic=True
        )
        # a bare id predicate admits one file in EACH mod-2 partition
        assert r2["entries_file_scoped"] == 2, r2
        assert r2["files_rewritten"] == 2, r2
        assert r2["files_carried"] >= 1, r2
        assert r2["rows_deleted"] == 1
        assert mt.read().count() == 998

    def test_fg_delete_randomized_soundness(self, spark, tmp_path):
        # randomized range deletes vs relational recomputation —
        # every statement's post-state must equal filter-recompute,
        # whatever mix of dropped/file-scoped/full entries it takes
        import random

        rng = random.Random(1411)
        mt = _mk_clustered(
            spark, str(tmp_path / "t"), n=800, npart=2, files_per=4
        )
        alive = set(range(800))
        for _ in range(5):
            lo = rng.randrange(0, 800)
            hi = lo + rng.randrange(1, 120)
            r = mt.delete_where(
                [("id", ">=", lo), ("id", "<", hi)], retain_versions=2
            )
            expect_del = len([i for i in alive if lo <= i < hi])
            alive -= set(range(lo, hi))
            assert r["rows_deleted"] == expect_del, (lo, hi, r)
            got = sorted(row.id for row in mt.read().collect())
            assert got == sorted(alive), (lo, hi)
            # metadata count agrees without touching data
            assert mt.count() == len(alive)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _fg_clause():
    """Clause strategy biased toward NARROW id ranges (the shapes
    that engage the file-scoped path on a clustered layout), plus v
    clauses with NaN and pcol clauses for the mixed paths."""
    id_lo = st.sampled_from([0, 37, 150, 288, 399, 512])
    return st.one_of(
        st.tuples(id_lo, st.sampled_from([1, 13, 60])).map(
            lambda t: [
                ("id", ">=", t[0]),
                ("id", "<", t[0] + t[1]),
            ]
        ),
        st.sampled_from(
            [
                [("v", ">", 390.0)],
                [("v", "<=", 5.0)],
                [("v", "=", float("nan"))],
                [("v", "is_null")],
                [("pt", "=", 1), ("id", "<", 50)],
                [("id", "between", (100, 140))],
                [("id", "in", [3, 77, 401, 9999])],
            ]
        ),
    )


class TestFgDmlSoundnessFuzz:
    """Property (r14): with file-granular rewriting ON (the default)
    and a clustered multi-file layout, DELETE still removes EXACTLY
    the predicate's rows and UPDATE still equals the CASE
    recomputation — whatever mix of untouched / file-scoped / full
    entries each statement lands on — and no pre-existing data file
    is ever modified in place."""

    def _mk(self, spark, root):
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

    @given(where=_fg_clause())
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_fg_delete_equals_filtered_recomputation(
        self, spark, tmp_path_factory, where
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        root = tmp_path_factory.mktemp("fg_fuzz")
        mt, df = self._mk(spark, root)
        import glob as _glob

        mt0 = {
            p: os.path.getmtime(p)
            for p in _glob.glob(
                f"{mt.path}/_data/**/*.parquet", recursive=True
            )
        }
        pred = _where_to_filter(_normalize_where(where))
        r = mt.delete_where(where, retain_versions=2)
        got = sorted(row.id for row in mt.read().collect())
        want = sorted(
            row.id
            for row in df.filter(
                ~F.coalesce(pred, F.lit(False))
            ).collect()
        )
        assert got == want, (where, r)
        assert all(os.path.getmtime(p) == t for p, t in mt0.items()), (
            where,
            "a pre-existing file was modified in place",
        )
        # metadata count stays exact over mixed entries
        assert mt.count() == len(want), where

    @given(where=_fg_clause(), bump=st.sampled_from([1.0, -3.5]))
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_fg_update_equals_case_recomputation(
        self, spark, tmp_path_factory, where, bump
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        root = tmp_path_factory.mktemp("fg_fuzz_u")
        mt, df = self._mk(spark, root)
        pred = _where_to_filter(_normalize_where(where))
        mt.update_where(where, set={"v": f"v + {bump}"})

        def canon(frame):
            return sorted(
                (r.id, "NaN" if (r.v is not None and r.v != r.v) else r.v)
                for r in frame.collect()
            )

        want = df.withColumn(
            "v",
            F.when(
                F.coalesce(pred, F.lit(False)), F.col("v") + F.lit(bump)
            ).otherwise(F.col("v")),
        )
        assert canon(mt.read().select("id", "v")) == canon(
            want.select("id", "v")
        ), where

    @given(
        seq=st.lists(_fg_clause(), min_size=2, max_size=3),
    )
    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def test_fg_chained_deletes_stay_sound(
        self, spark, tmp_path_factory, seq
    ):
        # successive statements over already-MIXED entries: carried
        # references carry again; state equals the chained recompute
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            _normalize_where,
            _where_to_filter,
        )

        root = tmp_path_factory.mktemp("fg_fuzz_c")
        mt, df = self._mk(spark, root)
        cur = df
        for where in seq:
            pred = _where_to_filter(_normalize_where(where))
            mt.delete_where(where, retain_versions=2)
            cur = cur.filter(~F.coalesce(pred, F.lit(False)))
        got = sorted(row.id for row in mt.read().collect())
        want = sorted(row.id for row in cur.collect())
        assert got == want, seq
        assert mt.verify_table()["ok"], seq


class TestZorderTemporal:
    """compact(zorder_by=) accepts date/timestamp columns (r14): the
    ephemeral key projects them onto a monotone epoch axis; file
    bounds become selective on the temporal dim AND the numeric dim."""

    def _grid(self, spark):
        # ts = day grid (0..63 days), y = independent value grid
        return spark.createDataFrame(
            [
                (
                    i,
                    __import__("datetime").datetime(2024, 1, 1)
                    + __import__("datetime").timedelta(
                        days=i // 64, minutes=i % 7
                    ),
                    float(i % 64),
                    i % 2,
                )
                for i in range(4096)
            ],
            "id int, ts timestamp, y double, pt int",
        )

    def _mk(self, spark, path, **compact_kw):
        mt = ManifestTable(spark, path)
        key = "spark.sql.files.maxRecordsPerFile"
        prev = spark.conf.get(key)
        spark.conf.set(key, "128")
        try:
            mt.create(self._grid(spark), ["pt"])
            if compact_kw:
                mt.compact(target_records_per_file=128, **compact_kw)
        finally:
            if prev in (None, "0"):
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return mt

    def test_zorder_timestamp_prunes_both_dims(self, spark, tmp_path):
        import datetime as _dt

        mt = self._mk(
            spark, str(tmp_path / "z"), zorder_by=["ts", "y"]
        )
        # temporal dim: last quarter of the day range
        wt = [("ts", ">=", _dt.datetime(2024, 2, 18))]
        zt = mt.prune_file_stats(wt)
        assert 0 < zt["files_scanned"] < zt["files_total"], zt
        # numeric second dim prunes too (the z-order property)
        wy = [("y", ">=", 48.0)]
        zy = mt.prune_file_stats(wy)
        assert 0 < zy["files_scanned"] < zy["files_total"], zy
        # the rewrite is a data no-op and reads stay exact
        assert mt.changes(1, 2).count() == 0
        n = mt.read(where=wt).count()
        assert n == 16 * 64, n  # days 48..63 inclusive, 64 rows each

    def test_zorder_date_column(self, spark, tmp_path):
        import datetime as _dt

        df = spark.createDataFrame(
            [
                (
                    i,
                    _dt.date(2024, 1, 1) + _dt.timedelta(days=i // 64),
                    float(i % 64),
                    0,
                )
                for i in range(4096)
            ],
            "id int, d date, y double, pt int",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        key = "spark.sql.files.maxRecordsPerFile"
        prev = spark.conf.get(key)
        spark.conf.set(key, "128")
        try:
            mt.create(df, ["pt"])
            mt.compact(
                zorder_by=["d", "y"], target_records_per_file=128
            )
        finally:
            if prev in (None, "0"):
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        zd = mt.prune_file_stats([("d", ">=", _dt.date(2024, 2, 18))])
        assert 0 < zd["files_scanned"] < zd["files_total"], zd
        zy = mt.prune_file_stats([("y", "<", 8.0)])
        assert 0 < zy["files_scanned"] < zy["files_total"], zy
        assert mt.read().count() == 4096

    def test_other_types_still_refused(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, "s" * (i % 3), 0) for i in range(10)],
            "id int, s string, pt int",
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        with pytest.raises(ValueError, match="cluster_by"):
            mt.compact(zorder_by=["s"])


class TestStatsExtent:
    """stats_extent(col): (min, max) from the manifest's entry bounds
    alone — the metadata twin of count() (r14)."""

    def test_extent_matches_data_and_is_zero_io(self, spark, tmp_path):
        mt = _mk_clustered(spark, str(tmp_path / "t"), n=500)
        assert mt.stats_extent("id") == (0, 499)
        assert mt.stats_extent("v") == (0.0, 499.0)
        # zero-I/O proof: delete the data, extent still answers
        shutil.rmtree(f"{mt.path}/_data")
        assert mt.stats_extent("id") == (0, 499)

    def test_unknown_column_or_gap_returns_none(self, spark, tmp_path):
        mt = _mk_clustered(spark, str(tmp_path / "t"), n=100)
        assert mt.stats_extent("nope") is None

    def test_extent_tracks_dml(self, spark, tmp_path):
        mt = _mk_clustered(spark, str(tmp_path / "t"), n=500, npart=1)
        mt.delete_where([("id", "<", 100)], retain_versions=2)
        lo, hi = mt.stats_extent("id")
        # folded over carried + rewritten file bounds: the new low
        # end can be no lower than the surviving minimum's FILE bound
        assert hi == 499 and lo <= mt.read().agg(F.min("id")).collect()[0][0]


class TestSinkTtlDelete:
    """start_changelog_merge_sink(ttl_keep=...) — event-time retention
    fused into the CDC sink (r14): every K-th batch expires rows older
    than the manifest-stats high watermark minus ttl_keep, as ONE
    atomic DML commit the change feed observes."""

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

    def test_ttl_expires_old_rows_feed_continuous(self, spark, tmp_path):
        # batches carry ts = 0, 100, 200; ttl_keep=150 with sweeps
        # after every batch: after the ts=200 batch the watermark is
        # 200, cutoff 50 → the 6 ts=0 rows expire
        table = self._drive(
            spark, tmp_path, ttl_keep=150, ttl_delete_every=1,
        )
        mt = ManifestTable(spark, table)
        assert mt.read().count() == 12
        assert mt.read().agg(F.min("ts")).collect()[0][0] == 100
        # the expiry is a real DML version the feed observes: some
        # version diff is exactly 6 deletes
        vs = mt.versions()
        diffs = [
            {
                r[0]: r[1]
                for r in mt.changes(a, b)
                .groupBy("_change_type")
                .count()
                .collect()
            }
            for a, b in zip(vs, vs[1:])
        ]
        assert {"delete": 6} in diffs, diffs
        # history names the delete op
        ops = [h.get("op", {}).get("name") for h in mt.history()]
        assert "delete" in ops, ops

    def test_quiet_sweep_burns_no_version(self, spark, tmp_path):
        # ttl_keep far above the ts span: every sweep matches nothing
        # and publishes nothing — versions = bootstrap + merges
        table = self._drive(
            spark, tmp_path, ttl_keep=10_000, ttl_delete_every=1,
        )
        mt = ManifestTable(spark, table)
        # bootstrap + 2 merges, NO ttl versions
        assert len(mt.versions()) == 3
        assert mt.read().count() == 18

    def test_start_time_guards(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
            start_changelog_merge_sink,
        )

        src = tmp_path / "empty_src"
        src.mkdir()
        stream = (
            spark.readStream.schema("id long, pt int, ts long, op string")
            .parquet(str(src))
        )
        for kw, msg in (
            (dict(ttl_keep=100), "layout='manifest'"),
            (dict(ttl_keep=0, layout="manifest"), "> 0"),
            (
                dict(ttl_keep=10, layout="manifest", ttl_delete_every=0),
                ">= 1",
            ),
        ):
            with pytest.raises(ValueError, match=msg):
                start_changelog_merge_sink(
                    spark, stream, str(tmp_path / "t"), "id", ["pt"],
                    "ts", "op", str(tmp_path / "c"), **kw,
                )


class TestFileGranularMerge:
    """merge_into_partitioned at FILE granularity (r14): within each
    touched partition only the files whose key bounds intersect the
    delta's key range are merged and rewritten; every other file
    carries forward byte-identically — the streaming CDC batch cost
    class at 100 TB."""

    def _mk(self, spark, path, n=1000, npart=2, files_per=4):
        mt = _mk_clustered(spark, path, n=n, npart=npart,
                           files_per=files_per)
        return mt

    def _last_merge_op(self, mt):
        ops = [h.get("op") or {} for h in mt.history()]
        merges = [o for o in ops if o.get("name") == "merge"]
        return merges[-1] if merges else {}

    def test_blind_point_upsert_carries_files(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"))
        mt0 = _mtimes(mt.path)
        d = spark.createDataFrame(
            [(500, 0, 999.0)], "id int, pt int, v double"
        )
        assert merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], retain_versions=5
        ) == 1
        assert all(os.path.getmtime(p) == t for p, t in mt0.items())
        assert self._last_merge_op(mt).get("file_scoped") == 1
        e = {
            x["key"]: x for x in mt.manifest()["entries"]
        }[_partition_key((0,))]  # pt=0 entry
        assert any("/" in k for k in e["files"])
        got = sorted((r.id, r.pt, r.v) for r in mt.read().collect())
        want = sorted(
            (i, i % 2, 999.0 if i == 500 else float(i))
            for i in range(1000)
        )
        assert got == want

    def test_tombstone_only_batch_file_scoped(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"), npart=1)
        d = spark.createDataFrame(
            [(10, 0, None, "D"), (11, 0, None, "D")],
            "id int, pt int, v double, op string",
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], op_col="op",
            retain_versions=5,
        )
        assert mt.read().count() == 998
        assert sorted(r.id for r in mt.read().collect()) == [
            i for i in range(1000) if i not in (10, 11)
        ]
        assert self._last_merge_op(mt).get("file_scoped") == 1

    def test_insert_outside_all_file_bounds_carries_everything(
        self, spark, tmp_path
    ):
        mt = self._mk(spark, str(tmp_path / "t"), npart=1)
        e0 = mt.manifest()["entries"][0]
        d = spark.createDataFrame(
            [(5000, 0, 1.0)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], retain_versions=5
        )
        e1 = mt.manifest()["entries"][0]
        # every original file carried; only the insert was written
        carried = [k for k in e1["files"] if "/" in k]
        assert len(carried) == len(e0["files"])
        assert mt.read().count() == 1001
        assert mt.count() == 1001  # metadata count over the fold

    def test_ordered_sink_semantics_over_clustered_table(
        self, spark, tmp_path
    ):
        # ordered merge: older upsert for a key in a sel file LOSES
        # to the stored row; newer wins; tombstone lands only if
        # newest — with the current rows living in bounded files
        from pyspark.sql import functions as F2

        df = (
            spark.createDataFrame(
                [(i, 0, float(i), 1000) for i in range(400)],
                "id int, pt int, v double, ts long",
            )
            .repartitionByRange(4, "pt", "id")
            .sortWithinPartitions("pt", "id")
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        d = spark.createDataFrame(
            [
                (10, 0, -1.0, 500, "U"),   # older: loses
                (11, 0, -2.0, 2000, "U"),  # newer: wins
                (12, 0, None, 2000, "D"),  # newest tombstone: deletes
                (13, 0, None, 500, "D"),   # older tombstone: no-op
            ],
            "id int, pt int, v double, ts long, op string",
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], op_col="op",
            ts_col="ts", retain_versions=5,
        )
        assert self._last_merge_op(mt).get("file_scoped") == 1
        got = {r.id: r.v for r in mt.read().collect()}
        assert got[10] == 10.0 and got[11] == -2.0
        assert 12 not in got and got[13] == 13.0
        assert len(got) == 399

    def test_conditional_clauses_file_scoped(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"), npart=1)
        # keys in a NARROW band — a min-max range mechanism is only
        # selective when the delta's keys are; one outlier key (e.g.
        # a far-off insert) legitimately widens the range to the
        # whole partition, same as Delta/Iceberg min-max skipping
        d = spark.createDataFrame(
            [(100, 0, 5.0), (101, 0, 5.0), (103, 0, 7.0)],
            "id int, pt int, v double",
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], retain_versions=5,
            when_matched_update={"v": "t.v + s.v"},
            when_matched_delete="s.id = 101",
        )
        assert self._last_merge_op(mt).get("file_scoped") == 1
        got = {r.id: r.v for r in mt.read().collect()}
        assert got[100] == 105.0 and 101 not in got
        assert got[103] == 110.0  # matched update: 103 + 7
        assert len(got) == 999  # 1000 - the deleted key

    def test_nmbs_disables_file_granularity(self, spark, tmp_path):
        mt = self._mk(spark, str(tmp_path / "t"), npart=1)
        d = spark.createDataFrame(
            [(100, 0, 5.0)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], retain_versions=5,
            when_not_matched_by_source_delete="t.id >= 990",
        )
        op = self._last_merge_op(mt)
        assert "file_scoped" not in op, op
        e = mt.manifest()["entries"][0]
        assert not any("/" in k for k in e.get("files") or ())
        got = sorted(r.id for r in mt.read().collect())
        assert got == list(range(990))

    def test_optout_and_optimistic_file_granular(
        self, spark, tmp_path
    ):
        mt = self._mk(spark, str(tmp_path / "t"), npart=1)
        d = spark.createDataFrame(
            [(3, 0, 0.5)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], retain_versions=5,
            file_granular=False,
        )
        assert "file_scoped" not in self._last_merge_op(mt)
        # r15: the optimistic merge carries too — the staged publish
        # threads carry_files, rebase-sound via whole-entry identity
        d2 = spark.createDataFrame(
            [(4, 0, 0.5)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, mt.path, d2, ["id"], ["pt"], retain_versions=5,
            optimistic=True,
        )
        op = self._last_merge_op(mt)
        assert op.get("optimistic") and op.get("file_scoped") == 1, op
        got = {r.id: r.v for r in mt.read().collect()}
        assert got[3] == 0.5 and got[4] == 0.5

    def test_chained_merges_then_compact_localizes(
        self, spark, tmp_path
    ):
        mt = self._mk(spark, str(tmp_path / "t"))
        for i, key in enumerate((100, 700, 333)):
            d = spark.createDataFrame(
                [(key, key % 2, -float(i))], "id int, pt int, v double"
            )
            merge_into_partitioned(
                spark, mt.path, d, ["id"], ["pt"], retain_versions=2
            )
        mt.vacuum(retain_versions=1)  # carried gens must survive
        got = {r.id: r.v for r in mt.read().collect()}
        assert got[100] == -0.0 and got[700] == -1.0 and got[333] == -2.0
        assert len(got) == 1000
        before = sorted(map(tuple, mt.read().collect()))
        mt.compact(retain_versions=1)
        mt.vacuum(retain_versions=1)
        assert sorted(map(tuple, mt.read().collect())) == before

    def test_fg_merge_randomized_vs_changelog_fold(
        self, spark, tmp_path
    ):
        # randomized ordered-CDC batches vs a driver-side dict fold —
        # the effectively-once sink semantics over mixed entries
        import random

        rng = random.Random(14014)
        from pyspark.sql import functions as F2

        df = (
            spark.createDataFrame(
                [(i, i % 2, float(i), 0) for i in range(600)],
                "id int, pt int, v double, ts long",
            )
            .repartitionByRange(8, "pt", "id")
            .sortWithinPartitions("pt", "id")
        )
        mt = ManifestTable(spark, str(tmp_path / "t"))
        mt.create(df, ["pt"])
        state = {i: (float(i), 0) for i in range(600)}
        for b in range(4):
            rows = []
            for _ in range(8):
                k = rng.randrange(0, 650)
                ts = (b + 1) * 100 + rng.randrange(0, 50)
                if rng.random() < 0.3:
                    rows.append((k, k % 2, None, ts, "D"))
                else:
                    rows.append((k, k % 2, float(b), ts, "U"))
            d = spark.createDataFrame(
                rows, "id int, pt int, v double, ts long, op string"
            )
            merge_into_partitioned(
                spark, mt.path, d, ["id"], ["pt"], op_col="op",
                ts_col="ts", tiebreak_cols=(), retain_versions=2,
            )
            # driver fold: per key, (ts, src)-max wins, delete only
            # if newest; batch rows beat current on ties via _mrg_src
            per_key = {}
            for k, _, v, ts, op in rows:
                cur = per_key.get(k)
                if cur is None or ts >= cur[1]:
                    # within one batch apply_changelog breaks ts ties
                    # by later-is-bigger on the fold's tiebreaks; our
                    # generator never reuses (k, ts) so >= is safe
                    if cur is None or ts > cur[1] or op == cur[2]:
                        per_key[k] = (v, ts, op)
            for k, (v, ts, op) in per_key.items():
                old = state.get(k)
                old_ts = old[1] if old else None
                if old is None or old_ts is None or ts >= old_ts:
                    if op == "D":
                        state.pop(k, None)
                    else:
                        state[k] = (v, ts)
            got = sorted(
                (r.id, r.v, r.ts) for r in mt.read().collect()
            )
            want = sorted((k, v, ts) for k, (v, ts) in state.items())
            assert got == want, f"batch {b}"

    def test_scattered_keys_use_exact_keyset(self, spark, tmp_path):
        # keys scattered across the whole id space: the min-max range
        # spans every file, but the exact key-set (IN) selection still
        # rewrites only the files actually holding a contested key
        mt = self._mk(spark, str(tmp_path / "t"), npart=1, files_per=8)
        # keys at BOTH ENDS of the id space: the min-max range
        # [3, 990] admits every file, so only the exact key-set (IN)
        # selection can carry the middle files
        upserts, deletes = [3, 55, 930], [990]
        d = spark.createDataFrame(
            [(k, 0, -1.0) for k in upserts]
            + [(k, 0, None) for k in deletes],
            "id int, pt int, v double",
        ).withColumn(
            "op",
            F.when(F.col("v").isNull(), F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], op_col="op",
            retain_versions=5,
        )
        assert self._last_merge_op(mt).get("file_scoped") == 1, (
            self._last_merge_op(mt)
        )
        e = mt.manifest()["entries"][0]
        carried = sum(1 for k in e["files"] if "/" in k)
        assert carried >= 4, e["files"]  # the middle files survive
        got = {r.id: r.v for r in mt.read().collect()}
        assert all(got[k] == -1.0 for k in upserts)
        assert all(k not in got for k in deletes)
        assert len(got) == 999

    def test_keyset_with_null_keys_in_delta(self, spark, tmp_path):
        # NULL keys contest nothing (SQL join semantics) but must not
        # break the key-set collection — they land as new rows while
        # the non-null keys still file-scope the merge
        mt = self._mk(spark, str(tmp_path / "t"), npart=1, files_per=4)
        d = spark.createDataFrame(
            [(500, 0, -1.0), (None, 0, -7.0)],
            "id int, pt int, v double",
        )
        merge_into_partitioned(
            spark, mt.path, d, ["id"], ["pt"], retain_versions=5
        )
        assert self._last_merge_op(mt).get("file_scoped") == 1
        got = mt.read()
        assert got.filter("id = 500").collect()[0].v == -1.0
        assert got.filter("id IS NULL").collect()[0].v == -7.0
        assert got.count() == 1001


class TestFgInteractions:
    """File-granular mutation composed with the write contracts: a
    CHECK-violating fg merge refuses atomically, and fg DML rides
    hidden-partitioning projection pruning."""

    def test_fg_merge_check_violation_refused_atomically(
        self, spark, tmp_path
    ):
        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            CheckConstraintViolation,
        )

        mt = _mk_clustered(spark, str(tmp_path / "t"), npart=1)
        mt.add_check_constraint("v_cap", "v < 10000")
        before = sorted(map(tuple, mt.read().collect()))
        ver = mt.current_version()
        bad = spark.createDataFrame(
            [(500, 0, 99999.0)], "id int, pt int, v double"
        )
        with pytest.raises(CheckConstraintViolation):
            merge_into_partitioned(
                spark, mt.path, bad, ["id"], ["pt"], retain_versions=5
            )
        assert mt.current_version() == ver
        assert sorted(map(tuple, mt.read().collect())) == before
        # a good fg merge still lands under the constraint
        ok = spark.createDataFrame(
            [(500, 0, 5000.0)], "id int, pt int, v double"
        )
        merge_into_partitioned(
            spark, mt.path, ok, ["id"], ["pt"], retain_versions=5
        )
        assert mt.read().filter("id = 500").collect()[0].v == 5000.0

    def test_fg_dml_on_hidden_partitioned_table(self, spark, tmp_path):
        import datetime as _dt

        from fbg_kafka_stream_file_transfer_spark.operators.table import (
            partition_transform_column,
        )

        rows = [
            (
                i,
                _dt.datetime(2024, 1, 1 + i // 100, 6, i % 60),
                float(i),
            )
            for i in range(800)
        ]
        df = (
            spark.createDataFrame(rows, "id int, ts timestamp, v double")
            .withColumn("day", partition_transform_column("day", "ts"))
            .repartitionByRange(16, "day", "id")
            .sortWithinPartitions("day", "id")
        )
        mt = ManifestTable(
            spark,
            str(tmp_path / "t"),
            derived_partitions={
                "day": {"transform": "day", "source": "ts"}
            },
        )
        mt.create(df, ["day"])
        # raw-ts predicate + id band: the projection prunes days, the
        # per-file id bounds scope the files within the hit day
        r = mt.delete_where(
            [
                ("ts", ">=", _dt.datetime(2024, 1, 3)),
                ("ts", "<", _dt.datetime(2024, 1, 4)),
                ("id", ">=", 210),
                ("id", "<", 220),
            ],
            retain_versions=5,
        )
        assert r["rows_deleted"] == 10, r
        assert r["entries_file_scoped"] >= 1, r
        assert mt.read().count() == 790
        # derivation enforcement still passes on the rewritten rows
        assert mt.verify_table(deep=True)["ok"]


class TestCarriedObservability:
    """The reclaim-on-OPTIMIZE signals (r14): small_file_report counts
    carried references per partition, and vacuum(dry_run=True) names
    the generations alive ONLY through them."""

    def test_report_counts_carried_and_dry_run_names_pinned_gens(
        self, spark, tmp_path
    ):
        mt = _mk_clustered(spark, str(tmp_path / "t"), npart=1)
        rep0 = mt.small_file_report()[0]
        assert rep0["carried"] == 0
        mt.delete_where([("id", "=", 500)], retain_versions=1)
        rep1 = mt.small_file_report()[0]
        assert rep1["carried"] == 3, rep1
        assert rep1["files"] == rep1["carried"] + 1
        plan = mt.vacuum(dry_run=True)
        # g1 holds the three carried files and nothing else live
        assert plan["generations_pinned_by_carried_refs"] == [
            "g00000001"
        ], plan
        # compaction folds the refs: the pin clears, and the commit's
        # own GC sweeps the now-unreferenced g1 outright
        mt.compact(retain_versions=1)
        plan2 = mt.vacuum(dry_run=True)
        assert plan2["generations_pinned_by_carried_refs"] == []
        assert not os.path.exists(f"{mt.path}/_data/g00000001")
        assert mt.read().count() == 999
