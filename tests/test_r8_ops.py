"""Round-8 regressions: negative-rounded-variance guards (sqrt(-eps) ->
NaN, which Spark orders ABOVE any number so `std > 0` passes), lang-id
NULL contracts, and the round's new operators."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def test_seasonal_baseline_zero_variance_fp_rounding(spark):
    """Two rows of 0.2: n*sxx - sx*sx rounds to a tiny NEGATIVE double,
    sqrt gives NaN, and NaN > 0 is TRUE in Spark's ordering — without
    the var>0 guard every row of the constant cell is flagged with
    baseline_std=NaN (ADVICE r7, high)."""
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        seasonal_baseline_anomalies,
    )

    rows = [
        (1, datetime(2024, 1, 1, 3, 0), "g", 0.2),
        (2, datetime(2024, 1, 2, 3, 0), "g", 0.2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, g string, v double")
    out = seasonal_baseline_anomalies(
        df, "g", "ts", "v", n_sigma=2.0, id_cols=("event_id",)
    ).collect()
    assert out == []  # zero-variance cell yields no flags (docstring contract)


def test_scale_features_zero_variance_fp_rounding(spark):
    """Constant group [0.2, 0.2]: same negative-rounding trap — zscore
    must be NULL (matches the var>0-guarded oracle), never NaN."""
    from fbg_kafka_stream_file_transfer_spark.operators.profile import scale_features

    df = spark.createDataFrame(
        [(1, "g", 0.2), (2, "g", 0.2)], "id long, grp string, v double"
    )
    got = {r.id: r for r in scale_features(df, "grp", "v", "id").collect()}
    assert got[1].zscore is None and got[2].zscore is None
    assert got[1].minmax is None  # zero range likewise NULL


def test_lang_confusion_null_contracts(spark, tmp_path):
    """NULL text -> lang_pred 'und' on BOTH engines (oracle CASE now has
    ELSE 'und'); NULL lang_label -> agree 0, not NULL (ADVICE r7, low)."""
    import duckdb

    from fbg_kafka_stream_file_transfer_spark.queries import text_q

    rows = [
        ("d1", "en", "the of and to in this text is english"),
        ("d2", None, "the of and to in this text is english"),
        ("d3", "en", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = text_q.QUERIES["text_lang_confusion"]
    got = {
        (r.lang_label, r.lang_pred): (r.n_docs, r.agree)
        for r in q.spark(spark, str(tmp_path)).collect()
    }
    assert got[("en", "en")] == (1, 1)
    assert got[(None, "en")][1] == 0  # NULL label -> agree 0, not NULL
    assert got[("en", "und")] == (1, 0)  # NULL text -> 'und', disagrees

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = {
        (r[0], r[1]): (r[2], r[4])
        for r in con.execute(q.oracle).fetchall()
    }
    assert oracle == got


class TestMergeIntoPartitioned:
    def _seed(self, spark, path):
        rows = [
            (i, f"p{i % 3}", f"props-{i}") for i in range(30)
        ]
        df = spark.createDataFrame(rows, "id long, pt string, props string")
        df.write.partitionBy("pt").parquet(path, mode="overwrite")

    def test_upsert_delete_insert_and_partition_pruning(self, spark, tmp_path):
        import glob
        import os

        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        untouched_files = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{path}/pt=p2/*.parquet")
        }
        updates = spark.createDataFrame(
            [
                (0, "p0", "updated-0", "U"),   # replace id 0
                (3, "p0", None, "D"),          # delete id 3
                (100, "p1", "new-100", "U"),   # insert new key
            ],
            "id long, pt string, props string, op string",
        )
        n = merge_into_partitioned(
            spark, path, updates, ["id"], ["pt"], op_col="op"
        )
        assert n == 2  # p0 and p1 touched, p2 pruned
        got = {
            r["id"]: r["props"]
            for r in spark.read.parquet(path).collect()
        }
        assert got[0] == "updated-0"
        assert 3 not in got
        assert got[100] == "new-100"
        assert len(got) == 30  # 30 - 1 delete + 1 insert
        # untouched partition: same files, same bytes, never rewritten
        after = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{path}/pt=p2/*.parquet")
        }
        assert after == untouched_files
        # staging dir cleaned up and invisible
        assert not os.path.exists(f"{path}/_merge_staging")

    def test_empty_delta_is_noop(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        empty = spark.createDataFrame(
            [], "id long, pt string, props string, op string"
        )
        assert merge_into_partitioned(
            spark, path, empty, ["id"], ["pt"], op_col="op"
        ) == 0
        assert spark.read.parquet(path).count() == 30

    def test_rejects_missing_cols(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        with pytest.raises(ValueError):
            merge_into_partitioned(spark, "x", None, [], ["pt"])


class TestOrderedMerge:
    """ts-conditional MERGE (ordered mode): out-of-order and redelivery
    safety — the property the streaming merge sink builds on."""

    def _seed(self, spark, path):
        rows = [(i, f"p{i % 2}", 100 + i, f"v{i}") for i in range(10)]
        df = spark.createDataFrame(rows, "id long, pt string, ts long, props string")
        df.write.partitionBy("pt").parquet(path, mode="overwrite")

    def test_stale_update_is_ignored_fresh_wins(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)  # id 4 currently ts=104
        updates = spark.createDataFrame(
            [
                (4, "p0", 50, "stale", "U"),     # older than current: ignored
                (5, "p1", 999, "fresh", "U"),    # newer: wins
                (6, "p0", 50, None, "D"),        # stale tombstone: ignored
                (7, "p1", 999, None, "D"),       # fresh tombstone: deletes
            ],
            "id long, pt string, ts long, props string, op string",
        )
        merge_into_partitioned(
            spark, path, updates, ["id"], ["pt"], op_col="op", ts_col="ts"
        )
        got = {r["id"]: r for r in spark.read.parquet(path).collect()}
        assert got[4]["props"] == "v4" and got[4]["ts"] == 104
        assert got[5]["props"] == "fresh" and got[5]["ts"] == 999
        assert got[6]["props"] == "v6"  # survived the stale delete
        assert 7 not in got
        assert len(got) == 9

    def test_redelivered_batch_is_noop(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        updates = spark.createDataFrame(
            [
                (1, "p1", 500, "new1", "U"),
                (2, "p0", 500, None, "D"),
                (50, "p0", 500, "ins", "U"),
            ],
            "id long, pt string, ts long, props string, op string",
        )
        for _ in range(2):  # apply, then REPLAY the same batch
            merge_into_partitioned(
                spark, path, updates, ["id"], ["pt"], op_col="op",
                ts_col="ts", tiebreak_cols=(),
            )
        got = {r["id"]: r["props"] for r in spark.read.parquet(path).collect()}
        assert got[1] == "new1" and got[50] == "ins" and 2 not in got
        assert len(got) == 10  # 10 - 1 delete + 1 insert

    def test_multi_row_delta_folds_per_key(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        updates = spark.createDataFrame(
            [
                (3, "p1", 500, "mid", "U"),
                (3, "p1", 600, "latest", "U"),
                (3, "p1", 400, None, "D"),
            ],
            "id long, pt string, ts long, props string, op string",
        )
        merge_into_partitioned(
            spark, path, updates, ["id"], ["pt"], op_col="op", ts_col="ts"
        )
        got = {r["id"]: r["props"] for r in spark.read.parquet(path).collect()}
        assert got[3] == "latest"

    def test_ordered_requires_single_key_and_op(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        upd = spark.createDataFrame(
            [(1, "p1", 500, "x", "U")],
            "id long, pt string, ts long, props string, op string",
        )
        with pytest.raises(ValueError):
            merge_into_partitioned(
                spark, path, upd, ["id", "pt"], ["pt"], op_col="op", ts_col="ts"
            )
        with pytest.raises(ValueError):
            merge_into_partitioned(
                spark, path, upd, ["id"], ["pt"], op_col=None, ts_col="ts"
            )


class TestMergeEmptiesPartition:
    """r8 review finding: dynamic partition overwrite never rewrites a
    partition that stages zero rows — an emptied partition must be
    deleted explicitly or its rows silently survive."""

    def _seed(self, spark, path):
        rows = [(i, f"p{i % 3}", 100 + i, f"v{i}") for i in range(9)]
        spark.createDataFrame(
            rows, "id long, pt string, ts long, props string"
        ).write.partitionBy("pt").parquet(path, mode="overwrite")

    def test_delete_all_rows_of_one_partition(self, spark, tmp_path):
        import os

        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)  # p0={0,3,6} p1={1,4,7} p2={2,5,8}
        updates = spark.createDataFrame(
            [(0, "p0", 999, None, "D"), (3, "p0", 999, None, "D"),
             (6, "p0", 999, None, "D"), (1, "p1", 999, "new1", "U")],
            "id long, pt string, ts long, props string, op string",
        )
        n = merge_into_partitioned(
            spark, path, updates, ["id"], ["pt"], op_col="op"
        )
        assert n == 2
        got = {r["id"]: r["props"] for r in spark.read.parquet(path).collect()}
        assert set(got) == {1, 4, 7, 2, 5, 8}  # all of p0 gone
        assert got[1] == "new1"
        assert not os.path.exists(f"{path}/pt=p0")

    def test_delete_every_touched_partition(self, spark, tmp_path):
        """All touched partitions emptied -> staging holds ZERO rows;
        the explicit-schema staging read must not die on
        UNABLE_TO_INFER_SCHEMA and both dirs must be gone."""
        import os

        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        updates = spark.createDataFrame(
            [(i, f"p{i % 3}", 999, None, "D") for i in (0, 3, 6, 1, 4, 7)],
            "id long, pt string, ts long, props string, op string",
        )
        merge_into_partitioned(
            spark, path, updates, ["id"], ["pt"], op_col="op", ts_col="ts"
        )
        got = {r["id"] for r in spark.read.parquet(path).collect()}
        assert got == {2, 5, 8}
        assert not os.path.exists(f"{path}/pt=p0")
        assert not os.path.exists(f"{path}/pt=p1")

    def test_invalid_ordered_args_fail_even_on_empty_delta(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        empty = spark.createDataFrame(
            [], "id long, pt string, ts long, props string, op string"
        )
        with pytest.raises(ValueError):
            merge_into_partitioned(
                spark, path, empty, ["id", "pt"], ["pt"], ts_col="ts"
            )


def test_merge_sink_all_tombstone_first_batch_recovers(spark, tmp_path):
    """r8 review finding: an all-tombstone first batch must not wedge
    the sink behind a row-less table dir — the bootstrap is skipped and
    the NEXT batch bootstraps."""
    import os

    from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
        start_changelog_merge_sink,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = spark.createDataFrame(
        [(1, 0, 100, "x", "D")], "id long, pt int, ts long, props string, op string"
    )
    b1 = spark.createDataFrame(
        [(2, 0, 200, "keep", "U"), (3, 1, 200, "keep3", "U")],
        "id long, pt int, ts long, props string, op string",
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
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["id"]: r["props"] for r in spark.read.parquet(table).collect()}
    assert got == {2: "keep", 3: "keep3"}


def test_merge_touched_predicate_reaches_partition_filters(spark, tmp_path):
    """The 100 TB property of merge_into_partitioned rests on the
    touched-partition predicate landing in the scan's PartitionFilters
    (pruned BEFORE reading data files) rather than a post-scan Filter.
    Pin the plan shape with the exact predicate construction the merge
    uses (eqNullSafe OR-chain)."""
    import functools
    import operator
    import re

    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    rows = [(i, f"p{i % 5}", i) for i in range(100)]
    spark.createDataFrame(rows, "id long, pt string, v long").write.partitionBy(
        "pt"
    ).parquet(path, mode="overwrite")
    touched = [("p1",), ("p3",)]
    pred = functools.reduce(
        operator.or_,
        [
            functools.reduce(
                operator.and_,
                [F.col(c).eqNullSafe(F.lit(v)) for c, v in zip(["pt"], t)],
            )
            for t in touched
        ],
    )
    plan = (
        spark.read.parquet(path)
        .filter(pred)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"no PartitionFilters in plan:\n{plan}"
    assert "p1" in m.group(1) and "p3" in m.group(1)


def test_merge_deleting_last_partition_removes_table(spark, tmp_path):
    """r8 review: a merge whose tombstones empty EVERY partition must
    delete the table root — a root holding only _SUCCESS is unreadable
    (UNABLE_TO_INFER_SCHEMA) and would wedge the streaming sink."""
    import os

    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        merge_into_partitioned,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(0, "p0", 100, "x")], "id long, pt string, ts long, props string"
    ).write.partitionBy("pt").parquet(path, mode="overwrite")
    updates = spark.createDataFrame(
        [(0, "p0", 999, None, "D")],
        "id long, pt string, ts long, props string, op string",
    )
    merge_into_partitioned(
        spark, path, updates, ["id"], ["pt"], op_col="op", ts_col="ts"
    )
    assert not os.path.exists(path)


def test_merge_deletes_boolean_partition(spark, tmp_path):
    """r8 review: Spark writes boolean partition dirs lowercase
    (flag=true); matching via str(True)='True' silently skipped them."""
    import os

    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        merge_into_partitioned,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(0, True, 100, "x"), (1, False, 100, "y")],
        "id long, flag boolean, ts long, props string",
    ).write.partitionBy("flag").parquet(path, mode="overwrite")
    updates = spark.createDataFrame(
        [(0, True, 999, None, "D")],
        "id long, flag boolean, ts long, props string, op string",
    )
    merge_into_partitioned(
        spark, path, updates, ["id"], ["flag"], op_col="op", ts_col="ts"
    )
    assert not os.path.exists(f"{path}/flag=true")
    got = {r["id"] for r in spark.read.parquet(path).collect()}
    assert got == {1}


def test_merge_sink_recovers_from_torn_bootstrap(spark, tmp_path):
    """r8 review: a crash mid-bootstrap leaves the table dir with only
    commit markers; the probe must treat that as 'no table' and
    re-bootstrap instead of wedging on UNABLE_TO_INFER_SCHEMA."""
    import os

    from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
        start_changelog_merge_sink,
    )

    table = str(tmp_path / "table")
    os.makedirs(table)
    open(f"{table}/_SUCCESS", "w").close()  # torn bootstrap remnant

    src = str(tmp_path / "src")
    os.makedirs(src)
    b = spark.createDataFrame(
        [(1, 0, 100, "v", "U")],
        "id long, pt int, ts long, props string, op string",
    )
    tmp = str(tmp_path / "w")
    b.coalesce(1).write.parquet(tmp)
    pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(f"{tmp}/{pf}", f"{src}/000.parquet")
    stream = (
        spark.readStream.schema(b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_changelog_merge_sink(
        spark, stream, table, "id", ["pt"], "ts", "op", str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["id"]: r["props"] for r in spark.read.parquet(table).collect()}
    assert got == {1: "v"}


def test_merge_empty_delta_on_absent_table_returns_zero(spark, tmp_path):
    """A previous merge may have tombstoned the LAST partition (table
    root deleted); a subsequent no-op delta must return 0, not
    PATH_NOT_FOUND — and must not leave a husk dir behind."""
    import os

    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        merge_into_partitioned,
    )

    path = str(tmp_path / "never_created")
    empty = spark.createDataFrame(
        [], "id long, pt string, ts long, props string, op string"
    )
    assert merge_into_partitioned(
        spark, path, empty, ["id"], ["pt"], op_col="op", ts_col="ts"
    ) == 0
    assert not os.path.exists(path)


def test_merge_nonempty_delta_on_absent_table_raises(spark, tmp_path):
    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        merge_into_partitioned,
    )

    path = str(tmp_path / "never_created")
    delta = spark.createDataFrame(
        [(1, "p0", 1, "x", "U")],
        "id long, pt string, ts long, props string, op string",
    )
    with pytest.raises(ValueError, match="does not exist"):
        merge_into_partitioned(
            spark, path, delta, ["id"], ["pt"], op_col="op", ts_col="ts"
        )


def test_merge_sink_refuses_foreign_unpartitioned_dataset(spark, tmp_path):
    """r8 review: pointing the sink at an existing UNPARTITIONED
    dataset must raise, not silently bootstrap-overwrite it."""
    import os

    table = str(tmp_path / "foreign")
    spark.createDataFrame([(1, "keepme")], "id long, v string").write.parquet(
        table
    )
    from fbg_kafka_stream_file_transfer_spark.streaming.merge_sink import (
        start_changelog_merge_sink,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    b = spark.createDataFrame(
        [(1, 0, 100, "v", "U")],
        "id long, pt int, ts long, props string, op string",
    )
    tmp = str(tmp_path / "w")
    b.coalesce(1).write.parquet(tmp)
    pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(f"{tmp}/{pf}", f"{src}/000.parquet")
    stream = (
        spark.readStream.schema(b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_changelog_merge_sink(
        spark, stream, table, "id", ["pt"], "ts", "op", str(tmp_path / "ckpt")
    )
    import pyspark.errors

    with pytest.raises(pyspark.errors.StreamingQueryException):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # the foreign dataset survived untouched
    assert [tuple(r) for r in spark.read.parquet(table).collect()] == [
        (1, "keepme")
    ]


def test_delete_partition_dir_matches_double_formatting(spark, tmp_path):
    """r8 review: Java formats double partition values as 1.0E-7 where
    Python str() says 1e-07 — matching by VALUE, not formatting."""
    import os

    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        _delete_partition_dir,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 1e-7), (2, 0.5)], "id long, p double"
    ).write.partitionBy("p").parquet(path, mode="overwrite")
    dirs = sorted(os.listdir(path))
    _delete_partition_dir(spark, path, ["p"], (1e-7,))
    left = sorted(d for d in os.listdir(path) if d.startswith("p="))
    assert len(left) == 1 and "0.5" in left[0], (dirs, left)
