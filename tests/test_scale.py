"""Scale machinery: salting equivalence + bucketed shuffle-free joins."""

from __future__ import annotations

import pyspark.sql.functions as F

from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    bucketed_join,
    salted_agg,
    write_bucketed,
)
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain_groupby(spark):
    orders = load_table(spark, SF_DIR, "orders")
    plain = {
        (r.o_custkey,): (r.n, round(r.total, 2))
        for r in orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total"))
        .collect()
    }
    salted = {
        (r.o_custkey,): (r.n, round(r.total, 2))
        for r in salted_agg(
            orders,
            ["o_custkey"],
            {"n": ("o_orderkey", "count"), "total": ("o_totalprice", "sum")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    """A single hot key lands in multiple stage-1 groups (the point of
    salting): verify the first-stage salt actually spreads rows."""
    hot = spark.range(0, 10000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    spread = (
        hot.withColumn(
            "_salt",
            F.crc32(F.concat_ws("\x1f", F.col("k"), F.col("v"))) % 8,
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"),
                   "b_orders", ["custkey"], n_buckets=8,
                   path=str(tmp_path / "b_orders"))
    write_bucketed(customer.withColumnRenamed("c_custkey", "custkey"),
                   "b_customer", ["custkey"], n_buckets=8,
                   path=str(tmp_path / "b_customer"))
    try:
        # disable broadcast so the join strategy is SMJ, the case bucketing serves
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_customer", ["custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-bucketed: no shuffle on either side
        # and it still computes the right thing
        n = joined.count()
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_sink_prunes(spark, tmp_path):
    """Date filter on the dt-partitioned sink reaches the scan as a
    PartitionFilter — reading one day touches one directory."""
    import datetime

    from fbg_kafka_stream_file_transfer_spark.streaming.pipeline import (
        process_envelope_batch,
        write_batch_sinks,
    )

    t1 = datetime.datetime(2024, 1, 1, 12)
    t2 = datetime.datetime(2024, 1, 2, 12)
    rows = [
        ("c1", "t1", "a.pdf", "application/pdf", 5, "h1", b"aaaaa", t1, 1),
        ("c2", "t2", "b.pdf", "application/pdf", 5, "h2", b"bbbbb", t2, 1),
    ]
    env = spark.createDataFrame(
        rows,
        "correlation_id string, transfer_id string, file_name string, "
        "content_type string, file_size long, checksum string, content binary, "
        "event_time timestamp, delivery_count int",
    )
    r = process_envelope_batch(env)
    write_batch_sinks(r, str(tmp_path / "out"))
    r.unpersist()

    incoming = spark.read.parquet(str(tmp_path / "out" / "incoming"))
    import pyspark.sql.functions as F

    q = incoming.filter(F.col("dt") == "2024-01-01")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan
    assert [x.file_name for x in q.collect()] == ["a.pdf"]


def test_as_of_join_semantics(spark):
    """<= inclusion at equal timestamps; null when nothing precedes."""
    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import as_of_join

    left = spark.createDataFrame(
        [(1, 10, "L10"), (1, 20, "L20"), (2, 5, "L5")], "k long, t long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, "R10"), (1, 15, "R15"), (2, 9, "R9")], "k long, t long, v string"
    )
    got = {
        (r.k, r.t): r.v
        for r in as_of_join(left, right, ["k"], "t", "t", ["v"]).collect()
    }
    assert got == {(1, 10): "R10", (1, 20): "R15", (2, 5): None}


def test_range_join_boundaries(spark):
    """start-inclusive, end-exclusive; cross-bucket intervals still match."""
    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import range_join_bucketed

    left = spark.createDataFrame(
        [(1, 100.0), (1, 150.0), (1, 160.0)], "k long, lt double"
    )
    right = spark.createDataFrame(
        [(1, 100.0, 160.0, "A")], "k long, s double, e double, name string"
    )
    got = sorted(
        r.lt
        for r in range_join_bucketed(
            left, right, ["k"], "lt", "s", "e", bucket_seconds=50
        ).collect()
    )
    assert got == [100.0, 150.0]  # 160 excluded (end-exclusive), 100 included


def test_as_of_join_guards_and_null_values(spark):
    import pytest

    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import as_of_join

    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, v string")
    right = spark.createDataFrame([(1, 5, "r")], "k long, t long, v string")
    with pytest.raises(ValueError, match="left already has value"):
        as_of_join(left, right, ["k"], "t", "t", ["v"])

    # a right row whose VALUE is null still wins as the latest match
    l2 = spark.createDataFrame([(1, 30)], "k long, t long")
    r2 = spark.createDataFrame([(1, 10, "old"), (1, 20, None)], "k long, t long, price string")
    got = as_of_join(l2, r2, ["k"], "t", "t", ["price"]).first()
    assert got.price is None  # merge_asof semantics, not stale 'old'


def test_mix_corpus_empty_rates(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.sampling import mix_corpus

    df = spark.createDataFrame([(1, "en")], "id long, lang string")
    assert mix_corpus(df, "id", "lang", {}).count() == 0


def test_distributed_running_sum_matches_naive_and_is_partition_independent(spark):
    """Two-phase prefix sum ≡ the single-partition window form, under
    any partition count; the data-sized window is partitioned by _pid
    (parallel), never global."""
    from pyspark.sql.window import Window

    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        distributed_running_sum,
    )

    rows = [(i, (i * 37) % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    naive = {
        r.k: r.run
        for r in df.withColumn(
            "run",
            F.sum("v").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    for nparts in (1, 4, 16):
        got = {
            r.k: r.running_v
            for r in distributed_running_sum(df, ["k"], "v", nparts).collect()
        }
        assert got == naive, nparts

    # reserved-name guard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        distributed_running_sum(df.withColumn("_pid", F.lit(1)), ["k"], "v")


def test_write_partitioned_idempotent_touches_only_present_partitions(spark, tmp_path):
    """Re-running a backfill for day 2 must replace day 2 and leave
    day 1's files byte-identical; re-running the SAME day is a no-op in
    content (idempotent), never an append."""
    import pytest as _pytest

    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        write_partitioned_idempotent,
    )

    path = str(tmp_path / "table")
    d1 = spark.createDataFrame([("2024-01-01", i) for i in range(10)], "day string, v long")
    d2 = spark.createDataFrame([("2024-01-02", i) for i in range(5)], "day string, v long")
    write_partitioned_idempotent(d1.union(d2), path, ["day"])
    import glob as _g
    import os

    day1_files = {
        f: os.path.getmtime(f) for f in _g.glob(f"{path}/day=2024-01-01/*.parquet")
    }
    # backfill day 2 with corrected data
    d2_fixed = spark.createDataFrame(
        [("2024-01-02", 100 + i) for i in range(5)], "day string, v long"
    )
    write_partitioned_idempotent(d2_fixed, path, ["day"])
    back = spark.read.parquet(path)
    assert back.filter(F.col("day") == "2024-01-01").count() == 10  # intact
    vals = {r.v for r in back.filter(F.col("day") == "2024-01-02").collect()}
    assert vals == {100, 101, 102, 103, 104}  # replaced, not appended
    # day 1 files untouched on disk
    for f, mtime in day1_files.items():
        assert os.path.getmtime(f) == mtime, f

    with _pytest.raises(ValueError):
        write_partitioned_idempotent(d1, path, [])


def test_compact_to_target_conserves_rows_and_bounds_bins(spark, tmp_path):
    import glob as _g

    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        compact_to_target,
    )

    # 100 "files" of 40 bytes each, target 200 → 20 bins of 5
    df = spark.createDataFrame([(i, 40) for i in range(100)], "fid long, bytes long")
    path = str(tmp_path / "compacted")
    binned = compact_to_target(df, ["fid"], "bytes", 200.0, path)
    back = spark.read.parquet(path)
    assert back.count() == 100                       # conservation
    sizes = {
        r.compaction_bin: r.total
        for r in back.groupBy("compaction_bin").agg(
            F.sum("bytes").alias("total")
        ).collect()
    }
    assert len(sizes) == 20 and all(v == 200 for v in sizes.values())
    # bins are contiguous in fid order
    rows = {r.fid: r.compaction_bin for r in binned.collect()}
    assert all(rows[i] <= rows[i + 1] for i in range(99))
    assert len(_g.glob(f"{path}/compaction_bin=*")) == 20

    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_to_target(df, ["fid"], "bytes", 0, path)


def test_interval_overlap_join_bucketed_matches_naive(spark):
    """Bucketed interval×interval ≡ the quadratic predicate join, incl.
    multi-cell pairs deduped; half-open ends: touching intervals do NOT
    overlap."""
    import datetime as dt

    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import (
        interval_overlap_join_bucketed,
    )

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda rows, pre: spark.createDataFrame(  # noqa: E731
        [
            ("k", i, t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=e))
            for i, (s, e) in enumerate(rows)
        ],
        f"key string, {pre}_id long, {pre}_start timestamp, {pre}_end timestamp",
    )
    left = mk([(0, 60), (100, 160), (200, 230)], "l")
    right = mk([(30, 90), (60, 99), (150, 210)], "r")
    out = interval_overlap_join_bucketed(
        left, right, ["key"], "l_start", "l_end", "r_start", "r_end", 600
    )
    got = {(r.l_id, r.r_id) for r in out.collect()}
    # l0[0,60) overlaps r0[30,90); r1 starts AT 60 → half-open: no.
    # l1[100,160) overlaps r2[150,210); l2[200,230) overlaps r2 too.
    assert got == {(0, 0), (1, 2), (2, 2)}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_overlap_join_bucketed(
            left, right, ["key"], "l_start", "l_end", "r_start", "r_end", 0
        )


def test_interval_overlap_preserves_duplicate_multiplicity(spark):
    """Duplicated input rows (at-least-once redelivery) duplicate the
    output exactly like the naive quadratic join — no distinct collapse."""
    import datetime as dt

    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import (
        interval_overlap_join_bucketed,
    )

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda n: spark.createDataFrame(  # noqa: E731
        [("k", t0, t0 + dt.timedelta(hours=1))] * n,
        "key string, s timestamp, e timestamp",
    )
    left = mk(2).toDF("key", "l_start", "l_end")
    right = mk(1).toDF("key", "r_start", "r_end")
    out = interval_overlap_join_bucketed(
        left, right, ["key"], "l_start", "l_end", "r_start", "r_end", 600
    )
    assert out.count() == 2  # 2 left copies × 1 right = 2, not collapsed to 1
