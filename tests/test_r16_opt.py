"""Round-16 optimization pins: the changes are performance-only, so
these tests pin RESULT EQUIVALENCE and the specific internal properties
the optimizations rely on."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.queries.base import local_df


class TestLocalDf:
    """local_df must be a drop-in for createDataFrame(list, schema):
    same rows, same schema, same NULL handling — just one slice."""

    def test_identical_rows_and_schema(self, spark):
        rows = [
            Row(leg="PROCESSED", n=9000, first_id="1"),
            Row(leg="RETRY", n=None, first_id=None),
            Row(leg="DLQ", n=400, first_id="3"),
        ]
        schema = "leg string, n bigint, first_id string"
        a = spark.createDataFrame(rows, schema)
        b = local_df(spark, rows, schema)
        assert a.schema == b.schema
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_single_partition(self, spark):
        df = local_df(spark, [Row(x=1), Row(x=2)], "x int")
        assert df.rdd.getNumPartitions() == 1

    def test_empty_rows(self, spark):
        df = local_df(spark, [], "x int, y string")
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["x", "y"]


class TestCurationMinBySurvivors:
    """The curation dedup step moved from a row_number window to a
    min_by partial agg; pin equivalence on a fixture with real
    duplicate groups (several docs per fingerprint)."""

    def test_min_by_equals_window_row_number(self, spark):
        from pyspark.sql.window import Window

        rows = [
            Row(doc_id=i, fp=f"fp{i % 3}", lang=f"l{i % 2}", quality=float(i % 7), n_tokens=i + 10)
            for i in range(30)
        ]
        df = spark.createDataFrame(rows)
        w = Window.partitionBy("fp").orderBy("doc_id")
        via_window = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "lang", "quality", "n_tokens")
        )
        via_min_by = (
            df.groupBy("fp")
            .agg(
                F.min_by(
                    F.struct("doc_id", "lang", "quality", "n_tokens"), F.col("doc_id")
                ).alias("_s")
            )
            .select("_s.doc_id", "_s.lang", "_s.quality", "_s.n_tokens")
        )
        assert sorted(map(tuple, via_window.collect())) == sorted(
            map(tuple, via_min_by.collect())
        )


class TestMergePlanningFold:
    """The merge planning read was folded into one delta-sized agg with
    observed staging metrics; the contracts it enforces must be
    unchanged: empty delta is a 0-row no-op (no table required), and a
    dup-keyed blind delta still refuses loudly pre-commit."""

    def test_empty_delta_noop(self, spark, tmp_path):
        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t")
        base = spark.createDataFrame(
            [Row(id=1, pt="a", v=10), Row(id=2, pt="b", v=20)]
        )
        base.write.partitionBy("pt").parquet(path)
        empty = spark.createDataFrame([], "id bigint, pt string, v bigint")
        n = merge_into_partitioned(spark, path, empty, ["id"], ["pt"])
        assert n == 0
        got = sorted(map(tuple, spark.read.parquet(path).select("id", "v").collect()))
        assert got == [(1, 10), (2, 20)]

    def test_dup_key_blind_delta_refused_pre_commit(self, spark, tmp_path):
        import pytest

        from fbg_kafka_stream_file_transfer_spark.operators.scale import (
            merge_into_partitioned,
        )

        path = str(tmp_path / "t2")
        base = spark.createDataFrame([Row(id=1, pt="a", v=10)])
        base.write.partitionBy("pt").parquet(path)
        dup = spark.createDataFrame(
            [Row(id=1, pt="a", v=1), Row(id=1, pt="a", v=2), Row(id=9, pt="a", v=3)]
        )
        with pytest.raises(ValueError, match="(?i)duplicate|multiple"):
            merge_into_partitioned(spark, path, dup, ["id"], ["pt"])
        # refusal was pre-commit: table unchanged, probe key absent
        got = sorted(map(tuple, spark.read.parquet(path).select("id", "v").collect()))
        assert got == [(1, 10)]
