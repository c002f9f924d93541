"""Round-17 pins: queries run on the CALLER's SparkSession, which on
Spark 4 defaults to ANSI ON — the engine's documented DML semantics
(ANSI off: wrap-on-overflow explicit casts, NULL-on-error arithmetic)
must hold regardless of that session conf (r16 verdict, dml_cast_guard
CAST_OVERFLOW under the driver's ANSI-on session)."""

from __future__ import annotations

import shutil
import tempfile
from contextlib import contextmanager

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.scale import (
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.operators.table import (
    ManifestTable,
    engine_sql_semantics,
)

WRAP = 2**40 + 7


@contextmanager
def ansi_on(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="r17_ansi_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _make_table(spark, path):
    df = spark.createDataFrame(
        [Row(pt=i % 2, event_id=i, vc=100 + i) for i in range(8)],
        "pt int, event_id bigint, vc int",
    )
    mt = ManifestTable(spark, path)
    mt.create(df, ["pt"])
    return mt


class TestDmlAnsiIndependence:
    """update_where / merge evaluate SET expressions under the engine's
    documented ANSI-off semantics even when the session runs ANSI on."""

    def test_update_where_wrap_under_ansi_on(self, spark, workdir):
        mt = _make_table(spark, f"{workdir}/t1")
        with ansi_on(spark):
            mt.update_where(
                [("event_id", ">=", 0)],
                {"vc": f"cast(vc + {WRAP} as int)"},
            )
        got = {r.event_id: r.vc for r in mt.read().collect()}
        # two's-complement wrap: (100+i) + 2^40+7 mod 2^32 keeps low bits
        assert got[0] == 100 + 7, got
        assert got[5] == 105 + 7, got

    def test_update_where_unguarded_still_refuses(self, spark, workdir):
        mt = _make_table(spark, f"{workdir}/t2")
        with ansi_on(spark):
            with pytest.raises(ValueError, match="wraps/truncates"):
                mt.update_where(
                    [("event_id", ">=", 0)], {"vc": f"vc + {WRAP}"}
                )
        assert mt.current_version() == 1

    def test_merge_clause_wrap_under_ansi_on(self, spark, workdir):
        mt = _make_table(spark, f"{workdir}/t3")
        delta = spark.createDataFrame(
            [Row(pt=0, event_id=0)], "pt int, event_id bigint"
        )
        with ansi_on(spark):
            merge_into_partitioned(
                spark, mt.path, delta, ["event_id"], ["pt"],
                when_matched_update={
                    "vc": f"cast(t.vc + {WRAP} as int)"
                },
            )
        got = {r.event_id: r.vc for r in mt.read().collect()}
        assert got[0] == 100 + 7, got
        assert got[1] == 101, got  # untouched

    def test_session_conf_restored(self, spark, workdir):
        mt = _make_table(spark, f"{workdir}/t4")
        with ansi_on(spark):
            mt.delete_where([("event_id", ">=", 6)])
            assert spark.conf.get("spark.sql.ansi.enabled") == "true"
        assert mt.read().count() == 6

    def test_scope_reentrant_and_restoring(self, spark):
        key = "spark.sql.ansi.enabled"
        base = spark.conf.get(key)
        with ansi_on(spark):
            with engine_sql_semantics(spark):
                assert spark.conf.get(key) == "false"
                with engine_sql_semantics(spark):
                    assert spark.conf.get(key) == "false"
                assert spark.conf.get(key) == "false"
            assert spark.conf.get(key) == "true"
        assert spark.conf.get(key) == base


class TestQueryAnsiIndependence:
    """The registry queries flagged by the r17 ANSI sweep must return
    identical results under an ANSI-on session (driver conf)."""

    def test_dml_cast_guard_query_ansi_on(self, spark):
        from fbg_kafka_stream_file_transfer_spark.queries.relational_q import (
            QUERIES,
        )

        q = QUERIES["dml_cast_guard"]
        with ansi_on(spark):
            rows_on = sorted(
                map(tuple, q.spark(spark, "/root/testdata/sf0.001").collect())
            )
        rows_off = sorted(
            map(tuple, q.spark(spark, "/root/testdata/sf0.001").collect())
        )
        assert rows_on == rows_off
        assert rows_on, "query returned no rows"
