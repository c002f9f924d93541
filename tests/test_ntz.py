"""TIMESTAMP_NTZ regression suite.

Tz-less parquet (``timestamp[us]``, what the driver fixtures carry)
loads as TIMESTAMP_NTZ in Spark 4, where ``CAST(ts AS DOUBLE)`` is an
analysis error. Unit tests that build frames from Python datetimes get
TIMESTAMP_LTZ and never see this — so this suite goes through a real
tz-less parquet file, the exact path the driver grades. Round-4 verdict
item: interarrival_gaps / join_range_error_after_purchase /
hypertable_rollup_events all broke on this; epoch_seconds() is the fix.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.functions.derivations import epoch_seconds
from fbg_kafka_stream_file_transfer_spark.operators.rollup import hypertable_rollup
from fbg_kafka_stream_file_transfer_spark.operators.timejoin import (
    as_of_join,
    range_join_bucketed,
)


@pytest.fixture(scope="module")
def ntz_events(tmp_path_factory):
    """Events parquet with tz-less timestamp[us] — the driver-fixture shape."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(200):
        # microsecond fractions so sub-second precision is exercised
        ts = base + dt.timedelta(seconds=137 * i, microseconds=123456 + i)
        rows.append(
            {
                "event_id": i,
                "ts": ts,
                "user_id": i % 5,
                "event_type": ["view", "purchase", "error"][i % 3],
                "value": float(i) * 1.5,
            }
        )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),  # NO timezone — loads as NTZ
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
            ]
        ),
    )
    path = str(tmp_path_factory.mktemp("ntz") / "events.parquet")
    pq.write_table(table, path)
    return path


def test_parquet_loads_as_ntz_and_direct_cast_fails(spark, ntz_events):
    df = spark.read.parquet(ntz_events)
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        df.select(F.col("ts").cast("double")).schema  # analysis-time error


def test_epoch_seconds_matches_python_epoch(spark, ntz_events):
    df = spark.read.parquet(ntz_events)
    got = (
        df.filter(F.col("event_id") == 1)
        .select(epoch_seconds(F.col("ts")).alias("e"))
        .collect()[0]["e"]
    )
    want = (
        dt.datetime(2024, 1, 1, 0, 2, 17, 123457) - dt.datetime(1970, 1, 1)
    ).total_seconds()
    assert got == pytest.approx(want, abs=1e-6)


def test_epoch_seconds_numeric_roundtrip(spark):
    # callers may apply it to already-numeric epoch columns — identity
    df = spark.range(1).select(F.lit(1704067200).alias("sec"))
    got = df.select(epoch_seconds(F.col("sec")).alias("e")).collect()[0]["e"]
    assert got == 1704067200.0


def test_interarrival_gaps_on_ntz_parquet(spark, ntz_events):
    from pyspark.sql.window import Window

    df = spark.read.parquet(ntz_events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(epoch_seconds(F.col("ts")))
    out = df.select(
        "event_id",
        "user_id",
        (sec - F.lag(sec).over(w)).cast("bigint").alias("gap_seconds"),
    ).collect()
    # users cycle every 5 events, 137 s apart → constant 685 s gaps
    gaps = {r.gap_seconds for r in out if r.gap_seconds is not None}
    assert gaps == {685}


def test_range_join_bucketed_on_ntz_parquet(spark, ntz_events):
    ev = spark.read.parquet(ntz_events)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("ets")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pstart"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("pend"),
    )
    pairs = range_join_bucketed(
        errors, purchases, ["user_id"], "ets", "pstart", "pend", bucket_seconds=3600
    )
    rows = pairs.collect()
    assert rows, "expected at least one (error within 1h after purchase) pair"
    # exact residual: every pair honours pstart <= ets < pend
    for r in rows:
        assert r.pstart <= r.ets < r.pend


def test_hypertable_rollup_on_ntz_parquet(spark, ntz_events):
    ev = spark.read.parquet(ntz_events)
    out = hypertable_rollup(ev, "ts", "value", ["1m", "1h", "1d"])
    rows = out.collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r.resolution, []).append(r)
    # every level partitions all 200 events; coarser = re-agg of finer
    for res in ("1m", "1h", "1d"):
        assert sum(r.n for r in by_res[res]) == 200
        for r in by_res[res]:
            assert r.bucket_start % {"1m": 60, "1h": 3600, "1d": 86400}[res] == 0
    total = sum(float(i) * 1.5 for i in range(200))
    assert sum(r.sum_v for r in by_res["1d"]) == pytest.approx(total)


def test_as_of_join_on_ntz_parquet(spark, ntz_events):
    # as-of already handled NTZ (pure ordering, no numeric cast) — pin it
    ev = spark.read.parquet(ntz_events)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    out = as_of_join(errors, purchases, ["user_id"], "ts", "ts", ["last_purchase_value"])
    assert out.count() == errors.count()
