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

        slept: list[float] = []
        real_sleep = time_mod.sleep

        def spy_sleep(s):
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
        assert all(s >= 0.05 for s in slept), slept
