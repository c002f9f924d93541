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
