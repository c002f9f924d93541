"""Declarative DQ expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators import expectations as X


@pytest.fixture()
def facts(spark):
    return spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, -1.0), (2, 99, None), (3, None, 2.0)],
        "id long, fk long, amount double",
    )


def test_row_rules_one_scan_null_is_violation(spark, facts):
    out = X.check_rows(
        facts,
        {
            "amount_positive": F.col("amount") > 0,
            "fk_not_null": F.col("fk").isNotNull(),
        },
    )
    got = {r.rule: (r.n_rows, r.n_violations, r.pass_flag) for r in out.collect()}
    # amount: -1 fails, NULL counts as violation too
    assert got["amount_positive"] == (4, 2, 0)
    assert got["fk_not_null"] == (4, 1, 0)
    # one scan: no keyed shuffle (only the single-partition agg
    # exchange, which moves one partial row per task) and no join
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-plan
    assert "Exchange hashpartitioning" not in plan and "Join" not in plan
    assert plan.count("partial_count") == 1  # all rules fold into one agg


def test_unique_counts_rows_a_dedup_would_remove(spark, facts):
    r = X.check_unique(facts, ["id"]).collect()[0]
    assert (r.rule, r.n_rows, r.n_violations, r.pass_flag) == ("unique_id", 4, 1, 0)


def test_references_broadcasts_dim_and_counts_orphans(spark, facts):
    dim = spark.createDataFrame([(10,), (11,)], "pk long")
    out = X.check_references(facts, "fk", dim, "pk")
    r = out.collect()[0]
    # fk=99 orphan, fk=NULL orphan → 2 violations
    assert (r.n_rows, r.n_violations, r.pass_flag) == (4, 2, 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_suite_unions_all_checks(spark, facts):
    dim = spark.createDataFrame([(10,)], "pk long")
    suite = X.expectation_suite(
        X.check_rows(facts, {"id_not_null": F.col("id").isNotNull()}),
        X.check_unique(facts, ["id"]),
        X.check_references(facts, "fk", dim, "pk"),
    )
    rules = [r.rule for r in suite.collect()]
    assert rules == ["id_not_null", "unique_id", "ref_fk_in_pk"]


def test_empty_rules_rejected(spark, facts):
    with pytest.raises(ValueError):
        X.check_rows(facts, {})
    with pytest.raises(ValueError):
        X.expectation_suite()


def test_empty_input_reports_zero_violations_and_pass(spark):
    """An empty-but-valid batch must pass every check, not NULL out."""
    empty = spark.createDataFrame([], "id long, fk long, amount double")
    dim = spark.createDataFrame([(10,)], "pk long")
    suite = X.expectation_suite(
        X.check_rows(empty, {"amount_positive": F.col("amount") > 0}),
        X.check_unique(empty, ["id"]),
        X.check_references(empty, "fk", dim, "pk"),
    )
    for r in suite.collect():
        assert r.n_violations == 0 and r.pass_flag == 1, r


def test_quarantine_routes_first_failure_alphabetically(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, -1.0), (3, None)],
        "id long, amount double",
    )
    out = X.quarantine(
        df,
        {
            "amount_positive": F.col("amount") > 0,
            "id_not_null": F.col("id").isNotNull(),
        },
    )
    got = {(r.id, r.amount): r.failed_rule for r in out.collect()}
    assert got[(1, 5.0)] is None                      # clean
    assert got[(2, -1.0)] == "amount_positive"
    assert got[(None, -1.0)] == "amount_positive"     # alphabetical first
    assert got[(3, None)] == "amount_positive"        # NULL result = failure
    # map-side: no exchange at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        X.quarantine(df, {})
