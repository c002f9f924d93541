"""Declarative data-quality expectations (one-scan validation summary).

The reference validates per message at the route level (type/size checks
→ reject headers, camel-integration file-pipeline.yaml F2/F4); a batch
engine additionally needs the TABLE-level twin — the dbt-test /
Great-Expectations shape: declare rules, get one violation-count row per
rule, gate the pipeline on the summary. These operators provide that
surface with Spark-shaped execution:

- **row rules** (not-null, range, regex, set membership — any boolean
  Column) all fold into ONE aggregation over ONE scan: each rule is a
  conditional sum, map-side partials combine, no shuffle of row data.
- **uniqueness** is its own keyed aggregation (one shuffle on the key,
  uniform when the key is a real id).
- **referential integrity** is a broadcast anti-join against the
  dimension's distinct keys (dims are broadcast-sized by contract; the
  big side never shuffles).

The summary frame is tiny (one row per rule) regardless of input size —
the only thing that crosses to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate row-level rules in one scan: ``rules`` maps rule name →
    boolean Column that is TRUE when the row PASSES. Returns one row
    per rule: (rule, n_rows, n_violations, pass_flag), rule order
    alphabetical so the output is deterministic.

    NULL rule results count as violations (a range check on a NULL
    value is not a pass) — encode "nullable allowed" explicitly with
    ``col.isNull() | predicate``.
    """
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for name in sorted(rules):
        ok = rules[name]
        aggs.append(
            # coalesce: sum over ZERO rows is NULL — an empty (but
            # valid) batch must report 0 violations / pass, not NULL
            F.coalesce(F.sum(F.when(ok.isNull() | ~ok, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"v_{name}")
        )
    wide = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"v_{name}").alias("n_violations"),
            )
            for name in sorted(rules)
        ]
    )
    return (
        wide.select(F.col("_n"), F.explode(per_rule).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col("r.n_violations").alias("n_violations"),
            (F.col("r.n_violations") == 0).cast("int").alias("pass_flag"),
        )
    )


def check_unique(df: DataFrame, key_cols: list[str], rule: str | None = None) -> DataFrame:
    """Uniqueness expectation: violations = rows beyond the first per
    key (so 3 copies of one key count as 2 violations — the number of
    rows a dedup would remove). One shuffle on the key."""
    name = rule or ("unique_" + "_".join(key_cols))
    dup = (
        df.groupBy(*key_cols)
        .agg((F.count(F.lit(1)) - 1).alias("_extra"))
        .agg(
            F.coalesce(F.sum(F.lit(1) + F.col("_extra")), F.lit(0)).cast("bigint").alias("n_rows"),
            F.coalesce(F.sum("_extra"), F.lit(0)).cast("bigint").alias("n_violations"),
        )
    )
    return dup.select(
        F.lit(name).alias("rule"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("pass_flag"),
    )


def check_references(
    df: DataFrame, fk_col: str, dim: DataFrame, pk_col: str, rule: str | None = None
) -> DataFrame:
    """Referential-integrity expectation: count fact rows whose
    ``fk_col`` has no match in ``dim.pk_col`` (NULL fks are violations;
    declare nullable fks via a row rule instead). The dim side reduces
    to its distinct keys and is broadcast — the fact side never
    shuffles."""
    name = rule or f"ref_{fk_col}_in_{pk_col}"
    keys = F.broadcast(dim.select(F.col(pk_col).alias("_pk")).distinct())
    joined = df.select(F.col(fk_col).alias("_fk")).join(
        keys, F.col("_fk") == F.col("_pk"), "left"
    )
    agg = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        # coalesce: empty fact side must report 0 violations, not NULL
        F.coalesce(
            F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_violations"),
    )
    return agg.select(
        F.lit(name).alias("rule"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("pass_flag"),
    )


def expectation_suite(*checks: DataFrame) -> DataFrame:
    """Union the per-rule summaries of any mix of the checks above into
    one report frame. Each input is already a tiny aggregate, so the
    union is trivially cheap and the branches run independently."""
    if not checks:
        raise ValueError("need at least one check")
    return reduce(DataFrame.unionByName, checks)


def quarantine(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Row-level twin of :func:`check_rows`: instead of counting
    violations, ROUTE them — every row gains ``failed_rule`` (the
    first failing rule in alphabetical order, NULL when all pass), so
    callers split good rows from a quarantine frame with reasons (the
    generic form of the envelope pipeline's reject_reason routing,
    operators/validate.py F2/F4). NULL rule results count as failures,
    same convention as check_rows.

    Pure map-side CASE chain — zero shuffle; filter on
    ``failed_rule IS NULL`` for the clean side and the predicate
    pushes into the scan.
    """
    if not rules:
        raise ValueError("need at least one rule")
    if "failed_rule" in df.columns:
        raise ValueError(
            "column 'failed_rule' already exists — rename it (or drop the "
            "previous quarantine pass's routing) before re-routing"
        )
    expr = None
    for name in sorted(rules):
        ok = rules[name]
        bad = ok.isNull() | ~ok
        expr = F.when(bad, F.lit(name)) if expr is None else expr.when(bad, F.lit(name))
    return df.withColumn("failed_rule", expr.otherwise(F.lit(None).cast("string")))


def _qi_keys(qi_cols: list[str]) -> list:
    """Stringified quasi-identifier grouping keys with NULLs coalesced
    to the '<NULL>' sentinel — shared by both privacy audits (and
    mirrored verbatim in their DuckDB oracles) so the NULL-QI
    representation can only ever change in one place."""
    return [
        F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")).alias(c)
        for c in qi_cols
    ]


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """Privacy audit before a data release: group rows by their
    quasi-identifier combination and report every combination whose
    group is smaller than ``k`` — each such row is re-identifiable by
    joining the QI columns against an external dataset, the attack
    k-anonymity bounds. The release gate is "this query returns zero
    rows"; until then the QI columns need generalization (coarser
    buckets) or suppression of the listed combos.

    NULLs form their own QI value (a NULL birthday is still a join
    key). One shuffle with map-side combine on the QI tuple; output is
    bounded by the number of RARE combinations, which is what makes it
    reviewable. Output: (*qi_cols stringified, n_rows), n < k.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.groupBy(*_qi_keys(qi_cols))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )


def l_diversity_audit(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """The companion audit to :func:`k_anonymity_audit`: a QI group can
    be large enough (k-anonymous) yet still leak — if all 50 rows in a
    (zip, age) group share one diagnosis, membership alone discloses
    it. Reports every QI combination whose SENSITIVE column carries
    fewer than ``l`` distinct values. Release gate: zero rows.

    NULL QI values form their own group ('<NULL>'); NULL sensitive
    values do NOT count toward diversity (an unknown value discloses
    nothing, so it cannot make a group safer). One shuffle with
    map-side combine. Output: (*qi_cols stringified, n_rows,
    n_distinct_sensitive), n_distinct < l.
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    return (
        df.groupBy(*_qi_keys(qi_cols))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(sensitive_col).cast("bigint").alias(
                "n_distinct_sensitive"
            ),
        )
        .filter(F.col("n_distinct_sensitive") < l)
    )
