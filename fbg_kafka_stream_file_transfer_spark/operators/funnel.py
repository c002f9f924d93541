"""Funnel analysis: ordered event-sequence matching per key.

"Of the users who signed up, how many then viewed, then clicked, then
purchased — in that order?" is the canonical product-analytics query,
and naively it is K chained self-joins (one per step). This operator
runs the whole chain in ONE shuffle: events are rolled up per key
(sorted struct array) and a greedy state machine implemented with
``aggregate`` — a higher-order Catalyst function, no Python — walks
the array once, taking the EARLIEST event that qualifies for the next
step (strictly after the previous step's completion). Greedy-earliest
is optimal for funnel completion (exchange argument), so the result
equals the iterative ``min(ts) WHERE ts > prev`` formulation the
DuckDB oracle uses.

Scale shape: one shuffle on the key; per-key state is that key's own
event list (bounded by per-user activity, not corpus size — the same
contract as any sessionization). The array never crosses keys and the
state machine is codegen'd JVM work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.derivations import epoch_seconds


def funnel_completion(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_preds: list[Column],
    tiebreak_col: str | None = None,
    max_gap_seconds: float | None = None,
) -> DataFrame:
    """Per-key funnel completion: for each key, the number of funnel
    steps completed in order (each step strictly after the previous)
    and the epoch-seconds completion time of each completed step.

    ``step_preds`` are boolean Columns evaluated per event (e.g.
    ``F.col("event_type") == "signup"``). Events may satisfy several
    predicates; the state machine only consults the NEXT needed step.
    ``max_gap_seconds`` bounds the gap between consecutive completed
    steps (the conversion window — Amplitude-style first-occurrence
    semantics: each step binds to its EARLIEST qualifying event, even
    when waiting for a later one would let the tail fit the window;
    the oracle's chained min-joins define the same greedy semantics).
    Returns (key, steps_completed, step_times array<double>).
    """
    if not step_preds:
        raise ValueError("need at least one funnel step")
    if max_gap_seconds is not None and max_gap_seconds <= 0:
        raise ValueError(f"max_gap_seconds must be positive, got {max_gap_seconds}")
    # a NULL key is not a funnel participant: groupBy would pool all
    # NULL-key events into one phantom "user" and score its steps
    df = df.filter(F.col(key_col).isNotNull())
    n = len(step_preds)
    order_cols = [epoch_seconds(F.col(ts_col)).alias("_t")]
    if tiebreak_col is not None:
        order_cols.append(F.col(tiebreak_col).cast("long").alias("_tb"))
    else:
        order_cols.append(F.lit(0).cast("long").alias("_tb"))
    ev = df.select(
        F.col(key_col).alias("_k"),
        F.struct(
            *order_cols,
            F.array(*[p.cast("boolean") for p in step_preds]).alias("_flags"),
        ).alias("_e"),
    )
    rolled = ev.groupBy("_k").agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
    # greedy chain walk: acc = completion times so far; an event advances
    # the funnel iff it matches the next needed step and is strictly
    # after the last completion
    def step(acc, e):
        after_prev = (F.size(acc) == 0) | (e["_t"] > F.element_at(acc, -1))
        if max_gap_seconds is not None:
            after_prev = after_prev & (
                (F.size(acc) == 0)
                | (e["_t"] <= F.element_at(acc, -1) + F.lit(float(max_gap_seconds)))
            )
        return F.when(
            (F.size(acc) < n)
            & F.coalesce(F.element_at(e["_flags"], F.size(acc) + 1), F.lit(False))
            & after_prev,
            F.concat(acc, F.array(e["_t"])),
        ).otherwise(acc)
    times = F.aggregate(
        F.col("_evs"), F.array().cast("array<double>"), step
    )
    return rolled.select(
        F.col("_k").alias(key_col),
        F.size(times).cast("int").alias("steps_completed"),
        times.alias("step_times"),
    )


def funnel_histogram(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_preds: list[Column],
    tiebreak_col: str | None = None,
    max_gap_seconds: float | None = None,
) -> DataFrame:
    """Aggregate funnel report: how many keys completed exactly k
    steps, for k = 0..len(steps). The per-key frame collapses to at
    most len(steps)+1 rows."""
    per_key = funnel_completion(
        df, key_col, ts_col, step_preds, tiebreak_col, max_gap_seconds
    )
    return (
        per_key.groupBy("steps_completed")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_seconds: int = 604800,
    fmt: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Cohort retention triangle: keys are cohorted by the time bucket
    of their FIRST activity; for each (cohort, offset) cell, how many
    of the cohort's keys were active ``offset`` buckets later, and what
    fraction of the cohort that is — the weekly-retention report every
    product team reads next to the funnel.

    Scale shape: activity dedups to (key, bucket) first — the frame
    every later step runs on, corpus-size-independent per key — then
    the cohort label is a per-key window min (same exchange as the
    dedup when Catalyst reuses partitioning), the cell roll-up is a
    keyed agg on (cohort, offset), and the cohort-size denominator is
    a window over the tiny cell frame. No joins, no corpus-wide
    window. Output: (cohort_start, week_offset, n_active,
    retention_rate).
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    from pyspark.sql.window import Window

    wk = F.floor(epoch_seconds(F.col(ts_col)) / bucket_seconds).cast("long")
    act = df.select(F.col(key_col).alias("_k"), wk.alias("_w")).distinct()
    cohorted = act.withColumn("_c", F.min("_w").over(Window.partitionBy("_k")))
    cells = (
        cohorted.groupBy("_c", (F.col("_w") - F.col("_c")).cast("int").alias("week_offset"))
        .agg(F.count_distinct("_k").cast("bigint").alias("n_active"))
    )
    size0 = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(
        Window.partitionBy("_c")
    )
    return cells.select(
        F.date_format(
            F.timestamp_seconds(F.col("_c") * bucket_seconds), fmt
        ).alias("cohort_start"),
        "week_offset",
        "n_active",
        F.round(F.col("n_active").cast("double") / size0, 6).alias("retention_rate"),
    )


def association_pairs(
    df: DataFrame, key_col: str, item_col: str, min_support: float = 0.0
) -> DataFrame:
    """Pairwise association mining (market-basket support/confidence/
    lift over co-occurrence within a key): which event types / items
    appear together in the same user's history more than chance
    predicts. The third leg of the product-analytics stack next to
    funnel and retention.

    Scale shape: the corpus first dedups to DISTINCT (key, item) — the
    only data-sized shuffle, and the frame every later step uses; the
    pair self-join is an equi-join on the key where each key
    contributes C(items_per_key, 2) pairs (bounded by per-key catalog
    breadth, not corpus size — the same per-key contract as funnel);
    item marginals are a tiny frame broadcast back onto the pair
    counts. NULL items are dropped.

    Output, per unordered pair (item_a < item_b): n_keys_both,
    support (share of all keys), confidence_a_to_b, and lift
    (support / (p_a·p_b); > 1 ⇒ positively associated). Doubles
    rounded to 6; ``min_support`` prunes rare pairs.
    """
    if not 0.0 <= min_support <= 1.0:
        raise ValueError(f"min_support must be in [0, 1], got {min_support}")
    base = (
        df.filter(F.col(item_col).isNotNull())
        .select(F.col(key_col).alias("_k"), F.col(item_col).alias("_i"))
        .distinct()
    )
    # the denominator travels as a broadcast 1-row aggregate (the
    # centroid-join pattern) so the operator stays fully lazy — no
    # driver-side count at construction time
    nk = base.select("_k").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("_nk")
    )
    marg = base.groupBy("_i").agg(F.count(F.lit(1)).cast("bigint").alias("_ni"))
    a, b = base.alias("a"), base.alias("b")
    pairs = (
        a.join(b, (F.col("a._k") == F.col("b._k")) & (F.col("a._i") < F.col("b._i")))
        .groupBy(F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys_both"))
    )
    enriched = (
        pairs.join(
            F.broadcast(marg.select(F.col("_i").alias("item_a"), F.col("_ni").alias("_na"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("_i").alias("item_b"), F.col("_ni").alias("_nb"))),
            "item_b",
        )
        .crossJoin(F.broadcast(nk))
    )
    support = F.col("n_keys_both") / F.col("_nk")
    p_a = F.col("_na") / F.col("_nk")
    p_b = F.col("_nb") / F.col("_nk")
    return (
        enriched.filter(support >= min_support)
        .select(
            "item_a",
            "item_b",
            "n_keys_both",
            F.round(support, 6).alias("support"),
            F.round(F.col("n_keys_both") / F.col("_na"), 6).alias("confidence_a_to_b"),
            F.round(support / (p_a * p_b), 6).alias("lift"),
        )
    )


def funnel_conversion_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_preds: list[Column],
    tiebreak_col: str | None = None,
    max_gap_seconds: float | None = None,
) -> DataFrame:
    """Time-to-convert report over the funnel: among keys that
    completed the WHOLE funnel, the distribution of first-step→
    last-step duration (exact p50/p95 — the numbers a growth team
    reads next to the completion histogram). One row out; the
    percentile runs over the per-key frame (one row per converted
    key), never the event stream."""
    per_key = funnel_completion(
        df, key_col, ts_col, step_preds, tiebreak_col, max_gap_seconds
    )
    n = len(step_preds)
    conv = per_key.filter(F.col("steps_completed") == n).select(
        (
            F.element_at("step_times", n) - F.element_at("step_times", 1)
        ).alias("_dur")
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(_dur, 0.5)"), 3).alias("p50_seconds"),
        F.round(F.expr("percentile(_dur, 0.95)"), 3).alias("p95_seconds"),
    )
