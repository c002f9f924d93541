"""Monitoring-plane aggregations (reference A1-A6).

The reference's only analytical queries live in its Prometheus alert
rules (k8s/monitoring/alerts.yaml): sliding-window error rates, p95
latency quantiles, backlog counts, per-file DLQ counters. Each becomes a
windowed DataFrame aggregation that runs identically in batch (over an
event-log table) and in Structured Streaming (over the live stream) —
the unified-model win the survey calls out (SURVEY.md §5.2).

Scale notes: all of these are partial-aggregatable (sum/count/max) or
sketch-based (percentile_approx) — map-side combine keeps the shuffle at
O(groups), not O(rows), so they hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def error_rate(
    df: DataFrame,
    time_col: str = "event_time",
    status_col: str = "status",
    failed_value: str = "FAILED",
    window: str = "5 minutes",
    slide: str | None = None,
) -> DataFrame:
    """A1 — failed/total ratio per (sliding) window
    (alerts.yaml:28-38: rate(failed[5m]) / rate(total[5m])).

    ``slide=None`` gives tumbling windows; pass "1 minute" for the
    alert's 30s-evaluated sliding behavior.
    """
    w = F.window(F.col(time_col), window, slide) if slide else F.window(F.col(time_col), window)
    return (
        df.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col(status_col) == failed_value, 1).otherwise(0)).alias("failed"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("total"),
            F.col("failed"),
            (F.col("failed") / F.col("total")).alias("error_rate"),
        )
    )


def p95_processing_time(
    df: DataFrame,
    time_col: str = "event_time",
    duration_col: str = "processing_seconds",
    window: str = "5 minutes",
    exact: bool = False,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """A3/A4 — p95 latency per window (alerts.yaml:51-60,76-85).

    ``exact=False`` (default) uses the approx-percentile sketch — the
    scale path, mergeable map-side like Prometheus's bucketed
    histogram_quantile. ``exact=True`` uses the exact interpolated
    percentile (for oracle comparison). ``group_cols`` adds grouping
    dimensions inside each window — A4's per-path Docling quantile
    (alerts.yaml:76-85 groups by path) is
    ``group_cols=["path"]``; sketch mergeability is unaffected, the
    shuffle key just widens to (window, *dims).
    """
    pct = (
        F.expr(f"percentile({duration_col}, 0.95)")
        if exact
        else F.percentile_approx(F.col(duration_col), 0.95, 10000)
    )
    dims = list(group_cols or [])
    return (
        df.groupBy(F.window(F.col(time_col), window).alias("w"), *dims)
        .agg(pct.alias("p95_seconds"), F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), *dims, "p95_seconds", "n")
    )


def backlog_running_count(
    df: DataFrame,
    time_col: str = "event_time",
    arrival_status: str = "DLQ",
    drain_status: str = "REPROCESSED",
    status_col: str = "status",
    bucket: str = "1 day",
) -> DataFrame:
    """A2/A5 — running backlog = cumulative arrivals − cumulative drains
    (alerts.yaml:40-49,115-124: queue depth over time).

    Batch form uses a time-ordered running sum. The cumulative window is
    a single global ordering — fine for the per-bucket rollup cardinality
    (days), never applied at raw-row grain at scale.
    """
    bucketed = (
        df.groupBy(F.window(F.col(time_col), bucket).alias("w"))
        .agg(
            F.sum(F.when(F.col(status_col) == arrival_status, 1).otherwise(0)).alias("arrivals"),
            F.sum(F.when(F.col(status_col) == drain_status, 1).otherwise(0)).alias("drains"),
        )
        .select(F.col("w.start").alias("bucket_start"), "arrivals", "drains")
    )
    running = Window.orderBy("bucket_start").rowsBetween(Window.unboundedPreceding, 0)
    return bucketed.withColumn(
        "backlog", F.sum(F.col("arrivals") - F.col("drains")).over(running)
    )


def dlq_count_by_file(df: DataFrame, file_col: str = "file_name") -> DataFrame:
    """A6 — the micrometer DLQ counter tagged by file
    (dlq-handler.yaml:129-132)."""
    return df.groupBy(file_col).agg(F.count("*").alias("dlq_messages_total"))


def sustained_breach(
    windowed: DataFrame,
    value_col: str,
    threshold: float,
    consecutive: int,
    order_col: str = "window_start",
    window_step_seconds: int | None = None,
) -> DataFrame:
    """The PromQL ``for: N minutes`` debounce (alerts.yaml:33 etc.):
    alert only when the threshold is breached in `consecutive` successive
    windows. Implemented as a count-based running window over the
    (small) aggregated series — no raw-data pass.

    Pass ``window_step_seconds`` to enforce WALL-CLOCK continuity: the N
    breached rows must also span exactly (N-1)×step. Without it, rows
    adjacent in the series but separated by traffic-less (absent)
    windows would count as consecutive — not what `for:` means.
    """
    w = Window.orderBy(order_col).rowsBetween(-(consecutive - 1), 0)
    breached = F.when(F.col(value_col) > threshold, 1).otherwise(0)
    out = (
        windowed.withColumn("_b", breached)
        .withColumn("breach_run", F.sum("_b").over(w))
    )
    alert = F.col("breach_run") >= consecutive
    if window_step_seconds is not None:
        lag_w = Window.orderBy(order_col)
        span = F.unix_timestamp(F.col(order_col)) - F.unix_timestamp(
            F.lag(order_col, consecutive - 1).over(lag_w)
        )
        alert = alert & F.coalesce(
            span == (consecutive - 1) * window_step_seconds, F.lit(False)
        )
    return out.withColumn("alert", alert).drop("_b")


def rolling_zscore_spikes(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    count_col: str,
    *,
    lookback: int = 10,
    min_history: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Anomaly detection beyond the reference's fixed thresholds: per
    group, score each time bucket's count against the mean/std of the
    ``lookback`` PRECEDING buckets (the current bucket never pollutes
    its own baseline) and flag |z| >= ``z_threshold`` — the standard
    self-calibrating alert for "this queue/file-type suddenly spiked"
    where a static `> 1000` rule (alerts.yaml A5) goes stale as traffic
    grows.

    Cross-engine determinism by construction: the rolling moments are
    built from integer ``sum`` and ``sum of squares`` over integer
    counts — exact in both engines — and only the final z division runs
    in doubles, so there is no stddev-algorithm (Welford vs two-pass)
    divergence to round away. Buckets with fewer than ``min_history``
    preceding rows, or zero variance, emit NULL z (unknowable, not
    zero). Rolling frames are ROW-based over the ordered buckets; a
    corpus with gaps should densify first if calendar-time baselines
    matter.

    Scale: input is the already-bucketed series (O(groups × buckets),
    not O(events)); one shuffle on the group key, the window runs
    per-group ordered by bucket. Returns the input columns plus
    ``mean_prev``, ``std_prev``, ``zscore`` (round 4), ``spike``.
    """
    if lookback < 2 or min_history < 2 or min_history > lookback:
        raise ValueError(
            f"need 2 <= min_history <= lookback, got {min_history}/{lookback}"
        )
    x = F.col(count_col).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(bucket_col)
        .rowsBetween(-lookback, -1)
    )
    n = F.count(x).over(w)
    s1 = F.sum(x).over(w)                    # exact integer
    s2 = F.sum(x * x).over(w)                # exact integer
    mean = s1 / n
    var = (s2 - (s1 * s1) / n) / (n - 1)
    std = F.sqrt(var)
    z = (x - mean) / std
    ok = (n >= min_history) & (var > 0)
    return (
        df.withColumn("mean_prev", F.round(F.when(ok, mean), 4))
        .withColumn("std_prev", F.round(F.when(ok, std), 4))
        .withColumn("zscore", F.round(F.when(ok, z), 4))
        .withColumn(
            "spike",
            F.coalesce(
                (F.abs(F.when(ok, z)) >= z_threshold), F.lit(False)
            ).cast("int"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    threshold: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Robust per-group outlier detection via the modified z-score
    0.6745·(x − median)/MAD (Iglewicz–Hoaglin) — the heavy-tail-safe
    complement to ``rolling_zscore_spikes``: a single 1e9 metric value
    drags a mean/std baseline far enough to mask every other anomaly,
    but moves the median/MAD not at all. The reference's alert rules
    (k8s/monitoring/alerts.yaml) are all static thresholds; this is the
    distribution-calibrated upgrade for "which latency/size readings
    are abnormal for their event type".

    Two grouped exact medians (value, then |value − median|), each one
    shuffle on the group key; the per-group stats tables are
    O(#groups) and broadcast back onto the events. Exact ``median`` is
    the oracle-parity default — both engines interpolate even counts as
    (a+b)/2, bit-identically. At 100 TB per-group exact medians buffer
    each group's values in the aggregation; pass ``approx=True`` to use
    ``approx_percentile`` (GK sketch, bounded memory, mergeable) once
    the result no longer needs to hash-match a row-exact oracle.

    Rows in groups with MAD = 0 (constant-valued group) get NULL score
    and are never flagged — unknowable, not zero.

    Returns the input columns plus ``group_median``, ``group_mad``,
    ``robust_z`` (round 4), ``is_outlier`` (int).
    """
    med_of = (
        (lambda c: F.expr(f"approx_percentile({c}, 0.5, 10000)"))
        if approx
        else (lambda c: F.expr(f"median({c})"))
    )
    med = df.groupBy(*group_cols).agg(med_of(value_col).alias("_med"))
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(*group_cols).agg(med_of("_dev").alias("_mad"))
    scored = dev.join(F.broadcast(mad), group_cols)
    rz = F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad")
    ok = F.col("_mad") > 0
    r9 = F.round(F.when(ok, rz), 9)
    return (
        scored.withColumn("group_median", F.round("_med", 6))
        .withColumn("group_mad", F.round("_mad", 6))
        .withColumn("robust_z", F.round(r9, 4) + F.lit(0.0))
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(r9) >= threshold, F.lit(False)).cast("int"),
        )
        .drop("_med", "_mad", "_dev")
    )


def decayed_counts(
    df: DataFrame,
    key_col: str,
    time_col: str,
    bucket_seconds: int = 3600,
    halflife_buckets: int = 24,
    max_halflives: int = 40,
) -> DataFrame:
    """Time-decayed activity score per key ("trending now"): each event
    contributes weight 2^-(age_buckets // halflife_buckets) relative to
    the corpus's latest bucket, so recent activity dominates and stale
    keys fade without any windowed state.

    Portability is the design constraint: a true exponential
    ``exp(-λΔt)`` is NOT bit-stable across engines (libm differs in
    ulps) and float sums are order-dependent — both poison hash
    equality. Here the decay is a STAIRCASE exponential (integer
    halving steps via integer division), each weight is the integer
    ``1 << (max_halflives - steps)``, and the per-key total is an
    EXACT sum in DECIMAL(38,0) (room for ~10^26 full-weight events per
    key — no silent BIGINT wrap for hot keys) divided once by
    2^max_halflives at the end — deterministic on any engine, any
    partitioning, by construction. Events older than
    ``max_halflives`` half-lives weigh 0.

    One shuffle on the key; the latest-bucket anchor is a broadcast
    1-row aggregate. Output: (key, n_events, decayed_score round 6).
    """
    from ..functions.derivations import epoch_seconds

    if bucket_seconds <= 0 or halflife_buckets <= 0:
        raise ValueError("bucket_seconds and halflife_buckets must be positive")
    if not 1 <= max_halflives <= 62:
        raise ValueError(f"max_halflives must be in [1, 62], got {max_halflives}")
    reserved = {"_latest", "_steps"} & set(df.columns)
    if reserved:
        raise ValueError(f"column name(s) {sorted(reserved)} are reserved")
    bucket = F.floor(epoch_seconds(F.col(time_col)) / bucket_seconds).cast("long")
    anchor = df.agg(F.max(bucket).alias("_latest"))
    steps = F.floor((F.col("_latest") - bucket) / halflife_buckets).cast("int")
    # python shiftleft() takes only literal bit counts; the SQL form
    # accepts expressions, so the shift goes through F.expr
    w = F.expr(
        f"CASE WHEN _steps <= {max_halflives} "
        f"THEN shiftleft(CAST(1 AS BIGINT), {max_halflives} - _steps) "
        "ELSE CAST(0 AS BIGINT) END"
    ).cast("decimal(38,0)")
    scale = float(1 << max_halflives)
    return (
        df.crossJoin(F.broadcast(anchor))
        .withColumn("_steps", steps)
        .groupBy(F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(w).cast("double") / F.lit(scale), 6).alias(
                "decayed_score"
            ),
        )
    )


def seasonal_baseline_anomalies(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    val_col: str,
    n_sigma: float = 3.0,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Seasonality-aware anomaly flags: each event is compared against
    the mean/std of its OWN (group, hour-of-day) cell — "is this error
    count high *for 3 am*?" — the first upgrade from a global z-score
    (:func:`rolling_zscore_spikes`) once traffic has a daily cycle.

    Plan shape: one aggregation builds the 24×|groups| baseline table
    (decimal-exact Σx/Σx² moments, order-independent — the
    profile_correlations treatment), which broadcasts back onto the
    event scan; rows never shuffle. At 100 TB the baseline stays tiny
    (24 rows per group), so the broadcast holds at any fact size.

    Sample std (n−1); cells with n ≤ 1 or zero variance yield no flags
    (NULL z). Output: flagged events only — ``id_cols`` passthrough,
    then group, hour_of_day, value, baseline_mean, baseline_std,
    zscore — doubles rounded 6, ±0.0-canonicalized.
    """
    hod = F.hour(F.col(ts_col))
    # decimal(18,6) domain guard (profile_correlations treatment): a
    # value >= 1e12 would cast to NULL in the moment sums while the
    # count still counted the row, silently biasing the baseline — so
    # out-of-domain values are excluded from ALL moments consistently
    # (and from flagging below), mirrored in the oracle SQL.
    ok = F.col(val_col).isNotNull() & (F.abs(F.col(val_col)) < F.lit(1e12))
    x = F.when(ok, F.col(val_col)).cast("decimal(18,6)")
    base = (
        df.groupBy(F.col(group_col).alias("_g"), hod.alias("_hod"))
        .agg(
            F.sum(F.when(ok, 1)).cast("bigint").alias("_n"),
            F.sum(x).cast("double").alias("_sx"),
            F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("_sxx"),
        )
    )
    n = F.col("_n").cast("double")
    mean = F.col("_sx") / n
    var = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")) / (n * (n - 1.0))
    std = F.when((F.col("_n") > 1) & (var > 0), F.sqrt(var))
    z = F.when(std > 0, (F.col(val_col) - mean) / std)
    return (
        df.filter(ok)
        .join(
            F.broadcast(base),
            (F.col(group_col) == F.col("_g")) & (hod == F.col("_hod")),
        )
        .withColumn("_z", z)
        .filter(F.abs(F.col("_z")) >= n_sigma)
        .select(
            *[F.col(c) for c in id_cols],
            F.col(group_col),
            F.col("_hod").alias("hour_of_day"),
            F.round(F.col(val_col), 6).alias("value"),
            F.round(mean, 6).alias("baseline_mean"),
            F.round(std, 6).alias("baseline_std"),
            (F.round(F.col("_z"), 6) + F.lit(0.0)).alias("zscore"),
        )
    )


def merge_incidents(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    flag: Column,
    gap_seconds: int,
) -> DataFrame:
    """Merge flagged events into INCIDENTS: consecutive flagged rows per
    key closer than ``gap_seconds`` collapse into one interval — the
    alert-fatigue fix between "every anomalous point pages" and "one
    page per incident window". Classic gaps-and-islands: filter to
    flagged rows, lag per key, new-incident marker on gap breach,
    running sum numbers the islands, one aggregate per island.

    One shuffle on the key (window + the final groupBy share the
    partitioning); a hot key costs its own flagged-event count.
    NULL-timestamp rows are dropped (malformed-event contract).
    Output: (key, incident_start/end formatted strings, n_events,
    duration_seconds).
    """
    from ..functions.derivations import epoch_seconds

    flagged = df.filter(flag & F.col(ts_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col)
    sec = F.floor(epoch_seconds(F.col(ts_col)))
    prev = F.lag(sec).over(w)
    marked = flagged.withColumn(
        "_new", F.when(prev.isNull() | (sec - prev >= gap_seconds), 1).otherwise(0)
    )
    numbered = marked.withColumn(
        "_inc", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        numbered.groupBy(key_col, "_inc")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("incident_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("incident_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.floor(epoch_seconds(F.max(ts_col)))
             - F.floor(epoch_seconds(F.min(ts_col)))).cast("bigint").alias("duration_seconds"),
        )
        .drop("_inc")
    )
