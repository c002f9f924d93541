"""Monitoring-plane queries (SURVEY §2.e A1-A6) in batch form.

The reference's analytical workload is its Prometheus alert rules
(k8s/monitoring/alerts.yaml). Here each runs over the events table
mapped to a `pipeline_events` shape (FIXTURES.md §4): status FAILED for
'error' events, processing_seconds = value. The same operator code runs
streaming in :mod:`..streaming` — these batch forms are the
oracle-checkable projection of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.derivations import epoch_seconds
from ..operators import monitoring
from ..sources.tables import load_table
from .base import Q

#: DuckDB mirror of the events → pipeline_events mapping.
PIPE_CTE = """
WITH pipeline_events AS (
  SELECT ts AS event_time,
         CASE WHEN event_type = 'error' THEN 'FAILED' ELSE 'COMPLETED' END AS status,
         value AS processing_seconds,
         'file-' || event_id || '.' || CASE event_type
             WHEN 'click' THEN 'png' WHEN 'purchase' THEN 'pdf'
             WHEN 'signup' THEN 'docx' WHEN 'view' THEN 'txt'
             WHEN 'error' THEN 'exe' END AS file_name,
         event_type,
         user_id
  FROM events
)
"""


def _pipeline_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ext = F.element_at(
        F.create_map(
            F.lit("click"), F.lit("png"), F.lit("purchase"), F.lit("pdf"),
            F.lit("signup"), F.lit("docx"), F.lit("view"), F.lit("txt"),
            F.lit("error"), F.lit("exe"),
        ),
        F.col("event_type"),
    )
    return ev.select(
        F.col("ts").alias("event_time"),
        F.when(F.col("event_type") == "error", F.lit("FAILED"))
        .otherwise(F.lit("COMPLETED"))
        .alias("status"),
        F.col("value").alias("processing_seconds"),
        F.concat_ws(".", F.concat(F.lit("file-"), F.col("event_id")), ext).alias("file_name"),
        F.col("event_type"),
        F.col("user_id"),
    )


def _fmt_window(df: DataFrame, col: str = "window_start") -> DataFrame:
    return df.withColumn(col, F.date_format(F.col(col), "yyyy-MM-dd HH:mm:ss"))


def _a1_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = monitoring.error_rate(_pipeline_events(spark, sf_dir), window="5 minutes")
    return _fmt_window(out).withColumn("error_rate", F.round("error_rate", 6))


def _a1_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = monitoring.error_rate(
        _pipeline_events(spark, sf_dir), window="5 minutes", slide="1 minute"
    )
    return _fmt_window(out).withColumn("error_rate", F.round("error_rate", 6))


def _a3_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = monitoring.p95_processing_time(
        _pipeline_events(spark, sf_dir), window="1 day", exact=True
    )
    return _fmt_window(out).withColumn("p95_seconds", F.round("p95_seconds", 6))


def _a4_p95_by_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — the Docling-latency quantile grouped per PATH
    (alerts.yaml:76-85 carries a path label), not just per window:
    the processing path here is the file kind (extension), the dimension
    that decides which conversion pipeline a document takes."""
    pe = _pipeline_events(spark, sf_dir).withColumn(
        "path", F.element_at(F.split("file_name", "\\."), -1)
    )
    out = monitoring.p95_processing_time(
        pe, window="1 day", exact=True, group_cols=["path"]
    )
    return (
        _fmt_window(out)
        .withColumn("p95_seconds", F.round("p95_seconds", 6))
        .select("window_start", "path", "p95_seconds", "n")
    )


def _a2_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = monitoring.backlog_running_count(
        _pipeline_events(spark, sf_dir),
        arrival_status="FAILED",
        drain_status="COMPLETED",
        bucket="1 day",
    )
    return (
        out.withColumn("bucket_start", F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss"))
        .select("bucket_start", "arrivals", "drains", "backlog")
    )


def _a6_dlq_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    failed = _pipeline_events(spark, sf_dir).filter(F.col("status") == "FAILED")
    day = F.date_format("event_time", "yyyy/MM/dd").alias("processing_date")
    return failed.groupBy(day).agg(F.count("*").alias("dlq_messages_total"))


def _a5_partition_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consumer-lag analogue: per partition (user_id % 8), event count and
    latest event time (alerts.yaml:115-124 backlog proxy)."""
    pe = _pipeline_events(spark, sf_dir)
    return (
        pe.groupBy((F.col("user_id") % 8).alias("partition_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.max("event_time"), "yyyy-MM-dd HH:mm:ss").alias("latest_event"),
        )
    )


def _alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL `for: 5m` debounce (A1 + sustained_breach): alert fires
    only when error_rate > 0.1 in 5 consecutive 5-minute windows."""
    rate = monitoring.error_rate(_pipeline_events(spark, sf_dir), window="5 minutes")
    out = monitoring.sustained_breach(
        rate, "error_rate", 0.1, 5, window_step_seconds=300
    )
    return (
        _fmt_window(out)
        .select(
            "window_start",
            F.round("error_rate", 6).alias("error_rate"),
            F.col("breach_run").cast("int").alias("breach_run"),
            "alert",
        )
    )


QUERIES: dict[str, Q] = {
    "a1_error_rate_5m": Q(
        _a1_tumbling,
        PIPE_CTE
        + """
SELECT strftime(time_bucket(INTERVAL '5 minutes', event_time), '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS total,
       CAST(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
       round(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) / count(*), 6) AS error_rate
FROM pipeline_events
GROUP BY time_bucket(INTERVAL '5 minutes', event_time)
""",
        doc="A1 route error rate, tumbling (alerts.yaml:28-38)",
    ),
    "a1_error_rate_sliding": Q(
        _a1_sliding,
        PIPE_CTE
        + """
, slid AS (
  SELECT time_bucket(INTERVAL '1 minute', event_time) - (k.k * INTERVAL '1 minute') AS ws,
         status
  FROM pipeline_events, (SELECT unnest(range(5)) AS k) k
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS total,
       CAST(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
       round(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) / count(*), 6) AS error_rate
FROM slid GROUP BY ws
""",
        doc="A1 sliding 5m/1m window (PromQL rate[5m] @30s eval)",
    ),
    "a3_p95_processing_time": Q(
        _a3_p95,
        PIPE_CTE
        + """
SELECT strftime(time_bucket(INTERVAL '1 day', event_time), '%Y-%m-%d %H:%M:%S') AS window_start,
       round(quantile_cont(processing_seconds, 0.95), 6) AS p95_seconds,
       count(*) AS n
FROM pipeline_events
GROUP BY time_bucket(INTERVAL '1 day', event_time)
""",
        doc="A3 p95 latency per window (alerts.yaml:51-60)",
    ),
    "a4_p95_docling_by_path": Q(
        _a4_p95_by_path,
        PIPE_CTE
        + """
SELECT strftime(time_bucket(INTERVAL '1 day', event_time), '%Y-%m-%d %H:%M:%S') AS window_start,
       string_split(file_name, '.')[-1] AS path,
       round(quantile_cont(processing_seconds, 0.95), 6) AS p95_seconds,
       count(*) AS n
FROM pipeline_events
GROUP BY 1, 2
""",
        doc="A4 p95 Docling latency per path (alerts.yaml:76-85)",
    ),
    "a2_backlog_running": Q(
        _a2_backlog,
        PIPE_CTE
        + """
, buckets AS (
  SELECT time_bucket(INTERVAL '1 day', event_time) AS b,
         CAST(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS arrivals,
         CAST(sum(CASE WHEN status = 'COMPLETED' THEN 1 ELSE 0 END) AS BIGINT) AS drains
  FROM pipeline_events GROUP BY 1
)
SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start, arrivals, drains,
       CAST(sum(arrivals - drains) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
FROM buckets
""",
        doc="A2/A5 running backlog (alerts.yaml:40-49)",
    ),
    "a6_dlq_count_by_date": Q(
        _a6_dlq_by_type,
        PIPE_CTE
        + """
SELECT strftime(event_time, '%Y/%m/%d') AS processing_date,
       count(*) AS dlq_messages_total
FROM pipeline_events WHERE status = 'FAILED'
GROUP BY 1
""",
        doc="A6 DLQ counter (dlq-handler.yaml:129-132)",
    ),
    "a5_partition_lag": Q(
        _a5_partition_lag,
        PIPE_CTE
        + """
SELECT user_id % 8 AS partition_id,
       count(*) AS n_events,
       strftime(max(event_time), '%Y-%m-%d %H:%M:%S') AS latest_event
FROM pipeline_events GROUP BY 1
""",
        doc="A5 consumer-lag/backlog proxy (alerts.yaml:115-124)",
    ),
    "alert_sustained_breach": Q(
        _alert_debounce,
        PIPE_CTE
        + """
, rate AS (
  SELECT time_bucket(INTERVAL '5 minutes', event_time) AS ws,
         count(*) AS total,
         CAST(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
         sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) / count(*) AS error_rate
  FROM pipeline_events GROUP BY 1
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       round(error_rate, 6) AS error_rate,
       CAST(sum(CASE WHEN error_rate > 0.1 THEN 1 ELSE 0 END)
            OVER (ORDER BY ws ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS INTEGER) AS breach_run,
       CAST(sum(CASE WHEN error_rate > 0.1 THEN 1 ELSE 0 END)
            OVER (ORDER BY ws ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS INTEGER) >= 5
       AND coalesce(floor(epoch(ws)) - lag(floor(epoch(ws)), 4) OVER (ORDER BY ws) = 4 * 300,
                    FALSE) AS alert
FROM rate
""",
        doc="PromQL `for:` debounce (alerts.yaml:33) — N consecutive windows AND wall-clock-contiguous",
    ),
}


def _q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (5-minute inactivity gap) — the window
    kind the reference lacks (SURVEY §2.e notes none exist); Spark's
    native ``session_window`` supplies it. Scale: groupBy shuffles on
    (user, session) — standard keyed agg."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "5 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def _q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps (lead/lag window op) — backlog/burst
    diagnostics over the transfer stream."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(epoch_seconds(F.col("ts")))
    prev = F.lag(sec).over(w)
    return ev.select(
        "event_id",
        "user_id",
        (sec - prev).cast("bigint").alias("gap_seconds"),
    )


QUERIES["session_window_counts"] = Q(
    _q_session_windows,
    """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM events WHERE ts IS NOT NULL  -- session_window drops NULL-ts rows
), m AS (
  SELECT user_id, ts,
         CASE WHEN pts IS NULL OR epoch(ts) - epoch(pts) >= 300 THEN 1 ELSE 0 END AS new_s
  FROM o
), s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m
)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       user_id, count(*) AS n_events
FROM s GROUP BY user_id, sid
""",
    doc="session windows (gap 5 m) — native session_window vs gaps-and-islands oracle",
)

QUERIES["interarrival_gaps"] = Q(
    _q_interarrival,
    """
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) - lag(floor(epoch(ts)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_seconds
FROM events
""",
    doc="per-user inter-arrival gaps (lead/lag windowing)",
)


def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event picks up the most recent preceding
    purchase value for the same user (kdb/merge_asof semantics — an
    operator Spark lacks as a built-in; see operators.timejoin)."""
    from ..operators.timejoin import as_of_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))  # kill (user, ts) ties
    )
    out = as_of_join(
        errors, purchases, ["user_id"], "ts", "ts", ["last_purchase_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("error_time"),
        F.round("last_purchase_value", 6).alias("last_purchase_value"),
    )


QUERIES["join_asof_last_purchase"] = Q(
    _q_asof,
    """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), purchases AS (
  SELECT user_id, ts, max(value) AS last_purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_time,
       round(p.last_purchase_value, 6) AS last_purchase_value
FROM errors e
ASOF LEFT JOIN purchases p ON e.user_id = p.user_id AND e.ts >= p.ts
""",
    doc="as-of join (sort-based, one shuffle) vs DuckDB native ASOF JOIN oracle",
)


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: errors landing inside the hour after a purchase by the
    same user, counted per user (bucketed interval join — equi-join on
    time cells instead of an inequality cross join)."""
    from ..operators.timejoin import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
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
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.min("error_id").alias("first_error"),
        F.max("purchase_id").alias("last_purchase"),
    )


QUERIES["join_range_error_after_purchase"] = Q(
    _q_range_join,
    """
WITH errors AS (
  SELECT user_id, event_id AS error_id, ts AS ets FROM events WHERE event_type = 'error'
), purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS pstart, ts + INTERVAL 1 HOUR AS pend
  FROM events WHERE event_type = 'purchase'
)
SELECT e.user_id, count(*) AS n_pairs,
       min(e.error_id) AS first_error, max(p.purchase_id) AS last_purchase
FROM errors e JOIN purchases p
  ON e.user_id = p.user_id AND p.pstart <= e.ets AND e.ets < p.pend
GROUP BY 1
""",
    doc="range/interval join via time-cell bucketing vs plain inequality-join oracle",
)


def _q_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB-style continuous aggregate: 1m → 1h → 1d, each level
    re-aggregated from the finer level's partials (raw scanned once)."""
    from ..operators.rollup import hypertable_rollup

    ev = load_table(spark, sf_dir, "events")
    out = hypertable_rollup(ev, "ts", "value", ["1m", "1h", "1d"])
    return out.select(
        "resolution",
        "bucket_start",
        "n",
        F.round("sum_v", 2).alias("sum_v"),
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
    )


QUERIES["hypertable_rollup_events"] = Q(
    _q_hypertable,
    """
WITH lv AS (
  SELECT s FROM (VALUES (60), (3600), (86400)) AS t(s)
)
SELECT CASE s WHEN 60 THEN '1m' WHEN 3600 THEN '1h' ELSE '1d' END AS resolution,
       CAST(floor(epoch(ts) / s) * s AS BIGINT) AS bucket_start,
       count(*) AS n,
       round(CAST(sum(value) AS DOUBLE), 2) AS sum_v,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v
FROM events, lv
GROUP BY 1, 2
""",
    doc="hypertable continuous rollup (1m/1h/1d, hierarchical partial re-aggregation)",
)


def _q_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch over three columns — deterministic md5-based
    estimator, so the oracle hash-matches it EXACTLY (impossible with
    engine-internal HLL)."""
    from ..operators.rollup import kmv_distinct

    ev = load_table(spark, sf_dir, "events")
    parts = []
    for c in ("user_id", "event_type", "event_id"):
        parts.append(kmv_distinct(ev, c, k=256).select(F.lit(c).alias("column_name"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES["sketch_kmv_distinct"] = Q(
    _q_kmv,
    """
WITH h AS (
  SELECT 'user_id' AS column_name,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           / CAST(16::HUGEINT ** 15 AS DOUBLE) AS h
  FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT 'event_type',
         ('0x' || substring(md5(event_type), 1, 15))::BIGINT
           / CAST(16::HUGEINT ** 15 AS DOUBLE)
  FROM (SELECT DISTINCT event_type FROM events)
  UNION ALL
  SELECT 'event_id',
         ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           / CAST(16::HUGEINT ** 15 AS DOUBLE)
  FROM (SELECT DISTINCT event_id FROM events)
), ranked AS (
  SELECT column_name, h,
         row_number() OVER (PARTITION BY column_name ORDER BY h) AS rn
  FROM h
), kept AS (
  SELECT column_name, h FROM ranked WHERE rn <= 256
)
SELECT column_name,
       count(*) AS n_kept,
       round(max(h), 9) AS kth_hash,
       round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                  ELSE 255 / max(h) END, 3) AS estimate
FROM kept GROUP BY 1
""",
    doc="KMV distinct-count sketch — portable md5 hashing, exact cross-engine parity",
)


def _q_zscore_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score spike detection over 5-minute event-type buckets
    (operators/monitoring.py rolling_zscore_spikes) — the
    self-calibrating extension of the reference's fixed-threshold
    alerts (alerts.yaml A5's static "> 1000"): each bucket is scored
    against the mean/std of its 10 preceding buckets."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        F.col("event_type"),
        F.date_format(
            F.window(F.col("ts"), "5 minutes").start, "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket_start"),
    ).agg(F.count("*").alias("n_events"))
    return monitoring.rolling_zscore_spikes(
        b, "event_type", "bucket_start", "n_events"
    )


QUERIES["monitoring_zscore_spikes"] = Q(
    _q_zscore_spikes,
    """
WITH b AS (
  SELECT event_type,
         strftime(time_bucket(INTERVAL '5 minutes', ts),
                  '%Y-%m-%d %H:%M:%S') AS bucket_start,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, bucket_start, n_events,
         count(n_events) OVER w AS n,
         CAST(sum(n_events) OVER w AS BIGINT) AS s1,
         CAST(sum(n_events * n_events) OVER w AS BIGINT) AS s2
  FROM b
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
), c AS (
  SELECT event_type, bucket_start, n_events, n,
         CAST(s1 AS DOUBLE) / n AS mean,
         (CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / n) / (n - 1) AS var
  FROM r
), f AS (
  SELECT event_type, bucket_start, n_events,
         (n >= 5 AND var > 0) AS ok, mean, sqrt(var) AS std
  FROM c
)
SELECT event_type, bucket_start, n_events,
       round(CASE WHEN ok THEN mean END, 4) AS mean_prev,
       round(CASE WHEN ok THEN std END, 4) AS std_prev,
       round(CASE WHEN ok THEN (n_events - mean) / std END, 4) AS zscore,
       CAST(coalesce(abs(CASE WHEN ok THEN (n_events - mean) / std END) >= 3.0,
                     FALSE) AS INTEGER) AS spike
FROM f
""",
    doc="rolling z-score spike detection per event-type bucket (self-calibrating alert)",
)



def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outliers per event type (operators/monitoring.py
    mad_outliers): modified z-score 0.6745*(x-median)/MAD, the
    heavy-tail-safe twin of the rolling z-score spikes. Returns only
    the flagged rows (the alert payload), with the group stats."""
    ev = load_table(spark, sf_dir, "events")
    out = monitoring.mad_outliers(ev, "value", ["event_type"], threshold=3.5)
    return out.filter(F.col("is_outlier") == 1).select(
        "event_id", "event_type",
        F.round("value", 6).alias("value"),
        "group_median", "group_mad", "robust_z",
    )


QUERIES["monitoring_mad_outliers"] = Q(
    _q_mad_outliers,
    """
WITH m AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
), d AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS dev
  FROM events e JOIN m USING (event_type)
), md AS (
  SELECT event_type, median(dev) AS mad FROM d GROUP BY 1
), scored AS (
  SELECT d.event_id, d.event_type, d.value, d.med, md.mad,
         round(CASE WHEN md.mad > 0
               THEN 0.6745 * (d.value - d.med) / md.mad END, 9) AS r9
  FROM d JOIN md USING (event_type)
)
SELECT event_id, event_type, round(value, 6) AS value,
       round(med, 6) AS group_median, round(mad, 6) AS group_mad,
       round(r9, 4) + 0.0 AS robust_z
FROM scored WHERE abs(r9) >= 3.5
""",
    doc="MAD modified-z outliers per event type (robust anomaly alert)",
)



# Registry order is driver-contract (see queries/__init__.py): the
# never-yet-certified time-series operators lead — the three formerly
# NTZ-broken ones first so their fix gets a hard CORRECTNESS row — and
# the a1-a6 alert queries (driver-green in r03 AND r04) trail.
def _q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD2 validity intervals per user: no-op repeats
    collapsed, each state run bounded by the next change. One exchange
    on user_id shared by all three window ops."""
    from ..operators.cdc import changelog_to_scd2

    ev = load_table(spark, sf_dir, "events")
    return changelog_to_scd2(
        ev, "user_id", "ts", "event_type", tiebreak_cols=("event_id",)
    )


QUERIES["cdc_scd2_intervals"] = Q(
    _q_scd2,
    """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL  -- malformed-event contract (operator drops NULL ts)
), c AS (
  SELECT * FROM o WHERE rn = 1 OR event_type IS DISTINCT FROM prev
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM c
""",
    doc="SCD2 compaction of the event changelog (collapse no-ops, validity intervals)",
)


def _q_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 compaction: current state per user (last writer wins,
    event_id tie-break), whole row kept."""
    from ..operators.cdc import latest_state

    ev = load_table(spark, sf_dir, "events")
    return latest_state(ev, "user_id", "ts", tiebreak_cols=("event_id",)).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.round("value", 6).alias("last_value"),
    )


QUERIES["cdc_latest_state"] = Q(
    _q_latest_state,
    """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       round(value, 6) AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts IS NOT NULL)
WHERE rn = 1
""",
    doc="type-1 changelog compaction: latest whole row per key",
)


def _q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user resample with forward fill — dense grid between
    each key's first/last observation, decimal-exact bucket means."""
    from ..operators.rollup import resample_forward_fill

    ev = load_table(spark, sf_dir, "events")
    return resample_forward_fill(ev, "user_id", "ts", "value", 3600)


QUERIES["ts_gapfill_forward"] = Q(
    _q_gapfill,
    """
WITH b AS (
  SELECT user_id AS k, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bk,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean
  FROM events GROUP BY 1, 2
), span AS (
  SELECT k, min(bk) AS lo, max(bk) AS hi FROM b GROUP BY 1
), grid AS (
  SELECT k, unnest(generate_series(lo, hi)) AS bk FROM span
), j AS (
  SELECT g.k, g.bk, b.mean FROM grid g LEFT JOIN b ON g.k = b.k AND g.bk = b.bk
)
SELECT k AS user_id,
       strftime(make_timestamp(bk * 3600 * 1000000), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       last_value(mean IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY bk
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       CASE WHEN mean IS NULL THEN 1 ELSE 0 END AS filled
FROM j
""",
    doc="time-series resample + gap-fill + forward fill (dense per-key hourly grid)",
)


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-step ordered funnel (signup → view → click → purchase) in one
    shuffle: per-user sorted event array + greedy Catalyst state
    machine, vs the oracle's 4 chained min-joins."""
    from ..operators.funnel import funnel_histogram

    ev = load_table(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == s for s in ("signup", "view", "click", "purchase")
    ]
    return funnel_histogram(
        ev, "user_id", "ts", steps, tiebreak_col="event_id",
        max_gap_seconds=259200,  # 3-day conversion window between steps
    )


QUERIES["funnel_signup_purchase"] = Q(
    _q_funnel,
    """
WITH t1 AS (SELECT user_id, min(epoch(ts)) AS t FROM events
            WHERE event_type = 'signup' GROUP BY 1),
t2 AS (SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
       JOIN t1 ON e.user_id = t1.user_id
       WHERE e.event_type = 'view' AND epoch(e.ts) > t1.t
         AND epoch(e.ts) <= t1.t + 259200 GROUP BY 1),
t3 AS (SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
       JOIN t2 ON e.user_id = t2.user_id
       WHERE e.event_type = 'click' AND epoch(e.ts) > t2.t
         AND epoch(e.ts) <= t2.t + 259200 GROUP BY 1),
t4 AS (SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
       JOIN t3 ON e.user_id = t3.user_id
       WHERE e.event_type = 'purchase' AND epoch(e.ts) > t3.t
         AND epoch(e.ts) <= t3.t + 259200 GROUP BY 1)
SELECT steps_completed, count(*)::BIGINT AS n_keys
FROM (
  SELECT u.user_id,
         CASE WHEN t4.user_id IS NOT NULL THEN 4
              WHEN t3.user_id IS NOT NULL THEN 3
              WHEN t2.user_id IS NOT NULL THEN 2
              WHEN t1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS steps_completed
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL) u
  LEFT JOIN t1 ON u.user_id = t1.user_id
  LEFT JOIN t2 ON u.user_id = t2.user_id
  LEFT JOIN t3 ON u.user_id = t3.user_id
  LEFT JOIN t4 ON u.user_id = t4.user_id
)
GROUP BY 1
""",
    doc="ordered 4-step funnel in one shuffle (greedy array state machine vs chained min-joins)",
)


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle over the event stream."""
    from ..operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", bucket_seconds=604800)


QUERIES["retention_cohorts"] = Q(
    _q_retention,
    """
WITH act AS (
  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
  FROM events
), c AS (
  SELECT user_id, w, min(w) OVER (PARTITION BY user_id) AS cw FROM act
), g AS (
  SELECT cw, CAST(w - cw AS INTEGER) AS week_offset,
         count(DISTINCT user_id)::BIGINT AS n_active
  FROM c GROUP BY 1, 2
)
SELECT strftime(make_timestamp(cw * 604800 * 1000000), '%Y-%m-%d %H:%M:%S') AS cohort_start,
       week_offset, n_active,
       round(n_active::DOUBLE / max(CASE WHEN week_offset = 0 THEN n_active END)
             OVER (PARTITION BY cw), 6) AS retention_rate
FROM g
""",
    doc="weekly cohort retention triangle (first-activity cohorts, per-offset active share)",
)


def _q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality probe: estimated overlap between the
    purchase-making and error-generating user sets, from k=64 KMV
    sketches instead of a full join."""
    from ..operators.rollup import kmv_key_overlap

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "error")
    return kmv_key_overlap(a, "user_id", b, "user_id", k=64)


_KMV_HASH = "(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT / CAST({denom} AS DOUBLE))".format(
    denom=float(16**15)
)

QUERIES["sketch_key_overlap"] = Q(
    _q_kmv_overlap,
    f"""
WITH sa AS (
  SELECT DISTINCT {_KMV_HASH} AS h FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
  ORDER BY h LIMIT 64
), sb AS (
  SELECT DISTINCT {_KMV_HASH} AS h FROM events
  WHERE event_type = 'error' AND user_id IS NOT NULL
  ORDER BY h LIMIT 64
), merged AS (
  SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb) ORDER BY h LIMIT 64
), marked AS (
  SELECT m.h,
         (m.h IN (SELECT h FROM sa))::INTEGER AS in_a,
         (m.h IN (SELECT h FROM sb))::INTEGER AS in_b
  FROM merged m
), agg AS (
  SELECT count(*) AS n_kept, max(h) AS tau,
         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
  FROM marked
)
SELECT n_kept,
       round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE ELSE 63 / tau END, 3) AS union_est,
       round(n_both / n_kept, 6) AS jaccard_est,
       round((n_both / n_kept) *
             CASE WHEN n_kept < 64 THEN n_kept::DOUBLE ELSE 63 / tau END, 3)
         AS intersection_est
FROM agg
""",
    doc="KMV sketch set-overlap estimate (pre-join cardinality probe, deterministic hashing)",
)


def _q_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type association pairs per user (support / confidence /
    lift): distinct-first, per-key-bounded pair join, broadcast
    marginals."""
    from ..operators.funnel import association_pairs

    ev = load_table(spark, sf_dir, "events")
    return association_pairs(ev, "user_id", "event_type")


QUERIES["association_event_pairs"] = Q(
    _q_association,
    """
WITH base AS (
  SELECT DISTINCT user_id AS k, event_type AS i FROM events
  WHERE event_type IS NOT NULL
), nk AS (
  SELECT count(DISTINCT k)::DOUBLE AS n FROM base
), marg AS (
  SELECT i, count(*)::BIGINT AS ni FROM base GROUP BY 1
), pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n_keys_both
  FROM base a JOIN base b ON a.k = b.k AND a.i < b.i
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.n_keys_both,
       round(p.n_keys_both / nk.n, 6) AS support,
       round(p.n_keys_both::DOUBLE / ma.ni, 6) AS confidence_a_to_b,
       round((p.n_keys_both / nk.n) / ((ma.ni / nk.n) * (mb.ni / nk.n)), 6) AS lift
FROM pairs p
CROSS JOIN nk
JOIN marg ma ON p.item_a = ma.i
JOIN marg mb ON p.item_b = mb.i
""",
    doc="pairwise association mining over per-user event types (support/confidence/lift)",
)


def _q_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: staircase-exponential decayed counts
    (hourly buckets, 24 h half-life) — exact integer weight sums, so
    the score is engine/partitioning-independent by construction."""
    ev = load_table(spark, sf_dir, "events")
    return monitoring.decayed_counts(
        ev, "event_type", "ts", bucket_seconds=3600, halflife_buckets=24
    )


QUERIES["monitoring_decayed_counts"] = Q(
    _q_decayed,
    """
WITH b AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bk FROM events
), a AS (SELECT max(bk) AS latest FROM b),
w AS (
  SELECT event_type,
         CASE WHEN CAST(floor((latest - bk) / 24) AS INTEGER) <= 40
              THEN (1::BIGINT << (40 - CAST(floor((latest - bk) / 24) AS INTEGER)))
              ELSE 0 END AS wt
  FROM b, a
)
SELECT event_type, count(*)::BIGINT AS n_events,
       round(sum(wt) / 1099511627776.0, 6) AS decayed_score
FROM w GROUP BY 1
""",
    doc="staircase-exponential decayed counts (exact integer weights — portable EWMA analogue)",
)


def _q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval temporal join: per-user 2-hour error episodes
    overlapping 2-hour purchase episodes (bucketed cell equi-join +
    exact residual, never a per-key cartesian)."""
    from ..operators.timejoin import interval_overlap_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    two_h = F.expr("INTERVAL 2 HOURS")
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("e_start"),
            (F.col("ts") + two_h).alias("e_end"),
        )
    )
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_start"),
            (F.col("ts") + two_h).alias("p_end"),
        )
    )
    out = interval_overlap_join_bucketed(
        err, pur, ["user_id"], "e_start", "e_end", "p_start", "p_end", 7200
    )
    return out.select("user_id", "error_id", "purchase_id")


QUERIES["join_interval_overlap"] = Q(
    _q_interval_overlap,
    """
SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id
 AND epoch(e.ts) < epoch(p.ts) + 7200
 AND epoch(p.ts) < epoch(e.ts) + 7200
""",
    doc="interval x interval overlap join (bucketed cells + residual vs quadratic oracle)",
)


def _q_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for full-funnel users (same 4 steps / 3-day
    window as funnel_signup_purchase)."""
    from ..operators.funnel import funnel_conversion_stats

    ev = load_table(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == s for s in ("signup", "view", "click", "purchase")
    ]
    return funnel_conversion_stats(
        ev, "user_id", "ts", steps, tiebreak_col="event_id",
        max_gap_seconds=259200,
    )


QUERIES["funnel_conversion_time"] = Q(
    _q_funnel_time,
    """
WITH t1 AS (SELECT user_id, min(epoch(ts)) AS t FROM events
            WHERE event_type = 'signup' GROUP BY 1),
t2 AS (SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
       JOIN t1 ON e.user_id = t1.user_id
       WHERE e.event_type = 'view' AND epoch(e.ts) > t1.t
         AND epoch(e.ts) <= t1.t + 259200 GROUP BY 1),
t3 AS (SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
       JOIN t2 ON e.user_id = t2.user_id
       WHERE e.event_type = 'click' AND epoch(e.ts) > t2.t
         AND epoch(e.ts) <= t2.t + 259200 GROUP BY 1),
t4 AS (SELECT e.user_id, min(epoch(e.ts)) AS t FROM events e
       JOIN t3 ON e.user_id = t3.user_id
       WHERE e.event_type = 'purchase' AND epoch(e.ts) > t3.t
         AND epoch(e.ts) <= t3.t + 259200 GROUP BY 1),
durs AS (
  SELECT t4.t - t1.t AS dur FROM t4 JOIN t1 ON t4.user_id = t1.user_id
)
SELECT count(*)::BIGINT AS n_converted,
       round(quantile_cont(dur, 0.5), 3) AS p50_seconds,
       round(quantile_cont(dur, 0.95), 3) AS p95_seconds
FROM durs
""",
    doc="funnel time-to-convert distribution (exact percentiles over converted keys)",
)


# --- round-7 additions: sliding distinct, seasonal baselines, CDC
# deletes, heavy hitters, feature scaling ---

def _q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active users per 1 h window sliding every 15 min —
    exact rolling-reach. Spark assigns each event to its 4 overlapping
    windows map-side (native ``F.window`` with slide), then one
    distinct-agg shuffle; the 4× row blow-up is the slide ratio and is
    the exact-answer cost at any scale (the approximate path swaps the
    countDistinct for an HLL sketch on the same plan)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("distinct_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "distinct_users",
            "n_events",
        )
    )


QUERIES["window_sliding_distinct"] = Q(
    _q_sliding_distinct,
    """
WITH slid AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) - (k.k * INTERVAL '15 minutes') AS ws,
         user_id
  FROM events, (SELECT unnest(range(4)) AS k) k
  WHERE ts IS NOT NULL  -- F.window silently drops NULL-ts rows
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM slid GROUP BY ws
""",
    doc="exact distinct users per sliding 1h/15m window (rolling reach)",
)


def _q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline anomalies: events whose value is
    ≥ 2σ from the mean of their own (event_type, hour-of-day) cell."""
    ev = load_table(spark, sf_dir, "events")
    return monitoring.seasonal_baseline_anomalies(
        ev, "event_type", "ts", "value", n_sigma=2.0, id_cols=("event_id",)
    )


QUERIES["ts_seasonal_anomalies"] = Q(
    _q_seasonal,
    """
WITH ev AS (
  -- decimal(18,6) domain guard, mirrored from the operator
  SELECT * FROM events WHERE value IS NOT NULL AND abs(value) < 1e12
), base AS (
  SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(count(value) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(CAST(value AS DECIMAL(28,6)) * CAST(value AS DECIMAL(28,6))
                       AS DECIMAL(38,12))) AS DOUBLE) AS sxx
  FROM ev GROUP BY 1, 2
), scored AS (
  SELECT e.event_id, e.event_type, b.hod, e.value,
         b.sx / b.n AS mean,
         CASE WHEN b.n > 1 AND (b.n * b.sxx - b.sx * b.sx) / (b.n * (b.n - 1.0)) > 0
              THEN sqrt((b.n * b.sxx - b.sx * b.sx) / (b.n * (b.n - 1.0))) END AS std
  FROM ev e JOIN base b ON e.event_type = b.g AND hour(e.ts) = b.hod
)
SELECT event_id, event_type, hod AS hour_of_day,
       round(value, 6) AS value,
       round(mean, 6) AS baseline_mean,
       round(std, 6) AS baseline_std,
       round((value - mean) / std, 6) + 0.0 AS zscore
FROM scored
WHERE std > 0 AND abs((value - mean) / std) >= 2.0
""",
    doc="hour-of-day seasonal baseline z-score anomalies (broadcast baseline, no row shuffle)",
)


def _q_apply_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE semantics: the event changelog with 'error' events as
    DELETE tombstones, materialized to the current per-user row (last
    writer wins; a user whose latest event is a tombstone vanishes,
    an error overwritten by later activity resurrects)."""
    from ..operators.cdc import apply_changelog

    ev = load_table(spark, sf_dir, "events").withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")),
    )
    return apply_changelog(
        ev, "user_id", "ts", "op", tiebreak_cols=("event_id",)
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


QUERIES["cdc_apply_deletes"] = Q(
    _q_apply_deletes,
    """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts IS NOT NULL)
WHERE rn = 1 AND event_type <> 'error'
""",
    doc="changelog + tombstones -> current table (upsert/delete MERGE as one window plan)",
)


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the event stream's user key: every user
    carrying ≥ 0.8% of all events, with count and share."""
    from ..operators.profile import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", 0.008)


QUERIES["profile_heavy_hitters"] = Q(
    _q_heavy_hitters,
    """
WITH c AS (
  SELECT coalesce(CAST(user_id AS VARCHAR), '<NULL>') AS value,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
), t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS total FROM c)
SELECT value, n_rows, round(n_rows / total, 6) AS share
FROM c, t WHERE n_rows / total >= 0.008
""",
    doc="exact heavy hitters (>= min share) via one combined-count shuffle",
)


def _q_scale_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type feature scaling of `value`: z-score (sample std)
    and min-max, via broadcast group stats — rows never shuffle."""
    from ..operators.profile import scale_features

    ev = load_table(spark, sf_dir, "events")
    return scale_features(ev, "event_type", "value", "event_id")


QUERIES["feature_scale_events"] = Q(
    _q_scale_features,
    """
WITH s AS (
  -- stats grouped over the FULL table (the operator's inner join must
  -- keep groups whose rows are all out-of-domain — they pass through
  -- with NULL scaled columns); the decimal(18,6) domain guard applies
  -- per-aggregate, mirroring the operator's F.when(ok, ...) terms
  SELECT event_type,
         CAST(sum(CASE WHEN value IS NOT NULL AND abs(value) < 1e12
                       THEN 1 END) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value IS NOT NULL AND abs(value) < 1e12
                       THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sx,
         CAST(sum(CASE WHEN value IS NOT NULL AND abs(value) < 1e12
                       THEN CAST(CAST(value AS DECIMAL(28,6)) * CAST(value AS DECIMAL(28,6))
                                 AS DECIMAL(38,12)) END) AS DOUBLE) AS sxx,
         min(CASE WHEN value IS NOT NULL AND abs(value) < 1e12
                  THEN value END) AS mn,
         max(CASE WHEN value IS NOT NULL AND abs(value) < 1e12
                  THEN value END) AS mx
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round(e.value, 6) AS value,
       -- degenerate-group guards mirror the operator (NULL zscore on
       -- n<=1 or zero/negative variance; NULL minmax on constant
       -- groups) — DuckDB sqrt() of a negative HARD-ERRORS, it does
       -- not return NaN
       CASE WHEN e.value IS NOT NULL AND abs(e.value) < 1e12
             AND s.n > 1 AND s.n * s.sxx - s.sx * s.sx > 0
            THEN round((e.value - s.sx / s.n)
                 / sqrt((s.n * s.sxx - s.sx * s.sx) / (s.n * (s.n - 1.0))), 6) + 0.0
       END AS zscore,
       CASE WHEN e.value IS NOT NULL AND abs(e.value) < 1e12 AND s.mx > s.mn
            THEN round((e.value - s.mn) / (s.mx - s.mn), 6) + 0.0
       END AS minmax
FROM events e JOIN s USING (event_type)
""",
    doc="per-group z-score + min-max scaling via broadcast decimal-exact stats",
)




def _q_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-fatigue fix: per-user error events merged into incidents
    (1 h quiet gap closes an incident) — gaps-and-islands over flags."""
    ev = load_table(spark, sf_dir, "events")
    return monitoring.merge_incidents(
        ev, "user_id", "ts", F.col("event_type") == "error", gap_seconds=3600
    )


QUERIES["monitoring_error_incidents"] = Q(
    _q_incidents,
    """
WITH f AS (
  SELECT user_id, ts FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL
), o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM f
), m AS (
  SELECT user_id, ts,
         CASE WHEN pts IS NULL
                OR floor(epoch(ts)) - floor(epoch(pts)) >= 3600
              THEN 1 ELSE 0 END AS new_i
  FROM o
), s AS (
  SELECT user_id, ts,
         sum(new_i) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS incident_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS incident_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_seconds
FROM s GROUP BY user_id, sid
""",
    doc="flagged events merged into incidents (gaps-and-islands, 1h quiet gap)",
)


def _q_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for each purchase, the user's next error event at
    or after it — the 'did this action precede a failure' lookup
    (merge_asof direction='forward')."""
    from ..operators.timejoin import as_of_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("next_error_id"))
        .select("user_id", F.col("ts").alias("err_ts"), "next_error_id")
    )
    out = as_of_join(
        purchases, errors, ["user_id"], "ts", "err_ts",
        ["next_error_id", "err_ts"], direction="forward",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "next_error_id",
        F.date_format("err_ts", "yyyy-MM-dd HH:mm:ss").alias("next_error_at"),
    )


QUERIES["join_asof_next_error"] = Q(
    _q_asof_next_error,
    """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
), er AS (
  SELECT user_id, ts, min(event_id) AS err_id FROM events
  WHERE event_type = 'error' AND user_id IS NOT NULL GROUP BY 1, 2
), j AS (
  SELECT p.purchase_id, p.user_id, er.ts AS ets, er.err_id,
         row_number() OVER (PARTITION BY p.purchase_id ORDER BY er.ts) AS rn
  FROM p LEFT JOIN er ON p.user_id = er.user_id AND er.ts >= p.ts
)
SELECT purchase_id, user_id, err_id AS next_error_id,
       strftime(ets, '%Y-%m-%d %H:%M:%S') AS next_error_at
FROM j WHERE rn = 1
""",
    doc="forward as-of join: next error at/after each purchase per user",
)


_ORDER = [
    "monitoring_error_incidents",
    "join_asof_next_error",
    "window_sliding_distinct",
    "ts_seasonal_anomalies",
    "cdc_apply_deletes",
    "profile_heavy_hitters",
    "feature_scale_events",
    "funnel_conversion_time",
    "join_interval_overlap",
    "monitoring_decayed_counts",
    "association_event_pairs",
    "sketch_key_overlap",
    "retention_cohorts",
    "funnel_signup_purchase",
    "ts_gapfill_forward",
    "cdc_scd2_intervals",
    "cdc_latest_state",
    "monitoring_zscore_spikes",
    "monitoring_mad_outliers",
    "interarrival_gaps",
    "join_range_error_after_purchase",
    "hypertable_rollup_events",
    "join_asof_last_purchase",
    "sketch_kmv_distinct",
    "a5_partition_lag",
    "alert_sustained_breach",
    "session_window_counts",
    "a1_error_rate_5m",
    "a1_error_rate_sliding",
    "a3_p95_processing_time",
    "a4_p95_docling_by_path",
    "a2_backlog_running",
    "a6_dlq_count_by_date",
]
assert set(_ORDER) == set(QUERIES), sorted(set(_ORDER) ^ set(QUERIES))
QUERIES = {k: QUERIES[k] for k in _ORDER}
