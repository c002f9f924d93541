"""Hypertable-style continuous rollups and a portable distinct sketch.

- **hypertable_rollup** — TimescaleDB-style multi-resolution continuous
  aggregates: raw events → 1-minute partials → coarser levels, where
  every coarser level re-aggregates the NEXT FINER level's partials
  (sum-of-sums, min-of-mins, …), never the raw data. At 100 TB that's
  the only sane shape: the raw scan happens once, and each additional
  resolution costs O(finer-level rows). Emits one unioned frame tagged
  by ``resolution`` so dashboards pick their grain with a filter
  (partition-prunable when persisted partitioned by resolution).

- **kmv_distinct** — K-Minimum-Values distinct-count sketch with
  *deterministic, engine-portable* hashing (md5 hex → uniform [0,1)
  via the first 15 hex digits). Unlike HLL (engine-specific
  registers), the same data yields the same estimate in any engine —
  which is why the DuckDB oracle can hash-match it exactly. Mergeable:
  union the k-min sets and re-take the k minima.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.derivations import epoch_seconds

#: seconds per supported resolution label
RESOLUTIONS = {"1m": 60, "1h": 3600, "1d": 86400}


def hypertable_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    resolutions: list[str] = ["1m", "1h", "1d"],
) -> DataFrame:
    """Hierarchical rollup of (count, sum, min, max) over the given
    resolutions (finest first). Avg is derivable (sum/count) — only
    mergeable partials are stored, the continuous-aggregate invariant.
    """
    secs = [RESOLUTIONS[r] for r in resolutions]
    assert all(b % a == 0 for a, b in zip(secs, secs[1:])), "each level must nest"

    def bucket(col: Column, s: int) -> Column:
        # epoch_seconds is NTZ-safe on the raw time column and a no-op
        # round-trip on the coarser levels' bigint bucket_start
        return (F.floor(epoch_seconds(col) / s) * s).cast("long")

    finest = (
        df.groupBy(bucket(F.col(time_col), secs[0]).alias("bucket_start"))
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .withColumn("resolution", F.lit(resolutions[0]))
    )
    levels = [finest]
    for label, s in zip(resolutions[1:], secs[1:]):
        finer = levels[-1]
        coarser = (
            finer.groupBy(bucket(F.col("bucket_start"), s).alias("bucket_start"))
            .agg(
                F.sum("n").alias("n"),          # partials merge: sum of counts
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
            .withColumn("resolution", F.lit(label))
        )
        levels.append(coarser)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("resolution", "bucket_start", "n", "sum_v", "min_v", "max_v")


def _uniform_hash(col: Column) -> Column:
    """md5 hex → uniform double in [0,1): first 15 hex digits / 16^15.
    15 digits keep the value inside an exact double (60 bits)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "double"
    ) / F.lit(float(16**15))


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate: (k-1) / kth-smallest-hash.

    One row out: (n_exact_kept, kth_hash, estimate). Deterministic and
    portable (see module docstring); if fewer than k distinct values
    exist the estimate IS the exact count. Shuffle: one distinct on the
    hash + a k-row top-k — the k minima also form the mergeable sketch
    state (union + re-min to merge shards).
    """
    # NULLs are excluded (distinct-count convention) — and a NULL hash
    # would otherwise sort first and displace a real top-k entry
    hashed = (
        df.filter(F.col(col).isNotNull())
        .select(_uniform_hash(F.col(col)).alias("h"))
        .distinct()
    )
    topk = hashed.orderBy("h").limit(k)
    return topk.agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        "n_kept",
        F.round("kth_hash", 9).alias("kth_hash"),
        F.round(
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                (F.lit(k) - 1) / F.col("kth_hash")
            ),
            3,
        ).alias("estimate"),
    )


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    step_seconds: int,
    fmt: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Regularize an irregular per-key time series onto a fixed grid:
    bucket to ``step_seconds``, aggregate the per-bucket mean, emit a
    DENSE row for every grid cell between each key's first and last
    observation, and forward-fill empty cells with the last observed
    mean (the resample → ffill pass every time-series consumer runs
    before modeling; Spark has no built-in for the gap-FILL half).

    Determinism: the bucket mean sums DECIMAL-quantized values (exact,
    order-independent — the queries.base money rule) before one double
    division, so the filled value can't drift across engines or
    partitionings. Output: (key, bucket_start, value, filled).

    Scale shape: one shuffle to the (key, bucket) roll-up; the dense
    grid is built per key from a broadcastable span frame (one row per
    key) via ``sequence``+``explode`` — grid size is span/step per key,
    never corpus-wide — and the forward fill is a keyed window over
    the already-bucketed grid. A key with a multi-year span at a
    1-second step would explode 10^8 cells: bound ``step_seconds``
    to the span you actually chart.
    """
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    from pyspark.sql.window import Window

    bucket = (F.floor(epoch_seconds(F.col(time_col)) / step_seconds)).cast("long")
    per_bucket = (
        df.select(F.col(key_col).alias("_k"), bucket.alias("_b"),
                  F.col(value_col).cast("decimal(18,6)").alias("_v"))
        .groupBy("_k", "_b")
        .agg(
            F.round(
                F.sum("_v").cast("double") / F.count(F.lit(1)), 6
            ).alias("_mean")
        )
    )
    span = per_bucket.groupBy("_k").agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = span.select(
        "_k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_b")
    )
    joined = grid.join(per_bucket, ["_k", "_b"], "left")
    w = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last(F.col("_mean"), ignorenulls=True).over(w)
    return joined.select(
        F.col("_k").alias(key_col),
        F.date_format(
            F.timestamp_seconds(F.col("_b") * step_seconds), fmt
        ).alias("bucket_start"),
        filled.alias("value"),
        F.col("_mean").isNull().cast("int").alias("filled"),
    )


def kmv_key_overlap(
    df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str, k: int = 256
) -> DataFrame:
    """KMV set-overlap estimate between two key columns — the pre-join
    cardinality probe ("how many customers in A also appear in B?")
    run on sketches instead of a shuffle join of the full sides.

    Standard KMV algebra (Beyer et al.): merge = the k smallest hashes
    of the union of both k-min sketches; |A∪B| ≈ (k-1)/τ with τ the
    merge's kth hash (exact when fewer than k survive); Jaccard ≈ the
    fraction of merge members present in BOTH sketches; |A∩B| =
    Jaccard × |A∪B|. Deterministic md5 hashing (module docstring), so
    the DuckDB oracle hash-matches exactly.

    Scale: each side reduces map-side to its distinct hashes, then to k
    rows; everything after operates on ≤2k-row frames (broadcast-sized
    by construction). One row out: (n_kept, union_est, jaccard_est,
    intersection_est).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def sketch(df: DataFrame, col: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .select(_uniform_hash(F.col(col)).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    sa = sketch(df_a, col_a).withColumn("_a", F.lit(1))
    sb = sketch(df_b, col_b).withColumn("_b", F.lit(1))
    merged = (
        sa.select("h").union(sb.select("h")).distinct().orderBy("h").limit(k)
    )
    marked = (
        merged.join(sa, "h", "left").join(sb, "h", "left")
    )
    agg = marked.agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("_tau"),
        F.sum(
            (F.col("_a").isNotNull() & F.col("_b").isNotNull()).cast("int")
        ).alias("_both"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((F.lit(k) - 1) / F.col("_tau"))
    jaccard = F.col("_both") / F.col("n_kept")
    return agg.select(
        "n_kept",
        F.round(union_est, 3).alias("union_est"),
        F.round(jaccard, 6).alias("jaccard_est"),
        F.round(jaccard * union_est, 3).alias("intersection_est"),
    )


def kmv_distinct_per_group(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimates — "distinct users per day /
    per type" with bounded per-group state instead of an exact
    ``count_distinct`` whose per-group hash sets grow with
    cardinality. Same estimator as :func:`kmv_distinct`, grouped.

    Shape: distinct (group, hash) on a uniform composite key, then a
    per-group rank window keeps only each group's k smallest hashes
    (state O(k) per group from there on — the k-min rows ARE the
    mergeable sketch for cross-shard/day roll-ups), then a tiny
    per-group agg. Exact below k, (k-1)/τ above.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    d = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group_col).alias("_g"), _uniform_hash(F.col(col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("_g").orderBy("h")
    topk = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = topk.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("_tau"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (F.lit(k) - 1) / F.col("_tau")
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n_kept",
        F.round("_tau", 9).alias("kth_hash"),
        F.round(est, 3).alias("estimate"),
    )
