"""Monitoring aggregations (A1-A6) against hand-computed goldens."""

from __future__ import annotations

import datetime

from fbg_kafka_stream_file_transfer_spark.operators import monitoring

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark):
    rows = []
    for m in range(10):  # minute m: FAILED iff m < 3
        rows.append((T0 + datetime.timedelta(minutes=m),
                     "FAILED" if m < 3 else "COMPLETED", float(m)))
    return spark.createDataFrame(
        rows, "event_time timestamp, status string, processing_seconds double"
    )


def test_error_rate_tumbling(spark):
    out = {r.window_start.minute: r for r in
           monitoring.error_rate(_events(spark), window="5 minutes").collect()}
    assert out[0].failed == 3 and out[0].total == 5 and abs(out[0].error_rate - 0.6) < 1e-9
    assert out[5].failed == 0 and out[5].total == 5


def test_p95_exact_vs_sketch(spark):
    ev = _events(spark)
    exact = monitoring.p95_processing_time(ev, window="1 day", exact=True).collect()[0]
    approx = monitoring.p95_processing_time(ev, window="1 day", exact=False).collect()[0]
    assert abs(exact.p95_seconds - 8.55) < 1e-9  # quantile_cont over 0..9
    assert abs(approx.p95_seconds - exact.p95_seconds) <= 1.0  # sketch tolerance


def test_backlog_running_count(spark):
    out = monitoring.backlog_running_count(
        _events(spark), arrival_status="FAILED", drain_status="COMPLETED", bucket="1 day"
    ).collect()
    assert len(out) == 1 and out[0].backlog == 3 - 7


def test_sustained_breach_debounce(spark):
    rate = monitoring.error_rate(_events(spark), window="1 minute")
    out = monitoring.sustained_breach(rate, "error_rate", 0.5, consecutive=3)
    rows = sorted(out.collect(), key=lambda r: r.window_start)
    # minutes 0-2 breach; debounce of 3 fires only at minute 2
    assert [r.alert for r in rows[:4]] == [False, False, True, False]


def test_dlq_count_by_file(spark):
    df = spark.createDataFrame(
        [("a.pdf",), ("a.pdf",), ("b.txt",)], "file_name string"
    )
    got = {r.file_name: r.dlq_messages_total
           for r in monitoring.dlq_count_by_file(df).collect()}
    assert got == {"a.pdf": 2, "b.txt": 1}


def test_kmv_estimate_accuracy(spark):
    """KMV with k=256 lands within ~15% of the true distinct count
    (standard error ≈ 1/sqrt(k) ≈ 6%)."""
    from fbg_kafka_stream_file_transfer_spark.operators.rollup import kmv_distinct

    df = spark.range(0, 20000).selectExpr("CAST(id AS STRING) AS v")
    est = kmv_distinct(df, "v", k=256).first().estimate
    assert abs(est - 20000) / 20000 < 0.15

    small = spark.range(0, 100).selectExpr("CAST(id AS STRING) AS v")
    assert kmv_distinct(small, "v", k=256).first().estimate == 100.0  # exact under k


class TestRollingZscoreSpikes:
    def _series(self, spark, counts):
        rows = [
            ("q", "2024-01-01 00:%02d:00" % i, c) for i, c in enumerate(counts)
        ]
        return spark.createDataFrame(rows, ["grp", "bucket", "n"])

    def test_engineered_spike_flagged(self, spark):
        from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
            rolling_zscore_spikes,
        )

        # stable baseline of ~10 with jitter, then a 100-count burst
        counts = [10, 11, 9, 10, 12, 9, 10, 11, 10, 9, 100]
        out = rolling_zscore_spikes(
            self._series(spark, counts), "grp", "bucket", "n"
        ).orderBy("bucket").collect()
        assert out[-1]["spike"] == 1 and out[-1]["zscore"] > 3
        # baseline rows with enough history are not spikes
        assert all(r["spike"] == 0 for r in out[:-1])
        # warm-up rows (insufficient history) emit NULL z, not 0
        assert out[0]["zscore"] is None and out[3]["zscore"] is None

    def test_zero_variance_emits_null(self, spark):
        from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
            rolling_zscore_spikes,
        )

        out = rolling_zscore_spikes(
            self._series(spark, [5] * 8 + [50]), "grp", "bucket", "n"
        ).orderBy("bucket").collect()
        # baseline is constant -> var 0 -> z unknowable even for the burst
        assert out[-1]["zscore"] is None and out[-1]["spike"] == 0

    def test_validation(self, spark):
        from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
            rolling_zscore_spikes,
        )

        d = self._series(spark, [1, 2, 3])
        import pytest
        with pytest.raises(ValueError):
            rolling_zscore_spikes(d, "grp", "bucket", "n", min_history=1)
        with pytest.raises(ValueError):
            rolling_zscore_spikes(d, "grp", "bucket", "n", lookback=3, min_history=5)


def test_mad_outliers_robust_to_extreme_value(spark):
    """A single extreme value is flagged and does NOT mask other
    anomalies (the failure mode of mean/std scoring); constant groups
    (MAD=0) emit NULL score and are never flagged."""
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        mad_outliers,
    )

    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 1e9, 50])]
    rows += [(100 + i, "const", 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_id: r for r in mad_outliers(df, "value", ["event_type"]).collect()}
    assert out[7].is_outlier == 1          # the 1e9 spike
    assert out[8].is_outlier == 1      # 50 is ~26 MADs out despite the 1e9 row
    assert out[0].is_outlier == 0
    # mean/std would have been dragged by 1e9; MAD baseline stays ~10
    assert abs(out[0].group_median - 11.0) < 0.5
    for i in (100, 101, 102, 103):
        assert out[i].robust_z is None and out[i].is_outlier == 0


def test_mad_outliers_approx_mode_runs(spark):
    """approx=True (the 100 TB path) produces the same flags on a
    well-separated corpus."""
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        mad_outliers,
    )

    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 500])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    exact = {r.event_id: r.is_outlier for r in mad_outliers(df, "value", ["event_type"]).collect()}
    approx = {r.event_id: r.is_outlier for r in mad_outliers(df, "value", ["event_type"], approx=True).collect()}
    assert exact == approx and exact[7] == 1


def test_resample_forward_fill_dense_grid_and_flags(spark):
    """Gaps between a key's first/last bucket are emitted with the last
    observed mean and filled=1; observed buckets keep their own mean."""
    import datetime as dt

    import pytest

    from fbg_kafka_stream_file_transfer_spark.operators.rollup import (
        resample_forward_fill,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0, 10.0),
        ("u1", t0 + dt.timedelta(seconds=30), 20.0),   # same bucket → mean 15
        ("u1", t0 + dt.timedelta(minutes=3), 40.0),     # bucket 3; 1-2 are gaps
        ("u2", t0, 7.0),                                # single bucket, no grid
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = resample_forward_fill(df, "user_id", "ts", "value", 60)
    got = {
        (r.user_id, r.bucket_start[-5:]): (r.value, r.filled) for r in out.collect()
    }
    assert got == {
        ("u1", "00:00"): (15.0, 0),
        ("u1", "01:00"): (15.0, 1),
        ("u1", "02:00"): (15.0, 1),
        ("u1", "03:00"): (40.0, 0),
        ("u2", "00:00"): (7.0, 0),
    }
    with pytest.raises(ValueError):
        resample_forward_fill(df, "user_id", "ts", "value", 0)


def test_kmv_key_overlap_exact_and_estimated(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.rollup import (
        kmv_key_overlap,
    )

    a = spark.createDataFrame([(i,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i,) for i in range(50, 150)], "k long")

    # k larger than the union: everything is exact
    exact = kmv_key_overlap(a, "k", b, "k", k=256).collect()[0]
    assert exact.n_kept == 150
    assert exact.union_est == 150.0
    assert exact.intersection_est == 50.0

    # k=64 sketch: estimates within a loose KMV error bound (~1/sqrt(k))
    est = kmv_key_overlap(a, "k", b, "k", k=64).collect()[0]
    assert est.n_kept == 64
    assert abs(est.union_est - 150) / 150 < 0.5
    assert abs(est.intersection_est - 50) / 50 < 0.6

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_key_overlap(a, "k", b, "k", k=1)


def test_kmv_distinct_per_group_exact_below_k_and_bounded_above(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.rollup import (
        kmv_distinct_per_group,
    )

    rows = [("small", i) for i in range(10)] + [("big", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in kmv_distinct_per_group(df, "g", "v", k=64).collect()}
    assert out["small"].estimate == 10.0            # exact below k
    assert abs(out["big"].estimate - 2000) / 2000 < 0.5  # ~1/sqrt(k) error

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_distinct_per_group(df, "g", "v", k=1)


def test_decayed_counts_staircase_weights(spark):
    """Weights halve per half-life STEP; events past max_halflives
    weigh 0; equal-recency keys tie exactly (integer arithmetic)."""
    import datetime as dt

    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        decayed_counts,
    )

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        ("fresh", t0 + 48 * h),            # age 0 → weight 1
        ("old", t0 + 24 * h),              # age 24 buckets = 1 half-life → 0.5
        ("old", t0 + 24 * h),              # second event, same weight
        ("ancient", t0 - 10000 * h),       # > 40 half-lives → 0
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r.k: (r.n_events, r.decayed_score) for r in decayed_counts(
        df, "k", "ts", bucket_seconds=3600, halflife_buckets=24
    ).collect()}
    assert got["fresh"] == (1, 1.0)
    assert got["old"] == (2, 1.0)          # 0.5 + 0.5 exactly
    assert got["ancient"] == (1, 0.0)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decayed_counts(df, "k", "ts", bucket_seconds=0)
    with _pytest.raises(ValueError):
        decayed_counts(df, "k", "ts", max_halflives=63)
