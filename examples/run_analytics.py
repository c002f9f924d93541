#!/usr/bin/env python3
"""End-to-end example: the product-analytics stack over an event log.

The round-6 continuation operators composed the way an analytics team
would actually chain them over the transfer/event stream:

1. data-quality gate        — declarative expectation suite; the run
                              aborts (here: warns) if a rule fails
2. changelog compaction     — SCD2 validity intervals + current state
3. funnel                   — signup → view → click → purchase inside
                              a 3-day conversion window, one shuffle
4. cohort retention         — weekly first-activity cohorts
5. resample + forward fill  — dense hourly per-user series for charts

    python examples/run_analytics.py [sf_dir]

Default sf_dir=/root/testdata/sf0.001. Every step is a plain DataFrame
transform; nothing here collects more than a report-sized frame.
"""

from __future__ import annotations

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.operators import expectations as X  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.operators.cdc import (  # noqa: E402
    changelog_to_scd2,
    latest_state,
)
from fbg_kafka_stream_file_transfer_spark.operators.funnel import (  # noqa: E402
    cohort_retention,
    funnel_histogram,
)
from fbg_kafka_stream_file_transfer_spark.operators.rollup import (  # noqa: E402
    resample_forward_fill,
)
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("analytics-example")
    ev = load_table(spark, sf_dir, "events")

    print("== 1. data-quality gate ==")
    suite = X.expectation_suite(
        X.check_rows(
            ev,
            {
                "ts_not_null": F.col("ts").isNotNull(),
                "type_in_set": F.col("event_type").isin(
                    "signup", "view", "click", "purchase", "error"
                ),
            },
        ),
        X.check_unique(ev, ["event_id"]),
    )
    suite.show(truncate=False)
    failed = [r.rule for r in suite.collect() if not r.pass_flag]
    if failed:
        print(f"WARNING: expectations failed: {failed} — a production run would stop here")

    print("== 2. changelog compaction (per-user state history + current) ==")
    changelog_to_scd2(ev, "user_id", "ts", "event_type", ("event_id",)).orderBy(
        "user_id", "valid_from"
    ).show(8, truncate=False)
    latest_state(ev, "user_id", "ts", ("event_id",)).select(
        "user_id", "event_type", "ts"
    ).orderBy("user_id").show(4, truncate=False)

    print("== 3. funnel (3-day conversion window) ==")
    steps = [F.col("event_type") == s for s in ("signup", "view", "click", "purchase")]
    funnel_histogram(
        ev, "user_id", "ts", steps, tiebreak_col="event_id", max_gap_seconds=259200
    ).orderBy("steps_completed").show(truncate=False)

    print("== 4. weekly cohort retention ==")
    cohort_retention(ev, "user_id", "ts").orderBy(
        "cohort_start", "week_offset"
    ).show(10, truncate=False)

    print("== 5. hourly resample + forward fill (one user shown) ==")
    grid = resample_forward_fill(ev, "user_id", "ts", "value", 3600)
    first_user = grid.select(F.min("user_id")).first()[0]
    grid.filter(F.col("user_id") == first_user).orderBy("bucket_start").show(
        8, truncate=False
    )

    print("== 6. association mining (event-type pairs) ==")
    from fbg_kafka_stream_file_transfer_spark.operators.funnel import (
        association_pairs,
    )

    association_pairs(ev, "user_id", "event_type").orderBy(
        F.col("lift").desc()
    ).show(5, truncate=False)

    print("== 7. PSI drift: first vs second half of the stream ==")
    from fbg_kafka_stream_file_transfer_spark.functions.derivations import (
        epoch_seconds,
    )
    from fbg_kafka_stream_file_transfer_spark.operators.profile import psi_drift

    mid = ev.agg(
        F.floor(
            (F.min(epoch_seconds(F.col("ts"))) + F.max(epoch_seconds(F.col("ts")))) / 2
        ).alias("m")
    ).first()[0]
    sec = epoch_seconds(F.col("ts"))
    psi = psi_drift(ev.filter(sec < mid), ev.filter(sec >= mid), "value", 10)
    psi.orderBy("bucket").show(truncate=False)
    total = psi.agg(F.round(F.sum("psi_term"), 4).alias("psi")).first()[0]
    print(f"total PSI = {total}  (<0.1 stable, >0.25 shifted)")

    print("== 8. hot keys (exact heavy hitters >= 1% of events) ==")
    from fbg_kafka_stream_file_transfer_spark.operators.profile import (
        heavy_hitters,
        scale_features,
    )

    heavy_hitters(ev, "user_id", 0.01).orderBy(F.col("share").desc()).show(
        5, truncate=False
    )

    print("== 9. seasonal anomalies (value vs its own hour-of-day baseline) ==")
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        seasonal_baseline_anomalies,
    )

    seasonal_baseline_anomalies(
        ev, "event_type", "ts", "value", n_sigma=3.0, id_cols=("event_id",)
    ).orderBy(F.abs(F.col("zscore")).desc()).show(5, truncate=False)

    print("== 10. CDC merge with tombstones ('error' = delete) ==")
    from fbg_kafka_stream_file_transfer_spark.operators.cdc import apply_changelog

    tagged = ev.withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
    )
    current = apply_changelog(tagged, "user_id", "ts", "op", ("event_id",))
    print(f"users surviving the merge: {current.count()}")

    print("== 11. per-type feature scaling (broadcast stats, no row shuffle) ==")
    scale_features(ev, "event_type", "value", "event_id").show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
