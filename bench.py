#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a ``noop``-format write (full computation, no
driver-side collect bottleneck) and timed wall-clock. ``value`` is the
total across headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.queries import REGISTRY  # noqa: E402

#: headline set — one per operator family (SURVEY.md §2 / §2.h)
HEADLINE = [
    "env_projection",            # envelope ingest + derivations (P1-P17)
    "env_validation_counts",     # validation/routing split (F2/F4)
    "pipe_route_all_legs",       # FULL route: validate→extract→retry/DLQ (100k envelopes)
    "tpch_q1_pricing_summary",   # wide agg scan
    "tpch_q3_shipping_priority", # 3-way join + top-k
    "tpch_q5_local_supplier_volume",  # 6-way join
    "a1_error_rate_sliding",     # sliding-window monitoring agg
    "a3_p95_processing_time",    # percentile sketch
    "pipe_replay_join",          # incoming ⋈ failed replay join (E6)
    "dedup_exact",               # checksum dedup
    "dedup_minhash_verified",    # MinHash-LSH near-dup
    "text_quality_scores",       # text analysis
    "sim_topk_bruteforce_arrow", # embedding similarity top-k (scale path:
    #   partition-local Arrow/BLAS top-k, shuffle independent of corpus size;
    #   the Catalyst twin `sim_topk_bruteforce` stays in the registry as the
    #   oracle/semantic baseline but shuffles all |Q|×N scored pairs)
    "sim_ann_lsh_topk",          # ANN (LSH-bucketed)
]


def _contention_control(spark) -> dict:
    """Fixed-work reference timing + loadavg, recorded next to the run.

    The same JVM-side job (sum over a 50M range — no IO, no shuffle of
    data, stable across code changes) is timed best-of-3 exactly like
    the headline queries. Round-over-round, its wall-clock moves ONLY
    with host contention, never with repo code — so a uniform headline
    inflation (like r02's ×1.37) is machine-attributable when the
    control inflates by the same factor, and a real regression when the
    control holds steady."""
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id * 2 + 1)").collect()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return {
        "control_range_sum_sec": round(best, 3),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    except ValueError:  # non-sfN dir name: report unknown, still benchmark
        sf = -1.0
    spark = get_spark("bench")

    # warm the session (JVM/codegen/python-worker startup) so the first
    # timed query measures the query, not the cold start; the mapInPandas
    # no-op forks the Arrow python workers on every core — without it the
    # first pandas-UDF headline pays the whole fork+Arrow-init cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32 * 1000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    REGISTRY["env_validation_counts"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    control = _contention_control(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        best = None
        # steady-state: best of three — the second run is codegen/JIT
        # warm, the third rides out the bursty host contention this
        # box shows (uniform 3-5× inflation for seconds at a time)
        for _ in range(3):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **control,
                "loadavg_1m_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
