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
    "dedup_semantic_lsh",        # SemDeDup-shaped semantic dedup (multi-table
    #   hyperplane-LSH blocking derived from the embedding itself)
    "corpus_curation_top_per_lang",  # curation flagship: dedup → per-lang
    #   top-k by quality → token budget
    "pack_sequences_stats",      # sequence packing into 512-token training
    #   rows (r6): hash-shard window layout + cell explode roll-up
    "text_boilerplate_removal",  # corpus-rewriting boilerplate pass (r6):
    #   window explode -> frequency -> broadcast mark -> per-doc reassembly;
    #   the heaviest of the session's curation additions, so it gets
    #   round-over-round tracking like the rest of the headline set
    "cdc_scd2_intervals",        # changelog -> SCD2 compaction (r6 cont.):
    #   three window ops over ONE exchange on the key
    "layout_compaction_bins",    # distributed global prefix sum (r6 cont.):
    #   the two-phase running-sum shape that replaces single-partition windows
    "tpch_q9_product_type_profit",  # TPC-H completion (r7): 5-way join +
    #   per-line profit expression + nation×year rollup
    "window_sliding_distinct",   # sliding 1h/15m exact distinct (r7): the
    #   4× slide-ratio row blow-up is the scale cost being tracked
    "sim_group_diversity",       # within-label mean pairwise cosine (r7):
    #   |Σu|² identity — O(n·d) partial-agg shuffle instead of O(n²) join
    "merge_upsert_partitioned",  # partition-pruned batch MERGE (r8): build
    #   table + upsert/delete/insert delta + manifest — delta-sized work
    "export_csv_roundtrip",      # RFC 4180 sharded export + quarantining
    #   re-read (r8): the interchange path, adversarial quoting included
]


def _control_once(spark) -> float:
    """One fixed-work reference job (sum over a 50M range — no IO, no
    data shuffle, stable across code changes, ~0.15 s idle). Its
    wall-clock moves ONLY with host contention, never with repo code."""
    t0 = time.perf_counter()
    spark.range(50_000_000).selectExpr("sum(id * 2 + 1)").collect()
    return time.perf_counter() - t0


#: best-of-3 spread (max/min) beyond which the sample window counts as
#: contended and the whole triple is re-run
SPREAD_LIMIT = 3.0


def _time_query(spark, q, sf_dir: str, max_rounds: int = 3) -> dict:
    """Best-of-3 wall-clock with a self-labeling contention guard.

    r04 shipped a ×2.75 phantom regression because the (then single,
    up-front) control ran clean while contention arrived mid-loop. Now
    every sample window labels itself: the fixed-work control runs
    immediately before each best-of-3 triple, and a triple whose spread
    exceeds SPREAD_LIMIT (steady boxes show ≤1.5×; only external CPU
    competition produces more) is truly discarded — its samples do not
    contribute to ``sec`` — and re-run, up to ``max_rounds`` triples.
    If EVERY triple is contended, ``sec`` falls back to the min across
    all samples and the recorded spread (> SPREAD_LIMIT) labels the
    window as contended. ``retries`` counts discarded triples that
    triggered a re-run. The record keeps the final control time,
    spread, retry count, and loadavg so any surviving outlier is
    adjudicable from the JSON alone."""
    # one untimed warm-up execution: the first run of a query in a
    # session pays JIT/codegen compilation, python-worker fork/reuse
    # churn, and cold page cache for its inputs — none of which is the
    # query's steady-state cost and none of which the control-run
    # contention guard can see (it is internal to the query, not
    # external load). Measured effect: pipe_route_all_legs first
    # execution ~11 s vs ~3 s steady-state on an idle host.
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = None
    control = spread = None
    retries = 0
    all_samples: list[float] = []
    for attempt in range(max_rounds):
        control = _control_once(spark)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        all_samples.extend(samples)
        spread = max(samples) / min(samples)
        if spread <= SPREAD_LIMIT:
            best = min(samples)
            break
        if attempt < max_rounds - 1:
            retries += 1
    else:
        best = min(all_samples)  # all triples contended; spread > limit flags it
    return {
        "sec": round(best, 3),
        "control_sec": round(control, 3),
        "spread": round(spread, 2),
        "retries": retries,
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

    timings: dict[str, float] = {}
    controls: dict[str, dict] = {}
    for name in HEADLINE:
        rec = _time_query(spark, REGISTRY[name], sf_dir)
        timings[name] = rec["sec"]
        controls[name] = rec
        print(
            f"# {name}: {rec['sec']:.3f}s  (control {rec['control_sec']:.3f}s,"
            f" spread {rec['spread']:.2f}, retries {rec['retries']},"
            f" load {rec['loadavg_1m']})",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # Host-speed normalization (r11): the per-query control runs are
    # too noisy individually (0.1-0.3 s jobs), but their MEDIAN across
    # all headlines is a stable proxy for how fast this host is right
    # now. `value_per_control` = total / median(control) is therefore
    # (approximately) host-independent: compare IT across rounds
    # instead of raw seconds, so a 20% host-speed swing between boots
    # stops reading as a code regression. Individual-query
    # adjudication still goes through bench_summary.json's controls.
    ctl = sorted(c["control_sec"] for c in controls.values())
    control_median = ctl[len(ctl) // 2] if ctl else None
    compact = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "control_median_sec": control_median,
        "value_per_control": (
            round(total / control_median, 2) if control_median else None
        ),
    }
    # The driver records only a 2000-char TAIL of stdout; the per-query
    # contention records ("controls") pushed the first six headlines —
    # including the flagship — out of the committed BENCH_r{6,7}.json
    # artifacts. So: stdout gets ONLY the compact line (~1 kB, always
    # fits), and the full record goes to bench_summary.json next to
    # this script for round-over-round adjudication.
    full = dict(compact)
    full["controls"] = controls
    full["loadavg_1m_end"] = round(os.getloadavg()[0], 2)
    summary_path = os.path.join(_REPO_DIR, "bench_summary.json")
    with open(summary_path, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    print(f"# full record -> {summary_path}", file=sys.stderr)
    print(json.dumps(compact))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
