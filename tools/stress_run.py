#!/usr/bin/env python3
"""One-shot stress run for SCALE.md: time registry queries against a
larger-than-driver fixture (see tools/gen_stress_fixture.py).

Times each query once (noop write — full computation, no collect) after
a session warm-up, and prints one JSON line per query plus a total.
Single-shot timings are fine here: the question SCALE.md asks is "does
the plan survive 10× with roughly linear cost", not micro-benchmarking.

Usage:
    python3 tools/stress_run.py .localdata/sf1 [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.queries import REGISTRY  # noqa: E402

#: default set: every family whose cost scales with corpus size
DEFAULT = [
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_prefix_groups",
    "dedup_minhash_lsh_candidates",
    "dedup_minhash_verified",
    "dedup_simhash_groups",
    "dedup_embedding_cosine",
    "dedup_duplicate_groups",
    "dedup_semantic_lsh",
    "dedup_paragraph_rollup",
    "decontam_ngram_overlap",
    "sim_topk_bruteforce_arrow",
    "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",
    "sim_ann_ivf_index_topk",
    "sim_centroid_outliers",
    "text_quality_scores",
    "text_redact_pii",
    "sample_split_assignment",
    "profile_embeddings",
    "corpus_curation_top_per_lang",
    "pack_sequences_stats",
    "curation_source_caps",
    "dedup_representatives",
    "decontam_bloom_gate",
    "dedup_incremental_index",
    "sim_hard_negatives",
    "text_unigram_logprob",
    "corpus_epoch_upsample",
    "text_quality_calibrated",
    "corpus_snapshot_diff",
    "text_boilerplate_removal",
    "sample_stratified_exact",
    "text_vocab_coverage",
    "curation_token_budget",
    "curation_semantic_balance",
    "decontam_semantic_eval",
    "text_classifier_gate",
    "sample_global_exact",
    "monitoring_zscore_spikes",
    "pipe_route_all_legs",
    # round-6 continuation (analytics / layout / sketch families)
    "dedup_edit_distance",
    "corpus_temperature_mixture",
    "cdc_scd2_intervals",
    "funnel_signup_purchase",
    "retention_cohorts",
    "ts_gapfill_forward",
    "sample_weighted_topn",
    "layout_compaction_bins",
    "sketch_key_overlap",
    "drift_psi_values",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("stress")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32 * 1000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep going; record the failure
            out[name] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
