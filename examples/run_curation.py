#!/usr/bin/env python3
"""End-to-end example: curating an LLM training corpus at scale.

The §2.h extension surface composed the way a data pipeline would run
it over the synthetic ``documents`` + ``embeddings`` tables:

1. exact dedup (sha256)                    — drop byte-identical docs
2. MinHash-LSH near-dup → transitive groups — drop fuzzy duplicates
2b. boilerplate-window removal             — rewrite docs, drop shared spans
3. quality score + language id + unigram-LM surprise — filter/stratify
4. PII redaction                           — scrub emails/IPs/phones
5. decontamination vs a held-out eval set  — drop benchmark leaks
6. train/val/test split assignment         — reproducible partitions
7. per-source caps                         — domain rate limiting
7b. token-budget waterfilling → mixture    — fit a token budget across langs
8. context-window chunking                 — training-sample shaping
9. epoch weighting + sequence packing (seeded shuffle)
                                           — fixed-budget training rows
10. IVF vector index (k-means trained)     — build once, probe cheaply
   (+ semantic near-dup pairs and embedding-space eval decontamination
    over the embeddings, sharing the ANN machinery)

    python examples/run_curation.py [sf_dir] [index_dir]

Defaults: sf_dir=/root/testdata/sf0.001, index_dir=/tmp/curation_ivf.
Every step is a plain DataFrame transform — the same code runs on a
cluster; only the paths change.
"""

from __future__ import annotations

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from fbg_kafka_stream_file_transfer_spark import get_spark
from fbg_kafka_stream_file_transfer_spark.functions.text import (
    chunk_text,
    lang_id,
    quality_score,
    redact_pii,
    token_count,
    unigram_logprob_scores,
)
from fbg_kafka_stream_file_transfer_spark.operators import dedup, similarity
from fbg_kafka_stream_file_transfer_spark.operators.decontam import (
    ngram_decontaminate,
)
from fbg_kafka_stream_file_transfer_spark.operators.packing import (
    packed_sequence_stats,
)
from fbg_kafka_stream_file_transfer_spark.operators.sampling import (
    allocate_token_budget,
    assign_splits,
    cap_per_group,
    deterministic_sample,
    mix_corpus,
    upsample_epochs,
)
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table


def main(sf_dir: str, index_dir: str) -> None:
    spark = get_spark("curation-example")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: one survivor per content hash
    exact = dedup.exact_dedup_groups(docs, "doc_id", "text")
    survivors = docs.join(
        exact.select(F.col("canonical_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n1 = survivors.count()

    # 2. near-dup: LSH candidates -> verified pairs -> transitive groups,
    #    keep each group's minimum id
    pairs = dedup.minhash_dedup_pairs(survivors, "doc_id", "text", threshold=0.7)
    groups = dedup.duplicate_groups(pairs)
    losers = groups.filter(F.col("doc") != F.col("component")).select(
        F.col("doc").alias("doc_id")
    )
    survivors = survivors.join(losers, "doc_id", "left_anti")
    n2 = survivors.count()

    # 2b. boilerplate-window removal: rewrite every doc, dropping
    #     16-token spans shared across documents (license headers,
    #     nav bars); the frequent-span set is heavy-hitter-sized and
    #     broadcast. Docs scrubbed to nothing fall out of the corpus.
    cleaned = dedup.remove_boilerplate_windows(
        survivors, "doc_id", "text", window_tokens=16, min_docs=2
    )
    dropped_spans = cleaned.agg(F.sum("n_dropped")).collect()[0][0]
    survivors = (
        survivors.drop("text")
        .join(cleaned.filter(F.length("clean_text") > 0), "doc_id")
        .withColumnRenamed("clean_text", "text")
        .drop("n_windows", "n_dropped", "dropped_ratio")
    )
    print(f"boilerplate spans removed: {dropped_spans}")

    # 3. quality + language stratification (pure Catalyst, map-only),
    #    plus the unigram-LM surprise score (perplexity-filter proxy):
    #    drop the lowest-surprise tail (boilerplate) alongside the
    #    heuristic quality gate
    lm = unigram_logprob_scores(survivors, "doc_id", "text")
    scored = (
        survivors.select(
            "doc_id",
            "text",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang"),
            token_count(F.col("text")).alias("tokens"),
        )
        .join(lm.select("doc_id", "avg_neg_logprob"), "doc_id")
        .filter((F.col("quality") >= 0.3) & (F.col("avg_neg_logprob") > 1.0))
    )
    n3 = scored.count()
    print("\n== corpus funnel ==")
    print(f"raw: {n0}  after-exact: {n1}  after-neardup: {n2}  after-quality: {n3}")
    scored.groupBy("lang").agg(
        F.count("*").alias("docs"), F.sum("tokens").alias("tokens")
    ).orderBy("lang").show()

    # 4. PII scrub (map-side regexp chain — no shuffle, no UDF)
    scored = scored.withColumn("text", redact_pii(F.col("text")))

    # 5. decontaminate against a held-out eval sample (2% of the raw
    #    corpus standing in for a benchmark set; broadcast gram join)
    eval_set = deterministic_sample(docs, "doc_id", 0.02)
    hits = ngram_decontaminate(scored, eval_set, n=5)
    scored = scored.join(hits.select("doc_id"), "doc_id", "left_anti")
    n4 = scored.count()
    print(f"after-decontam: {n4}")

    # 6. reproducible 80/10/10 split — same key, same split, any engine
    scored = assign_splits(scored, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    scored.groupBy("split").count().orderBy("split").show()

    # 7. per-source caps: no domain floods the mixture (top-5 per
    #    source by quality here; production uses thousands)
    capped = cap_per_group(
        scored.join(docs.select("doc_id", "source"), "doc_id"),
        "doc_id",
        "source",
        F.round(F.col("quality"), 6),
        5,
    )
    print(f"after-source-caps: {capped.count()}")

    # 7b. fit a token budget across languages: waterfilling finds the
    #     cap level, and the per-lang keep rates feed the deterministic
    #     mixture sampler (the group table is a handful of rows — the
    #     collect is O(#langs), never corpus-sized)
    alloc = allocate_token_budget(
        scored.select("lang", "tokens"), "lang", "tokens", budget=2000.0
    )
    alloc.orderBy("lang").show()
    rates = {r["lang"]: r["keep_rate"] for r in alloc.collect()}
    budgeted = mix_corpus(scored, "doc_id", "lang", rates)
    print(f"after-token-budget: {budgeted.count()}")

    # 8. context-window chunks (explode+slice, codegen — no UDF)
    chunks = chunk_text(scored, "doc_id", "text", chunk_tokens=30, stride=20)
    print(f"== training chunks: {chunks.count()} ==")

    # 9. pack the train split into 512-token sequences, seeded shuffle
    #    so correlated neighbors don't share a sequence; reproducible
    #    on any cluster. Mixture weighting first: repeat high-value
    #    languages to their epoch counts (fractional epochs land as a
    #    deterministic hash slice)
    train = upsample_epochs(
        scored.filter(F.col("split") == "train"),
        "doc_id",
        "lang",
        {"en": 1.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0, "und": 0.5},
    ).withColumn(
        # distinct packing key per epoch copy so repeats spread across
        # shards instead of landing adjacent
        "pack_key",
        F.col("doc_id") * 16 + F.col("copy_idx"),
    )
    packs = packed_sequence_stats(
        train, "pack_key", "tokens", budget=512, n_shards=8, shuffle_seed=42
    )
    packs.agg(
        F.count("*").alias("sequences"),
        F.round(F.avg("fill_ratio"), 4).alias("mean_fill"),
        F.sum("n_spanning").alias("boundary_spans"),
    ).show()

    # 10. trained IVF index over the embeddings; probe 3 queries.
    #    Semantic near-dup pairs share the same LSH bucketing as ANN.
    emb = load_table(spark, sf_dir, "embeddings")
    sem = dedup.semantic_near_dup_pairs(emb, "vec_id", "embedding", 0.4)
    print(f"== semantic near-dup pairs (LSH-blocked): {sem.count()} ==")
    contam = similarity.semantic_contamination(
        emb, "vec_id", "embedding", F.col("vid") < 10, threshold=0.45
    )
    n_leak = contam.filter(F.col("contaminated") == 1).count()
    print(f"== embedding-space eval leaks (cos >= 0.45): {n_leak} ==")
    similarity.build_ivf_index(
        emb, "vec_id", "embedding", index_dir, n_centroids=16, trained=True
    )
    queries = emb.filter(F.col("vec_id") < 3)
    print("== ANN neighbors (persisted IVF index, partition-pruned probes) ==")
    similarity.query_ivf_index(
        queries, index_dir, "vec_id", "embedding", k=3, n_probe=2
    ).orderBy("query_id", "rank").show()

    spark.stop()


def delta_main(sf_dir: str, work_dir: str) -> None:
    """Curate ONLY the delta — the incremental path a 100 TB pipeline
    actually runs day-over-day (full-corpus re-curation is a cold-start
    event, not a schedule). Composes:

    1. ``corpus_snapshot_diff``'s classification to isolate the delta
       (changed = edited slice; added = new ids, half of them
       re-crawled byte-identical re-posts of indexed docs);
    2. ``streaming.dedupe.dedup_against_index`` — the PERSISTENT
       MinHash-LSH index: day 0 indexes the base corpus once, day 1
       probes only the delta against it (O(|delta|) work, bucketed
       candidate join, never an all-pairs or full-corpus rescan);
    3. the standard quality gate on the surviving novel docs.

    The oracle-checked twin (exact-checksum index) is
    ``curation_delta_pipeline`` in queries/curation_q.py.
    """
    import shutil

    from fbg_kafka_stream_file_transfer_spark.operators.sampling import rate_bucket
    from fbg_kafka_stream_file_transfer_spark.streaming.dedupe import (
        dedup_against_index,
    )

    spark = get_spark("delta-curation-example")
    index_dir = f"{work_dir}/lsh_index"
    shutil.rmtree(index_dir, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    b = rate_bucket(F.col("doc_id"))

    # -- day 0: index the base snapshot ONCE (first call just builds) --
    base = docs.select("doc_id", "text")
    dedup_against_index(base, index_dir).count()
    n_base = base.count()

    # -- day 1: only the delta flows --
    # A re-crawl arrives under a NEW fetch id: dedup_against_index's
    # replay guard anti-joins the probe batch's own ids out of the
    # index, so reusing the base doc_id would hide each edited doc's
    # prior revision from the match side and no edit could ever hit.
    changed = docs.filter((b >= 1000) & (b < 2000)).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" [edited v2]")).alias("text"),
    )
    added = docs.filter(b < 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.when(b < 250, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" [new]")))
        .alias("text"),
    )
    delta = changed.unionByName(added)
    n_delta = delta.count()

    # near-dups of the delta against everything previously indexed;
    # re-posts AND lightly-edited re-crawls both hit here (that's the
    # advantage over the exact-checksum twin)
    hits = dedup_against_index(delta, index_dir, threshold=0.7)
    novel = delta.join(
        hits.select(F.col("doc").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    gated = novel.filter(F.round(quality_score(F.col("text")), 6) >= 0.3)
    n_novel, n_gated = novel.count(), gated.count()

    print("\n== incremental delta curation ==")
    print(f"indexed base corpus: {n_base} docs (one-time)")
    print(f"day-1 delta:         {n_delta} docs "
          f"({100.0 * n_delta / n_base:.1f}% of a full re-run)")
    print(f"novel after index-dedup: {n_novel}")
    print(f"curated into corpus:     {n_gated}")
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--delta"]
    sf = args[0] if args else "/root/testdata/sf0.001"
    work = args[1] if len(args) > 1 else "/tmp/curation_ivf"
    if "--delta" in sys.argv:
        delta_main(sf, work)
    else:
        main(sf, work)
