"""10× scale stress (VERDICT r2 #8) — gated: the sf0.1 bench can't see
plan-depth or convergence cliffs, so this drives the graph/dedup paths
on a synthetic corpus an order of magnitude past it and asserts runtime
stays near-linear. Run with ``SPARK_GRAFT_STRESS=1 pytest
tests/test_stress.py -s``; measured numbers live in SCALE.md
§Stress-verified. Skipped by default — it's minutes, not seconds.
"""

from __future__ import annotations

import os
import random
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"),
    reason="set SPARK_GRAFT_STRESS=1 to run the 10x stress suite (minutes)",
)


def _component_edges(spark, scale: int):
    """Adversarial component mix at ``scale``: one chain of length
    2000×scale (diameter stress — pointer jumping must keep rounds
    logarithmic) + power-law stars (hub stress: 1 hub of 2000×scale,
    10×scale hubs of 100, 1000×scale hubs of 5)."""
    chain_n = 2000 * scale
    chain = spark.range(chain_n).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    base = 10_000_000  # keep id spaces disjoint
    hub_big = spark.range(2000 * scale).select(
        F.lit(base).alias("doc_a"), (F.lit(base + 1) + F.col("id")).alias("doc_b")
    )
    hubs_mid = spark.range(10 * scale * 100).select(
        (F.lit(2 * base) + F.floor(F.col("id") / 100)).alias("doc_a"),
        (F.lit(3 * base) + F.col("id")).alias("doc_b"),
    )
    hubs_small = spark.range(1000 * scale * 5).select(
        (F.lit(4 * base) + F.floor(F.col("id") / 5)).alias("doc_a"),
        (F.lit(5 * base) + F.col("id")).alias("doc_b"),
    )
    return chain.union(hub_big).union(hubs_mid).union(hubs_small)


def _run_components(spark, scale: int) -> float:
    from fbg_kafka_stream_file_transfer_spark.operators.dedup import duplicate_groups

    edges = _component_edges(spark, scale)
    t0 = time.perf_counter()
    groups = duplicate_groups(edges)
    # correctness ride-along: component count and the chain's single label
    n_components = groups.select("component").distinct().count()
    dt = time.perf_counter() - t0
    assert n_components == 1 + 1 + 10 * scale + 1000 * scale
    chain_labels = (
        groups.filter(F.col("doc") < 10_000_000).select("component").distinct().collect()
    )
    assert [r.component for r in chain_labels] == [0]
    return dt


def test_duplicate_groups_near_linear_at_10x(spark):
    t1 = _run_components(spark, 1)
    t10 = _run_components(spark, 10)
    print(f"\nduplicate_groups: scale1 {t1:.1f}s, scale10 {t10:.1f}s ({t10/t1:.1f}x)")
    # 10× nodes, diameter 2k→20k: rounds grow ~log(d) (≈ +40 %), data
    # 10× — anything under 15× is comfortably "near-linear, no cliff"
    assert t10 < 15 * t1
    assert t10 < 600  # absolute runaway guard


def _synth_docs(spark, n_docs: int):
    """Deterministic corpus with planted near-dups: every 5th document
    is the previous one with one word swapped (trigram Jaccard ≈ 0.85,
    well above the 0.7 verify threshold)."""
    rng = random.Random(42)
    vocab = [f"w{i:04d}" for i in range(2000)]
    rows = []
    planted = []
    words: list[str] = []
    for i in range(n_docs):
        if i % 5 == 1:
            mutated = list(words)  # words of doc i-1
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            words = mutated
            planted.append((i - 1, i))
        else:
            words = [rng.choice(vocab) for _ in range(40)]
        rows.append((i, " ".join(words)))
    return (
        spark.createDataFrame(rows, "doc_id long, text string").repartition(32),
        planted,
    )


def _run_minhash(spark, n_docs: int) -> tuple[float, float]:
    from fbg_kafka_stream_file_transfer_spark.operators.dedup import minhash_dedup_pairs

    docs, planted = _synth_docs(spark, n_docs)
    docs = docs.persist()
    docs.count()  # generation cost out of the timed window
    t0 = time.perf_counter()
    pairs = minhash_dedup_pairs(docs, "doc_id", "text")
    found = {(r.doc_a, r.doc_b) if r.doc_a < r.doc_b else (r.doc_b, r.doc_a)
             for r in pairs.collect()}
    dt = time.perf_counter() - t0
    docs.unpersist()
    recall = sum(1 for p in planted if p in found) / len(planted)
    return dt, recall


def test_minhash_verified_near_linear_at_10x(spark):
    t1, r1 = _run_minhash(spark, 5_000)    # = sf0.1 documents volume
    t10, r10 = _run_minhash(spark, 50_000)
    print(f"\nminhash_verified: 5k {t1:.1f}s (recall {r1:.3f}), "
          f"50k {t10:.1f}s (recall {r10:.3f}, {t10/t1:.1f}x)")
    # banded LSH keeps candidate volume ~linear in docs for a fixed dup
    # rate; the verify join is restricted to candidates — no O(n²) cliff
    assert t10 < 15 * t1
    assert t10 < 600
    # planted near-dups keep being found at scale (P(candidate) ≈ 0.98
    # per planted pair at J≈0.85 with 12 hashes / 4 bands)
    assert r1 >= 0.9 and r10 >= 0.9
