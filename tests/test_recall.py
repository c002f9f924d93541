"""ANN recall quantification (VERDICT r2 #5): the scale story for the
approximate paths (LSH buckets, IVF cells) claims recall is acceptable —
this puts a number on it.  recall@k = |approx top-k ∩ exact top-k| / k,
averaged over the query set, with exact = the Catalyst brute-force
oracle baseline.  The measured table lives in SCALE.md §ANN-recall;
re-run with ``pytest tests/test_recall.py -s`` to refresh it.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators import similarity
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 50


def _topk_sets(df) -> dict:
    """query_id → set of neighbor_ids (any ranked result frame)."""
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx: dict, exact: dict) -> float:
    """Mean per-query |approx ∩ exact| / |exact| (exact sets are full-k
    here — the corpus is far larger than k)."""
    per_q = [
        len(approx.get(q, set()) & hits) / len(hits) for q, hits in exact.items()
    ]
    return sum(per_q) / len(per_q)


@pytest.fixture(scope="module")
def recall_table(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qf = F.col("vid") < N_QUERIES
    exact = _topk_sets(
        similarity.brute_force_topk(emb, "vec_id", "embedding", qf, k=K)
    )
    lsh = _topk_sets(
        similarity.ann_lsh_topk(emb, "vec_id", "embedding", qf, k=K, planes=4)
    )
    untrained = _topk_sets(
        similarity.ivf_topk(
            emb, "vec_id", "embedding", qf, k=K, n_centroids=16, n_probe=4
        )
    )
    cents = similarity.train_kmeans_centroids(emb, "vec_id", "embedding", k=16)
    trained4 = _topk_sets(
        similarity.ivf_topk(
            emb, "vec_id", "embedding", qf, k=K, n_probe=4, centroids=cents
        )
    )
    trained6 = _topk_sets(
        similarity.ivf_topk(
            emb, "vec_id", "embedding", qf, k=K, n_probe=6, centroids=cents
        )
    )
    table = {
        "lsh_planes4": _recall(lsh, exact),
        "ivf_untrained_probe4of16": _recall(untrained, exact),
        "ivf_trained_probe4of16": _recall(trained4, exact),
        "ivf_trained_probe6of16": _recall(trained6, exact),
    }
    print(f"\nrecall@{K} vs exact brute force ({SF_DIR}, {len(exact)} queries):")
    for name, r in table.items():
        print(f"  {name}: {r:.3f}")
    return table


def test_trained_ivf_recall_floor(recall_table):
    """The headline claim: the trained IVF path keeps recall@10 ≥ 0.7
    while probing 6 of 16 cells (~38 % of the corpus scanned).

    Caveat measured, not assumed: THIS fixture's embeddings are
    near-uniform on the sphere (mean pairwise cosine ≈ 0) — the
    adversarial case for any IVF quantizer, and training buys nothing
    over the deterministic quantizer here (both are balanced: cell
    sizes 101-148 of 125 mean, identical rows-scanned). Training's win
    shows on CLUSTERED corpora — the shape real embedding models emit —
    covered by test_kmeans_trained_ivf_beats_untrained_on_clustered_corpus.

    The floor is 0.65, deliberately below the measured 0.712: this
    pins "recall did not collapse", not the exact figure — a benign
    change to the md5 sample ordering or fixture regeneration must not
    flip an end-to-end metric test. The measured number lives in
    SCALE.md's recall table; relative properties (trained ≥ untrained,
    monotone in n_probe) are asserted by the neighboring tests."""
    assert recall_table["ivf_trained_probe6of16"] >= 0.65


def test_more_probes_more_recall(recall_table):
    """Probing more cells must monotonically widen the candidate set."""
    assert (
        recall_table["ivf_trained_probe6of16"]
        > recall_table["ivf_trained_probe4of16"]
    )


def test_all_paths_beat_random(recall_table):
    """Any bucketing that beats random chance by an order of magnitude
    is doing real locality work: random recall@10 on a 2000-vector
    corpus is ~10/2000 = 0.005."""
    assert all(r >= 0.05 for r in recall_table.values())
