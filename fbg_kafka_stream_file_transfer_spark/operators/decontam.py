"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM-curation step (e.g. GPT-3 §C / PaLM: 8–13-gram overlap
against eval sets): any training document containing an n-gram that also
occurs in a held-out benchmark is flagged (and usually dropped) so eval
scores aren't inflated by memorized test data.

Scale shape (100 TB corpus, benchmark set ≪ corpus): the eval side is a
few thousand documents → its distinct-gram set is small and is
BROADCAST; the training side is a pure map-side explode of shingles
followed by a broadcast-hash join (no shuffle of the corpus) and one
groupBy on ``doc_id`` — a uniform key, one shuffle of only the HIT rows
(typically a tiny fraction of the corpus). Nothing here is quadratic and
nothing shuffles the full corpus.

Shingling reuses ``functions.text.shingles_arrow`` (one Arrow pass,
identical semantics to the Catalyst/oracle form — parity-fuzzed in
test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def ngram_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    broadcast_eval: bool = True,
    max_eval_doc_freq: int | None = None,
) -> DataFrame:
    """(doc_id, n_hit_grams) for every training document sharing at
    least one word ``n``-gram with ``eval_set``.

    ``broadcast_eval=True`` (default) is the production shape —
    benchmark sets are tiny next to the corpus. Pass ``False`` only when
    the eval side is genuinely large: the join falls back to a shuffle
    on ``gram``, where common grams (stop-word runs like "of the end of
    the") skew the key distribution. ``max_eval_doc_freq`` drops eval
    grams occurring in more than that many eval documents before the
    join, ON EITHER PATH (it is a filter on the eval-gram set, not a
    join-strategy knob): such grams carry no contamination signal (a
    phrase shared by half the benchmark identifies nothing) — the same
    reason the GPT-3-style procedure uses long, rare n-grams — and on
    the shuffle path they additionally hot-spot the ``gram`` key. With
    the cap, the per-gram join fan-out from the eval side is bounded by
    the cap and the residual train-side skew is AQE-splittable.
    """
    gram = F.explode(TX.shingles_arrow(F.col(text_col), n)).alias("gram")
    if max_eval_doc_freq is not None:
        ev = (
            eval_set.select(F.col(id_col), gram)
            .distinct()  # document frequency, not raw occurrence count
            .groupBy("gram")
            .agg(F.count("*").alias("_eval_df"))
            .filter(F.col("_eval_df") <= max_eval_doc_freq)
            .select("gram")
        )
    else:
        ev = eval_set.select(gram).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(F.col(id_col), gram)
    return (
        tr.join(ev, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hit_grams"))
    )


#: bits set per key in the portable Bloom filter
_BLOOM_K = 4


def bloom_positions(key, m: int, k: int = _BLOOM_K):
    """``k`` Bloom bit positions in ``[0, m)`` for a key, derived from
    salted md5 — portable (identical in any engine computing the same
    md5), seed-free, and deterministic across partitionings. Returns an
    array column."""
    cols = [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % m
        for i in range(k)
    ]
    return F.array(*cols)


def bloom_membership_gate(
    candidates: DataFrame,
    reference: DataFrame,
    key_col: str = "fingerprint",
    m: int = 1 << 16,
    k: int = _BLOOM_K,
) -> DataFrame:
    """Probabilistic membership gate against a reference corpus — the
    incremental-dedup shape for when the reference is too large to
    semi-join directly: build a Bloom filter over the reference's keys
    once, then test each candidate map-side. A candidate is flagged
    ``maybe_member=1`` when ALL ``k`` of its bit positions are set;
    false positives are possible (rate ≈ (1 - e^(-kn/m))^k), false
    negatives are not — the gate never misses a true duplicate.

    This implementation models the filter as the DISTINCT SET of set
    bit positions (≤ min(m, k·|reference|) rows) instead of a packed
    bitarray, which keeps the math engine-portable (the DuckDB oracle
    computes the identical positions from the identical md5) while
    preserving the scale story: the positions set is tiny next to the
    corpus and is BROADCAST, the candidate side is a map-side explode +
    broadcast join + one groupBy on the candidate key (uniform, only
    candidate keys shuffle — never document text). On a real cluster
    the positions set can be swapped for ``bloom_filter_agg`` /
    ``might_contain`` (a true bitarray, one JVM object) without
    changing any semantics other than the hash family.

    Returns (key_col, maybe_member) with one row per DISTINCT candidate
    key."""
    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    set_bits = (
        reference.select(
            F.explode(bloom_positions(F.col(key_col), m, k)).alias("pos")
        )
        .distinct()
    )
    cand = (
        candidates.select(key_col)
        .distinct()
        .select(
            key_col,
            F.explode(bloom_positions(F.col(key_col), m, k)).alias("cpos"),
        )
    )
    hits = (
        cand.join(F.broadcast(set_bits), cand["cpos"] == set_bits["pos"], "left")
        .groupBy(key_col)
        .agg((F.count(set_bits["pos"]) == k).cast("int").alias("maybe_member"))
    )
    return hits
