"""Sequence packing for LLM training-data preparation (SURVEY §2.h
extension surface).

Training pipelines concatenate documents into fixed-token-budget
sequences ("packing") so every batch slot is full; the standard layout
(GPT-style pretraining) packs documents back-to-back in a deterministic
order and cuts at budget boundaries, letting documents straddle cuts.
This module computes that assignment declaratively:

- each document is routed to a SHARD by portable key-hash (the same
  md5 bucketing as operators.sampling — engine-portable, partition-
  independent), because a single global concatenation order would be a
  one-partition sort at 100 TB;
- within a shard, documents are ordered by id and laid out on a token
  number line via a running sum window; a document's sequence is
  ``floor(start_offset / budget)``.

Scale (100 TB): ONE shuffle on the shard key; the per-shard window sort
is local to the shard's partition. ``n_shards`` is the parallelism
knob — set it to a small multiple of cluster cores so each shard's
token line fits comfortably in one task. The layout is fully
deterministic (no rand(), no partition dependence), so re-running on a
different cluster reproduces byte-identical training sequences — the
property curation teams actually need from a packer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import rate_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 8,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Assign each document a (shard, seq_id, start_offset) in the
    packed layout: documents are concatenated in id order within their
    hash shard and cut into ``budget``-token sequences.

    ``shuffle_seed`` switches the within-shard order from id to a
    DETERMINISTIC shuffle (md5 of ``seed:id``, ties impossible for
    distinct ids) — the production default: packing in source order
    puts correlated neighbors (same crawl batch, same site) into the
    same training sequence, while the seeded order is an engine- and
    partitioning-independent permutation that any re-run reproduces.
    ``None`` keeps plain id order (the oracle-checked form).

    Output columns: id_col, shard, seq_id, start_offset, n_tokens,
    spans_boundary (1 when the document crosses a sequence cut and is
    split across training sequences — the metric packing QA watches).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    shard = (rate_bucket(F.col(id_col)) % n_shards).alias("shard")
    toks = F.col(token_col).cast("bigint")
    if shuffle_seed is None:
        order = [F.col(id_col)]
    else:
        order = [
            F.md5(F.concat(F.lit(f"{shuffle_seed}:"), F.col(id_col).cast("string"))),
            F.col(id_col),  # belt-and-braces total order
        ]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    out = df.select(F.col(id_col), shard, toks.alias("n_tokens")).withColumn(
        "start_offset", start
    )
    return out.select(
        id_col,
        "shard",
        F.floor(F.col("start_offset") / budget).cast("bigint").alias("seq_id"),
        "start_offset",
        "n_tokens",
        (
            F.floor(F.col("start_offset") / budget)
            != F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget)
        )
        .cast("int")
        .alias("spans_boundary"),
    )


def packed_sequence_stats(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 8,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Per-sequence packing QA roll-up: how many documents touch each
    training sequence, how full it is, and how many documents continue
    past its boundary.

    A document's token interval ``[start, start + n_tokens)`` can cover
    several budget cells (a book-length doc spans many sequences), so
    each document EXPLODES to every cell it touches with its tokens
    clipped to that cell — ``sum(seq_tokens)`` over the output equals
    the corpus token count exactly, and no interior sequence goes
    unreported. The explode factor is ~1 for normal corpora (docs ≪
    budget) and ``n_tokens/budget`` for outliers — bounded, data-
    proportional. One extra shuffle on (shard, seq_id), a uniform key
    by construction."""
    packed = pack_sequences(df, id_col, token_col, budget, n_shards, shuffle_seed)
    # skip zero-token docs: they occupy no cell (sequence(c0, c1) with
    # end < start would run backwards)
    packed = packed.filter(F.col("n_tokens") > 0)
    first_cell = F.floor(F.col("start_offset") / budget).cast("bigint")
    last_cell = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / budget
    ).cast("bigint")
    cells = packed.select(
        "shard",
        "start_offset",
        "n_tokens",
        F.explode(F.sequence(first_cell, last_cell)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * budget
    clipped = F.least(
        F.col("start_offset") + F.col("n_tokens"), seq_lo + budget
    ) - F.greatest(F.col("start_offset"), seq_lo)
    continues = (F.col("start_offset") + F.col("n_tokens") > seq_lo + budget).cast(
        "int"
    )
    return (
        cells.withColumn("toks_in_seq", clipped)
        .withColumn("continues", continues)
        .groupBy("shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks_in_seq").cast("bigint").alias("seq_tokens"),
            F.sum("continues").cast("bigint").alias("n_spanning"),
            F.round(F.sum("toks_in_seq") / budget, 6).alias("fill_ratio"),
        )
    )
