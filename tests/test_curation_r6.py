"""Round-6 curation operators: sequence packing, per-group caps,
dedup survivor selection, Bloom membership gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.decontam import (
    bloom_membership_gate,
)
from fbg_kafka_stream_file_transfer_spark.operators.dedup import (
    dedup_group_representatives,
)
from fbg_kafka_stream_file_transfer_spark.operators.packing import (
    pack_sequences,
    packed_sequence_stats,
)
from fbg_kafka_stream_file_transfer_spark.operators.sampling import cap_per_group


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        # token counts 1..40, deterministic
        ((F.col("id") * 7 + 3) % 40 + 1).cast("bigint").alias("n_toks"),
    )


class TestPackSequences:
    def test_token_conservation(self, spark):
        """Every input token lands in exactly one sequence cell."""
        d = _docs(spark)
        total = d.agg(F.sum("n_toks")).collect()[0][0]
        stats = packed_sequence_stats(d, "doc_id", "n_toks", budget=64, n_shards=4)
        assert stats.agg(F.sum("seq_tokens")).collect()[0][0] == total

    def test_interior_sequences_full(self, spark):
        """All sequences except each shard's last are exactly full."""
        d = _docs(spark)
        stats = packed_sequence_stats(
            d, "doc_id", "n_toks", budget=64, n_shards=4
        ).collect()
        last_per_shard = {}
        for r in stats:
            last_per_shard[r["shard"]] = max(
                last_per_shard.get(r["shard"], -1), r["seq_id"]
            )
        for r in stats:
            if r["seq_id"] < last_per_shard[r["shard"]]:
                assert r["seq_tokens"] == 64, r
                assert abs(r["fill_ratio"] - 1.0) < 1e-9, r

    def test_partitioning_independence(self, spark):
        """The layout is a pure function of the data, not of the input
        partitioning (the reproducible-data-order contract)."""
        d = _docs(spark)
        a = sorted(
            map(tuple, pack_sequences(d, "doc_id", "n_toks", 64, 4).collect())
        )
        b = sorted(
            map(
                tuple,
                pack_sequences(
                    d.repartition(13), "doc_id", "n_toks", 64, 4
                ).collect(),
            )
        )
        assert a == b

    def test_long_doc_spans_many_cells(self, spark):
        """A document longer than the budget is credited to every cell
        it covers — interior cells of a mega-doc still report."""
        d = spark.createDataFrame(
            [(1, 10), (2, 300), (3, 5)], "doc_id long, n_toks long"
        )
        stats = packed_sequence_stats(d, "doc_id", "n_toks", budget=64, n_shards=1)
        rows = {r["seq_id"]: r for r in stats.collect()}
        # 315 tokens => cells 0..4
        assert set(rows) == {0, 1, 2, 3, 4}
        assert sum(r["seq_tokens"] for r in rows.values()) == 315
        # interior cells covered only by the long doc
        for seq in (1, 2, 3):
            assert rows[seq]["n_docs"] == 1
            assert rows[seq]["seq_tokens"] == 64

    def test_seeded_shuffle_reproducible_and_conserving(self, spark):
        """The seeded pre-pack shuffle is a deterministic permutation:
        same seed reproduces the layout bit-for-bit on any partitioning,
        a different seed gives a different layout, and token totals are
        unchanged."""
        d = _docs(spark)
        a = sorted(map(tuple, pack_sequences(d, "doc_id", "n_toks", 64, 4,
                                             shuffle_seed=7).collect()))
        b = sorted(map(tuple, pack_sequences(d.repartition(11), "doc_id",
                                             "n_toks", 64, 4,
                                             shuffle_seed=7).collect()))
        c = sorted(map(tuple, pack_sequences(d, "doc_id", "n_toks", 64, 4,
                                             shuffle_seed=8).collect()))
        plain = sorted(map(tuple, pack_sequences(d, "doc_id", "n_toks",
                                                 64, 4).collect()))
        assert a == b
        assert a != c and a != plain
        total = d.agg(F.sum("n_toks")).collect()[0][0]
        stats = packed_sequence_stats(d, "doc_id", "n_toks", budget=64,
                                      n_shards=4, shuffle_seed=7)
        assert stats.agg(F.sum("seq_tokens")).collect()[0][0] == total

    def test_zero_token_docs_occupy_no_cell(self, spark):
        d = spark.createDataFrame(
            [(1, 0), (2, 10)], "doc_id long, n_toks long"
        )
        stats = packed_sequence_stats(d, "doc_id", "n_toks", budget=64, n_shards=1)
        assert stats.agg(F.sum("seq_tokens")).collect()[0][0] == 10


class TestCapPerGroup:
    def test_cap_enforced_and_top_scores_kept(self, spark):
        df = spark.createDataFrame(
            [(i, "g%d" % (i % 3), float(i % 7)) for i in range(60)],
            "doc_id long, grp string, score double",
        )
        out = cap_per_group(df, "doc_id", "grp", F.col("score"), 5).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r["grp"], []).append(r)
        assert all(len(v) == 5 for v in by_grp.values())
        # kept min score >= best dropped score (descending cap)
        full = df.collect()
        for g, kept in by_grp.items():
            kept_ids = {r["doc_id"] for r in kept}
            dropped = [r for r in full if r["grp"] == g and r["doc_id"] not in kept_ids]
            assert min(r["score"] for r in kept) >= max(r["score"] for r in dropped)

    def test_deterministic_tiebreak(self, spark):
        df = spark.createDataFrame(
            [(i, "g", 1.0) for i in range(10)], "doc_id long, grp string, score double"
        )
        out = cap_per_group(df, "doc_id", "grp", F.col("score"), 3)
        assert {r["doc_id"] for r in out.collect()} == {0, 1, 2}


class TestDedupRepresentatives:
    def test_best_member_survives(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma", 0.2),
                (2, "gamma beta alpha", 0.9),  # same fingerprint, better
                (3, "alpha beta gamma", 0.9),  # tie with 2 -> min id wins
                (4, "unique text here", 0.5),  # singleton: excluded
            ],
            "doc_id long, text string, q double",
        )
        out = dedup_group_representatives(df, "doc_id", "text", F.col("q")).collect()
        assert len(out) == 1
        assert out[0]["kept_id"] == 2
        assert out[0]["n_docs"] == 3
        assert out[0]["kept_score"] == 0.9


class TestBloomGate:
    def test_no_false_negatives(self, spark):
        keys = spark.range(500).select(
            F.md5(F.col("id").cast("string")).alias("k")
        )
        ref = keys.limit(100)
        out = bloom_membership_gate(keys, ref, "k", m=4096, k=4)
        truth = {r["k"] for r in ref.collect()}
        flagged = {r["k"] for r in out.collect() if r["maybe_member"] == 1}
        assert truth <= flagged  # every true member flagged

    def test_false_positive_rate_bounded(self, spark):
        keys = spark.range(2000).select(
            F.md5(F.col("id").cast("string")).alias("k")
        )
        ref = keys.limit(50)
        out = bloom_membership_gate(keys, ref, "k", m=1 << 16, k=4)
        truth = {r["k"] for r in ref.collect()}
        fp = [r for r in out.collect() if r["maybe_member"] == 1 and r["k"] not in truth]
        # (1 - e^(-200/65536))^4 ~ 8e-11 per key; 0 expected over 1950
        assert len(fp) == 0

    def test_positions_are_broadcast(self, spark):
        """The filter side must broadcast — the candidate corpus never
        shuffles on the bit-position key."""
        keys = spark.range(100).select(F.md5(F.col("id").cast("string")).alias("k"))
        plan = bloom_membership_gate(
            keys, keys.limit(10), "k", m=2048, k=4
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
