"""Round-7 operators: heavy hitters, feature scaling, k-fold, seasonal
baselines, changelog deletes, k-anonymity, group diversity, top-ngram."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F


def test_heavy_hitters_threshold_and_null(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.profile import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 1, "k string"
    )
    got = {r.value: (r.n_rows, r.share) for r in heavy_hitters(df, "k", 0.3).collect()}
    assert got == {"a": (6, 0.6), "b": (3, 0.3)}  # NULL (0.1) below threshold
    got2 = {r.value for r in heavy_hitters(df, "k", 0.05).collect()}
    assert got2 == {"a", "b", "<NULL>"}
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.0)


def test_scale_features_values_and_degenerate_group(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.profile import scale_features

    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 2.0), (3, "g", 3.0), (4, "solo", 7.0)],
        "id long, grp string, v double",
    )
    got = {r.id: r for r in scale_features(df, "grp", "v", "id").collect()}
    # group g: mean 2, sample std 1, range 2
    assert got[1].zscore == -1.0 and got[3].zscore == 1.0 and got[2].zscore == 0.0
    assert got[1].minmax == 0.0 and got[2].minmax == 0.5 and got[3].minmax == 1.0
    # single-row group: no std, no range
    assert got[4].zscore is None and got[4].minmax is None


def test_assign_kfold_deterministic_partition(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.sampling import assign_kfold

    df = spark.range(200).withColumnRenamed("id", "k")
    out = assign_kfold(df, "k", 5)
    folds = out.groupBy("fold").count().collect()
    assert {r.fold for r in folds} == {0, 1, 2, 3, 4}
    assert sum(r["count"] for r in folds) == 200
    # same key -> same fold on a re-run (pure hash, no state)
    again = {r.k: r.fold for r in assign_kfold(df, "k", 5).collect()}
    first = {r.k: r.fold for r in out.collect()}
    assert first == again
    with pytest.raises(ValueError):
        assign_kfold(df, "k", 1)


def test_seasonal_baseline_flags_only_outliers(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        seasonal_baseline_anomalies,
    )

    rows = []
    # hour 3 baseline: many 10.0s, one wild 100.0
    for i in range(10):
        rows.append((i, datetime(2024, 1, 1 + i, 3, 0), "err", 10.0))
    rows.append((99, datetime(2024, 1, 20, 3, 0), "err", 100.0))
    # hour 5: constant values -> zero variance -> never flags
    for i in range(5):
        rows.append((200 + i, datetime(2024, 1, 1 + i, 5, 0), "err", 42.0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, g string, v double")
    out = seasonal_baseline_anomalies(
        df, "g", "ts", "v", n_sigma=2.0, id_cols=("event_id",)
    ).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].hour_of_day == 3 and out[0].zscore > 2.0


def test_apply_changelog_tombstones(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.cdc import apply_changelog

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        ("u1", t(1), 1, "U"),  # upsert then delete -> gone
        ("u1", t(2), 2, "D"),
        ("u2", t(1), 3, "D"),  # delete then upsert -> resurrected
        ("u2", t(2), 4, "U"),
        ("u3", None, 5, "U"),  # malformed (NULL ts) only -> gone
        ("u4", t(1), 6, None),  # NULL op is an UPSERT, not a tombstone
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, op string")
    got = {r.k: r.eid for r in apply_changelog(df, "k", "ts", "op", ("eid",)).collect()}
    assert got == {"u2": 4, "u4": 6}


def test_k_anonymity_audit(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.expectations import (
        k_anonymity_audit,
    )

    rows = [("US", "a")] * 5 + [("US", "b")] * 2 + [(None, "a")] * 1
    df = spark.createDataFrame(rows, "country string, seg string")
    got = {(r.country, r.seg): r.n_rows for r in
           k_anonymity_audit(df, ["country", "seg"], 5).collect()}
    assert got == {("US", "b"): 2, ("<NULL>", "a"): 1}
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["country"], 1)


def test_group_diversity_identity(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.similarity import (
        group_diversity,
    )

    rows = [
        (0, [1.0, 0.0], "dup"), (1, [2.0, 0.0], "dup"),   # parallel -> cos 1
        (2, [1.0, 0.0], "orth"), (3, [0.0, 5.0], "orth"),  # orthogonal -> cos 0
        (4, [0.0, 0.0], "orth"),                           # zero-norm: excluded
        (5, [1.0, 1.0], "solo"),                           # n=1: no output
        (6, None, "dup"),                                  # NULL vec: excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    got = {r.label: r for r in group_diversity(df, "label", "embedding").collect()}
    assert set(got) == {"dup", "orth"}
    assert got["dup"].n_vectors == 2 and abs(got["dup"].mean_pairwise_cosine - 1.0) < 1e-5
    assert got["orth"].n_vectors == 2 and abs(got["orth"].mean_pairwise_cosine) < 1e-5


def test_top_ngram_stats(spark):
    from fbg_kafka_stream_file_transfer_spark.functions.text import top_ngram_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),   # grams: ab ba ab ba -> tie, 'a b' wins lexically
            (2, "x x x x"),     # 'x x' 3/3
            (3, "single"),      # < 2 tokens -> dropped
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in top_ngram_stats(df, "doc_id", "text", 2).collect()}
    assert set(got) == {1, 2}
    assert got[1].top_ngram == "a b" and got[1].top_count == 2 and got[1].total_ngrams == 4
    assert got[2].top_ngram == "x x" and got[2].top_frac == 1.0
    with pytest.raises(ValueError):
        top_ngram_stats(df, "doc_id", "text", 0)


def test_salted_join_parity_and_spread(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.scale import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, i) for i in range(5)], "k long, v long"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unmatched")],
                                  "k long, name string")
    got = salted_join(big, small, ["k"], n_salts=4)
    plain = big.join(small, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # the hot key's rows really do take multiple salts (the point)
    spread = (
        big.filter("k = 1")
        .withColumn("_s", (F.crc32(F.concat_ws("\x1f", "k", "v"))
                           + F.spark_partition_id()) % 4)
        .select("_s").distinct().count()
    )
    assert spread > 1
    import pytest as _pt
    with _pt.raises(ValueError):
        salted_join(big, small, ["k"], n_salts=1)


def test_merge_incidents_gaps_and_islands(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        merge_incidents,
    )

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        ("u1", t(0), True), ("u1", t(5), True),   # one incident (gap < 10m)
        ("u1", t(30), True),                       # new incident
        ("u1", t(31), False),                      # unflagged: ignored
        ("u2", t(0), True),
        ("u2", None, True),                        # NULL ts dropped
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, bad boolean")
    got = sorted(
        (r.k, r.n_events, r.duration_seconds)
        for r in merge_incidents(df, "k", "ts", F.col("bad"), 600).collect()
    )
    assert got == [("u1", 1, 0), ("u1", 2, 300), ("u2", 1, 0)]


def test_l_diversity_audit(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.expectations import (
        l_diversity_audit,
    )

    rows = (
        [("z1", "flu")] * 5                    # homogeneous: flagged
        + [("z2", "flu"), ("z2", "cold")]      # 2 distinct < 3: flagged
        + [("z3", "flu"), ("z3", "cold"), ("z3", "cough")]  # diverse: ok
        + [("z4", None), ("z4", "flu")]        # NULL sensitive doesn't count
    )
    df = spark.createDataFrame(rows, "zip string, dx string")
    got = {r.zip: (r.n_rows, r.n_distinct_sensitive)
           for r in l_diversity_audit(df, ["zip"], "dx", 3).collect()}
    assert got == {"z1": (5, 1), "z2": (2, 2), "z4": (2, 1)}
    import pytest as _pt
    with _pt.raises(ValueError):
        l_diversity_audit(df, ["zip"], "dx", 1)


def test_as_of_join_forward(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import as_of_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [("k", t(10), 1), ("k", t(20), 2), ("k", t(40), 3)],
        "g string, lt timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("k", t(20), "a"), ("k", t(30), "b")], "g string, rt timestamp, v string"
    )
    fwd = {r.lid: r.v for r in as_of_join(
        left, right, ["g"], "lt", "rt", ["v"], direction="forward"
    ).collect()}
    # t=10 -> next right at 20 ('a'); t=20 -> equal matches ('a'); t=40 -> none
    assert fwd == {1: "a", 2: "a", 3: None}
    bwd = {r.lid: r.v for r in as_of_join(
        left, right, ["g"], "lt", "rt", ["v"]
    ).collect()}
    assert bwd == {1: None, 2: "a", 3: "b"}
    import pytest as _pt
    with _pt.raises(ValueError):
        as_of_join(left, right, ["g"], "lt", "rt", ["v"], direction="sideways")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_r7_plan_shapes(spark, sf_dir):
    """Pin the scale properties verified during round-7 development so
    a future edit can't silently regress them: broadcast-stats rewrites
    never shuffle rows, and group diversity never plans a pairwise
    join."""
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        seasonal_baseline_anomalies,
    )
    from fbg_kafka_stream_file_transfer_spark.operators.profile import scale_features
    from fbg_kafka_stream_file_transfer_spark.operators.similarity import (
        group_diversity,
    )
    from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")

    p = _plan(scale_features(ev, "event_type", "value", "event_id"))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # exactly ONE exchange: the tiny stats aggregation — rows never shuffle
    assert p.count("Exchange hashpartitioning") == 1

    p = _plan(
        seasonal_baseline_anomalies(ev, "event_type", "ts", "value", 2.0, ("event_id",))
    )
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    p = _plan(group_diversity(emb, "label", "embedding"))
    assert "SortMergeJoin" not in p  # |sum(u)|^2 identity: no pairwise join
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_scale_features_invariants_hypothesis(spark):
    """Property: for any group with n>=2 distinct-valued doubles, the
    emitted z-scores average ~0 and minmax spans exactly [0, 1]."""
    from hypothesis import given, settings, strategies as st

    from fbg_kafka_stream_file_transfer_spark.operators.profile import scale_features

    # magnitude capped at 1e3: near ±1e6 with millidigit spacing the
    # n·Σx² − (Σx)² cancellation can exceed the true variance in double
    # rounding, legitimately NULLing every zscore — a real numerical
    # limit of the closed form, not a property violation
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False).map(
                lambda x: round(x, 3)
            ),
            min_size=3, max_size=12, unique=True,
        )
    )
    def prop(vals):
        df = spark.createDataFrame(
            [(i, "g", float(v)) for i, v in enumerate(vals)],
            "id long, grp string, v double",
        )
        rows = scale_features(df, "grp", "v", "id").collect()
        zs = [r.zscore for r in rows]
        mms = [r.minmax for r in rows]
        assert all(z is not None for z in zs)
        assert abs(sum(zs) / len(zs)) < 1e-3          # mean-centered
        assert min(mms) == 0.0 and max(mms) == 1.0    # exact span
        assert all(0.0 <= m <= 1.0 for m in mms)

    prop()


def test_merge_incidents_conservation(spark):
    """Property: incidents partition the flagged rows — event counts
    conserve and incidents per key never overlap."""
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        merge_incidents,
    )

    import random

    rng = random.Random(7)
    rows = [
        (f"u{rng.randrange(4)}",
         datetime(2024, 1, 1 + rng.randrange(3), rng.randrange(24), rng.randrange(60)),
         rng.random() < 0.6)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, bad boolean")
    out = merge_incidents(df, "k", "ts", F.col("bad"), 1800).collect()
    flagged = sum(1 for _, _, b in rows if b)
    assert sum(r.n_events for r in out) == flagged
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append((r.incident_start, r.incident_end))
    for spans in by_key.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2  # strictly disjoint, ordered


def test_as_of_join_null_time_semantics(spark):
    """NULL-timestamp rows follow the malformed-event contract: a
    NULL-time LEFT row matches nothing (either direction); a NULL-time
    RIGHT row is never a match candidate."""
    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import as_of_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [("k", None, 1), ("k", t(10), 2)], "g string, lt timestamp, lid long"
    )
    right = spark.createDataFrame(
        [("k", None, "nullts"), ("k", t(20), "a"), ("k", t(5), "b")],
        "g string, rt timestamp, v string",
    )
    fwd = {r.lid: r.v for r in as_of_join(
        left, right, ["g"], "lt", "rt", ["v"], direction="forward"
    ).collect()}
    assert fwd == {1: None, 2: "a"}
    bwd = {r.lid: r.v for r in as_of_join(
        left, right, ["g"], "lt", "rt", ["v"]
    ).collect()}
    assert bwd == {1: None, 2: "b"}
