"""Property-based invariants (hypothesis) for the operator kernels.

These pin the cross-implementation equivalences the oracle relies on:
the Arrow fast paths must agree with the Catalyst-expression
definitions on arbitrary input, and the retry policy must respect the
reference's backoff contract for any attempt count.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fbg_kafka_stream_file_transfer_spark.functions.text import shingles, shingles_arrow
from fbg_kafka_stream_file_transfer_spark.operators.retry import DEFAULT_POLICY

# printable-ish text incl. punctuation/whitespace the normalizer must
# handle — and Unicode hazards: NBSP/thin space (Java \s is ASCII-only,
# the Python twins must agree), accented/CJK letters, a combining mark
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABCDE 0123456789.,!?;:'\"()[]{}-\t\n")
        + list("\xa0 　éß中́")
    ),
    max_size=200,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_shingles_arrow_matches_catalyst(spark, texts):
    """The Arrow shingler and the Catalyst expression are the same
    function — element-for-element, order included — on arbitrary text."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = (
        df.select(
            "i",
            shingles(F.col("t"), 3).alias("a"),
            shingles_arrow(F.col("t"), 3).alias("b"),
        )
        .collect()
    )
    for r in got:
        assert r.a == r.b, f"divergence on input {texts[r.i]!r}"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT | st.none(), min_size=1, max_size=8))
def test_simhash_arrow_matches_catalyst_property(spark, texts):
    """The one-pass Arrow simhash and the per-bit Catalyst folds are the
    same function on arbitrary (incl. Unicode and NULL) text."""
    from fbg_kafka_stream_file_transfer_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fast = {r.doc_id: r.simhash16
            for r in dedup.simhash_table(df, "doc_id", "text", arrow=True).collect()}
    slow = {r.doc_id: r.simhash16
            for r in dedup.simhash_table(df, "doc_id", "text", arrow=False).collect()}
    assert fast == slow


def test_retry_backoff_contract_exhaustive(spark):
    """Backoff = 5s × 2^(n-1) capped at 60s for every attempt 1..20
    (reference application.properties:88-94, amq-broker.yaml:79-80)."""
    df = spark.createDataFrame([(n,) for n in range(1, 21)], "delivery_count int")
    got = {
        r.delivery_count: r.d
        for r in df.select(
            "delivery_count",
            DEFAULT_POLICY.delay_for_attempt(F.col("delivery_count")).alias("d"),
        ).collect()
    }
    for n in range(1, 21):
        assert got[n] == min(5 * 2 ** (n - 1), 60)


# strings biased toward PII shapes: digits, separators, @, dots — the
# inputs where redaction boundary behavior is nontrivial
PII_ISH = st.text(
    alphabet=st.sampled_from(
        list("abcz ABC.0123456789@+()-. _%")
    ),
    max_size=120,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(PII_ISH | TEXT | st.none(), min_size=1, max_size=8))
def test_redact_pii_idempotent_property(spark, texts):
    """redact_pii is a projection: applying it twice equals applying it
    once (placeholders contain no digits or '@', so no pattern can
    re-trigger on redacted output), NULLs pass through, and non-PII
    text is never corrupted into a placeholder-free mismatch."""
    from fbg_kafka_stream_file_transfer_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    once = {r.i: r.r for r in df.select("i", redact_pii(F.col("t")).alias("r")).collect()}
    twice = {
        r.i: r.r
        for r in df.select("i", redact_pii(redact_pii(F.col("t"))).alias("r")).collect()
    }
    assert once == twice
    for i, t in enumerate(texts):
        if t is None:
            assert once[i] is None


# ---- round-6 curation operators ----------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=40),
    st.integers(min_value=8, max_value=128),
    st.integers(min_value=1, max_value=4),
)
def test_pack_sequences_conservation_property(spark, toks, budget, n_shards):
    """For ANY token-count list, budget, and shard count: every token
    lands in exactly one cell, interior sequences are exactly full, and
    the layout is independent of input partitioning."""
    from fbg_kafka_stream_file_transfer_spark.operators.packing import (
        packed_sequence_stats,
    )

    df = spark.createDataFrame(
        list(enumerate(toks)), "doc_id long, n_toks long"
    )
    stats = packed_sequence_stats(df, "doc_id", "n_toks", budget, n_shards)
    rows = stats.collect()
    assert sum(r["seq_tokens"] for r in rows) == sum(toks)
    last = {}
    for r in rows:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["seq_id"])
    for r in rows:
        if r["seq_id"] < last[r["shard"]]:
            assert r["seq_tokens"] == budget
    rows2 = packed_sequence_stats(
        df.repartition(5), "doc_id", "n_toks", budget, n_shards
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.floats(min_value=0.0, max_value=3.0, allow_nan=False),
        max_size=3,
    )
)
def test_upsample_epochs_multiplicity_property(spark, epochs):
    """Row multiplicity is exactly floor(e) + [bucket < frac(e)*1e4]
    for every key and any epoch spec."""
    from fbg_kafka_stream_file_transfer_spark.operators.sampling import (
        rate_bucket,
        upsample_epochs,
    )

    df = spark.createDataFrame(
        [(i, ["a", "b", "c", "zz"][i % 4]) for i in range(40)],
        "doc_id long, grp string",
    )
    out = upsample_epochs(df, "doc_id", "grp", epochs)
    from collections import Counter

    mult = Counter(r["doc_id"] for r in out.collect())
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", rate_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    for r in df.collect():
        e = epochs.get(r["grp"], 0.0)
        expect = int(e) + (
            1 if buckets[r["doc_id"]] < round((e - int(e)) * 10000) else 0
        )
        assert mult.get(r["doc_id"], 0) == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=256, max_value=8192),
)
def test_bloom_gate_no_false_negatives_property(spark, n_ref, m):
    """For any reference size and filter width, every true member is
    flagged (false negatives impossible by construction)."""
    from fbg_kafka_stream_file_transfer_spark.operators.decontam import (
        bloom_membership_gate,
    )

    keys = spark.range(120).select(F.md5(F.col("id").cast("string")).alias("k"))
    ref = keys.limit(n_ref)
    out = bloom_membership_gate(keys, ref, "k", m=m, k=4)
    truth = {r["k"] for r in ref.collect()}
    flagged = {r["k"] for r in out.collect() if r["maybe_member"] == 1}
    assert truth <= flagged


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    masses=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=12),
    budget=st.floats(min_value=1.0, max_value=5000.0, allow_nan=False),
)
def test_waterfilling_conservation_property(spark, masses, budget):
    """allocate_token_budget: quotas sum to min(budget, total mass)
    (exact budget exhaustion whenever anything is capped), every quota
    is within [0, group mass], and caps hit the largest groups first."""
    from fbg_kafka_stream_file_transfer_spark.operators.sampling import (
        allocate_token_budget,
    )

    df = spark.createDataFrame(
        [("g%03d" % i, m) for i, m in enumerate(masses)], ["grp", "nt"]
    )
    out = allocate_token_budget(df, "grp", "nt", budget).collect()
    total = float(sum(masses))
    got = sum(r["quota"] for r in out)
    # quota is rounded to 4 dp per group -> tolerance scales with groups
    assert abs(got - min(budget, total)) < 1e-3 * max(len(masses), 1) + 1e-6
    by_grp = {r["grp"]: r for r in out}
    for i, m in enumerate(masses):
        r = by_grp["g%03d" % i]
        assert -1e-9 <= r["quota"] <= m + 1e-9
        # uncapped groups keep everything
        if r["capped"] == 0:
            assert abs(r["quota"] - m) < 1e-9
    # monotone: if a group is capped, every strictly larger group is too
    capped_masses = [masses[i] for i in range(len(masses))
                     if by_grp["g%03d" % i]["capped"] == 1]
    if capped_masses:
        cmin = min(capped_masses)
        for i, m in enumerate(masses):
            if m > cmin:
                assert by_grp["g%03d" % i]["capped"] == 1


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=30).map(
            " ".join
        ),
        min_size=1,
        max_size=10,
    )
)
def test_boilerplate_removal_matches_python_oracle(spark, texts):
    """remove_boilerplate_windows: clean text equals an independent
    Python recomputation (window split -> cross-doc frequency -> drop
    -> rejoin) for arbitrary tiny-alphabet corpora (heavy collisions)."""
    from collections import defaultdict

    from fbg_kafka_stream_file_transfer_spark.operators.dedup import (
        remove_boilerplate_windows,
    )

    k, min_docs = 3, 2
    docs = {i: t for i, t in enumerate(texts)}

    def windows(t):
        toks = t.split(" ") if t else [""]
        n = max((len(toks) + k - 1) // k, 1)
        return [" ".join(toks[i * k:(i + 1) * k]) for i in range(n)]

    freq = defaultdict(set)
    for i, t in enumerate(texts):
        for w in windows(t):
            freq[w].add(i)
    expect = {
        i: " ".join(w for w in windows(t) if len(freq[w]) < min_docs)
        for i, t in docs.items()
    }
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_windows(
            df, "doc_id", "text", window_tokens=k, min_docs=min_docs
        ).collect()
    }
    assert got == expect


def _py_funnel(events, n_steps, max_gap=None):
    """Pure-Python greedy reference for the funnel state machine."""
    times = []
    for t, _eid, flags in sorted(events):
        if len(times) >= n_steps:
            break
        ok = flags[len(times)]
        if ok and times:
            ok = t > times[-1] and (max_gap is None or t <= times[-1] + max_gap)
        if ok:
            times.append(t)
    return times


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),            # seconds
            st.integers(min_value=0, max_value=2),             # which step it matches
        ),
        min_size=0,
        max_size=25,
    ),
    st.one_of(st.none(), st.integers(min_value=1, max_value=30)),
)
def test_funnel_state_machine_matches_python_reference(spark, events, max_gap):
    from fbg_kafka_stream_file_transfer_spark.operators.funnel import (
        funnel_completion,
    )

    rows = [
        ("u", datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), i, f"s{m}")
        for i, (s, m) in enumerate(events)
    ]
    ref_events = [
        (float(s + 1704067200), i, [m == j for j in range(3)])
        for i, (s, m) in enumerate(events)
    ]
    expect = _py_funnel(ref_events, 3, max_gap)
    if not rows:
        return
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid long, etype string")
    got = funnel_completion(
        df,
        "user",
        "ts",
        [F.col("etype") == f"s{j}" for j in range(3)],
        tiebreak_col="eid",
        max_gap_seconds=float(max_gap) if max_gap is not None else None,
    ).collect()[0]
    assert got.steps_completed == len(expect)
    assert [round(t, 3) for t in got.step_times] == [round(t, 3) for t in expect]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=9),
)
def test_distributed_prefix_sum_matches_python(spark, values, nparts):
    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        distributed_running_sum,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "k long, v long"
    ).repartition(4)
    got = {
        r.k: r.running_v
        for r in distributed_running_sum(df, ["k"], "v", nparts).collect()
    }
    acc, expect = 0, {}
    for i, v in enumerate(values):
        acc += v
        expect[i] = acc
    assert got == expect


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 300)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 300)), min_size=1, max_size=12
    ),
    st.sampled_from([60, 180, 600]),
)
def test_interval_overlap_bucketed_matches_quadratic(spark, lefts, rights, bucket):
    """Bucketed interval×interval join ≡ the naive quadratic predicate
    join, for arbitrary intervals and bucket sizes (multiplicities
    included — both sides may contain duplicate intervals)."""
    from fbg_kafka_stream_file_transfer_spark.operators.timejoin import (
        interval_overlap_join_bucketed,
    )

    t0 = datetime.datetime(2024, 1, 1)
    mk = lambda rows, pre: spark.createDataFrame(  # noqa: E731
        [
            (
                "k",
                i,
                t0 + datetime.timedelta(seconds=s),
                t0 + datetime.timedelta(seconds=s + d),
            )
            for i, (s, d) in enumerate(rows)
        ],
        f"key string, {pre}_id long, {pre}_start timestamp, {pre}_end timestamp",
    )
    left, right = mk(lefts, "l"), mk(rights, "r")
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join_bucketed(
            left, right, ["key"], "l_start", "l_end", "r_start", "r_end", bucket
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, (ls, ld) in enumerate(lefts)
        for j, (rs, rd) in enumerate(rights)
        if ls < rs + rd and rs < ls + ld
    )
    assert got == expect


# --- round 8: decoder totality + CSV dialect round-trip ---

_BYTES = st.binary(max_size=400)
# blobs biased to hit the parser branches: magic prefixes + junk
_SNIFFY = st.one_of(
    _BYTES,
    st.tuples(
        st.sampled_from([b"BM", b"P5", b"P6", b"RIFF", b"RIFFxxxxWAVE"]),
        _BYTES,
    ).map(lambda t: t[0] + t[1]),
)


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(_SNIFFY)
def test_image_decoder_total_on_arbitrary_bytes(blob):
    """decode_image_bytes must return a well-formed dict or None on ANY
    bytes — never raise (a single hostile blob would kill the whole
    mapInPandas task; r8 review class)."""
    from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
        decode_image_bytes,
    )

    meta = decode_image_bytes(blob)
    if meta is not None:
        assert meta["width"] > 0 and meta["height"] > 0
        assert meta["n_pixels"] == meta["width"] * meta["height"]
        assert meta["format"] in ("bmp", "ppm", "pgm")


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(_SNIFFY)
def test_audio_decoder_total_on_arbitrary_bytes(blob):
    """decode_audio_bytes: same totality contract on arbitrary bytes,
    including truncated RIFF chunk lists and bogus declared sizes."""
    from fbg_kafka_stream_file_transfer_spark.operators.multimodal import (
        decode_audio_bytes,
    )

    meta = decode_audio_bytes(blob)
    if meta is not None:
        assert meta["sample_rate"] > 0 and meta["channels"] > 0
        assert meta["duration_seconds"] >= 0


# any unicode text except the \N NULL-sentinel collision (documented)
_CSV_TEXT = st.text(max_size=60).filter(lambda s: s != "\\N")


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_CSV_TEXT | st.none(), min_size=1, max_size=6))
def test_csv_dialect_roundtrips_arbitrary_text(spark, tmp_path_factory, texts):
    """The RFC 4180 dialect round-trips ARBITRARY unicode text —
    quotes, newlines, commas, backslashes, empty, NULL — exactly
    (quarantine stays empty; doc_id→text map identical)."""
    from fbg_kafka_stream_file_transfer_spark.sources.csv import (
        read_csv_corpus,
        write_csv_shards,
    )

    out = str(tmp_path_factory.mktemp("csvprop"))
    src = spark.createDataFrame(
        [(i, t, "en", "s", len(t) if t else None) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    write_csv_shards(src, f"{out}/shards", "doc_id", n_shards=2)
    r = read_csv_corpus(spark, f"{out}/shards")
    assert r.n_corrupt == 0
    got = {row["doc_id"]: row["text"] for row in r.clean.collect()}
    want = {i: t for i, t in enumerate(texts)}
    assert got == want


# --- round 8: merge_into_partitioned vs a pure-Python reference model ---

_MERGE_OPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),          # key
        st.integers(min_value=0, max_value=500),         # ts
        st.sampled_from(["U", "D"]),                     # op
        st.integers(min_value=0, max_value=99),          # payload
    ),
    min_size=1,
    max_size=12,
)


def _model_merge_ordered(table, delta):
    """Reference semantics: per contested key the (ts, seq, update-
    beats-current)-max write wins; tombstone lands only if newest.
    table: {key: (ts, seq, payload)}; delta rows: (key, ts, op, payload, seq)."""
    out = dict(table)
    by_key = {}
    for k, ts, op, payload, seq in delta:
        by_key.setdefault(k, []).append((ts, seq, op, payload))
    for k, writes in by_key.items():
        cands = [(ts, seq, 1, op, payload) for ts, seq, op, payload in writes]
        if k in table:
            cts, cseq, cpayload = table[k]
            cands.append((cts, cseq, 0, None, cpayload))  # src=0: current
        ts, seq, _, op, payload = max(cands, key=lambda c: (c[0], c[1], c[2]))
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = (ts, seq, payload)
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(_MERGE_OPS, _MERGE_OPS)
def test_merge_ordered_matches_model(spark, tmp_path_factory, base_ops, delta_ops):
    """Ordered merge_into_partitioned == the reference model on random
    changelogs: fold a base changelog into a table, merge a random
    delta, and compare the final table to the model applied to the
    same sequences (keys hash-partitioned 3 ways so deltas empty,
    touch, and skip partitions across examples)."""
    from fbg_kafka_stream_file_transfer_spark.operators.cdc import apply_changelog
    from fbg_kafka_stream_file_transfer_spark.operators.scale import (
        merge_into_partitioned,
    )

    work = str(tmp_path_factory.mktemp("mergeprop"))
    path = f"{work}/t"
    schema = "id long, pt int, ts long, seq long, payload long, op string"
    base_rows = [
        (k, k % 3, ts, i, payload, op)
        for i, (k, ts, op, payload) in enumerate(base_ops)
    ]
    base_folded = apply_changelog(
        spark.createDataFrame(base_rows, schema),
        "id", "ts", "op", tiebreak_cols=("seq",),
    ).drop("op")
    if base_folded.isEmpty():
        return  # nothing to seed — merge requires an existing table
    base_folded.write.partitionBy("pt").parquet(path, mode="overwrite")

    delta_rows = [
        (k, k % 3, ts, 1000 + i, payload, op)
        for i, (k, ts, op, payload) in enumerate(delta_ops)
    ]
    merge_into_partitioned(
        spark,
        path,
        spark.createDataFrame(delta_rows, schema),
        ["id"],
        ["pt"],
        op_col="op",
        ts_col="ts",
        tiebreak_cols=("seq",),
    )
    table = _model_merge_ordered(
        {}, [(k, ts, op, p, i) for i, (k, ts, op, p) in enumerate(base_ops)]
    )
    want = _model_merge_ordered(
        table,
        [(k, ts, op, p, 1000 + i) for i, (k, ts, op, p) in enumerate(delta_ops)],
    )
    if not want:
        # the merge deleted the LAST row: "empty table" is uniformly
        # "table absent" (a root holding only _SUCCESS would be
        # unreadable and wedge the streaming sink — r8 review)
        import os

        assert not os.path.exists(path), f"base={base_ops} delta={delta_ops}"
        return
    got = {
        r["id"]: (r["ts"], r["seq"], r["payload"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == want, f"base={base_ops} delta={delta_ops}"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(max_size=60) | st.none(), min_size=1, max_size=6))
def test_jsonl_roundtrips_arbitrary_text(spark, tmp_path_factory, texts):
    """The JSONL export/import pair round-trips ARBITRARY unicode text
    — control chars, quotes, backslashes, emoji, empty, NULL — exactly
    (to_json escaping ≡ the schema-enforced reader's parse; the
    quarantine stays empty). Mirrors the CSV dialect fuzz that caught
    the writer's whitespace trimming."""
    from fbg_kafka_stream_file_transfer_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl_shards,
    )

    out = str(tmp_path_factory.mktemp("jsonlprop"))
    src = spark.createDataFrame(
        [(i, t, "en", "s", len(t) if t else None) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    write_jsonl_shards(src, f"{out}/shards", "doc_id", n_shards=2)
    r = read_jsonl(spark, f"{out}/shards")
    assert r.n_corrupt == 0
    got = {row["doc_id"]: row["text"] for row in r.clean.collect()}
    want = {i: t for i, t in enumerate(texts)}
    assert got == want
