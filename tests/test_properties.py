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
