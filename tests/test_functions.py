"""Scalar derivation + text functions against known values."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.functions import derivations as D
from fbg_kafka_stream_file_transfer_spark.functions import text as TX


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_transfer_id_format(spark):
    ts = F.lit("2024-03-05 07:08:09.123").cast("timestamp")
    assert _one(spark, D.transfer_id(ts)) == "GOANYWHERE-20240305070809123"


def test_mime_lookup(spark):
    assert _one(spark, D.mime_from_filename(F.lit("report.PDF"))) == "application/pdf"
    assert _one(spark, D.mime_from_filename(F.lit("no_ext"))) == "application/octet-stream"
    assert _one(spark, D.mime_from_filename(F.lit("a.b.jpeg"))) == "image/jpeg"


def test_checksum_matches_hashlib(spark):
    got = _one(spark, D.sha256_checksum(F.to_binary(F.lit("abc"), F.lit("utf-8"))))
    assert got == hashlib.sha256(b"abc").hexdigest()


def test_object_keys(spark):
    key = D.object_key("processed", F.lit("2024/01/02"), F.lit("c1"), F.lit("f.pdf"), ".json")
    assert _one(spark, key) == "processed/2024/01/02/c1/f.pdf.json"


def test_docling_request_shape(spark):
    got = _one(spark, D.docling_request(F.lit("s3://b/k")))
    assert got == (
        '{"source":"s3://b/k","options":{"from_format":null,"to_format":"json",'
        '"ocr":true,"table_structure":true}}'
    )


def test_iso_timestamp_offset(spark):
    ts = F.lit("2024-01-01 00:00:00.5").cast("timestamp")
    assert _one(spark, D.iso_timestamp(ts)) == "2024-01-01T00:00:00.500+0000"


def test_token_counts(spark):
    assert _one(spark, TX.token_count(F.lit("  a b   c "))) == 3
    assert _one(spark, TX.token_count(F.lit(""))) == 0
    # "hello" "," "world" "42" → 4 pieces
    assert _one(spark, TX.bpe_ish_token_count(F.lit("hello, world42"))) == 4
    assert _one(spark, TX.bpe_ish_token_count(F.lit("abc"))) == 1


def test_lang_id_markers(spark):
    assert _one(spark, TX.lang_id(F.lit("the cat and the dog"))) == "en"
    assert _one(spark, TX.lang_id(F.lit("el perro y la casa que"))) == "es"
    assert _one(spark, TX.lang_id(F.lit("zzz qqq"))) == "und"


def test_fingerprint_invariance(spark):
    a = _one(spark, TX.fingerprint(F.lit("Hello world hello")))
    b = _one(spark, TX.fingerprint(F.lit("world, HELLO!")))
    assert a == b


def test_shingles(spark):
    got = _one(spark, TX.shingles(F.lit("a b c d"), 3))
    assert got == ["a b c", "b c d"]
    short = _one(spark, TX.shingles(F.lit("a b"), 3))
    assert short == ["a b"]


def test_repetition_ratio_and_quality_flags(spark):
    """Gopher-style gates: boilerplate ('spam ham eggs' looped) trips
    the repetition rule while varied prose keeps all gates green."""
    looped = " ".join(["spam ham eggs"] * 10)  # 28 trigrams, 3 distinct
    prose = "the quick brown fox jumps over the lazy dog and it is great for all on a day"
    df = spark.createDataFrame(
        [(1, looped), (2, prose), (3, "x"), (4, None)], "i long, t string"
    )
    got = {r.i: r for r in df.select(
        "i", TX.repetition_ratio(F.col("t")).alias("rep"), *TX.quality_flags(F.col("t"))
    ).collect()}
    assert got[1].rep > 0.8 and not got[1].repetition_ok and not got[1].keep
    assert got[2].rep == 0.0 and got[2].keep
    assert got[3].rep == 0.0 and not got[3].len_ok and not got[3].keep
    # NULL text must be visibly DROPPED (every flag False), not three-valued
    # NULL — else it evades both keep and NOT keep filters and drop counts
    assert got[4].keep is False
    assert all(getattr(got[4], f) is False for f in
               ("len_ok", "word_len_ok", "punct_ok", "stopword_ok", "repetition_ok"))


def test_shingles_arrow_unicode_whitespace_parity(spark):
    """Java/RE2 \\s is ASCII-only: U+00A0 is NOT whitespace to Spark's
    regexp_replace, and the Python twin must agree (re.ASCII + strip(' ')
    — a Unicode-aware \\s or bare strip() would silently diverge on
    HTML-derived text)."""
    texts = ["a b c d", "x ", " thin space", "a  b\tc", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    slow = {r.i: r.s for r in df.select("i", TX.shingles(F.col("t"), 2).alias("s")).collect()}
    fast = {r.i: r.s for r in df.select("i", TX.shingles_arrow(F.col("t"), 2).alias("s")).collect()}
    assert fast == slow


def test_redact_pii_patterns(spark):
    """Email / IPv4 / phone each hit their typed placeholder; IPv4 is
    not half-eaten by the phone pattern; clean text passes unchanged."""
    texts = [
        (0, "mail me at jane.doe+spam@sub.example.co.uk today"),
        (1, "server 192.168.0.1 and also 10.0.255.7 replied"),
        (2, "call +1 555-123-4567 or (020) 7946 0958 now"),
        (3, "no personal data in this sentence at all"),
        (4, "mixed: bob@x.io from 8.8.8.8 dialed 555 867 5309"),
    ]
    df = spark.createDataFrame(texts, "i long, t string")
    got = {r.i: r.red for r in df.select("i", TX.redact_pii(F.col("t")).alias("red")).collect()}
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "server <IP> and also <IP> replied"
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[3] == texts[3][1]
    assert got[4] == "mixed: <EMAIL> from <IP> dialed <PHONE>"


def test_redact_pii_duckdb_parity(spark):
    """The DuckDB mirror built from the SAME PII_PATTERNS list redacts
    identically — the single-source-of-truth contract the oracle of
    text_redact_pii rests on."""
    import duckdb

    from fbg_kafka_stream_file_transfer_spark.queries.curation_q import _pii_sql

    texts = [
        "a@b.co and 1.2.3.4 and +44 7911 123456",
        "edge 255.255.255.255. end",
        "no match here",
        "double dots 1.2.3.4.5 are not an ip",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    spark_out = {
        r.i: r.red for r in df.select("i", TX.redact_pii(F.col("t")).alias("red")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        duck = con.execute(f"SELECT {_pii_sql('?')}", [t]).fetchone()[0]
        assert spark_out[i] == duck, f"engine divergence on {t!r}"


def test_assign_splits_partition_and_consistency(spark):
    """Splits cover every row exactly once, fractions land near targets,
    and the assignment agrees with deterministic_sample's bucketing (a
    20% sample of the corpus stays inside train+val+test proportions)."""
    import pytest

    from fbg_kafka_stream_file_transfer_spark.operators.sampling import (
        assign_splits,
        deterministic_sample,
    )

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = assign_splits(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}  # no NULL remainder at sum=1
    assert sum(counts.values()) == 5000
    assert counts["train"] == pytest.approx(4000, rel=0.05)
    assert counts["val"] == pytest.approx(500, rel=0.2)
    # rerun → identical assignment (determinism)
    again = {r.doc_id: r.split for r in out.collect()}
    assert {r.doc_id: r.split
            for r in assign_splits(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
            } == again
    # sample-then-split == split-then-sample (shared bucketing)
    sampled_ids = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    # deterministic_sample keeps buckets < 2000, which assign_splits maps
    # entirely into 'train' (buckets < 8000)
    assert all(again[i] == "train" for i in sampled_ids)
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"a": 0.9, "b": 0.2})
