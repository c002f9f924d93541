"""Extraction operator (S8) + circuit breaker (E4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.extract import (
    CircuitBreaker,
    extract_documents,
    stub_extractor,
)


def _docs(spark):
    return spark.createDataFrame(
        [("1", b"hello world"), ("2", b"x" * 7), ("3", b"")],
        "correlation_id string, content binary",
    )


def test_stub_extraction(spark):
    out = {r.correlation_id: r for r in extract_documents(_docs(spark)).collect()}
    assert out["1"].extract_status == "SUCCESS"
    assert out["1"].extract_text == "hello world"
    assert out["1"].extract_page_count == 1 + len(b"hello world") % 5
    assert out["2"].extract_n_tables == 7 % 3
    assert out["3"].extract_page_count == 1


def test_failing_backend_yields_failed_rows_not_abort(spark):
    def flaky(content: bytes) -> dict:
        if content == b"":
            raise RuntimeError("docling convert failed")
        return stub_extractor(content)

    out = {r.correlation_id: r for r in
           extract_documents(_docs(spark), extractor=flaky).collect()}
    assert out["1"].extract_status == "SUCCESS"
    assert out["3"].extract_status == "FAILED"
    assert "docling convert failed" in out["3"].extract_error


def test_circuit_breaker_transitions():
    cb = CircuitBreaker(window=4, failure_ratio=0.5, delay_calls=3, success_threshold=2)
    for ok in (True, False, True, False):  # 50% failures over window=4 → OPEN
        assert cb.allow()
        cb.record(ok)
    assert cb.state == "OPEN"
    assert not cb.allow() and not cb.allow()  # cooling down
    assert cb.allow()  # third call: HALF_OPEN probe admitted
    assert cb.state == "HALF_OPEN"
    cb.record(True)
    cb.record(True)
    assert cb.state == "CLOSED"


def test_circuit_breaker_reopens_on_half_open_failure():
    cb = CircuitBreaker(window=2, failure_ratio=0.5, delay_calls=1, success_threshold=1)
    cb.record(False)
    cb.record(False)
    assert cb.state == "OPEN"
    assert cb.allow()  # immediately half-open (delay_calls=1)
    cb.record(False)
    assert cb.state == "OPEN"


def test_breaker_open_fails_fast_with_routable_message(spark):
    always_open = CircuitBreaker(window=1, failure_ratio=0.0, delay_calls=10**9)
    always_open.record(False)
    assert always_open.state == "OPEN"
    out = extract_documents(_docs(spark), breaker=always_open).collect()
    assert all(r.extract_status == "FAILED" for r in out)
    assert all("circuit breaker" in r.extract_error for r in out)  # F1-routable


def test_sentence_udtf(spark):
    from fbg_kafka_stream_file_transfer_spark.operators.extract import sentence_udtf

    SplitSentences = sentence_udtf()
    spark.udtf.register("split_sentences", SplitSentences)
    got = spark.sql(
        "SELECT s.* FROM (SELECT 'One two. Three four! Five?' AS t) src, "
        "LATERAL split_sentences(src.t) s"
    ).collect()
    assert [(r.sentence_index, r.sentence) for r in got] == [
        (0, "One two."), (1, "Three four!"), (2, "Five?"),
    ]
