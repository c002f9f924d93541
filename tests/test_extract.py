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


def test_nested_result_and_verbatim_json_roundtrip(spark):
    """SURVEY §1.5 — the nested Docling shape: texts/tables arrays match
    the stub's substring/modulo rules, and the verbatim ``result_json``
    parses back to the same nested struct via ``from_json``."""
    import json

    from fbg_kafka_stream_file_transfer_spark.operators.extract import (
        parse_extract_result,
    )

    out = {r.correlation_id: r for r in extract_documents(_docs(spark)).collect()}
    r1 = out["1"]  # "hello world": L=11, p=2, step=5
    assert [t.asDict() for t in r1.extract_texts] == [
        {"page": 1, "text": "hello"}, {"page": 2, "text": " worl"},
    ]
    assert [t.asDict() for t in r1.extract_tables] == [
        {"table_index": 0, "n_rows": 2 + 11 % 5, "n_cols": 1 + 11 % 4},
        {"table_index": 1, "n_rows": 2 + 12 % 5, "n_cols": 1 + 12 % 4},
    ]
    # verbatim JSON carries the full payload, compactly serialized
    parsed = json.loads(r1.extract_result_json)
    assert parsed["page_count"] == 2 and len(parsed["texts"]) == 2
    # and from_json recovers the typed struct from the stored string
    back = (
        extract_documents(_docs(spark))
        .select("correlation_id", parse_extract_result(F.col("extract_result_json")).alias("r"))
        .collect()
    )
    b1 = {r.correlation_id: r.r for r in back}["1"]
    assert b1.page_count == 2 and [t.text for t in b1.texts] == ["hello", " worl"]
    assert b1.tables[1].n_cols == 1 + 12 % 4


def test_max_concurrency_bounds_in_flight_calls(spark):
    """The reference's 5-consumers throttle (application.properties:45):
    with max_concurrency=3 a latching backend observes >1 but never >3
    concurrent in-flight calls; results stay row-aligned."""
    import json
    import tempfile
    import threading

    # executor threads are separate from this process only in cluster
    # mode; on local[*] the UDF runs in a worker process, so the latch
    # communicates through a file the workers share
    state = tempfile.NamedTemporaryFile(mode="w", suffix=".json", delete=False)
    json.dump({"cur": 0, "peak": 0}, state)
    state.close()
    path = state.name
    lock_path = path + ".lock"

    def latching(content: bytes) -> dict:
        import json as j
        import os
        import time

        # crude cross-process mutex (atomic O_EXCL create)
        def locked(fn):
            while True:
                try:
                    fd = os.open(lock_path, os.O_CREAT | os.O_EXCL)
                    break
                except FileExistsError:
                    time.sleep(0.001)
            try:
                return fn()
            finally:
                os.close(fd)
                os.unlink(lock_path)

        def enter():
            s = j.load(open(path))
            s["cur"] += 1
            s["peak"] = max(s["peak"], s["cur"])
            j.dump(s, open(path, "w"))

        def leave():
            s = j.load(open(path))
            s["cur"] -= 1
            j.dump(s, open(path, "w"))

        locked(enter)
        time.sleep(0.05)  # hold the slot so overlap is observable
        locked(leave)
        return stub_extractor(content)

    docs = spark.createDataFrame(
        [(str(i), f"doc {i}".encode()) for i in range(12)],
        "correlation_id string, content binary",
    ).coalesce(1)  # one partition → one pool of max_workers=3
    out = extract_documents(
        docs, extractor=latching, max_concurrency=3, repartition=False
    ).collect()
    assert len(out) == 12 and all(r.extract_status == "SUCCESS" for r in out)
    assert {r.correlation_id: r.extract_text for r in out} == {
        str(i): f"doc {i}" for i in range(12)
    }
    peak = json.load(open(path))["peak"]
    assert 1 < peak <= 3, f"in-flight peak {peak} violates the bound"


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
