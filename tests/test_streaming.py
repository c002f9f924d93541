"""Streaming pipeline end-to-end (S9 → route → sinks) and windowed aggs.

Mirrors the reference's manual E2E check (docs/deployment.md:248-268):
drop files → watch incoming/ → processed/ → failed/.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from fbg_kafka_stream_file_transfer_spark.operators.extract import stub_extractor
from fbg_kafka_stream_file_transfer_spark.streaming.pipeline import (
    process_envelope_batch,
    start_file_pipeline,
    write_batch_sinks,
)
from fbg_kafka_stream_file_transfer_spark.streaming.windows import (
    observed_counters,
    streaming_error_rate,
)

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _envelope_batch(spark):
    rows = [
        ("c1", "t1", "good.pdf", "application/pdf", 10, "h1", b"good bytes", TS, 1),
        ("c2", "t2", "bad.exe", "application/exe", 10, "h2", b"nope", TS, 1),
        ("c3", "t3", "poison.pdf", "application/pdf", 10, "h3", b"POISON", TS, 3),
        ("c3", "t3", "poison.pdf", "application/pdf", 10, "h3", b"POISON", TS, 3),  # dup
    ]
    return spark.createDataFrame(
        rows,
        "correlation_id string, transfer_id string, file_name string, "
        "content_type string, file_size long, checksum string, content binary, "
        "event_time timestamp, delivery_count int",
    )


def test_batch_route_legs(spark):
    def extractor(content: bytes) -> dict:
        if content == b"POISON":
            raise RuntimeError("docling refused")
        return stub_extractor(content)

    r = process_envelope_batch(_envelope_batch(spark), extractor=extractor)
    assert r.incoming.count() == 2  # c1 + c3 pass validation (dup dropped, ST7)
    assert [x.correlation_id for x in r.processed.collect()] == ["c1"]
    # c2 fails validation at attempt 1 → retry; c3 at attempt 3 → DLQ
    assert [x.correlation_id for x in r.retry_buffer.collect()] == ["c2"]
    dlq = r.dlq.collect()
    assert [x.correlation_id for x in dlq] == ["c3"]
    assert '"status":"FAILED"' in dlq[0].failure_json


def test_streaming_file_pipeline_end_to_end(spark, tmp_path):
    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    (src / "a.pdf").write_bytes(b"document one")
    (src / "b.exe").write_bytes(b"malware")
    q = start_file_pipeline(spark, str(src), str(out), str(ckpt))
    try:
        q.processAllAvailable()
        # second trigger with a late-arriving file (stream keeps running)
        (src / "c.txt").write_bytes(b"late arrival")
        q.processAllAvailable()
    finally:
        q.stop()
    incoming = spark.read.parquet(str(out / "incoming"))
    processed = spark.read.parquet(str(out / "processed"))
    retry = spark.read.parquet(str(out / "retry"))
    assert {r.file_name for r in incoming.collect()} == {"a.pdf", "c.txt"}
    assert {r.file_name for r in processed.collect()} == {"a.pdf", "c.txt"}
    assert {r.file_name for r in retry.collect()} == {"b.exe"}  # attempt 1 → retry leg
    assert "dt" in incoming.columns  # date-partitioned sinks (S4/S5 layout)


def test_streaming_min_age_defers_fresh_files(spark, tmp_path):
    """S9 stability parity (goanywhere-config.md:127): a file younger
    than min_age is DEFERRED — absent from every sink after its batch,
    parked in deferred/ — then admitted by a later batch once stable.
    A naive filter would drop it forever (the source marks it seen).
    The gate's clock is injected, so no wall-clock races: min_age is a
    full hour and the test advances virtual time instead of sleeping."""
    import os
    import time

    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    t0 = time.time()
    old = t0 - 7200
    clk = {"now": datetime.datetime.utcfromtimestamp(t0)}
    (src / "a.pdf").write_bytes(b"settled document")
    os.utime(src / "a.pdf", (old, old))
    (src / "b.pdf").write_bytes(b"still being written")
    os.utime(src / "b.pdf", (t0, t0))  # fresh relative to the gate clock
    q = start_file_pipeline(
        spark, str(src), str(out), str(ckpt),
        min_age_seconds=3600, clock=lambda: clk["now"],
        trigger_seconds=0,  # batches driven by file touches, not a timer
    )
    try:
        q.processAllAvailable()
        incoming = spark.read.parquet(str(out / "incoming"))
        assert {r.file_name for r in incoming.collect()} == {"a.pdf"}
        deferred = spark.read.parquet(str(out / "deferred"))
        assert {r.file_name for r in deferred.collect()} == {"b.pdf"}

        clk["now"] += datetime.timedelta(hours=2)  # b.pdf ages past min_age
        (src / "c.pdf").write_bytes(b"next arrival")  # triggers the next batch
        os.utime(src / "c.pdf", (old, old))  # already stable
        q.processAllAvailable()
    finally:
        q.stop()
    processed = spark.read.parquet(str(out / "processed"))
    assert {r.file_name for r in processed.collect()} == {"a.pdf", "b.pdf", "c.pdf"}
    assert not os.path.exists(str(out / "deferred"))  # buffer drained dry


def test_streaming_min_age_readmits_on_quiet_source(spark, tmp_path):
    """ADVICE r2 (pipeline.py:271): with NO new arrivals, the deferred
    file must still be re-admitted once it ages past min_age — the
    processing-time trigger + rate-source heartbeat re-poll the buffer
    (a bare trigger is not enough: no-data micro-batches skip
    foreachBatch for stateless queries)."""
    import os
    import time

    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    t0 = time.time()
    clk = {"now": datetime.datetime.utcfromtimestamp(t0)}
    (src / "only.pdf").write_bytes(b"still being written")
    os.utime(src / "only.pdf", (t0, t0))  # fresh relative to the gate clock
    q = start_file_pipeline(
        spark, str(src), str(out), str(ckpt),
        min_age_seconds=3600, clock=lambda: clk["now"],
        trigger_seconds=1,  # fast cadence so the test polls seconds, not 30 s
    )
    try:
        # NOTE: processAllAvailable() is unusable here — the heartbeat
        # rate source produces rows continuously, so "all available"
        # never drains. Poll the sink with deadlines instead.
        deadline = time.time() + 60
        deferred_names: set[str] = set()
        while time.time() < deadline and "only.pdf" not in deferred_names:
            try:
                deferred_names = {
                    r.file_name
                    for r in spark.read.parquet(str(out / "deferred")).collect()
                }
            except Exception:
                pass  # buffer not written yet
            time.sleep(0.5)
        assert deferred_names == {"only.pdf"}

        clk["now"] += datetime.timedelta(hours=2)  # ages past min_age
        # no new file, no processAllAvailable: only the heartbeat fires
        deadline = time.time() + 60
        names: set[str] = set()
        while time.time() < deadline and "only.pdf" not in names:
            try:
                names = {
                    r.file_name
                    for r in spark.read.parquet(str(out / "processed")).collect()
                }
            except Exception:
                pass  # sink not written yet
            time.sleep(0.5)
    finally:
        q.stop()
    assert "only.pdf" in names
    assert not os.path.exists(str(out / "deferred"))  # buffer drained dry


def test_streaming_error_rate_windows(spark, tmp_path):
    """Drive the watermarked sliding agg through a real streaming query
    (file source → memory sink)."""
    rows = [
        (TS + datetime.timedelta(minutes=m), "FAILED" if m % 2 else "COMPLETED")
        for m in range(20)
    ]
    src = tmp_path / "events"
    spark.createDataFrame(rows, "event_time timestamp, status string").write.parquet(str(src))
    stream = spark.readStream.schema("event_time timestamp, status string").parquet(str(src))
    agg = streaming_error_rate(stream, watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("err_rate_test").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM err_rate_test").collect()
    finally:
        q.stop()
    assert sum(r.total for r in got) == 100  # 20 rows × 5 sliding windows each
    full = [r for r in got if r.total == 5]
    assert full and all(abs(r.error_rate - 0.4) < 0.21 for r in full)


def test_streaming_p95_windows(spark, tmp_path):
    """A3/A4 live: the percentile sketch folds across micro-batches per
    (window, path) with watermark-bounded state."""
    from fbg_kafka_stream_file_transfer_spark.streaming.windows import streaming_p95

    rows = [
        (TS + datetime.timedelta(minutes=m % 5), float(m), "pdf" if m % 2 else "docx")
        for m in range(40)
    ]
    src = tmp_path / "lat"
    schema = "event_time timestamp, processing_seconds double, path string"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = streaming_p95(stream, group_cols=["path"])
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("p95_test").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM p95_test").collect()
    finally:
        q.stop()
    by_path = {r.path: r for r in got}
    assert set(by_path) == {"pdf", "docx"} and all(r.n == 20 for r in got)
    # pdf latencies are the odd values 1..39 → p95 in the top decile
    assert by_path["pdf"].p95_seconds >= 35.0
    assert by_path["docx"].p95_seconds >= 34.0


def test_streaming_p95_append_mode_emits_after_watermark(spark, tmp_path):
    """ADVICE r2 (windows.py:68): the bounded-state claim is the APPEND
    path — a window must be emitted (and its state dropped) once the
    watermark passes its end. Drive three micro-batches: the first fills
    window 1, later ones carry the event-time high-water past
    window_end + watermark so window 1 finalizes."""
    from fbg_kafka_stream_file_transfer_spark.streaming.windows import streaming_p95

    src = tmp_path / "lat"
    src.mkdir()
    schema = "event_time timestamp, processing_seconds double, path string"
    batch1 = [
        (TS + datetime.timedelta(minutes=m % 5), float(m), "pdf" if m % 2 else "docx")
        for m in range(40)
    ]
    spark.createDataFrame(batch1, schema).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src) + "/*")
    agg = streaming_p95(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("p95_append_test").start()
    )
    try:
        q.processAllAvailable()
        # watermark still below window 1's end: nothing finalized yet
        assert spark.sql("SELECT * FROM p95_append_test").count() == 0
        # advance event time far past window_end (TS+5m) + watermark (10m);
        # the watermark is applied from the batch AFTER the one that
        # observed the max event time, hence two more batches
        late1 = [(TS + datetime.timedelta(minutes=30), 1.0, "pdf")]
        late2 = [(TS + datetime.timedelta(minutes=31), 1.0, "pdf")]
        spark.createDataFrame(late1, schema).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        spark.createDataFrame(late2, schema).write.parquet(str(src / "b3"))
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM p95_append_test").collect()
    finally:
        q.stop()
    assert len(got) == 1  # window 1 emitted exactly once, late window still open
    assert got[0].n == 40 and got[0].p95_seconds >= 35.0


def test_observed_counters(spark):
    df = spark.createDataFrame(
        [("COMPLETED",), ("FAILED",), ("COMPLETED",)], "status string"
    )
    observed = observed_counters(df)
    observed.collect()
    # observation metrics are attached to the executed plan
    obs = observed._jdf.queryExecution().observedMetrics()
    assert obs.size() == 1


def test_metrics_listener_collects_progress(spark, tmp_path):
    """S11/A5 — listener sees per-trigger row counts and the observe()
    metrics riding the stream."""
    import time

    from fbg_kafka_stream_file_transfer_spark.streaming.windows import (
        PipelineMetricsListener,
    )

    rows = [(TS, "COMPLETED"), (TS, "FAILED"), (TS, "COMPLETED")]
    src = tmp_path / "ev"
    spark.createDataFrame(rows, "event_time timestamp, status string").write.parquet(str(src))
    stream = spark.readStream.schema("event_time timestamp, status string").parquet(str(src))
    listener = PipelineMetricsListener()
    listener.attach(spark)
    q = (
        observed_counters(stream)
        .writeStream.format("memory").queryName("metrics_test").outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for _ in range(40):  # listener events are delivered async
            if any(p["num_input_rows"] == 3 for p in listener.progress):
                break
            time.sleep(0.25)
    finally:
        q.stop()
        listener.detach(spark)
    batches = [p for p in listener.progress if p["num_input_rows"] == 3]
    assert batches, f"no 3-row batch seen in {listener.progress}"
    obs = batches[0]["observed_metrics"]
    assert obs.get("pipeline_metrics", {}).get("n_failed") == 1


def test_debounced_alerts_stateful(spark, tmp_path):
    """PromQL `for: N` debounce (alerts.yaml:33): alert fires only after
    `consecutive` breached windows; a clean window resets the run."""
    from fbg_kafka_stream_file_transfer_spark.streaming.state import debounced_alerts

    # windows: breach, breach, clean, breach, breach, breach
    vals = [0.5, 0.6, 0.05, 0.7, 0.8, 0.9]
    rows = [
        ("err_rate", TS + datetime.timedelta(minutes=i), v)
        for i, v in enumerate(vals)
    ]
    src = tmp_path / "winagg"
    spark.createDataFrame(
        rows, "alert_key string, window_start timestamp, value double"
    ).write.parquet(str(src))
    stream = spark.readStream.schema(
        "alert_key string, window_start timestamp, value double"
    ).parquet(str(src))
    out = debounced_alerts(
        stream, "alert_key", "window_start", "value", threshold=0.1, consecutive=3
    )
    q = (
        out.writeStream.format("memory").queryName("debounce_test")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            spark.sql("SELECT * FROM debounce_test").collect(),
            key=lambda r: r.window_start,
        )
    finally:
        q.stop()
    assert [r.breach_run for r in got] == [1, 2, 0, 1, 2, 3]
    assert [r.alert for r in got] == [False, False, False, False, False, True]


def test_batch_replay_is_idempotent(spark, tmp_path):
    """ST1→ST7: re-running a micro-batch with the same epoch overwrites
    its own partitions instead of appending duplicates."""
    r = process_envelope_batch(_envelope_batch(spark))
    write_batch_sinks(r, str(tmp_path / "out"), epoch_id=7)
    write_batch_sinks(r, str(tmp_path / "out"), epoch_id=7)  # simulated replay
    r.unpersist()
    incoming = spark.read.parquet(str(tmp_path / "out" / "incoming"))
    assert incoming.count() == 2  # c1 + c3 once each, not doubled
    # stub extractor succeeds for both accepted docs; still no duplicates
    assert spark.read.parquet(str(tmp_path / "out" / "processed")).count() == 2


def test_streaming_zscore_matches_batch_twin(spark, tmp_path):
    """The stateful streaming spike detector must agree bucket-for-bucket
    with operators.monitoring.rolling_zscore_spikes on the same series
    (the batch/streaming parity contract of the monitoring family)."""
    from fbg_kafka_stream_file_transfer_spark.operators.monitoring import (
        rolling_zscore_spikes,
    )
    from fbg_kafka_stream_file_transfer_spark.streaming.state import (
        streaming_zscore_spikes,
    )

    counts = [10, 11, 9, 10, 12, 9, 10, 11, 10, 9, 100, 10, 11]
    rows = [
        ("q", TS + datetime.timedelta(minutes=5 * i), c)
        for i, c in enumerate(counts)
    ]
    schema = "group_key string, bucket_start timestamp, n_events long"
    src = tmp_path / "buckets"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_zscore_spikes(stream, "group_key", "bucket_start", "n_events")
    q = (
        out.writeStream.format("memory").queryName("zscore_test")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        live = sorted(
            spark.sql("SELECT * FROM zscore_test").collect(),
            key=lambda r: r.bucket_start,
        )
    finally:
        q.stop()
    batch = sorted(
        rolling_zscore_spikes(
            spark.createDataFrame(rows, schema),
            "group_key", "bucket_start", "n_events",
        ).collect(),
        key=lambda r: r.bucket_start,
    )
    assert len(live) == len(batch) == len(counts)
    for lv, bt in zip(live, batch):
        assert lv.n_events == bt.n_events
        assert lv.zscore == bt.zscore, (lv, bt)
        assert lv.spike == bt.spike
        assert lv.mean_prev == bt.mean_prev and lv.std_prev == bt.std_prev
    # the engineered burst is flagged exactly once
    assert sum(r.spike for r in live) == 1
