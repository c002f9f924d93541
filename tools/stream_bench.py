#!/usr/bin/env python3
"""Sustained-throughput measurement for the STREAMING file pipeline.

BASELINE.md's streaming acceptance row (the reference's operational
envelope: 40 concurrent in-flight files, main-queue backlog <= 1000,
p95 route time < 60 s — k8s/monitoring/alerts.yaml:51-60,115-124) was
previously only *derived* from the batch route's throughput. This tool
measures the engine side directly: it materializes N real document
files, drives ``start_file_pipeline`` (S9 file-monitor source → full
route → partitioned sinks) with ``maxFilesPerTrigger`` pacing, and
reads per-micro-batch durations from the query's progress records.

Reported (one JSON line on stdout):
- ``files_per_sec_sustained``: total routed files / total micro-batch
  execution time (the drain rate an arrival stream must exceed to
  build backlog),
- ``p95_batch_sec`` / ``max_batch_sec``: micro-batch latency vs the
  60 s route SLO,
- ``max_backlog_files``: unprocessed files pending before each batch
  (vs the 1000-message backlog alert),
- per-batch detail for adjudication.

Usage: python3 tools/stream_bench.py [n_files] [files_per_trigger] [body_kb]
Env: SPARK_GRAFT_SF_DIR (doc source; default /root/repo/.localdata/sf1
with fallback /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

``body_kb`` (round 9) sweeps the BYTE-bound regime: each file's text
is padded to the target size (the fixture corpus' small bodies measure
the pacing-bound regime; BASELINE's ceiling is 100 MB files —
docs/goanywhere-config.md:371). With a body size set the summary adds
``mb_per_sec_sustained`` so SCALE.md can report MB/s next to files/s
and locate where drain flips from pacing-bound to IO-bound.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.sources.tables import load_table  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.streaming.pipeline import (  # noqa: E402
    start_file_pipeline,
)


def _progress_records(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:  # StreamingQueryProgress object — normalize via its json
            out.append(json.loads(p.json))
    return out


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    body_kb = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if not sf_dir:
        sf_dir = os.path.join(_REPO_DIR, ".localdata", "sf1")
        if not os.path.isdir(sf_dir):
            sf_dir = "/root/testdata/sf0.1"

    spark = get_spark("stream_bench")
    # recentProgress keeps only the LAST numRecentProgressUpdates
    # records (default 100); a run with more micro-batches than that
    # would silently drop the early batches — including the cold batch 0
    # this tool's numbers explicitly claim to include — and overstate
    # sustained throughput. Size the buffer to the run.
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(1000, 2 * (n_files // max(per_trigger, 1) + 10))),
    )
    work = tempfile.mkdtemp(prefix="stream_bench_")
    src, out, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"
    os.makedirs(src)

    # materialize N real document files (cycle the fixture corpus);
    # every 8th is .exe so the reject/retry leg carries traffic too
    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .limit(2000)
        .collect()
    ]
    if body_kb:
        # pad to the target body size; cap the distinct-body pool so
        # driver memory stays bounded (16 × body) — content variety is
        # irrelevant to the byte-bound measurement
        target = body_kb * 1024
        texts = [
            (t * (target // max(len(t), 1) + 1))[:target]
            for t in texts[:16]
        ]
    t0 = time.perf_counter()
    for i in range(n_files):
        ext = "exe" if i % 8 == 0 else "pdf"
        with open(f"{src}/doc-{i:06d}.{ext}", "w") as f:
            f.write(texts[i % len(texts)])
    gen_sec = time.perf_counter() - t0
    print(f"# materialized {n_files} files in {gen_sec:.1f}s", file=sys.stderr)

    q = start_file_pipeline(
        spark, src, out, ckpt, max_files_per_trigger=per_trigger
    )
    t0 = time.perf_counter()
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        progress = _progress_records(q)
    finally:
        q.stop()

    batches = []
    done = 0
    for p in progress:
        rows = int(p.get("numInputRows", 0))
        if rows == 0:
            continue  # empty bookkeeping trigger
        dur = p["durationMs"].get("triggerExecution", 0) / 1000.0
        batches.append(
            {
                "batch_id": p.get("batchId"),
                "rows": rows,
                "sec": round(dur, 3),
                "backlog_before": n_files - done,
            }
        )
        done += rows
    total_rows = sum(b["rows"] for b in batches)
    if total_rows != n_files:
        print(
            f"# WARNING: progress records cover {total_rows}/{n_files} files "
            f"— throughput numbers are partial",
            file=sys.stderr,
        )
    busy_sec = sum(b["sec"] for b in batches)
    durs = sorted(b["sec"] for b in batches)
    p95 = durs[max(0, int(round(0.95 * len(durs))) - 1)] if durs else None

    # routed-row accounting from the sinks (sanity: nothing dropped)
    legs = {}
    for leg in ("incoming", "processed", "retry", "failed"):
        try:
            legs[leg] = spark.read.parquet(f"{out}/{leg}").count()
        except Exception:
            legs[leg] = 0

    summary = {
        "metric": "stream_pipeline_sustained",
        "n_files": n_files,
        "files_per_trigger": per_trigger,
        "body_kb": body_kb or None,
        "n_batches": len(batches),
        "files_per_sec_sustained": round(total_rows / busy_sec, 1) if busy_sec else None,
        "mb_per_sec_sustained": (
            round(total_rows * body_kb / 1024.0 / busy_sec, 1)
            if body_kb and busy_sec
            else None
        ),
        "p95_batch_sec": p95,
        "max_batch_sec": durs[-1] if durs else None,
        "max_backlog_files": max((b["backlog_before"] for b in batches), default=0),
        "wall_sec_total": round(wall, 1),
        "sink_rows": legs,
        "sf_dir": sf_dir,
        "batches": batches,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
