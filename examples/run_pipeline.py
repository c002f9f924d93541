#!/usr/bin/env python3
"""End-to-end example: what a user of the reference pipeline runs here.

Reference workflow (README.md:45-52): drop a file → broker → Camel route
→ S3 `incoming/` → Docling → S3 `processed/`; failures → DLQ →
`failed/`. Same flow below, Spark-native, plus the monitoring views.

    python examples/run_pipeline.py /tmp/demo

Streams files from <workdir>/in through the route into partitioned
sinks under <workdir>/out, then prints the monitoring aggregations.
"""

from __future__ import annotations

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from fbg_kafka_stream_file_transfer_spark import get_spark
from fbg_kafka_stream_file_transfer_spark.operators.monitoring import error_rate
from fbg_kafka_stream_file_transfer_spark.streaming.pipeline import start_file_pipeline


def main(workdir: str) -> None:
    base = pathlib.Path(workdir)
    src, out, ckpt = base / "in", base / "out", base / "ckpt"
    src.mkdir(parents=True, exist_ok=True)

    # seed a few transfers if the inbox is empty (pdf ok, exe rejected)
    if not any(src.iterdir()):
        (src / "report.pdf").write_bytes(b"quarterly report body")
        (src / "notes.txt").write_bytes(b"meeting notes")
        (src / "virus.exe").write_bytes(b"rejected by F2 policy")

    spark = get_spark("example-pipeline")
    query = start_file_pipeline(spark, str(src), str(out), str(ckpt))
    query.processAllAvailable()  # in production: query.awaitTermination()
    query.stop()

    print("\n== incoming/ (S4) ==")
    incoming = spark.read.parquet(str(out / "incoming"))
    incoming.select("file_name", "content_type", "file_size", "incoming_key").show(truncate=False)

    print("== processed/ (S5) ==")
    spark.read.parquet(str(out / "processed")).select("file_name", "result_json").show(
        truncate=False
    )

    print("== retry buffer (E2) ==")
    try:
        spark.read.parquet(str(out / "retry")).select(
            "file_name", "reject_reason", "delivery_count", "next_attempt_time"
        ).show(truncate=False)
    except Exception:
        print("(empty)")

    print("== monitoring: error rate (A1) ==")
    events = incoming.select(
        F.col("event_time"), F.lit("COMPLETED").alias("status")
    )
    error_rate(events).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fileflow-demo")
