#!/usr/bin/env python3
"""Many-partition stress for the manifest table (SCALE.md): measure
commit wall time, manifest size, and read-path planning time as the
live-partition count grows — the metadata ceiling the r9 verdict asked
to MEASURE rather than estimate (each commit rewrites one JSON manifest
listing all live partitions, and maps touched partitions to their
directories with one generation-tree walk).

Prints one JSON line per partition-count step:
  {"partitions": N, "create_sec": ..., "merge_sec": ...,
   "manifest_bytes": ..., "read_plan_sec": ..., "changes_sec": ...}

The merge touches a FIXED 64 partitions at every step, so merge_sec
isolates how the O(live partitions) manifest rewrite + O(touched) dir
walk grow while the data work stays constant.

Usage:
    python3 tools/manifest_stress.py [workdir] [steps...]
    # default workdir .localdata/manifest_stress, steps 1000 5000 10000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.operators.scale import (  # noqa: E402
    merge_into_partitioned,
)
from fbg_kafka_stream_file_transfer_spark.operators.table import (  # noqa: E402
    ManifestTable,
)

TOUCHED = 64  # fixed per-step merge footprint


def _df(spark, n_parts: int, rows_per_part: int = 4):
    return (
        spark.range(n_parts * rows_per_part)
        .select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % n_parts).cast("int").alias("pt"),
            F.sha2(F.col("id").cast("string"), 256).alias("v"),
        )
    )


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else ".localdata/manifest_stress"
    steps = [int(x) for x in sys.argv[2:]] or [1000, 5000, 10000]
    # MANIFEST_STRESS_SHARD_TARGET opts the run into the sharded
    # manifest-list format (persisted at create; merges honor it)
    shard_target = int(os.environ.get("MANIFEST_STRESS_SHARD_TARGET", "0"))
    spark = get_spark("manifest-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for n in steps:
        path = os.path.join(work, f"t{n}")
        shutil.rmtree(path, ignore_errors=True)
        mt = (
            ManifestTable(spark, path, shard_target=shard_target)
            if shard_target
            else ManifestTable(spark, path)
        )

        t0 = time.perf_counter()
        mt.create(_df(spark, n), ["pt"])
        create_sec = time.perf_counter() - t0

        upd = (
            spark.range(TOUCHED)
            .select(
                (F.col("id") + 10_000_000).cast("int").alias("id"),
                (F.col("id") % TOUCHED).cast("int").alias("pt"),
                F.lit("merged").alias("v"),
            )
        )
        t0 = time.perf_counter()
        merge_into_partitioned(spark, path, upd, ["id"], ["pt"])
        merge_sec = time.perf_counter() - t0

        man_path = os.path.join(path, "_manifests", "v00000002.json")
        manifest_bytes = os.path.getsize(man_path)
        # sharded runs: bytes the v2 commit actually WROTE = list file
        # + shards absent from v1's list (reused shards cost nothing)
        commit_write_bytes = manifest_bytes
        raw1, raw2 = mt._manifest_raw(1), mt._manifest_raw(2)
        if "entry_shards" in raw2:
            new_shards = set(raw2["entry_shards"]) - set(
                raw1.get("entry_shards", [])
            )
            commit_write_bytes += sum(
                os.path.getsize(os.path.join(path, rel))
                for rel in new_shards
            )

        t0 = time.perf_counter()
        df = mt.read()  # planning: manifest parse + N-dir scan setup
        plan_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.groupBy().count().collect()
        read_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        mt.changes(1, 2).groupBy().count().collect()
        changes_sec = time.perf_counter() - t0

        # r13: selective compaction of the SAME fixed 64 partitions —
        # must stay flat in live-partition count (O(selected) data
        # work + the O(live) manifest rewrite every commit pays)
        t0 = time.perf_counter()
        nsel = mt.compact(partitions=[(p,) for p in range(TOUCHED)])
        selective_compact_sec = time.perf_counter() - t0
        assert nsel == TOUCHED, nsel
        t0 = time.perf_counter()
        rep = mt.small_file_report()
        report_sec = time.perf_counter() - t0
        assert len(rep) == n, len(rep)

        print(json.dumps({
            "partitions": n,
            "shard_target": shard_target or None,
            "create_sec": round(create_sec, 2),
            "merge_sec": round(merge_sec, 2),
            "manifest_bytes": manifest_bytes,
            "commit_write_bytes": commit_write_bytes,
            "read_plan_sec": round(plan_sec, 3),
            "read_exec_sec": round(read_sec, 2),
            "changes_sec": round(changes_sec, 2),
            "selective_compact_sec": round(selective_compact_sec, 2),
            "small_file_report_sec": round(report_sec, 3),
        }), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
