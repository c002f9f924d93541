#!/usr/bin/env python3
"""Generate a 10x (sf1-equivalent) dataset from the read-only sf0.1
testdata, for SCALING measurements only (SCALE.md r17).

The driver's testdata tops out at sf0.1, where every headline query is
sub-second and driver-bound — the 8-vs-32-core scaling block measures
local-mode overhead, not operator parallelism (r16 verdict). This tool
builds a deterministic 10x replica of the fact tables in a scratch dir:
each copy shifts the table's primary key by i * 100_000_000 so keys stay
unique and FK joins stay valid (dimension tables are copied verbatim —
10x facts against the same dims, the usual way star schemas grow).
Facts are written with 64 files / multiple row groups so scans split —
the sf0.1 single-row-group artifact is exactly what this measurement
must NOT inherit.

Usage: python3 tools/gen_sf1.py [/tmp/sf1]
Never writes under /root/testdata (read-only by contract).
"""
from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)

COPIES = int(os.environ.get("SPARK_GRAFT_GEN_COPIES", "10"))
SHIFT = 100_000_000
#: fact table -> key columns to shift per copy (joined keys shift
#: together so FK relationships inside the copy stay intact)
FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    assert not out_dir.startswith("/root/testdata"), "testdata is read-only"
    src_dir = "/root/testdata/sf0.1"
    spark = get_spark("gen_sf1")
    for name in TABLE_NAMES:
        df = load_table(spark, src_dir, name)
        keys = FACT_KEYS.get(name)
        dest = f"{out_dir}/{name}.parquet"
        if keys is None:
            df.write.mode("overwrite").parquet(dest)
        else:
            copies = []
            for i in range(COPIES):
                c = df
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
                copies.append(c)
            u = copies[0]
            for c in copies[1:]:
                u = u.unionByName(c)
            u.repartition(max(64, COPIES * 8)).write.mode(
                "overwrite"
            ).parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows -> {dest}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
