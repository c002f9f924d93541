#!/usr/bin/env python3
"""Time one or more registry queries in isolation (noop sink, best-of-N).

Usage: python3 tools/time_query.py <query> [<query>...] [--n 3]
Prints one line per query: name best median samples control.
Same methodology as bench.py (warm-up run excluded, fixed-work control).
"""
from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.queries import REGISTRY  # noqa: E402


def main() -> int:
    n = 3
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--n":
            n = int(argv[i + 1])
            i += 2
        elif argv[i].startswith("--"):
            i += 1
        else:
            args.append(argv[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32 * 1000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in args:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id * 2 + 1)").collect()
        control = time.perf_counter() - t0
        samples = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        s = sorted(samples)
        print(
            f"{name}: best={s[0]:.3f} med={s[len(s)//2]:.3f} "
            f"samples={[round(x,3) for x in samples]} control={control:.3f}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
