#!/usr/bin/env python3
"""Per-query profiler for the headline bench set (guide §1).

For each headline query (or the names passed on argv):
- one warm-up noop write, then one TIMED noop write,
- captures ``explain("formatted")`` to ``plans/r16/<name>_<tag>.txt``,
- counts the Spark jobs/stages the timed run launched and their
  aggregate task time / shuffle bytes via the UI REST API,
- prints a per-query summary line.

Usage: python3 tools/profile_headline.py [--tag before] [query ...]

The UI is enabled for this session only (the bench itself keeps it
off); metrics come from /api/v1/applications/<id>/jobs + /stages.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from fbg_kafka_stream_file_transfer_spark import get_spark  # noqa: E402
from fbg_kafka_stream_file_transfer_spark.queries import REGISTRY  # noqa: E402
from bench import HEADLINE  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.load(r)


def main() -> int:
    argv = sys.argv[1:]
    tag = "before"
    rnd = "r17"
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--tag":
            tag = argv[i + 1]
            i += 2
        elif argv[i] == "--round":
            rnd = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    names = args or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # session warm-up (same as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32 * 1000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(_REPO, "plans", rnd)
    os.makedirs(plans_dir, exist_ok=True)

    rows = []
    for name in names:
        q = REGISTRY[name]
        # warm-up
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # plan capture
        df = q.spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = [
            s for s in _api(base, "/stages?status=complete")
            if s["stageId"] in stage_ids
        ]
        n_tasks = sum(s["numCompleteTasks"] for s in stages)
        sh_r = sum(s["shuffleReadBytes"] for s in stages)
        sh_w = sum(s["shuffleWriteBytes"] for s in stages)
        exch = plan.count("Exchange")
        py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count(
            "ArrowEval"
        )
        rows.append(
            dict(name=name, wall=round(wall, 3), jobs=len(jobs),
                 stages=len(stages), tasks=n_tasks,
                 shuffle_mb=round((sh_r + sh_w) / 2**20, 2),
                 plan_exchanges=exch, plan_python=py)
        )
        print(
            f"{name:32s} {wall:7.3f}s  jobs={len(jobs):3d} stages={len(stages):3d}"
            f" tasks={n_tasks:4d} shuffleMB={(sh_r+sh_w)/2**20:8.2f}"
            f" planExch={exch} planPy={py}",
            flush=True,
        )
    out = os.path.join(_REPO, "plans", rnd, f"profile_{tag}.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"# -> {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
