#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4) — bench.py is the
frozen driver contract and is NOT touched by this file.

Per headline query this harness can:
- time the computation in isolation with the noop sink (full materialization
  of every column, no driver collect, visible in the SQL tab)
- ALSO time `df.count()` (the frozen bench.py methodology) so numbers here
  are directly comparable with what the driver measures
- dump `.explain("formatted")` to a plans dir (before/after evidence)
- pull per-stage metrics (shuffle bytes, task time) from the UI REST API

Usage:
  python bench_extra.py --sf /root/testdata/sf0.1 --queries dedup_jaccard,ann_lsh
  python bench_extra.py --plans-dir plans/r06 --suffix _before   # plan dump only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # the frozen list


def stage_metrics(ui: str, app: str, after_stage: int) -> list[dict]:
    out = []
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"))
    for s in stages:
        if s["stageId"] <= after_stage:
            continue
        out.append({
            "stage": s["stageId"],
            "name": s.get("name", "")[:90],
            "tasks": s.get("numCompleteTasks"),
            "executorRunTime_s": round(s.get("executorRunTime", 0) / 1000, 2),
            "executorCpuTime_s": round(
                s.get("executorCpuTime", 0) / 1e9, 2),
            "shuffleRead_mb": round(
                s.get("shuffleReadBytes", 0) / 1e6, 2),
            "shuffleWrite_mb": round(
                s.get("shuffleWriteBytes", 0) / 1e6, 2),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
        })
    return sorted(out, key=lambda d: -d["executorRunTime_s"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    ap.add_argument("--queries", default=None,
                    help="comma list; default = full headline")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plans-dir", default=None,
                    help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="",
                    help="plan filename suffix, e.g. _before")
    ap.add_argument("--stages", action="store_true",
                    help="collect per-stage metrics via the UI REST API")
    ap.add_argument("--count", action="store_true",
                    help="time df.count() (bench.py methodology) instead of"
                         " the noop sink")
    args = ap.parse_args()

    from geograypher_spark.session import get_spark
    from geograypher_spark.plans import driver_queries as DQ

    names = (args.queries.split(",") if args.queries else list(HEADLINE))
    extra = {"spark.ui.enabled": "true"} if args.stages else None
    spark = get_spark("bench_extra", master=f"local[{args.cpus}]",
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as _pd

    n_workers = os.cpu_count() or 8
    spark.range(1_000_000).repartition(n_workers).mapInPandas(
        lambda it: (_pd.DataFrame({"n": [len(p)]}) for p in it), "n long"
    ).count()
    spark.read.parquet(f"{args.sf}/region.parquet").count()

    ui = spark.sparkContext.uiWebUrl if args.stages else None
    app = None
    if ui:
        app = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications"))[0]["id"]

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = DQ.QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"plan dumped: {name}", file=sys.stderr)
        if args.trials == 0:
            spark.stop()
            return

    results: dict[str, dict] = {}
    for name in names:
        q = DQ.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        if args.count:
            q(spark, args.sf).count()
        else:
            q(spark, args.sf).write.format("noop").mode("overwrite").save()
        last_stage = -1
        if args.stages:
            stages = json.load(urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages"))
            last_stage = max((s["stageId"] for s in stages), default=-1)
        samples = []
        for t in range(args.trials):
            df = q(spark, args.sf)
            spark.sparkContext.setJobDescription(f"{name}:trial{t}")
            t0 = time.time()
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        entry: dict = {"min": min(samples), "samples": samples}
        if args.stages:
            entry["stages"] = stage_metrics(ui, app, last_stage)
        results[name] = entry
        print(f"{name}: min={entry['min']} samples={samples}",
              file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf": args.sf, "cpus": args.cpus,
                      "mode": "count" if args.count else "noop",
                      "results": results}))


if __name__ == "__main__":
    main()
