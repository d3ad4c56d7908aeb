#!/usr/bin/env python
"""Stage-level breakdown of one scale query at a given parallelism."""
import json, os, sys, time
import urllib.request
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from geograypher_spark.session import get_spark
from geograypher_spark.plans.scale_queries import SCALE_QUERIES

q = sys.argv[1]
cpus = int(sys.argv[2])
spark = get_spark("probe", master=f"local[{cpus}]",
                  shuffle_partitions=max(8, cpus * 2),
                  extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
import pandas as _pd
spark.range(10_000_000).repartition(cpus).mapInPandas(
    lambda it: (_pd.DataFrame({"n": [len(p)]}) for p in it), "n long").count()
# warmup pass like the bench
SCALE_QUERIES[q](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
tracker = spark.sparkContext.statusTracker()
base_stages = set()
ui = spark.sparkContext.uiWebUrl
app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
for s in json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages")):
    base_stages.add(s["stageId"])
df = SCALE_QUERIES[q](spark, "/root/testdata/sf0.1")
t0 = time.time()
df.write.format("noop").mode("overwrite").save()
wall = time.time() - t0
print(f"WALL {wall:.2f}s at local[{cpus}]")
stages = json.load(urllib.request.urlopen(
    f"{ui}/api/v1/applications/{app}/stages?status=complete&withSummaries=true"))
tot_cpu = 0
for s in sorted(stages, key=lambda s: s["stageId"]):
    if s["stageId"] in base_stages:
        continue
    ms = s.get("executorRunTime", 0)
    tot_cpu += ms
    sub = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}?withSummaries=true"))
    qts = []
    for d in sub:
        m = d.get("taskMetricsDistributions") or {}
        if m:
            qts = [round(x) for x in m.get("executorRunTime", [])]
    print(json.dumps({
        "stage": s["stageId"], "tasks": s["numCompleteTasks"],
        "run_s": round(ms / 1e3, 1),
        "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
        "shufR": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
        "shufW": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        "task_q_ms": qts}))
print(f"total executorRunTime {tot_cpu/1e3:.1f}s  ideal wall {tot_cpu/1e3/cpus:.1f}s  actual {wall:.1f}s")
spark.stop()
