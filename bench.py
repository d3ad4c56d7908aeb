#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline engine queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with a noop sink so results stay distributed (no
collect): the timed number is the full plan — scan → joins → Arrow kernels
→ aggregation — not driver materialization.

Round-over-round comparability notes (r1 → r2):
- visibility_zbuffer now renders the ANALYTIC 20k-face mesh (oracle-gated;
  4.4× more output rows than r1's scene fixture) with the sub-camera
  split path — a bigger workload, not a regression.
- dedup_jaccard now runs with the df_cap skew guard on (one extra
  shingle-key shuffle, correctness-gated against the oracle).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "points_in_polygons",   # cell join + exact PIP refine (J2)
    "label_polygons",       # + weighted-area argmax (A5+W1)
    "tile_argmax",          # tile assignment + per-tile argmax (A10)
    "knn",                  # cell-ring kNN join (J7)
    "proximity_edges",      # distance theta-join (J8)
    "visibility_zbuffer",   # z-buffer visibility join (J1, scene fixture)
    "dedup_jaccard",        # n-gram Jaccard dedup
    "minhash_signatures",   # MinHash signatures
    "ann_lsh",              # hyperplane-LSH cosine top-k (the scale path;
                            # ann_cosine brute force stays in the
                            # correctness contract, not the headline)
    "doc_roundtrip",        # span explode + reassemble
    # §3 pipeline COMPOSITIONS (r4): track stage-join/checkpoint overhead
    # round-over-round, not just the component queries
    "forward_pipeline",     # label transfer end to end (§3.1)
    "render_labels",        # reverse render pipeline end to end (§3.2)
]


def run(sf_dir: str, cpus: str, shuffle_partitions: int | None = None) -> dict:
    from geograypher_spark.session import get_spark
    from geograypher_spark.plans import driver_queries as DQ

    spark = get_spark(
        "bench", master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warmup: python workers + codegen + a first parquet touch so
    # the first measured query doesn't absorb session spin-up
    import pandas as _pd

    n_workers = os.cpu_count() or 8
    spark.range(1_000_000).repartition(n_workers).mapInPandas(
        lambda it: (_pd.DataFrame({"n": [len(p)]}) for p in it), "n long"
    ).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        q = DQ.QUERIES[name]
        # per-query untimed warmup, then MIN OF 3 timed trials on REBUILT
        # plans: whole-stage codegen compiles once per generated class
        # (janino dominates a cold first run by seconds) — a long-running
        # engine amortizes that constant, so steady-state is the
        # meaningful throughput number. Min-of-3 mirrors bench_scaling's
        # trial rule: this box's per-core speed swings ±15-20% between
        # runs, and a single sample cannot separate engine changes from
        # host noise (round-4 drift was unarbitrable for exactly this
        # reason). Rebuilding the DataFrame per trial prevents
        # shuffle-file reuse from skipping real stages.
        q(spark, sf_dir).count()
        best, n = None, 0
        for _ in range(3):
            df = q(spark, sf_dir)
            t0 = time.time()
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        rows[name] = n
    spark.stop()
    return {"timings": timings, "rows": rows}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    res = run(sf_dir, cpus)
    total = round(sum(res["timings"].values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # the two §3 composition entries were added to the headline in r4 —
    # report the 10-query common core alongside the full total so
    # round-over-round deltas stay comparable across that definition change
    core = [q for q in HEADLINE
            if q not in ("forward_pipeline", "render_labels")]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "protocol": "min-of-3 steady-state (per-query warmup, plan rebuilt per trial)",
        "common_core_total": round(
            sum(res["timings"][q] for q in core), 3),
        "queries": res["timings"],
        "rows": res["rows"],
        "sf": sf_val,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
