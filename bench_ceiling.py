#!/usr/bin/env python
"""Raw-multiprocessing hardware-ceiling probe (no Spark).

Measures what THIS box's shared memory bus + turbo-frequency headroom
physically allow for an N → 4N process scale-up, independent of any
framework: a fixed set of 64 single-threaded numpy matmul units is run
through a multiprocessing Pool at p and 4p taskset-pinned processes, and
efficiency = (T_p / T_4p) / 4. These are the "hardware ceiling" numbers
BENCH/BASELINE.md cites next to the engine's own scaling efficiencies
(ADVICE r2: the constants must be reproducible from the repo).

Writes BENCH/ceiling.json (read by bench_scaling.py's report generator).

IMPORTANT: run on an otherwise-idle box — any concurrent load contaminates
both this probe and bench_scaling.py.

Usage: python bench_ceiling.py [--pairs 4,16 8,32] [--units 64] [--mat 1200]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_LEVEL_CODE = """
import os
os.environ["OPENBLAS_NUM_THREADS"] = "1"
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["MKL_NUM_THREADS"] = "1"
import sys, time
import numpy as np
from multiprocessing import Pool

MAT = {mat}

def unit(i):
    rng = np.random.default_rng(i)
    a = rng.standard_normal((MAT, MAT))
    b = rng.standard_normal((MAT, MAT))
    s = 0.0
    for _ in range({iters}):
        c = a @ b
        s += float(c[0, 0])
        a = c / np.abs(c).max()
    return s

if __name__ == "__main__":
    with Pool({p}) as pool:
        # warm-up: fork, numpy import in children, first page faults
        pool.map(unit, range({p}))
        t0 = time.time()
        pool.map(unit, range({units}), chunksize=1)
        print("TIME", time.time() - t0)
"""


def run_level(p: int, units: int, mat: int, iters: int = 200) -> float:
    code = _LEVEL_CODE.format(p=p, units=units, mat=mat, iters=iters)
    cmd = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset") or os.path.exists("/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{p - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True)
    for line in proc.stdout.splitlines():
        if line.startswith("TIME "):
            return float(line.split()[1])
    raise RuntimeError(f"probe failed at p={p}:\n{proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", nargs="*", default=["4,16", "8,32"])
    ap.add_argument("--units", type=int, default=64)
    # cache-resident matrices + long chains → compute-bound: isolates the
    # frequency/turbo scaling every workload pays (a bandwidth-bound probe
    # (e.g. --mat 1200 --iters 3) measures a LOWER, workload-specific
    # ceiling that less bandwidth-hungry operators can legitimately beat)
    ap.add_argument("--mat", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    # merge with prior recorded runs (per-level min across runs) — the
    # same best-host-state estimator bench_scaling uses for the engine, so
    # ceiling and engine numbers are comparable on this noisy shared host
    prior = {}
    n_runs = 1
    try:
        with open("BENCH/ceiling.json") as fh:
            old = json.load(fh)
        prior = {(e["n"], e["n4"]): e for e in old.get("pairs", [])}
        n_runs = old.get("n_runs", 1) + 1
    except (OSError, ValueError):
        pass

    pairs_out = []
    for pair in args.pairs:
        n, n4 = (int(x) for x in pair.split(","))
        t_lo = min(run_level(n, args.units, args.mat, args.iters)
                   for _ in range(args.trials))
        t_hi = min(run_level(n4, args.units, args.mat, args.iters)
                   for _ in range(args.trials))
        if (n, n4) in prior:
            t_lo = min(t_lo, prior[(n, n4)]["t_lo"])
            t_hi = min(t_hi, prior[(n, n4)]["t_hi"])
        eff = (t_lo / t_hi) / (n4 / n)
        pairs_out.append({"n": n, "n4": n4, "t_lo": round(t_lo, 3),
                          "t_hi": round(t_hi, 3), "eff": round(eff, 3)})
        print(json.dumps(pairs_out[-1]))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ceiling.json", "w") as fh:
        json.dump({"probe": "bench_ceiling.py", "units": args.units,
                   "mat": args.mat, "iters": args.iters,
                   "trials": args.trials, "n_runs": n_runs,
                   "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                   "pairs": pairs_out}, fh, indent=2)


if __name__ == "__main__":
    main()
