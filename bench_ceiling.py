#!/usr/bin/env python
"""Raw-multiprocessing hardware-ceiling probe (no Spark).

Measures what THIS box's shared memory bus + turbo-frequency headroom
physically allow for an N → 4N process scale-up, independent of any
framework, per KERNEL CLASS — because the ceiling is workload-shaped:

- ``compute``: cache-resident matmul chains (default 256² matrices,
  200 iters). Isolates pure frequency/turbo scaling — the ceiling every
  workload pays. This is the highest ceiling.
- ``stream``: STREAM-style triad over a ~48 MB/process working set.
  Isolates shared-bus bandwidth under sequential traffic — the ceiling
  for the chunked barycentric sweeps in ``rasterize_zbuffer`` (full-size
  chunk temporaries streamed once per chunk).
- ``scatter``: gather/compare/scatter of 64k-sample chunks into a 16 MB
  frame buffer (the z-buffer resolve's exact access pattern: lexsort of
  a cache-resident chunk, then random gather + masked scatter on two
  large buffers).

Efficiency per pair = (T_p / T_4p) / 4 with a fixed unit set run
through a Pool at p and 4p taskset-pinned processes. These are the
"hardware ceiling" numbers BENCH/BASELINE.md cites next to the engine's
own scaling efficiencies; render-kernel queries should be read against
the stream/scatter ceilings, not the (higher) compute one (round-3
VERDICT: a matmul-only ceiling overstates what bandwidth-bound kernels
can reach).

Writes BENCH/ceiling.json (read by bench_scaling.py's report generator).

IMPORTANT: run on an otherwise-idle box — any concurrent load
contaminates both this probe and bench_scaling.py.

Usage: python bench_ceiling.py [--pairs 4,16 8,32] [--units 64]
       [--kinds compute stream scatter] [--mat 256] [--iters 200]
(--mat 1200 --iters 3 turns the compute probe into a bandwidth-bound
matmul variant; the dedicated stream/scatter kinds supersede it.)
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
KIND = {kind!r}


def unit_compute(i):
    rng = np.random.default_rng(i)
    a = rng.standard_normal((MAT, MAT))
    b = rng.standard_normal((MAT, MAT))
    s = 0.0
    for _ in range({iters}):
        c = a @ b
        s += float(c[0, 0])
        a = c / np.abs(c).max()
    return s


def unit_stream(i):
    # STREAM triad, ~48 MB working set per process (beyond any per-core
    # cache share at every parallelism level): pure shared-bus bandwidth
    rng = np.random.default_rng(i)
    n = 2_000_000
    a = rng.standard_normal(n)
    b = rng.standard_normal(n)
    c = np.empty(n)
    s = 0.0
    for k in range(60):
        np.multiply(a, 0.5 + (k % 3) * 0.25, out=c)
        c += b
        a, c = c, a
        s += a[k]
    return s


def unit_scatter(i):
    # the z-buffer resolve pattern: chunk-local lexsort (cache-resident)
    # then random gather/compare/scatter against two full-size buffers
    npx = 2_000_000          # ~1440^2 frame
    depth = np.full(npx, np.inf)
    fid = np.full(npx, np.iinfo(np.int64).max, dtype=np.int64)
    s = 0.0
    for c in range(80):
        rng = np.random.default_rng((i << 20) + c)
        pix = rng.integers(0, npx, 65536)
        dep = rng.standard_normal(65536) ** 2
        f = rng.integers(0, 1 << 40, 65536)
        order = np.lexsort((f, dep, pix))
        pix_s = pix[order]
        keep = np.empty(len(pix_s), dtype=bool)
        keep[0] = True
        np.not_equal(pix_s[1:], pix_s[:-1], out=keep[1:])
        pu = pix_s[keep]
        du = dep[order][keep]
        fu = f[order][keep]
        cur = depth[pu]
        win = du < cur
        win |= (du == cur) & (fu < fid[pu])
        pw = pu[win]
        depth[pw] = du[win]
        fid[pw] = fu[win]
        s += float(depth[c])
    return s


UNITS = {{"compute": unit_compute, "stream": unit_stream,
          "scatter": unit_scatter}}

if __name__ == "__main__":
    unit = UNITS[KIND]
    with Pool({p}) as pool:
        # warm-up: fork, numpy import in children, first page faults
        pool.map(unit, range({p}))
        t0 = time.time()
        pool.map(unit, range({units}), chunksize=1)
        print("TIME", time.time() - t0)
"""


def run_level(p: int, units: int, mat: int, iters: int, kind: str) -> float:
    code = _LEVEL_CODE.format(p=p, units=units, mat=mat, iters=iters,
                              kind=kind)
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
    ap.add_argument("--kinds", nargs="*",
                    default=["compute", "stream", "scatter"])
    ap.add_argument("--units", type=int, default=64)
    # cache-resident matrices + long chains → compute-bound (see module
    # docstring for the bandwidth-bound kinds)
    ap.add_argument("--mat", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    # merge with prior recorded runs (per-level min across runs) — the
    # same best-host-state estimator bench_scaling uses for the engine, so
    # ceiling and engine numbers are comparable on this noisy shared host
    prior: dict = {}
    n_runs = 1
    try:
        with open("BENCH/ceiling.json") as fh:
            old = json.load(fh)
        # min-merging timings is only valid when the prior record probed
        # the SAME unit workload (units/mat/iters); a lighter probe's
        # smaller times would otherwise contaminate the record
        if all(old.get(k) == getattr(args, k)
               for k in ("units", "mat", "iters")):
            for kind, entry in old.get("kinds", {}).items():
                for e in entry.get("pairs", []):
                    prior[(kind, e["n"], e["n4"])] = e
            n_runs = old.get("n_runs", 1) + 1
    except (OSError, ValueError):
        pass

    kinds_out: dict = {}
    probed = {tuple(int(x) for x in pair.split(",")) for pair in args.pairs}
    for kind in args.kinds:
        # carry forward recorded pairs that this invocation doesn't
        # re-probe (e.g. `--pairs 2,8` must not drop the 4,16 record)
        pairs_out = [dict(e) for (k, n, n4), e in sorted(prior.items())
                     if k == kind and (n, n4) not in probed]
        for pair in args.pairs:
            n, n4 = (int(x) for x in pair.split(","))
            t_lo = min(run_level(n, args.units, args.mat, args.iters, kind)
                       for _ in range(args.trials))
            t_hi = min(run_level(n4, args.units, args.mat, args.iters, kind)
                       for _ in range(args.trials))
            if (kind, n, n4) in prior:
                t_lo = min(t_lo, prior[(kind, n, n4)]["t_lo"])
                t_hi = min(t_hi, prior[(kind, n, n4)]["t_hi"])
            eff = (t_lo / t_hi) / (n4 / n)
            pairs_out.append({"n": n, "n4": n4, "t_lo": round(t_lo, 3),
                              "t_hi": round(t_hi, 3), "eff": round(eff, 3)})
            print(json.dumps({"kind": kind, **pairs_out[-1]}))
        kinds_out[kind] = {"pairs": pairs_out}

    # kinds recorded earlier but not probed this invocation (e.g.
    # `--kinds compute scatter` must not drop the stream record)
    for kind in sorted({k for (k, _, _) in prior} - set(args.kinds)):
        kinds_out[kind] = {"pairs": [
            dict(e) for (k, n, n4), e in sorted(prior.items()) if k == kind]}

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ceiling.json", "w") as fh:
        json.dump({"probe": "bench_ceiling.py", "units": args.units,
                   "mat": args.mat, "iters": args.iters,
                   "trials": args.trials, "n_runs": n_runs,
                   "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                   "kinds": kinds_out}, fh, indent=2)


if __name__ == "__main__":
    main()
