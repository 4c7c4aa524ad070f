#!/usr/bin/env python
"""Host compute-capacity probe: per-vCPU speed at partial vs full occupancy.

Runs an identical pure-ALU loop (no memory traffic, no BLAS) in P
processes for P in (8, 32) and reports the per-worker wall distribution.
On a shared VM this attributes scaling-efficiency ceilings to the HOST
rather than the engine: if the same instruction stream runs slower on
some vCPUs only when all of them are busy, no task-level engineering can
recover that capacity — the honest maximum strong-scaling efficiency
with perfect load balancing is the harmonic-capacity ratio printed
below, and the straggler-bound (equal-split) maximum is min/max.

Used by BENCH.md to scope the ann_kernel scaling number (the one
compute-saturating Python-kernel query; the north-rule graph queries are
memory-latency-bound and do not hit this ceiling).

Usage: python tools/host_capacity_probe.py [iters]  (prints one JSON line)
"""
from __future__ import annotations

import json
import multiprocessing as mp
import statistics
import sys
import time


def _worker(n: int, q: "mp.Queue") -> None:
    t0 = time.perf_counter()
    x = 1
    for _ in range(n):
        x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
    q.put(time.perf_counter() - t0)


def run(iters: int = 20_000_000) -> dict:
    out: dict = {"iters": iters, "levels": {}}
    base = None
    for p in (8, 32):
        q: "mp.Queue" = mp.Queue()
        procs = [mp.Process(target=_worker, args=(iters, q)) for _ in range(p)]
        for pr in procs:
            pr.start()
        walls = sorted(q.get() for _ in procs)
        for pr in procs:
            pr.join()
        out["levels"][str(p)] = {
            "min": round(walls[0], 3),
            "median": round(statistics.median(walls), 3),
            "max": round(walls[-1], 3),
            "walls": [round(w, 2) for w in walls],
        }
        if p == 8:
            base = statistics.median(walls)
    full = out["levels"]["32"]["walls"]
    # harmonic capacity: with PERFECT load balancing, aggregate
    # throughput at full occupancy = sum of per-core speeds; efficiency
    # vs 4x the 8-busy-core level
    out["capacity_eff_balanced"] = round(sum(base / w for w in full) / 32, 3)
    # equal-split (barrier) ceiling: the slowest worker gates the job
    out["capacity_eff_equal_split"] = round(base / max(full), 3)
    return out


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    print(json.dumps(run(iters)))
