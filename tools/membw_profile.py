#!/usr/bin/env python
"""Memory-bandwidth ceiling probe (the scaling-efficiency evidence
demanded by VERDICT r02 item 4: "a written profile proving the
single-box shuffle-IO ceiling").

Runs the same random-gather/scatter numpy workload — the access pattern
of the CC kernel, every shuffle hash-exchange, and every hash
aggregation — in N independent processes (no shared state, no Spark,
no GIL) and reports per-task wall time. On a machine with N truly
independent cores the per-task time would be flat; on this sandbox the
per-task time inflates ~10× from 1 → 32 processes, i.e. the box's
shared memory system saturates at ~4-8 concurrent random-access
streams. Any workload dominated by random 8-byte gathers (shuffle
reads, hash probes, label lookups) therefore cannot exhibit 0.8
scaling efficiency from 8 → 32 LOCAL cores regardless of algorithm —
the cores share one memory system. A real N → 4N *executor* scale-out
(the north_rule's actual criterion) multiplies memory systems along
with cores, which local mode cannot emulate.

Prints one JSON line with per-level stats; cite from BENCH.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

N_IDS = 1_000_000
N_OPS = 2_000_000
# per-task work must dwarf scheduler noise on a shared VM: at REPS=5 a
# task is ~0.1s and a single steal burst inverts the 16-vs-32 ordering
# (observed in one r04 capture); REPS=20 (~0.4s/task) + best-of-PASSES
# per level keeps the probe under a minute while making the ceiling
# curve reproducibly monotonic. Successive r04 captures still varied
# ~2x at the 16/32 levels, so the quotable profile is taken with
# MEMBW_REPS=80 / MEMBW_PASSES=5 (~1.5s tasks, ~5 min total) — long
# enough that one steal burst cannot dominate any (level, pass) cell.
REPS = int(os.environ.get("MEMBW_REPS", "20"))
PASSES = int(os.environ.get("MEMBW_PASSES", "3"))


def _burn(_):
    rng = np.random.default_rng(1)
    a = rng.integers(0, N_IDS, N_OPS)
    lab = np.arange(N_IDS)
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.minimum.at(lab, a[: N_IDS], lab[a[N_IDS:]])
    return time.perf_counter() - t0


def _level(n: int) -> tuple[float, list[float]]:
    with mp.Pool(n) as p:
        t0 = time.perf_counter()
        r = p.map(_burn, range(n))
        wall = time.perf_counter() - t0
    return wall, r


def main() -> None:
    out = {"workload": "np.minimum.at random gather/scatter, independent procs"}
    # PASSES full sweeps, keep the best (lowest-wall) observation per
    # level: a noise burst then costs one pass, not the whole profile
    best: dict[int, tuple[float, list[float]]] = {}
    for _ in range(PASSES):
        for n in (1, 2, 4, 8, 16, 32):
            wall, r = _level(n)
            if n not in best or wall < best[n][0]:
                best[n] = (wall, r)
    for n, (wall, r) in best.items():
        out[f"procs_{n}"] = {
            "wall_s": round(wall, 3),
            "task_min_s": round(min(r), 3),
            "task_max_s": round(max(r), 3),
            "task_mean_s": round(sum(r) / len(r), 3),
        }
    base = out["procs_1"]["task_mean_s"]
    # aggregate random-access throughput vs 1 proc — the number the
    # BENCH ceiling tables quote: n tasks / wall_n, normalized by
    # 1 task / wall_1 (so a perfectly scaling box reads n)
    wall1 = out["procs_1"]["wall_s"]
    out["aggregate_x"] = {
        str(n): round(n * wall1 / out[f"procs_{n}"]["wall_s"], 2)
        for n in (1, 2, 4, 8, 16, 32)
    }
    out["per_task_slowdown_at_32"] = round(
        out["procs_32"]["task_mean_s"] / base, 2
    )
    out["effective_parallel_capacity_at_32"] = round(
        32 * base / out["procs_32"]["wall_s"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
