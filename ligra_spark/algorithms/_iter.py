"""Iteration-loop plumbing shared by the fixpoint algorithms.

The reference's driver loop is ``while(!Frontier.isEmpty()) { edgeMap;
... }`` over in-memory arrays (e.g. Components.C:62-67). In Spark each
iteration's DataFrame builds on the previous one, so without lineage
truncation the logical plan (and Catalyst analysis time) grows without
bound. ``materialize`` eagerly computes the iteration's state and cuts
lineage with ``localCheckpoint``; the durable variant in
ligra_spark.checkpoint adds resumable parquet checkpoints + metrics.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def materialize(df: DataFrame, prev: DataFrame | None = None) -> DataFrame:
    """Eagerly compute ``df``, truncate its lineage, release ``prev``."""
    out = df.localCheckpoint(eager=True)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    return out


@dataclass
class IterMetrics:
    """Per-iteration metrics, the analog of the reference driver's
    per-round "Running time" reports (ligra.h:490-495) extended with
    frontier/convergence telemetry (north_rule metrics requirement)."""

    rounds: list[dict] = field(default_factory=list)

    def record(self, iteration: int, **kv) -> None:
        self.rounds.append({"iteration": iteration, **kv})

    @property
    def iterations(self) -> int:
        return len(self.rounds)


class Timer:
    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        t = time.perf_counter()
        dt, self.t0 = t - self.t0, t
        return dt
