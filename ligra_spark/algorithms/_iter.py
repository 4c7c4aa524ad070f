"""Iteration-loop plumbing shared by the fixpoint algorithms.

The reference's driver loop is ``while(!Frontier.isEmpty()) { edgeMap;
... }`` over in-memory arrays (e.g. Components.C:62-67). In Spark each
iteration's DataFrame builds on the previous one, so without lineage
truncation the logical plan (and Catalyst analysis time) grows without
bound. ``materialize`` eagerly computes the iteration's state and cuts
lineage with ``localCheckpoint``.

**Statistics-blowup pitfall** (found empirically, a Spark-core
behavior): ``Dataset.localCheckpoint`` carries the *original plan's*
Catalyst statistics into the checkpointed ``LogicalRDD``. Joins
multiply child ``sizeInBytes`` (BigInt), so an iterative loop compounds
the estimate round over round — and any self-join (e.g. the
pointer-jumping shortcut in components.py) *squares* it, making the
BigInt's digit count grow exponentially. By round ~20 the driver spends
minutes inside ``BigInteger.multiply`` while the executors sit idle.
``materialize`` therefore rebuilds the DataFrame over the checkpointed
RDD via ``internalCreateDataFrame``, which resets statistics to the
session default; a plain ``localCheckpoint`` fallback guards against
the private API moving.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def materialize(df: DataFrame, prev: DataFrame | None = None) -> DataFrame:
    """Eagerly compute ``df``, truncate lineage, reset plan statistics;
    release ``prev``'s checkpointed blocks (pass the previous
    iteration's *materialized* state)."""
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        jspark = df.sparkSession._jsparkSession
        fresh = jspark.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        out = DataFrame(fresh, df.sparkSession)
    except Exception:
        out = ck
    out._ligra_ckpt = ck  # handle for unpersisting the real cached RDD
    if prev is not None:
        unpersist(prev)
    return out


def unpersist(df: DataFrame) -> None:
    """Unpersist a ``materialize`` result (or any cached DF) safely."""
    target = getattr(df, "_ligra_ckpt", df)
    try:
        target.unpersist()
    except Exception:
        pass


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
