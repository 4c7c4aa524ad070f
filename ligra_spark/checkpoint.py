"""Durable iteration checkpoints with lineage + metrics (north_rule).

The reference has no fault tolerance — an in-memory run restarts from
scratch. At 10^12-turn scale a multi-hour iterative job must be
resumable, so the engine writes, per iteration:

- ``iter=NNNNN/state/`` — the per-vertex state DataFrame as parquet
  (Iceberg-ready layout: swap ``format("iceberg")`` on a cluster with a
  catalog; plain parquet in this sandbox).
- ``iter=NNNNN/lineage.json`` — per-partition row counts keyed by
  physical partition id, plus totals: enough to audit which partition
  produced what and to detect partial writes.
- ``metrics.jsonl`` — one line per iteration (frontier size, L1
  residual, wall seconds, …), the durable twin of
  ``IterMetrics`` (ligra.h:490-495's per-round reports).

Write protocol: state parquet first, then lineage.json as the commit
marker — ``resume()`` only trusts iterations whose lineage.json exists,
so a kill mid-write resumes from the previous complete iteration.

Algorithms accept ``checkpointer=Checkpointer(...)``; ``resume()``
returns ``(next_iteration, state_df)`` or None for a fresh run.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Checkpointer:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        run_id: str = "run",
        every: int = 1,
    ) -> None:
        self.spark = spark
        self.root = Path(path) / run_id
        self.every = max(1, every)
        self.root.mkdir(parents=True, exist_ok=True)

    def _iter_dir(self, iteration: int) -> Path:
        return self.root / f"iter={iteration:05d}"

    def save(self, iteration: int, state: DataFrame, metrics: dict | None = None) -> None:
        if iteration % self.every != 0:
            return
        d = self._iter_dir(iteration)
        state_path = str(d / "state")
        state.write.mode("overwrite").parquet(state_path)
        # per-partition lineage of what was just persisted
        written = self.spark.read.parquet(state_path)
        parts = (
            written.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .collect()
        )
        lineage = {
            "iteration": iteration,
            "rows": sum(r["count"] for r in parts),
            "partitions": {str(r["partition"]): r["count"] for r in parts},
            "columns": state.columns,
            "ts": time.time(),
        }
        (d / "lineage.json").write_text(json.dumps(lineage))
        if metrics is not None:
            with open(self.root / "metrics.jsonl", "a") as f:
                f.write(json.dumps({"iteration": iteration, **metrics}) + "\n")

    def completed_iterations(self) -> list[int]:
        out = []
        for d in sorted(self.root.glob("iter=*")):
            if (d / "lineage.json").exists():
                out.append(int(d.name.split("=")[1]))
        return out

    def resume(self) -> tuple[int, DataFrame] | None:
        """(next_iteration, state) from the latest complete checkpoint,
        or None if no complete checkpoint exists."""
        done = self.completed_iterations()
        if not done:
            return None
        last = done[-1]
        df = self.spark.read.parquet(str(self._iter_dir(last) / "state"))
        return last + 1, df

    def metrics(self) -> list[dict]:
        p = self.root / "metrics.jsonl"
        if not p.exists():
            return []
        return [json.loads(line) for line in p.read_text().splitlines() if line]
