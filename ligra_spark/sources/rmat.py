"""Deterministic R-MAT graph generator.

The reference ships ``utils/rMatGraph.C`` (recursive-matrix generator,
a=.5 b=.1 c=.1 d=.3 defaults, deterministic from a seed via hashInt
streams, rMatGraph.C:33-90). Reimplemented here vectorized in numpy —
same distributional model (Chakrabarti et al., SDM'04), not a code
port — to provide skewed, triangle-rich synthetic graphs for benches
and tests at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def rmat_edges(
    log_n: int,
    m: int,
    seed: int = 42,
    a: float = 0.5,
    b: float = 0.1,
    c: float = 0.1,
) -> np.ndarray:
    """(m, 2) int64 edge array over n=2^log_n vertices."""
    rng = np.random.default_rng(seed)
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    for level in range(log_n):
        r = rng.random(m)
        # quadrant choice: a | b | c | d
        in_b = (r >= a) & (r < a + b)
        in_c = (r >= a + b) & (r < a + b + c)
        in_d = r >= a + b + c
        bit = np.int64(1) << np.int64(log_n - 1 - level)
        dst += np.where(in_b | in_d, bit, 0)
        src += np.where(in_c | in_d, bit, 0)
    return np.stack([src, dst], axis=1)


def rmat_graph_df(
    spark: SparkSession,
    log_n: int,
    m: int,
    seed: int = 42,
    distributed: bool | None = None,
) -> DataFrame:
    """R-MAT edges DataFrame; generates distributed (``mapInPandas``
    over edge-count ranges, per-partition seeded streams) above 2M
    edges — the scale path for 10^8+-edge bench graphs."""
    if distributed is None:
        distributed = m > 2_000_000
    if not distributed:
        e = rmat_edges(log_n, m, seed)
        return spark.createDataFrame(
            pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})
        )

    parts = max(8, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))

    def gen(batches):
        for pdf in batches:
            pids = pdf["id"].to_numpy()
            count = len(pids)
            e = rmat_edges(log_n, count, seed=seed + int(pids[0]))
            yield pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})

    return spark.range(0, m, 1, parts).mapInPandas(gen, "src long, dst long")
