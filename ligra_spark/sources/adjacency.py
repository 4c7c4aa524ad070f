"""Reader for the PBBS AdjacencyGraph text format.

Format (reference README.md:142-176): a magic line
(``AdjacencyGraph`` / ``WeightedAdjacencyGraph``), then ``n``, ``m``,
``n`` CSR offsets, ``m`` edge targets, and (weighted) ``m`` weights —
one token per line. Used only to load the shipped golden fixtures
(``inputs/rMatGraph_J_5_100``, n=128 m=708) for parity tests; production
input is parquet/Iceberg.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def parse_adjacency_file(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Returns (src, dst, w|None) int64/float64 numpy arrays."""
    with open(path) as f:
        magic = f.readline().strip()
        weighted = magic == "WeightedAdjacencyGraph"
        if not weighted and magic != "AdjacencyGraph":
            raise ValueError(f"unrecognized magic line {magic!r} in {path}")
        tokens = np.loadtxt(f, dtype=np.float64)
    n = int(tokens[0])
    m = int(tokens[1])
    offsets = tokens[2 : 2 + n].astype(np.int64)
    targets = tokens[2 + n : 2 + n + m].astype(np.int64)
    weights = tokens[2 + n + m : 2 + n + 2 * m] if weighted else None
    degrees = np.diff(np.append(offsets, m))
    src = np.repeat(np.arange(n, dtype=np.int64), degrees)
    return src, targets, weights


def read_adjacency_graph(spark: SparkSession, path: str) -> DataFrame:
    """AdjacencyGraph file → edges DataFrame (src, dst [, w])."""
    src, dst, w = parse_adjacency_file(path)
    data = {"src": src, "dst": dst}
    if w is not None:
        data["w"] = w
    return spark.createDataFrame(pd.DataFrame(data))
