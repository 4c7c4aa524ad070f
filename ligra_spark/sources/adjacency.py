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


def parse_binary_graph(
    prefix: str, weighted: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Reader for the reference's binary format (IO.h:318-371): three
    files ``<prefix>.config`` (text: n), ``<prefix>.adj`` (uint32 edge
    targets, weighted files interleave m targets then m int32 weights)
    and ``<prefix>.idx`` (int64 per-vertex CSR offsets). Returns
    (src, dst, w|None)."""
    with open(prefix + ".config") as f:
        n = int(f.read().split()[0])
    adj = np.fromfile(prefix + ".adj", dtype=np.uint32)
    offsets = np.fromfile(prefix + ".idx", dtype=np.int64)
    if len(offsets) != n:
        raise ValueError(
            f"{prefix}.idx holds {len(offsets)} offsets, .config says n={n}"
        )
    if weighted:
        m = len(adj) // 2
        targets = adj[:m].astype(np.int64)
        weights = adj[m:].view(np.int32)[::1][:m].astype(np.float64)
    else:
        m = len(adj)
        targets = adj.astype(np.int64)
        weights = None
    degrees = np.diff(np.append(offsets, m))
    src = np.repeat(np.arange(n, dtype=np.int64), degrees)
    return src, targets, weights


def write_binary_graph(prefix: str, src, dst, w=None, n: int | None = None) -> None:
    """Inverse of parse_binary_graph — used to round-trip fixtures (the
    reference writes this format with utils/SNAPtoAdj + hyperutils)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    counts = np.bincount(src, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    with open(prefix + ".config", "w") as f:
        f.write(f"{n}\n")
    if w is not None:
        ww = np.asarray(w)[order].astype(np.int32).view(np.uint32)
        np.concatenate([dst.astype(np.uint32), ww]).tofile(prefix + ".adj")
    else:
        dst.astype(np.uint32).tofile(prefix + ".adj")
    offsets.tofile(prefix + ".idx")


def read_binary_graph(
    spark: SparkSession, prefix: str, weighted: bool = False
) -> DataFrame:
    """Binary ``.config/.adj/.idx`` graph → edges DataFrame
    (src, dst [, w])."""
    src, dst, w = parse_binary_graph(prefix, weighted)
    data = {"src": src, "dst": dst}
    if w is not None:
        data["w"] = w
    return spark.createDataFrame(pd.DataFrame(data))


def read_snap_graph(
    spark: SparkSession, path: str, weighted: bool = False
) -> DataFrame:
    """SNAP edge-list text reader (the utils/SNAPtoAdj.C input format):
    one ``src dst [w]`` pair per line, ``#`` comments. Reads
    distributed via spark.read.text — at 100 TB this is a plain
    line-parallel scan with the regex split pushed into codegen."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path).where(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    toks = F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ")
    cols = [
        toks.getItem(0).cast("long").alias("src"),
        toks.getItem(1).cast("long").alias("dst"),
    ]
    if weighted:
        cols.append(toks.getItem(2).cast("double").alias("w"))
    return lines.select(*cols)
