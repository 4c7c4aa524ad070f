"""Radii — graph eccentricity estimation via k simultaneous BFS.

Reference: apps/Radii.C — samples 64 start vertices (hashInt,
Radii.C:84-89), gives each a bit in a per-vertex 64-bit ``Visited``
mask, and OR-propagates masks along edges (writeOr, Radii.C:27-32);
a vertex's radius estimate is the last round in which its mask changed
(Radii.C:34-59). The same multi-source bitmask machinery underlies the
eccentricity app family (kBFS-Ecc, FM-Ecc, LogLog-Ecc).

Spark realization: the mask is a LONG column, the OR-merge is the
``bit_or`` combiner — the cleanest demonstration that ``edge_map``'s
combiner set covers the reference's writeOr algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ligra_spark.algorithms._iter import IterMetrics, Timer, materialize
from ligra_spark.graph import Graph
from ligra_spark.operators.edge_map import edge_map


def radii(
    graph: Graph,
    k: int = 64,
    seed: int = 42,
    symmetrize: bool = True,
    max_iters: int = 1000,
    metrics: IterMetrics | None = None,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(id, radius INT)`` — per-vertex eccentricity estimate
    (lower bound from k sampled BFS sources; exact over the given set
    when ``sources`` is passed explicitly, ≤64 ids)."""
    g = graph.symmetrized() if symmetrize and not graph.symmetric else graph

    # sample k start vertices deterministically by hash rank
    # (Radii.C:84-89 samples via hashInt over vertex ids)
    base = (
        sources.select("id")
        if sources is not None
        else g.vertices.orderBy(F.xxhash64(F.col("id") + F.lit(seed))).limit(k)
    )
    sample = base.withColumn(
        "bit",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), "
            "CAST(row_number() OVER (ORDER BY id) - 1 AS INT))"
        ),
    )
    state = g.vertices.join(sample.select("id", "bit"), "id", "left").select(
        "id",
        F.coalesce("bit", F.lit(0)).alias("mask"),
        F.when(F.col("bit").isNotNull(), 0).otherwise(F.lit(-1)).alias("radius"),
    )
    state = materialize(state)
    frontier = state.where(F.col("mask") != 0).select("id", "mask")
    frontier_n = frontier.count()

    timer = Timer()
    for it in range(max_iters):
        if frontier_n == 0:
            break
        msgs = edge_map(
            g,
            frontier,
            message=F.col("mask"),
            combiner="bit_or",
            frontier_size=frontier_n,
        )
        nxt = state.join(msgs, "id", "left").select(
            "id",
            "mask",
            "radius",
            (F.col("mask").bitwiseOR(F.coalesce("msg", F.lit(0)))).alias("mask_new"),
        )
        nxt = materialize(nxt, state)
        frontier = nxt.where(F.col("mask_new") != F.col("mask")).select(
            "id", F.col("mask_new").alias("mask")
        )
        frontier_n = frontier.count()
        state = nxt.select(
            "id",
            F.col("mask_new").alias("mask"),
            F.when(F.col("mask_new") != F.col("mask"), F.lit(it + 1))
            .otherwise(F.col("radius"))
            .alias("radius"),
        )
        state._ligra_ckpt = getattr(nxt, "_ligra_ckpt", nxt)
        if metrics is not None:
            metrics.record(it, frontier=frontier_n, wall_s=timer.lap())
    return state.select("id", "radius")


def kbfs_exact(
    graph: Graph,
    batch: int = 64,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """Exact per-vertex eccentricity (apps/eccentricity/kBFS-Exact.C):
    run the 64-bit multi-BFS over EVERY vertex in ``ceil(n/64)``
    batches and take the per-vertex max radius across batches.

    O(n/64) full propagations — the reference's exact variant has the
    same asymptotics; use ``radii`` (sampled) or ``fm_ecc`` (sketch) at
    scale. Returns ``(id, radius INT)`` over the symmetrized graph."""
    from math import ceil

    from pyspark.sql import Window

    from ligra_spark.algorithms._iter import materialize

    g = graph.symmetrized() if not graph.symmetric else graph
    n = g.n
    # deterministic batches by id rank (single-partition window — exact
    # eccentricity is a small/medium-graph operation by nature)
    verts = materialize(
        g.vertices.withColumn(
            "batch",
            ((F.row_number().over(Window.orderBy("id")) - 1) / batch).cast("long"),
        )
    )
    ecc = g.vertices.select("id", F.lit(-1).alias("radius"))
    for b in range(ceil(n / batch)):
        srcs = verts.where(F.col("batch") == b).select("id")
        part = radii(g, symmetrize=False, metrics=metrics, sources=srcs)
        ecc = materialize(
            ecc.join(part.withColumnRenamed("radius", "r2"), "id", "left").select(
                "id",
                F.greatest("radius", F.coalesce("r2", F.lit(-1))).alias("radius"),
            ),
            ecc if b > 0 else None,
        )
    return ecc
