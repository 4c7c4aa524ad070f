"""Eccentricity estimation — the FM/LogLog sketch family.

Reference: apps/eccentricity/ (9 apps). The sketch core implemented
here:

- ``fm_ecc`` (FM-Ecc.C:93-137): every vertex holds ``counters``
  Flajolet-Martin registers, each initialized to a single geometric
  bit ``h & -h`` (the reference's ``1 << log2(rand & -rand)``,
  FM-Ecc.C:110-113). Every round each vertex ORs in its in-neighbors'
  registers (Ecc_F update, FM-Ecc.C:48-56 — a bitwise-or writeOr);
  ``ecc[v]`` is the last round v's sketch changed. At fixpoint the
  sketch of v is the OR over all vertices within distance r, so the
  estimate is a deterministic LOWER bound of the true eccentricity,
  equal whp as ``counters`` grows.
- ``loglog_ecc`` (LogLog-Ecc.C): identical propagation with
  HyperLogLog-style registers (position of the lowest set bit) merged
  by MAX instead of OR.

Spark realization mirrors the engine's other sketch columns (MinHash
slots, Radii bitmasks): state is ``(id, slot, reg)`` rows; one round =
frontier ⋈ edges → ``groupBy(dst, slot).agg(bit_or|max)`` — the
composite-key form of edgeMapReduce, partial-aggregated map-side. The
frontier (vertices whose sketch changed) shrinks like the reference's,
so late rounds are cheap.

kBFS-Ecc's exact-bitmask core is ``algorithms.radii``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ligra_spark.algorithms._iter import IterMetrics, Timer, materialize
from ligra_spark.graph import Graph


def _sketch_ecc(
    graph: Graph,
    counters: int,
    seed: int,
    init_reg,
    merge: str,
    symmetrize: bool,
    max_iters: int,
    metrics: IterMetrics | None,
) -> DataFrame:
    g = graph.symmetrized() if symmetrize and not graph.symmetric else graph
    agg = F.bit_or if merge == "bit_or" else F.max

    slot = F.explode(F.sequence(F.lit(0), F.lit(counters - 1))).alias("slot")
    sketch = materialize(
        g.vertices.select("id", slot).select("id", "slot", init_reg.alias("reg"))
    )
    ecc = g.vertices.select("id", F.lit(0).alias("ecc"))
    frontier_ids = g.vertices
    frontier_n = g.n

    timer = Timer()
    for it in range(max_iters):
        if frontier_n == 0:
            break
        fr = (
            sketch.join(frontier_ids, "id", "left_semi")
            .withColumnRenamed("id", "src")
        )
        msgs = (
            g.edges_by_src.join(fr, "src")
            .groupBy(F.col("dst").alias("id"), "slot")
            .agg(agg("reg").alias("msg"))
        )
        nxt = sketch.join(msgs, ["id", "slot"], "left").select(
            "id",
            "slot",
            "reg",
            (
                F.col("reg").bitwiseOR(F.coalesce("msg", F.lit(0)))
                if merge == "bit_or"
                else F.greatest("reg", F.coalesce("msg", F.lit(0)))
            ).alias("reg_new"),
        )
        nxt = materialize(nxt, sketch)
        changed = nxt.where(F.col("reg_new") != F.col("reg")).select("id").distinct()
        changed = materialize(changed, frontier_ids if it > 0 else None)
        frontier_n = changed.count()
        ecc = ecc.join(changed.withColumn("_c", F.lit(1)), "id", "left").select(
            "id",
            F.when(F.col("_c").isNotNull(), F.lit(it + 1))
            .otherwise(F.col("ecc"))
            .alias("ecc"),
        )
        ecc = materialize(ecc)
        sketch = nxt.select("id", "slot", F.col("reg_new").alias("reg"))
        sketch._ligra_ckpt = getattr(nxt, "_ligra_ckpt", nxt)
        frontier_ids = changed
        if metrics is not None:
            metrics.record(it, frontier=frontier_n, wall_s=timer.lap())
    return ecc.select("id", F.col("ecc").cast("int").alias("ecc"))


def fm_ecc(
    graph: Graph,
    counters: int = 8,
    seed: int = 42,
    symmetrize: bool = True,
    max_iters: int = 1000,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """``(id, ecc INT)`` — Flajolet-Martin eccentricity estimate (a
    deterministic lower bound; exact whp for large ``counters``)."""
    h = F.abs(F.xxhash64(F.col("id") * counters + F.col("slot") + F.lit(seed)))
    # lowest set bit of h == the reference's 1 << log2(h & -h)
    init = F.when(h == 0, F.lit(1)).otherwise(
        h.bitwiseAND(-h)
    )
    return _sketch_ecc(
        graph, counters, seed, init, "bit_or", symmetrize, max_iters, metrics
    )


def loglog_ecc(
    graph: Graph,
    counters: int = 8,
    seed: int = 42,
    symmetrize: bool = True,
    max_iters: int = 1000,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """``(id, ecc INT)`` — LogLog-Ecc.C variant: registers hold the
    geometric rank (lowest-set-bit position) and merge by MAX."""
    h = F.abs(F.xxhash64(F.col("id") * counters + F.col("slot") + F.lit(seed)))
    lowest = F.when(h == 0, F.lit(1)).otherwise(h.bitwiseAND(-h))
    # log2 of a power of two = bit position = HLL rank
    init = F.log2(lowest.cast("double")).cast("long")
    return _sketch_ecc(
        graph, counters, seed, init, "max", symmetrize, max_iters, metrics
    )


def simple_approx_ecc(
    graph: Graph,
    symmetrize: bool = True,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """``(id, ecc INT)`` — Simple-Approx-Ecc.C:74-159: per connected
    component run ONE BFS and assign every member the BFS depth (a
    2-approximation; size-2 components get 1, singletons 0). The
    reference picks a random source per component (rand(),
    Simple-Approx-Ecc.C:133); we pick the component's min vertex id —
    deterministic, same guarantee. Spark-first: one multi-source BFS
    from all component roots at once (per-component sources cannot
    collide across components), then depth = max dist per component —
    one fixpoint instead of a per-component loop."""
    from ligra_spark.algorithms.bfs import bfs
    from ligra_spark.algorithms.components import connected_components

    g = graph.symmetrized() if symmetrize and not graph.symmetric else graph
    comps = materialize(connected_components(g, symmetrize=False))
    roots = comps.where(F.col("id") == F.col("comp")).select("id")
    dists = bfs(g, roots, metrics=metrics).select("id", "dist")
    depth = (
        comps.join(dists, "id")
        .groupBy("comp")
        .agg(F.max("dist").alias("depth"))
    )
    return comps.join(depth, "comp").select(
        "id", F.col("depth").cast("int").alias("ecc")
    )
