"""Collaborative filtering — gradient-descent matrix factorization.

Reference: apps/CF.C:32-138 — per iteration, every vertex d pulls from
each neighbor s the residual-weighted latent vector
``ngh_latent · (w - <latent_d, latent_s>)`` (CF_Edge_F:40-56), then
applies ``latent += step * (-lambda * latent + error)``
(CF_Vertex_F:64-73). Latent vectors start at 0.5 (or hash-random with
``-randInit``); the input is the symmetric bipartite ratings graph.

Spark realization: the K-dim latent state is one ``array<double>``
column. One iteration is a single dataflow —

  edges ⋈ latent(src) ⋈ latent(dst)
        → err = w − zip_with·aggregate dot product        (per edge)
        → groupBy(dst).agg(array(sum(contrib[0]), …))     (K sums)
        → columnar latent update                          (vertexMap)

The per-component sums are K ordinary JVM aggregate expressions over
array slots (partial-aggregated map-side like every other combiner
here); no Python, no explode — the K-factor stays columnar, which is
what the reference's flat ``double[K*n]`` layout amounts to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ligra_spark.algorithms._iter import IterMetrics, Timer, materialize
from ligra_spark.graph import Graph


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cf(
    graph: Graph,
    k: int = 20,
    num_iters: int = 5,
    step: float = 3.5e-7,
    lam: float = 0.001,
    rand_init: bool = False,
    seed: int = 42,
    symmetrize: bool = True,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """Returns ``(id, latent ARRAY<DOUBLE>)`` after ``num_iters`` rounds
    of batch gradient descent (CF.C defaults: K=20, 5 iters,
    step=3.5e-7, lambda=1e-3, init 0.5)."""
    if not graph.weighted:
        raise ValueError("cf requires a weighted ratings graph (w column)")
    g = graph.symmetrized() if symmetrize and not graph.symmetric else graph

    if rand_init:
        # deterministic hash stream in [0, 1) — the -randInit analog
        init = F.array(
            *[
                (
                    F.abs(F.xxhash64(F.col("id") * k + F.lit(j + seed)))
                    / F.lit(float(2**63))
                )
                for j in range(k)
            ]
        )
    else:
        init = F.array(*[F.lit(0.5) for _ in range(k)])
    state = materialize(g.vertices.select("id", init.alias("latent")))

    timer = Timer()
    for it in range(num_iters):
        lat_s = state.select(
            F.col("id").alias("src"), F.col("latent").alias("lat_s")
        )
        lat_d = state.select(
            F.col("id").alias("dst"), F.col("latent").alias("lat_d")
        )
        err_edges = (
            g.edges_by_src.join(lat_s, "src")
            .join(lat_d, "dst")
            .withColumn("err", F.col("w") - _dot(F.col("lat_s"), F.col("lat_d")))
        )
        grad = err_edges.groupBy(F.col("dst").alias("id")).agg(
            *[
                F.sum(F.col("lat_s")[j] * F.col("err")).alias(f"g{j}")
                for j in range(k)
            ]
        )
        nxt = state.join(grad, "id", "left").select(
            "id",
            F.array(
                *[
                    F.col("latent")[j]
                    + F.lit(step)
                    * (
                        F.lit(-lam) * F.col("latent")[j]
                        + F.coalesce(F.col(f"g{j}"), F.lit(0.0))
                    )
                    for j in range(k)
                ]
            ).alias("latent"),
        )
        nxt = materialize(nxt, state)
        state = nxt
        if metrics is not None:
            metrics.record(it, wall_s=timer.lap())
    return state
