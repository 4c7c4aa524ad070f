"""Local clustering family (apps/localAlg/): sparse-state diffusion
from a seed vertex.

- ``ppr_acl`` — Andersen-Chung-Lang approximate personalized PageRank
  push (ACL-Sync-Local-Opt.C:75-128): p(seed)=0, r(seed)=1; every
  round, frontier vertices (r > deg·ε) move ``2α/(1+α)·r`` into p,
  zero their residual, and push ``(1−α)/(1+α)·r/deg`` to each
  out-neighbor's residual.
- ``nibble`` — Spielman-Teng Nibble (Nibble-Parallel.C:30-107): a
  truncated lazy random walk; each round frontier vertices (p ≥ deg·ε)
  keep p/2 and spread p/(2·deg) to neighbors, and sub-threshold mass
  is truncated (non-frontier p drops out, exactly as the reference's
  fresh ``new_p`` table each round).

Both keep SPARSE per-vertex state — only touched vertices exist as
rows, the DataFrame analog of the reference's sparseAdditiveSet hash
tables — so a local query on a 10^12-edge graph only ever materializes
the seed's neighborhood."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ligra_spark.algorithms._iter import (
    IterMetrics,
    Timer,
    materialize,
    materialize_counted as _materialize_counted,
)
from ligra_spark.graph import Graph
from ligra_spark.operators.edge_map import edge_map


def ppr_acl(
    graph: Graph,
    source: int,
    alpha: float = 0.15,
    eps: float = 1e-9,
    max_iters: int = 10_000,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """Returns sparse ``(id, p DOUBLE)`` — the approximate personalized
    PageRank vector around ``source``."""
    spark = graph.spark
    push_c = (1.0 - alpha) / (1.0 + alpha)
    keep_c = 2.0 * alpha / (1.0 + alpha)

    state = materialize(
        spark.createDataFrame([(int(source), 0.0, 1.0)], "id long, p double, r double")
    )
    timer = Timer()
    for it in range(max_iters):
        fr = state.join(graph.degrees.select("id", "out_deg"), "id").where(
            (F.col("r") > F.col("out_deg") * eps) & (F.col("out_deg") > 0)
        )
        fr, n_fr = _materialize_counted(fr, None, f"acl_fr_{it}")
        if n_fr == 0:
            break
        msgs = edge_map(
            graph,
            fr.select("id", (F.lit(push_c) * F.col("r") / F.col("out_deg")).alias("share")),
            message=F.col("share"),
            combiner="sum",
            frontier_size=n_fr,
        )
        nxt = (
            state.join(fr.select("id", F.lit(1).alias("_f")), "id", "left")
            .join(msgs, "id", "full_outer")
            .select(
                "id",
                (
                    F.coalesce("p", F.lit(0.0))
                    + F.when(
                        F.col("_f").isNotNull(),
                        F.lit(keep_c) * F.coalesce("r", F.lit(0.0)),
                    ).otherwise(F.lit(0.0))
                ).alias("p"),
                (
                    F.when(F.col("_f").isNotNull(), F.lit(0.0)).otherwise(
                        F.coalesce("r", F.lit(0.0))
                    )
                    + F.coalesce("msg", F.lit(0.0))
                ).alias("r"),
            )
        )
        nxt = materialize(nxt, state)
        state = nxt
        if metrics is not None:
            metrics.record(it, frontier=n_fr, wall_s=timer.lap())
    return state.where(F.col("p") > 0).select("id", "p")


def nibble(
    graph: Graph,
    source: int,
    eps: float = 1e-9,
    max_iters: int = 10_000,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """Returns sparse ``(id, p DOUBLE)`` — the truncated lazy-walk mass
    distribution around ``source`` (Nibble-Parallel.C semantics: mass at
    non-frontier vertices is truncated every round)."""
    spark = graph.spark
    state = materialize(
        spark.createDataFrame([(int(source), 1.0)], "id long, p double")
    )
    timer = Timer()
    for it in range(max_iters):
        fr = state.join(graph.degrees.select("id", "out_deg"), "id").where(
            (F.col("p") >= F.col("out_deg") * eps) & (F.col("out_deg") > 0)
        )
        fr, n_fr = _materialize_counted(fr, None, f"nibble_fr_{it}")
        if n_fr == 0:
            break
        msgs = edge_map(
            graph,
            fr.select("id", (F.col("p") / (2.0 * F.col("out_deg"))).alias("share")),
            message=F.col("share"),
            combiner="sum",
            frontier_size=n_fr,
        )
        # fresh table: frontier keeps half, neighbors gain pushes,
        # everything else truncates
        nxt = (
            fr.select("id", (F.col("p") / 2.0).alias("keep"))
            .join(msgs, "id", "full_outer")
            .select(
                "id",
                (
                    F.coalesce("keep", F.lit(0.0)) + F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
            )
        )
        nxt = materialize(nxt, state)
        state = nxt
        if metrics is not None:
            metrics.record(it, frontier=n_fr, wall_s=timer.lap())
    return state.select("id", "p")


def heat_kernel(
    graph: Graph,
    source: int,
    t: float = 3.0,
    eps: float = 1e-9,
    N: int = 4,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """hk-relax heat-kernel diffusion (localAlg/HeatKernel-Parallel.C:
    94-174, the Kloster-Gleich push). Exactly ``N`` Taylor terms:
    round j (j+1 < N) folds the frontier's residual into x and pushes
    ``(t/(j+1))·r/deg`` into a FRESH residual table (non-frontier
    residual truncates, as the reference's r.del()/new_r swap); the
    active set is residuals >= deg·exp(t)·eps/(2N)/psis[j+1]; the last
    round folds and pushes ``r/deg`` with no Taylor factor
    (HK_Last_F). Deterministic; returns sparse ``(id, x DOUBLE)``."""
    import math

    spark = graph.spark
    fact = [1.0] * N
    for k in range(1, N):
        fact[k] = k * fact[k - 1]
    psis = [
        sum(fact[k] * t ** m / fact[m + k] for m in range(N - k))
        for k in range(N)
    ]
    constant = math.exp(t) * eps / (2.0 * N)

    deg = graph.degrees.select("id", "out_deg")
    x = materialize(
        spark.createDataFrame([(int(source), 0.0)], "id long, x double")
    )
    r = spark.createDataFrame([(int(source), 1.0)], "id long, r double")
    frontier, n_f = _materialize_counted(
        r.join(deg, "id").where(F.col("out_deg") > 0), None, "hk_fr_init"
    )

    timer = Timer()
    for j in range(N):
        if n_f == 0:
            break
        fold = x.join(frontier.select("id", "r"), "id", "full_outer").select(
            "id",
            (F.coalesce("x", F.lit(0.0)) + F.coalesce("r", F.lit(0.0))).alias("x"),
        )
        last = j + 1 == N
        factor = 1.0 if last else t / float(j + 1)
        msgs = edge_map(
            graph,
            frontier.select(
                "id",
                (F.lit(factor) * F.col("r") / F.col("out_deg")).alias("share"),
            ),
            message=F.col("share"),
            combiner="sum",
            frontier_size=n_f,
        )
        if last:
            x = materialize(
                fold.join(msgs, "id", "full_outer").select(
                    "id",
                    (
                        F.coalesce("x", F.lit(0.0)) + F.coalesce("msg", F.lit(0.0))
                    ).alias("x"),
                ),
                x,
            )
            break
        x = materialize(fold, x)
        r = msgs.select("id", F.col("msg").alias("r"))
        frontier, n_f = _materialize_counted(
            r.join(deg, "id").where(
                (F.col("r") >= F.col("out_deg") * (constant / psis[j + 1]))
                & (F.col("out_deg") > 0)
            ),
            frontier,
            f"hk_fr_{j}",
        )
        if metrics is not None:
            metrics.record(j, frontier=n_f, wall_s=timer.lap())
    return x
