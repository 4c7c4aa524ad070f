"""Parallel (1+ε)-approximate set cover over Julienne buckets.

Reference: apps/bucketing/SetCover.C:12-113 (the Blelloch et al.
bucketed MaNIS scheme). Input is a bipartite digraph set → element.
Rounds process sets bucketed by ``floor(x·ln(deg))`` in DECREASING
order (largest remaining sets first, x = 1/ln(1+ε)):

1. pack: recompute each active set's degree over UNCOVERED elements
   only (SetCover.C:40-43 — the packEdges call site);
2. keep sets still at the bucket's size threshold ``(1+ε)^cur``;
3. claim: each surviving set writeMin's its id into its uncovered
   neighbors (SetCover.C:53-54);
4. win: a set that claimed ≥ ``(1+ε)^(cur-1)`` elements joins the
   cover and marks those elements COVERED; losers release claims
   (SetCover.C:56-77);
5. rebucket survivors by their packed degree (SetCover.C:80-89).

All steps are columnar: pack is a join against the uncovered-element
state + count, claim is ``groupBy(element).min(set)``, win/release is
one join-update of the element state. Deterministic (min-id claim
ties), so the pytest oracle replays the identical rounds in Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ligra_spark.algorithms._iter import IterMetrics, Timer, materialize
from ligra_spark.graph import Graph
from ligra_spark.operators.buckets import next_bucket


def set_cover(
    graph: Graph,
    epsilon: float = 0.01,
    max_rounds: int = 100_000,
    metrics: IterMetrics | None = None,
) -> DataFrame:
    """Returns ``(set_id LONG)`` — the chosen cover over the bipartite
    set→element edge table (sources are sets, destinations elements)."""
    x = 1.0 / math.log(1.0 + epsilon)

    def bucket_of(deg_col):
        return F.when(
            deg_col > 0, F.floor(F.lit(x) * F.log(deg_col.cast("double")))
        ).otherwise(F.lit(None))

    # sets: (id, bkt) — bucket NULL once covered-out or in the cover.
    sets = materialize(
        graph.degrees.where(F.col("out_deg") > 0).select(
            "id", bucket_of(F.col("out_deg")).alias("bkt")
        )
    )
    # elements: (elm, owner) — owner NULL = unclaimed, -1 = COVERED.
    elms = materialize(
        graph.edges_by_dst.select(F.col("dst").alias("elm")).distinct()
        .select("elm", F.lit(None).cast("long").alias("owner"))
    )
    cover = graph.spark.createDataFrame([], "set_id long")

    timer = Timer()
    for it in range(max_rounds):
        cur, n_cur = next_bucket(sets, order="decreasing")
        if cur is None:
            break
        active = sets.where(F.col("bkt") == cur).select(F.col("id").alias("src"))
        # persisted owner is NULL (unclaimed) or -1 (COVERED); round-local
        # claims never persist, matching the reference's per-round reset
        uncovered = elms.where(F.col("owner").isNull()).select(
            F.col("elm").alias("dst")
        )
        # 1. pack: live degree over uncovered elements only
        live = graph.edges_by_src.join(active, "src").join(uncovered, "dst")
        deg_new = live.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        threshold = math.ceil((1.0 + epsilon) ** cur)
        still = deg_new.where(F.col("deg") >= threshold).select("src")
        # 2. claim: writeMin of set id into uncovered neighbor elements
        claims = (
            live.join(still, "src")
            .groupBy(F.col("dst").alias("elm"))
            .agg(F.min("src").alias("claimant"))
        )
        # 3. win: sets claiming enough elements join the cover
        low = max(math.ceil((1.0 + epsilon) ** (cur - 1)), 1)
        won = (
            claims.groupBy(F.col("claimant").alias("src"))
            .agg(F.count(F.lit(1)).alias("n_won"))
            .where(F.col("n_won") >= low)
            .select("src")
        )
        won = materialize(won)
        cover = cover.unionAll(won.select(F.col("src").alias("set_id")))
        # 4. elements claimed by winners become COVERED; losers release
        elm_upd = claims.join(
            won.withColumnRenamed("src", "claimant").withColumn("_w", F.lit(1)),
            "claimant",
            "left",
        ).select(
            "elm",
            F.when(F.col("_w").isNotNull(), F.lit(-1).cast("long"))
            .otherwise(F.lit(None).cast("long"))
            .alias("owner_new"),
        )
        elms_next = elms.join(elm_upd, "elm", "left").select(
            "elm",
            F.coalesce("owner_new", "owner").alias("owner"),
        )
        elms_next = materialize(elms_next, elms)
        elms = elms_next
        # 5. rebucket the processed bucket's sets by packed degree;
        # winners leave the structure
        reb = (
            sets.join(
                active.withColumnRenamed("src", "id").withColumn("_a", F.lit(1)),
                "id",
                "left",
            )
            .join(deg_new.withColumnRenamed("src", "id"), "id", "left")
            .join(
                won.withColumnRenamed("src", "id").withColumn("_w", F.lit(1)),
                "id",
                "left",
            )
            .select(
                "id",
                F.when(F.col("_a").isNull(), F.col("bkt"))
                .when(F.col("_w").isNotNull(), F.lit(None))
                .otherwise(bucket_of(F.coalesce("deg", F.lit(0))))
                .alias("bkt"),
            )
        )
        sets = materialize(reb, sets)
        # cover is an append-only union of already-materialized `won`
        # nodes — the union plan stays shallow without its own
        # per-round materialization job
        if metrics is not None:
            metrics.record(it, bucket=cur, active=n_cur, wall_s=timer.lap())
    return cover.select("set_id").distinct()
