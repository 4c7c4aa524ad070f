"""Connected components — hash-min label propagation.

Reference: apps/Components.C — every vertex's label starts as its own
id (Components.C:56); each round frontier vertices push their label and
each destination keeps the minimum (writeMin, Components.C:38); a vertex
re-enters the frontier iff its label changed this round
(Components.C:34-38); fixpoint when the frontier empties
(Components.C:62-67). At fixpoint every vertex holds the **minimum
vertex id of its component** — an exact, deterministic output.

The optional ``shortcut`` adds the pointer-jumping step
``IDs[i] = IDs[IDs[i]]`` of apps/Components-Shortcut.C:30-42 as a
label⋈label self-join each round — roughly halving rounds on
high-diameter graphs at the cost of one extra shuffle per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ligra_spark.algorithms._iter import IterMetrics, Timer, materialize
from ligra_spark.graph import Graph
from ligra_spark.operators.edge_map import edge_map


def connected_components(
    graph: Graph,
    symmetrize: bool = True,
    shortcut: bool = False,
    max_iters: int = 1000,
    metrics: IterMetrics | None = None,
    checkpointer=None,
) -> DataFrame:
    """Returns ``(id LONG, comp LONG)`` — comp = min id in component."""
    g = graph.symmetrized() if symmetrize and not graph.symmetric else graph

    state = g.vertices.select("id", F.col("id").alias("comp"))
    start_iter = 0
    if checkpointer is not None:
        resumed = checkpointer.resume()
        if resumed is not None:
            start_iter, state = resumed
    state = materialize(state)
    frontier = state
    frontier_n = g.n

    timer = Timer()
    for it in range(start_iter, max_iters):
        msgs = edge_map(
            g,
            frontier,
            message=F.col("comp"),
            combiner="min",
            frontier_size=frontier_n,
        )
        nxt = state.join(msgs, "id", "left").select(
            "id",
            "comp",
            F.least("comp", F.coalesce("msg", "comp")).alias("comp_new"),
        )
        if shortcut:
            # IDs[i] = IDs[IDs[i]] (Components-Shortcut.C:30-42)
            hop = nxt.select(F.col("id").alias("comp_new"), F.col("comp_new").alias("comp2"))
            nxt = (
                nxt.join(hop, "comp_new", "left")
                .select(
                    "id",
                    "comp",
                    F.coalesce("comp2", "comp_new").alias("comp_new"),
                )
            )
        nxt = materialize(nxt)
        frontier = nxt.where(F.col("comp_new") < F.col("comp")).select(
            "id", F.col("comp_new").alias("comp")
        )
        frontier_n = frontier.count()
        state.unpersist()
        state = nxt.select("id", F.col("comp_new").alias("comp"))
        if metrics is not None:
            metrics.record(it, frontier=frontier_n, wall_s=timer.lap())
        if checkpointer is not None:
            checkpointer.save(it, state, {"frontier": frontier_n})
        if frontier_n == 0:
            break
    return state
