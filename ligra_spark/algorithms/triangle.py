"""Triangle counting — rank-directed intersection.

Reference: apps/Triangle.C — adjacency lists are sorted (Triangle.C:74),
then for each edge the kernel merge-intersects the endpoints' neighbor
lists counting only neighbors ranked below both endpoints
(countCommon, Triangle.C:34-45), so each triangle is counted exactly
once. The global count is a plus-reduce (Triangle.C:89).

Spark realization: orient each undirected edge from the lower-ranked to
the higher-ranked endpoint under the **degree-then-id rank** (the
standard compact-forward orientation; rank-by-degree bounds every
oriented out-degree by O(√m), which is what keeps the join-based plan
alive on skewed hub graphs — an id-ranked orientation would give a hub
an out-list of millions and quadratic wedge blowup). A triangle
{a,b,c} with rank a<b<c appears exactly once as the wedge (a→b, a→c)
closed by the oriented edge (b→c):

    wedges = E⁺ ⋈ E⁺ on the low endpoint (rank-ordered via struct
    comparison), then LEFT SEMI equi-join against E⁺ on (b, c).

Catalyst executes this as two shuffled hash joins with partial
aggregation; AQE's skew-join splitting handles residual wedge skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ligra_spark.graph import Graph


def _oriented_edges(graph: Graph) -> DataFrame:
    """Canonical simple-graph edges oriented low-rank → high-rank under
    (degree, id) rank, carrying the head's rank columns for wedge
    ordering. Self-loops dropped, deduped (Triangle.C:25-28 assumes a
    symmetric simple graph)."""
    g = graph if graph.symmetric else graph.symmetrized()
    deg = g.degrees.select("id", F.col("out_deg").alias("deg"))
    e = (
        g.edges_by_src.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    lower = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return (
        e.select(
            F.when(lower, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(lower, F.col("dst")).otherwise(F.col("src")).alias("v"),
            F.when(lower, F.col("ddeg")).otherwise(F.col("sdeg")).alias("vdeg"),
        )
        .dropDuplicates(["u", "v"])
    )


def _closed_wedges(ep: DataFrame) -> DataFrame:
    """(a, b, c) triples, rank(a) < rank(b) < rank(c), forming triangles."""
    ab, ac = ep.alias("ab"), ep.alias("ac")
    wedges = (
        ab.join(ac, F.col("ab.u") == F.col("ac.u"))
        .where(
            # rank-order the wedge tips: (deg, id) struct comparison
            F.struct(F.col("ab.vdeg"), F.col("ab.v"))
            < F.struct(F.col("ac.vdeg"), F.col("ac.v"))
        )
        .select(
            F.col("ab.u").alias("a"),
            F.col("ab.v").alias("b"),
            F.col("ac.v").alias("c"),
        )
    )
    closing = ep.select(F.col("u").alias("b"), F.col("v").alias("c"))
    return wedges.join(closing, ["b", "c"], "left_semi")


def triangle_count(graph: Graph) -> int:
    """Exact global triangle count (Triangle.C semantics)."""
    return _closed_wedges(_oriented_edges(graph)).count()


def triangles_per_vertex(graph: Graph) -> DataFrame:
    """``(id, triangles)`` — per-vertex incident triangle counts (each
    triangle contributes 1 to each of its three corners)."""
    tri = _closed_wedges(_oriented_edges(graph))
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    g = graph if graph.symmetric else graph.symmetrized()
    return g.vertices.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
