"""Operator-level contracts: edge_map_count semantics (both grouping
sides), pack_edges, vertex_map/vertex_filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from ligra_spark.graph import Graph
from ligra_spark.operators import edge_map_count, vertex_filter, vertex_map

# star: 0 -> 1,2,3 ; chain: 1 -> 2 -> 3 ; weights = dst
EDGES = [(0, 1, 1.0), (0, 2, 2.0), (0, 3, 3.0), (1, 2, 2.0), (2, 3, 3.0)]


def _g(spark):
    return Graph(
        spark.createDataFrame(EDGES, "src long, dst long, w double"),
        num_partitions=2,
    )


def test_edge_map_count_by_src_filters_predicate(spark):
    """edgeMapFilter form (ligra.h:336-368): per frontier member, count
    out-edges satisfying the predicate."""
    g = _g(spark)
    frontier = spark.createDataFrame([(0,), (2,)], "id long")
    got = {
        r["id"]: r["cnt"]
        for r in edge_map_count(g, frontier, predicate=F.col("w") >= 2.0).collect()
    }
    assert got == {0: 2, 2: 1}  # 0→2,0→3 pass; 0→1 fails; 2→3 passes
    g.unpersist()


def test_edge_map_count_by_dst_counts_frontier_in_neighbors(spark):
    """edgeMapCount histogram form (edgeMapReduce.h:76-81): per
    destination, number of frontier in-neighbors."""
    g = _g(spark)
    frontier = spark.createDataFrame([(0,), (1,)], "id long")
    got = {r["id"]: r["cnt"] for r in edge_map_count(g, frontier, by="dst").collect()}
    assert got == {1: 1, 2: 2, 3: 1}  # dst 2 hit by both 0 and 1
    g.unpersist()


def test_edge_map_count_none_frontier_is_degree(spark):
    g = _g(spark)
    got = {r["id"]: r["cnt"] for r in edge_map_count(g, None, by="src").collect()}
    assert got == {0: 3, 1: 1, 2: 1}
    g.unpersist()


def test_pack_edges_filters_adjacency(spark):
    """packEdges analog (ligra.h:288-334): the packed graph holds only
    edges passing the predicate, and algorithms over it see exactly the
    filtered adjacency (delta-stepping's light-edge subgraph shape)."""
    from ligra_spark.algorithms import bellman_ford

    g = _g(spark)
    light = g.pack_edges(F.col("w") <= 2.0)
    assert light.m == 3
    got = {r["id"]: r["dist"] for r in bellman_ford(light, 0).collect()}
    # only light edges: 0->1 (1), 0->2 (2), 1->2 (2); 3 unreachable
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}
    light.unpersist()
    g.unpersist()


def test_vertex_map_and_filter(spark):
    state = spark.createDataFrame([(1, 2), (2, 5), (3, 8)], "id long, x long")
    mapped = vertex_map(state, {"x": F.col("x") * 10})
    assert {r["id"]: r["x"] for r in mapped.collect()} == {1: 20, 2: 50, 3: 80}
    kept = vertex_filter(state, F.col("x") >= 5)
    assert sorted(r["id"] for r in kept.collect()) == [2, 3]
