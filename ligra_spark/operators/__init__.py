from ligra_spark.operators.edge_map import (
    COMBINERS,
    edge_map,
    edge_map_count,
    frontier_stats,
)
from ligra_spark.operators.vertex_ops import vertex_filter, vertex_map

__all__ = [
    "COMBINERS",
    "edge_map",
    "edge_map_count",
    "frontier_stats",
    "vertex_filter",
    "vertex_map",
]
