from ligra_spark.algorithms.bellman_ford import bellman_ford
from ligra_spark.algorithms.bfs import bfs
from ligra_spark.algorithms.components import connected_components
from ligra_spark.algorithms.kcore import kcore
from ligra_spark.algorithms.label_propagation import label_propagation
from ligra_spark.algorithms.pagerank import pagerank, pagerank_delta
from ligra_spark.algorithms.triangle import triangle_count, triangles_per_vertex

__all__ = [
    "bellman_ford",
    "bfs",
    "connected_components",
    "kcore",
    "label_propagation",
    "pagerank",
    "pagerank_delta",
    "triangle_count",
    "triangles_per_vertex",
]
