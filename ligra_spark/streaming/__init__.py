from ligra_spark.streaming.components import streaming_components
from ligra_spark.streaming.ingest import (
    incremental_degrees,
    windowed_edge_rates,
    make_degree_merger,
    stream_edges,
)

__all__ = [
    "incremental_degrees",
    "make_degree_merger",
    "stream_edges",
    "streaming_components",
    "windowed_edge_rates",
]
