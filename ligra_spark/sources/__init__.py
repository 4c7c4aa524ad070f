from ligra_spark.sources.adjacency import (
    read_adjacency_graph,
    read_binary_graph,
    read_snap_graph,
    write_binary_graph,
)
from ligra_spark.sources.converters import (
    adj_add_weights,
    adj_to_binary,
    grid_graph,
    hash_int32,
    hash_int64,
    rand_hypergraph_incidence,
    rand_local_graph,
    read_community_hyperedges,
    read_konect_incidence,
    write_adjacency_graph,
)
from ligra_spark.sources.events import (
    edges_from_events,
    event_type_graph,
    hyper_incidence,
    hyper_incidence_directed,
)
from ligra_spark.sources.transcripts import (
    derive_edges,
    generate_transcripts,
    vertex_ids,
)

__all__ = [
    "adj_add_weights",
    "adj_to_binary",
    "grid_graph",
    "hash_int32",
    "hash_int64",
    "rand_hypergraph_incidence",
    "rand_local_graph",
    "read_community_hyperedges",
    "read_konect_incidence",
    "write_adjacency_graph",
    "derive_edges",
    "edges_from_events",
    "event_type_graph",
    "hyper_incidence",
    "hyper_incidence_directed",
    "generate_transcripts",
    "read_adjacency_graph",
    "read_binary_graph",
    "read_snap_graph",
    "write_binary_graph",
    "vertex_ids",
]
