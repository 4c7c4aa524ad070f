from ligra_spark.algorithms.bc import betweenness_from_source
from ligra_spark.algorithms.bellman_ford import bellman_ford
from ligra_spark.algorithms.bfs import bfs
from ligra_spark.algorithms.components import connected_components
from ligra_spark.algorithms.kcore import kcore
from ligra_spark.algorithms.label_propagation import label_propagation
from ligra_spark.algorithms.mis import maximal_independent_set
from ligra_spark.algorithms.pagerank import pagerank, pagerank_delta
from ligra_spark.algorithms.radii import radii
from ligra_spark.algorithms.triangle import triangle_count, triangles_per_vertex

__all__ = [
    "bellman_ford",
    "betweenness_from_source",
    "bfs",
    "connected_components",
    "kcore",
    "label_propagation",
    "maximal_independent_set",
    "pagerank",
    "pagerank_delta",
    "radii",
    "triangle_count",
    "triangles_per_vertex",
]
from ligra_spark.algorithms.components import bfs_components, cc_contract_local
from ligra_spark.algorithms.eccentricity import (
    clrstv_ecc,
    fm_ecc,
    loglog_ecc,
    rv_ecc,
    simple_approx_ecc,
    tk_ecc,
)
from ligra_spark.algorithms.cf import cf
from ligra_spark.algorithms.setcover import set_cover
from ligra_spark.algorithms.local import (
    heat_kernel,
    heat_kernel_rand,
    nibble,
    ppr_acl,
)
from ligra_spark.algorithms.radii import kbfs_exact, kbfs_sampled_ecc
from ligra_spark.algorithms.hyper import (
    hyper_bc,
    hyper_bfs,
    hyper_bpath,
    hyper_cc,
    hyper_kcore,
    hyper_kcore_bucketed,
    hyper_mis,
    hyper_pagerank,
    hyper_sssp,
)
