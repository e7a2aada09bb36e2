"""Built-in link-graph apps — the query surface of the engine, one per
canonical reference app (SURVEY.md §2.4)."""

from .pagerank import pagerank, pagerank_delta, pagerank_weighted
from .hits import hits
from .salsa import salsa
from .trustrank import trustrank
from .graph_stats import degree_assortativity, reciprocity
from .random_walks import neighbor_index, random_walks
from .kclique import cycle4_count, cycle4_count_df, kclique_count, kclique_count_df
from .ktruss import ktruss, truss_decomposition
from .cc_star import cc_two_phase
from .community_lpa import community_lpa
from .components import components, label_propagation
from .triangle import per_vertex_triangles, triangle_count
from .bfs import bfs_levels
from .bellman_ford import bellman_ford
from .kcore import kcore
from .bc import bc_single_source
from .radii import radii
from .mis import mis
from .cf import cf_sgd
from .bfscc import bfscc
from .delta_stepping import delta_stepping
from .kcore_julienne import kcore_julienne
from .ecc import ecc_estimate, ecc_exact, ecc_kbfs, ecc_simple_approx
from .harmonic import harmonic_from_sources
from .local_cluster import (
    heat_kernel,
    heat_kernel_psis,
    heat_kernel_rand,
    hk_walk_probs,
    nibble,
)
from .ppr import ppr, ppr_sweep
from .setcover import setcover
from .hyper import (
    hyper_bc,
    hyper_bfs,
    hyper_bpath,
    hyper_cc,
    hyper_kcore,
    hyper_kcore_efficient,
    hyper_mis,
    hyper_pagerank,
    hyper_sssp,
)
from .ecc_fm import ecc_fm
from .ecc_rv import ecc_clrstv, ecc_rv
from .ecc_tk import ecc_tk
from .ecc_loglog import ecc_loglog

__all__ = [
    "bfscc",
    "hyper_bc",
    "hyper_bfs",
    "hyper_bpath",
    "hyper_cc",
    "hyper_kcore",
    "hyper_kcore_efficient",
    "hyper_mis",
    "hyper_pagerank",
    "hyper_sssp",
    "heat_kernel",
    "heat_kernel_psis",
    "heat_kernel_rand",
    "hk_walk_probs",
    "nibble",
    "ppr",
    "ppr_sweep",
    "setcover",
    "delta_stepping",
    "kcore_julienne",
    "ecc_estimate",
    "harmonic_from_sources",
    "ecc_exact",
    "ecc_kbfs",
    "ecc_simple_approx",
    "ecc_clrstv",
    "ecc_rv",
    "ecc_tk",
    "ecc_fm",
    "ecc_loglog",
    "hits",
    "salsa",
    "trustrank",
    "degree_assortativity",
    "reciprocity",
    "neighbor_index",
    "random_walks",
    "cycle4_count",
    "cycle4_count_df",
    "kclique_count",
    "kclique_count_df",
    "ktruss",
    "truss_decomposition",
    "pagerank",
    "pagerank_delta",
    "pagerank_weighted",
    "cc_two_phase",
    "community_lpa",
    "components",
    "label_propagation",
    "per_vertex_triangles",
    "triangle_count",
    "bfs_levels",
    "bellman_ford",
    "kcore",
    "bc_single_source",
    "radii",
    "mis",
    "cf_sgd",
]
