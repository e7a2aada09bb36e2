"""Graph sources/sinks: Ligra-format import/export plus the parquet
native layout (SURVEY.md §2.3), and the utils/ converter tools
(SNAP/KONECT readers, weight stamping, random hypergraph)."""

from .bucketed import (
    compact_bucketed_table,
    read_bucketed_graph,
    read_bucketed_hypergraph,
    table_num_buckets,
    write_bucketed_edges,
    write_bucketed_incidence,
)
from .compressed import (
    read_compressed_graph,
    read_compressed_graph_df,
    write_compressed_graph,
)
from .adjacency_io import (
    read_adjacency_graph_df,
    read_adjacency_hypergraph_df,
    read_binary_csr_df,
    write_adjacency_graph,
    write_adjacency_hypergraph,
    write_adjacency_hypergraph_distributed,
)
from .convert import (
    add_log_weights,
    clique_expand,
    rand_hypergraph,
    read_community_hypergraph,
    read_konect_bipartite,
    read_snap_edges,
    read_wgh_snap_edges,
    snap_to_adjacency,
    write_binary_csr,
    write_mesh_csv,
)

__all__ = [
    "read_compressed_graph",
    "read_compressed_graph_df",
    "write_compressed_graph",
    "read_adjacency_graph_df",
    "read_adjacency_hypergraph_df",
    "read_binary_csr_df",
    "write_adjacency_graph",
    "write_adjacency_hypergraph",
    "write_adjacency_hypergraph_distributed",
    "read_snap_edges",
    "snap_to_adjacency",
    "add_log_weights",
    "read_konect_bipartite",
    "read_community_hypergraph",
    "read_wgh_snap_edges",
    "clique_expand",
    "write_mesh_csv",
    "write_binary_csr",
    "rand_hypergraph",
    "write_bucketed_edges",
    "read_bucketed_graph",
    "table_num_buckets",
    "write_bucketed_incidence",
    "read_bucketed_hypergraph",
    "compact_bucketed_table",
]
