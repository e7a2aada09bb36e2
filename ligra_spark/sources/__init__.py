"""Graph sources/sinks: Ligra-format import/export plus the parquet
native layout (SURVEY.md §2.3)."""

from .adjacency_io import (
    read_adjacency_graph_df,
    read_adjacency_hypergraph_df,
    read_binary_csr_df,
    write_adjacency_graph,
    write_adjacency_hypergraph,
)

__all__ = [
    "read_adjacency_graph_df",
    "read_adjacency_hypergraph_df",
    "read_binary_csr_df",
    "write_adjacency_graph",
    "write_adjacency_hypergraph",
]
