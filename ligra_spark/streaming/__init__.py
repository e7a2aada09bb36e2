"""Structured Streaming surface.  The reference has no streaming —
"time" is the synchronous superstep (SURVEY.md §2.5) — so this module
is an ADDITION: continuous ingestion of crawled pages into the link
graph, with watermarked windowed link-rate aggregation and an
incrementally-maintained degree table."""

from .ingest_stream import incremental_link_graph_sink, read_stream_dictionary
from .incremental_cc import (
    apply_cc_batch,
    cc_labels,
    incremental_cc_sink,
    read_star_pairs,
    star_labels,
    update_star_pairs,
)
from .incremental_dedup import (
    apply_dedup_batch,
    dedup_state,
    incremental_dedup_sink,
    read_dedup_manifest,
)
from .incremental_triangles import (
    apply_tri_batch,
    committed_half_edges,
    incremental_triangles_sink,
    read_tri_manifest,
    read_tri_total,
)
from .incremental_pagerank import (
    apply_pr_batch,
    incremental_pagerank_sink,
    read_pr_manifest,
    read_pr_scores,
)
from .stream import (
    stream_media_features,
    stream_pages_to_edges,
    windowed_link_counts,
    incremental_degree_sink,
    detect_new_hubs,
    streaming_funnel,
    hub_onsets,
    sessionize,
)

__all__ = [
    "incremental_link_graph_sink",
    "read_stream_dictionary",
    "apply_cc_batch",
    "cc_labels",
    "incremental_cc_sink",
    "read_star_pairs",
    "star_labels",
    "update_star_pairs",
    "apply_pr_batch",
    "incremental_pagerank_sink",
    "apply_dedup_batch",
    "dedup_state",
    "incremental_dedup_sink",
    "read_dedup_manifest",
    "apply_tri_batch",
    "committed_half_edges",
    "incremental_triangles_sink",
    "read_tri_manifest",
    "read_tri_total",
    "read_pr_manifest",
    "read_pr_scores",
    "stream_media_features",
    "stream_pages_to_edges",
    "windowed_link_counts",
    "incremental_degree_sink",
    "detect_new_hubs",
    "streaming_funnel",
    "hub_onsets",
    "sessionize",
]
