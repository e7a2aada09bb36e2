"""ligra_spark — a from-scratch PySpark-native link-graph analytics
engine with the query capabilities of the reference Ligra fork
(rwang067/ligra): EdgeMap/VertexMap-style frontier supersteps expressed
as DataFrame joins + aggregations over a partitioned edge table, with
PageRank / PageRankDelta / connected components / label propagation /
triangle counting as built-in apps, checkpoint-resumable supersteps,
and a web-pages → link-graph ingestion pipeline.

Architecture (SURVEY.md §7): a Python superstep planner drives purely
declarative DataFrame plans — the hot path is 100% JVM (Catalyst +
whole-stage codegen); Python never touches per-edge data.
"""

__version__ = "0.1.0"
