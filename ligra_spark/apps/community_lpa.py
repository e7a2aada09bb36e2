"""Community detection by synchronous label propagation (Raghavan,
Albert, Kumara 2007): each round every vertex adopts the most frequent
label among its neighbors, ties broken by the smallest label — the
classic near-linear community detector for web-scale graphs, and a
different operator from ``apps.components``'s ``label_propagation``
(which is min-label connectivity: its fixpoint labels CONNECTED
COMPONENTS; this one's labels split components into dense clusters).

Synchronous LPA can two-cycle on bipartite-ish structures, so the
canonical bulk formulation runs a FIXED number of rounds (the
asynchronous variant's sequential update order is inherently serial —
the reference's localAlg apps make the same serial/parallel
trade-off explicitly).  Deterministic by construction: the
count-desc-then-label-asc tie-break has no engine freedom.

Physical shape per round: ONE join of the n-row label table against
the edge table (edges never move — same dense edge_map shape as
pagerank's superstep), one (dst, label) partial-agg'd count, one
per-dst top-1 window, one state merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..engine import IterState

__all__ = ["community_lpa"]


def community_lpa(graph, rounds: int = 5) -> DataFrame:
    """Returns (id, label) after ``rounds`` synchronous LPA rounds over
    the (symmetric) graph; isolated vertices keep their own id."""
    init = graph.vertices.select("id", F.col("id").alias("label"))
    st = IterState(init, num_partitions=graph.num_partitions)
    e = graph.edges.select("src", "dst")
    for _ in range(rounds):
        msgs = (
            e.join(
                st.df.select(F.col("id").alias("src"), "label").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        top = Window.partitionBy("id").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        best = (
            msgs.select(
                "id", "label", F.row_number().over(top).alias("_rk")
            )
            .filter(F.col("_rk") == 1)
            .select("id", F.col("label").alias("_new"))
        )
        new = (
            st.df.join(best.hint("shuffle_hash"), "id", "left")
            .select("id", F.coalesce("_new", "label").alias("label"))
        )
        st.advance(new)
    return st.df.select("id", "label")
