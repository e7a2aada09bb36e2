"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW 2000): HITS's hubs/authorities recast as two random walks
on the bipartite support graph (authority step: back along one link,
forward along another).  The other canonical web link-analysis score
next to PageRank/HITS, and the degree-normalized one that resists
tightly-knit-community (TKC) drift.

Spark-first shape — CLOSED FORM, no power iteration: the authority
chain's stationary distribution is known per connected component of
the bipartite support graph,

    auth(i) = (|A_c| / |A|) · indeg(i) / Σ_{i' ∈ A_c} indeg(i')

(and symmetrically hub(j) with out-degrees), where A_c is component
c's authority side and |A| the total authority-support size — so the
whole computation is ONE connected-components run on the bipartite
graph (hub j ↔ authority i per edge j→i, authorities offset by n)
plus two degree aggregations.  The iterative formulation every
textbook gives converges to exactly this; running it as a fixpoint on
a cluster would be pure waste.  Reference quirk kept for
comparability with ``apps.pagerank``/``apps.hits``: duplicate edges
count double in the degrees (and create the same bipartite support).

Scale: the bipartite CC is the engine's standard min-label fixpoint
(one shuffle per superstep over 2n vertices); the aggregations are
two partial-agg'd groupBys.  Nothing here is quadratic in hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

__all__ = ["salsa"]


def salsa(graph) -> DataFrame:
    """Returns (id, auth, hub) over ALL n vertices — 0.0 outside the
    respective support (auth > 0 iff indeg > 0, hub > 0 iff
    outdeg > 0)."""
    from .components import components

    spark = graph.edges.sparkSession
    n = graph.n
    e = graph.edges.select("src", "dst")
    # bipartite support graph: hub side keeps ids, authority side
    # offset by n; symmetric because CC needs both directions
    bip = e.select(F.col("src"), (F.col("dst") + F.lit(n)).alias("dst")).unionAll(
        e.select((F.col("dst") + F.lit(n)).alias("src"), F.col("src").alias("dst"))
    )
    g2 = LinkGraph.from_edges(
        spark, bip, n=2 * n, num_partitions=graph.num_partitions, symmetric=True
    )
    comp, _ = components(g2)
    g2.unpersist()

    outdeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )

    def side_scores(deg: DataFrame, offset: int, col: str) -> DataFrame:
        nodes = deg.join(
            comp.select(
                (F.col("id") - F.lit(offset)).alias("id"), "component"
            ).filter(F.col("id") >= 0).filter(F.col("id") < n),
            "id",
        )
        # |A| as a broadcast 1-row frame — no driver sync
        total = nodes.agg(F.count(F.lit(1)).alias("_tot"))
        per_comp = nodes.groupBy("component").agg(
            F.count(F.lit(1)).alias("csize"), F.sum("deg").alias("cvol")
        )
        return (
            nodes.join(per_comp.hint("shuffle_hash"), "component")
            .crossJoin(F.broadcast(total))
            .select(
                "id",
                (
                    (F.col("csize") / F.col("_tot"))
                    * F.col("deg")
                    / F.col("cvol")
                ).alias(col),
            )
        )

    auth = side_scores(indeg, n, "auth")
    hub = side_scores(outdeg, 0, "hub")
    return (
        graph.vertices.join(auth.hint("shuffle_hash"), "id", "left")
        .join(hub.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )
