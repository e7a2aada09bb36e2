"""k-clique counting — the motif-census extension of Triangle.C's
count (k = 3) to k = 4, 5, ...: exact counts of complete k-vertex
subgraphs, the standard density/motif statistic one step past
triangles (Chiba-Nishizeki orientation bound; Danisch et al.'s
kClist ordering idea in relational form).

Spark-first shape: orient every undirected edge low-(deg,id) →
high-(deg,id) (``triangle.oriented_edges`` — hubs only RECEIVE, so no
hub explosion), then grow ordered paths v1 < v2 < ... < vk one vertex
at a time; a path extension by w is kept only if EVERY earlier path
vertex also points at w (one equi-join per earlier vertex — the
relational transcription of kClist's neighborhood intersection).
Each k-clique is enumerated exactly once in orientation order, so the
count is exact with no /k! correction.  Join count: (k-2) extension
joins + (k-2)(k-1)/2 - 1 closure joins, all equi-joins on the
oriented edge table — Catalyst keeps them shuffled-hash, and the
oriented table's partial-degree bound keeps intermediate paths
O(m · α^(k-2)) like the serial algorithm."""

from __future__ import annotations

from pyspark.sql import functions as F

from .triangle import oriented_edges

__all__ = ["kclique_count"]


def kclique_count(graph, k: int = 4) -> int:
    """Exact number of k-cliques in the symmetric graph (k >= 3)."""
    if k < 3:
        raise ValueError("kclique_count requires k >= 3 (k=2 is the edge count)")
    d = oriented_edges(graph)
    # paths[v1..vi] with all pairwise oriented edges present
    paths = d.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    for i in range(3, k + 1):
        last = f"v{i - 1}"
        new = f"v{i}"
        ext = d.select(F.col("src").alias(last), F.col("dst").alias(new))
        paths = paths.join(ext, last)
        for j in range(1, i - 1):
            closure = d.select(
                F.col("src").alias(f"v{j}"), F.col("dst").alias(new)
            )
            paths = paths.join(closure, [f"v{j}", new])
    return paths.count()


def kclique_count_df(graph, k: int = 4):
    """Single-row (cliques) DataFrame version for the query/oracle
    interface."""
    if k < 3:
        raise ValueError("kclique_count requires k >= 3")
    d = oriented_edges(graph)
    paths = d.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    for i in range(3, k + 1):
        last, new = f"v{i - 1}", f"v{i}"
        paths = paths.join(d.select(F.col("src").alias(last), F.col("dst").alias(new)), last)
        for j in range(1, i - 1):
            paths = paths.join(
                d.select(F.col("src").alias(f"v{j}"), F.col("dst").alias(new)),
                [f"v{j}", new],
            )
    return paths.agg(F.count(F.lit(1)).alias("cliques"))


def cycle4_count_df(graph, max_middle_degree: int | None = None):
    """Single-row (cycles4) exact 4-cycle census of the symmetric
    graph, by the opposite-pair identity: every C4 u-a-w-b is fixed by
    an unordered opposite pair {u, w} plus an unordered pair of their
    common neighbors, and has exactly TWO opposite pairs — so

        #C4 = (1/2) * sum_{u<w} C(cn(u, w), 2)
            = (sum_{u<w} cn*(cn-1)) div 4        (exact integers).

    One wedge self-join + one groupBy — the relational restatement of
    the wedge-counting C4 algorithm.  The wedge table is sum_m d(m)^2
    rows: that quadratic-in-hub-degree cost is inherent to EXACT
    4-cycle counting (unlike triangles, no orientation bounds it);
    ``max_middle_degree`` drops wedge middles above the cap for the
    documented approximation a web-scale run would use (hubs at the
    middle of a C4 are overwhelmingly navigational boilerplate).
    """
    e = graph.edges.select("src", "dst")  # symmetric: both directions
    if max_middle_degree is not None:
        deg = graph.out_degrees
        keep = deg.filter(F.col("outdeg") <= max_middle_degree).select("id")
        e = e.join(keep.withColumnRenamed("id", "src"), "src")
    a = e.select(F.col("src").alias("m"), F.col("dst").alias("u"))
    b = e.select(F.col("src").alias("m"), F.col("dst").alias("w"))
    cn = (
        a.join(b, "m")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cn.agg(
        F.expr("sum(c * (c - 1)) div 4").alias("cycles4")
    ).select(F.coalesce("cycles4", F.lit(0)).alias("cycles4"))


def cycle4_count(graph, max_middle_degree: int | None = None) -> int:
    return int(cycle4_count_df(graph, max_middle_degree).first()["cycles4"])
