"""Triangle counting — semantics of
``/root/reference/apps/Triangle.C:35-62``: on a symmetric graph, each
triangle is counted exactly once (the reference does it via sorted-
adjacency merge intersection under a s>d / prefix<d ordering; the
total is ordering-invariant).

Spark-first plan (no iteration, no UDF): orient each undirected edge
from the lower-(degree, id) endpoint to the higher — the classic
degree-ordering that bounds the wedge count by O(m^1.5) even on
power-law web graphs (hubs only ever RECEIVE oriented edges, so no hub
ever fans out a quadratic wedge set — this is the skew story for
triangle counting at 100 TB).  Then:

    wedges  = oriented ⋈ oriented ON a.dst = b.src    (paths u→v→w)
    closed  = wedges   ⋈ oriented ON (u, w)           (triangle iff u→w)
    total   = count(closed)

Three shuffles total, all hash joins; AQE skew-join splits any residual
hot middle vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_count", "oriented_edges"]


def oriented_edges(graph) -> DataFrame:
    """Each undirected edge once, directed low-(deg,id) → high-(deg,id)."""
    deg = graph.out_degrees  # symmetric graph: out-degree == degree
    e = graph.edges.select("src", "dst")
    ds = deg.select(F.col("id").alias("src"), F.col("outdeg").alias("sdeg"))
    dd = deg.select(F.col("id").alias("dst"), F.col("outdeg").alias("ddeg"))
    ranked = e.join(ds, "src").join(dd, "dst")
    keep = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return ranked.filter(keep).select("src", "dst")


def triangle_count(graph) -> int:
    """Total triangle count (exact integer — the reference prints the
    same total, ``Triangle.C:89-90``).  Requires graph.symmetric."""
    d = oriented_edges(graph)
    a = d.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = d.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = a.join(b, "v").select("u", "w")
    closed = wedges.join(
        d.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"]
    )
    return closed.count()


def triangle_count_df(graph) -> DataFrame:
    """Single-row DataFrame version for the query/oracle interface."""
    d = oriented_edges(graph)
    a = d.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = d.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = a.join(b, "v").select("u", "w")
    closed = wedges.join(
        d.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"]
    )
    return closed.agg(F.count(F.lit(1)).alias("triangles"))
