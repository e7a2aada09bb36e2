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

__all__ = ["triangle_count", "oriented_edges", "per_vertex_triangles"]


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


def per_vertex_triangles(graph) -> DataFrame:
    """(id, triangles, lcc) for ALL n vertices — the per-vertex counts
    the reference accumulates before summing (``Triangle.C:46-56``
    writes a per-vertex count array; the printed total is its sum),
    plus the local clustering coefficient 2·tri / (deg·(deg−1))
    (0 for deg < 2), the standard per-page community-density signal.

    Same three-join oriented plan as :func:`triangle_count`; each
    closed triangle then credits its three corners via one explode +
    partial-agg'd groupBy — a fourth shuffle whose input is one row
    per triangle, not per wedge.  Requires graph.symmetric.
    """
    d = oriented_edges(graph)
    a = d.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = d.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = a.join(b, "v")
    closed = wedges.join(
        d.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"]
    )
    tri = (
        closed.select(F.explode(F.array("u", "v", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    deg = graph.out_degrees  # symmetric graph: out-degree == degree
    t = F.coalesce("tri", F.lit(0))
    return deg.join(tri, "id", "left").select(
        "id",
        t.alias("triangles"),
        F.round(
            F.when(
                F.col("outdeg") >= 2,
                2.0 * t / (F.col("outdeg") * (F.col("outdeg") - 1)),
            ).otherwise(0.0),
            8,
        ).alias("lcc"),
    )


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
