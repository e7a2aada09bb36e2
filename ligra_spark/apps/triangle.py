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

__all__ = [
    "triangle_count",
    "oriented_edges",
    "per_vertex_triangles",
    "new_triangles",
    "triangle_delta_count",
]


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


def count_triangles_half(half: DataFrame) -> int:
    """Exact triangle count from a canonical half-edge set (src < dst,
    distinct, loop-free) — :func:`triangle_count`'s degree-oriented
    plan without requiring a LinkGraph (used by the incremental
    maintainer's bootstrap, where the first batch IS the whole graph
    and the delta formula would degenerate to an unoriented O(Σd²)
    wedge enumeration)."""
    deg = (
        half.select(F.col("src").alias("id"))
        .unionByName(half.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ds = deg.select(F.col("id").alias("src"), F.col("deg").alias("sdeg"))
    dd = deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddeg"))
    ranked = half.join(ds, "src").join(dd, "dst")
    fwd = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    # the oriented set feeds all three legs of the self-join — persist
    # it so the degree join runs once, not three times (LinkGraph-based
    # triangle_count gets this for free from the materialized graph)
    d = ranked.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    ).persist()
    try:
        a = d.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        b = d.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        wedges = a.join(b, "v").select("u", "w")
        closed = wedges.join(
            d.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"]
        )
        return closed.count()
    finally:
        d.unpersist()


def new_triangles(
    old_half: DataFrame, new_half: DataFrame, broadcast_delta: bool = True
) -> DataFrame:
    """Triangles of ``old ∪ new`` that contain at least one ``new``
    edge, each exactly once, as sorted triples (x < y < z).

    Both inputs are canonical undirected half-edge sets (src < dst,
    distinct, loop-free) and must be DISJOINT — the incremental-
    maintenance precondition (``streaming.incremental_triangles``
    anti-joins the batch against the committed edges first).

    Cost is delta-proportional, never a full recount: each new edge
    (a, b) probes for common neighbors w of a and b in the FULL
    adjacency — one join fanning the (small) delta out by the degree
    of a, one closure equi-join, then a distinct on the found triples
    (a triangle with 2 or 3 new edges is found once per new edge it
    contains; the distinct collapses it to one row).  The full edge
    table is the probe side of both joins and is never re-enumerated
    into wedges — that is the difference from rerunning
    :func:`triangle_count` per batch.

    ``broadcast_delta=True`` (default) pins the delta side (and the
    wedges grown from it) as the broadcast build side of both joins, so
    the full adjacency is only ever SCANNED in place — never shuffled.
    This is THE scale property of the incremental fold: a micro-batch
    is small by definition, while shuffling the 10^12-edge adjacency to
    join it would cost more than the full recount.  Pass False for a
    delta too large to broadcast (then AQE picks the strategy — at that
    size a recount is usually the better refresh anyway).
    """
    full = old_half.select("src", "dst").unionByName(new_half.select("src", "dst"))
    e2 = full.unionByName(
        full.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    bcast = F.broadcast if broadcast_delta else (lambda df: df)
    d = bcast(new_half.select(F.col("src").alias("a"), F.col("dst").alias("b")))
    wedge = d.join(
        e2.select(F.col("src").alias("a"), F.col("dst").alias("w")), "a"
    ).filter(F.col("w") != F.col("b"))
    closed = bcast(wedge).join(
        e2.select(F.col("src").alias("b"), F.col("dst").alias("w")), ["b", "w"]
    )
    tri = closed.select(F.array_sort(F.array("a", "b", "w")).alias("t")).distinct()
    return tri.select(
        F.col("t")[0].alias("x"), F.col("t")[1].alias("y"), F.col("t")[2].alias("z")
    )


def triangle_delta_count(
    old_half: DataFrame, new_half: DataFrame, broadcast_delta: bool = True
) -> int:
    """Number of triangles ADDED by ``new_half`` (see
    :func:`new_triangles` for preconditions and plan shape)."""
    return new_triangles(old_half, new_half, broadcast_delta).count()
