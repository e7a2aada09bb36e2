"""Hypergraph apps — HyperBFS and HyperCC
(``/root/reference/apps/hyper/HyperBFS.C:43-67``,
``/root/reference/apps/hyper/HyperCC.C:30-56``) on the bipartite
two-stage engine (``ligra_spark.hygra``).

HyperBFS alternates vertexProp / hyperedgeProp half-steps from a root
vertex; the reference stores race-dependent first-visitor parents, so
(as with plain BFS) we output the race-free invariant: the bipartite
level — vertices at even levels 0,2,4,…, hyperedges at odd levels.

HyperCC alternates min-label half-steps (vertex labels init to own id,
hyperedge labels init to +inf / ``UINT_E_MAX``) until no label
changes; the fixpoint labels every node with the minimum member-vertex
id of its bipartite component (deterministic, unlike the per-round
race in ``CC_Update_F``'s writeMin — same fixpoint though).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import IterState
from ..hygra import HyperGraph, hyperedge_prop, vertex_prop

__all__ = ["hyper_bfs", "hyper_cc"]


def _tagged_union(v_df: DataFrame, h_df: DataFrame, col: str) -> DataFrame:
    return (
        v_df.select(F.lit("v").alias("kind"), "id", col)
        .unionByName(h_df.select(F.lit("h").alias("kind"), "id", col))
    )


def hyper_bfs(
    hg: HyperGraph,
    root: int = 0,
    max_iters: int | None = None,
    on_superstep=None,
) -> tuple[DataFrame, int]:
    """Returns ((kind, id, level) for REACHED nodes — kind 'v'/'h',
    level = bipartite BFS distance — and half-steps run)."""
    stv = IterState(
        hg.vertices.select(
            "id",
            F.when(F.col("id") == root, F.lit(0)).cast("int").alias("level"),
        ),
        num_partitions=hg.num_partitions,
    )
    sth = IterState(
        hg.hyperedges.select("id", F.lit(None).cast("int").alias("level")),
        num_partitions=hg.num_partitions,
    )
    steps, fsize, vlvl = 0, 1, 0
    limit = max_iters if max_iters is not None else hg.nv + hg.nh
    while fsize > 0 and steps < limit:
        # vertex → hyperedge half-step
        frontier = stv.df.filter(F.col("level") == vlvl).select("id")
        msgs = vertex_prop(hg, frontier, F.lit(1), F.min, frontier_size=fsize)
        hlvl = vlvl + 1
        newh = sth.df.join(msgs.hint("shuffle_hash"), "id", "left").select(
            "id",
            F.when(F.col("level").isNull() & F.col("agg").isNotNull(), F.lit(hlvl))
            .otherwise(F.col("level"))
            .cast("int")
            .alias("level"),
        )
        _, fsize = sth.advance(
            newh, action=lambda df: df.filter(F.col("level") == hlvl).count()
        )
        steps += 1
        if on_superstep:
            on_superstep(steps, {"phase": "v->h", "frontier": fsize})
        if fsize == 0:
            break
        # hyperedge → vertex half-step
        hfrontier = sth.df.filter(F.col("level") == hlvl).select("id")
        msgs = hyperedge_prop(hg, hfrontier, F.lit(1), F.min, frontier_size=fsize)
        nxt = hlvl + 1
        newv = stv.df.join(msgs.hint("shuffle_hash"), "id", "left").select(
            "id",
            F.when(F.col("level").isNull() & F.col("agg").isNotNull(), F.lit(nxt))
            .otherwise(F.col("level"))
            .cast("int")
            .alias("level"),
        )
        _, fsize = stv.advance(
            newv, action=lambda df: df.filter(F.col("level") == nxt).count()
        )
        steps += 1
        vlvl = nxt
        if on_superstep:
            on_superstep(steps, {"phase": "h->v", "frontier": fsize})
    out = _tagged_union(
        stv.df.filter(F.col("level").isNotNull()),
        sth.df.filter(F.col("level").isNotNull()),
        "level",
    )
    return out, steps


def hyper_cc(
    hg: HyperGraph,
    max_iters: int | None = None,
    on_superstep=None,
) -> tuple[DataFrame, int]:
    """Returns ((kind, id, label) over all nv + nh nodes, half-steps).
    Hyperedges with no members keep a NULL label (the reference's
    untouched ``UINT_E_MAX`` slot)."""
    stv = IterState(
        hg.vertices.select("id", F.col("id").alias("label")),
        num_partitions=hg.num_partitions,
    )
    sth = IterState(
        hg.hyperedges.select("id", F.lit(None).cast("long").alias("label")),
        num_partitions=hg.num_partitions,
    )
    steps = 0
    n_changed_v = hg.nv  # all vertices start "changed" (full frontier)
    limit = max_iters if max_iters is not None else 2 * (hg.nv + hg.nh)
    vfront = stv.df.select("id", "label")
    while n_changed_v > 0 and steps < limit:
        # vertex labels → hyperedges
        msgs = vertex_prop(
            hg, vfront, F.col("label"), F.min,
            frontier_size=n_changed_v, extra_frontier_cols=("label",),
        )
        newh = sth.df.join(msgs.hint("shuffle_hash"), "id", "left").select(
            "id",
            # min(label, agg) with NULL = +inf on the label side
            F.when(
                F.col("agg").isNotNull(),
                F.least(F.coalesce("label", F.col("agg")), F.col("agg")),
            )
            .otherwise(F.col("label"))
            .alias("label"),
            (
                F.col("agg").isNotNull()
                & (F.col("label").isNull() | (F.col("agg") < F.col("label")))
            ).alias("changed"),
        )
        _, n_changed_h = sth.advance(
            newh.select("id", "label", "changed"),
            action=lambda df: df.filter("changed").count(),
        )
        steps += 1
        if on_superstep:
            on_superstep(steps, {"phase": "v->h", "changed": n_changed_h})
        if n_changed_h == 0:
            break
        # hyperedge labels → vertices
        hfront = sth.df.filter("changed").select("id", "label")
        msgs = hyperedge_prop(
            hg, hfront, F.col("label"), F.min,
            frontier_size=n_changed_h, extra_frontier_cols=("label",),
        )
        newv = stv.df.join(msgs.hint("shuffle_hash"), "id", "left").select(
            "id",
            F.when(
                F.col("agg").isNotNull(), F.least(F.col("label"), F.col("agg"))
            )
            .otherwise(F.col("label"))
            .alias("label"),
            (F.col("agg").isNotNull() & (F.col("agg") < F.col("label"))).alias(
                "changed"
            ),
        )
        _, n_changed_v = stv.advance(
            newv.select("id", "label", "changed"),
            action=lambda df: df.filter("changed").count(),
        )
        steps += 1
        if on_superstep:
            on_superstep(steps, {"phase": "h->v", "changed": n_changed_v})
        vfront = stv.df.filter("changed").select("id", "label")
    out = _tagged_union(
        stv.df.select("id", "label"), sth.df.select("id", "label"), "label"
    )
    return out, steps
