"""k-truss decomposition (fixed k) — the maximal subgraph in which
every edge closes at least k−2 triangles inside the subgraph.  The
standard cohesive-subgraph operator between k-core (too loose) and
clique (too strict); on a web graph it isolates genuinely dense
communities from star-shaped hub neighborhoods, which k-core keeps.

Not a reference app; it composes the reference's two densest
primitives — Triangle.C's id-ordered triangle enumeration and
KCore.C's peel-until-stable schedule — into the canonical truss
fixpoint: repeatedly drop every edge with support < k−2, where
support counts triangles in the CURRENT surviving edge set.

Physical shape per round, all on the canonical (u < v) half of the
symmetric edge set:

    wedges    e(u,v) ⋈ e(v,w)           (u<v<w by construction)
    triangles wedges ⋈ e ON (u,w)       (closure check)
    support   explode the 3 edges per triangle → groupBy count
    survive   e ⋈ support, keep cnt ≥ k−2

Three joins + one partial-agg'd explode per round — the triangle plan
the engine already runs, re-evaluated on a shrinking edge set (rounds
are few in practice: most web-graph edges die in round 1).  The
driver sync per round is one count of removed edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ktruss"]


def _support(e: DataFrame) -> DataFrame:
    """(src, dst, cnt): per canonical edge, triangles it closes within
    the canonical edge set ``e`` (u<v rows)."""
    a = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = (
        a.join(b, "v")
        .join(e.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"])
    )
    edges3 = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
                F.struct(F.col("v").alias("src"), F.col("w").alias("dst")),
                F.struct(F.col("u").alias("src"), F.col("w").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return edges3.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))


def ktruss(graph, k: int, max_rounds: int = 100) -> tuple[DataFrame, int]:
    """Returns (surviving canonical (src, dst) edges with src < dst,
    rounds run).  Requires graph.symmetric; k >= 2 (k == 2 keeps every
    edge that closes no triangle too, i.e. the graph itself)."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    spark = graph.edges.sparkSession
    need = k - 2
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .repartition(graph.num_partitions, "src")
        .persist()
    )
    n_old = e.count()
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        kept = (
            e.join(_support(e), ["src", "dst"], "left")
            .filter(F.coalesce("cnt", F.lit(0)) >= need)
            .select("src", "dst")
            .repartition(graph.num_partitions, "src")
            .persist()
        )
        # one driver sync per round: did anything die?
        n_new = kept.count()
        e.unpersist()
        e = kept
        if n_new == n_old or n_new == 0:
            break
        n_old = n_new
    return e, rounds
