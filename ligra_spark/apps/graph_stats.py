"""Whole-graph structural statistics over the link graph — the
standard first-look numbers for a crawled web graph (reciprocity of
the directed link relation, degree-degree assortativity).  Not
reference apps (the reference's stats are per-app prints); included
because a crawl pipeline reports them per snapshot.

Both are single-pass aggregations with no iteration: one self-join +
count for reciprocity, one edge scan + integer moment sums for
assortativity.  The assortativity Pearson is assembled from EXACT
integer sums (degrees are ints, so Σx, Σxy, ... are exact BIGINTs)
with one final double-precision formula — engine- and
partitioning-independent, unlike streaming corr() accumulators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reciprocity", "degree_assortativity"]


def reciprocity(graph) -> DataFrame:
    """One row (edges, reciprocated, reciprocity): the fraction of
    distinct non-loop directed edges (u,v) whose reverse (v,u) is also
    present — the classic directed-web-graph statistic.

    Plan: distinct non-loop edges once, then a self-join on the
    reversed key — both sides hash-partitioned on the same columns, so
    the join is one shuffle each; counts ride one aggregation.
    """
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    total = e.agg(F.count(F.lit(1)).alias("edges"))
    hits = recip.agg(F.count(F.lit(1)).alias("reciprocated"))
    return total.crossJoin(hits).select(
        "edges",
        "reciprocated",
        F.round(
            F.col("reciprocated").cast("double") / F.col("edges"), 8
        ).alias("reciprocity"),
    )


def degree_assortativity(graph) -> DataFrame:
    """One row (pairs, assortativity): Pearson correlation of the
    degrees at the two ends of every edge (Newman 2002), computed over
    the directed edge list as given — run it on the symmetric graph
    for the standard undirected coefficient (each edge then counted in
    both directions, as Newman defines it).

    The five moment sums are over integer degrees, aggregated exactly
    as BIGINTs (spark sum(long) is exact); only the final closed-form
    division happens in doubles, so the value is bit-stable across
    engines and partitionings.  One degree join per endpoint (the
    degree side is the same co-partitioned table both times) and one
    global agg — no iteration.
    """
    deg = graph.out_degrees.select("id", F.col("outdeg").cast("long").alias("d"))
    e = graph.edges.select("src", "dst")
    xy = (
        e.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("d", "x")
        .join(
            deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "y"),
            "dst",
        )
        .select("x", "y")
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    m = F.col("m").cast("double")
    num = F.col("sxy") - F.col("sx") * F.col("sy") / m
    denx = F.col("sxx") - F.col("sx") * F.col("sx") / m
    deny = F.col("syy") - F.col("sy") * F.col("sy") / m
    return s.select(
        F.col("m").alias("pairs"),
        F.round(num / F.sqrt(denx * deny), 8).alias("assortativity"),
    )
