"""Unit tests for the secondary engine operators (edgeMapInduced /
edgeMapFilter / packEdges analogs) against numpy ground truth."""

import numpy as np
from pyspark.sql import functions as F


def test_edge_map_induced_multiset(tiny_graph, tiny_edges):
    from ligra_spark.engine import edge_map_induced

    n, src, dst = tiny_edges
    frontier = tiny_graph.vertices.filter(F.col("id") < 5)
    out = edge_map_induced(tiny_graph, frontier).collect()
    mask = src < 5
    assert len(out) == int(mask.sum())  # duplicates preserved
    got = sorted((r["src"], r["dst"]) for r in out)
    exp = sorted(zip(src[mask].tolist(), dst[mask].tolist()))
    assert got == exp


def test_edge_map_filter_counts(tiny_graph, tiny_edges):
    from ligra_spark.engine import edge_map_filter

    n, src, dst = tiny_edges
    frontier = tiny_graph.vertices
    out = {
        r["id"]: r["degree"]
        for r in edge_map_filter(tiny_graph, frontier, F.col("dst") % 2 == 0).collect()
    }
    for v in range(n):
        exp = int(((src == v) & (dst % 2 == 0)).sum())
        assert out.get(v, 0) == exp


def test_pack_edges_filters_graph(spark, tiny_graph, tiny_edges):
    from ligra_spark.engine import pack_edges

    n, src, dst = tiny_edges
    g2 = pack_edges(tiny_graph, F.col("dst") != 0)
    assert g2.m == int((dst != 0).sum())
    assert g2.edges.filter(F.col("dst") == 0).count() == 0
    # degrees reflect the packed adjacency
    deg0 = {r["id"]: r["outdeg"] for r in g2.out_degrees.collect()}
    exp = np.bincount(src[dst != 0], minlength=n)
    for v in range(n):
        assert deg0[v] == int(exp[v])
    g2.unpersist()


def test_cut_lineage_preserves_data_and_resets_stats(spark):
    """cut_lineage: same rows/schema, and the re-rooted plan's leaf
    statistics are the bounded default (Long.Max) instead of the
    origin plan's computed product — the guard against the BigInt
    stats blowup in many-self-reference loops (see apps/ktruss.py)."""
    from pyspark.sql import functions as F

    from ligra_spark.engine import cut_lineage

    df = spark.range(500).select("id", (F.col("id") % 7).alias("k"))
    joined = df.alias("a").join(
        df.selectExpr("id", "k as k2"), "id"
    )  # plan with computed (non-default) stats
    cut = cut_lineage(joined)
    assert cut.schema == joined.schema
    assert sorted(r["id"] for r in cut.collect()) == list(range(500))
    stats = int(cut._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert stats == (1 << 63) - 1, stats
