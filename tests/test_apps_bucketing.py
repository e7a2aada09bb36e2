"""Differential tests for the bucketing-layer apps (Δ-stepping,
Julienne k-core) and the BFS-shaped CC/eccentricity apps, on the
reference sample graph (n=128, m=708)."""

import numpy as np

from ligra_spark import oracle
from tests.conftest import edges_df


def _by_id(df, col, n, fill=None):
    rows = {r["id"]: r[col] for r in df.collect()}
    return [rows.get(i, fill) for i in range(n)]


def test_bfscc_equals_components(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import bfscc

    n, src, dst = tiny_sym
    expected = oracle.components(n, src, dst)
    got_df, rounds = bfscc(tiny_graph_sym)
    got = np.array(_by_id(got_df, "label", n))
    np.testing.assert_array_equal(got, expected)
    assert rounds > 0


def test_delta_stepping_exact_sssp(spark, tiny_sym):
    from ligra_spark.apps import bellman_ford, delta_stepping
    from ligra_spark.graph import LinkGraph

    n, src, dst = tiny_sym
    w = 1 + (src * 7 + dst) % 5
    expected = oracle.bellman_ford(n, src, dst, w, root=0)
    g = LinkGraph.from_edges(
        spark, edges_df(spark, src, dst, w), n=n, symmetric=True
    ).materialize()
    for delta in (1, 3, 16):
        got_df, steps = delta_stepping(g, root=0, delta=delta)
        got = np.array(_by_id(got_df, "dist", n, fill=np.iinfo(np.int64).max))
        np.testing.assert_array_equal(got, expected)
        assert steps > 0
    # same fixpoint as the Bellman-Ford app
    bf_df, _ = bellman_ford(g, root=0)
    bf = np.array(_by_id(bf_df, "dist", n, fill=np.iinfo(np.int64).max))
    np.testing.assert_array_equal(bf, expected)
    g.unpersist()


def test_kcore_julienne_full_coreness(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import kcore_julienne

    n, src, dst = tiny_sym
    expected = oracle.kcore(n, src, dst, max_k=None)
    got_df, steps = kcore_julienne(tiny_graph_sym)
    got = np.array(_by_id(got_df, "core", n))
    np.testing.assert_array_equal(got, expected)
    assert steps > 0


def _ecc_oracle(n, src, dst, sources):
    """max BFS distance from any reaching source (numpy, per-source)."""
    ecc = np.full(n, -1, dtype=np.int64)
    for s in sources:
        level = np.full(n, -1, dtype=np.int64)
        level[s] = 0
        frontier = np.array([s])
        it = 0
        while frontier.size:
            it += 1
            m = np.isin(src, frontier)
            nxt = np.unique(dst[m])
            nxt = nxt[level[nxt] < 0]
            level[nxt] = it
            frontier = nxt
        reached = level >= 0
        ecc[reached] = np.maximum(ecc[reached], level[reached])
    return ecc


def test_ecc_estimate_matches_multibfs(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import ecc_estimate

    n, src, dst = tiny_sym
    sources = list(range(8))
    expected = _ecc_oracle(n, src, dst, sources)
    got_df, _ = ecc_estimate(tiny_graph_sym, sources=sources)
    got = np.array(_by_id(got_df, "ecc", n, fill=-1))
    np.testing.assert_array_equal(got, expected)


def test_setcover_matches_oracle(tiny_graph, tiny_edges):
    from ligra_spark.apps import setcover

    n, src, dst = tiny_edges
    exp_cover, exp_rounds = oracle.setcover(n, src, dst)
    got_df, rounds = setcover(tiny_graph)
    got = np.array(_by_id(got_df, "in_cover", n))
    np.testing.assert_array_equal(got, exp_cover)
    assert rounds == exp_rounds
    # validity: cover sets' out-neighbors cover every element with an in-edge
    covered = np.array(_by_id(got_df, "covered", n))
    has_in = np.zeros(n, dtype=bool)
    has_in[dst] = True
    assert bool((covered | ~has_in).all())
