"""Differential tests for the round-1 stretch apps (BC, Radii, MIS)
on the reference sample graph."""

import numpy as np

from ligra_spark import oracle


def _by_id(df, col, n, fill=None):
    rows = {r["id"]: r[col] for r in df.collect()}
    return [rows.get(i, fill) for i in range(n)]


def test_bc_matches_oracle(tiny_graph, tiny_edges):
    from ligra_spark.apps import bc_single_source

    n, src, dst = tiny_edges
    expected = oracle.bc_single_source(n, src, dst, root=0)
    got_df, _ = bc_single_source(tiny_graph, root=0)
    got = np.array(_by_id(got_df, "bc", n, fill=0.0))
    np.testing.assert_allclose(got, expected, atol=1e-6, rtol=0)


def test_radii_matches_oracle(tiny_graph, tiny_edges):
    from ligra_spark.apps import radii

    n, src, dst = tiny_edges
    expected, oracle_rounds = oracle.radii(n, src, dst)
    got_df, rounds = radii(tiny_graph)
    got = np.array(_by_id(got_df, "radii", n))
    assert rounds == oracle_rounds
    np.testing.assert_array_equal(got, expected)


def test_mis_matches_oracle(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import mis

    n, src, dst = tiny_sym
    expected = oracle.mis_lex_first(n, src, dst)
    got_df, _ = mis(tiny_graph_sym)
    got = np.array(_by_id(got_df, "in_set", n))
    np.testing.assert_array_equal(got, expected)


def test_cf_matches_oracle(spark, tiny_sym):
    import numpy as np
    from ligra_spark.apps import cf_sgd
    from ligra_spark.graph import LinkGraph
    from tests.conftest import edges_df

    n, src, dst = tiny_sym
    w = 1 + (np.minimum(src, dst) * 31 + np.maximum(src, dst)) % 5
    expected = oracle.cf_sgd(n, src, dst, w)
    g = LinkGraph.from_edges(
        spark, edges_df(spark, src, dst, w), n=n, symmetric=True
    ).materialize()
    got_df, _ = cf_sgd(g)
    rows = {r["id"]: r["latent"] for r in got_df.collect()}
    got = np.array([rows[i] for i in range(n)])
    np.testing.assert_allclose(got, expected, atol=1e-9, rtol=0)
    g.unpersist()


def test_ecc_fm_matches_oracle(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import ecc_fm

    n, src, dst = tiny_sym
    expected, oracle_rounds = oracle.ecc_fm(n, src, dst, length=2, seed=0)
    got_df, rounds = ecc_fm(tiny_graph_sym, length=2, seed=0)
    got = np.array(_by_id(got_df, "ecc", n))
    assert rounds == oracle_rounds
    np.testing.assert_array_equal(got, expected)


def test_fm_masks_deterministic_and_geometric():
    m1 = oracle.fm_masks(256, length=2, seed=0)
    m2 = oracle.fm_masks(256, length=2, seed=0)
    np.testing.assert_array_equal(m1, m2)
    # every vertex has exactly one bit per 32-bit word
    for j in range(2):
        word = (m1 >> (32 * j)) & 0xFFFFFFFF
        pop = np.array([bin(int(w)).count("1") for w in word])
        np.testing.assert_array_equal(pop, np.ones(256))
    assert len(set(m1.tolist())) > 10  # masks vary across vertices


def test_ecc_loglog_matches_oracle(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import ecc_loglog

    n, src, dst = tiny_sym
    expected, oracle_rounds = oracle.ecc_loglog(n, src, dst, seed=0)
    got_df, rounds = ecc_loglog(tiny_graph_sym, seed=0)
    got = np.array(_by_id(got_df, "ecc", n))
    assert rounds == oracle_rounds
    np.testing.assert_array_equal(got, expected)
