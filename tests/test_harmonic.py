"""Harmonic centrality (apps/harmonic.py): bit-exact vs a python BFS
transcription on the reference sample graph, estimator/edge cases on
tiny graphs."""

import collections
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ligra_spark.graph import LinkGraph


def _brute_harmonic(n, s, d, sources, max_rounds=24):
    """Same integer-scaled accumulation as the engine."""
    adj = collections.defaultdict(set)
    for a, b in zip(s, d):
        adj[int(a)].add(int(b))
    L = math.lcm(*range(1, max_rounds + 1))
    acc = {v: 0 for v in range(n)}
    for sv in sources:
        dist = {sv: 0}
        q = [sv]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nq.append(w)
            q = nq
        for v, dd in dist.items():
            if dd > 0:
                acc[v] += L // dd
    return {v: acc[v] / float(L) for v in range(n)}


def test_harmonic_bit_exact_on_sample_graph(spark, tiny_sym):
    from ligra_spark.apps import harmonic_from_sources

    n, s, d = tiny_sym
    # deliberately NOT unpersisted: this graph's logical plan is
    # identical to the shared session tiny_graph_sym fixture's (same
    # literal edges, n, partitions) and Spark's CacheManager keys on
    # the plan — unpersisting here would evict the fixture's cache
    # (test_plans asserts on it); see the same note in
    # tests/test_incremental_pr.py
    g = LinkGraph.from_edges(
        spark,
        spark.createDataFrame(pd.DataFrame({"src": s, "dst": d})),
        n=n,
        num_partitions=4,
        symmetric=True,
    ).materialize()
    res, rounds = harmonic_from_sources(g, sources=list(range(16)))
    got = {r["id"]: r["harmonic"] for r in res.collect()}
    exp = _brute_harmonic(n, s, d, list(range(16)))
    assert len(got) == n
    # IEEE-equality, not approx — the integer-scaled accumulation
    # makes the doubles engine-independent
    assert got == exp
    assert rounds >= 1


def test_harmonic_path_graph_values(spark):
    """0-1-2-3 path, source {0}: H = [0, 1, 1/2, 1/3] exactly."""
    from ligra_spark.apps import harmonic_from_sources

    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]
    g = LinkGraph.from_edges(
        spark,
        spark.createDataFrame(edges, "src long, dst long"),
        n=4,
        num_partitions=2,
        symmetric=True,
    ).materialize()
    try:
        res, _ = harmonic_from_sources(g, sources=[0])
        rows = {r["id"]: r for r in res.collect()}
        got = {i: r["harmonic"] for i, r in rows.items()}
        L = math.lcm(*range(1, 25))
        assert got == {0: 0.0, 1: 1.0, 2: (L // 2) / L, 3: (L // 3) / L}
        # closeness companions: 1 source at distances 1, 2, 3
        assert {i: r["closeness"] for i, r in rows.items()} == {
            0: 0.0,
            1: 1.0,
            2: 1 / 2,
            3: 1 / 3,
        }
        assert rows[3]["n_reached"] == 1 and rows[3]["dist_sum"] == 3
        assert rows[0]["n_reached"] == 0 and rows[0]["dist_sum"] == 0
    finally:
        g.unpersist()


def test_harmonic_unreached_and_duplicate_sources(spark):
    """Disconnected vertex stays 0.0; a repeated source id collapses to
    one wave (no double counting)."""
    from ligra_spark.apps import harmonic_from_sources

    edges = [(0, 1), (1, 0), (2, 3), (3, 2)]
    g = LinkGraph.from_edges(
        spark,
        spark.createDataFrame(edges, "src long, dst long"),
        n=5,
        num_partitions=2,
        symmetric=True,
    ).materialize()
    try:
        res, _ = harmonic_from_sources(g, sources=[0, 0, 2])
        got = {r["id"]: r["harmonic"] for r in res.collect()}
        assert got[4] == 0.0  # isolated
        assert got[1] == 1.0  # reached once by the collapsed 0-wave
        assert got[3] == 1.0
        assert got[0] == 0.0 and got[2] == 0.0  # no self-contribution
    finally:
        g.unpersist()


def test_harmonic_guards(spark):
    from ligra_spark.apps import harmonic_from_sources

    g = LinkGraph.from_edges(
        spark,
        spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long"),
        n=2,
        num_partitions=2,
        symmetric=True,
    )
    with pytest.raises(ValueError, match="64"):
        harmonic_from_sources(g, sources=list(range(65)))
    # round-4 guard: 64*lcm must stay inside double's exact-int range
    with pytest.raises(ValueError, match="2\\^53"):
        harmonic_from_sources(g, sources=[0], max_rounds=32)
