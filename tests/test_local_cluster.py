"""Nibble + HeatKernel vs direct numpy transcriptions of
``apps/localAlg/Nibble-Serial.C:40-73`` and
``apps/localAlg/HeatKernel-Parallel.C:94-181`` on the shipped
128-vertex symmetric sample graph."""

import math

import numpy as np
import pytest


def _csr(n, src, dst):
    order = np.argsort(src, kind="stable")
    s2, d2 = src[order], dst[order]
    starts = np.searchsorted(s2, np.arange(n + 1))
    deg = np.bincount(src, minlength=n).astype(np.int64)
    return starts, d2, deg


def _numpy_nibble(n, src, dst, seed, eps, T):
    """Nibble-Serial.C:53-72: truncated lazy random walk, T rounds."""
    starts, d2, deg = _csr(n, src, dst)
    if deg[seed] == 0:
        return np.zeros(n), 0
    q = np.zeros(n)
    q[seed] = 1.0
    rounds = 0
    for _ in range(T):
        f = np.flatnonzero((deg > 0) & (q > deg * eps))
        if len(f) == 0:
            break
        rounds += 1
        qn = np.zeros(n)
        for v in f:
            qn[v] += q[v] / 2
            nb = d2[starts[v] : starts[v + 1]]
            np.add.at(qn, nb, q[v] / (2 * deg[v]))
        q = qn
    return q, rounds


def _numpy_hk(n, src, dst, seed, t, eps, N):
    """HeatKernel-Parallel.C:94-181: synchronous hk-relax, N terms."""
    starts, d2, deg = _csr(n, src, dst)
    if deg[seed] == 0:
        return np.zeros(n), 0
    fact = [math.factorial(k) for k in range(N)]
    psis = [
        sum(fact[k] * t ** m / math.factorial(m + k) for m in range(N - k))
        for k in range(N)
    ]
    constant = math.exp(t) * eps / (2 * N)
    x = np.zeros(n)
    r = np.zeros(n)
    r[seed] = 1.0
    frontier = np.array([seed])
    j = 0
    while len(frontier) > 0:
        x[frontier] += r[frontier]
        if j + 1 < N:
            rn = np.zeros(n)
            for v in frontier:
                nb = d2[starts[v] : starts[v + 1]]
                np.add.at(rn, nb, (t / (j + 1)) * r[v] / deg[v])
            r = rn
            # r > 0 ⇔ membership in the reference's sparse r map —
            # activeF scans r.entries(), not all n vertices
            frontier = np.flatnonzero((r > 0) & (r >= deg * constant / psis[j + 1]))
            j += 1
        else:
            for v in frontier:
                nb = d2[starts[v] : starts[v + 1]]
                np.add.at(x, nb, r[v] / deg[v])
            j += 1
            break
    return x, j


@pytest.mark.parametrize("eps,T", [(1e-3, 10), (1e-6, 10), (1e-4, 3)])
def test_nibble_matches_reference_transcription(spark, tiny_graph_sym, tiny_sym, eps, T):
    from ligra_spark.apps import nibble

    n, src, dst = tiny_sym
    seeds = [0, 5, 17]
    state, rounds = nibble(tiny_graph_sym, seeds, epsilon=eps, max_rounds=T)
    got = {(r["seed"], r["id"]): r["q"] for r in state.collect()}

    max_rounds = 0
    for s in seeds:
        q, rds = _numpy_nibble(n, src, dst, s, eps, T)
        max_rounds = max(max_rounds, rds)
        touched = np.flatnonzero(q > 0)
        for v in touched:
            assert got[(s, int(v))] == pytest.approx(q[v], abs=1e-12), (s, v)
        extra = {k for k in got if k[0] == s} - {(s, int(v)) for v in touched}
        assert not extra
    assert rounds == max_rounds


@pytest.mark.parametrize(
    "t,eps,N", [(3.0, 1e-9, 1), (3.0, 1e-4, 3), (2.0, 1e-6, 4), (3.0, 1e-2, 5)]
)
def test_heat_kernel_matches_reference_transcription(
    spark, tiny_graph_sym, tiny_sym, t, eps, N
):
    from ligra_spark.apps import heat_kernel

    n, src, dst = tiny_sym
    seeds = [0, 5, 17]
    state, levels = heat_kernel(
        tiny_graph_sym, seeds, t=t, epsilon=eps, n_terms=N
    )
    got = {(r["seed"], r["id"]): r["x"] for r in state.collect()}

    max_levels = 0
    for s in seeds:
        x, j = _numpy_hk(n, src, dst, s, t, eps, N)
        max_levels = max(max_levels, j)
        touched = np.flatnonzero(x > 0)
        for v in touched:
            assert got[(s, int(v))] == pytest.approx(x[v], abs=1e-12), (s, v)
        extra = {k for k in got if k[0] == s} - {(s, int(v)) for v in touched}
        assert not extra
    assert levels == max_levels


def test_heat_kernel_psis_match_reference_loop():
    """psis from the module == the C loop transcription, several (t, N)."""
    from ligra_spark.apps import heat_kernel_psis

    for t, N in [(3.0, 1), (3.0, 5), (0.5, 8)]:
        fact = [math.factorial(k) for k in range(N)]
        want = [
            sum(fact[k] * t ** m / math.factorial(m + k) for m in range(N - k))
            for k in range(N)
        ]
        assert heat_kernel_psis(t, N) == pytest.approx(want, rel=1e-15)


def test_nibble_sweep_composes(spark, tiny_graph_sym, tiny_sym):
    """Nibble's final q feeds the shared sweep cut (Nibble-Serial.C:80
    passes q.entries() to sweepCut) — smoke the composition and its
    invariants (conductance in (0, 1], size <= touched)."""
    import pyspark.sql.functions as F

    from ligra_spark.apps import nibble, ppr_sweep

    # seeds must have degree > 0 (vertex 5 is isolated in the symmetric
    # sample graph — the reference rejects it, and both engines agree
    # to emit nothing, which the transcription test pins)
    state, _ = nibble(tiny_graph_sym, [0, 17], epsilon=1e-5, max_rounds=10)
    res = ppr_sweep(
        tiny_graph_sym, state.select("seed", "id", F.col("q").alias("p"))
    ).collect()
    assert {r["seed"] for r in res} == {0, 17}
    for r in res:
        assert 0 < r["conductance"] <= 1.0
        assert 1 <= r["size_s"] <= r["vol_s"]


@pytest.mark.parametrize("t,K,W", [(3.0, 10, 16), (1.5, 6, 32)])
def test_heat_kernel_rand_matches_oracle_transcription(
    spark, tiny_graph_sym, tiny_sym, t, K, W
):
    """rand-HK-PR endpoint distribution == the oracle-module numpy
    simulation of the same counter-hash spec, exactly (all p values
    are dyadic counts / n_walks)."""
    from ligra_spark.apps import heat_kernel_rand
    from ligra_spark.oracle import heat_kernel_rand as np_hk_rand

    n, src, dst = tiny_sym
    seeds = [0, 5, 17]  # 5 is isolated: rejected by both engines
    res, steps = heat_kernel_rand(
        tiny_graph_sym, seeds, t=t, k_max=K, n_walks=W, seed=7
    )
    got = {(r["seed"], r["id"]): r["p"] for r in res.collect()}
    want = np_hk_rand(n, src, dst, seeds, t=t, k_max=K, n_walks=W, seed=7)
    assert got == want
    assert 0 < steps <= K
    for s in (0, 17):
        assert sum(p for (sv, _), p in got.items() if sv == s) == pytest.approx(1.0)


def test_heat_kernel_rand_probs_are_poisson_pmf():
    from ligra_spark.apps import hk_walk_probs

    probs = hk_walk_probs(3.0, 10)
    assert probs[0] == pytest.approx(math.exp(-3.0))
    assert probs[3] == pytest.approx(math.exp(-3.0) * 27 / 6)
    assert sum(probs) < 1.0  # truncated pmf
