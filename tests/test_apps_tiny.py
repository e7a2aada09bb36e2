"""Differential tests: Spark engine vs the numpy oracle on the shipped
reference sample graph (n=128, m=708 — the same fixture every README
example runs on).  Correctness bars from BASELINE.json: PageRank
allclose 1e-6, components/labels exact."""

import numpy as np
import pytest

from ligra_spark import oracle


def _collect_by_id(df, col, n, fill=None):
    rows = {r["id"]: r[col] for r in df.collect()}
    out = [rows.get(i, fill) for i in range(n)]
    return out


# ---------------------------------------------------------------- pagerank
def test_pagerank_matches_oracle(tiny_graph, tiny_edges):
    from ligra_spark.apps import pagerank

    n, src, dst = tiny_edges
    expected, oracle_iters = oracle.pagerank(n, src, dst, max_iters=100)
    got_df, iters = pagerank(tiny_graph, max_iters=100)
    got = np.array(_collect_by_id(got_df, "rank", n))
    assert iters == oracle_iters
    np.testing.assert_allclose(got, expected, atol=1e-6, rtol=0)


def test_pagerank_10iters(tiny_graph, tiny_edges):
    """TestAll.C:139 benchmark shape — fixed 10 iterations."""
    from ligra_spark.apps import pagerank

    n, src, dst = tiny_edges
    expected, _ = oracle.pagerank(n, src, dst, max_iters=10)
    got_df, iters = pagerank(tiny_graph, max_iters=10)
    got = np.array(_collect_by_id(got_df, "rank", n))
    assert iters == 10
    np.testing.assert_allclose(got, expected, atol=1e-6, rtol=0)


def test_pagerank_delta_matches_oracle(tiny_graph, tiny_edges):
    from ligra_spark.apps import pagerank_delta

    n, src, dst = tiny_edges
    expected, oracle_iters = oracle.pagerank_delta(n, src, dst)
    got_df, iters = pagerank_delta(tiny_graph)
    got = np.array(_collect_by_id(got_df, "rank", n))
    assert iters == oracle_iters
    np.testing.assert_allclose(got, expected, atol=1e-6, rtol=0)


# ---------------------------------------------------------------- components
def test_components_exact(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import components

    n, src, dst = tiny_sym
    expected = oracle.components(n, src, dst)
    got_df, _ = components(tiny_graph_sym)
    got = np.array(_collect_by_id(got_df, "component", n))
    np.testing.assert_array_equal(got, expected)


def test_label_propagation_exact(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import label_propagation

    n, src, dst = tiny_sym
    expected, _ = oracle.label_propagation(n, src, dst)
    got_df, _ = label_propagation(tiny_graph_sym)
    got = np.array(_collect_by_id(got_df, "label", n))
    np.testing.assert_array_equal(got, expected)
    # invariant: LP fixpoint == CC labels (Components-Shortcut.C:25-27)
    np.testing.assert_array_equal(got, oracle.components(n, src, dst))


# ---------------------------------------------------------------- triangle
def test_triangle_count_exact(tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import triangle_count

    n, src, dst = tiny_sym
    expected = oracle.triangle_count(n, src, dst)
    assert triangle_count(tiny_graph_sym) == expected


def test_per_vertex_triangles_numpy_exact(tiny_graph_sym, tiny_sym):
    """Per-vertex counts sum to 3x the global count and match a brute
    numpy adjacency-intersection oracle; lcc = 2*tri/(d*(d-1))."""
    import numpy as np

    from ligra_spark.apps import per_vertex_triangles, triangle_count

    n, src, dst = tiny_sym
    adj = np.zeros((n, n), dtype=bool)
    adj[src, dst] = True
    np.fill_diagonal(adj, False)
    # per-vertex triangles = diag(A^3) / 2 on the boolean-symmetric graph
    a = adj.astype(np.int64)
    tri = np.diag(a @ a @ a) // 2
    deg = a.sum(1)
    with np.errstate(divide="ignore", invalid="ignore"):
        lcc = np.where(deg >= 2, 2.0 * tri / (deg * (deg - 1.0)), 0.0)
    pdf = per_vertex_triangles(tiny_graph_sym).toPandas().sort_values("id")
    np.testing.assert_array_equal(pdf["triangles"].to_numpy(), tri)
    np.testing.assert_allclose(
        pdf["lcc"].to_numpy(), np.round(lcc, 8), atol=1e-8, rtol=0
    )
    assert int(pdf["triangles"].sum()) == 3 * triangle_count(tiny_graph_sym)


# ---------------------------------------------------------------- bfs
def test_bfs_levels(tiny_graph, tiny_edges):
    from ligra_spark.apps import bfs_levels

    n, src, dst = tiny_edges
    expected = oracle.bfs_levels(n, src, dst, root=0)
    got_df, _ = bfs_levels(tiny_graph, root=0)
    got = np.array(_collect_by_id(got_df, "level", n, fill=-1))
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------- weighted
def test_bellman_ford(spark, tiny_edges):
    from ligra_spark.apps import bellman_ford
    from ligra_spark.graph import LinkGraph
    from tests.conftest import edges_df

    n, src, dst = tiny_edges
    rng = np.random.default_rng(3)
    w = rng.integers(1, 8, size=len(src)).astype(np.int64)
    expected = oracle.bellman_ford(n, src, dst, w, root=0)
    g = LinkGraph.from_edges(spark, edges_df(spark, src, dst, w), n=n).materialize()
    got_df, _ = bellman_ford(g, root=0)
    INF = np.iinfo(np.int64).max
    got = np.array(_collect_by_id(got_df, "dist", n, fill=INF))
    np.testing.assert_array_equal(got, expected)
    g.unpersist()


# ---------------------------------------------------------------- kcore
def test_kcore_fork_quirk(tiny_graph_sym, tiny_sym):
    """max_k = min(n, 10) cap (KCore.C:87)."""
    from ligra_spark.apps import kcore

    n, src, dst = tiny_sym
    expected = oracle.kcore(n, src, dst, max_k=10)
    got_df, _ = kcore(tiny_graph_sym, max_k=10)
    got = np.array(_collect_by_id(got_df, "core", n))
    np.testing.assert_array_equal(got, expected)


def test_pagerank_weighted_numpy_exact(spark):
    """Weighted PageRank == numpy transcription (share = rank/sum_w,
    per-edge multiply by weight, no dangling redistribution); the
    unit-weight case degenerates to unweighted pagerank."""
    import numpy as np
    import pandas as pd

    from ligra_spark.apps import pagerank, pagerank_weighted
    from ligra_spark.graph import LinkGraph

    rng_src = np.array([0, 0, 1, 2, 2, 3, 4, 4, 2], dtype=np.int64)
    rng_dst = np.array([1, 2, 2, 0, 3, 4, 0, 2, 2], dtype=np.int64)
    w = np.array([3, 1, 2, 5, 1, 4, 2, 1, 7], dtype=np.int64)
    n, iters = 6, 12  # vertex 5 isolated; fixed depth

    def np_wpr():
        rank = np.full(n, 1.0 / n)
        wout = np.zeros(n)
        np.add.at(wout, rng_src, w.astype(float))
        for _ in range(iters):
            contrib = np.zeros(n)
            share = np.zeros(n)
            nz = wout > 0
            share[nz] = rank[nz] / wout[nz]
            np.add.at(contrib, rng_dst, share[rng_src] * w)
            rank = 0.85 * contrib + 0.15 / n
        return rank

    edges = spark.createDataFrame(
        pd.DataFrame({"src": rng_src, "dst": rng_dst, "weight": w})
    )
    g = LinkGraph.from_edges(spark, edges, n=n, num_partitions=4).materialize()
    got_df, it = pagerank_weighted(g, max_iters=iters, epsilon=0)
    assert it == iters
    got = got_df.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(got, np_wpr(), atol=1e-12, rtol=0)
    g.unpersist()

    # unit weights == unweighted pagerank at the same depth
    edges1 = spark.createDataFrame(
        pd.DataFrame({"src": rng_src, "dst": rng_dst, "weight": np.ones_like(w)})
    )
    g1 = LinkGraph.from_edges(spark, edges1, n=n, num_partitions=4).materialize()
    got1, _ = pagerank_weighted(g1, max_iters=iters, epsilon=0)
    base, _ = pagerank(g1, max_iters=iters, epsilon=0.0)
    a = got1.toPandas().sort_values("id")["rank"].to_numpy()
    b = base.toPandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-12, rtol=0)
    g1.unpersist()


def test_graph_stats_numpy_exact(tiny_graph, tiny_graph_sym, tiny_edges, tiny_sym):
    """Reciprocity and assortativity match direct numpy computation."""
    import numpy as np

    from ligra_spark.apps import degree_assortativity, reciprocity

    n, src, dst = tiny_edges
    pairs = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    rec = sum(1 for a, b in pairs if (b, a) in pairs)
    row = reciprocity(tiny_graph).collect()[0]
    assert row["edges"] == len(pairs)
    assert row["reciprocated"] == rec
    assert abs(row["reciprocity"] - round(rec / len(pairs), 8)) < 1e-12

    ns, ss, ds = tiny_sym
    # distinct non-loop symmetric edge list (matches graph builder)
    es = np.unique(np.stack([ss, ds], 1), axis=0)
    es = es[es[:, 0] != es[:, 1]]
    deg = np.bincount(es[:, 0], minlength=ns)
    x = deg[es[:, 0]].astype(np.float64)
    y = deg[es[:, 1]].astype(np.float64)
    m = len(es)
    num = (x * y).sum() - x.sum() * y.sum() / m
    den = np.sqrt(
        ((x * x).sum() - x.sum() ** 2 / m) * ((y * y).sum() - y.sum() ** 2 / m)
    )
    row = degree_assortativity(tiny_graph_sym).collect()[0]
    assert row["pairs"] == m
    assert abs(row["assortativity"] - round(num / den, 8)) < 1e-8


def test_random_walks_numpy_replay(tiny_graph_sym, tiny_sym, spark):
    """Walks replay exactly from the counter-hash stream: engine- and
    partitioning-independent; degree-0 landings freeze."""
    from collections import defaultdict

    import numpy as np

    from ligra_spark.apps import random_walks
    from ligra_spark.hashing import hash_int32

    n, s, d = tiny_sym
    starts = spark.range(8)
    got = (
        random_walks(tiny_graph_sym, starts, walks_per_start=2, length=4, seed=7)
        .toPandas()
        .sort_values(["walk", "step"])
    )
    assert len(got) == 8 * 2 * 5
    es = np.unique(np.stack([s, d], 1), axis=0)
    adj = defaultdict(list)
    for a, b in es:
        adj[int(a)].append(int(b))
    stride = 5
    for start in range(8):
        for rep in range(2):
            w, x, seq = start * 2 + rep, start, [start]
            for j in range(1, stride):
                h = int(hash_int32(np.uint32((w * stride + j + 7) & 0xFFFFFFFF)))
                nbrs = sorted(adj.get(x, []))
                if nbrs:
                    x = nbrs[h % len(nbrs)]
                seq.append(x)
            assert got[got.walk == w].sort_values("step")["id"].tolist() == seq


def test_ktruss_numpy_exact(tiny_graph_sym, tiny_sym):
    """Fixed-k truss == numpy peel-until-stable on the canonical edge
    set, for k where the result is non-trivial, shrinking, and empty."""
    import numpy as np

    from ligra_spark.apps import ktruss

    n, s, d = tiny_sym

    def np_ktruss(k):
        E = {(int(a), int(b)) for a, b in zip(s, d) if a < b}
        changed, rounds = True, 0
        while changed and E:
            rounds += 1
            adj = {}
            for a, b in E:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            keep = {
                (a, b) for (a, b) in E if len(adj[a] & adj[b]) >= k - 2
            }
            changed = keep != E
            E = keep
        return E, rounds

    for k in (3, 4, 5):
        want, rounds = np_ktruss(k)
        e, r = ktruss(tiny_graph_sym, k)
        got = {tuple(x) for x in e.toPandas().to_numpy()}
        assert got == want, k
        assert r == rounds, (k, r, rounds)


def test_truss_decomposition_numpy_exact(tiny_graph_sym, tiny_sym):
    """Per-edge trussness == numpy nested peel (for each edge the max k
    whose k-truss contains it), over the full canonical edge set."""
    from ligra_spark.apps import truss_decomposition

    n, s, d = tiny_sym

    def np_trussness():
        E = {(int(a), int(b)) for a, b in zip(s, d) if a < b}
        t = {e: 2 for e in E}
        k = 3
        while E:
            changed = True
            while changed and E:
                adj = {}
                for a, b in E:
                    adj.setdefault(a, set()).add(b)
                    adj.setdefault(b, set()).add(a)
                keep = {(a, b) for (a, b) in E if len(adj[a] & adj[b]) >= k - 2}
                changed = keep != E
                for e in E - keep:
                    t[e] = k - 1
                E = keep
            k += 1
        return t

    want = np_trussness()
    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in truss_decomposition(tiny_graph_sym)[0].collect()
    }
    assert got == want


def test_kclique_count_matches_numpy(tiny_graph_sym, tiny_sym):
    """k-clique counts (k=3,4,5) == brute-force enumeration over the
    adjacency sets; k=3 must equal triangle_count."""
    from itertools import combinations

    from ligra_spark.apps import kclique_count, triangle_count

    n, s, d = tiny_sym
    adj = {}
    for a, b in zip(s, d):
        if a != b:
            adj.setdefault(int(a), set()).add(int(b))

    def brute(k):
        nodes = sorted(adj)
        cnt = 0
        # grow cliques ordered by id over the undirected adjacency
        def grow(cl, cand):
            nonlocal cnt
            if len(cl) == k:
                cnt += 1
                return
            for w in sorted(cand):
                grow(cl + [w], cand & adj[w] & {x for x in adj if x > w})
        for v in nodes:
            grow([v], adj[v] & {x for x in adj if x > v})
        return cnt

    assert kclique_count(tiny_graph_sym, 3) == triangle_count(tiny_graph_sym)
    for k in (3, 4, 5):
        assert kclique_count(tiny_graph_sym, k) == brute(k), k
