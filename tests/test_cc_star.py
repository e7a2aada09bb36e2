"""Two-phase (large-star/small-star) CC — equivalence with min-label
components, diameter-independent round count, kill/resume."""

import numpy as np
import pytest


def _graph(spark, src, dst, n):
    from ligra_spark.graph import LinkGraph
    from tests.conftest import edges_df

    return LinkGraph.from_edges(
        spark, edges_df(spark, src, dst), n=n, symmetric=True
    ).materialize()


def _numpy_cc(n, src, dst):
    """Union-find ground truth: component = min id."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src.tolist(), dst.tolist()):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {i: find(i) for i in range(n)}


def test_two_phase_path_log_rounds(spark):
    """48-node path: min-label needs ~48 rounds; two-phase O(log n)."""
    from ligra_spark.apps import cc_two_phase

    xs = np.arange(47, dtype=np.int64)
    g = _graph(spark, np.concatenate([xs, xs + 1]), np.concatenate([xs + 1, xs]), 48)
    labels, rounds = cc_two_phase(g)
    res = {r["id"]: r["component"] for r in labels.collect()}
    assert res == {i: 0 for i in range(48)}
    assert rounds <= 10, f"diameter-independent bound violated: {rounds} rounds"


def test_two_phase_matches_components_rmat(spark, tiny_graph_sym, tiny_sym):
    from ligra_spark.apps import cc_two_phase

    n, src, dst = tiny_sym
    labels, _ = cc_two_phase(tiny_graph_sym)
    res = {r["id"]: r["component"] for r in labels.collect()}
    assert res == _numpy_cc(n, src, dst)


def test_two_phase_multi_component_with_isolated(spark):
    from ligra_spark.apps import cc_two_phase

    rng = np.random.default_rng(11)
    # 3 blobs of 30 + 10 trailing isolated vertices
    parts = []
    for b in range(3):
        base = b * 30
        s = rng.integers(base, base + 30, 120)
        d = rng.integers(base, base + 30, 120)
        parts.append((s, d))
    src = np.concatenate([p[0] for p in parts]).astype(np.int64)
    dst = np.concatenate([p[1] for p in parts]).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = _graph(
        spark, np.concatenate([src, dst]), np.concatenate([dst, src]), 100
    )
    labels, _ = cc_two_phase(g)
    res = {r["id"]: r["component"] for r in labels.collect()}
    assert res == _numpy_cc(100, src, dst)


def test_two_phase_directed_input_ok(spark, tiny_graph, tiny_sym):
    """Pairs are canonicalized internally: directed input, same answer."""
    from ligra_spark.apps import cc_two_phase

    n, src, dst = tiny_sym
    labels, _ = cc_two_phase(tiny_graph)
    res = {r["id"]: r["component"] for r in labels.collect()}
    assert res == _numpy_cc(n, src, dst)


def test_two_phase_kill_resume_identical(spark, tmp_path):
    from ligra_spark.apps import cc_two_phase
    from ligra_spark.checkpoint import CheckpointManager

    class _Kill(Exception):
        pass

    xs = np.arange(47, dtype=np.int64)
    g = _graph(spark, np.concatenate([xs, xs + 1]), np.concatenate([xs + 1, xs]), 48)
    mgr = CheckpointManager(spark, str(tmp_path / "ckpt_tp"))

    def killer(it, m):
        if it == 2:
            raise _Kill()

    with pytest.raises(_Kill):
        cc_two_phase(g, checkpoint_mgr=mgr, on_superstep=killer)
    assert mgr.latest_step("cc_two_phase") == 2

    resumed, iters = cc_two_phase(g, checkpoint_mgr=mgr, resume=True)
    clean, clean_iters = cc_two_phase(g)
    assert iters == clean_iters
    a = {r["id"]: r["component"] for r in resumed.collect()}
    b = {r["id"]: r["component"] for r in clean.collect()}
    assert a == b == {i: 0 for i in range(48)}


def test_components_auto_star_fallback_on_chain(spark):
    """A chain graph (diameter >> threshold) must trigger the
    automatic star-contraction handoff: total rounds stay far below
    the diameter and the labels equal the pure min-label answer."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ligra_spark.apps import components
    from ligra_spark.graph import LinkGraph

    n = 400
    fwd = pd.DataFrame({"src": range(n - 1), "dst": range(1, n)})
    bwd = pd.DataFrame({"src": range(1, n), "dst": range(n - 1)})
    edges = spark.createDataFrame(pd.concat([fwd, bwd]))
    g = LinkGraph.from_edges(spark, edges, n=n).materialize()
    labels, rounds = components(g, star_fallback_after=5)
    # one chain: every vertex labels to 0, in << diameter rounds
    assert rounds < 40
    out = labels.agg(
        F.count(F.lit(1)).alias("n"), F.sum("component").alias("s")
    ).collect()[0]
    assert (out["n"], out["s"]) == (n, 0)


def test_components_no_fallback_under_threshold(spark, tiny_graph_sym):
    """Crawl-shaped fixture converges before the threshold — the
    fallback never fires and rounds match the pure min-label run."""
    from ligra_spark.apps import components

    base, r_base = components(tiny_graph_sym, star_fallback_after=None)
    auto, r_auto = components(tiny_graph_sym)  # default threshold 16
    assert r_base == r_auto
    a = {r["id"]: r["component"] for r in base.collect()}
    b = {r["id"]: r["component"] for r in auto.collect()}
    assert a == b
