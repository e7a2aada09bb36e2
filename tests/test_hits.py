"""HITS: engine vs a numpy transcription of the documented computation
shape (apps/hits.py docstring), plus structural invariants."""

import numpy as np
import pytest

from tests.conftest import edges_df


def hits_numpy(n, src, dst, iters):
    """Transcription of the exact shape the engine computes: raw
    matvecs with the hub normalizer folded in as a scalar division."""
    hub_raw = np.ones(n)
    auth_raw = np.zeros(n)
    sh = 1.0
    sa = None
    for _ in range(iters):
        h = hub_raw / sh
        auth_raw = np.zeros(n)
        np.add.at(auth_raw, dst, h[src])
        hub_raw = np.zeros(n)
        np.add.at(hub_raw, src, auth_raw[dst])
        sa, sh = auth_raw.sum(), hub_raw.sum()
    if sa is None:
        return auth_raw, hub_raw / sh
    return auth_raw / sa, hub_raw / sh


@pytest.fixture(scope="module")
def hits_result(tiny_graph, tiny_edges):
    from ligra_spark.apps import hits

    out, it = hits(tiny_graph, iters=5)
    pdf = out.toPandas().sort_values("id").reset_index(drop=True)
    return pdf, it


def test_hits_matches_numpy(hits_result, tiny_edges):
    n, src, dst = tiny_edges
    auth, hub = hits_numpy(n, src, dst, iters=5)
    pdf, it = hits_result
    assert it == 5
    assert len(pdf) == n
    np.testing.assert_allclose(pdf["auth"].to_numpy(), auth, rtol=0, atol=1e-12)
    np.testing.assert_allclose(pdf["hub"].to_numpy(), hub, rtol=0, atol=1e-12)


def test_hits_l1_normalized(hits_result):
    pdf, _ = hits_result
    assert abs(pdf["auth"].sum() - 1.0) < 1e-9
    assert abs(pdf["hub"].sum() - 1.0) < 1e-9
    assert (pdf["auth"] >= 0).all() and (pdf["hub"] >= 0).all()


def test_hits_sink_source_zeroes(spark):
    """Path 0→1→2: vertex 0 has no in-edges (auth 0), vertex 2 no
    out-edges (hub 0); after one iteration auth ∝ [0,1,1], hub ∝
    [1,1,0] (uniform hub start)."""
    from ligra_spark.apps import hits
    from ligra_spark.graph import LinkGraph

    src = np.array([0, 1])
    dst = np.array([1, 2])
    g = LinkGraph.from_edges(spark, edges_df(spark, src, dst), n=3).materialize()
    out, _ = hits(g, iters=1)
    pdf = out.toPandas().sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(pdf["auth"], [0.0, 0.5, 0.5], atol=1e-15)
    np.testing.assert_allclose(pdf["hub"], [0.5, 0.5, 0.0], atol=1e-15)


def test_hits_resume_matches_uninterrupted(tiny_graph, tmp_path):
    from ligra_spark.apps import hits
    from ligra_spark.checkpoint import CheckpointManager

    mgr = CheckpointManager(tiny_graph.spark, str(tmp_path / "ck"))
    full, _ = hits(tiny_graph, iters=6)
    full_pdf = full.toPandas().sort_values("id").reset_index(drop=True)
    # run 3 supersteps with durable checkpoints, then resume for 6 total
    hits(tiny_graph, iters=3, checkpoint_mgr=mgr, checkpoint_every=1)
    resumed, it = hits(
        tiny_graph, iters=6, checkpoint_mgr=mgr, checkpoint_every=1, resume=True
    )
    assert it == 6
    res_pdf = resumed.toPandas().sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(res_pdf["auth"], full_pdf["auth"], atol=1e-12)
    np.testing.assert_allclose(res_pdf["hub"], full_pdf["hub"], atol=1e-12)
