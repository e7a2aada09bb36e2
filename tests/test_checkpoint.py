"""Resumability tests (north rule): kill after superstep k, resume from
the durable checkpoint, final scores identical to the uninterrupted
run; torn checkpoints are never resumed from."""

import os

import numpy as np
import pytest


class _Kill(Exception):
    pass


def test_pagerank_kill_resume_identical(spark, tiny_graph, tmp_path):
    from ligra_spark.apps import pagerank
    from ligra_spark.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "ckpt"))

    def killer(it, m):
        if it == 3:
            raise _Kill()

    with pytest.raises(_Kill):
        pagerank(tiny_graph, max_iters=10, checkpoint_mgr=mgr, on_superstep=killer)
    assert mgr.latest_step("pagerank") == 3
    meta = mgr.metadata("pagerank", 3)
    assert meta["superstep"] == 3 and meta["files"], "lineage file list present"

    resumed, iters = pagerank(tiny_graph, max_iters=10, checkpoint_mgr=mgr, resume=True)
    assert iters == 10
    clean, _ = pagerank(tiny_graph, max_iters=10)
    a = {r["id"]: r["rank"] for r in resumed.collect()}
    b = {r["id"]: r["rank"] for r in clean.collect()}
    ra = np.array([a[i] for i in sorted(a)])
    rb = np.array([b[i] for i in sorted(b)])
    np.testing.assert_allclose(ra, rb, atol=1e-12, rtol=0)


def test_torn_checkpoint_ignored(spark, tiny_graph, tmp_path):
    from ligra_spark.apps import pagerank
    from ligra_spark.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "ckpt2"))
    pagerank(tiny_graph, max_iters=4, checkpoint_mgr=mgr)
    latest = mgr.latest_step("pagerank")
    os.remove(str(tmp_path / "ckpt2" / "pagerank" / f"step={latest}" / "_META.json"))
    assert mgr.latest_step("pagerank") == latest - 1


def test_prune_keeps_newest(spark, tiny_graph, tmp_path):
    from ligra_spark.apps import pagerank
    from ligra_spark.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "ckpt3"))
    pagerank(tiny_graph, max_iters=5, checkpoint_mgr=mgr)
    mgr.prune("pagerank", keep_last=2)
    assert mgr.steps("pagerank") == [4, 5]
