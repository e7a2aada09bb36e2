"""Incremental connected-components maintenance
(`streaming.incremental_cc`): folding an edge stream batch-by-batch
into the star-pair fixpoint must equal batch CC over the union of all
batches, stay idempotent under foreachBatch replay, recover from a
crash between the version write and the manifest commit, and leave
untouched components out of the per-batch recontraction."""

import json
import os

import pytest
from pyspark.sql import functions as F


def _union_find(n_ids, edge_list):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {i: find(i) for i in n_ids}


# deterministic 3-batch edge stream: two chains, a clique, a
# cross-batch merge (batch 2 glues the two chains), isolated id 99
_BATCHES = [
    [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21), (21, 22), (20, 22)],
    [(4, 5), (5, 6), (12, 13), (30, 31)],
    [(6, 10), (40, 40), (31, 32)],  # (6,10) merges chain A and chain B
]
_IDS = sorted({x for b in _BATCHES for e in b for x in e} | {99})


def _expected_labels():
    return _union_find(_IDS, [e for b in _BATCHES for e in b])


def _apply_all(spark, cc_dir, upto=None):
    from ligra_spark.streaming import apply_cc_batch

    for bid, edges in enumerate(_BATCHES[:upto]):
        df = spark.createDataFrame(edges, "src long, dst long")
        apply_cc_batch(df, bid, cc_dir, 4)


def _labels(spark, cc_dir):
    from ligra_spark.streaming import cc_labels

    verts = spark.createDataFrame([(i,) for i in _IDS], "id long")
    return {
        r["id"]: r["component"]
        for r in cc_labels(spark, cc_dir, vertices=verts).collect()
    }


def test_incremental_matches_batch_cc(spark, tmp_path):
    """After all batches the maintained labels equal union-find over
    the full edge union AND cc_two_phase over the same edges."""
    from ligra_spark.apps import cc_two_phase
    from ligra_spark.graph import LinkGraph

    cc_dir = str(tmp_path / "cc")
    _apply_all(spark, cc_dir)
    got = _labels(spark, cc_dir)
    assert got == _expected_labels()

    all_edges = spark.createDataFrame(
        [e for b in _BATCHES for e in b], "src long, dst long"
    )
    g = LinkGraph.from_edges(spark, all_edges, make_symmetric=True)
    batch_labels = {
        r["id"]: r["component"] for r in cc_two_phase(g)[0].collect()
    }
    # cc_two_phase labels the DENSE 0..max-id range (LinkGraph vertex
    # contract); the maintained table is sparse — compare on the
    # streamed ids only (isolated 99 exists only in the test's vertex
    # frame, and id 99 > max streamed edge id)
    for i in set(_IDS) & set(batch_labels):
        assert got[i] == batch_labels[i]


def test_replay_is_noop(spark, tmp_path):
    """Re-applying a committed batch id changes nothing and runs no
    contraction rounds (exactly-once under foreachBatch replay)."""
    from ligra_spark.streaming import apply_cc_batch

    cc_dir = str(tmp_path / "cc")
    _apply_all(spark, cc_dir)
    before = _labels(spark, cc_dir)
    man_before = json.load(open(os.path.join(cc_dir, "_CURRENT")))

    df = spark.createDataFrame(_BATCHES[1], "src long, dst long")
    rounds = apply_cc_batch(df, 1, cc_dir, 4)
    assert rounds == 0
    assert _labels(spark, cc_dir) == before
    assert json.load(open(os.path.join(cc_dir, "_CURRENT"))) == man_before


def test_orphan_version_dir_recovers(spark, tmp_path):
    """A crash after writing v{batch} but before the manifest commit
    leaves an orphan dir; the replay overwrites it and converges."""
    cc_dir = str(tmp_path / "cc")
    _apply_all(spark, cc_dir, upto=2)
    # simulate the torn attempt: garbage parquet dir for batch 2,
    # manifest still pointing at v1
    spark.createDataFrame([(7, 7)], "u long, v long").write.mode(
        "overwrite"
    ).parquet(os.path.join(cc_dir, "v2"))
    _apply_all(spark, cc_dir)  # replays batch 0/1 as no-ops, applies 2
    assert _labels(spark, cc_dir) == _expected_labels()


def test_superseded_versions_garbage_collected(spark, tmp_path):
    """Only the newest ``retain_versions`` star-table dirs survive a
    commit; labels stay correct after the GC."""
    cc_dir = str(tmp_path / "cc")
    _apply_all(spark, cc_dir)  # 3 batches, default retain_versions=2
    dirs = sorted(d for d in os.listdir(cc_dir) if d.startswith("v"))
    assert dirs == ["v1", "v2"]
    assert _labels(spark, cc_dir) == _expected_labels()


def test_unconverged_contraction_refuses_commit(spark):
    """max_iters exhaustion raises instead of producing a non-fixpoint
    star table (which would poison every later fold)."""
    from ligra_spark.streaming import update_star_pairs

    empty = spark.createDataFrame([], "u long, v long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        update_star_pairs(empty, chain, 4, max_iters=2)


def test_untouched_components_pass_through(spark):
    """A batch touching one component re-contracts only it: the other
    component's star rows survive verbatim and the contraction
    converges in a couple of rounds."""
    from ligra_spark.streaming import update_star_pairs

    prev = spark.createDataFrame(
        [(2, 1), (3, 1), (11, 10), (12, 10)], "u long, v long"
    )
    batch = spark.createDataFrame([(3, 4)], "src long, dst long")
    stars, rounds = update_star_pairs(prev, batch, 4)
    got = {(r["u"], r["v"]) for r in stars.collect()}
    assert got == {(2, 1), (3, 1), (4, 1), (11, 10), (12, 10)}
    assert rounds <= 3  # depth-1 stars + one edge: near-immediate fixpoint


def test_streaming_sink_end_to_end(spark, tmp_path):
    """Drive incremental_cc_sink through a real file-source stream
    (1 file per trigger → one micro-batch per test batch)."""
    from ligra_spark.streaming import incremental_cc_sink

    src_dir = str(tmp_path / "edges_in")
    for bid, edges in enumerate(_BATCHES):
        spark.createDataFrame(edges, "src long, dst long").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(src_dir, f"b{bid}"))

    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    cc_dir = str(tmp_path / "cc")
    q = (
        incremental_cc_sink(stream, cc_dir, str(tmp_path / "ck"), 4)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "stream did not finish in 240s"
    finally:
        q.stop()
    man = json.load(open(os.path.join(cc_dir, "_CURRENT")))
    assert len(man["batches"]) >= 1  # micro-batch boundaries may differ
    assert _labels(spark, cc_dir) == _expected_labels()


def test_link_sink_maintains_cc(spark, tmp_path):
    """incremental_link_graph_sink(cc_dir=...) keeps labels equal to
    batch CC over the final committed edge table."""
    from ligra_spark.apps import components
    from ligra_spark.fixtures import write_graph_fixture
    from ligra_spark.graph import LinkGraph
    from ligra_spark.streaming import (
        cc_labels,
        incremental_link_graph_sink,
        stream_pages_to_edges,
    )

    fix = str(tmp_path / "fix")
    write_graph_fixture(fix, scale="tiny", with_pages=True)
    src_dir = str(tmp_path / "pages_in")
    spark.read.parquet(f"{fix}/pages.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(src_dir)

    cc_dir = str(tmp_path / "cc")
    links = stream_pages_to_edges(spark, src_dir, max_files_per_trigger=2)
    q = (
        incremental_link_graph_sink(
            links,
            edge_table="stream_edges_cc",
            edge_path=str(tmp_path / "edges_b"),
            dict_dir=str(tmp_path / "dict"),
            checkpoint_dir=str(tmp_path / "ck"),
            buckets=4,
            cc_dir=cc_dir,
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "stream did not finish in 240s"
        edges = spark.table("stream_edges_cc").select("src", "dst")
        g = LinkGraph.from_edges(spark, edges, make_symmetric=True)
        want = {r["id"]: r["component"] for r in components(g)[0].collect()}
        got = {
            r["id"]: r["component"]
            for r in cc_labels(
                spark, cc_dir, vertices=g.vertices
            ).collect()
        }
        assert got == want
    finally:
        q.stop()
        spark.sql("DROP TABLE IF EXISTS stream_edges_cc")
