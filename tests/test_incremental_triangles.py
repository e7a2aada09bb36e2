"""Incremental triangle-count maintenance
(`streaming.incremental_triangles`): folding an edge stream batch-by-
batch must equal a full recount over the union, count multi-new-edge
triangles once, add 0 for duplicate edges and replayed batches, and
run end-to-end under a real file-source stream."""

import itertools
import json
import os


def _brute_triangles(edge_list):
    """Exact triangle count of the undirected simple graph."""
    adj = {}
    for u, v in edge_list:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return sum(
        1
        for x, y, z in itertools.combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )


# 3 deterministic batches: batch 0 seeds a clique and a path, batch 1
# closes wedges against batch 0 (cross-batch triangles), batch 2 mixes
# duplicates, a loop, reversed duplicates and a brand-new triangle
_BATCHES = [
    [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (10, 11)],
    [(3, 5), (11, 12), (10, 12), (1, 4)],
    [(2, 1), (6, 6), (4, 5), (20, 21), (21, 22), (20, 22)],
]
_ALL = [e for b in _BATCHES for e in b]


def _apply_all(spark, tri_dir):
    from ligra_spark.streaming import apply_tri_batch

    return [
        apply_tri_batch(
            spark.createDataFrame(edges, "src long, dst long"), bid, tri_dir
        )
        for bid, edges in enumerate(_BATCHES)
    ]


def test_incremental_matches_full_recount(spark, tmp_path):
    from ligra_spark.streaming import read_tri_manifest, read_tri_total

    tri_dir = str(tmp_path / "tri")
    deltas = _apply_all(spark, tri_dir)
    assert read_tri_total(tri_dir) == _brute_triangles(_ALL)
    # prefix property: total after batch k == recount of batches 0..k
    man = read_tri_manifest(tri_dir)
    running = 0
    for bid in range(3):
        running += man["deltas"][str(bid)]
        assert running == _brute_triangles(
            [e for b in _BATCHES[: bid + 1] for e in b]
        )
    assert deltas == [man["deltas"][str(b)] for b in range(3)]


def test_incremental_matches_app_on_fixture_graph(spark, tiny_sym):
    """3 hash-batches of the reference sample graph: the maintained
    total equals apps.triangle_count on the full symmetric graph."""
    from ligra_spark.apps import triangle_count
    from ligra_spark.streaming import apply_tri_batch, read_tri_total
    from tests.conftest import edges_df
    import tempfile
    import shutil

    n, s, d = tiny_sym
    # deliberately NOT unpersisted: plan-identical to the shared
    # tiny_graph_sym fixture — unpersisting would evict the fixture's
    # cache (CacheManager keys on the logical plan; test_plans asserts
    # on the cached lineage).  See tests/test_incremental_pr.py.
    g = __import__("ligra_spark.graph", fromlist=["LinkGraph"]).LinkGraph.from_edges(
        spark, edges_df(spark, s, d), n=n, num_partitions=4, symmetric=True
    ).materialize()
    expected = triangle_count(g)
    tri_dir = tempfile.mkdtemp(prefix="tri_fix_")
    try:
        full = spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(s, d)], "src long, dst long"
        )
        for bid in range(3):
            batch = full.filter((full.src * 31 + full.dst) % 3 == bid)
            apply_tri_batch(batch, bid, tri_dir)
        assert read_tri_total(tri_dir) == expected
    finally:
        shutil.rmtree(tri_dir, ignore_errors=True)


def test_multi_new_edge_triangle_counted_once(spark, tmp_path):
    from ligra_spark.streaming import apply_tri_batch

    tri_dir = str(tmp_path / "tri")
    # all 3 edges of the triangle arrive in ONE batch -> exactly 1
    d0 = apply_tri_batch(
        spark.createDataFrame([(7, 8), (8, 9), (7, 9)], "src long, dst long"),
        0,
        tri_dir,
    )
    assert d0 == 1


def test_duplicates_and_replay_add_zero(spark, tmp_path):
    from ligra_spark.streaming import apply_tri_batch, read_tri_manifest

    tri_dir = str(tmp_path / "tri")
    first = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    assert apply_tri_batch(first, 0, tri_dir) == 1
    # batch of only already-present edges (incl. reversed) adds nothing
    dup = spark.createDataFrame([(2, 1), (3, 2)], "src long, dst long")
    assert apply_tri_batch(dup, 1, tri_dir) == 0
    man_before = read_tri_manifest(tri_dir)
    # replaying committed batch ids is a no-op
    assert apply_tri_batch(first, 0, tri_dir) == 0
    assert apply_tri_batch(dup, 1, tri_dir) == 0
    assert read_tri_manifest(tri_dir) == man_before
    assert man_before["total"] == 1


def test_streaming_sink_end_to_end(spark, tmp_path):
    from ligra_spark.streaming import incremental_triangles_sink, read_tri_total

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
    tri_dir = str(tmp_path / "tri")
    q = (
        incremental_triangles_sink(stream, tri_dir, str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "stream did not finish in 240s"
    finally:
        q.stop()
    man = json.load(open(os.path.join(tri_dir, "_CURRENT")))
    assert len(man["batches"]) >= 1  # micro-batch boundaries may differ
    assert read_tri_total(tri_dir) == _brute_triangles(_ALL)
