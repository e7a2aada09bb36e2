"""Cross-backend equality: the per-partition CSR backend
(ligra_spark.csr_backend) must agree with the join engine on the
iterative hot path — allclose(1e-9) PageRank scores, exact labels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ligra_spark import engine
from ligra_spark.csr_backend import (
    csr_edge_map,
    load_pack,
    make_csr_edge_map,
    pack_csr,
)


@pytest.fixture(scope="module")
def tiny_pack(tiny_graph, tmp_path_factory):
    return pack_csr(tiny_graph, str(tmp_path_factory.mktemp("csr_dir")))


@pytest.fixture(scope="module")
def tiny_sym_pack(tiny_graph_sym, tmp_path_factory):
    return pack_csr(tiny_graph_sym, str(tmp_path_factory.mktemp("csr_sym")))


def test_pack_roundtrip(tiny_graph, tiny_pack):
    """Every edge survives the pack exactly once, reconstructible from
    (part, esrc_div, udst runs)."""
    pack = load_pack(tiny_pack.pack_dir)
    assert (pack.n, pack.m, pack.parts) == (
        tiny_graph.n,
        tiny_graph.m,
        tiny_graph.num_partitions,
    )
    rebuilt = []
    for part, fname in pack.part_files.items():
        with np.load(f"{pack.pack_dir}/{fname}") as z:
            esrc_div, udst, ustart = z["esrc_div"], z["udst"], z["ustart"]
        src = esrc_div * pack.parts + part
        bounds = np.append(ustart, len(esrc_div))
        dst = np.repeat(udst, np.diff(bounds))
        rebuilt.append(np.stack([src, dst], axis=1))
    rebuilt = np.concatenate(rebuilt)
    got = {tuple(r) for r in rebuilt.tolist()}
    want = {
        (r["src"], r["dst"]) for r in tiny_graph.edges.select("src", "dst").collect()
    }
    assert got == want and len(rebuilt) == tiny_graph.m


def _msgs_dict(df):
    return {r["id"]: r["agg"] for r in df.collect()}


def test_sum_matches_join_engine(tiny_graph, tiny_pack):
    frontier = tiny_graph.out_degrees.select(
        "id", (F.col("id") * 0.25 + 1.0).alias("share")
    )
    join_msgs = _msgs_dict(
        engine.edge_map(
            tiny_graph,
            frontier,
            message=F.col("share"),
            aggregate=F.sum,
            extra_frontier_cols=("share",),
        )
    )
    csr_msgs = _msgs_dict(
        csr_edge_map(tiny_pack, frontier.withColumnRenamed("share", "payload"), "sum")
    )
    assert set(join_msgs) == set(csr_msgs)
    for k in join_msgs:
        assert abs(join_msgs[k] - csr_msgs[k]) < 1e-9


def test_min_sparse_frontier_matches(tiny_graph_sym, tiny_sym_pack):
    """Sparse frontier: only vertices that received a message appear."""
    frontier = tiny_graph_sym.vertices.filter("id % 11 = 0").select(
        "id", F.col("id").alias("label")
    )
    join_msgs = _msgs_dict(
        engine.edge_map(
            tiny_graph_sym,
            frontier,
            message=F.col("label"),
            aggregate=F.min,
            frontier_size=12,
            extra_frontier_cols=("label",),
        )
    )
    csr_msgs = _msgs_dict(
        csr_edge_map(
            tiny_sym_pack, frontier.withColumnRenamed("label", "payload"), "min"
        )
    )
    assert join_msgs == csr_msgs


def test_pagerank_csr_matches(tiny_graph, tiny_pack):
    from ligra_spark.apps.pagerank import pagerank

    base, it0 = pagerank(tiny_graph, max_iters=25)
    csr, it1 = pagerank(
        tiny_graph, max_iters=25, edge_map_fn=make_csr_edge_map(tiny_pack)
    )
    assert it0 == it1
    b = {r["id"]: r["rank"] for r in base.collect()}
    c = {r["id"]: r["rank"] for r in csr.collect()}
    assert set(b) == set(c)
    np.testing.assert_allclose(
        [b[i] for i in sorted(b)], [c[i] for i in sorted(c)], rtol=0, atol=1e-9
    )


def test_components_csr_exact(tiny_graph_sym, tiny_sym_pack):
    """sparse_fallback=False: every superstep runs the CSR kernel (the
    tiny graph sits below the broadcast threshold, so the default
    hybrid would route everything to the join engine)."""
    from ligra_spark.apps.components import components

    base, _ = components(tiny_graph_sym)
    csr, _ = components(
        tiny_graph_sym,
        edge_map_fn=make_csr_edge_map(tiny_sym_pack, sparse_fallback=False),
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, csr.collect()))


def test_components_csr_hybrid(tiny_graph_sym, tiny_sym_pack):
    """Default adapter (direction-switch ON) — same fixpoint labels."""
    from ligra_spark.apps.components import components

    base, _ = components(tiny_graph_sym)
    csr, _ = components(tiny_graph_sym, edge_map_fn=make_csr_edge_map(tiny_sym_pack))
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, csr.collect()))


def test_bellman_ford_csr_exact(spark, tiny_edges, tmp_path):
    """Weighted min_plus mode: packed per-edge weights, exact dists."""
    from ligra_spark.apps import bellman_ford
    from ligra_spark.graph import LinkGraph
    from tests.conftest import edges_df

    n, src, dst = tiny_edges
    rng = np.random.default_rng(3)
    w = rng.integers(1, 8, size=len(src)).astype(np.int64)
    g = LinkGraph.from_edges(spark, edges_df(spark, src, dst, w), n=n).materialize()
    pack = pack_csr(g, str(tmp_path / "wpack"))
    assert pack.weighted
    base, _ = bellman_ford(g, root=0)
    csr, _ = bellman_ford(
        g, root=0, edge_map_fn=make_csr_edge_map(pack, sparse_fallback=False)
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, csr.collect()))
    g.unpersist()


def test_label_propagation_csr_exact(tiny_graph_sym, tiny_sym_pack):
    from ligra_spark.apps.components import label_propagation

    base, _ = label_propagation(tiny_graph_sym)
    csr, _ = label_propagation(
        tiny_graph_sym,
        edge_map_fn=make_csr_edge_map(tiny_sym_pack, sparse_fallback=False),
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, csr.collect()))


def test_or_mode_matches_join_engine(tiny_graph_sym, tiny_sym_pack):
    """bit_or monoid (kBFS wave masks): exact partial-OR parity."""
    frontier = tiny_graph_sym.vertices.filter("id % 7 = 0").select(
        "id", F.expr("shiftleft(1L, cast(id % 63 as int))").alias("mask")
    )
    join_msgs = _msgs_dict(
        engine.edge_map(
            tiny_graph_sym,
            frontier,
            message=F.col("mask"),
            aggregate=F.bit_or,
            frontier_size=19,
            extra_frontier_cols=("mask",),
        )
    )
    csr_msgs = _msgs_dict(
        csr_edge_map(
            tiny_sym_pack, frontier.withColumnRenamed("mask", "payload"), "or"
        )
    )
    assert join_msgs == csr_msgs


def test_radii_csr_exact(tiny_graph_sym, tiny_sym_pack):
    from ligra_spark.apps import radii

    base, _ = radii(tiny_graph_sym)
    csr, _ = radii(
        tiny_graph_sym,
        edge_map_fn=make_csr_edge_map(tiny_sym_pack, sparse_fallback=False),
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, csr.collect()))


def test_ecc_kbfs_csr_exact(tiny_graph_sym, tiny_sym_pack):
    from ligra_spark.apps.ecc import ecc_kbfs

    base, _ = ecc_kbfs(tiny_graph_sym, seed=1)
    csr, _ = ecc_kbfs(
        tiny_graph_sym,
        seed=1,
        edge_map_fn=make_csr_edge_map(tiny_sym_pack, sparse_fallback=False),
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, csr.collect()))
