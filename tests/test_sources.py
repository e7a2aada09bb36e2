"""Ligra-format import/export round-trip tests against the shipped
reference sample graph."""

import numpy as np


def test_read_adjacency_graph_df(spark, tiny_edges):
    from ligra_spark.sources import read_adjacency_graph_df

    n, src, dst = tiny_edges
    df, n2 = read_adjacency_graph_df(
        spark, "/root/reference/inputs/rMatGraph_J_5_100"
    )
    assert n2 == n == 128
    got = df.toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    order = np.lexsort((dst, src))
    np.testing.assert_array_equal(got["src"].to_numpy(), src[order])
    np.testing.assert_array_equal(got["dst"].to_numpy(), dst[order])


def test_weighted_adjacency_graph(spark):
    from ligra_spark.sources import read_adjacency_graph_df

    df, n = read_adjacency_graph_df(
        spark, "/root/reference/inputs/rMatGraph_WJ_5_100"
    )
    assert "weight" in df.columns and n == 128
    assert df.count() == 708


def test_roundtrip_text(spark, tiny_edges, tmp_path):
    from ligra_spark.sources import read_adjacency_graph_df, write_adjacency_graph

    df, n = read_adjacency_graph_df(
        spark, "/root/reference/inputs/rMatGraph_J_5_100"
    )
    out = str(tmp_path / "g.adj")
    write_adjacency_graph(df, n, out)
    with open(out) as f, open("/root/reference/inputs/rMatGraph_J_5_100") as ref:
        ours = [l.strip() for l in f if l.strip()]
        theirs = [l.strip() for l in ref if l.strip()]
    assert ours == theirs, "byte-level round-trip with the reference fixture"


def test_binary_csr_roundtrip(spark, tiny_edges, tmp_path):
    import numpy as np

    from ligra_spark.adjacency import edges_to_csr
    from ligra_spark.sources import read_binary_csr_df

    n, src, dst = tiny_edges
    offsets, targets = edges_to_csr(n, src, dst)
    (tmp_path / "g.config").write_text(f"{n} {len(targets)}")
    offsets.astype(np.int64).tofile(tmp_path / "g.idx")
    targets.astype(np.int64).tofile(tmp_path / "g.adj")
    df, n2 = read_binary_csr_df(
        spark, str(tmp_path / "g.config"), str(tmp_path / "g.idx"), str(tmp_path / "g.adj")
    )
    assert n2 == n and df.count() == len(src)


def test_adjacency_hypergraph_roundtrip(spark, tmp_path):
    """(Weighted)AdjacencyHypergraph round-trip
    (``ligra/hypergraphIO.h:36-115`` layout: header, nv/mv/nh/mh,
    vertex CSR half [+weights], hyperedge CSR half [+weights]):
    write → read → exact incidence equality, and re-write →
    byte-identical file."""
    import pandas as pd

    from ligra_spark.sources import (
        read_adjacency_hypergraph_df,
        write_adjacency_hypergraph,
    )

    rng = np.random.default_rng(7)
    nv, nh = 20, 9
    # directed: the two halves are genuinely different relations
    v_half = pd.DataFrame(
        sorted(
            {(int(v), int(h)) for v, h in zip(rng.integers(0, nv, 60), rng.integers(0, nh, 60))}
        ),
        columns=["vertex", "hedge"],
    )
    h_half = pd.DataFrame(
        sorted(
            {(int(v), int(h)) for v, h in zip(rng.integers(0, nv, 40), rng.integers(0, nh, 40))}
        ),
        columns=["vertex", "hedge"],
    )
    v_half["weight"] = (v_half["vertex"] * 3 + v_half["hedge"]) % 7 + 1
    h_half["weight"] = (h_half["vertex"] + h_half["hedge"] * 5) % 7 + 1
    path = str(tmp_path / "hyper.adj")
    write_adjacency_hypergraph(
        spark.createDataFrame(v_half), spark.createDataFrame(h_half), nv, nh, path
    )
    v2, h2, nv2, nh2 = read_adjacency_hypergraph_df(spark, path)
    assert (nv2, nh2) == (nv, nh)
    got_v = v2.toPandas().sort_values(["vertex", "hedge"]).reset_index(drop=True)
    got_h = h2.toPandas().sort_values(["vertex", "hedge"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_v, v_half.sort_values(["vertex", "hedge"]).reset_index(drop=True),
        check_dtype=False,
    )
    pd.testing.assert_frame_equal(
        got_h, h_half.sort_values(["vertex", "hedge"]).reset_index(drop=True),
        check_dtype=False,
    )
    # byte-identical re-write
    path2 = str(tmp_path / "hyper2.adj")
    write_adjacency_hypergraph(v2, h2, nv, nh, path2)
    assert open(path).read() == open(path2).read()
    # the loaded halves drive the engine: directed B-path runs on them
    from ligra_spark.apps import hyper_bfs
    from ligra_spark.hygra import HyperGraph

    hg = HyperGraph.from_incidence(spark, v2.drop("weight"), nv=nv, nh=nh)
    out, _ = hyper_bfs(hg, root=int(v_half["vertex"].iloc[0]))
    assert out.count() > 0
