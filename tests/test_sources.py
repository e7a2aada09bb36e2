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
