"""Bucketed edge-table storage (`ligra_spark.sources.bucketed`) — the
shuffle-free load path that replaces ``from_edges``'s load-time
repartition with Spark storage bucketing.

Pins the two things that matter at 100 TB: (1) the bucketed scan's
hash partitioning is recognized by Catalyst (degree aggregation needs
ZERO exchanges; the superstep join shuffles only the state side), and
(2) results through the bucketed graph are identical to the
repartition path.
"""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from ligra_spark.sources.bucketed import (
    read_bucketed_graph,
    table_num_buckets,
    write_bucketed_edges,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _exchanges(df) -> int:
    return len(re.findall(r"\bExchange\b", _plan(df)))


@pytest.fixture(scope="module")
def bucketed_table(spark, tiny_edges, tmp_path_factory):
    n, src, dst = tiny_edges
    import pandas as pd

    e = spark.createDataFrame(
        pd.DataFrame({"src": src.astype("int64"), "dst": dst.astype("int64")})
    )
    path = str(tmp_path_factory.mktemp("bkt")) + "/edges_b"
    write_bucketed_edges(e, "test_edges_bucketed", path, buckets=4)
    yield "test_edges_bucketed", n
    spark.sql("DROP TABLE IF EXISTS test_edges_bucketed")


def test_bucket_spec_recorded(spark, bucketed_table):
    name, _ = bucketed_table
    assert table_num_buckets(spark, name) == 4


def test_bucketed_scan_agg_needs_no_exchange(spark, bucketed_table):
    """groupBy(src) over the bucketed scan: the scan's hash
    partitioning satisfies the aggregation — zero Exchange nodes,
    where the plain parquet read of the SAME files needs a shuffle."""
    name, _ = bucketed_table
    t = spark.table(name)
    agg = t.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
    assert "Bucketed: true" in _plan(agg)
    assert _exchanges(agg) == 0, _plan(agg)

    # control: identical files, no bucket metadata -> must shuffle
    loc = [
        r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED {name}").collect()
        if r["col_name"].strip() == "Location"
    ][0]
    plain = spark.read.parquet(loc).groupBy("src").agg(
        F.count(F.lit(1)).alias("c")
    )
    assert _exchanges(plain) > 0


def test_bucketed_join_moves_only_state(spark, bucketed_table):
    """state ⋈ edges on src (the dense superstep shape): the bucketed
    edge side joins straight off the scan; only the state side
    shuffles.  The plain-parquet control pays edge-side exchanges on
    top of the same state-side ones."""
    name, n = bucketed_table
    t = spark.table(name)
    state = (
        spark.range(n).select(F.col("id").cast("long")).repartition(4, "id")
    )
    bucketed = t.join(state.hint("shuffle_hash"), t.src == state.id)
    loc = [
        r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED {name}").collect()
        if r["col_name"].strip() == "Location"
    ][0]
    pq = spark.read.parquet(loc)
    plain = pq.join(state.hint("shuffle_hash"), pq.src == state.id)
    assert _exchanges(bucketed) < _exchanges(plain)
    # and the bucketed scan itself feeds the join
    assert "Bucketed: true" in _plan(bucketed)


def test_bucketed_graph_matches_from_edges(spark, bucketed_table, tiny_graph):
    """PageRank through read_bucketed_graph == PageRank through the
    from_edges repartition path, exactly (same graph, same layout
    contract, different physical load)."""
    from ligra_spark.apps import pagerank

    name, n = bucketed_table
    g = read_bucketed_graph(spark, name, n=n)
    assert (g.n, g.m, g.num_partitions) == (tiny_graph.n, tiny_graph.m, 4)
    r_b, _ = pagerank(g, max_iters=5)
    r_e, _ = pagerank(tiny_graph, max_iters=5)
    a = {r["id"]: r["rank"] for r in r_b.collect()}
    b = {r["id"]: r["rank"] for r in r_e.collect()}
    assert set(a) == set(b)
    assert np.allclose(
        [a[k] for k in sorted(a)], [b[k] for k in sorted(b)], rtol=1e-9
    )
    g.unpersist()


def test_salted_bucketed_round_trip(spark, tiny_edges, tmp_path_factory):
    """Hub-salted on-disk layout: bucketBy(src, salt) writes, the
    loaded graph runs the salted dense path, results unchanged."""
    import pandas as pd

    from ligra_spark.apps import pagerank
    from ligra_spark.graph import LinkGraph

    n, src, dst = tiny_edges
    e = spark.createDataFrame(
        pd.DataFrame({"src": src.astype("int64"), "dst": dst.astype("int64")})
    )
    path = str(tmp_path_factory.mktemp("bkts")) + "/edges_s"
    write_bucketed_edges(
        e, "test_edges_bucketed_salt", path, buckets=4, salt_buckets=2
    )
    try:
        g = read_bucketed_graph(
            spark, "test_edges_bucketed_salt", n=n, salt_buckets=2
        )
        assert "salt" in g.edges.columns
        r_s, _ = pagerank(g, max_iters=5)
        r_p, _ = pagerank(LinkGraph.from_edges(spark, e, n=n), max_iters=5)
        a = {r["id"]: r["rank"] for r in r_s.collect()}
        b = {r["id"]: r["rank"] for r in r_p.collect()}
        assert np.allclose(
            [a[k] for k in sorted(a)], [b[k] for k in sorted(b)], rtol=1e-9
        )
        g.unpersist()
    finally:
        spark.sql("DROP TABLE IF EXISTS test_edges_bucketed_salt")


def test_bucketed_hypergraph_matches_from_incidence(spark, tmp_path_factory):
    """HyperPageRank through the bucketed incidence table pair ==
    through from_incidence; both direction scans load shuffle-free."""
    import pandas as pd

    from ligra_spark.apps import hyper_pagerank
    from ligra_spark.fixtures import sample_graph_edges
    from ligra_spark.hygra import HyperGraph
    from ligra_spark.sources.bucketed import (
        read_bucketed_hypergraph,
        write_bucketed_incidence,
    )

    nv, nh = 50, 24
    _, src, dst = sample_graph_edges()
    v = (src % nv).astype("int64")
    h = (dst % (nh - 4)).astype("int64")
    inc = spark.createDataFrame(pd.DataFrame({"vertex": v, "hedge": h}))

    path = str(tmp_path_factory.mktemp("bkth")) + "/inc_b"
    write_bucketed_incidence(inc, "test_inc_bucketed", path, buckets=4)
    try:
        hb = read_bucketed_hypergraph(spark, "test_inc_bucketed", nv=nv, nh=nh)
        he = HyperGraph.from_incidence(spark, inc, nv=nv, nh=nh)
        assert (hb.nv, hb.nh, hb.m, hb.num_partitions) == (he.nv, he.nh, he.m, 4)

        # hedge-cardinality agg straight off the bucketed h2v scan:
        # zero exchanges (the hypergraph twin of the degree-agg test)
        card = (
            spark.table("test_inc_bucketed_h2v")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("card"))
        )
        assert _exchanges(card) == 0, _plan(card)

        rb, _ = hyper_pagerank(hb, max_iters=5)
        re_, _ = hyper_pagerank(he, max_iters=5)
        a = {(r["kind"], r["id"]): r["rank"] for r in rb.collect()}
        b = {(r["kind"], r["id"]): r["rank"] for r in re_.collect()}
        assert set(a) == set(b)
        ks = sorted(a)
        assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=1e-9)
    finally:
        spark.sql("DROP TABLE IF EXISTS test_inc_bucketed_v2h")
        spark.sql("DROP TABLE IF EXISTS test_inc_bucketed_h2v")


def test_run_app_save_bucketed_table(spark, tiny_edges, tmp_path):
    """jobs/run_app.py --save-bucketed-table: one CLI run ingests edges,
    runs the app AND persists the bucketed layout; a second graph
    loaded by table name matches."""
    import importlib.util
    import os
    import sys

    import pandas as pd

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "run_app", os.path.join(repo, "jobs", "run_app.py")
    )
    run_app = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_app)

    n, src, dst = tiny_edges
    e = spark.createDataFrame(
        pd.DataFrame({"src": src.astype("int64"), "dst": dst.astype("int64")})
    )
    edges = str(tmp_path / "edges.parquet")
    e.write.mode("overwrite").parquet(edges)
    try:
        run_app.main(
            [
                "--app", "pagerank",
                "--edges", edges,
                "--n", str(n),
                "--max-iters", "3",
                "--partitions", "4",
                "--output", str(tmp_path / "scores"),
                "--save-bucketed-table", "test_saved_bucketed",
                "--save-bucketed-path", str(tmp_path / "saved_b"),
            ]
        )
        assert table_num_buckets(spark, "test_saved_bucketed") == 4
        g = read_bucketed_graph(spark, "test_saved_bucketed", n=n)
        assert (g.n, g.m) == (n, e.count())
        g.unpersist()
    finally:
        spark.sql("DROP TABLE IF EXISTS test_saved_bucketed")


def test_weighted_bucketed_graph_bellman_ford(spark, tiny_edges, tmp_path_factory):
    """Weighted edges survive the bucketed round trip: Bellman-Ford
    over the bucketed weighted table == over from_edges."""
    import pandas as pd

    from ligra_spark.apps import bellman_ford
    from ligra_spark.graph import LinkGraph

    n, src, dst = tiny_edges
    w = ((src * 7 + dst * 13) % 9 + 1).astype("int64")
    e = spark.createDataFrame(
        pd.DataFrame(
            {"src": src.astype("int64"), "dst": dst.astype("int64"), "weight": w}
        )
    )
    path = str(tmp_path_factory.mktemp("bktw")) + "/edges_w"
    write_bucketed_edges(e, "test_edges_bucketed_w", path, buckets=4)
    try:
        g = read_bucketed_graph(spark, "test_edges_bucketed_w", n=n)
        assert "weight" in g.edges.columns
        r_b, _ = bellman_ford(g, root=0)
        r_e, _ = bellman_ford(LinkGraph.from_edges(spark, e, n=n), root=0)
        a = {r["id"]: r["dist"] for r in r_b.collect()}
        b = {r["id"]: r["dist"] for r in r_e.collect()}
        assert a == b and len(a) > 0
        g.unpersist()
    finally:
        spark.sql("DROP TABLE IF EXISTS test_edges_bucketed_w")


def test_compact_unpartitioned_reduces_files(spark, tiny_edges, tmp_path):
    """Repeated shuffle-free appends inflate task x bucket file counts;
    compaction collapses to one file per bucket with identical rows and
    the zero-exchange agg intact."""
    import glob
    import os

    import pandas as pd

    from ligra_spark.sources import compact_bucketed_table

    n, src, dst = tiny_edges
    e = spark.createDataFrame(
        pd.DataFrame({"src": src.astype("int64"), "dst": dst.astype("int64")})
    )
    path = str(tmp_path / "cmp")
    write_bucketed_edges(e, "test_cmp_u", path, buckets=4)
    for _ in range(2):
        (
            e.limit(100).write.format("parquet").mode("append")
            .option("path", path).bucketBy(4, "src").sortBy("src")
            .saveAsTable("test_cmp_u")
        )
    try:
        rows_before = spark.table("test_cmp_u").count()
        files_before = len(glob.glob(os.path.join(path, "part-*")))
        assert files_before > 4
        new_path = str(tmp_path / "cmp_v2")
        assert compact_bucketed_table(spark, "test_cmp_u", new_path) == rows_before
        assert spark.table("test_cmp_u").count() == rows_before
        files_after = len(glob.glob(os.path.join(new_path, "part-*")))
        assert files_after <= 4 < files_before
        agg = spark.table("test_cmp_u").groupBy("src").agg(F.count(F.lit(1)))
        assert _exchanges(agg) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS test_cmp_u")
