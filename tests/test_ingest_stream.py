"""Streaming incremental link-graph maintenance
(`streaming.incremental_link_graph_sink`): a multi-batch crawl stream
must converge to the same graph the batch ingest builds — dense ids,
exact edge multiset (compared url-space), per-url PageRank scores
equal — with the edge table staying a bucketed, zero-shuffle-load
table across appends."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def streamed_graph(spark, tmp_path_factory):
    """Run the sink over a 4-file pages stream (2 files per trigger →
    2 micro-batches) and hand back everything needed to compare."""
    from ligra_spark.fixtures import write_graph_fixture
    from ligra_spark.streaming import (
        incremental_link_graph_sink,
        stream_pages_to_edges,
    )

    base = tmp_path_factory.mktemp("ingstr")
    fix = str(base / "fix")
    write_graph_fixture(fix, scale="tiny", with_pages=True)
    pages = spark.read.parquet(f"{fix}/pages.parquet")
    src_dir = str(base / "pages_in")
    pages.repartition(4).write.mode("overwrite").parquet(src_dir)

    edge_path = str(base / "edges_b")
    dict_dir = str(base / "dict")
    links = stream_pages_to_edges(spark, src_dir, max_files_per_trigger=2)
    q = (
        incremental_link_graph_sink(
            links,
            edge_table="stream_edges_b",
            edge_path=edge_path,
            dict_dir=dict_dir,
            checkpoint_dir=str(base / "ck"),
            buckets=4,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    yield pages, dict_dir
    spark.sql("DROP TABLE IF EXISTS stream_edges_b")


def _current_dict(spark, dict_dir):
    from ligra_spark.streaming import read_stream_dictionary

    return read_stream_dictionary(spark, dict_dir)


def test_stream_dictionary_dense_and_complete(spark, streamed_graph):
    """Ids are dense 0..n-1 with one row per distinct node url,
    accumulated across batches."""
    pages, dict_dir = streamed_graph
    d = _current_dict(spark, dict_dir)
    n = d.count()
    assert d.select("url").distinct().count() == n
    ids = sorted(r["id"] for r in d.select("id").collect())
    assert ids == list(range(n))

    from ligra_spark.extract import extracted_pages

    batch = extracted_pages(pages).select(
        "url", F.explode("links").alias("href")
    )
    nodes = (
        batch.select(F.col("url").alias("u"))
        .unionByName(batch.select(F.col("href").alias("u")))
        .distinct()
        .count()
    )
    assert n == nodes


def test_stream_edges_match_batch_multiset(spark, streamed_graph):
    """Edge multiset mapped back to url space == the batch link
    extraction's (url, href) multiset."""
    pages, dict_dir = streamed_graph
    d = _current_dict(spark, dict_dir)
    t = spark.table("stream_edges_b")
    got = (
        t.join(d, t["src"] == d["id"]).select(F.col("url").alias("u"), "dst")
        .join(d, F.col("dst") == d["id"]).select("u", F.col("url").alias("v"))
        .groupBy("u", "v").count()
    )
    from ligra_spark.extract import extracted_pages

    exp = (
        extracted_pages(pages)
        .select(F.col("url").alias("u"), F.explode("links").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    joined = got.join(exp, ["u", "v"], "full_outer")
    assert joined.filter(
        F.col("count").isNull() | F.col("c2").isNull() | (F.col("count") != F.col("c2"))
    ).count() == 0


def test_stream_table_stays_bucketed_after_appends(spark, streamed_graph):
    """Two appended batches later the scan is still bucketed: degree
    agg runs with zero exchanges."""
    agg = (
        spark.table("stream_edges_b")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    p = _plan(agg)
    assert "Bucketed: true" in p
    assert len(re.findall(r"\bExchange\b", p)) == 0, p


def test_stream_graph_pagerank_matches_batch(spark, streamed_graph):
    """PageRank over the streamed bucketed graph == PageRank over a
    batch graph built on the SAME vertex universe, compared per url.

    The universes must be pinned equal first: the stream dictionary
    covers nodes observed in link events (a crawled page with zero
    out-links enters only when something links to it — by design),
    while build_link_graph's dictionary covers every crawled page.  So
    the batch side here maps the batch-extracted edges through the
    STREAM dictionary — same edges, same n, different assembly path."""
    from ligra_spark.apps import pagerank
    from ligra_spark.extract import extracted_pages
    from ligra_spark.graph import LinkGraph
    from ligra_spark.sources import read_bucketed_graph

    pages, dict_dir = streamed_graph
    d = _current_dict(spark, dict_dir)
    n = d.count()

    gs = read_bucketed_graph(spark, "stream_edges_b", n=n)
    rs, _ = pagerank(gs, max_iters=5)
    by_url_s = {
        r["url"]: r["rank"]
        for r in rs.join(d, rs["id"] == d["id"]).select("url", "rank").collect()
    }

    pairs = extracted_pages(pages).select(
        F.col("url").alias("u"), F.explode("links").alias("v")
    )
    eb = (
        pairs.join(d, pairs["u"] == d["url"]).select(F.col("id").alias("src"), "v")
        .join(d, F.col("v") == d["url"]).select("src", F.col("id").alias("dst"))
    )
    gb = LinkGraph.from_edges(spark, eb, n=n)
    rb, _ = pagerank(gb, max_iters=5)
    by_url_b = {
        r["url"]: r["rank"]
        for r in rb.join(d, rb["id"] == d["id"]).select("url", "rank").collect()
    }
    assert set(by_url_s) == set(by_url_b)
    urls = sorted(by_url_s)
    assert np.allclose(
        [by_url_s[u] for u in urls], [by_url_b[u] for u in urls], rtol=1e-9
    )
    gs.unpersist()
    gb.unpersist()


def test_compact_streamed_table(spark, streamed_graph, tmp_path):
    """Streaming appends leave multiple files per bucket; compaction
    rewrites to one file set per bucket with identical rows and the
    bucket spec (zero-exchange agg) intact.  Runs LAST in this module
    (it swaps the table's storage)."""
    import glob
    import os

    from ligra_spark.sources import compact_bucketed_table, table_num_buckets

    t = spark.table("stream_edges_b")
    before_rows = t.count()
    loc = [
        r["data_type"]
        for r in spark.sql("DESCRIBE FORMATTED stream_edges_b").collect()
        if r["col_name"].strip() == "Location"
    ][0].replace("file:", "")
    files_before = len(glob.glob(os.path.join(loc, "batch_id=*", "part-*")))
    assert files_before >= 8  # 2 batch partitions x 4 buckets

    new_path = str(tmp_path / "compacted")
    n = compact_bucketed_table(spark, "stream_edges_b", new_path)
    assert n == before_rows
    assert table_num_buckets(spark, "stream_edges_b") == 4
    t2 = spark.table("stream_edges_b")
    assert t2.count() == before_rows
    agg = t2.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    p = _plan(agg)
    assert "Bucketed: true" in p and "Exchange" not in p
    files_after = len(glob.glob(os.path.join(new_path, "batch_id=*", "part-*")))
    # per-(batch partition, bucket) minimum; never grows (the actual
    # many-file reduction is pinned by the unpartitioned test in
    # tests/test_bucketed.py where append inflation genuinely occurs)
    assert files_after <= files_before and files_after <= 8


def test_stream_continues_across_runs(spark, tmp_path):
    """A SECOND availableNow run over the same checkpoint ingests only
    newly-arrived page files: dictionary ids persist and grow densely,
    earlier edges are not re-appended (exactly-once across runs)."""
    import pandas as pd

    from ligra_spark.streaming import (
        incremental_link_graph_sink,
        stream_pages_to_edges,
    )

    def page(url, targets):
        html = b"<html><head><title>t</title></head><body>" + b"".join(
            b'<a href="%s">a</a>' % t.encode() for t in targets
        ) + b"</body></html>"
        return (url, pd.Timestamp("2025-01-01"), html, "t", "en")

    cols = ["url", "warc_ts", "html", "text", "lang"]
    src_dir = str(tmp_path / "pages_in")
    first = spark.createDataFrame(
        pd.DataFrame([page("u/a", ["u/b"]), page("u/b", ["u/a", "u/c"])], columns=cols)
    )
    first.coalesce(1).write.mode("append").parquet(src_dir)

    def run_once():
        links = stream_pages_to_edges(spark, src_dir, max_files_per_trigger=1)
        q = (
            incremental_link_graph_sink(
                links,
                edge_table="stream_edges_cont",
                edge_path=str(tmp_path / "edges_b"),
                dict_dir=str(tmp_path / "dict"),
                checkpoint_dir=str(tmp_path / "ck"),
                buckets=2,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    try:
        run_once()
        d1 = {r["url"]: r["id"] for r in _current_dict(spark, str(tmp_path / "dict")).collect()}
        m1 = spark.table("stream_edges_cont").count()
        assert m1 == 3 and set(d1) == {"u/a", "u/b", "u/c"}

        # new file arrives; rerun with the SAME checkpoint
        second = spark.createDataFrame(
            pd.DataFrame([page("u/d", ["u/a", "u/e"])], columns=cols)
        )
        second.coalesce(1).write.mode("append").parquet(src_dir)
        run_once()
        # a same-session reader that scanned the table before an append
        # must refresh: the file-listing cache is session-scoped, and
        # the sink's own refresh clears only its micro-batch session
        # clone (on a real deployment the Iceberg catalog makes new
        # snapshots visible without this)
        spark.catalog.refreshTable("stream_edges_cont")
        d2 = {r["url"]: r["id"] for r in _current_dict(spark, str(tmp_path / "dict")).collect()}
        t = spark.table("stream_edges_cont")
        assert t.count() == m1 + 2  # only the new page's 2 links appended
        # earlier ids unchanged; new ids extend densely
        assert all(d2[u] == i for u, i in d1.items())
        assert sorted(d2.values()) == list(range(5))
        # the new edges resolve through the grown dictionary
        ids = {v: k for k, v in d2.items()}
        pairs = {(ids[r["src"]], ids[r["dst"]]) for r in t.collect()}
        assert ("u/d", "u/a") in pairs and ("u/d", "u/e") in pairs
    finally:
        spark.sql("DROP TABLE IF EXISTS stream_edges_cont")


def test_apply_link_batch_replay_idempotent(spark, tmp_path):
    """Crash-replay semantics, tested directly: re-applying the SAME
    batch (same batch_id) after a full or partial prior attempt leaves
    dictionary and edge table byte-identical — the dictionary version
    is reused once committed, and the edge insert dynamically
    overwrites its own partition instead of appending."""
    import pandas as pd

    from ligra_spark.streaming import read_stream_dictionary
    from ligra_spark.streaming.ingest_stream import apply_link_batch

    dict_dir = str(tmp_path / "dict")
    edge_path = str(tmp_path / "edges")
    import os

    os.makedirs(dict_dir, exist_ok=True)
    b0 = spark.createDataFrame(
        pd.DataFrame({"url": ["a", "b"], "href": ["b", "c"]})
    )
    b1 = spark.createDataFrame(
        pd.DataFrame({"url": ["d"], "href": ["a"]})
    )
    try:
        apply_link_batch(b0, 0, "replay_edges", edge_path, dict_dir, 2)
        apply_link_batch(b1, 1, "replay_edges", edge_path, dict_dir, 2)
        d1 = sorted(
            (r["id"], r["url"])
            for r in read_stream_dictionary(spark, dict_dir).collect()
        )
        e1 = sorted(
            (r["src"], r["dst"], r["batch_id"])
            for r in spark.table("replay_edges").collect()
        )
        assert len(e1) == 3 and sorted(i for i, _ in d1) == [0, 1, 2, 3]

        # replay BOTH batches (crash-recovery re-run)
        apply_link_batch(b0, 0, "replay_edges", edge_path, dict_dir, 2)
        apply_link_batch(b1, 1, "replay_edges", edge_path, dict_dir, 2)
        d2 = sorted(
            (r["id"], r["url"])
            for r in read_stream_dictionary(spark, dict_dir).collect()
        )
        e2 = sorted(
            (r["src"], r["dst"], r["batch_id"])
            for r in spark.table("replay_edges").collect()
        )
        assert d2 == d1
        assert e2 == e1
    finally:
        spark.sql("DROP TABLE IF EXISTS replay_edges")
