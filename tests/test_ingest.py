"""Ingestion tests: byte-identical text extraction (the input_hint
per-row invariant) and pages → edge-table fidelity vs the fixture's
known graph."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ligra_spark import fixtures


@pytest.fixture(scope="module")
def tiny_pages(spark, tiny_edges, tmp_path_factory):
    n, src, dst = tiny_edges
    out = str(tmp_path_factory.mktemp("pages"))
    fixtures.write_graph_fixture(out, scale="tiny", with_pages=True)
    return spark.read.parquet(f"{out}/pages.parquet"), (n, src, dst)


def test_extract_text_byte_identical(tiny_pages):
    """Spark regex extractor output == the single-node spec, byte for
    byte, for every url (BASELINE.json input_hint invariant)."""
    from ligra_spark.extract import extracted_pages

    pages, _ = tiny_pages
    rows = (
        extracted_pages(pages)
        .select("url", "text", "extracted_text", "html")
        .collect()
    )
    assert len(rows) == 128
    for r in rows:
        spec = fixtures.extract_text_py(bytes(r["html"]))
        assert r["extracted_text"] == r["text"] == spec, r["url"]
        # sha256 equality (frozen-hash form of the same invariant)
        assert (
            hashlib.sha256(r["extracted_text"].encode()).hexdigest()
            == hashlib.sha256(spec.encode()).hexdigest()
        )


def test_dense_id_assignment(tiny_pages):
    """ids are the 0-based lexicographic url rank — dense, stable."""
    from ligra_spark.ingest import build_vertex_dictionary

    pages, (n, _, _) = tiny_pages
    d = build_vertex_dictionary(pages, num_partitions=4).toPandas()
    assert sorted(d["id"]) == list(range(n))
    d = d.sort_values("url").reset_index(drop=True)
    assert list(d["id"]) == list(range(n))  # rank order
    # fixture urls zero-pad the page id, so rank == original page id
    assert list(d["url"]) == list(fixtures.url_for(np.arange(n)))


def test_dense_id_rank_exact_at_boundary_stress(spark):
    """Regression for the two-job range-boundary race: the count job
    and the stamping job of assign_dense_ids must observe the SAME
    range partitioning (the frame is persisted between them) — before
    the fix, re-sampled boundaries silently block-shifted every id
    after the first moved boundary (caught at 5,000 urls via the
    DuckDB dictionary diff).  Stress with non-padded urls (so
    lexicographic != numeric order) across many partitions and pin
    ids to the exact python sorted rank."""
    import pandas as pd

    from ligra_spark.ingest import assign_dense_ids

    urls = [f"u{i}" for i in range(5000)]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    out = assign_dense_ids(df, "url", num_partitions=16).toPandas()
    want = {u: i for i, u in enumerate(sorted(urls))}
    got = dict(zip(out["url"], out["id"]))
    assert got == want


def test_pages_to_edges_exact_multiset(tiny_pages, spark):
    """Extracted link graph == the generator's edge multiset exactly
    (duplicates preserved, ids recovered via the dictionary)."""
    from ligra_spark.ingest import build_link_graph

    pages, (n, src, dst) = tiny_pages
    g, _ = build_link_graph(spark, pages, num_partitions=4)
    assert g.n == n and g.m == len(src)
    got = g.edges.toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    order = np.lexsort((dst, src))
    np.testing.assert_array_equal(got["src"].to_numpy(), src[order])
    np.testing.assert_array_equal(got["dst"].to_numpy(), dst[order])
    g.unpersist()


def test_ingested_pagerank_matches_oracle(tiny_pages, spark):
    """End-to-end: pages → graph → PageRank == numpy oracle on the
    generator's edge list (the M1 flagship slice)."""
    from ligra_spark import oracle
    from ligra_spark.apps import pagerank
    from ligra_spark.ingest import build_link_graph

    pages, (n, src, dst) = tiny_pages
    g, _ = build_link_graph(spark, pages, num_partitions=4)
    expected, _ = oracle.pagerank(n, src, dst, max_iters=10)
    got_df, _ = pagerank(g, max_iters=10)
    got = (
        got_df.toPandas().sort_values("id").reset_index(drop=True)["rank"].to_numpy()
    )
    np.testing.assert_allclose(got, expected, atol=1e-6, rtol=0)
    g.unpersist()


def test_assign_dense_ids_survives_union_stage(spark):
    """Regression: TaskContext.partitionId() is stage-relative, so the
    stamping pass is only correct in its own materialization job.
    Before the eager-localCheckpoint fix, evaluating the stamped output
    as the SECOND leg of a union re-ran stamp with partition ids offset
    by the first leg's partition count (KeyError / shifted ids)."""
    import pandas as pd

    from ligra_spark.ingest import assign_dense_ids

    df = spark.createDataFrame(
        pd.DataFrame({"url": [f"u{i:03d}" for i in range(50)]})
    )
    ids = assign_dense_ids(df, "url")
    u = spark.createDataFrame([], "id long, url string").unionByName(ids)
    got = sorted(r["id"] for r in u.collect())
    assert got == list(range(50))
    by_url = {r["url"]: r["id"] for r in u.collect()}
    assert all(by_url[k] == i for i, k in enumerate(sorted(by_url)))


def test_host_graph_contraction(tiny_pages, spark):
    """Host-level contraction == the known fixture mapping: url host is
    id>>4 (16 pages per host), so host edge weights are the multiset
    counts of (src>>4, dst>>4); host ids are the lexicographic rank of
    the zero-padded host strings == numeric host order."""
    from ligra_spark.ingest import build_link_graph, contract_to_host_graph

    pages, (n, src, dst) = tiny_pages
    g, d = build_link_graph(spark, pages, num_partitions=4)
    he, hd = contract_to_host_graph(g.edges, d, num_partitions=4)
    hosts = hd.toPandas().sort_values("id").reset_index(drop=True)
    n_hosts = (n + 15) // 16
    assert list(hosts["id"]) == list(range(n_hosts))
    assert list(hosts["host"]) == [f"host{h:05d}.example" for h in range(n_hosts)]
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in he.collect()
    }
    expected: dict = {}
    for s, t in zip(src >> 4, dst >> 4):
        expected[(s, t)] = expected.get((s, t), 0) + 1
    assert got == expected
    g.unpersist()


def test_anchor_pairs_alignment_and_order(spark):
    """href/anchor arrays zip positionally, document order, duplicates
    preserved."""
    import pandas as pd

    from ligra_spark.extract import anchor_pairs

    html = (
        '<title>t</title><a href="a">one</a><p>x</p>'
        '<a href="b">two</a><a href="a">one</a>'
    ).encode()
    pages = spark.createDataFrame(
        pd.DataFrame({"url": ["p0"], "html": [html]})
    )
    got = anchor_pairs(pages).toPandas().sort_values("pos")
    assert list(got["href"]) == ["a", "b", "a"]
    assert list(got["anchor_text"]) == ["one", "two", "one"]
    assert list(got["pos"]) == [0, 1, 2]


def test_anchor_text_summary_counts_and_tiebreak(spark):
    """inlinks/distinct counts exact; top_anchor = max count with
    lexicographically-smallest tie-break (deterministic across
    engines/partitionings)."""
    import pandas as pd

    from ligra_spark.extract import anchor_text_summary

    def page(url, anchors):
        h = "".join(f'<a href="{t}">{a}</a>' for t, a in anchors).encode()
        return {"url": url, "html": h}

    pages = spark.createDataFrame(
        pd.DataFrame(
            [
                page("p0", [("x", "beta"), ("x", "alpha"), ("y", "solo")]),
                page("p1", [("x", "alpha"), ("x", "beta"), ("x", "beta")]),
            ]
        )
    )
    got = (
        anchor_text_summary(pages)
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    # x: beta 3, alpha 2 -> top beta; y: solo
    assert got.loc["x", "inlinks"] == 5
    assert got.loc["x", "distinct_anchors"] == 2
    assert got.loc["x", "top_anchor"] == "beta"
    assert got.loc["y", "inlinks"] == 1
    assert got.loc["y", "top_anchor"] == "solo"
    # tie case: equal counts -> lexicographically smallest
    pages2 = spark.createDataFrame(
        pd.DataFrame([page("p0", [("z", "bb"), ("z", "aa")])])
    )
    got2 = anchor_text_summary(pages2).toPandas()
    assert got2.loc[0, "top_anchor"] == "aa"


def test_normalize_url_rfc3986_cases(spark):
    """Syntax-based normalization: case, default ports, empty path,
    fragment; relative references pass through fragment-stripped."""
    import pandas as pd

    from pyspark.sql import functions as F

    from ligra_spark.extract import normalize_url

    cases = [
        ("HTTP://WWW.Example.COM:80", "http://www.example.com/"),
        ("https://Host.test:443/a?q=1#frag", "https://host.test/a?q=1"),
        ("http://h.test:8080/P", "http://h.test:8080/P"),
        ("ftp://H.test:80/x", "ftp://h.test:80/x"),
        ("https://h.test:80/", "https://h.test:80/"),
        ("http://h.test#only-frag", "http://h.test/"),
        ("relative/path#f", "relative/path"),
        ("http://h.test/CaseKept/Q?A=B", "http://h.test/CaseKept/Q?A=B"),
    ]
    df = spark.createDataFrame(pd.DataFrame({"u": [c[0] for c in cases]}))
    got = df.select(normalize_url(F.col("u")).alias("c")).toPandas()["c"]
    assert list(got) == [c[1] for c in cases]


def test_build_link_graph_canonicalize(spark):
    """Spelling variants (case, default port, fragment) collapse to one
    vertex; links in variant spellings resolve to the same target."""
    import pandas as pd

    def page(url, hrefs):
        h = "".join(f'<a href="{t}">x</a>' for t in hrefs).encode()
        return {"url": url, "html": h}

    pages = spark.createDataFrame(
        pd.DataFrame(
            [
                page("HTTP://A.test:80/", ["http://b.test/#frag"]),
                page("http://a.test/", ["HTTP://B.test"]),
                page("http://b.test/", ["http://a.test:80/"]),
            ]
        )
    )
    from ligra_spark.ingest import build_link_graph

    g, d = build_link_graph(spark, pages, num_partitions=2, canonicalize=True)
    dd = d.toPandas().sort_values("url").reset_index(drop=True)
    # 3 raw pages -> 2 canonical vertices, lexicographic dense ids
    assert list(dd["url"]) == ["http://a.test/", "http://b.test/"]
    assert list(dd["id"]) == [0, 1]
    e = sorted(map(tuple, g.edges.select("src", "dst").toPandas().to_numpy()))
    # both a-spellings link to b (2 edges kept as duplicates); b links to a
    assert e == [(0, 1), (0, 1), (1, 0)]
    # without canonicalization the variants stay separate vertices
    g2, d2 = build_link_graph(spark, pages, num_partitions=2)
    assert d2.count() == 3
