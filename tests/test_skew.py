"""Hub-skew fixture tests (FIXTURES.md F3): the salted edge layout must
be semantics-preserving — identical PageRank/CC results with and
without salting — while spreading a hub's edges across partitions."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ligra_spark import oracle
from ligra_spark.fixtures import skew_edges


@pytest.fixture(scope="module")
def skew(spark):
    n, src, dst = skew_edges(n=1 << 12)  # hub 0 with in-degree n/2
    df = spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))
    return n, src, dst, df


def test_salted_pagerank_identical(spark, skew):
    from ligra_spark.apps import pagerank
    from ligra_spark.graph import LinkGraph

    n, src, dst, df = skew
    expected, _ = oracle.pagerank(n, src, dst, max_iters=10)
    for buckets in (1, 4):
        g = LinkGraph.from_edges(spark, df, n=n, salt_buckets=buckets).materialize()
        got_df, _ = pagerank(g, max_iters=10)
        got = (
            got_df.toPandas().sort_values("id").reset_index(drop=True)["rank"].to_numpy()
        )
        np.testing.assert_allclose(got, expected, atol=1e-6, rtol=0)
        g.unpersist()


def test_salted_components_identical(spark, skew):
    from ligra_spark.apps import components
    from ligra_spark.graph import LinkGraph

    n, src, dst, df = skew
    g = LinkGraph.from_edges(
        spark, df, n=n, make_symmetric=True, salt_buckets=4
    ).materialize()
    from ligra_spark.rmat import make_symmetric as sym

    s, d = sym(src, dst)
    expected = oracle.components(n, s, d)
    got_df, _ = components(g)
    got = (
        got_df.toPandas().sort_values("id").reset_index(drop=True)["component"].to_numpy()
    )
    np.testing.assert_array_equal(got, expected)
    g.unpersist()


def test_salt_spreads_hub(spark, skew):
    """The reverse (in-edge) layout of the hub-heavy graph: without
    salting, all of hub 0's in-edges (as src of edges_in) share one
    partition; with salting they span multiple partitions."""
    from ligra_spark.graph import LinkGraph

    n, src, dst, df = skew
    rev = df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    g = LinkGraph.from_edges(spark, rev, n=n, salt_buckets=4).materialize()
    parts = (
        g.edges.filter(F.col("src") == 0)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert parts >= 3, f"hub edges only span {parts} partitions"
    g.unpersist()
