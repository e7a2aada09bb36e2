"""Pages → link-graph ingestion: the Spark twin of Ligra's IO layer
(``/root/reference/ligra/IO.h:163-316`` builds CSR from text files; we
build a partitioned edge table from a web-pages table, which is the
input shape the north rule mandates).

Pipeline (all JVM except the id-stamping, which is one Arrow batch
pass):

  pages(url, warc_ts, html, text, lang)
    → extract links (regexp, whole-stage codegen)          [scan]
    → url → dense id dictionary                            [1 sort shuffle]
    → edges(src, dst) via two dictionary joins             [2 shuffles]
    → LinkGraph (src-partitioned, persisted)

Dense-id assignment is the classic scalable two-phase rank: range-
partition urls, count per partition (tiny driver collect — P longs),
prefix-sum offsets, stamp offset+local_rank per partition with an
Arrow-batched ``mapInPandas``.  Deterministic (ids = lexicographic url
rank), no single-partition Window, no monotonically_increasing_id
gaps, collision-free (unlike 64-bit url hashing, which WILL collide at
10^12 rows by birthday bound).

At 100 TB: the dictionary is itself a partitioned table (~10^12 rows ×
~100 B); the url→id joins are plain shuffle hash joins on url — this is
the one unavoidable pair of wide shuffles in ingestion, and it runs
once, after which everything operates on compact longs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extracted_pages
from .graph import LinkGraph

__all__ = [
    "assign_dense_ids",
    "build_vertex_dictionary",
    "build_edges",
    "build_link_graph",
    "host_of",
    "contract_to_host_graph",
]


def assign_dense_ids(
    df: DataFrame, key: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """(key, ...) → (id, key, ...) with id = 0-based lexicographic rank
    of ``key`` (dense, deterministic, distributed)."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # persist is CORRECTNESS-critical, not an optimization: the count
    # job and the stamping job below must observe the SAME range
    # boundaries, but repartitionByRange samples per materialization —
    # re-executing the plan in the second job can pick different
    # boundaries, silently shifting every id after the first boundary
    # that moved (caught by an sf0.1 dictionary diff: a 36-url block
    # shift at 5,000 rows).  The cache pins one partitioning for both.
    from pyspark import StorageLevel

    parts = (
        df.repartitionByRange(p, F.col(key))
        .sortWithinPartitions(key)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        parts.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in range(p):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    schema_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in parts.schema)
    out_schema = f"id long, {schema_fields}"

    def stamp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets[pid]
        for pdf in it:
            pdf = pdf.copy()
            pdf.insert(0, "id", range(base, base + len(pdf)))
            base += len(pdf)
            yield pdf

    # the eager localCheckpoint is CORRECTNESS-critical, like the
    # persist above: TaskContext.partitionId() is STAGE-relative, and
    # stamp is only correct when its stage's partition ids are the
    # stamped RDD's own (true in this dedicated materialization job).
    # Left lazy, a downstream plan can fuse the mapInPandas into a
    # larger stage whose ids are shifted — e.g. the second leg of a
    # union reruns stamp with ids offset by the first leg's partition
    # count (KeyError at best, silently shifted ids at worst; caught
    # by the streaming incremental-dictionary sink, which unions the
    # new ids with the existing dictionary).  Checkpointing runs stamp
    # exactly once, in the right stage, and freezes the result.
    out = parts.mapInPandas(stamp, schema=out_schema).localCheckpoint(eager=True)
    parts.unpersist()
    return out


def build_vertex_dictionary(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(id, url) — one row per page, id = dense url rank."""
    return assign_dense_ids(pages.select("url"), "url", num_partitions).select("id", "url")


def build_edges(
    pages: DataFrame,
    dictionary: DataFrame,
    drop_unknown_targets: bool = True,
    canonicalize: bool = False,
) -> DataFrame:
    """(src, dst) long edge table: explode per-page link arrays and map
    both endpoints through the dictionary.  Duplicate links preserved.
    Links to urls outside the page set are dropped (Ligra graphs are
    closed over their vertex set) unless drop_unknown_targets=False, in
    which case they raise at join time via inner-join row loss anyway.

    ``canonicalize`` maps both endpoints through
    :func:`ligra_spark.extract.normalize_url` before the dictionary
    join — the dictionary must then hold canonical urls (see
    :func:`build_link_graph`).  Still one codegen scan-project before
    the joins; spelling variants of one page collide to one vertex.
    """
    links = (
        extracted_pages(pages)
        .select("url", F.explode("links").alias("href"))
    )
    if canonicalize:
        from .extract import normalize_url

        links = links.select(
            normalize_url(F.col("url")).alias("url"),
            normalize_url(F.col("href")).alias("href"),
        )
    d_src = dictionary.select(F.col("url"), F.col("id").alias("src"))
    d_dst = dictionary.select(F.col("url").alias("href"), F.col("id").alias("dst"))
    how = "inner"  # unknown targets drop out of the join
    return (
        links.join(d_src, "url", how)
        .join(d_dst, "href", how)
        .select("src", "dst")
    )


def host_of(url) -> F.Column:
    """Host component of a url (the authority between ``scheme://`` and
    the first ``/ : ? #``), '' when the url has no scheme.  Pure
    Catalyst regexp so the extraction stays in whole-stage codegen and
    has a byte-identical ANSI-SQL twin (``regexp_extract`` exists in
    both engines with the same pattern semantics here)."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)", 1)


def contract_to_host_graph(
    edges: DataFrame,
    dictionary: DataFrame,
    host_col=None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Contract a page-level edge table to the host level — the
    Common-Crawl host-graph construction: vertices become hosts
    (dense lexicographic ids), an edge (h1, h2, w) means w page-level
    links point from pages on h1 to pages on h2 (self-loops = w
    intra-host links; keep or filter downstream).

    Inputs are ``build_link_graph``'s outputs: edges(src, dst) over
    page ids and dictionary(id, url).  ``host_col`` overrides the url →
    host expression (default :func:`host_of` over ``url``).

    Scale shape: the page→host map is one n-row projection of the
    dictionary; stamping hosts onto edges is two shuffle-hash joins on
    page id (the src-side join is exchange-free when edges are already
    src-partitioned), and the contraction itself is one
    groupBy(hsrc, hdst) whose map-side partial aggregation absorbs the
    fan-in of large hosts before the shuffle — no host-level skew
    reaches the wire.

    Returns (host_edges(src, dst, weight), host_dictionary(id, host)).
    """
    hosts = dictionary.select(
        "id", (host_col if host_col is not None else host_of(F.col("url"))).alias("host")
    )
    hdict = assign_dense_ids(
        hosts.select("host").distinct(), "host", num_partitions
    ).select("id", "host")
    page2host = hosts.join(
        hdict.select(F.col("host"), F.col("id").alias("hid")), "host"
    ).select("id", "hid")
    host_edges = (
        edges.join(
            page2host.select(F.col("id").alias("src"), F.col("hid").alias("hsrc")),
            "src",
        )
        .join(
            page2host.select(F.col("id").alias("dst"), F.col("hid").alias("hdst")),
            "dst",
        )
        .groupBy(F.col("hsrc").alias("src"), F.col("hdst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return host_edges, hdict


def build_link_graph(
    spark: SparkSession,
    pages: DataFrame,
    num_partitions: int | None = None,
    make_symmetric: bool = False,
    canonicalize: bool = False,
) -> tuple[LinkGraph, DataFrame]:
    """Full ingestion: returns (LinkGraph, dictionary).

    ``canonicalize`` runs both page urls and link targets through
    :func:`ligra_spark.extract.normalize_url` first, so spelling
    variants (case, default ports, fragments, empty path) collapse to
    ONE vertex; the dictionary then holds distinct canonical urls and
    pages sharing a canonical url merge their out-links."""
    if canonicalize:
        from .extract import normalize_url

        urls = pages.select(
            normalize_url(F.col("url")).alias("url")
        ).distinct()
        dictionary = build_vertex_dictionary(urls, num_partitions).persist()
    else:
        dictionary = build_vertex_dictionary(pages, num_partitions).persist()
    n = dictionary.count()
    edges = build_edges(pages, dictionary, canonicalize=canonicalize)
    g = LinkGraph.from_edges(
        spark, edges, n=n, num_partitions=num_partitions, make_symmetric=make_symmetric
    )
    return g, dictionary
