"""Bucketed edge-table storage — the shuffle-free load path.

``LinkGraph.from_edges`` hash-repartitions the edge table on ``src``
at load: one full shuffle of every edge before the first superstep.
At gate scale that is milliseconds; at 100 TB it is the single
largest avoidable data movement in the whole pipeline — the edges are
immutable across supersteps AND across runs, so their partitioning
should be paid once at ingest and reused forever.  This module is
that path, using Spark's storage bucketing (the open-source analog of
the Iceberg ``bucket(N, src)`` partition transform the north rule's
table layout would use):

- ``write_bucketed_edges``: persist an edge DataFrame as a parquet
  table bucketed (and sorted) by ``src`` — Spark writes one file set
  per ``murmur3(src) % buckets`` bucket and records the bucket spec
  in the catalog.
- ``read_bucketed_graph``: build a :class:`~ligra_spark.graph.LinkGraph`
  whose ``edges`` come straight from the bucketed scan with **no
  repartition**.  Catalyst knows the scan's hash partitioning, so the
  per-superstep ``state ⋈ edges on src`` shuffles ONLY the small state
  side and the ``out_degrees`` groupBy needs no exchange at all.

Why this matters for the reference parity story: Ligra pays its
layout cost in ``readGraphFromFile`` / ``readGraphFromBinary``
(``/root/reference/ligra/IO.h:94-180``) which builds the in-memory
CSR once per process run; the bucketed table is the cluster twin —
CSR-building cost paid once at ingest, amortized over every later
run, with the bucket spec living in the catalog instead of a file
header.

Scale notes (100 TB):

- bucket count should match (or integer-multiple) the superstep
  shuffle partitioning so co-partitioning is recognized; at cluster
  scale use ~2-4x total cores, same rule as shuffle partitions.
- the in-memory session catalog keeps bucket specs for the session
  only; a real deployment points the same code at a persistent
  catalog (HMS / Iceberg REST) — the DataFrame API is identical.
- AQE never coalesces a bucketed scan (there is no shuffle to
  coalesce), so the exchange-free property survives adaptive
  replanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import LinkGraph, symmetrize

__all__ = [
    "write_bucketed_edges",
    "read_bucketed_graph",
    "table_num_buckets",
    "write_bucketed_incidence",
    "read_bucketed_hypergraph",
    "compact_bucketed_table",
]


def write_bucketed_edges(
    edges: DataFrame,
    name: str,
    path: str,
    buckets: int,
    salt_buckets: int = 1,
    make_symmetric: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write ``edges`` (src, dst[, weight]) as a parquet table bucketed
    by ``src`` (or (src, salt) for the hub-salted layout) at ``path``,
    registered in the session catalog as ``name``.

    ``salt_buckets > 1`` stamps the same ``salt = murmur-style
    pmod(xxhash64(dst), k)`` column :meth:`LinkGraph.from_edges` uses,
    and buckets on (src, salt) — the on-disk twin of the engine's
    salted in-memory layout, so hub out-edges spread across buckets
    at rest too.

    Files within each bucket are sorted by the bucket key: the
    per-superstep join gains nothing from it (hash join), but sorted
    runs compress better and make per-bucket CSR assembly inside
    ``applyInPandas`` consumers a zero-sort pass.

    The write itself is SHUFFLE-FREE by design: each input task fans
    its rows out into per-bucket files locally (task × bucket files).
    Scan parallelism equals the bucket count either way, so the only
    cost of the extra files is open overhead — reclaimed in bulk by
    ``compact_bucketed_table`` when appends accumulate, instead of
    paying a full shuffle on every ingest write.
    """
    spark = edges.sparkSession
    if make_symmetric:
        edges = symmetrize(edges)
    cols = ["src", "dst"] + (["weight"] if "weight" in edges.columns else [])
    e = edges.select(
        *[F.col(c).cast("long") if c != "weight" else F.col(c) for c in cols]
    )
    keys = ["src"]
    if salt_buckets > 1:
        e = e.withColumn(
            "salt", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)).cast("int")
        )
        keys = ["src", "salt"]
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        e.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(name)
    )


def table_num_buckets(spark: SparkSession, name: str) -> int:
    """Bucket count recorded in the catalog for ``name``."""
    for row in spark.sql(f"DESCRIBE FORMATTED {name}").collect():
        if row["col_name"].strip() == "Num Buckets":
            return int(row["data_type"])
    raise ValueError(f"table {name} has no bucket spec")


def read_bucketed_graph(
    spark: SparkSession,
    name: str,
    n: int | None = None,
    symmetric: bool = False,
    salt_buckets: int = 1,
) -> LinkGraph:
    """Load a :class:`LinkGraph` from a bucketed edge table with NO
    load-time shuffle: the bucketed scan's hash partitioning stands in
    for ``from_edges``'s ``repartition(p, "src")``.

    ``symmetric`` / ``salt_buckets`` must describe how the table was
    written (``write_bucketed_edges`` flags); ``n`` as in
    ``from_edges`` — pass it when trailing vertices are isolated.
    """
    t = spark.table(name)
    cols = [c for c in ("src", "dst", "weight", "salt") if c in t.columns]
    # project away bookkeeping columns (e.g. the streaming sink's
    # batch_id partition column) — a narrow select, the scan's bucket
    # partitioning survives it
    e = t.select(*cols).persist(StorageLevel.MEMORY_AND_DISK)
    p = table_num_buckets(spark, name)
    if n is None:
        row = e.agg(
            F.greatest(F.max("src"), F.max("dst")).alias("mx"),
            F.count(F.lit(1)).alias("m"),
        ).first()
        n, m = int(row["mx"]) + 1, int(row["m"])
    else:
        m = e.count()
    return LinkGraph(
        spark,
        e,
        n=n,
        m=m,
        num_partitions=p,
        symmetric=symmetric,
        salt_buckets=salt_buckets,
    )


def write_bucketed_incidence(
    inc: DataFrame,
    name: str,
    path: str,
    buckets: int,
    vertex_col: str = "vertex",
    hedge_col: str = "hedge",
    weight_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist an undirected hypergraph incidence table as the TWO
    direction tables the engine iterates over — ``{name}_v2h``
    bucketed by vertex and ``{name}_h2v`` bucketed by hyperedge —
    each in the (src, dst[, weight]) layout
    :class:`~ligra_spark.hygra.HyperGraph` uses.

    The hypergraph engine is two-directional by construction
    (``hygra.h`` keeps vertex→hedge and hedge→vertex CSRs side by
    side); bucketing can co-locate only one key per table, so the
    on-disk twin is a table pair — the same duplication
    ``from_incidence`` pays in cache, paid once at ingest instead.
    Duplicate (vertex, hedge) pins are removed before writing
    (membership is a set, matching ``from_incidence``).
    """
    spark = inc.sparkSession
    wcols = (
        [F.col(weight_col).cast("long").alias("weight")] if weight_col else []
    )
    base = inc.select(
        F.col(vertex_col).cast("long").alias("vertex"),
        F.col(hedge_col).cast("long").alias("hedge"),
        *wcols,
    ).dropDuplicates(["vertex", "hedge"])
    w = [F.col("weight")] if weight_col else []
    for suffix, src, dst in (("v2h", "vertex", "hedge"), ("h2v", "hedge", "vertex")):
        t = f"{name}_{suffix}"
        if mode == "overwrite":
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        (
            base.select(F.col(src).alias("src"), F.col(dst).alias("dst"), *w)
            .write.format("parquet")
            .mode(mode)
            .option("path", f"{path}/{suffix}")
            .bucketBy(buckets, "src")
            .sortBy("src")
            .saveAsTable(t)
        )


def read_bucketed_hypergraph(
    spark: SparkSession,
    name: str,
    nv: int | None = None,
    nh: int | None = None,
):
    """Load a :class:`~ligra_spark.hygra.HyperGraph` from the table
    pair written by :func:`write_bucketed_incidence`, with zero
    load-time shuffle in either direction."""
    from ..hygra import HyperGraph, _Direction

    fwd = spark.table(f"{name}_v2h").persist(StorageLevel.MEMORY_AND_DISK)
    rev = spark.table(f"{name}_h2v").persist(StorageLevel.MEMORY_AND_DISK)
    p = table_num_buckets(spark, f"{name}_v2h")
    m = fwd.count()
    if nv is None:
        nv = fwd.agg(F.max("src")).first()[0] + 1
    if nh is None:
        nh = rev.agg(F.max("src")).first()[0] + 1
    return HyperGraph(
        spark=spark,
        nv=int(nv),
        nh=int(nh),
        m=int(m),
        num_partitions=p,
        v2h=_Direction(fwd, int(m)),
        h2v=_Direction(rev, int(m)),
    )


def compact_bucketed_table(
    spark: SparkSession,
    name: str,
    path: str,
) -> int:
    """Rewrite a bucketed table into one file set per bucket at a new
    ``path``, preserving the bucket spec — the small-file compaction a
    streaming-appended table (``incremental_link_graph_sink``) needs
    periodically: every append adds a file per touched bucket, and
    thousands of tiny files per bucket eventually dominate scan open
    cost.

    Returns the row count.  Data-safe ordering: the compacted file
    set is FULLY written to ``path`` (a new directory, never the
    current location) under a scratch table name while the live table
    is untouched; only then is the name re-pointed — metadata-only
    drops plus a ``CREATE TABLE ... CLUSTERED BY ... LOCATION`` over
    the already-written files.  A failure before the swap leaves the
    old table intact; a failure DURING the swap is self-healed
    in-process by re-creating the name over the original (untouched)
    files.  What this cannot cover is a driver crash inside the
    metadata swap itself on a persistent catalog — both file sets
    survive, but the name must be re-created by re-issuing the CREATE
    (the window Iceberg's transactional ``rewrite_data_files``
    closes; on the sandbox's session-scoped catalog the question is
    moot).  Partitioned bucketed tables (the streaming sink's layout)
    are compacted per (partition, bucket) with the partition spec
    preserved; compact while the stream is stopped.

    The rewrite reads the old files as PLAIN parquet (no bucket
    metadata) so the ``repartition(buckets, keys)`` genuinely
    re-clusters rows — one task per bucket, one file per bucket —
    instead of Catalyst eliding it against the bucketed scan's
    already-satisfied distribution.
    """
    import os

    desc = spark.sql(f"DESCRIBE FORMATTED {name}").collect()
    buckets = table_num_buckets(spark, name)
    keys_row = [
        r["data_type"] for r in desc if r["col_name"].strip() == "Bucket Columns"
    ][0]
    keys = [k.strip(" `") for k in keys_row.strip("[]").split(",")]
    loc = [r["data_type"] for r in desc if r["col_name"].strip() == "Location"][0]
    loc_fs = loc.replace("file:", "")
    # normalized-path comparison: equal or nested either way is an error
    a = os.path.normpath(os.path.abspath(loc_fs))
    b = os.path.normpath(os.path.abspath(path))
    if a == b or b.startswith(a + os.sep) or a.startswith(b + os.sep):
        raise ValueError(
            "compaction path must be a new directory outside the table location"
        )
    pcols = [c.name for c in spark.catalog.listColumns(name) if c.isPartition]

    df = spark.read.parquet(loc)
    tmp = f"{name}__compacting"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    w = (
        df.repartition(buckets, *[F.col(k) for k in keys])
        .write.format("parquet")
        .mode("overwrite")
        .option("path", path)
    )
    if pcols:
        # preserve the partition spec (e.g. the streaming sink's
        # batch_id): the rewrite merges files per (partition, bucket)
        w = w.partitionBy(*pcols)
    w.bucketBy(buckets, *keys).sortBy(*keys).saveAsTable(tmp)
    n_rows = spark.table(tmp).count()
    # swap: drops are metadata-only (external tables keep their files).
    # Build the replacement DDL BEFORE dropping anything.
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    )
    key_list = ", ".join(f"`{k}`" for k in keys)
    part_clause = (
        "PARTITIONED BY (" + ", ".join(f"`{c}`" for c in pcols) + ") "
        if pcols
        else ""
    )
    ddl = (
        f"CREATE TABLE {name} ({cols}) USING parquet "
        f"{part_clause}"
        f"CLUSTERED BY ({key_list}) SORTED BY ({key_list}) "
        f"INTO {buckets} BUCKETS LOCATION "
    )
    spark.sql(f"DROP TABLE {tmp}")
    spark.sql(f"DROP TABLE {name}")
    try:
        spark.sql(ddl + f"'{path}'")
        if pcols:
            spark.sql(f"MSCK REPAIR TABLE {name}")
    except Exception:
        # self-heal the drop..create window for in-process failures:
        # restore the name over the ORIGINAL (untouched) file set
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(ddl + f"'{loc_fs}'")
        if pcols:
            spark.sql(f"MSCK REPAIR TABLE {name}")
        raise
    return n_rows
