"""Streaming link-graph maintenance: continuous crawl pages →
incremental url dictionary + engine-ready bucketed edge table.

The batch ingest (``ligra_spark.ingest``) assumes the corpus is
complete before ids are assigned.  A live crawl never is: pages
arrive forever, and the engine-side tables must stay queryable while
they grow.  This module is the streaming twin:

  pages stream → extract links (same JVM expression as batch)
    → per micro-batch (foreachBatch):
        1. new urls  = batch nodes  ∖  current dictionary
        2. assign them the next dense ids (same two-phase rank as
           ``ingest.assign_dense_ids``, offset by the current max id
           — ids stay dense 0..n-1 forever, they just stop being
           globally lexicographic, which nothing downstream needs)
        3. publish dictionary version v{batch_id} via an atomic
           ``_CURRENT`` pointer (the parquet stand-in for an Iceberg
           snapshot commit, same protocol as
           ``incremental_degree_sink``)
        4. map edges through the dictionary and APPEND into the
           bucketed edge table (``sources.bucketed`` layout) — the
           bucketBy(src) spec is enforced on every append, so
           ``read_bucketed_graph`` keeps its zero-shuffle load and
           every app can run against the graph-so-far between
           batches.

Same-session visibility: after an append, a reader that already
scanned the edge table must ``spark.catalog.refreshTable(name)`` —
Spark's file-listing cache is session-scoped, and the sink can only
refresh its own micro-batch session clone.  (Iceberg snapshots make
this refresh unnecessary on a real deployment.)

Delivery semantics: foreachBatch replays a batch after a crash, so
step 4 is guarded by a per-batch ``_batch_{id}_COMMITTED`` marker
(appends are applied exactly once); steps 1-3 are idempotent per
batch id (a replayed batch finds its urls already in the dictionary
and assigns nothing).  On a real deployment both tables are Iceberg
and steps 3-4 become one transactional commit.

At 100 TB scale: per batch the work is two anti/equi joins on url
against the dictionary (the same one-time cost the batch path pays,
amortized over arrivals) plus a bucketed append that only touches the
new rows.  Nothing ever rewrites the existing edge files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ingest import assign_dense_ids

__all__ = ["incremental_link_graph_sink"]

_DICT_SCHEMA = "id long, url string"


def incremental_link_graph_sink(
    links: DataFrame,
    edge_table: str,
    edge_path: str,
    dict_dir: str,
    checkpoint_dir: str,
    buckets: int,
):
    """Build the foreachBatch writer for a (url, warc_ts, href) link
    stream (``stream_pages_to_edges`` output).  Returns the
    ``DataStreamWriter`` — call ``.trigger(availableNow=True)`` /
    ``.start()`` on it."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        marker = os.path.join(edge_path, f"_batch_{batch_id}_COMMITTED")
        if os.path.exists(marker):
            return  # replayed batch: edges already appended
        batch = batch.select("url", "href").persist()
        try:
            nodes = (
                batch.select(F.col("url").alias("u"))
                .unionByName(batch.select(F.col("href").alias("u")))
                .distinct()
            )
            cur_ptr = os.path.join(dict_dir, "_CURRENT")
            if os.path.exists(cur_ptr):
                with open(cur_ptr) as fh:
                    cur = spark.read.parquet(fh.read().strip())
                # None when the published dictionary is empty (a prior
                # batch carried zero link events)
                base = cur.agg(F.max("id")).first()[0]
                base = -1 if base is None else int(base)
            else:
                cur = spark.createDataFrame([], _DICT_SCHEMA)
                base = -1
            new = nodes.join(cur, nodes["u"] == cur["url"], "left_anti")
            newd = assign_dense_ids(
                new.select(F.col("u").alias("url")), "url"
            ).select((F.col("id") + F.lit(base + 1)).alias("id"), "url")
            d_next = cur.unionByName(newd)
            vdir = os.path.join(dict_dir, f"v{batch_id}")
            d_next.write.mode("overwrite").parquet(vdir)
            tmp = cur_ptr + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(vdir)
            os.replace(tmp, cur_ptr)

            d = spark.read.parquet(vdir)  # one pinned materialization
            edges = (
                batch.join(d.hint("shuffle_hash"), batch["url"] == d["url"])
                .select(F.col("id").alias("src"), "href")
                .join(
                    d.hint("shuffle_hash"),
                    F.col("href") == d["url"],
                )
                .select("src", F.col("id").alias("dst"))
            )
            (
                edges.write.format("parquet")
                .mode("append")
                .option("path", edge_path)
                .bucketBy(buckets, "src")
                .sortBy("src")
                .saveAsTable(edge_table)
            )
            # drop the session's cached file listing for the table, or
            # same-session readers that already scanned it keep seeing
            # the pre-append snapshot
            spark.catalog.refreshTable(edge_table)
            with open(marker, "w") as fh:
                fh.write("ok")
        finally:
            batch.unpersist()

    return (
        links.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
