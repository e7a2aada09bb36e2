"""Streaming link-graph ingestion (Structured Streaming).

Pipeline (all JVM expressions — the same extractor as batch ingest):

    readStream(pages parquet dir)
      → extract links per page (regexp, ligra_spark.extract)
      → explode to (url, href, warc_ts)
      → EITHER windowed link-rate aggregation (watermarked — late
        pages beyond the watermark are dropped, exactly-once counts
        per window via the streaming state store)
      → OR foreachBatch micro-batch merge into a cumulative degree
        table (the incremental-view-maintenance pattern: each batch
        is a plain DataFrame, merged with the running aggregate and
        atomically swapped — at scale this is a MERGE INTO on an
        Iceberg table keyed by url).

File-source streaming (maxFilesPerTrigger) stands in for Kafka in
tests; swapping the source line is the only change for a real feed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract import extract_links_col, html_str

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

__all__ = [
    "stream_pages_to_edges",
    "stream_media_features",
    "windowed_link_counts",
    "incremental_degree_sink",
    "detect_new_hubs",
    "hub_onsets",
    "sessionize",
    "streaming_funnel",
]


def stream_pages_to_edges(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming DataFrame of (url, href, warc_ts) link events."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    return pages.select(
        "url",
        "warc_ts",
        F.explode(extract_links_col(html_str("html"))).alias("href"),
    )


MEDIA_STREAM_SCHEMA = "media_id long, payload binary"


def stream_media_features(
    spark: SparkSession,
    media_dir: str,
    max_files_per_trigger: int = 1,
    on_error: str = "skip",
) -> DataFrame:
    """Streaming multimodal featurization: readStream over a media
    parquet dir (media_id, payload) → JVM-side format sniffing →
    fused Arrow decode+features per micro-batch.

    ``image_features``'s ``mapInPandas`` is a NARROW streaming
    transformation, so the per-batch plan is identical to batch mode —
    the streaming twin of the media pipeline, the way
    ``stream_pages_to_edges`` twins the batch extractor.  Default
    ``on_error='skip'``: a crawl feed WILL contain undecodable
    payloads, and a poison message must not wedge the stream (each
    retry would hit the same byte).  Rows whose sniffed format is not
    a decodable image are filtered out JVM-side BEFORE the Python
    stage — the routing keeps codec work off non-image payloads.

    File source (maxFilesPerTrigger) stands in for Kafka, as above.
    """
    from ..functions.multimodal import image_features, with_media_format

    media = (
        spark.readStream.schema(MEDIA_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(media_dir)
    )
    routed = with_media_format(media).filter(
        F.col("format").isin("jpeg", "png", "gif", "bmp", "ppm", "tiff", "webp")
    )
    return image_features(
        routed.select("media_id", "payload"), fake=False, on_error=on_error
    )


def windowed_link_counts(
    links: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding-window in-link counts per target
    url: the streaming analog of the degree aggregation.  Late events
    beyond the watermark are dropped; windows finalize exactly once."""
    w = (
        F.window("warc_ts", window, slide)
        if slide
        else F.window("warc_ts", window)
    )
    return (
        links.withWatermark("warc_ts", watermark)
        .groupBy(w.alias("win"), F.col("href").alias("url"))
        .agg(F.count(F.lit(1)).alias("in_links"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "url",
            "in_links",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "10 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Session-window aggregation (``F.session_window``): one row per
    (key, session), where a session is a maximal run of events each
    within ``gap`` (INCLUSIVE — an event exactly at the session end
    merges) of the previous one; the window closes at last-event + gap
    (Spark's gap-timeout semantics).

    Works on BOTH batch and streaming input — the same expression
    compiles to a hash aggregate in batch and to the session-window
    state-store operator under a watermark in streaming (add
    ``.withWatermark(ts_col, ...)`` upstream and update/append output
    mode).  At 100 TB this is one shuffle on the key column; the
    session merge itself is state-store-local per key.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    out = ["n_events"]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
        out.append("sum_value")
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sw"), key_col)
        .agg(*aggs)
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key_col,
            *out,
        )
    )


def detect_new_hubs(links: DataFrame, threshold: int = 5) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    cumulative per-target in-link counting with **emit-once hub
    detection** — the first time a url's cumulative in-degree crosses
    ``threshold``, emit one (url, in_links) row; never again.

    This is not expressible as a watermarked windowed aggregation: it
    needs unbounded cross-batch cumulative state plus emit-once
    semantics, which is exactly what the arbitrary-state operator is
    for.  State per key is two ints (running total + emitted flag),
    sharded by the groupBy key across executors via the streaming
    state store (RocksDB-backed in production) — state size is
    O(distinct urls), independent of stream length.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        total, emitted = state.get if state.exists else (0, 0)
        total += batch
        if not emitted and total >= threshold:
            emitted = 1
            yield pd.DataFrame({"url": [key[0]], "in_links": [total]})
        state.update((total, emitted))

    return (
        links.groupBy(F.col("href"))
        .applyInPandasWithState(
            update,
            outputStructType="url string, in_links long",
            stateStructType="total long, emitted int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def hub_onsets(
    df: DataFrame,
    key_col: str = "href",
    order_cols: tuple[str, ...] = ("ts",),
    threshold: int = 5,
) -> DataFrame:
    """Batch twin of ``detect_new_hubs``: for every key whose total
    event count reaches ``threshold``, emit ONE row carrying the
    order-columns of the event that crossed the threshold (the
    "onset") plus ``in_links = threshold``.

    This is the event-granularity limit of the stateful streaming
    operator (one row per micro-batch ⇒ the crossing batch total is
    exactly ``threshold``), so the two are directly comparable — the
    equivalence is pinned by tests/test_multimodal_streaming.py.  One
    shuffle (the window partition on the key); the sort is per-key
    within partitions, never global.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    onset = {f"onset_{c}": F.col(c) for c in order_cols}
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == threshold)
        .select(
            F.col(key_col),
            *[v.alias(k) for k, v in onset.items()],
            F.lit(threshold).cast("long").alias("in_links"),
        )
    )


def incremental_degree_sink(
    links: DataFrame, out_dir: str, checkpoint_dir: str
):
    """foreachBatch sink maintaining a cumulative (url, out_links)
    table: per micro-batch, aggregate the batch, merge with the
    running table, write the new version, then atomically publish it
    via a _CURRENT pointer file (the parquet stand-in for an Iceberg
    snapshot commit)."""

    def merge(batch: DataFrame, batch_id: int):
        from .ingest_stream import _atomic_write

        spark = batch.sparkSession
        agg = batch.groupBy("url").agg(F.count(F.lit(1)).alias("out_links"))
        cur_ptr = os.path.join(out_dir, "_CURRENT")
        vdir = os.path.join(out_dir, f"v{batch_id}")
        if os.path.exists(cur_ptr):
            with open(cur_ptr) as fh:
                published = fh.read().strip()
            if published == vdir:
                return  # replayed batch: this version already published
            cur = spark.read.parquet(published)
            agg = (
                cur.unionByName(agg)
                .groupBy("url")
                .agg(F.sum("out_links").alias("out_links"))
            )
        # an uncommitted partial vdir from a crashed attempt is safely
        # overwritten — the pointer doesn't name it yet
        agg.write.mode("overwrite").parquet(vdir)
        _atomic_write(cur_ptr, vdir)

    return (
        links.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Cross-batch ordered-funnel progression as a custom stateful
    operator (``applyInPandasWithState``) — the streaming twin of
    ``functions.funnel.funnel_counts``.

    State per user is (stage, last-advance micros); each micro-batch's
    events for the user run through the SAME strict state machine
    (advance when the next expected step appears strictly after the
    previous advance), processed in (ts, event_id) order within the
    batch.  A row (user, stage, reached_ts) is emitted for every batch
    in which the user's stage advanced — the append-mode progression
    log of the funnel.

    Matches the batch funnel exactly when each user's events arrive in
    timestamp order ACROSS batches (the event-log norm; pinned by
    test).  A stage-k event that arrives in an earlier batch than its
    stage-(k-1) predecessor is skipped — cross-batch reordering would
    need a watermark-delayed buffer, the standard trade of
    unbounded-state operators.  State is two numbers per user,
    independent of stream length.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col])
        stage, last_us = state.get if state.exists else (0, -(1 << 62))
        advanced = False
        for ts, et in zip(rows[ts_col], rows[type_col]):
            us = ts.value // 1000
            if stage < k and step_of.get(et) == stage and us > last_us:
                stage += 1
                last_us = us
                advanced = True
        state.update((stage, last_us))
        if advanced:
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "stage": [stage],
                    "reached_ts": [pd.to_datetime(last_us, unit="us")],
                }
            )

    return events.groupBy(F.col(user_col)).applyInPandasWithState(
        update,
        outputStructType=f"{user_col} long, stage int, reached_ts timestamp",
        stateStructType="stage int, last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
