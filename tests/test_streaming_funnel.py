"""Cross-batch streaming funnel (streaming.streaming_funnel): the
maintained per-user stage must equal the batch funnel when events
arrive in timestamp order, across real micro-batch boundaries."""

import os

import pyspark.sql.functions as F


_ROWS = [
    # (event_id, user_id, ts, type) — u1 completes across 3 batches,
    # u2 stalls at view (click precedes its view), u3 fails on a tie,
    # u4 completes inside one batch
    (1, 1, "2020-01-01 10:00:00", "view"),
    (2, 2, "2020-01-01 10:00:00", "click"),
    (3, 3, "2020-01-01 10:00:00", "view"),
    (4, 3, "2020-01-01 10:00:00", "click"),
    (5, 4, "2020-01-01 10:00:00", "view"),
    (6, 4, "2020-01-01 10:01:00", "click"),
    (7, 4, "2020-01-01 10:02:00", "purchase"),
    # batch 2
    (8, 1, "2020-01-02 10:00:00", "click"),
    (9, 2, "2020-01-02 10:00:00", "view"),
    # batch 3
    (10, 1, "2020-01-03 10:00:00", "purchase"),
    (11, 2, "2020-01-03 10:00:00", "purchase"),
]
_BATCH_SPLIT = [7, 9, 11]  # prefix lengths (ts-ordered across batches)
_STEPS = ["view", "click", "purchase"]


def _ev_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_streaming_funnel_matches_batch(spark, tmp_path):
    from ligra_spark.functions.funnel import funnel_counts
    from ligra_spark.streaming import streaming_funnel

    src_dir = str(tmp_path / "ev_in")
    start = 0
    for bid, end in enumerate(_BATCH_SPLIT):
        _ev_df(spark, _ROWS[start:end]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src_dir, f"b{bid}"))
        start = end

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_funnel(stream, _STEPS)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "stream did not finish in 240s"
    finally:
        q.stop()

    prog = spark.read.parquet(out_dir)
    # final stage per user = max emitted stage (progression log)
    final = {
        r["user_id"]: r["stage"]
        for r in prog.groupBy("user_id").agg(F.max("stage").alias("stage")).collect()
    }
    # u1 completes (3), u2 reaches view only (its click preceded the
    # view), u3 fails the strict tie (1), u4 completes in-batch (3)
    assert final == {1: 3, 2: 1, 3: 1, 4: 3}

    # cumulative stage counts == the batch funnel over the full table
    batch = {
        r["stage"]: r["users"]
        for r in funnel_counts(_ev_df(spark, _ROWS), _STEPS).collect()
    }
    stream_counts = {
        i: sum(1 for s in final.values() if s >= i) for i in (1, 2, 3)
    }
    assert stream_counts == batch
