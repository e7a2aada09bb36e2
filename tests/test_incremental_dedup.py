"""Incremental dedup maintenance (`streaming.incremental_dedup`):
batch-split independence, cross-batch transitive families, short-doc
exact dedup via the content bucket, replay idempotence, streaming run."""

import json
import os

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# near-dup chain: 10..12 drift by one word each (A~B, B~C); 20/21 exact
# dups; 30/31 exact dups too short to shingle (x-bucket only); 40 unique
_BASE = " ".join(f"w{i}" for i in range(12))
_ROWS = [
    (10, _BASE),
    (11, _BASE.replace("w3", "q3")),
    (12, _BASE.replace("w3", "q3").replace("w9", "q9")),
    (20, "alpha beta gamma delta epsilon zeta"),
    (21, "alpha beta gamma delta epsilon zeta"),
    (30, "tiny"),
    (31, "tiny"),
    (40, "totally different content with nothing shared here at all"),
]


def _state(spark, dd_dir):
    from ligra_spark.streaming import dedup_state

    return {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_state(spark, dd_dir).collect()
    }


def _expected():
    # families: {10, 11, 12} -> 10 (transitive), {20, 21} -> 20,
    # {30, 31} -> 30, {40} alone
    return {
        10: (10, 1), 11: (10, 0), 12: (10, 0),
        20: (20, 1), 21: (20, 0),
        30: (30, 1), 31: (30, 0),
        40: (40, 1),
    }


def test_cross_batch_families_and_split_independence(spark, tmp_path):
    from ligra_spark.streaming import apply_dedup_batch

    splits = [
        [[10, 20, 30], [11, 21, 31], [12, 40]],  # chain spread over batches
        [[12, 31, 40], [11, 21], [10, 20, 30]],  # reverse arrival order
    ]
    states = []
    for si, split in enumerate(splits):
        dd = str(tmp_path / f"dd{si}")
        for bid, ids in enumerate(split):
            batch = _docs(spark, [r for r in _ROWS if r[0] in ids])
            apply_dedup_batch(batch, bid, dd, 4)
        states.append(_state(spark, dd))
    assert states[0] == states[1] == _expected()


def test_replay_is_noop(spark, tmp_path):
    from ligra_spark.streaming import apply_dedup_batch, read_dedup_manifest

    dd = str(tmp_path / "dd")
    b0 = _docs(spark, _ROWS[:4])
    apply_dedup_batch(b0, 0, dd, 4)
    man = read_dedup_manifest(dd)
    st = _state(spark, dd)
    assert apply_dedup_batch(b0, 0, dd, 4) == 0
    assert read_dedup_manifest(dd) == man and _state(spark, dd) == st


def test_streaming_sink_end_to_end(spark, tmp_path):
    from ligra_spark.streaming import incremental_dedup_sink

    src_dir = str(tmp_path / "docs_in")
    thirds = [_ROWS[0::3], _ROWS[1::3], _ROWS[2::3]]
    for bid, rows in enumerate(thirds):
        _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, f"b{bid}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    dd = str(tmp_path / "dd")
    q = (
        incremental_dedup_sink(stream, dd, str(tmp_path / "ck"), 4)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "stream did not finish in 240s"
    finally:
        q.stop()
    man = json.load(open(os.path.join(dd, "_CURRENT")))
    assert len(man["batches"]) >= 1
    assert _state(spark, dd) == _expected()
