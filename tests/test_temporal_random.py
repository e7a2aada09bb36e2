"""Seeded randomized differential tests for the temporal operators.

One adversarial batch per operator (timestamp ties, null payloads,
left-only / right-only keys, rows landing exactly on the window
boundaries), pushed through ONE Spark job and compared against a
brute-force pandas oracle.  Complements the fixed-case tests in
test_functions.py with breadth: 400+ rows hit every branch of the
union/running-last (asof) and bin/residual (range) plans, including
the two-bucket spill and the inclusive/exclusive interval edges.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _ts(sec: int):
    import datetime

    return datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=int(sec))


@pytest.fixture(scope="module")
def temporal_data():
    rng = np.random.default_rng(7)
    nkeys = 25
    # right side: unique (key, ts) — the documented asof precondition —
    # with ~15% null payloads (the payload-tearing regression surface)
    rkey = rng.integers(1, nkeys + 1, 400)  # key 25 is right-only
    rts = rng.integers(0, 3000, 400)
    rval = rng.normal(size=400).round(3)
    right = pd.DataFrame({"user_id": rkey, "ts_i": rts, "value": rval})
    right = right.drop_duplicates(["user_id", "ts_i"]).reset_index(drop=True)
    right.loc[rng.random(len(right)) < 0.15, "value"] = np.nan

    lkey = rng.integers(0, nkeys, 400)  # key 0 is left-only
    lts = rng.integers(0, 3000, 400)
    left = pd.DataFrame(
        {"event_id": np.arange(400), "user_id": lkey, "ts_i": lts}
    )
    # force exact-timestamp collisions with right rows: the inclusive
    # (at-or-before) boundary of asof and the excluded rts == lts
    # boundary of range_join
    left.loc[:49, "user_id"] = right.loc[:49, "user_id"].to_numpy()
    left.loc[:49, "ts_i"] = right.loc[:49, "ts_i"].to_numpy()
    return left, right


def _spark_frames(spark, left, right):
    sl = spark.createDataFrame(
        [
            (int(e), int(k), _ts(t))
            for e, k, t in zip(left["event_id"], left["user_id"], left["ts_i"])
        ],
        "event_id long, user_id long, ts timestamp",
    )
    sr = spark.createDataFrame(
        [
            (int(k), _ts(t), None if np.isnan(v) else float(v))
            for k, t, v in zip(right["user_id"], right["ts_i"], right["value"])
        ],
        "user_id long, ts timestamp, value double",
    )
    return sl, sr


def test_asof_join_random_vs_bruteforce(spark, temporal_data):
    from ligra_spark.functions.temporal import asof_join

    left, right = temporal_data
    sl, sr = _spark_frames(spark, left, right)
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(sl, sr).collect()
    }
    assert len(got) == len(left)

    rby: dict[int, pd.DataFrame] = {
        k: g.sort_values("ts_i") for k, g in right.groupby("user_id")
    }
    for _, lrow in left.iterrows():
        g = rby.get(lrow["user_id"])
        match = None
        if g is not None:
            elig = g[g["ts_i"] <= lrow["ts_i"]]
            if len(elig):
                match = elig.iloc[-1]  # greatest ts <= left ts (unique)
        ats, aval = got[lrow["event_id"]]
        if match is None:
            assert ats is None and aval is None, lrow["event_id"]
        else:
            assert ats == _ts(match["ts_i"]), lrow["event_id"]
            if np.isnan(match["value"]):
                # null payload rides with its own timestamp — not torn
                # from an older non-null row
                assert aval is None, lrow["event_id"]
            else:
                assert aval == pytest.approx(match["value"]), lrow["event_id"]


def test_range_join_random_vs_bruteforce(spark, temporal_data):
    from ligra_spark.functions.temporal import range_join

    left, right = temporal_data
    W = 100  # small window → most intervals straddle two bins
    # boundary rows: for 30 left anchors add a right row exactly at
    # lts + W (inclusive, must pair) — rts == lts exclusions already
    # exist via the forced collisions in the fixture
    extra = left.iloc[50:80][["user_id", "ts_i"]].copy()
    extra["ts_i"] = extra["ts_i"] + W
    extra["value"] = 9.9
    right2 = pd.concat([right, extra], ignore_index=True)

    sl, sr = _spark_frames(spark, left, right2)
    got = [
        (r["event_id"], r["win_ts"], r["win_value"])
        for r in range_join(sl, sr, window_s=W).collect()
    ]

    merged = left.merge(right2, on="user_id", suffixes=("", "_r"))
    hits = merged[
        (merged["ts_i_r"] > merged["ts_i"])
        & (merged["ts_i_r"] <= merged["ts_i"] + W)
    ]
    # multiset compare (Counter): tuples may mix None and float values
    # at the same (event, ts), which sorted() cannot order
    from collections import Counter

    want = Counter(
        (
            int(h["event_id"]),
            _ts(h["ts_i_r"]),
            None if np.isnan(h["value"]) else round(float(h["value"]), 3),
        )
        for _, h in hits.iterrows()
    )
    norm = Counter(
        (e, t, None if v is None else round(v, 3)) for e, t, v in got
    )
    assert norm == want
    # the boundary rows at exactly lts + W all paired
    assert sum(c for (_, _, v), c in norm.items() if v == 9.9) >= 30


def test_asof_join_tie_break_duplicate_right_rows(spark):
    """Duplicate (by, on) right rows: with tie_break=<col> the row with
    the GREATEST tie_break value wins deterministically — equivalent to
    pre-deduping the right side with row_number() over (by, on order by
    tie_break desc).  Randomized vs a brute-force pandas oracle on the
    pre-deduped right side, including null-payload winners."""
    rng = np.random.default_rng(13)
    nkeys = 8
    rkey = rng.integers(0, nkeys, 300)
    rts = rng.integers(0, 40, 300)  # tiny ts range → many exact dups
    right = pd.DataFrame(
        {
            "user_id": rkey,
            "ts_i": rts,
            "rid": np.arange(300),
            "value": rng.normal(size=300).round(3),
        }
    )
    right.loc[rng.random(300) < 0.2, "value"] = np.nan
    left = pd.DataFrame(
        {
            "event_id": np.arange(200),
            "user_id": rng.integers(0, nkeys, 200),
            "ts_i": rng.integers(0, 45, 200),
        }
    )

    sl = spark.createDataFrame(
        [(int(e), int(k), _ts(t)) for e, k, t in
         zip(left["event_id"], left["user_id"], left["ts_i"])],
        "event_id long, user_id long, ts timestamp",
    )
    sr = spark.createDataFrame(
        [(int(k), _ts(t), int(i), None if np.isnan(v) else float(v))
         for k, t, i, v in
         zip(right["user_id"], right["ts_i"], right["rid"], right["value"])],
        "user_id long, ts timestamp, rid long, value double",
    )

    from ligra_spark.functions.temporal import asof_join

    got = {
        r["event_id"]: (r["asof_ts"], r["asof_rid"], r["asof_value"])
        for r in asof_join(
            sl, sr, right_cols=("rid", "value"), tie_break="rid"
        ).collect()
    }
    assert len(got) == len(left)

    # oracle: keep only the max-rid row per (user_id, ts), then plain asof
    # (drop_duplicates, not groupby().last() — the latter skips NaN
    # payloads and would tear the winning row apart)
    dedup = right.sort_values(["user_id", "ts_i", "rid"]).drop_duplicates(
        ["user_id", "ts_i"], keep="last"
    )
    rby = {k: g.sort_values("ts_i") for k, g in dedup.groupby("user_id")}
    for _, lrow in left.iterrows():
        g = rby.get(lrow["user_id"])
        match = None
        if g is not None:
            elig = g[g["ts_i"] <= lrow["ts_i"]]
            if len(elig):
                match = elig.iloc[-1]
        ats, arid, aval = got[lrow["event_id"]]
        if match is None:
            assert ats is None and arid is None and aval is None
        else:
            assert ats == _ts(match["ts_i"]) and arid == match["rid"]
            if np.isnan(match["value"]):
                assert aval is None
            else:
                assert aval == pytest.approx(match["value"])
