"""Ordered-funnel analysis over the events table — the standard
product/behavior query shape (how many users progressed view → click →
purchase, each step STRICTLY after the previous one), expressed as one
shuffle.

Plan: filter to funnel event types, ONE groupBy(user) collecting the
(ts, event_id, type)-sorted event array, then a single Catalyst
``aggregate`` lambda runs the stage state machine per user (advance
when the next expected type appears strictly later than the previous
advance).  No window over the raw event stream, no per-stage self-join
cascade — at 10^12 events the only exchange is the per-user collect,
and partial aggregation keeps it proportional to users, not events.

The greedy state machine equals the per-stage earliest-qualifying-
timestamp chain (t_i = min ts of step_i with ts > t_{i-1}) by the
standard exchange argument — the DuckDB oracle computes exactly that
chain as per-stage joins, so the two independent formulations pin each
other.  Tied timestamps: a single event advances at most one stage,
and a same-timestamp pair cannot satisfy the strict ordering — both
formulations agree (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts"]

_EPOCH = "1900-01-01 00:00:00"


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(stage, step, users) — users whose event history contains the
    step sequence in strictly increasing timestamp order, counted
    cumulatively (a user at stage 3 is also in stages 1 and 2).
    Timestamps must be after 1900-01-01 (the state-machine seed)."""
    if len(steps) < 1:
        raise ValueError("at least one funnel step")
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.struct(
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("et"),
        ).alias("_e"),
    )
    per_user = ev.groupBy("_u").agg(F.sort_array(F.collect_list("_e")).alias("_evs"))
    zero = F.struct(
        F.lit(0).alias("stage"), F.lit(_EPOCH).cast("timestamp").alias("last")
    )

    def step_fn(st, e):
        adv = (
            (st["stage"] < k)
            & (e["et"] == F.element_at(steps_lit, st["stage"] + 1))
            & (e["ts"] > st["last"])
        )
        return F.struct(
            F.when(adv, st["stage"] + 1).otherwise(st["stage"]).alias("stage"),
            F.when(adv, e["ts"]).otherwise(st["last"]).alias("last"),
        )

    reached = per_user.select(
        "_u", F.aggregate("_evs", zero, step_fn, lambda s: s["stage"]).alias("reached")
    )
    spark = events.sparkSession
    stages = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "stage int, step string"
    )
    counts = (
        F.broadcast(stages)
        .join(reached, F.col("reached") >= F.col("stage"))
        .groupBy("stage", "step")
        .agg(F.count(F.lit(1)).alias("users"))
    )
    return (
        stages.join(counts, ["stage", "step"], "left")
        .select("stage", "step", F.coalesce("users", F.lit(0)).alias("users"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-granularity cohort retention — the standard growth query
    next to the funnel: users are cohorted by their FIRST active day,
    and (cohort_day, day_offset) counts how many were active again
    ``offset`` days later (offset 0 = the cohort's size).

    Shape: one groupBy(user) for first-seen, one distinct over
    (user, day), one user-keyed join + one final agg — all partial-
    aggregated; nothing is per-event after the distinct.  Output:
    (cohort_day, day_offset, users), offsets with zero users omitted.
    """
    firsts = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    active = events.select(
        F.col(user_col).alias("_u"), F.to_date(ts_col).alias("_d")
    ).distinct()
    return (
        active.join(firsts, "_u")
        .groupBy(
            "cohort_day",
            F.datediff("_d", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("_u").alias("users"))
    )
