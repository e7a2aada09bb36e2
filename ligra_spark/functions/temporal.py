"""Temporal joins over event tables — operators Spark lacks natively,
composed from DataFrame primitives (no UDFs, no range explosion).

``asof_join`` is the training-data-pipeline staple: for every left row
attach the most recent right row at-or-before it (per key).  The naive
formulation is an inequality join — a cartesian-per-key blowup that
Spark plans as a broadcast-nested-loop.  The scalable form used here
is the classic union trick:

    union(left tagged 1, right tagged 0)
      → one shuffle on the key column
      → per-partition sort by (time, tag)
      → running last-non-null of the right payload
      → keep left rows

One shuffle + one sort, identical cost shape to a groupBy — this is
the plan you want at 10^12 events.  (The same pattern with a range
cap is a binned range join; DuckDB's native ASOF JOIN is the oracle
twin.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    tie_break: str | None = None,
) -> DataFrame:
    """Backward (at-or-before, inclusive) as-of join: every left row
    gains ``prefix + on`` (the matched right timestamp) and
    ``prefix + c`` for each payload column ``c`` in ``right_cols``,
    from the right row with the greatest ``on`` <= the left row's
    ``on`` within the same ``by`` key; nulls when no such row exists
    (left-join semantics).

    Ties: a right row at EXACTLY the left row's timestamp matches
    (inclusive, like DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).
    Multiple right rows sharing one (by, on) pair are ambiguous under
    engine-chosen ordering; pass ``tie_break=<right column>`` to pin
    the winner deterministically — the row with the GREATEST
    ``tie_break`` value wins (e.g. latest ``event_id``), matching a
    pre-dedupe of the right side with
    ``row_number() over (partition by by, on order by tie_break desc)``.
    With ``tie_break=None`` the choice among exact duplicates is
    engine-dependent — pre-dedupe the right side if that can occur.

    The matched right row travels as ONE struct through the running
    ``last(ignorenulls)`` — per-column fills would tear a right row
    with a NULL payload apart (timestamp from the newest row, value
    filled from an older one).
    """
    clash = {f"{prefix}{c}" for c in (on, *right_cols)} | {"_side", "_p"}
    bad = clash & set(left.columns)
    if bad:
        raise ValueError(
            f"asof_join output columns {sorted(bad)} already exist on the "
            "left side (chained asof_join?) — pass a different prefix"
        )
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        by,
        F.col(on),
        F.struct(
            F.col(on).alias(on), *[F.col(c).alias(c) for c in right_cols]
        ).alias("_p"),
        *([F.col(tie_break).alias("_tb")] if tie_break else []),
    ).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)  # left rows: _p IS NULL
    # right rows sort BEFORE left rows at equal timestamps so an
    # exact-timestamp right row is visible to the running last();
    # among duplicate (by, on) right rows the greatest tie_break sorts
    # LAST so the running last() picks it (left rows carry NULL _tb
    # but are already separated by _side)
    order = [F.col(on).asc(), F.col("_side").asc()]
    if tie_break:
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select("*", F.last("_p", ignorenulls=True).over(w).alias("_f"))
    return filled.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_f").getField(c).alias(f"{prefix}{c}") for c in (on, *right_cols)],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    window_s: int = 1800,
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "win_",
) -> DataFrame:
    """Binned range join: pairs every left row with the right rows of
    the same ``by`` key whose ``on`` falls in the half-open interval
    (left.on, left.on + window_s] — "what happened in the W seconds
    AFTER each anchor".

    The naive form is an inequality join (nested-loop blowup).  The
    scalable form bins ``right`` by floor(epoch/W) and explodes each
    left row to its two candidate buckets (the interval spans at most
    two W-wide bins), turning the range predicate into an EQUI-join on
    (key, bucket) + an exact residual filter — right rows shuffle
    once, left rows twice, no row ever meets more than two buckets.
    This is the standard binned-range plan (Spark's own range-join
    hints on Databricks do the same under the hood).
    """
    w_us = window_s * 1_000_000

    def epoch_us(c):
        # unix_micros rejects TIMESTAMP_NTZ (parquet's default); the
        # session timezone is pinned to UTC so the cast is a bijection
        return F.unix_micros(c.cast("timestamp"))

    r = right.select(
        by,
        F.col(on).alias(f"{prefix}{on}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.floor(epoch_us(F.col(on)) / w_us).alias("_bkt"),
    )
    lb = F.floor(epoch_us(F.col(on)) / w_us)
    l = left.select("*", F.explode(F.array(lb, lb + 1)).alias("_bkt"))
    return (
        l.join(r, [by, "_bkt"])
        .filter(
            (F.col(f"{prefix}{on}") > F.col(on))
            & (
                epoch_us(F.col(f"{prefix}{on}"))
                <= epoch_us(F.col(on)) + w_us
            )
        )
        .drop("_bkt")
    )
