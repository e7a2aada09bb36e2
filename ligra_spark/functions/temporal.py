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

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward (at-or-before, inclusive) as-of join: every left row
    gains ``prefix + on`` (the matched right timestamp) and
    ``prefix + c`` for each payload column ``c`` in ``right_cols``,
    from the right row with the greatest ``on`` <= the left row's
    ``on`` within the same ``by`` key; nulls when no such row exists
    (left-join semantics).

    Ties: a right row at EXACTLY the left row's timestamp matches
    (inclusive, like DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).
    Multiple right rows sharing one (by, on) pair are ambiguous —
    pre-dedupe the right side if that can occur.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        by,
        F.col(on).alias(f"{prefix}{on}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    ).withColumn("_side", F.lit(0)).withColumn(on, F.col(f"{prefix}{on}"))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal timestamps so an
    # exact-timestamp right row is visible to the running last()
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in (on, *right_cols)
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_f_{c}").alias(f"{prefix}{c}") for c in (on, *right_cols)],
    )
