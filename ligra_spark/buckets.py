"""Bucketing layer — the Julienne priority-bucket structure
(``/root/reference/ligra/bucket.h:31-365``) re-expressed for Spark.

Where Julienne keeps a physical array-of-buckets with a massively
parallel ``update_buckets`` (histogram + scan + scatter,
``bucket.h:123-211``), here the bucket id is simply a COLUMN on the
per-vertex state DataFrame:

- ``next_bucket()`` (``bucket.h:94-104``) = a min/max aggregation over
  the cached state — one tiny job on the driver sync path, exactly
  where Julienne's sequential bucket scan sits;
- ``update_buckets`` = the state join that rewrites the column during
  the superstep — the histogram/scatter machinery is subsumed by the
  shuffle hash-aggregation (same replacement as ``histogram.h``);
- bucket membership = ``bucket_col == k`` filter (a pack,
  ``sequence.h:172``), NULL = not in any bucket (finalized/unreached —
  Julienne's ``null_bkt``).

At scale this keeps the bucket structure fully distributed (no
driver-side id lists); the only driver state is the current bucket id.
``make_buckets``'s 128-way open-bucket batching (``bucket.h:251-307``)
is an RMA-locality optimization with no Spark analog — a column filter
reaches any bucket id at the same cost.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Buckets"]


@dataclass
class Buckets:
    """Driver-side view over a state DataFrame's bucket column."""

    bucket_col: str = "bucket"
    increasing: bool = True  # bucket_order (bucket.h:362): increasing / decreasing

    def next_bucket(self, state: DataFrame) -> int | None:
        """Smallest (or largest) non-NULL bucket id, None when all
        buckets are empty (``null_bkt`` → loop termination)."""
        agg = F.min if self.increasing else F.max
        row = state.agg(agg(self.bucket_col).alias("k")).first()
        return None if row["k"] is None else int(row["k"])

    def active(self, state: DataFrame, k: int) -> DataFrame:
        """Members of bucket k — the identifiers Julienne hands back
        from ``next_bucket`` (``bucket.h:94-104``)."""
        return state.filter(F.col(self.bucket_col) == k)
