"""K-core decomposition by iterative peeling — semantics of
``/root/reference/apps/KCore.C:44-55`` on a symmetric graph.  For
k = 1..max_k: repeatedly peel alive vertices with degree < k (they get
core number k-1) and decrement their alive neighbors' degrees via
``groupBy(dst).count()`` (the ``edgeMapCount`` pattern,
``ligra/edgeMapReduce.h:76-81``).  The fork caps ``max_k = min(n, 10)``
(``KCore.C:87``) — pass max_k=10 to reproduce that quirk; None peels to
completion (true core numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import IterState, edge_map

__all__ = ["kcore"]


def kcore(
    graph,
    max_k: int | None = None,
    on_superstep=None,
) -> tuple[DataFrame, int]:
    """Returns ((id, core) for all n vertices, peel supersteps run)."""
    kmax = max_k if max_k is not None else graph.n
    init = graph.out_degrees.select(
        "id",
        F.col("outdeg").alias("deg"),
        F.lit(None).cast("long").alias("core"),
    )
    st = IterState(init, num_partitions=graph.num_partitions)
    steps = 0
    n_alive = graph.n
    for k in range(1, kmax + 1):
        while True:
            peel = st.df.filter(F.col("core").isNull() & (F.col("deg") < k))
            psize = peel.count()
            if psize == 0:
                break
            steps += 1
            msgs = edge_map(
                graph,
                peel.select("id"),
                message=F.lit(1).cast("long"),
                aggregate=F.sum,
                frontier_size=psize,
            )
            new = (
                st.df.join(msgs, "id", "left")
                .select(
                    "id",
                    (F.col("deg") - F.coalesce("agg", F.lit(0))).alias("deg"),
                    F.when(
                        F.col("core").isNull() & (F.col("deg") < k), F.lit(k - 1)
                    )
                    .otherwise(F.col("core"))
                    .alias("core"),
                )
            )
            st.advance(new)  # default action (count) materializes
            if on_superstep:
                on_superstep(steps, {"k": k, "peeled": psize})
        n_alive = st.df.filter(F.col("core").isNull()).count()
        if n_alive == 0:
            break
    final = st.df.select(
        "id", F.coalesce("core", F.lit(kmax)).cast("long").alias("core")
    )
    return final, steps
