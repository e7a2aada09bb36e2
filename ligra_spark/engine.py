"""The superstep engine: Ligra's edgeMap / vertexMap / vertexFilter
(``/root/reference/ligra/ligra.h:233-459``) re-expressed as DataFrame
plans, plus the Spark-specific machinery the reference never needed —
lineage truncation and iterative-state persistence management.

Physical mapping (SURVEY.md §2.1, §4):

- ``edge_map``       — frontier ⋈ edges ON src → groupBy(dst).agg(monoid).
  The monoid aggregation IS Ligra's atomic-free histogram reduce
  (``ligra/histogram.h:68-232``): Spark's partial (map-side) + final
  hash aggregation is the distributed twin, and it also makes hub skew
  a non-issue for the reduce (partial aggs absorb hot dst keys before
  the shuffle).  Direction optimization (``ligra.h:237,261``): when the
  frontier is small we broadcast it (sparse push — no shuffle of the
  edge table, partition-local hash-join + partial agg); when it is
  large we rely on co-partitioned join reuse (dense — still no edge
  shuffle, because edges are pre-partitioned on src and state on id).
  Either way the ONLY per-superstep shuffle is the groupBy(dst).
- ``vertex_map``     — a column expression over the state DataFrame.
- ``vertex_filter``  — ``state.filter(pred)``  (``ligra.h:410-459``;
  Spark's filter is already pbbs::pack).
- ``IterState``      — persists each superstep's state DataFrame,
  unpersists the previous one, and truncates lineage every
  ``checkpoint_every`` supersteps via localCheckpoint (or a durable
  CheckpointManager — see ligra_spark.checkpoint).  The reference has
  no analog because shared-memory arrays have no lineage; in Spark an
  unbounded iterative plan is the #1 failure mode for 100-iteration
  PageRank.  Default cadence is 4: the localCheckpoint disk write is
  the dominant FIXED per-superstep cost on convergence tails (small
  frontiers, full-state write), and cutting it 4x halved CC wall time
  at 165M edges while plan depth stays bounded at 2^4 state refs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = [
    "edge_map",
    "edge_map_induced",
    "edge_map_filter",
    "pack_edges",
    "vertex_map",
    "vertex_filter",
    "IterState",
    "SPARSE_DENSE_FRACTION",
]

# Ligra switches sparse→dense when |frontier| + outdeg(frontier) > m/20
# (ligra/ligra.h:237).  Our analog: broadcast the frontier while its
# row count is below this fraction of m (broadcast cost ~ frontier
# size; dense co-partitioned join cost ~ state size).
SPARSE_DENSE_FRACTION = 1.0 / 20.0


def edge_map(
    graph,
    frontier: DataFrame,
    message: Column,
    aggregate,
    frontier_size: int | None = None,
    in_edges: bool = False,
    extra_frontier_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One gather-scatter pass: returns (id, agg) for every vertex that
    received at least one message.

    frontier  : DataFrame with an ``id`` column (+ payload columns used
                by ``message``) — sparse vertexSubset analog.
    message   : Column over the joined (frontier ⋈ edges) row; may
                reference frontier payload cols, ``src``, ``dst``,
                ``weight``.
    aggregate : callable(Column) -> Column, the monoid (F.sum, F.min,
                F.max, F.bit_or, ...) — replaces updateAtomic
                (writeAdd/writeMin/writeOr, ``ligra/utils.h:305-333``).
    frontier_size : pass the known count to drive the sparse/dense
                broadcast decision without an extra job (Ligra computes
                the same from cached degrees, ``ligra.h:248-261``).
    """
    edges = graph.edges_in if in_edges else graph.edges
    # re-alias edge columns to fresh exprIds: frontier state usually
    # derives from the same edge table (degrees), which would otherwise
    # trip Spark's ambiguous-self-join check
    salted = getattr(graph, "salt_buckets", 1) > 1 and "salt" in edges.columns
    ecols = [F.col("src").alias("src"), F.col("dst").alias("dst")] + (
        [F.col("weight").alias("weight")] if "weight" in edges.columns else []
    ) + ([F.col("salt").alias("salt")] if salted else [])
    e = edges.select(*ecols)
    f = frontier.select("id", *extra_frontier_cols)
    sparse = frontier_size is not None and frontier_size <= max(
        1024, int(SPARSE_DENSE_FRACTION * graph.m)
    )
    if sparse:
        # sparse push: broadcast the small frontier — no edge movement
        # (edge partitioning, salted or not, is irrelevant to a BHJ)
        f = F.broadcast(f)
        cond = f["id"] == e["src"]
    elif salted:
        # dense over a salted layout: replicate the frontier k ways so
        # the join stays co-partitioned with the (src, salt) buckets —
        # a hub's edges are spread over k tasks instead of one straggler
        f = f.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(graph.salt_buckets - 1))).alias(
                "fsalt"
            ),
        ).hint("shuffle_hash")
        cond = (f["id"] == e["src"]) & (f["fsalt"] == e["salt"])
    else:
        # dense: shuffled-hash join, frontier as build side.  Broadcast
        # would funnel the full vertex state through the driver (a
        # constant, serial cost that kills N→4N scaling, and an
        # impossibility at 10^12 vertices); SHJ shuffles only the
        # n-row state in parallel while the cached m-row edge table
        # never moves (it is already hash(src)-partitioned).
        f = f.hint("shuffle_hash")
        cond = f["id"] == e["src"]
    joined = f.join(e, cond)
    return (
        joined.select(e["dst"].alias("_dst"), message.alias("_msg"))
        .groupBy(F.col("_dst").alias("id"))
        .agg(aggregate(F.col("_msg")).alias("agg"))
    )


def edge_map_induced(
    graph, frontier: DataFrame, select_cols=None, in_edges: bool = False
) -> DataFrame:
    """One-hop neighborhood as a multiset — no dedup, no aggregation
    (``edgeMapInduced``, ``ligra/edgeMapReduce.h:9-38``).  Returns the
    joined (id, src, dst, ...) rows; callers aggregate or project."""
    edges = graph.edges_in if in_edges else graph.edges
    e = edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"))
    f = F.broadcast(frontier.select("id"))
    out = f.join(e, f["id"] == e["src"])
    return out.select(*(select_cols or ["src", "dst"]))


def edge_map_filter(graph, frontier: DataFrame, pred: Column) -> DataFrame:
    """Count surviving out-neighbors per frontier vertex under ``pred``
    (``edgeMapFilter``, ``ligra/ligra.h:336-368``): returns
    (id, degree).  Counts only — does not mutate the graph."""
    e = graph.edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"))
    f = F.broadcast(frontier.select("id"))
    return (
        f.join(e, f["id"] == e["src"])
        .filter(pred)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def pack_edges(graph, pred: Column):
    """Physically remove edges failing ``pred`` (``packEdges``,
    ``ligra/ligra.h:288-334``).  Where Ligra compacts adjacency arrays
    in place, we build a NEW LinkGraph over the filtered edge table —
    the immutable-dataset analog (the old graph's cache is dropped)."""
    from .graph import LinkGraph

    filtered = graph.edges.filter(pred).select(
        *[c for c in ("src", "dst", "weight") if c in graph.edges.columns]
    )
    return LinkGraph.from_edges(
        graph.spark,
        filtered,
        n=graph.n,
        num_partitions=graph.num_partitions,
        symmetric=False,
        salt_buckets=graph.salt_buckets,
    )


def vertex_map(state: DataFrame, **cols: Column) -> DataFrame:
    """Apply column updates to every state row (``ligra.h:374-406``)."""
    return state.withColumns(dict(cols))


def vertex_filter(state: DataFrame, pred: Column) -> DataFrame:
    """Keep rows where pred (``ligra.h:410-459``)."""
    return state.filter(pred)


@dataclass
class IterState:
    """Superstep state manager: persistence + lineage truncation.

    Usage:
        st = IterState(initial_df, num_partitions=g.num_partitions)
        while ...:
            new = <plan over st.df>
            st.advance(new)            # persists new, unpersists old
        result = st.df
    """

    df: DataFrame
    num_partitions: int
    checkpoint_every: int = 4
    storage_level: StorageLevel = field(
        default_factory=lambda: StorageLevel.MEMORY_AND_DISK
    )
    manager: object | None = None  # optional ligra_spark.checkpoint.CheckpointManager
    name: str = "state"
    superstep: int = 0

    def __post_init__(self):
        self.df = self.df.persist(self.storage_level)

    def advance(self, new_df: DataFrame, action=None, metrics: dict | None = None):
        """Persist the next superstep's state, run ``action(new_df)``
        (the materializing job — e.g. the convergence agg or frontier
        count), and only THEN drop the previous superstep's cache.

        Ordering is load-bearing: the new state's plan references the
        old cached state; unpersisting before materialization would
        recompute the entire superstep chain from the source — a
        quadratic blowup over 100 supersteps.

        Returns (new_df, action_result).
        """
        self.superstep += 1
        old = self.df
        if self.manager is not None:
            # durable parquet checkpoint: truncates lineage AND makes the
            # run resumable (north rule).  The manager returns the
            # re-read DataFrame so downstream plans root at the file.
            new_df = self.manager.save(
                new_df, self.name, self.superstep, metrics or {},
                num_partitions=self.num_partitions,
            ).persist(self.storage_level)
        elif self.superstep % self.checkpoint_every == 0:
            # eager localCheckpoint: materializes AND cuts the LOGICAL
            # plan.  Without the cut, each superstep's plan embeds the
            # previous one twice (frontier side + state side of the
            # join) — exponential plan growth that OOMs the analyzer
            # around superstep ~30 even though execution reads caches.
            # lazy: the checkpoint materializes inside the action's job
            # below — one job per superstep instead of two
            new_df = new_df.localCheckpoint(eager=False)
        else:
            new_df = new_df.persist(self.storage_level)
        # materialize the new state while the old cache is still live
        result = action(new_df) if action is not None else new_df.count()
        self.df = new_df
        old.unpersist()
        return new_df, result
