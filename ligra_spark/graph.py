"""LinkGraph — the distributed twin of Ligra's ``graph<vertex>``
(``/root/reference/ligra/graph.h:98-128``), re-expressed as partitioned
DataFrames instead of shared-memory CSR arrays.

Layout contract (what every app relies on):

- ``edges``      : DataFrame (src: long, dst: long [, weight: long]),
                   hash-repartitioned on ``src`` into ``num_partitions``
                   and persisted.  This is the out-adjacency — the
                   analog of ``vertex.h:188`` neighbor arrays.  A join
                   ``state.id == edges.src`` with state hash-partitioned
                   on ``id`` into the same partition count is
                   exchange-free on the edges side (partitioning reuse).
- ``edges_in``   : lazily-built (src,dst)-swapped twin partitioned on
                   the *new* src — the analog of ``flipEdges``
                   (``vertex.h:323``) / ``graph.transpose``
                   (``graph.h:119-127``).  Only built when an app needs
                   the pull direction on an asymmetric graph (BC).
- ``vertices``   : DataFrame (id: long) spanning 0..n-1 (``spark.range``)
                   — Ligra's implicit vertex-slot universe, including
                   isolated vertices (they matter: PageRank's 1/n terms
                   count them, ``apps/PageRank.C:73``).
- ``out_degrees``: DataFrame (id, outdeg) over ALL n ids (outdeg 0 for
                   isolated), partitioned on id, persisted.  Degree
                   lookups are per-superstep hot state in Ligra
                   (``ligra/ligra.h:248-259``); here they are a static
                   broadcast-or-co-partitioned dimension.

At 100 TB the same contract holds: edges live in an Iceberg/parquet
table bucketed by ``src`` (bucket count = shuffle partitions) so the
repartition below becomes a metadata-only read, and ``out_degrees`` is
a once-computed side table.  That path is implemented:
``sources.bucketed.write_bucketed_edges`` /
``read_bucketed_graph`` load a LinkGraph straight off a bucketed scan
with zero load-time shuffle (plan-pinned in ``tests/test_bucketed.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["LinkGraph", "symmetrize", "dedup"]


def dedup(edges: DataFrame) -> DataFrame:
    """Exact duplicate-pair removal — ``remDuplicates`` semantics
    (``/root/reference/utils/graphIO.h:245-267``)."""
    return edges.dropDuplicates(["src", "dst"])


def symmetrize(edges: DataFrame) -> DataFrame:
    """Drop self-loops, add reversals, dedup — ``makeSymmetric``
    semantics (``/root/reference/utils/graphIO.h:300-315``).  One
    shuffle (the dropDuplicates); the union is shuffle-free."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return dedup(e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))))


@dataclass
class LinkGraph:
    """A loaded, partition-pinned link graph plus cached metadata."""

    spark: SparkSession
    edges: DataFrame               # (src, dst[, weight][, salt]) partitioned by src (+salt)
    n: int                         # vertex-slot count (ids 0..n-1)
    m: int                         # edge count
    num_partitions: int
    symmetric: bool = False
    salt_buckets: int = 1          # >1 = hub-skew salted layout (see from_edges)
    _edges_in: DataFrame | None = field(default=None, repr=False)
    _out_degrees: DataFrame | None = field(default=None, repr=False)
    _vertices: DataFrame | None = field(default=None, repr=False)

    # ------------------------------------------------------------------
    @classmethod
    def from_edges(
        cls,
        spark: SparkSession,
        edges: DataFrame,
        n: int | None = None,
        num_partitions: int | None = None,
        symmetric: bool = False,
        make_symmetric: bool = False,
        salt_buckets: int = 1,
    ) -> "LinkGraph":
        """Pin an edge DataFrame into the engine layout.

        ``n`` defaults to max(src,dst)+1 (Ligra graphs carry explicit n;
        pass it when the table can have isolated trailing vertices).

        ``salt_buckets > 1`` enables the hub-salted layout for graphs
        with ultra-high-out-degree vertices (the degree≥1000 hub
        special-casing of ``ligra/vertex.h:15`` reborn as a partitioning
        strategy): edges get ``salt = pmod(xxhash64(dst), k)`` and are
        hash-partitioned on (src, salt), so one hub's out-edges spread
        over k partitions instead of landing in a single straggler
        task.  ``edge_map``'s dense path replicates the frontier k
        ways to keep the join co-partitioned; the extra shuffled rows
        are k·|frontier| — cheap next to a multi-GB hot partition.
        """
        if make_symmetric:
            edges = symmetrize(edges)
            symmetric = True
        p = num_partitions or spark.sparkContext.defaultParallelism
        cols = ["src", "dst"] + (["weight"] if "weight" in edges.columns else [])
        e = edges.select(
            *[F.col(c).cast("long") if c != "weight" else F.col(c) for c in cols]
        )
        if salt_buckets > 1:
            e = e.withColumn(
                "salt", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)).cast("int")
            ).repartition(p, "src", "salt")
        else:
            e = e.repartition(p, "src")
        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        if n is None:
            row = e.agg(
                F.greatest(F.max("src"), F.max("dst")).alias("mx"),
                F.count(F.lit(1)).alias("m"),
            ).first()
            n, m = int(row["mx"]) + 1, int(row["m"])
        else:
            m = e.count()
        return cls(
            spark, e, n=n, m=m, num_partitions=p, symmetric=symmetric,
            salt_buckets=salt_buckets,
        )

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str, **kw) -> "LinkGraph":
        return cls.from_edges(spark, spark.read.parquet(path), **kw)

    # ------------------------------------------------------------------
    @property
    def vertices(self) -> DataFrame:
        """(id) over 0..n-1, co-partitioned with per-vertex state."""
        if self._vertices is None:
            self._vertices = (
                self.spark.range(self.n)
                .select(F.col("id").cast("long"))
                .repartition(self.num_partitions, "id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        return self._vertices

    @property
    def out_degrees(self) -> DataFrame:
        """(id, outdeg) for ALL n ids; 0 for isolated vertices."""
        if self._out_degrees is None:
            deg = self.edges.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("outdeg")
            )
            self._out_degrees = (
                self.vertices.join(deg, "id", "left")
                .select("id", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
                .repartition(self.num_partitions, "id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        return self._out_degrees

    @property
    def edges_in(self) -> DataFrame:
        """In-adjacency: (src,dst) swapped, partitioned on the new src.
        ``transpose()`` analog (``graph.h:119-127``).  For symmetric
        graphs the out-table already IS the in-table."""
        if self.symmetric:
            return self.edges
        if self._edges_in is None:
            swap = [F.col("dst").alias("src"), F.col("src").alias("dst")] + (
                [F.col("weight")] if "weight" in self.edges.columns else []
            )
            e = self.edges.select(*swap)
            if self.salt_buckets > 1:
                e = e.withColumn(
                    "salt",
                    F.pmod(F.xxhash64("dst"), F.lit(self.salt_buckets)).cast("int"),
                ).repartition(self.num_partitions, "src", "salt")
            else:
                e = e.repartition(self.num_partitions, "src")
            self._edges_in = e.persist(StorageLevel.MEMORY_AND_DISK)
        return self._edges_in

    def transpose(self) -> "LinkGraph":
        g = LinkGraph(
            self.spark,
            self.edges_in,
            n=self.n,
            m=self.m,
            num_partitions=self.num_partitions,
            symmetric=self.symmetric,
        )
        g._edges_in = self.edges
        g._vertices = self._vertices
        return g

    def materialize(self) -> "LinkGraph":
        """Force edge + degree caches (the 'load graph' step Ligra does
        in IO.h before timing starts)."""
        self.edges.count()
        self.out_degrees.count()
        return self

    def unpersist(self) -> None:
        for df in (self.edges, self._edges_in, self._out_degrees, self._vertices):
            if df is not None:
                df.unpersist()
