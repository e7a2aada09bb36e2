"""Import/export for the reference's graph file formats.

- ``read_adjacency_graph_df``  — PBBS ``(Weighted)AdjacencyGraph``
  text (``/root/reference/README.md:137-176``; parser semantics of
  ``ligra/IO.h:163-316``) → (src, dst[, weight]) DataFrame.
- ``read_binary_csr_df``       — the fork's ``-b`` binary CSR triple
  ``.config/.idx/.adj`` (``ligra/IO.h:318-471``): config = text
  "n m", idx = n int64 offsets, adj = m int64 targets.
- ``write_adjacency_graph``    — export an edge DataFrame back to the
  text format (round-trip for differential runs against reference
  binaries).

These are fixture-scale utilities: they parse on the driver (numpy)
and parallelize the resulting edge array.  Web-scale ingest never
routes through these formats — it uses the pages→edges pipeline
(``ligra_spark.ingest``) or direct parquet/Iceberg edge tables; a
distributed text-CSR parser would buy nothing since the format itself
is single-file."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..adjacency import csr_to_edges, read_adjacency_graph

__all__ = [
    "read_adjacency_graph_df",
    "read_binary_csr_df",
    "write_adjacency_graph",
    "write_adjacency_graph_distributed",
    "read_adjacency_hypergraph",
    "read_adjacency_hypergraph_df",
    "write_adjacency_hypergraph",
    "write_adjacency_hypergraph_distributed",
]


def _edges_df(spark: SparkSession, src, dst, weight=None) -> DataFrame:
    data = {"src": src.astype("int64"), "dst": dst.astype("int64")}
    if weight is not None:
        data["weight"] = weight.astype("int64")
    return spark.createDataFrame(pd.DataFrame(data))


def read_adjacency_graph_df(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Parse (Weighted)AdjacencyGraph text → (edges DF, n)."""
    n, offsets, targets, weights = read_adjacency_graph(path)
    src, dst = csr_to_edges(n, offsets, targets)
    return _edges_df(spark, src, dst, weights), n


def read_binary_csr_df(
    spark: SparkSession, config_path: str, idx_path: str, adj_path: str
) -> tuple[DataFrame, int]:
    """Parse the fork's binary CSR triple → (edges DF, n)."""
    with open(config_path) as f:
        parts = f.read().split()
        n = int(parts[0])
    offsets = np.fromfile(idx_path, dtype=np.int64)[:n]
    targets = np.fromfile(adj_path, dtype=np.int64)
    src, dst = csr_to_edges(n, offsets, targets)
    return _edges_df(spark, src, dst), n


def write_adjacency_graph(edges: DataFrame, n: int, path: str) -> None:
    """Export (src, dst[, weight]) → AdjacencyGraph text, rows sorted
    by (src, dst) as ``graphFromEdges`` lays them out
    (``utils/graphIO.h:355-369``).

    DRIVER-MEMORY BOUND: this funnels the edge table through
    ``toPandas()`` — fine for the fixture-scale single-file text
    format, but for graphs that don't fit on the driver use
    ``write_adjacency_graph_distributed`` (identical bytes, content
    stays executor-side)."""
    pdf = edges.toPandas().sort_values(
        ["src", "dst"], kind="mergesort"
    ).reset_index(drop=True)
    weighted = "weight" in pdf.columns
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    m = len(pdf)
    bounds = np.searchsorted(src, np.arange(n, dtype=np.int64))
    with open(path, "w") as f:
        f.write("WeightedAdjacencyGraph\n" if weighted else "AdjacencyGraph\n")
        f.write(f"{n}\n{m}\n")
        f.write("\n".join(map(str, bounds.tolist())) + "\n")
        f.write("\n".join(map(str, dst.tolist())) + "\n")
        if weighted:
            f.write("\n".join(map(str, pdf["weight"].tolist())) + "\n")


def write_adjacency_graph_distributed(
    edges: DataFrame, n: int, path: str
) -> None:
    """Executor-side twin of ``write_adjacency_graph``: builds the
    text sections (header, offsets, targets[, weights]) as line rows,
    funnels them through ONE sorted partition (the format is a single
    ordered file, so a 1-partition sort is the minimum possible
    parallelism — but the rows live in an executor task, not in
    driver memory), writes with the text datasource, then renames the
    single part file into place.  Byte-identical to the driver-side
    writer."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    weighted = "weight" in edges.columns
    edges = edges.persist()
    m = edges.count()  # also pins one materialization for the windows
    header = spark.createDataFrame(
        [
            (0, 0, "WeightedAdjacencyGraph" if weighted else "AdjacencyGraph"),
            (0, 1, str(n)),
            (0, 2, str(m)),
        ],
        "sec int, k long, line string",
    )
    # bounds[v] = #edges with src < v  (exclusive running degree sum)
    deg = edges.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("d"))
    w_cum = Window.orderBy("vid").rowsBetween(Window.unboundedPreceding, -1)
    bounds = (
        spark.range(n).select(F.col("id").alias("vid"))
        .join(deg, "vid", "left")
        .select("vid", F.coalesce("d", F.lit(0)).alias("d"))
        .select(
            F.lit(1).alias("sec"),
            F.col("vid").alias("k"),
            F.coalesce(F.sum("d").over(w_cum), F.lit(0))
            .cast("string")
            .alias("line"),
        )
    )
    e_ord = Window.orderBy("src", "dst")
    ranked = edges.select(
        "*", F.row_number().over(e_ord).cast("long").alias("k")
    )
    sections = [
        header,
        bounds,
        ranked.select(
            F.lit(2).alias("sec"), "k", F.col("dst").cast("string").alias("line")
        ),
    ]
    if weighted:
        sections.append(
            ranked.select(
                F.lit(3).alias("sec"),
                "k",
                F.col("weight").cast("string").alias("line"),
            )
        )
    out = sections[0]
    for s in sections[1:]:
        out = out.unionByName(s)
    tmp = path + ".spark-tmp"
    (
        out.repartition(1)
        .sortWithinPartitions("sec", "k")
        .select("line")
        .write.mode("overwrite")
        .text(tmp)
    )
    edges.unpersist()
    part = glob.glob(os.path.join(tmp, "part-*"))
    assert len(part) == 1, part
    shutil.move(part[0], path)
    shutil.rmtree(tmp)


def read_adjacency_hypergraph(
    path: str,
) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray | None, np.ndarray | None]:
    """Parse a ``(Weighted)AdjacencyHypergraph`` file
    (``ligra/hypergraphIO.h:36-115``): header then nv/mv/nh/mh, the
    vertex CSR half (offsets + hyperedge targets [+ weights]), then
    the hyperedge CSR half (offsets + vertex targets [+ weights]).

    Returns (nv, nh, v_offsets, v_targets, h_offsets, h_targets,
    v_weights or None, h_weights or None).
    """
    with open(path, "rb") as f:
        header = f.readline().strip().decode()
        weighted = header == "WeightedAdjacencyHypergraph"
        if not weighted and header != "AdjacencyHypergraph":
            raise ValueError(f"unknown header {header!r}")
        rest = np.loadtxt(f, dtype=np.int64)
    nv, mv, nh, mh = (int(x) for x in rest[:4])
    expect = 4 + nv + mv + nh + mh + (mv + mh if weighted else 0)
    if len(rest) != expect:
        raise ValueError(f"bad token count {len(rest)} (expected {expect})")
    p = 4
    v_off = rest[p : p + nv]; p += nv
    v_tgt = rest[p : p + mv]; p += mv
    v_w = None
    if weighted:
        v_w = rest[p : p + mv]; p += mv
    h_off = rest[p : p + nh]; p += nh
    h_tgt = rest[p : p + mh]; p += mh
    h_w = rest[p : p + mh] if weighted else None
    return nv, nh, v_off, v_tgt, h_off, h_tgt, v_w, h_w


def read_adjacency_hypergraph_df(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, int, int]:
    """Parse ``(Weighted)AdjacencyHypergraph`` → two incidence
    DataFrames ``(vertex, hedge[, weight])``: the vertex half (a
    vertex's incident hyperedges — the hyperedges' IN-pins) and the
    hyperedge half (a hyperedge's member vertices — its OUT-pins).
    For a symmetric hypergraph the halves encode the same relation;
    feed either to ``HyperGraph.from_incidence``.  For a directed one
    feed both to ``HyperGraph.from_directed_incidence``.

    Returns (v_half, h_half, nv, nh)."""
    nv, nh, v_off, v_tgt, h_off, h_tgt, v_w, h_w = read_adjacency_hypergraph(path)
    vsrc, vdst = csr_to_edges(nv, v_off, v_tgt)
    hsrc, hdst = csr_to_edges(nh, h_off, h_tgt)
    v_half = {"vertex": vsrc.astype("int64"), "hedge": vdst.astype("int64")}
    if v_w is not None:
        v_half["weight"] = v_w.astype("int64")
    h_half = {"vertex": hdst.astype("int64"), "hedge": hsrc.astype("int64")}
    if h_w is not None:
        h_half["weight"] = h_w.astype("int64")
    return (
        spark.createDataFrame(pd.DataFrame(v_half)),
        spark.createDataFrame(pd.DataFrame(h_half)),
        nv,
        nh,
    )


def write_adjacency_hypergraph_distributed(
    v_half: DataFrame, h_half: DataFrame, nv: int, nh: int, path: str
) -> None:
    """Executor-side twin of ``write_adjacency_hypergraph`` (same
    choreography as ``write_adjacency_graph_distributed``): all eight
    text sections are built as (section, rank, line) rows, funneled
    through ONE sorted partition — the format is a single ordered
    file, so one writer task is the floor — and renamed into place.
    Byte-identical to the driver-side writer, but no ``toPandas``:
    content stays executor-side end to end."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = v_half.sparkSession
    weighted = "weight" in v_half.columns
    v_half = v_half.persist()
    h_half = h_half.persist()
    mv, mh = v_half.count(), h_half.count()

    def bounds_section(df, key, count, sec):
        # bounds[k] = #rows with key < k (exclusive running degree sum)
        deg = df.groupBy(F.col(key).alias("vid")).agg(F.count("*").alias("d"))
        w_cum = Window.orderBy("vid").rowsBetween(Window.unboundedPreceding, -1)
        return (
            spark.range(count).select(F.col("id").alias("vid"))
            .join(deg, "vid", "left")
            .select("vid", F.coalesce("d", F.lit(0)).alias("d"))
            .select(
                F.lit(sec).alias("sec"),
                F.col("vid").alias("k"),
                F.coalesce(F.sum("d").over(w_cum), F.lit(0))
                .cast("string")
                .alias("line"),
            )
        )

    def value_sections(df, a, b, sec):
        w = Window.orderBy(a, b)
        ranked = df.select("*", F.row_number().over(w).cast("long").alias("k"))
        secs = [
            ranked.select(
                F.lit(sec).alias("sec"), "k", F.col(b).cast("string").alias("line")
            )
        ]
        if weighted:
            secs.append(
                ranked.select(
                    F.lit(sec + 1).alias("sec"),
                    "k",
                    F.col("weight").cast("string").alias("line"),
                )
            )
        return secs

    header = spark.createDataFrame(
        [
            (0, 0, "WeightedAdjacencyHypergraph" if weighted
             else "AdjacencyHypergraph"),
            (0, 1, str(nv)),
            (0, 2, str(mv)),
            (0, 3, str(nh)),
            (0, 4, str(mh)),
        ],
        "sec int, k long, line string",
    )
    sections = (
        [header, bounds_section(v_half, "vertex", nv, 1)]
        + value_sections(v_half, "vertex", "hedge", 2)
        + [bounds_section(h_half, "hedge", nh, 4)]
        + value_sections(h_half, "hedge", "vertex", 5)
    )
    out = sections[0]
    for s in sections[1:]:
        out = out.unionByName(s)
    tmp = path + ".spark-tmp"
    (
        out.repartition(1)
        .sortWithinPartitions("sec", "k")
        .select("line")
        .write.mode("overwrite")
        .text(tmp)
    )
    v_half.unpersist()
    h_half.unpersist()
    part = glob.glob(os.path.join(tmp, "part-*"))
    assert len(part) == 1, part
    shutil.move(part[0], path)
    shutil.rmtree(tmp)


def write_adjacency_hypergraph(
    v_half: DataFrame, h_half: DataFrame, nv: int, nh: int, path: str
) -> None:
    """Export two incidence halves ``(vertex, hedge[, weight])`` back
    to ``(Weighted)AdjacencyHypergraph`` text (round-trip against
    reference binaries; rows sorted as the reference's CSR lays them
    out).  Pass the same DataFrame twice for a symmetric hypergraph."""
    vp = v_half.toPandas().sort_values(
        ["vertex", "hedge"], kind="mergesort"
    ).reset_index(drop=True)
    hp = h_half.toPandas().sort_values(
        ["hedge", "vertex"], kind="mergesort"
    ).reset_index(drop=True)
    weighted = "weight" in vp.columns
    mv, mh = len(vp), len(hp)
    v_bounds = np.searchsorted(vp["vertex"].to_numpy(), np.arange(nv, dtype=np.int64))
    h_bounds = np.searchsorted(hp["hedge"].to_numpy(), np.arange(nh, dtype=np.int64))
    with open(path, "w") as f:
        f.write(
            "WeightedAdjacencyHypergraph\n" if weighted else "AdjacencyHypergraph\n"
        )
        f.write(f"{nv}\n{mv}\n{nh}\n{mh}\n")
        f.write("\n".join(map(str, v_bounds.tolist())) + "\n")
        f.write("\n".join(map(str, vp["hedge"].tolist())) + "\n")
        if weighted:
            f.write("\n".join(map(str, vp["weight"].tolist())) + "\n")
        f.write("\n".join(map(str, h_bounds.tolist())) + "\n")
        f.write("\n".join(map(str, hp["vertex"].tolist())) + "\n")
        if weighted:
            f.write("\n".join(map(str, hp["weight"].tolist())) + "\n")
