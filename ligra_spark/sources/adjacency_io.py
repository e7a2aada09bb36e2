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

__all__ = ["read_adjacency_graph_df", "read_binary_csr_df", "write_adjacency_graph"]


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
    (``utils/graphIO.h:355-369``)."""
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
