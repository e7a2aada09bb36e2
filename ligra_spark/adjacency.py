"""Reader/writer for the PBBS/Ligra ``AdjacencyGraph`` text format.

Format spec (public, ``/root/reference/README.md:137-176``):

    AdjacencyGraph
    <n>
    <m>
    <o0> ... <o(n-1)>      # n offsets into the edge array
    <e0> ... <e(m-1)>      # m target vertex ids

``WeightedAdjacencyGraph`` appends m integer weights.  Used only to
import the shipped sample fixtures (e.g. ``inputs/rMatGraph_J_5_100``)
for differential tests; our engine's native storage is parquet.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_adjacency_graph", "csr_to_edges", "edges_to_csr"]


def read_adjacency_graph(path: str) -> tuple[int, np.ndarray, np.ndarray, np.ndarray | None]:
    """Parse an (Weighted)AdjacencyGraph file.

    Returns (n, offsets[n], targets[m], weights[m] or None).
    """
    with open(path, "rb") as f:
        header = f.readline().strip().decode()
        weighted = header == "WeightedAdjacencyGraph"
        if not weighted and header != "AdjacencyGraph":
            raise ValueError(f"unknown header {header!r}")
        rest = np.loadtxt(f, dtype=np.int64)
    n, m = int(rest[0]), int(rest[1])
    offsets = rest[2 : 2 + n]
    targets = rest[2 + n : 2 + n + m]
    weights = rest[2 + n + m : 2 + n + 2 * m] if weighted else None
    return n, offsets, targets, weights


def csr_to_edges(n: int, offsets: np.ndarray, targets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Expand CSR (offsets, targets) into (src, dst) edge arrays."""
    m = len(targets)
    bounds = np.append(offsets, m)
    degrees = np.diff(bounds)
    src = np.repeat(np.arange(n, dtype=np.int64), degrees)
    return src, targets.astype(np.int64)


def edges_to_csr(n: int, src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Build CSR from edges, sorting by (src, dst) — the layout
    ``graphFromEdges`` produces after its integer sort
    (``graphIO.h:355-369``; the generator's writer emits sorted rows)."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n, dtype=np.int64))
    return offsets.astype(np.int64), d.astype(np.int64)
