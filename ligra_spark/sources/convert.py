"""Format converters — the reference's ``utils/`` converter tools
re-expressed: ``SNAPtoAdj.C`` (readSNAP + graphFromEdges +
writeGraphToFile), ``adjGraphAddWeights.C``, ``KONECTtoHyperAdj.C``'s
``readKONECT`` (``graphIO.h:826-856, 998-1050``), and
``randHypergraph.C``'s ``hyperedgeRandom``.

Like the reference tools these are single-file offline utilities
(driver-side numpy — the same shape as ``adjacency_io``); the
cluster-scale ingestion path for edge-list text is
``spark.read.text`` + a split projection feeding
``LinkGraph.from_edges``, and for hypergraphs
``hygra.from_incidence`` (both exercised by the apps).
"""

from __future__ import annotations

import numpy as np

from ..adjacency import csr_to_edges, read_adjacency_graph
from ..hashing import hash_int32

__all__ = [
    "read_snap_edges",
    "read_wgh_snap_edges",
    "snap_to_adjacency",
    "add_log_weights",
    "read_konect_bipartite",
    "read_community_hypergraph",
    "clique_expand",
    "write_mesh_csv",
    "write_binary_csr",
    "rand_hypergraph",
]


def _strip_leading_comments(path: str, marker: str) -> str:
    """Reference readers skip only the LEADING run of comment lines
    (``graphIO.h:829-836``); a marker later in the file is data."""
    with open(path) as f:
        text = f.read()
    k = 0
    while k < len(text) and text[k] == marker:
        nl = text.find("\n", k)
        k = len(text) if nl < 0 else nl + 1
    return text[k:]


def read_snap_edges(path: str) -> tuple[np.ndarray, np.ndarray, int]:
    """``readSNAP`` (``graphIO.h:826-856``): leading '#' comment lines,
    then whitespace-separated (u, v) pairs; n = max id + 1 over both
    columns; duplicates and self-loops preserved."""
    toks = _strip_leading_comments(path, "#").split()
    pairs = np.array(toks, dtype=np.int64).reshape(-1, 2)
    src, dst = pairs[:, 0], pairs[:, 1]
    n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    return src, dst, n


def _write_adjacency_arrays(
    path: str, n: int, src: np.ndarray, dst: np.ndarray,
    weights: np.ndarray | None = None,
) -> None:
    """AdjacencyGraph text from pre-ordered edge arrays (src ascending)."""
    bounds = np.searchsorted(src, np.arange(n, dtype=np.int64))
    with open(path, "w") as f:
        f.write("WeightedAdjacencyGraph\n" if weights is not None else "AdjacencyGraph\n")
        f.write(f"{n}\n{len(dst)}\n")
        f.write("\n".join(map(str, bounds.tolist())) + "\n")
        f.write("\n".join(map(str, dst.tolist())) + "\n")
        if weights is not None:
            f.write("\n".join(map(str, weights.tolist())) + "\n")


def snap_to_adjacency(in_path: str, out_path: str, sym: bool = False) -> int:
    """``SNAPtoAdj.C``: SNAP edge-list text → AdjacencyGraph text.
    Non-symmetric keeps duplicates/self-loops and preserves the input
    order within each source (``graphFromEdges`` is a stable sort on
    the source only, ``graphIO.h:343-369``); ``-s`` routes through
    ``makeSymmetric`` (dedup + self-loop drop).  Returns n."""
    src, dst, n = read_snap_edges(in_path)
    if sym:
        from ..rmat import make_symmetric

        src, dst = make_symmetric(src, dst)
    else:
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
    _write_adjacency_arrays(out_path, n, src, dst)
    return n


def add_log_weights(in_path: str, out_path: str) -> None:
    """``adjGraphAddWeights.C:37-56``: weight of the i-th CSR edge =
    ``Choices[hashInt(i) %% (2·maxEdgeLen)]`` with ``Choices[2j] =
    Choices[2j+1] = j+1`` and maxEdgeLen = trunc(log2(n)) — i.e.
    ``hashInt(i) %% (2·L) // 2 + 1``, a log-uniform weight in
    [1, log2(n)]."""
    n, offsets, targets, _ = read_adjacency_graph(in_path)
    m = len(targets)
    L = max(1, int(np.log2(n)))
    w = (hash_int32(np.arange(m, dtype=np.uint32)).astype(np.int64) % (2 * L)) // 2 + 1
    src, _ = csr_to_edges(n, offsets, targets)
    _write_adjacency_arrays(out_path, n, src, targets, w)


def read_konect_bipartite(path: str) -> tuple[np.ndarray, np.ndarray, int, int]:
    """``readKONECT`` (``graphIO.h:998-1050``): leading '%' comment
    lines, (vertex, hyperedge) pairs, then BOTH id spaces compressed
    to dense ranks of the ids actually used (ascending).  Returns
    (v, h, nv, nh) with duplicates preserved."""
    toks = _strip_leading_comments(path, "%").split()
    pairs = np.array(toks, dtype=np.int64).reshape(-1, 2)
    v_raw, h_raw = pairs[:, 0], pairs[:, 1]
    v_ids = np.unique(v_raw)
    h_ids = np.unique(h_raw)
    v = np.searchsorted(v_ids, v_raw)
    h = np.searchsorted(h_ids, h_raw)
    return v, h, len(v_ids), len(h_ids)


def read_wgh_snap_edges(
    path: str,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """``readWghSNAP`` (weighted SNAP, ``wghSNAPtoAdj.C``): leading
    '#' comments, (u, v, w) triples.  Returns (src, dst, w, n)."""
    toks = _strip_leading_comments(path, "#").split()
    tri = np.array(toks, dtype=np.int64).reshape(-1, 3)
    src, dst, w = tri[:, 0], tri[:, 1], tri[:, 2]
    n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    return src, dst, w, n


def read_community_hypergraph(
    path: str,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """``readHyperedges`` (``graphIO.h:894-941``, community format):
    leading '#' comments, ONE LINE PER HYPEREDGE listing its member
    vertices; vertex ids dense-rank compressed over used ids,
    hyperedge id = line index.  Returns (v, h, nv, nh)."""
    text = _strip_leading_comments(path, "#")
    vs, hs = [], []
    nh = 0
    for line in text.splitlines():
        members = line.split()
        if not members:
            continue
        vs.extend(int(t) for t in members)
        hs.extend([nh] * len(members))
        nh += 1
    v_raw = np.array(vs, dtype=np.int64)
    h = np.array(hs, dtype=np.int64)
    v_ids = np.unique(v_raw)
    return np.searchsorted(v_ids, v_raw), h, len(v_ids), nh


def clique_expand(
    v: np.ndarray, h: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """``cliquesFromHyperedges`` (``KONECTtoClique.C:30-80``): every
    hyperedge of degree l contributes all l·(l−1) ordered pin pairs;
    pairs repeat across hyperedges (the reference keeps them).
    Returns the (src, dst) edge multiset."""
    order = np.argsort(h, kind="stable")
    hs, vs = h[order], v[order]
    srcs, dsts = [], []
    bounds = np.flatnonzero(np.concatenate([[True], hs[1:] != hs[:-1], [True]]))
    for a, b in zip(bounds[:-1], bounds[1:]):
        pins = vs[a:b]
        l = len(pins)
        if l < 2:
            continue
        srcs.append(np.repeat(pins, l - 1))
        tile = np.tile(pins, l).reshape(l, l)
        dsts.append(tile[~np.eye(l, dtype=bool)])
    if not srcs:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy()
    return np.concatenate(srcs), np.concatenate(dsts)


def write_mesh_csv(h: np.ndarray, v: np.ndarray, path: str) -> None:
    """``KONECTtoMESH.C`` / ``communityToMESH.C``: the (hyperedge,
    vertex) incidence pairs as ``h,v`` CSV lines (input shape for
    external mesh partitioners)."""
    with open(path, "w") as f:
        f.write("".join(f"{int(a)},{int(b)}\n" for a, b in zip(h, v)))


def write_binary_csr(
    path_config: str,
    path_idx: str,
    path_adj: str,
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
) -> None:
    """``adjToBinary.C``: the binary CSR triple (config = n text, idx =
    int64 offsets, adj = int64 targets) — the inverse of
    ``read_binary_csr_df``.  Edges must be grouped by src ascending
    (stable within-source order is preserved)."""
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    offsets = np.searchsorted(src, np.arange(n, dtype=np.int64))
    with open(path_config, "w") as f:
        f.write(f"{n}\n")
    offsets.astype(np.int64).tofile(path_idx)
    dst.astype(np.int64).tofile(path_adj)


def rand_hypergraph(
    nv: int, nh: int, cardinality: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """``hyperedgeRandom`` (``randHypergraph.C:45-74``): hyperedge i's
    pins are ``hashInt(i·c + j) %% nv`` for j < c, sorted with
    duplicates removed per hyperedge.  Returns (h, v) incidence
    arrays, per-hyperedge pins ascending."""
    offsets = np.arange(nh * cardinality, dtype=np.uint32)
    pins = (hash_int32(offsets).astype(np.int64)) % nv
    h = np.repeat(np.arange(nh, dtype=np.int64), cardinality)
    # per-hyperedge sort + consecutive dedup == unique (h, pin) pairs
    order = np.lexsort((pins, h))
    hs, ps = h[order], pins[order]
    keep = np.concatenate([[True], (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1])])
    return hs[keep], ps[keep]
