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
    "hyper_adj_to_binary",
    "read_binary_hypergraph",
    "add_log_weights_hypergraph",
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


def hyper_adj_to_binary(in_path: str, out_prefix: str) -> None:
    """``hyperAdjToBinary.C``: ``(Weighted)AdjacencyHypergraph`` text →
    the binary quintuple ``.config`` (text "nv mv nh mh", no trailing
    newline, like the reference's ``config << nv << " " ...``),
    ``.vidx``/``.hidx`` (int64 offsets per half), ``.vadj``/``.hadj``
    (int64 targets; for the weighted format the targets are followed
    by the weights — the in-memory layout of
    ``graphIO.h:readWghHypergraphFromFile`` is edges then weights per
    half, and the tool dumps that region verbatim)."""
    from .adjacency_io import read_adjacency_hypergraph

    nv, nh, v_off, v_tgt, h_off, h_tgt, v_w, h_w = read_adjacency_hypergraph(
        in_path
    )
    with open(out_prefix + ".config", "w") as f:
        f.write(f"{nv} {len(v_tgt)} {nh} {len(h_tgt)}")
    np.asarray(v_off, dtype=np.int64).tofile(out_prefix + ".vidx")
    np.asarray(h_off, dtype=np.int64).tofile(out_prefix + ".hidx")
    vadj = v_tgt if v_w is None else np.concatenate([v_tgt, v_w])
    hadj = h_tgt if h_w is None else np.concatenate([h_tgt, h_w])
    np.asarray(vadj, dtype=np.int64).tofile(out_prefix + ".vadj")
    np.asarray(hadj, dtype=np.int64).tofile(out_prefix + ".hadj")


def read_binary_hypergraph(
    prefix: str,
) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray | None, np.ndarray | None]:
    """Inverse of ``hyper_adj_to_binary`` (round-trip check): returns
    the same tuple shape as ``read_adjacency_hypergraph``.  Weighted
    iff the adj halves are twice their config-declared lengths."""
    with open(prefix + ".config") as f:
        nv, mv, nh, mh = (int(x) for x in f.read().split())
    v_off = np.fromfile(prefix + ".vidx", dtype=np.int64)[:nv]
    h_off = np.fromfile(prefix + ".hidx", dtype=np.int64)[:nh]
    vadj = np.fromfile(prefix + ".vadj", dtype=np.int64)
    hadj = np.fromfile(prefix + ".hadj", dtype=np.int64)
    weighted = len(vadj) == 2 * mv
    v_w = vadj[mv:] if weighted else None
    h_w = hadj[mh:] if weighted else None
    return nv, nh, v_off, vadj[:mv], h_off, hadj[:mh], v_w, h_w


def _write_hypergraph_arrays(
    path: str, nv: int, nh: int,
    v_off: np.ndarray, v_tgt: np.ndarray,
    h_off: np.ndarray, h_tgt: np.ndarray,
    v_w: np.ndarray | None = None, h_w: np.ndarray | None = None,
) -> None:
    weighted = v_w is not None
    sections = [v_off, v_tgt] + ([v_w] if weighted else [])
    sections += [h_off, h_tgt] + ([h_w] if weighted else [])
    with open(path, "w") as f:
        f.write(
            "WeightedAdjacencyHypergraph\n" if weighted
            else "AdjacencyHypergraph\n"
        )
        f.write(f"{nv}\n{len(v_tgt)}\n{nh}\n{len(h_tgt)}\n")
        for arr in sections:
            f.write("\n".join(map(str, np.asarray(arr).tolist())) + "\n")


def add_log_weights_hypergraph(in_path: str, out_path: str) -> None:
    """``adjHypergraphAddWeights.C:43-80``: per-HYPEREDGE log-uniform
    weights with ``L = trunc(log2(max(nv, nh)))`` and ``Choices[i] =
    i+1`` (NOT the graph tool's duplicated-choices table):
    ``InW[i] = hashInt(i) %% L + 1`` and ``OutW[i] = hashInt(i+nh) %%
    L + 1``.  The vertex half's pin (v → h) takes ``InW[h]`` (the
    TARGET hyperedge's incoming weight); the hyperedge half's pin
    (h → v) takes ``OutW[h]`` (the SOURCE hyperedge's outgoing
    weight, identical across its pins)."""
    from .adjacency_io import read_adjacency_hypergraph

    nv, nh, v_off, v_tgt, h_off, h_tgt, _, _ = read_adjacency_hypergraph(
        in_path
    )
    L = max(1, int(np.log2(max(nv, nh))))
    ids = np.arange(nh, dtype=np.uint32)
    in_w = hash_int32(ids).astype(np.int64) % L + 1
    out_w = hash_int32(ids + np.uint32(nh)).astype(np.int64) % L + 1
    v_w = in_w[np.asarray(v_tgt, dtype=np.int64)]
    h_src, _ = csr_to_edges(nh, h_off, h_tgt)
    h_w = out_w[h_src]
    _write_hypergraph_arrays(
        out_path, nv, nh, v_off, v_tgt, h_off, h_tgt, v_w, h_w
    )


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
