"""Ligra+ compressed-graph (byte-code) import/export.

Format semantics transcribed from the reference (fresh implementation):
``/root/reference/ligra/byte.h:45-99`` (decode: first edge is a
SIGNED delta from the source — 6 data bits + sign bit 0x40 +
continuation bit 0x80 in the first byte, then 7-bit groups; remaining
edges are UNSIGNED deltas from the previous target in 7-bit groups
with 0x80 continuation), ``byte.h:151-214`` (encode twins),
``ligra/encoder.C:183-207`` (per-vertex adjacency is sorted with
self-loops and duplicate edges REMOVED before coding — mandatory:
a zero delta encodes to zero bytes, so duplicates cannot round-trip),
and the file layout of ``ligra/IO.h:479-561`` / ``encoder.C:238-289``:

    out block:  int64 n, m, totalSpace;
                uint32 offsets[n+1]  (byte offsets into edge stream);
                uint32 degrees[n];
                uint8  edges[totalSpace]
    in block (asymmetric files only, appended):
                int64 inTotalSpace; uint32 inOffsets[n+1];
                uint32 inDegrees[n]; uint8 inEdges[inTotalSpace]

uint32 offsets bound totalSpace at 4 GiB — the reference format's own
limit, inherited here.  Like the sibling text/binary importers these
are fixture-scale utilities (driver-side numpy + parallelize);
web-scale ingest uses parquet/Iceberg edge tables where the columnar
encodings subsume Ligra+'s role (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_compressed_graph",
    "read_compressed_graph",
    "read_compressed_graph_df",
]


def _compress_first_edge(out: bytearray, source: int, target: int) -> None:
    """byte.h:151-184: sign+6 bits (+0x80 continuation), then 7-bit
    groups, continuation on every byte with more groups after it."""
    pre = target - source
    to_compress = abs(pre)
    first = to_compress & 0x3F
    if pre < 0:
        first |= 0x40
    to_compress >>= 6
    if to_compress > 0:
        first |= 0x80
    out.append(first)
    cur = to_compress & 0x7F
    while cur > 0 or to_compress > 0:
        to_write = cur
        to_compress >>= 7
        cur = to_compress & 0x7F
        if to_compress > 0:
            to_write |= 0x80
        out.append(to_write)


def _compress_edge(out: bytearray, e: int) -> None:
    """byte.h:190-206: unsigned 7-bit groups.  e == 0 writes NOTHING
    (the reference's coding; callers must have deduplicated)."""
    cur = e & 0x7F
    while cur > 0 or e > 0:
        to_write = cur
        e >>= 7
        cur = e & 0x7F
        if e > 0:
            to_write |= 0x80
        out.append(to_write)


def _canonical_csr(n: int, src: np.ndarray, dst: np.ndarray):
    """encoder.C:183-207 semantics: per-vertex sorted adjacency with
    self-loops and duplicates removed.  Returns (offsets[n+1] element
    offsets, targets) int64."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if len(src) and (
        src.min() < 0 or dst.min() < 0 or src.max() >= n or dst.max() >= n
    ):
        # Mirror the reference's malformed-input abort (IO.h:184-202):
        # fail the contract loudly instead of corrupting the CSR arrays.
        raise ValueError(
            f"edge endpoint out of range: vertex ids must be in [0, {n})"
        )
    keep = src != dst
    src, dst = src[keep], dst[keep]
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if len(src):
        uniq = np.ones(len(src), dtype=bool)
        uniq[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst = src[uniq], dst[uniq]
    counts = np.bincount(src, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return offsets, dst


def _encode_block(n: int, offsets: np.ndarray, targets: np.ndarray):
    """→ (byte_offsets uint32[n+1], degrees uint32[n], edge bytes)."""
    byte_offsets = np.zeros(n + 1, dtype=np.int64)
    degrees = (offsets[1:] - offsets[:-1]).astype(np.int64)
    out = bytearray()
    for v in range(n):
        byte_offsets[v] = len(out)
        lo, hi = int(offsets[v]), int(offsets[v + 1])
        if hi > lo:
            prev = int(targets[lo])
            _compress_first_edge(out, v, prev)
            for j in range(lo + 1, hi):
                t = int(targets[j])
                _compress_edge(out, t - prev)
                prev = t
    byte_offsets[n] = len(out)
    if len(out) > 0xFFFFFFFF:
        raise ValueError(
            "compressed edge stream exceeds the format's uint32 offset range"
        )
    return byte_offsets.astype(np.uint32), degrees.astype(np.uint32), bytes(out)


def write_compressed_graph(
    path: str, n: int, src, dst, symmetric: bool = True
) -> tuple[int, int]:
    """Encode an edge list to the Ligra+ compressed format (sorting,
    deduping and dropping self-loops per encoder.C).  ``symmetric=False``
    appends the in-edge block (the transpose, same coding).  Returns
    (n, m_after_dedup)."""
    offsets, targets = _canonical_csr(n, src, dst)
    m = len(targets)
    bo, deg, edge_bytes = _encode_block(n, offsets, targets)
    with open(path, "wb") as f:
        np.array([n, m, len(edge_bytes)], dtype=np.int64).tofile(f)
        bo.tofile(f)
        deg.tofile(f)
        f.write(edge_bytes)
        if not symmetric:
            # transpose: same canonicalization applied to (dst, src)
            rs = np.repeat(np.arange(n, dtype=np.int64), offsets[1:] - offsets[:-1])
            t_off, t_tgt = _canonical_csr(n, targets, rs)
            tbo, tdeg, t_bytes = _encode_block(n, t_off, t_tgt)
            np.array([len(t_bytes)], dtype=np.int64).tofile(f)
            tbo.tofile(f)
            tdeg.tofile(f)
            f.write(t_bytes)
    return n, m


def _decode_block(buf: memoryview, byte_offsets, degrees, n: int):
    """byte.h decode loop → (src, dst) int64 arrays."""
    total = int(degrees.sum())
    src = np.empty(total, dtype=np.int64)
    dst = np.empty(total, dtype=np.int64)
    k = 0
    for v in range(n):
        d = int(degrees[v])
        if d == 0:
            continue
        pos = int(byte_offsets[v])
        # first edge: sign + 6 bits, then 7-bit continuation groups
        fb = buf[pos]
        pos += 1
        val = fb & 0x3F
        if fb & 0x80:
            shift = 6
            while True:
                b = buf[pos]
                pos += 1
                val |= (b & 0x7F) << shift
                if b & 0x80:
                    shift += 7
                else:
                    break
        prev = v - val if fb & 0x40 else v + val
        src[k] = v
        dst[k] = prev
        k += 1
        for _ in range(d - 1):
            val = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                val += (b & 0x7F) << shift
                if b & 0x80:
                    shift += 7
                else:
                    break
            prev += val
            src[k] = v
            dst[k] = prev
            k += 1
    return src, dst


def read_compressed_graph(path: str, symmetric: bool = True):
    """Ligra+ compressed file → (n, m, src, dst[, in_src, in_dst]).
    The in-edge arrays are returned only for asymmetric files (and are
    the transpose of the out-edges — a format-level invariant the
    tests pin)."""
    with open(path, "rb") as f:
        data = f.read()
    mv = memoryview(data)
    n, m, total_space = np.frombuffer(mv[:24], dtype=np.int64)
    n, m, total_space = int(n), int(m), int(total_space)
    pos = 24
    bo = np.frombuffer(mv[pos : pos + 4 * (n + 1)], dtype=np.uint32)
    pos += 4 * (n + 1)
    deg = np.frombuffer(mv[pos : pos + 4 * n], dtype=np.uint32)
    pos += 4 * n
    src, dst = _decode_block(mv[pos : pos + total_space], bo, deg, n)
    pos += total_space
    if symmetric or pos >= len(data):
        return n, m, src, dst
    in_total = int(np.frombuffer(mv[pos : pos + 8], dtype=np.int64)[0])
    pos += 8
    ibo = np.frombuffer(mv[pos : pos + 4 * (n + 1)], dtype=np.uint32)
    pos += 4 * (n + 1)
    ideg = np.frombuffer(mv[pos : pos + 4 * n], dtype=np.uint32)
    pos += 4 * n
    in_src, in_dst = _decode_block(mv[pos : pos + in_total], ibo, ideg, n)
    return n, m, src, dst, in_src, in_dst


def read_compressed_graph_df(
    spark: SparkSession, path: str, symmetric: bool = True
) -> tuple[DataFrame, int]:
    """Ligra+ compressed file → ((src, dst) DataFrame, n)."""
    import pandas as pd

    out = read_compressed_graph(path, symmetric=symmetric)
    n, _, src, dst = out[0], out[1], out[2], out[3]
    return (
        spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst})),
        n,
    )
