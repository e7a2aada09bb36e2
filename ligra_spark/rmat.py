"""Deterministic rMat edge generator, bit-for-bit faithful to the
reference's fixture generator.

Reimplements (vectorized numpy, from-scratch) the semantics of
``/root/reference/utils/rMatGraph.C:33-73`` (struct ``rMat`` +
``edgeRmat``) and the edge-array → graph kernels of
``/root/reference/utils/graphIO.h``:

- ``rmat_edges(n, m, seed, a, b, c)``  — the raw directed edge multiset
  (duplicates and self-loops KEPT, as ``graphFromEdges(..., makeSym=
  false)`` keeps them, ``graphIO.h:343-353``).
- ``make_symmetric(src, dst)``          — drop self-loops, add reversed
  edges, remove exact duplicates (``makeSymmetric`` + ``remDuplicates``,
  ``graphIO.h:300-315, 245-267``).

The recursion in ``rMatRec`` (``rMatGraph.C:45-56``) descends to
nn == 1 first and then applies one quadrant decision per level on the
way back up: at depth k (block size nn >> k) the decision value is
``hashDouble(randStart + k * randStride)`` and the bit added is
``nn >> (k+1)``.  That is a pure function of (i, seed), so the whole
edge list vectorizes to log2(n) numpy passes.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_int32, hash_int32_inplace

__all__ = ["rmat_edges", "make_symmetric", "dedup_edges", "rand_local_edges", "grid_edges"]


def rmat_edges(
    n: int,
    m: int,
    seed: int = 1,
    a: float = 0.5,
    b: float = 0.1,
    c: float = 0.1,
    offset: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate m directed rMat edges over nn = 2^ceil(log2(n)) vertices.

    Returns (src, dst) int64 arrays.  Matches ``edgeRmat``
    (``rMatGraph.C:66-73``) exactly, including duplicates/self-loops.

    ``offset`` selects edge indices [offset, offset+m) of the SAME
    stream: each rMat edge is an independent function of its index, so
    chunked calls concatenate to the single-call result bit-exactly —
    this is how the billion-edge fixture is generated without a 16 GB
    single allocation.  offset+m must stay below 2^31 (the reference's
    index is a signed int feeding 32-bit hash state, utils.h:366).
    """
    if offset + m > (1 << 31):
        raise ValueError("rmat_edges: offset + m exceeds the 32-bit index space")
    nn = 1 << int(np.ceil(np.log2(max(n, 1))))
    ab = a + b
    abc = a + b + c
    if abc > 1.0:
        raise ValueError("rMat: a + b + c > 1")
    h = hash_int32(np.uint32(seed))
    i = np.arange(offset, offset + m, dtype=np.uint32)
    with np.errstate(over="ignore"):
        rand_start = (np.uint32(2) * i) * h
        rand_start = hash_int32_inplace(rand_start, i.copy())
        rand_stride = (np.uint32(2) * i + np.uint32(1)) * h
        rand_stride = hash_int32_inplace(rand_stride, i)
    del i
    u = np.zeros(m, dtype=np.int64)
    v = np.zeros(m, dtype=np.int64)
    # buffers reused across levels: fresh allocations per level would be
    # first-touch-page-fault bound at 10^8 edges (see hashing module)
    hbuf = np.empty(m, dtype=np.uint32)
    tbuf = np.empty(m, dtype=np.uint32)
    r = np.empty(m, dtype=np.float64)
    m1 = np.empty(m, dtype=bool)
    m2 = np.empty(m, dtype=bool)
    levels = int(np.log2(nn))
    for k in range(levels):
        with np.errstate(over="ignore"):
            np.multiply(rand_stride, np.uint32(k), out=hbuf)
            hbuf += rand_start
            hash_int32_inplace(hbuf, tbuf)
        # hashDouble (rMatGraph.C:29-30): hash / UINT_MAX in [0, 1]
        np.divide(hbuf, np.float64(0xFFFFFFFF), out=r)
        half = np.int64(nn >> (k + 1))
        # quadrant choice per rMatGraph.C:49-54
        np.greater_equal(r, a, out=m1)
        np.less(r, ab, out=m2)
        m1 &= m2
        np.add(v, half, out=v, where=m1)
        np.greater_equal(r, ab, out=m1)
        np.less(r, abc, out=m2)
        m1 &= m2
        np.add(u, half, out=u, where=m1)
        np.greater_equal(r, abc, out=m1)
        np.add(u, half, out=u, where=m1)
        np.add(v, half, out=v, where=m1)
    return u, v


def _unique_sorted_inplace(packed: np.ndarray) -> np.ndarray:
    """In-place sort + flag-unique (the sort-and-keep-first of
    ``remDuplicates``, ``graphIO.h:245-267``).  ``np.unique`` copies
    before sorting — one avoidable 10^9-byte first-touch at 10^8
    edges."""
    if len(packed) == 0:
        return packed
    packed.sort()
    mask = np.empty(len(packed), dtype=bool)
    mask[0] = True
    np.not_equal(packed[1:], packed[:-1], out=mask[1:])
    return packed[mask]


def _unpack(uniq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (uniq >> np.uint64(32)).astype(np.int64), (
        uniq & np.uint64(0xFFFFFFFF)
    ).astype(np.int64)


def dedup_edges(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Remove exact duplicate (src, dst) pairs (``remDuplicates``,
    ``graphIO.h:245-267``: sort + keep-first).  Pairs are packed into
    one int when ids fit 32 bits (``np.unique(axis=0)`` on raw pairs
    is orders of magnitude slower at 10^8 rows)."""
    if len(src) and max(int(src.max()), int(dst.max())) < (1 << 32):
        packed = np.empty(len(src), dtype=np.uint64)
        np.left_shift(src.astype(np.int64, copy=False).view(np.uint64),
                      np.uint64(32), out=packed)
        packed |= dst.astype(np.int64, copy=False).view(np.uint64)
        return _unpack(_unique_sorted_inplace(packed))
    pairs = np.stack([src, dst], axis=1)
    uniq = np.unique(pairs, axis=0)
    return uniq[:, 0], uniq[:, 1]


def make_symmetric(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetrize: drop self-loops, add reversals, dedup
    (``makeSymmetric``, ``graphIO.h:300-315``).  Forward and reversed
    pairs are packed straight into the two halves of one buffer —
    no intermediate concatenations."""
    keep = src != dst
    if len(src) == 0 or max(int(src.max()), int(dst.max())) >= (1 << 32):
        # ids don't fit the 32-bit packing halves (or empty input):
        # take the general path through dedup_edges, which handles both
        return dedup_edges(
            np.concatenate([src[keep], dst[keep]]),
            np.concatenate([dst[keep], src[keep]]),
        )
    s = src[keep].astype(np.int64, copy=False).view(np.uint64)
    d = dst[keep].astype(np.int64, copy=False).view(np.uint64)
    k = len(s)
    packed = np.empty(2 * k, dtype=np.uint64)
    fwd, rev = packed[:k], packed[k:]
    np.left_shift(s, np.uint64(32), out=fwd)
    fwd |= d
    np.left_shift(d, np.uint64(32), out=rev)
    rev |= s
    return _unpack(_unique_sorted_inplace(packed))


def rand_local_edges(
    n: int, m: int, dim: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """``randLocalGraph`` edge generator — semantics of
    ``/root/reference/utils/randLocalGraph.C:36-59``
    (``edgeRandomWithDimension``): edge k has source i = trunc(k /
    (m/n)); for dim == 0 the target is a rejection-sampled uniform
    ``hashInt`` chain (reroll while j == i); for dim > 0 the target is
    a local offset ``(i + hash % 2^pow) % n`` where pow starts at
    dim+2 and grows by dim for every hash draw with
    ``hash % 1000003 < 500001`` — giving P(edge (i,j)) roughly
    ~ (1/|i-j|)^((d+1)/d).  The per-edge hash chain h = hashInt(h)
    starting at h = k is replayed exactly (pow persists across
    rejection retries, as in the C loop); shifts use x86 semantics
    (count & 63), reachable only with probability ~2^-31 per edge.

    Returns the raw (src, dst) multiset — pass through
    ``make_symmetric`` for the ``-s`` form, as ``graphFromEdges``
    does."""
    degree = m / n
    src = (np.arange(m, dtype=np.float64) / degree).astype(np.int64)
    h = np.arange(m, dtype=np.uint32)
    j = np.zeros(m, dtype=np.int64)
    unresolved = np.ones(m, dtype=bool)
    if dim == 0:
        while unresolved.any():
            idx = np.nonzero(unresolved)[0]
            h[idx] = hash_int32(h[idx])
            j[idx] = h[idx].astype(np.int64) % n
            unresolved[idx] = j[idx] == src[idx]
    else:
        pow_ = np.full(m, dim + 2, dtype=np.int64)
        while unresolved.any():
            idx = np.nonzero(unresolved)[0]
            # inner loop: grow pow while hash %% 1000003 < 500001
            growing = np.ones(len(idx), dtype=bool)
            while growing.any():
                gi = idx[growing]
                h[gi] = hash_int32(h[gi])
                hit = (h[gi].astype(np.int64) % 1000003) < 500001
                pow_[gi[hit]] += dim
                growing[np.nonzero(growing)[0]] = hit
            h[idx] = hash_int32(h[idx])
            span = np.int64(1) << (pow_[idx] & 63)
            j[idx] = (src[idx] + h[idx].astype(np.int64) % span) % n
            unresolved[idx] = j[idx] == src[idx]
    return src, j


def grid_edges(n: int, dims: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """``gridGraph`` edge generator — semantics of
    ``/root/reference/utils/gridGraph.C:35-71`` (``edge2DMesh`` /
    ``edge3DMesh``): a dn^dims torus (dn = round(n^(1/dims))) with one
    wrap-around edge per dimension per cell, in the reference's exact
    edge order (cell-major, dimension-minor)."""
    if dims == 2:
        dn = int(round(n ** 0.5))
        i, jj = np.meshgrid(
            np.arange(dn, dtype=np.int64), np.arange(dn, dtype=np.int64),
            indexing="ij",
        )
        loc = (i * dn + jj).ravel()
        right = (((i + 1) % dn) * dn + jj).ravel()
        down = (i * dn + (jj + 1) % dn).ravel()
        src = np.repeat(loc, 2)
        dst = np.empty(2 * dn * dn, dtype=np.int64)
        dst[0::2] = right
        dst[1::2] = down
        return src, dst
    if dims == 3:
        dn = int(round(n ** (1.0 / 3.0)))
        i, jj, k = np.meshgrid(
            np.arange(dn, dtype=np.int64), np.arange(dn, dtype=np.int64),
            np.arange(dn, dtype=np.int64), indexing="ij",
        )
        loc = ((i * dn + jj) * dn + k).ravel()
        e1 = ((((i + 1) % dn) * dn + jj) * dn + k).ravel()
        e2 = ((i * dn + (jj + 1) % dn) * dn + k).ravel()
        e3 = ((i * dn + jj) * dn + (k + 1) % dn).ravel()
        src = np.repeat(loc, 3)
        dst = np.empty(3 * dn * dn * dn, dtype=np.int64)
        dst[0::3] = e1
        dst[1::3] = e2
        dst[2::3] = e3
        return src, dst
    raise ValueError("gridGraph supports dims 2 or 3")
