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

from .hashing import hash_double32, hash_int32

__all__ = ["rmat_edges", "make_symmetric", "dedup_edges"]


def rmat_edges(
    n: int,
    m: int,
    seed: int = 1,
    a: float = 0.5,
    b: float = 0.1,
    c: float = 0.1,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate m directed rMat edges over nn = 2^ceil(log2(n)) vertices.

    Returns (src, dst) int64 arrays.  Matches ``edgeRmat``
    (``rMatGraph.C:66-73``) exactly, including duplicates/self-loops.
    """
    nn = 1 << int(np.ceil(np.log2(max(n, 1))))
    ab = a + b
    abc = a + b + c
    if abc > 1.0:
        raise ValueError("rMat: a + b + c > 1")
    h = hash_int32(np.uint32(seed))
    i = np.arange(m, dtype=np.uint32)
    with np.errstate(over="ignore"):
        rand_start = hash_int32((np.uint32(2) * i) * h)
        rand_stride = hash_int32((np.uint32(2) * i + np.uint32(1)) * h)
    u = np.zeros(m, dtype=np.int64)
    v = np.zeros(m, dtype=np.int64)
    levels = int(np.log2(nn))
    for k in range(levels):
        with np.errstate(over="ignore"):
            r = hash_double32(rand_start + np.uint32(k) * rand_stride)
        half = np.int64(nn >> (k + 1))
        # quadrant choice per rMatGraph.C:49-54
        v += np.where((r >= a) & (r < ab), half, 0)
        u += np.where((r >= ab) & (r < abc), half, 0)
        both = r >= abc
        u += np.where(both, half, 0)
        v += np.where(both, half, 0)
    return u, v


def dedup_edges(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Remove exact duplicate (src, dst) pairs (``remDuplicates``,
    ``graphIO.h:245-267``: sort + keep-first).  Pairs are packed into
    one int when ids fit 32 bits (``np.unique(axis=0)`` on raw pairs
    is orders of magnitude slower at 10^8 rows)."""
    if len(src) and max(int(src.max()), int(dst.max())) < (1 << 32):
        packed = (src.astype(np.uint64) << np.uint64(32)) | dst.astype(np.uint64)
        uniq = np.unique(packed)
        return (uniq >> np.uint64(32)).astype(np.int64), (
            uniq & np.uint64(0xFFFFFFFF)
        ).astype(np.int64)
    pairs = np.stack([src, dst], axis=1)
    uniq = np.unique(pairs, axis=0)
    return uniq[:, 0], uniq[:, 1]


def make_symmetric(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetrize: drop self-loops, add reversals, dedup
    (``makeSymmetric``, ``graphIO.h:300-315``)."""
    keep = src != dst
    s, d = src[keep], dst[keep]
    s2 = np.concatenate([s, d])
    d2 = np.concatenate([d, s])
    return dedup_edges(s2, d2)
