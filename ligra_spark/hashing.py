"""Deterministic integer avalanche hashes matching the reference semantics.

Reimplements (from public PBBS/Ligra sources, by spec not by copy) the
32/64-bit avalanche hash used by the reference's random-graph generator
and sampling code (``/root/reference/ligra/utils.h:366-386``).  The
fixture generator (`ligra_spark.rmat`) must be bit-for-bit faithful to
the reference so that the shipped sample graph
``inputs/rMatGraph_J_5_100`` is reproduced exactly.

All functions are numpy-vectorized and operate on uint32/uint64 arrays
with wraparound arithmetic (numpy's native overflow behavior matches
C unsigned arithmetic).
"""

from __future__ import annotations

import numpy as np

__all__ = ["hash_int32", "hash_int64", "hash_double32"]

_U32 = np.uint32
_U64 = np.uint64


def hash_int32(a: np.ndarray | int) -> np.ndarray:
    """32-bit avalanche hash; semantics of ``utils.h:366-374``."""
    a = np.asarray(a, dtype=_U32)
    with np.errstate(over="ignore"):
        a = (a + _U32(0x7ED55D16)) + (a << _U32(12))
        a = (a ^ _U32(0xC761C23C)) ^ (a >> _U32(19))
        a = (a + _U32(0x165667B1)) + (a << _U32(5))
        a = (a + _U32(0xD3A2646C)) ^ (a << _U32(9))
        a = (a + _U32(0xFD7046C5)) + (a << _U32(3))
        a = (a ^ _U32(0xB55A4F09)) ^ (a >> _U32(16))
    return a


def hash_int64(a: np.ndarray | int) -> np.ndarray:
    """64-bit avalanche hash; semantics of ``utils.h:376-384``."""
    a = np.asarray(a, dtype=_U64)
    with np.errstate(over="ignore"):
        a = (a + _U64(0x7ED55D166BEF7A1D)) + (a << _U64(12))
        a = (a ^ _U64(0xC761C23C510FA2DD)) ^ (a >> _U64(9))
        a = (a + _U64(0x165667B183A9C0E1)) + (a << _U64(59))
        a = (a + _U64(0xD3A2646CAB3487E3)) ^ (a << _U64(49))
        a = (a + _U64(0xFD7046C5EF9AB54C)) + (a << _U64(3))
        a = (a ^ _U64(0xB55A4F090DD4A67B)) ^ (a >> _U64(32))
    return a


def hash_double32(i: np.ndarray | int) -> np.ndarray:
    """``hashDouble`` of the generator (``utils/rMatGraph.C:29-30``):
    uniform double in [0, 1] = hash_int32(i) / UINT_MAX."""
    return hash_int32(i).astype(np.float64) / np.float64(0xFFFFFFFF)
