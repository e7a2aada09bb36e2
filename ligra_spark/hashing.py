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

__all__ = [
    "hash_int32",
    "hash_int64",
    "hash_double32",
    "hash_int32_inplace",
    "with_hash_int64",
    "with_hash_int32",
    "unsigned_mod_col",
]

_U32 = np.uint32
_U64 = np.uint64


def hash_int32_inplace(a: np.ndarray, t: np.ndarray) -> np.ndarray:
    """32-bit avalanche hash computed IN PLACE over ``a`` (destroyed),
    using caller-provided temp ``t`` — semantics of ``utils.h:366-374``.

    The expression-per-line form allocates ~18 fresh arrays per call
    and first-touch page-fault cost dominates at 10^7+ elements on
    this class of VM (measured ~15x slower than this formulation on
    84M-edge fixture generation); hot loops preallocate both buffers
    once and call this per round."""
    with np.errstate(over="ignore"):
        np.left_shift(a, _U32(12), out=t)   # a = (a + C1) + (a << 12)
        a += _U32(0x7ED55D16)
        a += t
        np.right_shift(a, _U32(19), out=t)  # a = (a ^ C2) ^ (a >> 19)
        a ^= _U32(0xC761C23C)
        a ^= t
        np.left_shift(a, _U32(5), out=t)    # a = (a + C3) + (a << 5)
        a += _U32(0x165667B1)
        a += t
        np.left_shift(a, _U32(9), out=t)    # a = (a + C4) ^ (a << 9)
        a += _U32(0xD3A2646C)
        a ^= t
        np.left_shift(a, _U32(3), out=t)    # a = (a + C5) + (a << 3)
        a += _U32(0xFD7046C5)
        a += t
        np.right_shift(a, _U32(16), out=t)  # a = (a ^ C6) ^ (a >> 16)
        a ^= _U32(0xB55A4F09)
        a ^= t
    return a


def hash_int32(a: np.ndarray | int) -> np.ndarray:
    """32-bit avalanche hash (copying wrapper over
    :func:`hash_int32_inplace`)."""
    a = np.array(a, dtype=_U32, copy=True)
    return hash_int32_inplace(a, np.empty_like(a))


def hash_int64(a: np.ndarray | int) -> np.ndarray:
    """64-bit avalanche hash; semantics of ``utils.h:376-384``.
    Same in-place formulation as :func:`hash_int32` (see note there)."""
    a = np.array(a, dtype=_U64, copy=True)
    t = np.empty_like(a)
    with np.errstate(over="ignore"):
        np.left_shift(a, _U64(12), out=t)
        a += _U64(0x7ED55D166BEF7A1D)
        a += t
        np.right_shift(a, _U64(9), out=t)
        a ^= _U64(0xC761C23C510FA2DD)
        a ^= t
        np.left_shift(a, _U64(59), out=t)
        a += _U64(0x165667B183A9C0E1)
        a += t
        np.left_shift(a, _U64(49), out=t)
        a += _U64(0xD3A2646CAB3487E3)
        a ^= t
        np.left_shift(a, _U64(3), out=t)
        a += _U64(0xFD7046C5EF9AB54C)
        a += t
        np.right_shift(a, _U64(32), out=t)
        a ^= _U64(0xB55A4F090DD4A67B)
        a ^= t
    return a


def hash_double32(i: np.ndarray | int) -> np.ndarray:
    """``hashDouble`` of the generator (``utils/rMatGraph.C:29-30``):
    uniform double in [0, 1] = hash_int32(i) / UINT_MAX."""
    return hash_int32(i).astype(np.float64) / np.float64(0xFFFFFFFF)


def _s64(c: int) -> int:
    """Unsigned 64-bit constant -> its signed two's-complement twin
    (Spark longs are signed; +, *, <<, ^ wrap identically)."""
    return c - (1 << 64) if c >= (1 << 63) else c


def _wrap_add(a, b):
    """``(a + b) mod 2^64`` on signed longs WITHOUT tripping Spark 4's
    ANSI overflow check: split into 32-bit halves (shifts/AND/OR are
    unchecked; the half-adds stay below 2^33)."""
    from pyspark.sql import functions as F

    mask = F.lit(0xFFFFFFFF)
    lo = (a.bitwiseAND(mask)) + (b.bitwiseAND(mask))
    hi = (
        F.shiftrightunsigned(a, 32)
        + F.shiftrightunsigned(b, 32)
        + F.shiftrightunsigned(lo, 32)
    )
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(mask))


def with_hash_int64(df, src, out="h64"):
    """``hashInt(ulong)`` (``utils.h:376-384``) over a long column —
    bit-exact twin of :func:`hash_int64` on the signed two's-complement
    representation.  All JVM-side (whole-stage codegen); logical right
    shifts via ``shiftrightunsigned``, wrapping adds via
    :func:`_wrap_add` (ANSI-mode-safe).

    Adds column ``out`` to ``df`` via SIX chained projections — one
    per avalanche stage — rather than one nested Column: each stage
    references its input ~6x, so a single expression tree would be
    ~6^6 nodes and takes minutes to analyze/codegen; the staged form
    is linear (Catalyst keeps the projections apart because the
    repeated references are non-cheap)."""
    from pyspark.sql import functions as F

    tmp = f"__{out}_stage"
    stages = [
        lambda a: _wrap_add(
            _wrap_add(a, F.lit(_s64(0x7ED55D166BEF7A1D))), F.shiftleft(a, 12)
        ),
        lambda a: a.bitwiseXOR(F.lit(_s64(0xC761C23C510FA2DD))).bitwiseXOR(
            F.shiftrightunsigned(a, 9)
        ),
        lambda a: _wrap_add(
            _wrap_add(a, F.lit(_s64(0x165667B183A9C0E1))), F.shiftleft(a, 59)
        ),
        lambda a: _wrap_add(a, F.lit(_s64(0xD3A2646CAB3487E3))).bitwiseXOR(
            F.shiftleft(a, 49)
        ),
        lambda a: _wrap_add(
            _wrap_add(a, F.lit(_s64(0xFD7046C5EF9AB54C))), F.shiftleft(a, 3)
        ),
        lambda a: a.bitwiseXOR(F.lit(_s64(0xB55A4F090DD4A67B))).bitwiseXOR(
            F.shiftrightunsigned(a, 32)
        ),
    ]
    df = df.withColumn(tmp, src.cast("long"))
    for stage in stages:
        df = df.withColumn(tmp, stage(F.col(tmp)))
    return df.withColumn(out, F.col(tmp)).drop(tmp)


def with_hash_int32(df, src, out="h32"):
    """``hashInt(uint)`` (``utils.h:366-374``) over a column — bit-exact
    twin of :func:`hash_int32`, carried in a long kept in [0, 2^32)
    (so every op is ANSI-overflow-safe; adds stay below 2^34 and are
    wrapped with ``& 0xFFFFFFFF``).  Same staged-projection layout as
    :func:`with_hash_int64`."""
    from pyspark.sql import functions as F

    m = F.lit(0xFFFFFFFF)
    stages = [
        lambda a: (a + F.lit(0x7ED55D16) + F.shiftleft(a, 12)).bitwiseAND(m),
        lambda a: a.bitwiseXOR(F.lit(0xC761C23C)).bitwiseXOR(
            F.shiftrightunsigned(a, 19)
        ),
        lambda a: (a + F.lit(0x165667B1) + F.shiftleft(a, 5)).bitwiseAND(m),
        lambda a: (a + F.lit(0xD3A2646C))
        .bitwiseAND(m)
        .bitwiseXOR(F.shiftleft(a, 9).bitwiseAND(m)),
        lambda a: (a + F.lit(0xFD7046C5) + F.shiftleft(a, 3)).bitwiseAND(m),
        lambda a: a.bitwiseXOR(F.lit(0xB55A4F09)).bitwiseXOR(
            F.shiftrightunsigned(a, 16)
        ),
    ]
    tmp = f"__{out}_stage"
    df = df.withColumn(tmp, src.cast("long").bitwiseAND(m))
    for stage in stages:
        df = df.withColumn(tmp, stage(F.col(tmp)))
    return df.withColumn(out, F.col(tmp)).drop(tmp)


def unsigned_mod_col(col, m: int):
    """``u % m`` where ``col`` holds the signed representation of an
    unsigned 64-bit value u: u = col + 2^64 when col < 0, so
    u % m = (pmod(col, m) + 2^64 % m) % m on the negative branch."""
    from pyspark.sql import functions as F

    wrap = (1 << 64) % m
    pm = F.pmod(col, F.lit(m))
    return F.when(col < 0, F.pmod(pm + F.lit(wrap), F.lit(m))).otherwise(pm)
