"""Deterministic corpus sampling — the downsampling step of a
training-data pipeline (per-language/source quotas, ablation splits),
built on the engine's bit-exact cross-engine hash
(``hashing.with_hash_int32``, the reference's ``utils.h:366-374``
avalanche) instead of ``DataFrame.sample``: Bernoulli via RNG is
partitioning- and retry-dependent, while hash-gating
``h(id ⊕ seed) < ⌊fraction · 2³²⌋`` gives the same sample on every
engine, every partitioning, every rerun — the property that makes a
sample citable in a data card and reproducible by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import with_hash_int32

__all__ = ["stratified_sample"]

_SEED_MIX = 0x9E3779B9  # golden-ratio odd constant; any odd works


def stratified_sample(
    df: DataFrame,
    fractions: dict | float,
    key: str | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Rows whose ``hash_int32((id + seed·mix) mod 2³²)`` falls below
    ``⌊fraction · 2³²⌋`` — a uniform fraction when ``fractions`` is a
    float, or per-stratum fractions when it is a {key-value: fraction}
    dict over the ``key`` column (strata absent from the dict are
    dropped, matching ``sampleBy``).  Thresholds are exact integers
    computed driver-side, so membership is a pure integer compare."""
    mixed = (
        F.col(id_col).cast("long") + F.lit((seed * _SEED_MIX) & 0xFFFFFFFF)
    ).bitwiseAND(F.lit(0xFFFFFFFF))
    h = with_hash_int32(df.withColumn("__mix", mixed), F.col("__mix"), "__h32")
    if isinstance(fractions, dict):
        if key is None:
            raise ValueError("per-stratum fractions require a key column")
        thr = F.lit(None).cast("long")
        for kv, frac in fractions.items():
            thr = F.when(F.col(key) == kv, F.lit(int(frac * (1 << 32)))).otherwise(
                thr
            )
        keep = F.col("__h32") < thr  # NULL threshold (unlisted stratum) drops
    else:
        keep = F.col("__h32") < F.lit(int(float(fractions) * (1 << 32)))
    return h.filter(keep).drop("__mix", "__h32")
