"""Similarity search over an embedding column (array<float>).

- ``cosine_probe``     — exact cosine similarity of a (small) probe set
  against the whole table, expressed relationally (posexplode + join +
  sum) so the same SQL runs in any engine and the fp64 accumulation
  order is groupBy-deterministic up to rounding.
- ``brute_force_topk`` — exact top-k neighbors per probe, computed
  JVM-side with zip_with/aggregate over the array columns (no explode
  blow-up) + a window row_number.  The baseline ANN answer.
- ``lsh_bucket_topk``  — the scale path: random-hyperplane LSH.  Each
  vector gets a b-bit signature from sign(v·r_i) with deterministic
  md5-seeded hyperplanes; candidates = same-bucket vectors only, then
  exact re-rank.  At 10^12 vectors the bucket join replaces the
  all-pairs cross join; recall tunes with b and number of tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_probe",
    "brute_force_topk",
    "lsh_bucket_topk",
    "lsh_neardup_pairs",
    "lsh_signature_udf",
    "ivf_topk",
    "ivf_assign_udf",
    "hyperplanes",
]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_probe(
    emb: DataFrame,
    probe_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(probe_id, vec_id, cos_sim) for every (probe, vector) pair,
    relational form: explode both sides, join on array index, sum."""
    flat = emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("vid", "i", F.col("x").cast("double").alias("x"))
    norms = flat.groupBy("vid").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
    probes = flat.filter(F.col("vid").isin(probe_ids)).select(
        F.col("vid").alias("probe_id"), "i", F.col("x").alias("px")
    )
    dots = (
        probes.join(flat, "i")
        .groupBy("probe_id", "vid")
        .agg(F.sum(F.col("px") * F.col("x")).alias("dot"))
    )
    np_ = norms.select(F.col("vid").alias("probe_id"), F.col("nrm").alias("pn"))
    return (
        dots.join(norms, "vid")
        .join(np_, "probe_id")
        .select(
            "probe_id",
            F.col("vid").alias("vec_id"),
            F.round(F.col("dot") / (F.col("nrm") * F.col("pn")), round_to).alias(
                "cos_sim"
            ),
        )
    )


def brute_force_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe row.  probes: DataFrame
    (vec_id, embedding) — broadcast (probe sets are small); the big
    side streams once through a JVM zip_with/aggregate projection."""
    # norms are computed BELOW the join boundary — once per base row /
    # probe row, not once per (row, probe) pair.  Bit-identical to the
    # inline form (same expressions, same nrm*pnrm multiply order), but
    # the per-pair work drops to one zip_with/aggregate dot + a divide.
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("pvec"),
            _norm(F.col(vec_col)).alias("pnrm"),
        )
    )
    joined = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    ).crossJoin(p)
    scored = joined.filter(F.col("vec_id") != F.col("probe_id")).select(
        "probe_id",
        "vec_id",
        (_dot(F.col("vec"), F.col("pvec")) / (F.col("nrm") * F.col("pnrm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def hyperplanes(dim: int, bits: int, seed: int = 0):
    """Deterministic pseudo-random hyperplanes: component r[b][i] =
    (md5-derived uniform in [-1,1]).  numpy-free closed form so the
    same planes can be rebuilt anywhere."""
    import hashlib

    planes = []
    for b in range(bits):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed}:{b}:{i}".encode()).hexdigest()[:8], 16)
            row.append((h / float(0xFFFFFFFF)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature_udf(dim: int, bits: int, seed: int = 0):
    """Vectorized (Arrow-batched) hyperplane-LSH signature: one numpy
    matmul per batch against the (bits x dim) plane matrix, then a
    sign-bit pack.  This replaces the earlier Catalyst-literal
    formulation (dim x bits literals per projection — a ~50k-node plan
    at dim=768/bits=64); the UDF's plan cost is O(1) regardless of
    dim, and the planes ship once inside the serialized closure."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes_t = np.array(hyperplanes(dim, bits, seed), dtype=np.float64).T  # dim x bits
    pow2 = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def sig(v):
        # list-free Arrow→numpy: Series elements arrive as np.ndarray
        # under Arrow batching, so stacking avoids materializing a
        # Python list per element before the matmul (per-batch hot loop)
        mat = np.stack(v.values).astype(np.float64, copy=False)  # batch x dim
        buckets = ((mat @ planes_t) >= 0.0).astype(np.int64) @ pow2
        return pd.Series(buckets)

    # real annotation objects (module-level `from __future__ import
    # annotations` would stringify inline hints, which the pandas_udf
    # eval-type inference rejects)
    sig.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(sig, "long")


def lsh_bucket_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int | None = None,
    tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket = b-bit sign signature;
    exact re-rank within the probe's buckets.  ``tables`` > 1 enables
    OR-amplification — one independent plane set per table, candidates
    = union of same-bucket matches (recall rises, candidate count
    stays sub-linear).  ``dim`` is required: a driver-side length
    probe would be a serial job at 10^12 rows.  Returns (probe_id,
    vec_id, cos_sim, rank) — a subset of brute-force top-k with
    recall < 1 (the price of sub-linear candidate sets)."""
    if dim is None:
        raise ValueError(
            "lsh_bucket_topk requires dim= (the embedding length); "
            "inferring it would run a driver-side job over the table"
        )
    # per-row norms ride below the bucket join (see brute_force_topk)
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pvec"),
        _norm(F.col(vec_col)).alias("pnrm"),
    )
    per_table = []
    for t in range(tables):
        sig = lsh_signature_udf(dim, bits, seed=t)
        bt = base.select("vec_id", "vec", "nrm", sig(F.col("vec")).alias("bucket"))
        pt = F.broadcast(
            p.select("probe_id", "pvec", "pnrm", sig(F.col("pvec")).alias("bucket"))
        )
        per_table.append(
            bt.join(pt, "bucket").filter(F.col("vec_id") != F.col("probe_id"))
            .select("probe_id", "vec_id", "vec", "pvec", "nrm", "pnrm")
        )
    cands = per_table[0]
    for c in per_table[1:]:
        cands = cands.unionByName(c)
    if tables > 1:
        cands = cands.dropDuplicates(["probe_id", "vec_id"])
    scored = cands.select(
        "probe_id",
        "vec_id",
        (_dot(F.col("vec"), F.col("pvec")) / (F.col("nrm") * F.col("pnrm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def lsh_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    bits: int = 8,
    dim: int | None = None,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at scale: candidate pairs
    come from per-table LSH-bucket self-joins (same b-bit hyperplane
    signature ⇒ candidate — never an all-pairs cross join), unioned
    across ``tables`` independent plane sets (OR-amplification), then
    confirmed by exact cosine ≥ ``threshold``.

    The dedup twin of ``lsh_bucket_topk``: where top-k answers "who is
    near this probe", this answers "which rows are near-duplicates of
    each other" — the embedding leg of the dedup suite
    (functions/dedup.py covers the token legs).  Output is one row per
    unordered pair (a_id < b_id) with the rounded cosine; the
    threshold is applied to the ROUNDED value so the boundary is
    reproducible across engines (fp64 sum order differs between
    engines only below the rounding grain).

    Recall < 1 by construction (bucketing misses some true pairs);
    precision is exact (every emitted pair really is ≥ threshold).
    At 10^12 rows the per-table self-join shuffles each row once on
    its bucket key; hot buckets (near-constant vectors) are the skew
    risk and tune with ``bits``.
    """
    if dim is None:
        raise ValueError(
            "lsh_neardup_pairs requires dim= (the embedding length); "
            "inferring it would run a driver-side job over the table"
        )
    # per-row norms ride below the bucket self-join (see brute_force_topk)
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    per_table = []
    for t in range(tables):
        sig = lsh_signature_udf(dim, bits, seed=t)
        bt = base.select("vec_id", "vec", "nrm", sig(F.col("vec")).alias("bucket"))
        left = bt.select(
            F.col("vec_id").alias("a_id"),
            F.col("vec").alias("va"),
            F.col("nrm").alias("na"),
            "bucket",
        )
        right = bt.select(
            F.col("vec_id").alias("b_id"),
            F.col("vec").alias("vb"),
            F.col("nrm").alias("nb"),
            "bucket",
        )
        per_table.append(
            left.join(right, "bucket")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "va", "vb", "na", "nb")
        )
    cands = per_table[0]
    for c in per_table[1:]:
        cands = cands.unionByName(c)
    if tables > 1:
        cands = cands.dropDuplicates(["a_id", "b_id"])
    return (
        cands.select(
            "a_id",
            "b_id",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign_udf(dim: int, nlist: int, seed: int = 100, nprobe: int = 1):
    """Vectorized IVF coarse-quantizer assignment: centroids are the
    deterministic md5-derived matrix ``hyperplanes(dim, nlist, seed)``
    (reused as a codebook — rows are centroids, not planes), and each
    vector maps to its ``nprobe`` nearest centroids by squared L2,
    computed as one numpy matmul per Arrow batch
    (argmin of ||c||^2 - 2 v·c; the ||v||^2 term is rank-invariant).
    Returns an ``array<int>`` column of centroid ids, nearest first,
    ties broken by centroid id (ascending) so the assignment is
    engine-reproducible."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents = np.array(hyperplanes(dim, nlist, seed), dtype=np.float64)  # nlist x dim
    c2 = (cents**2).sum(axis=1)  # ||c||^2 per centroid

    def assign(v):
        # list-free Arrow→numpy (see lsh_signature_udf)
        mat = np.stack(v.values).astype(np.float64, copy=False)  # batch x dim
        # batch x nlist partial squared distances; stable argsort ties
        # break by centroid id because numpy 'stable' keeps index order
        d = c2[None, :] - 2.0 * (mat @ cents.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "array<int>")


def ivf_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    dim: int | None = None,
    seed: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via IVF (inverted-file) coarse quantization — the
    bucketed-by-proximity alternative to ``lsh_bucket_topk``: every
    base vector lands in ONE cluster (its nearest of ``nlist``
    deterministic centroids); each probe expands to its ``nprobe``
    nearest clusters; candidates = base rows in those clusters; exact
    cosine re-rank takes the top k.

    At 10^12 rows this is the classic IVF scan shape: the base side is
    partitioned (and at rest, partition-pruned) by cluster id, the
    probe side is tiny and broadcast, and recall tunes with
    nprobe/nlist instead of bits/tables.  A trained k-means codebook
    drops in by replacing ``hyperplanes`` with learned centroids — the
    plan does not change.

    Returns (probe_id, vec_id, cos_sim, rank), rank by unrounded
    cosine desc then vec_id, cos_sim rounded to 6dp (engine-portable).
    """
    if dim is None:
        raise ValueError(
            "ivf_topk requires dim= (the embedding length); "
            "inferring it would run a driver-side job over the table"
        )
    assign1 = ivf_assign_udf(dim, nlist, seed, nprobe=1)
    assignp = ivf_assign_udf(dim, nlist, seed, nprobe=nprobe)
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        assign1(F.col(vec_col)).getItem(0).alias("cluster"),
    )
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("pvec"),
            _norm(F.col(vec_col)).alias("pnrm"),
            F.explode(assignp(F.col(vec_col))).alias("cluster"),
        )
    )
    cands = base.join(p, "cluster").filter(F.col("vec_id") != F.col("probe_id"))
    scored = cands.select(
        "probe_id",
        "vec_id",
        (_dot(F.col("vec"), F.col("pvec")) / (F.col("nrm") * F.col("pnrm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )
