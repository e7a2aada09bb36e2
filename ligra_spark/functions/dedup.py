"""Deduplication for web-scale corpora: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale notes (the point of each design):

- ``exact_duplicates``     — one hash-groupBy; partial aggregation
  absorbs identical-document skew before the shuffle.
- ``token_jaccard_pairs``  — inverted-index self-join (doc×token →
  join on token).  Quadratic in the worst case; the ``max_token_docs``
  cap drops ubiquitous tokens (stopword posting lists) exactly like
  dropping >p% document-frequency terms in a real pipeline — without
  it one hot token produces an O(n²) join at 10^12 docs.
- ``minhash_signatures``   — k independent hash mins per doc over
  3-word shingles; linear scan + groupBy(doc).  Hashes are
  md5-derived (engine-portable; same values in the DuckDB oracle).
- ``lsh_candidate_pairs``  — band the signatures, self-join per band
  bucket; only near-duplicates collide, turning all-pairs O(n²) into
  O(candidates).
- ``simhash16``            — 16-bit SimHash via per-bit majority vote,
  expressed as 16 conditional sums (pure Catalyst; a 64-bit variant
  just widens the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = [
    "exact_duplicates",
    "token_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash16",
]


def _hash_long(col, seed: int):
    """Portable 32-bit hash from md5 hex (same value in any engine
    with md5 + hex→int: first 8 hex chars as a bigint)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), col)), 1, 8), 16, 10).cast(
        "long"
    )


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """(fingerprint h, keep_id = min doc id, copies) — one row per
    distinct text."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text)).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("copies"))
    )


def _doc_tokens(docs: DataFrame, id_col: str, text: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(F.col(text))).alias("tok")
    ).distinct()


def token_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text: str = "text",
    max_token_docs: int | str | None = "auto",
    df_fraction: float = 0.1,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with distinct-token Jaccard ≥
    threshold, doc_a < doc_b.  Pure relational — inverted index
    self-join, no arrays shipped through the shuffle.

    The hot-token cap is ON by default (``max_token_docs="auto"`` =
    document frequency > max(16, df_fraction·n_docs)): on real web
    text one stopword's posting list makes the self-join O(n²), so an
    uncapped run must be an explicit opt-out (``None``), exactly like
    dropping >p%%-document-frequency terms in a real dedup pipeline.
    The auto cap is computed inside the plan (a broadcast 1-row
    aggregate) — no driver-side count job."""
    dt = _doc_tokens(docs, id_col, text)
    if max_token_docs == "auto":
        total = dt.select(F.count_distinct("doc_id").alias("_ndocs"))
        hot = (
            dt.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_dc"))
            .crossJoin(F.broadcast(total))
            .filter(
                F.col("_dc")
                > F.greatest(F.lit(16.0), F.col("_ndocs") * F.lit(df_fraction))
            )
        )
        dt = dt.join(F.broadcast(hot.select("tok")), "tok", "left_anti")
    elif max_token_docs is not None:
        hot = dt.groupBy("tok").count().filter(F.col("count") > max_token_docs)
        dt = dt.join(F.broadcast(hot.select("tok")), "tok", "left_anti")
    dt = dt.persist()
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = dt.select(F.col("doc_id").alias("doc_a"), "tok")
    b = dt.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 8
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def _shingles(docs: DataFrame, id_col: str, text: str, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per doc via posexplode + lead windows
    (engine-portable: lead() exists everywhere)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text))).alias("i", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    sh = toks.select(
        "doc_id",
        F.concat_ws(
            " ", "tok", *[F.lead("tok", j).over(w) for j in range(1, k)]
        ).alias("shingle"),
        *[F.lead("tok", k - 1).over(w).alias("_last")],
    ).filter(F.col("_last").isNotNull())
    return sh.select("doc_id", "shingle").distinct()


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(doc_id, h0..h{num_hashes-1}) MinHash signature over k-word
    shingles.  Docs with fewer than shingle_k tokens get no row
    (no shingles — same convention as dropping too-short docs)."""
    sh = _shingles(docs, id_col, text, shingle_k)
    aggs = [
        F.min(_hash_long(F.col("shingle"), s)).alias(f"h{s}") for s in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b, shared_bands): pairs whose signatures collide in
    ≥1 band (rows_per_band = num_hashes/bands).  Candidate set for
    near-dup verification — the LSH trick that avoids all-pairs."""
    rpb = num_hashes // bands
    per_band = []
    for b in range(bands):
        cols = [f"h{b * rpb + j}" for j in range(rpb)]
        key = F.md5(F.concat_ws("|", F.lit(str(b)), *[F.col(c).cast("string") for c in cols]))
        per_band.append(signatures.select("doc_id", key.alias("bkey")))
    buckets = per_band[0]
    for p in per_band[1:]:
        buckets = buckets.unionByName(p)
    a = buckets.select(F.col("doc_id").alias("doc_a"), "bkey")
    b_ = buckets.select(F.col("doc_id").alias("doc_b"), "bkey")
    return (
        a.join(b_, "bkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """(doc_id, simhash) — 16-bit SimHash: per bit, majority vote of
    token-hash bits over DISTINCT tokens; bit set iff #ones*2 > #tokens.
    Hamming-near simhashes ⇒ near-duplicate token sets."""
    dt = _doc_tokens(docs, id_col, text)
    h = _hash_long(F.col("tok"), 99)
    bit_sums = dt.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ntok"),
        *[
            F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(16)
        ],
    )
    sim = F.lit(0).cast("long")
    for b in range(16):
        sim = sim + F.when(
            F.col(f"b{b}") * 2 > F.col("ntok"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("doc_id", sim.alias("simhash"))
