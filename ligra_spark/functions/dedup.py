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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = [
    "exact_duplicates",
    "band_buckets",
    "token_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "neardup_clusters",
    "simhash16",
]


def _hash_long(col, seed: int):
    """Portable 32-bit hash from md5 hex (same value in any engine
    with md5 + hex→int: first 8 hex chars as a bigint)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), col)), 1, 8), 16, 10).cast(
        "long"
    )


def _mix_consts(seed: int) -> tuple[int, int]:
    """Universal-hash mixing constants for MinHash seed ``seed``:
    g_seed(h) = (a*h + b) mod 2^32 with a odd, a/b < 2^31 (so a*h fits
    a signed 64-bit product in every engine).  One md5 per shingle plus
    ``num_hashes`` of these mixes replaces ``num_hashes`` md5s — the
    md5 is the dominant per-element cost of signature computation."""
    import hashlib

    a = (int(hashlib.md5(f"a{seed}".encode()).hexdigest()[:8], 16) & 0x7FFFFFFF) | 1
    b = int(hashlib.md5(f"b{seed}".encode()).hexdigest()[:8], 16) & 0x7FFFFFFF
    return a, b


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


def _shingles_col(toks, k: int):
    """Array of k-word shingles of a token array, as one expression."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
        ),
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(doc_id, h0..h{num_hashes-1}) MinHash signature over k-word
    shingles.  Docs with fewer than shingle_k tokens get no row
    (no shingles — same convention as dropping too-short docs).

    Plan shape: shingle the token array per row (``transform`` over a
    ``sequence`` — no window, no per-token shuffle), ``explode``, one
    codegen'd md5 per shingle, then ``groupBy(doc_id)`` over
    ``num_hashes`` universal-hash mixes ``(a·h+b) mod 2^32``
    (``_mix_consts``).  Because explode keeps a doc's shingles
    contiguous in one partition, the partial (map-side) aggregation
    collapses to ONE signature row per doc before the exchange — the
    shuffle moves the signature table, not the corpus.  The previous
    formulation (posexplode → lead window partitioned by doc_id →
    distinct → groupBy) shuffled every token of the corpus three
    times; a pure array-expression form (array_min over transform)
    avoids even the signature shuffle but pays ~50% more CPU because
    higher-order-function md5 is interpreted, not codegen'd — measured
    slower at every scale that fits a benchmark, so the explode form
    wins.  min over the shingle multiset equals min over the distinct
    set, so no dedup pass is needed."""
    from .text import with_token_array

    # tokens materialized behind the Generate barrier: the shingle
    # builder references the array 3 times per position, and the
    # inlined split(trim(text)) would re-run per reference (see
    # text.with_token_array)
    toks = F.col("_toks")
    shingles = (
        with_token_array(docs, text)
        .filter(F.size(toks) >= shingle_k)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(_shingles_col(toks, shingle_k)).alias("_shingle"),
        )
    )
    base = shingles.select("doc_id", _hash_long(F.col("_shingle"), 0).alias("_h1"))
    aggs = []
    for seed in range(num_hashes):
        a, b = _mix_consts(seed)
        mixed = (F.lit(a).cast("long") * F.col("_h1") + F.lit(b)) % F.lit(
            1 << 32
        ).cast("long")
        aggs.append(F.min(mixed).alias(f"h{seed}"))
    return base.groupBy("doc_id").agg(*aggs)


def band_buckets(
    signatures: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(doc_id, bkey) — one LSH band-bucket key per band per doc (one
    array-explode per row; see :func:`lsh_candidate_pairs` for why not
    a union of per-band projections).  Shared by the batch pairing
    below and the streaming dedup maintainer's persistent bucket
    index."""
    rpb = num_hashes // bands
    keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"h{b * rpb + j}").cast("string") for j in range(rpb)],
            )
        )
        for b in range(bands)
    ]
    return signatures.select("doc_id", F.explode(F.array(*keys)).alias("bkey"))


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b, shared_bands): pairs whose signatures collide in
    ≥1 band (rows_per_band = num_hashes/bands).  Candidate set for
    near-dup verification — the LSH trick that avoids all-pairs.

    The band keys are built as ONE array-explode per row (not one
    projection per band unioned together): a union of per-band
    projections embeds the ``signatures`` subtree ``bands`` times —
    and 2·bands times across the self-join — so if the signatures are
    unmaterialized upstream work (MinHash over the raw corpus) the
    whole corpus would be re-scanned 2·bands times.  With the explode
    form the self-join references the subtree exactly twice."""
    buckets = band_buckets(signatures, num_hashes, bands)
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
    token-hash bits; bit set iff #ones*2 > #tokens.  Hamming-near
    simhashes ⇒ near-duplicate token sets.

    Per-row array expressions (hash each token once into an array
    column, then 16 conditional sizes): a pure two-stage scan-project
    with ZERO shuffles — the earlier explode + groupBy(doc_id) form
    shuffled every token of the corpus once.  Docs with no tokens get
    no row (same convention as the exploded form)."""
    toks = F.array_distinct(tokens_col(F.col(text)))
    hashed = docs.filter(F.size(toks) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("_ntok"),
        F.transform(toks, lambda t: _hash_long(t, 99)).alias("_hs"),
    )

    def _ones(b: int):
        return F.size(
            F.filter(
                F.col("_hs"),
                lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
            )
        )

    sim = F.lit(0).cast("long")
    for b in range(16):
        sim = sim + F.when(
            _ones(b) * 2 > F.col("_ntok"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return hashed.select("doc_id", sim.alias("simhash"))


def neardup_clusters(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    min_shared_bands: int = 1,
    id_col: str = "doc_id",
    text: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, cluster, keep) — the COMPLETE near-dup dedup flow a
    web-scale corpus actually runs: MinHash signatures → banded-LSH
    candidate pairs → connected components over the near-dup pair
    graph → canonical keeper = min doc id per cluster (keep = 1).

    LSH candidates are only PAIRS; transitive duplicate families (A~B,
    B~C but A≯C) must be closed before picking keepers, or the corpus
    keeps one doc per *pair* instead of one per *family*.  The closure
    runs on ``apps.cc_star.two_phase_star_pairs`` — the
    diameter-independent star contraction, so a pathological
    chain-of-near-dups family (template drift across a million pages)
    closes in O(log family) rounds, never O(family).  No stage is
    all-pairs; ids stay sparse doc ids throughout (no dense-id rename
    needed).
    """
    from ..apps.cc_star import two_phase_star_pairs

    p = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    sigs = minhash_signatures(
        docs, num_hashes=num_hashes, shingle_k=shingle_k, id_col=id_col, text=text
    )
    pairs = lsh_candidate_pairs(sigs, num_hashes=num_hashes, bands=bands)
    if min_shared_bands > 1:
        pairs = pairs.filter(F.col("shared_bands") >= min_shared_bands)
    stars, _ = two_phase_star_pairs(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")), p
    )
    cl = (
        stars.groupBy("u")
        .agg(F.min("v").alias("cluster"))
        .withColumnRenamed("u", id_col)
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(cl.hint("shuffle_hash"), id_col, "left")
        .select(id_col, F.coalesce("cluster", F.col(id_col)).alias("cluster"))
        .withColumn("keep", (F.col("cluster") == F.col(id_col)).cast("int"))
    )
