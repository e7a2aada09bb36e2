"""Shared-span detection — substring-level near-duplication between
document pairs (public semantics: Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better" — their finding is that
long VERBATIM SPANS shared across documents hurt more than whole-doc
duplicates, and span-level dedup is the fix; this is the detection
half expressed relationally).

Formulation (the suffix-array-free, shuffle-friendly restatement):

  1. every k-token shingle of every doc, WITH its position;
  2. equi-join shingle hashes across docs (docA < docB) — only docs
     sharing at least one k-gram ever meet, so the all-pairs scan
     never exists;
  3. two aligned matches extend each other iff both positions advance
     together, i.e. they lie on the same DIAGONAL (posA − posB) with
     consecutive posA — so the longest shared span per pair is the
     longest consecutive run per (docA, docB, diagonal), found with
     the classic gaps-and-islands trick (posA − row_number() is
     constant exactly on a consecutive block);
  4. a run of r consecutive matching k-grams is a verbatim span of
     r + k − 1 tokens.

Scale notes:

- the join is on the shingle hash: partial aggregation and AQE absorb
  shingle skew, and the ``max_gram_docs`` cap drops shingles present
  in more than that many docs (boilerplate headers/footers — exactly
  the posting-list cap of ``token_jaccard_pairs``) before they can
  fan out an O(df²) pair explosion at corpus scale;
- the windows run per (docA, docB, diagonal) partition — bounded by
  the shorter doc's length, never by corpus size;
- output is one row per candidate pair: filter ``max_span_tokens >=
  threshold`` for the actionable list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .quality_filters import ngrams_col


__all__ = ["doc_gram_positions", "shared_span_pairs"]


def doc_gram_positions(
    docs: DataFrame, k: int = 8, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, gram_hash) for every k-token shingle — pos is the
    0-based token index where the shingle starts; the hash is a 64-bit
    xxhash of the joined shingle (collision odds are the standard
    birthday bound — negligible next to the k-gram false-positive rate
    of span detection itself)."""
    from .text import with_token_array

    # tokens behind the Generate barrier — the k-gram builder would
    # otherwise re-run the split regex per element_at reference
    return (
        with_token_array(docs, text)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(ngrams_col(F.col("_toks"), k)).alias("pos", "_g"),
        )
        .select("doc_id", "pos", F.xxhash64("_g").alias("gram_hash"))
    )


def shared_span_pairs(
    docs: DataFrame,
    k: int = 8,
    min_span_tokens: int | None = None,
    max_gram_docs: int = 64,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document pair sharing ≥1 (uncapped) k-gram: the longest
    verbatim shared span in tokens and the number of matching aligned
    k-gram positions.

    Output: (doc_a, doc_b, max_span_tokens, n_matching_grams) with
    doc_a < doc_b; ``min_span_tokens`` (default k, i.e. any match)
    filters the result.  ``max_gram_docs`` drops boilerplate shingles
    present in more than that many documents BEFORE the self-join —
    the hot-key defense; spans consisting solely of boilerplate are
    deliberately not reported, the same trade a suffix-array pipeline
    makes by masking high-frequency grams.
    """
    g = doc_gram_positions(docs, k, text, id_col)
    # document-frequency cap, computed in-plan (one partial-agg'd
    # shuffle on the hash); keep grams appearing in <= cap docs
    df_ok = (
        g.select("gram_hash", "doc_id")
        .distinct()
        .groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_gram_docs)
        .select("gram_hash")
    )
    g = g.join(df_ok, "gram_hash")
    a = g.select(
        F.col("gram_hash"),
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = g.select(
        F.col("gram_hash"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    m = a.join(b, "gram_hash").filter(F.col("doc_a") < F.col("doc_b"))
    # a repeated gram inside one doc yields several (pos_a, pos_b)
    # alignments; each lives on its own diagonal and extends runs there
    # independently — exactly the dot-plot semantics of span matching
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    m = m.select("doc_a", "doc_b", "pos_a", diag).distinct()
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = m.withColumn(
        "_blk", F.col("pos_a") - F.row_number().over(w)
    )
    per_run = runs.groupBy("doc_a", "doc_b", "diag", "_blk").agg(
        F.count(F.lit(1)).alias("_run")
    )
    out = per_run.groupBy("doc_a", "doc_b").agg(
        (F.max("_run") + F.lit(k - 1)).cast("int").alias("max_span_tokens"),
        F.sum("_run").cast("long").alias("n_matching_grams"),
    )
    thresh = k if min_span_tokens is None else min_span_tokens
    return out.filter(F.col("max_span_tokens") >= F.lit(thresh))
