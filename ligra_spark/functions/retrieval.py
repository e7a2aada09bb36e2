"""Corpus retrieval primitives — inverted index construction and BM25
scoring (Robertson-Sparck Jones / Lucene form) over the documents
table.  The index-building and ranking half of a web-corpus pipeline:
dedup/quality (functions.dedup/text) decide WHAT to keep, these make
the kept corpus searchable and give the relevance prior that
corpus-curation recipes mix into sampling weights.

Both are pure DataFrame pipelines with exact ANSI-SQL twins:
tokenization is ``text.tokens_col``'s whitespace split (lowercased
here — index terms are case-folded), the index is explode →
per-(term, doc) distinct → capped ordered postings, and BM25 is two
aggregations + one join, all shapes that survive 100 TB (the posting
cap bounds the one per-term hotspot — stopword terms — BEFORE
collect_list, via a row_number window, not after).

    idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)          (Lucene's
               always-positive variant of RSJ idf)
    score(d) = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = ["doc_terms", "inverted_index", "bm25_scores"]


def doc_terms(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, term, tf, dl): per-document case-folded term
    frequencies plus the document length in tokens."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col(text)))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, "doc_id")


def inverted_index(
    docs: DataFrame, text: str = "text", max_postings: int = 32
) -> DataFrame:
    """(term, df, postings): document frequency and the ascending
    doc_id posting list, truncated to the FIRST ``max_postings`` ids.

    The cap is applied with a row_number window BEFORE collect_list,
    so a stopword term's reducer gathers ``max_postings`` doc_ids (the
    smallest), never the term's full document set — the count that
    produces ``df`` still sees every row, but counting is
    constant-space while an uncapped collect of a stopword's postings
    is the classic hot-key OOM at corpus scale.  ``df`` is the
    UNTRUNCATED document frequency."""
    td = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.lower(F.col(text)))).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        td.select(
            "term", "doc_id", F.row_number().over(w).alias("_rk")
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(
                F.collect_list(F.when(F.col("_rk") <= max_postings, F.col("doc_id")))
            ).alias("postings"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score): BM25 of each document against the bag of
    ``query_terms`` (case-folded); only documents containing at least
    one query term appear.  N and avgdl are corpus-wide (computed over
    ALL documents, matching every standard implementation)."""
    spark = docs.sparkSession
    terms = doc_terms(docs, text)
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens_col(F.lower(F.col(text))))).alias("avgdl"),
    )
    q = spark.createDataFrame(
        [(t.lower(),) for t in dict.fromkeys(query_terms)], "term string"
    )
    qterms = terms.join(F.broadcast(q), "term")
    dfreq = qterms.groupBy("term").agg(
        F.count(F.lit(1)).alias("dfreq")
    )
    return (
        qterms.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("_s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("score"))
    )
