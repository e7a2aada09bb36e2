"""Composed training-data preparation pipeline over the documents
table: annotate → filter → exact-dedup → near-dedup → stats, as ONE
declarative DataFrame DAG.

This is the end-to-end shape a large-scale corpus-curation job takes
(the individual stages exist as standalone functions in
``functions.text`` / ``functions.dedup``); composing them in one plan
matters at 100 TB because Catalyst collapses the annotation stages
into a single scan-project (one pass over the text column, whole-stage
codegen) and the only shuffles are the ones the semantics force:

  1. quality + language annotation   — scan-project, NO shuffle
  2. threshold filter                — pushed into the same stage
  3. exact dedup (md5 class, keep min doc_id)
                                     — groupBy(md5) partial-agg (skew
                                       from giant duplicate classes is
                                       absorbed map-side) + a semi join
                                       back on the kept ids
  4. MinHash-LSH near-dup drop       — banded bucket self-join from
                                       ``dedup.lsh_candidate_pairs``
                                       (never all-pairs); survivors =
                                       left_anti on the higher id of
                                       each candidate pair
  5. output stats                    — token count + fingerprint, again
                                       fused into the final project

Greedy pair-drop policy: for every candidate pair (a, b) with a < b
the HIGHER id is dropped.  This is deliberately not transitive-closure
clustering — it is the standard one-pass near-dedup used in corpus
prep (deterministic, order-free, join-expressible); connected-component
clustering of the pair graph is available by feeding the pairs into
``apps.components`` when cluster semantics are wanted.

The DuckDB oracle twin lives in ``__spark_entry__.oracle_sql()['corpus_prep']``
(same five stages composed as CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import lsh_candidate_pairs, minhash_signatures
from .text import with_fingerprint, with_lang_guess, with_quality

__all__ = ["corpus_prep"]


def corpus_prep(
    docs: DataFrame,
    quality_min: float = 0.65,
    langs: tuple[str, ...] = ("en",),
    num_hashes: int = 8,
    shingle_k: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    text: str = "text",
    cache: bool = True,
) -> DataFrame:
    """Returns the surviving documents as
    (doc_id, lang_guess, n_tokens, quality, fingerprint).

    Survivor = passes ``quality >= quality_min`` and ``lang_guess ∈
    langs``; is the min-id representative of its exact md5(text) class
    among passers; and is not the higher id of any MinHash-LSH
    candidate pair among the exact-dedup survivors.

    ``cache=True`` persists the exact-dedup survivor stage
    (MEMORY_AND_DISK): the near-dup stage references it three times
    (signature build ×2 across the LSH self-join + the survivor
    anti-join), and without a cut each reference re-derives the
    annotate→filter→dedup prefix from the source scan.  Set False when
    the caller checkpoints stages to a table instead (the right
    choreography for a run that doesn't fit executor storage).
    """
    annotated = with_lang_guess(with_quality(docs, text=text), text=text)
    kept = annotated.filter(
        (F.col("quality") >= F.lit(quality_min))
        & F.col("lang_guess").isin(*langs)
    )

    # exact dedup: min id per md5 class, then keep only those rows.
    # groupBy+min (partial aggs absorb duplicate-class skew) + semi
    # join on the id — never a window over the raw rows of a hot class.
    keep_ids = (
        kept.select(F.col(id_col), F.md5(F.col(text)).alias("_h"))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    exact = kept.join(keep_ids, id_col, "left_semi")
    if cache:
        from pyspark.storagelevel import StorageLevel

        exact = exact.persist(StorageLevel.MEMORY_AND_DISK)

    # near-dup: banded LSH candidate pairs over the survivors only
    sigs = minhash_signatures(
        exact, num_hashes=num_hashes, shingle_k=shingle_k, id_col=id_col, text=text
    )
    pairs = lsh_candidate_pairs(sigs, num_hashes=num_hashes, bands=bands)
    drops = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    survivors = exact.join(drops, id_col, "left_anti")

    return with_fingerprint(survivors, text=text).select(
        id_col, "lang_guess", "n_tokens", "quality", "fingerprint"
    )
