"""Scalar/table functions for large-scale training-data pipelines over
the documents/embeddings tables: text analysis, deduplication,
similarity search, multimodal plumbing.  All hot paths are built-in
Catalyst expressions (JVM, whole-stage codegen); Python appears only in
clearly-marked Arrow-batched UDF paths."""

from .text import (
    with_token_count,
    with_quality,
    with_lang_guess,
    with_fingerprint,
    EN_STOPWORDS,
)
from .dedup import (
    exact_duplicates,
    token_jaccard_pairs,
    minhash_signatures,
    lsh_candidate_pairs,
    simhash16,
)
from .similarity import cosine_probe, brute_force_topk
from .temporal import asof_join, range_join
from .pipeline import corpus_prep
from .quality_filters import (
    decontaminate,
    gopher_filter,
    redact_pii,
    with_repetition_stats,
)
from .retrieval import bm25_scores, doc_terms, inverted_index
from .sampling import stratified_sample

__all__ = [
    "asof_join",
    "range_join",
    "with_repetition_stats",
    "gopher_filter",
    "redact_pii",
    "decontaminate",
    "with_token_count",
    "with_quality",
    "with_lang_guess",
    "with_fingerprint",
    "EN_STOPWORDS",
    "exact_duplicates",
    "token_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash16",
    "cosine_probe",
    "brute_force_topk",
    "corpus_prep",
    "doc_terms",
    "inverted_index",
    "bm25_scores",
    "stratified_sample",
]
