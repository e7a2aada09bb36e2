"""Corpus-gate operators for web-scale training-data curation:
Gopher-style repetition statistics, PII redaction, and benchmark
decontamination.

These are the three standard pre-training gates that sit between raw
crawl text and the tokenizer (public semantics: Rae et al. 2021
"Scaling Language Models" §A1.1 repetition filters; C4/RefinedWeb-style
PII scrubbing; GPT-3-appendix-style n-gram test-set decontamination).

Scale notes (the point of each design):

- ``with_repetition_stats`` — ZERO-shuffle: every statistic, including
  the "fraction of tokens inside the most-frequent n-gram", is a pure
  Catalyst expression over the per-row token array (sort the n-gram
  array, then a single ``aggregate`` pass finds the longest equal run —
  no explode, no groupBy).  At 100 TB this is one scan-project with
  whole-stage codegen, the same shape as ``text.with_quality``.
- ``gopher_filter``        — thresholds over those columns; a plain
  ``filter`` that Catalyst folds into the same projection.
- ``redact_pii``           — three ``regexp_replace`` passes (email,
  international/US phone, IPv4) + per-kind match counts.  Pure
  codegen'd scan; the regexes avoid backreferences/lookarounds so the
  exact same pattern runs on Java regex and RE2-family engines.
- ``decontaminate``        — k-token shingle equi-join between the
  training corpus and a (small) benchmark set.  The benchmark side is
  deduplicated and broadcast — the corpus is scanned once, never
  shuffled; output is per-doc overlap counts.  This is the join-on-
  hashed-ngram formulation that replaces the quadratic "compare every
  doc against every benchmark doc" scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



__all__ = [
    "ngrams_col",
    "top_ngram_run_col",
    "with_repetition_stats",
    "gopher_filter",
    "PII_PATTERNS",
    "redact_pii",
    "decontaminate",
]

_SEP = "\x1f"  # unit separator: cannot appear in whitespace-split tokens


def ngrams_col(toks: Column, k: int) -> Column:
    """Array of k-token shingles of a token array (empty if fewer than
    k tokens), each joined with a separator that cannot occur inside a
    token."""
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(k)]  # noqa: E731
    # sequence(1, n) DESCENDS when n < 1 — guard short docs to empty
    return F.when(
        F.size(toks) < k, F.array().cast("array<string>")
    ).otherwise(F.transform(idx, lambda i: F.concat_ws(_SEP, *parts(i))))


def top_ngram_run_col(toks: Column, k: int) -> Column:
    """Occurrence count of the MOST FREQUENT k-gram in the token array,
    as a pure expression: sort the k-gram array, then one ``aggregate``
    pass over the sorted array tracking (previous value, current run
    length, best run length).  Equal k-grams are adjacent after the
    sort, so the longest equal run IS the top frequency — no explode,
    no shuffle, no UDF.  0 when the doc has fewer than k tokens."""
    sorted_ng = F.array_sort(ngrams_col(toks, k))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(sorted_ng, zero, step, lambda acc: acc["best"])


def with_repetition_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style repetition signals, one scan, zero shuffles:

    - ``n_tokens``       : whitespace token count
    - ``distinct_frac``  : distinct tokens / tokens (1.0 for empty)
    - ``top2gram_frac``  : tokens covered by the most frequent 2-gram
      (count * 2 / n_tokens), 0 when n_tokens < 2
    - ``top3gram_frac``  : same for 3-grams
    - ``mean_word_len``  : mean token length in chars (0 for empty)
    - ``symbol_frac``    : non-alphanumeric, non-space chars / chars
      (0 for empty)

    Reference semantics: Gopher §A1.1 measures "fraction of characters
    in the most common n-gram" over lines/paragraphs; this corpus is
    single-line text, so the fractions are over TOKENS — the
    discriminative content is identical and the column is engine-
    independently pinned by the DuckDB oracle.
    """
    # Two deliberate Generate (one-row explode) barriers, each carrying
    # its payload INSIDE the exploded struct:
    #
    # 1. the token array: the n-gram expressions reference the tokens
    #    O(tokens) times, and an inlined split(trim(text)) would re-run
    #    the regex PER REFERENCE in the interpreted lambdas (measured
    #    ~1.2 ms/row — 20x the whole scan);
    # 2. the six statistics: downstream rule chains and FILTERS
    #    reference them repeatedly, and both CollapseProject and
    #    PushDownPredicate would otherwise substitute the full
    #    aggregate expressions per reference (a filter even pushes
    #    through a Generate it doesn't reference — carrying the stats
    #    as the generator's OUTPUT is what pins them).
    #
    # Referencing a generated struct field is a row-buffer read, so
    # every later consumer — including gopher_filter's rule chain and
    # a filter("gopher_pass") — costs nothing extra.
    from .text import with_token_array

    _STAT_COLS = (
        "n_tokens", "distinct_frac", "top2gram_frac", "top3gram_frac",
        "mean_word_len", "symbol_frac",
    )
    clash = [c for c in df.columns if c in _STAT_COLS]
    if clash:
        raise ValueError(
            f"with_repetition_stats: input already has column(s) {clash}; "
            "drop or rename them first (the stat names are fixed)"
        )
    df = with_token_array(df, text, out="_t")
    toks = F.col("_t")
    n = F.size(toks)
    nd = n.cast("double")
    chars = F.length(F.col(text))
    stats = F.struct(
        n.alias("n_tokens"),
        F.when(n == 0, F.lit(1.0))
        .otherwise(F.size(F.array_distinct(toks)) / nd)
        .alias("distinct_frac"),
        F.when(n < 2, F.lit(0.0))
        .otherwise(top_ngram_run_col(toks, 2) * 2 / nd)
        .alias("top2gram_frac"),
        F.when(n < 3, F.lit(0.0))
        .otherwise(top_ngram_run_col(toks, 3) * 3 / nd)
        .alias("top3gram_frac"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / nd
        )
        .alias("mean_word_len"),
        F.when(chars == 0, F.lit(0.0))
        .otherwise(
            F.length(F.regexp_replace(F.col(text), r"[A-Za-z0-9\s]", ""))
            / chars.cast("double")
        )
        .alias("symbol_frac"),
    )
    df = df.withColumn("_s", F.explode(F.array(stats))).drop("_t")
    out_cols = [c for c in df.columns if c != "_s"]
    return df.select(*out_cols, "_s.*")


# default thresholds — Gopher's published values adapted to token
# fractions; each rejected doc reports WHICH rule fired
GOPHER_DEFAULTS = {
    "min_tokens": 8,
    "max_tokens": 200_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "max_symbol_frac": 0.1,
    "min_distinct_frac": 0.3,
    "max_top2gram_frac": 0.20,
    "max_top3gram_frac": 0.18,
}


def gopher_filter(df: DataFrame, text: str = "text", **overrides) -> DataFrame:
    """Adds the repetition stats plus ``gopher_pass`` and a
    ``gopher_reason`` string naming the first failed rule (empty when
    passing).  Pure projection over :func:`with_repetition_stats` —
    Catalyst folds the whole gate into the scan."""
    t = dict(GOPHER_DEFAULTS, **overrides)
    # the stat columns are generator-output struct fields (see
    # with_repetition_stats) — the rule chain and any filter over
    # gopher_pass reference them as row-buffer reads, never by
    # re-inlining the aggregate expressions
    s = with_repetition_stats(df, text)
    rules = [
        ("too_short", F.col("n_tokens") < t["min_tokens"]),
        ("too_long", F.col("n_tokens") > t["max_tokens"]),
        ("word_len_low", F.col("mean_word_len") < t["min_mean_word_len"]),
        ("word_len_high", F.col("mean_word_len") > t["max_mean_word_len"]),
        ("symbol_heavy", F.col("symbol_frac") > t["max_symbol_frac"]),
        ("low_distinct", F.col("distinct_frac") < t["min_distinct_frac"]),
        ("rep_2gram", F.col("top2gram_frac") > t["max_top2gram_frac"]),
        ("rep_3gram", F.col("top3gram_frac") > t["max_top3gram_frac"]),
    ]
    reason = F.lit("")
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return s.withColumn("gopher_reason", reason).withColumn(
        "gopher_pass", reason == ""
    )


# PII patterns shared (verbatim) by the Spark path and the SQL oracle:
# no backreferences, no lookarounds, no \d / \b shorthands that differ
# across engines — plain character classes only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "phone": r"\+?[0-9][0-9 ()-]{6,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
_PII_ORDER = ["email", "ipv4", "phone"]  # email first (contains digits),
# ipv4 before phone (a dotted quad also matches the phone charset tail)


def redact_pii(df: DataFrame, text: str = "text") -> DataFrame:
    """Replaces emails, phone numbers and IPv4 addresses in ``text``
    with ``<EMAIL>``/``<PHONE>``/``<IPV4>`` tokens and reports per-kind
    match counts mirroring the email→ipv4→phone replacement order:
    ``n_email`` on the original text, ``n_ipv4`` on the email-redacted
    text, ``n_phone`` on the ipv4-redacted text — so counts equal
    replacements made.

    Output columns: ``redacted`` plus ``n_email``/``n_ipv4``/
    ``n_phone``.  One scan, three regexp passes, no shuffle — the
    C4-style scrub shape."""
    c = F.col(text)
    after_email = F.regexp_replace(c, PII_PATTERNS["email"], "<EMAIL>")
    after_ipv4 = F.regexp_replace(after_email, PII_PATTERNS["ipv4"], "<IPV4>")
    after_phone = F.regexp_replace(after_ipv4, PII_PATTERNS["phone"], "<PHONE>")
    return (
        df.withColumn("n_email", F.regexp_count(c, F.lit(PII_PATTERNS["email"])))
        .withColumn(
            "n_ipv4", F.regexp_count(after_email, F.lit(PII_PATTERNS["ipv4"]))
        )
        .withColumn(
            "n_phone", F.regexp_count(after_ipv4, F.lit(PII_PATTERNS["phone"]))
        )
        .withColumn("redacted", after_phone)
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    k: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-training-doc overlap against a benchmark set: the number of
    DISTINCT k-token shingles of the training doc that also occur
    anywhere in ``bench``, plus a ``contaminated`` flag (>0).

    Formulation: distinct benchmark shingles (small — benchmarks are
    by definition tiny next to the corpus) are broadcast; the corpus is
    exploded to (doc, distinct shingle) and equi-joined.  The corpus
    side is touched exactly once and never shuffled when the broadcast
    applies; the groupBy that re-aggregates matches shuffles only the
    MATCHING shingles (≈0 rows for a clean corpus).  Docs with fewer
    than k tokens have no shingles and report 0.
    """
    from .text import with_token_array

    # tokens materialized behind the Generate barrier: the k-gram
    # builder references the array O(k·positions) times (see
    # text.with_token_array for the re-inlined-split pathology)
    t_sh = with_token_array(train, text).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_col(F.col("_toks"), k))).alias("_sh"),
    )
    b_sh = (
        with_token_array(bench, text)
        .select(
            F.explode(F.array_distinct(ngrams_col(F.col("_toks"), k))).alias("_sh")
        )
        .distinct()
    )
    if broadcast_bench:
        b_sh = F.broadcast(b_sh)
    hits = (
        t_sh.join(b_sh, "_sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("overlap_ngrams", F.lit(0)).alias("overlap_ngrams"),
            (F.coalesce("overlap_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
