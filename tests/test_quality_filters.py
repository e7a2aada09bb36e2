"""Corpus-gate operators: Gopher repetition stats, PII redaction,
benchmark decontamination (functions/quality_filters.py)."""

from collections import Counter

import random

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- repetition


def _top_k_count(tokens, k):
    if len(tokens) < k:
        return 0
    return max(Counter(tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1)).values())


def test_top_ngram_run_matches_counter(spark):
    """The sorted-array longest-equal-run equals the true top n-gram
    frequency for 200 random token multisets (one Spark job, all rows;
    small alphabet so collisions/runs actually occur)."""
    import pyspark.sql.functions as F

    from ligra_spark.functions.quality_filters import top_ngram_run_col

    rng = random.Random(7)
    cases = [
        [rng.choice(["a", "b", "ab", "x"]) for _ in range(rng.randrange(0, 13))]
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, toks array<string>"
    )
    for k in (2, 3):
        got = {
            r["i"]: r["c"]
            for r in df.select(
                "i", top_ngram_run_col(F.col("toks"), k).alias("c")
            ).collect()
        }
        for i, toks in enumerate(cases):
            assert got[i] == _top_k_count(toks, k), (k, toks)


def test_repetition_stats_values(spark):
    from ligra_spark.functions import with_repetition_stats

    rows = [
        (0, "spam spam spam spam"),  # one token repeated
        (1, "a b c d"),  # all distinct
        (2, ""),  # empty
        (3, "x y x y x y"),  # dominant 2-gram "x y"
    ]
    out = {
        r["doc_id"]: r
        for r in with_repetition_stats(_docs(spark, rows)).collect()
    }
    r0 = out[0]
    assert r0["n_tokens"] == 4
    assert r0["distinct_frac"] == pytest.approx(0.25)
    # "spam spam" occurs 3x -> 3*2/4
    assert r0["top2gram_frac"] == pytest.approx(1.5)
    assert r0["mean_word_len"] == pytest.approx(4.0)
    r1 = out[1]
    assert r1["distinct_frac"] == 1.0
    assert r1["top2gram_frac"] == pytest.approx(2 / 4)
    r2 = out[2]
    assert r2["n_tokens"] == 0
    assert r2["distinct_frac"] == 1.0
    assert r2["top2gram_frac"] == 0.0 and r2["mean_word_len"] == 0.0
    r3 = out[3]
    # "x y" occurs 3x among 5 2-grams -> 3*2/6
    assert r3["top2gram_frac"] == pytest.approx(1.0)
    assert r3["distinct_frac"] == pytest.approx(2 / 6)


def test_gopher_filter_reasons(spark):
    from ligra_spark.functions import gopher_filter

    rows = [
        (0, "too short"),
        (1, " ".join(["lorem", "ipsum", "dolor", "sit"] * 8)),  # repetitive
        (2, " ".join(f"w{i}" for i in range(40))),  # clean
        (3, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) ___"),  # symbols
    ]
    out = {r["doc_id"]: r for r in gopher_filter(_docs(spark, rows)).collect()}
    assert out[0]["gopher_reason"] == "too_short"
    assert out[1]["gopher_reason"] in ("rep_2gram", "rep_3gram", "low_distinct")
    assert out[2]["gopher_pass"] and out[2]["gopher_reason"] == ""
    assert out[3]["gopher_reason"] == "symbol_heavy"


# ----------------------------------------------------------------------- PII


def test_redact_pii(spark):
    from ligra_spark.functions import redact_pii

    rows = [
        (0, "write to jane.doe+spam@sub.example.org today"),
        (1, "call +44 20 7946 0958 or 415-555-0199 now"),
        (2, "hosts 192.168.0.1 and 10.0.0.255"),
        (3, "nothing here"),
        (4, "mixed a@b.co at 1.2.3.4 tel +1 (650) 555-0100"),
    ]
    out = {r["doc_id"]: r for r in redact_pii(_docs(spark, rows)).collect()}
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["redacted"]
    assert "jane" not in out[0]["redacted"]
    assert out[1]["n_phone"] == 2
    assert out[1]["redacted"].count("<PHONE>") == 2
    assert out[2]["n_ipv4"] == 2 and out[2]["redacted"].count("<IPV4>") == 2
    assert out[3]["redacted"] == "nothing here"
    r4 = out[4]
    assert (r4["n_email"], r4["n_ipv4"], r4["n_phone"]) == (1, 1, 1)
    for tok in ("<EMAIL>", "<IPV4>", "<PHONE>"):
        assert tok in r4["redacted"]


# ----------------------------------------------------------- decontamination


def test_decontaminate_overlap(spark):
    from ligra_spark.functions import decontaminate

    canon = " ".join(f"t{i}" for i in range(10))  # 3 distinct 8-grams
    rows = [
        (0, canon),  # exact benchmark doc
        (1, "x0 " + canon),  # shifted: shares all 3 8-grams
        (2, canon.replace("t5", "z")),  # broken middle: no shared 8-gram
        (3, "a b c"),  # too short for any 8-gram
    ]
    train = _docs(spark, rows)
    bench = _docs(spark, [(99, canon)])
    out = {r["doc_id"]: r for r in decontaminate(train, bench, k=8).collect()}
    assert out[0]["overlap_ngrams"] == 3 and out[0]["contaminated"]
    assert out[1]["overlap_ngrams"] == 3
    assert out[2]["overlap_ngrams"] == 0 and not out[2]["contaminated"]
    assert out[3]["overlap_ngrams"] == 0
    assert len(out) == 4  # every train doc reported, zero-overlap included


def test_decontaminate_counts_distinct_shingles_once(spark):
    from ligra_spark.functions import decontaminate

    # train doc repeats the same 8 tokens twice -> its 9 8-grams contain
    # duplicates; distinct matching shingles must be counted once each
    seq = " ".join(["a", "b", "c", "d", "e", "f", "g", "h"])
    train = _docs(spark, [(0, seq + " " + seq)])
    bench = _docs(spark, [(9, seq)])
    row = decontaminate(train, bench, k=8).first()
    assert row["overlap_ngrams"] == 1


# ------------------------------------------------------------- BPE tokens


def test_bpe_token_count_segments(spark):
    """Known segmentations of the GPT-2-style pre-tokenizer pattern."""
    from ligra_spark.functions.text import with_bpe_token_count

    rows = [
        (0, "it's fine"),  # it / 's / ' fine' -> 3
        (1, "hello world"),  # 2
        (2, "a 1234 b!"),  # 'a',' 1234',' b','!' -> 4
        (3, ""),  # 0
        (4, "x  y"),  # 'x',' ','y'? -> ' y' matches ' ?\p{L}+'; extra space -> 'x','\s','y'
    ]
    out = {r["doc_id"]: r for r in with_bpe_token_count(_docs(spark, rows)).collect()}
    assert out[0]["n_bpe_tokens"] == 3
    assert out[1]["n_bpe_tokens"] == 2
    assert out[2]["n_bpe_tokens"] == 4
    assert out[3]["n_bpe_tokens"] == 0 and out[3]["bpe_per_word"] == 0.0
    # "x  y": 'x', then ' ?\p{L}+' consumes ' y' after one residual space
    assert out[4]["n_bpe_tokens"] == 3
    assert out[1]["bpe_per_word"] == pytest.approx(1.0)


# ------------------------------------------------------------ HLL sketch


def test_hll_distinct_accuracy_and_determinism(spark):
    """Raw-HLL estimate within the textbook 1.04/sqrt(m) band at two
    register sizes, and identical across repartitionings (the register
    merge is associative — partition layout cannot change the result)."""
    import pyspark.sql.functions as F

    from ligra_spark.functions.sketches import hll_distinct

    n = 20000
    df = spark.range(n).select((F.col("id") * 13 + 5).alias("v"), F.lit("g").alias("g"))
    for b, tol in ((6, 0.40), (10, 0.11)):  # 3x the 1.04/sqrt(m) sigma
        est = hll_distinct(df, ["g"], "v", b=b).first()["hll_distinct"]
        assert abs(est - n) / n < tol, (b, est)
    e1 = hll_distinct(df.repartition(1), ["g"], "v", b=8).first()["hll_distinct"]
    e17 = hll_distinct(df.repartition(17, "v"), ["g"], "v", b=8).first()["hll_distinct"]
    assert e1 == e17


def test_hll_duplicates_do_not_inflate(spark):
    import pyspark.sql.functions as F

    from ligra_spark.functions.sketches import hll_distinct

    base = spark.range(500).select((F.col("id")).alias("v"), F.lit("g").alias("g"))
    dup = base.unionAll(base).unionAll(base)
    a = hll_distinct(base, ["g"], "v", b=6).first()["hll_distinct"]
    b_ = hll_distinct(dup, ["g"], "v", b=6).first()["hll_distinct"]
    assert a == b_


def test_hll_b_guard(spark):
    import pyspark.sql.functions as F
    import pytest

    from ligra_spark.functions.sketches import hll_distinct

    df = spark.range(5).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    with pytest.raises(ValueError):
        hll_distinct(df, ["g"], "v", b=3)
