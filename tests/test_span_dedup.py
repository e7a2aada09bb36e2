"""Shared-span detection (functions/span_dedup.py): handcrafted span
layouts, diagonal/run semantics, boilerplate cap."""


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): (r["max_span_tokens"], r["n_matching_grams"])
        for r in df.collect()
    }


def test_basic_shared_span(spark):
    from ligra_spark.functions.span_dedup import shared_span_pairs

    rows = [
        (0, "a b c d e f g h i j k l"),
        (1, "x x a b c d e f g h i j z z"),  # shares the 10-token run a..j
        (2, "q w e r t y u i"),  # no 4-gram in common
    ]
    got = _pairs(shared_span_pairs(_docs(spark, rows), k=4))
    # a..j = 10 tokens -> 7 matching 4-grams on one diagonal
    assert got == {(0, 1): (10, 7)}


def test_two_separate_spans_same_pair(spark):
    from ligra_spark.functions.span_dedup import shared_span_pairs

    rows = [
        (0, "a b c d QQ e f g h"),
        (1, "a b c d ZZ e f g h"),  # two 4-token spans, broken middle
    ]
    got = _pairs(shared_span_pairs(_docs(spark, rows), k=4))
    # each span contributes exactly one 4-gram; same diagonal but
    # non-consecutive positions -> two runs of 1, max span 4
    assert got == {(0, 1): (4, 2)}


def test_repeated_token_diagonals(spark):
    from ligra_spark.functions.span_dedup import shared_span_pairs

    rows = [(3, "p p p p p"), (4, "p p p p")]
    got = _pairs(shared_span_pairs(_docs(spark, rows), k=2))
    # best diagonal aligns the full shorter doc: run 3 -> span 4
    assert got[(3, 4)][0] == 4


def test_min_span_filter(spark):
    from ligra_spark.functions.span_dedup import shared_span_pairs

    rows = [
        (0, "a b c d e f g h i j k l"),
        (1, "x x a b c d e f g h i j z z"),
        (5, "m m c d e f n n o p q r"),  # only a 4-token overlap with 0
    ]
    df = shared_span_pairs(_docs(spark, rows), k=4, min_span_tokens=8)
    got = _pairs(df)
    assert (0, 1) in got and (0, 5) not in got


def test_boilerplate_cap_drops_ubiquitous_grams(spark):
    from ligra_spark.functions.span_dedup import shared_span_pairs

    boiler = "copyright footer all rights reserved"
    rows = [(i, f"u{i} v{i} {boiler}") for i in range(6)]
    # the boilerplate 4-grams appear in 6 docs; cap 4 drops them all
    got = _pairs(shared_span_pairs(_docs(spark, rows), k=4, max_gram_docs=4))
    assert got == {}
    # with the cap lifted every pair is reported
    got2 = _pairs(shared_span_pairs(_docs(spark, rows), k=4, max_gram_docs=64))
    assert len(got2) == 15 and all(v[0] == 5 for v in got2.values())
