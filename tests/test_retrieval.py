"""Inverted index + BM25 vs a pure-python reference on a tiny corpus."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, "cat dog cat"),
        (3, ""),
        (4, "mat mat mat dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index(docs):
    from ligra_spark.functions import inverted_index

    got = {
        r["term"]: (r["df"], list(r["postings"]))
        for r in inverted_index(docs, max_postings=2).collect()
    }
    assert got["cat"] == (2, [0, 2])
    assert got["the"] == (2, [0, 1])
    assert got["mat"] == (2, [0, 4])
    assert got["dog"] == (3, [1, 2])  # df untruncated, postings capped
    assert got["sat"] == (2, [0, 1])


def test_bm25_matches_python(docs):
    from ligra_spark.functions import bm25_scores

    corpus = {
        0: "the cat sat on the mat".split(),
        1: "the dog sat".split(),
        2: "cat dog cat".split(),
        3: [],
        4: "mat mat mat dog".split(),
    }
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    k1, b = 1.2, 0.75
    q = ["cat", "mat"]

    def score(d):
        s = 0.0
        for t in q:
            tf = corpus[d].count(t)
            if tf == 0:
                continue
            dfreq = sum(1 for v in corpus.values() if t in v)
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(corpus[d]) / avgdl))
        return s

    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, q).collect()}
    want = {d: score(d) for d in corpus if score(d) > 0}
    assert set(got) == set(want)
    for d in want:
        np.testing.assert_allclose(got[d], want[d], rtol=1e-12)


def test_stratified_sample_deterministic(spark):
    """Hash-gated sampling == the numpy hash_int32 membership rule,
    independent of partitioning; per-stratum dict drops unlisted
    strata."""
    import numpy as np

    from ligra_spark.functions import stratified_sample
    from ligra_spark.hashing import hash_int32

    n = 2000
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {"en": 0.5, "de": 0.125}
    got = {
        r["doc_id"]
        for r in stratified_sample(df, fr, key="lang", seed=7).collect()
    }
    mix = (7 * 0x9E3779B9) & 0xFFFFFFFF
    h = hash_int32((np.arange(n, dtype=np.uint64) + mix) & 0xFFFFFFFF)
    want = {
        i
        for i in range(n)
        if ["en", "de", "fr"][i % 3] in fr
        and h[i] < int(fr[["en", "de", "fr"][i % 3]] * (1 << 32))
    }
    assert got == want
    # repartitioning must not change membership
    got2 = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), fr, key="lang", seed=7).collect()
    }
    assert got2 == want
    # uniform-float form
    got3 = {r["doc_id"] for r in stratified_sample(df, 0.25, seed=7).collect()}
    want3 = {i for i in range(n) if h[i] < int(0.25 * (1 << 32))}
    assert got3 == want3
