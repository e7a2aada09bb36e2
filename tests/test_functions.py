"""Invariant tests for the pipeline function library (value-level
cross-checks against DuckDB run in tools/check_entry.py; these pin
engine-independent properties)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),      # exact dup of 0
        (2, "the quick brown fox jumps over a lazy cat today"),  # near dup
        (3, "completely different content about spark engines"),
        (4, ""),                                                  # empty
        (5, "  the   quick  brown fox jumps over the lazy dog "),# ws-variant of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    from ligra_spark.functions import exact_duplicates

    out = {r["keep_id"]: r["copies"] for r in exact_duplicates(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 identical
    assert out[3] == 1


def test_fingerprint_normalizes_whitespace(docs):
    from ligra_spark.functions import with_fingerprint

    fp = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[5]  # whitespace-insensitive
    assert fp[0] != fp[2]


def test_token_count_empty(docs):
    from ligra_spark.functions import with_token_count

    tc = {r["doc_id"]: r["n_tokens"] for r in with_token_count(docs).collect()}
    assert tc[4] == 0 and tc[0] == 9 and tc[5] == 9


def test_jaccard_pairs_symmetric_range(docs):
    from ligra_spark.functions import token_jaccard_pairs

    rows = token_jaccard_pairs(docs, threshold=0.0).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 <= r["jaccard"] <= 1.0
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert pairs[(0, 1)] == 1.0      # identical docs
    assert pairs[(0, 2)] > 0.5       # near-dup scores high
    assert (0, 3) not in pairs       # zero-overlap pairs never join


def test_minhash_identical_docs_share_signature(docs):
    from ligra_spark.functions import minhash_signatures

    sigs = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(8))
            for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1] == sigs[5]
    assert sigs[0] != sigs[3]
    assert 4 not in sigs  # empty doc: no shingles, no row


def test_lsh_pairs_catch_duplicates(docs):
    from ligra_spark.functions import lsh_candidate_pairs, minhash_signatures

    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_bands"]
        for r in lsh_candidate_pairs(minhash_signatures(docs), 8, 4).collect()
    }
    assert pairs[(0, 1)] == 4  # identical docs collide in every band
    assert (0, 3) not in pairs


def test_simhash_hamming(docs):
    from ligra_spark.functions import simhash16

    sh = {r["doc_id"]: r["simhash"] for r in simhash16(docs).collect()}
    assert sh[0] == sh[1] == sh[5]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[0], sh[2]) <= ham(sh[0], sh[3])


def test_lang_guess(spark):
    from ligra_spark.functions import with_lang_guess

    rows = spark.createDataFrame(
        [
            (0, "the cat and the hat of a house"),
            (1, "der hund und die katze das haus"),
            (2, "le chat et la maison les arbres"),
            (3, "el gato y los perros las casas"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_guess"] for r in with_lang_guess(rows).collect()}
    assert out == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_brute_force_vs_lsh_recall(spark):
    import numpy as np

    from ligra_spark.functions.similarity import brute_force_topk, lsh_bucket_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, probes, k=5).collect()
    approx = lsh_bucket_topk(emb, probes, k=5, bits=4, dim=16).collect()
    exact_set = {(r["probe_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["probe_id"], r["vec_id"]) for r in approx}
    # LSH returns a subset of correctly-ranked candidates with
    # nonzero recall (4-bit buckets on 200 vectors ≈ 12 per bucket)
    assert approx_set, "LSH returned no candidates"
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.1, recall
    for r in approx:
        assert r["rank"] >= 1


def test_lsh_neardup_pairs_exact_precision(spark):
    """Every emitted near-dup pair really is >= threshold (precision
    exact); the emitted set is a subset of the true pair set (recall
    < 1 allowed); planted near-duplicates are found."""
    import numpy as np
    from pyspark.sql import functions as F

    from ligra_spark.functions.similarity import lsh_neardup_pairs

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(120, 16)).astype("float32")
    # plant 10 near-dup pairs: vec[100+j] = vec[j] + tiny noise
    for j in range(10):
        vecs[100 + j] = vecs[j] + rng.normal(scale=0.01, size=16).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = lsh_neardup_pairs(emb, threshold=0.95, bits=4, dim=16, tables=3).collect()

    v = vecs.astype(np.float64)
    nrm = np.linalg.norm(v, axis=1)
    cos = (v @ v.T) / np.outer(nrm, nrm)
    true_pairs = {
        (a, b)
        for a in range(120)
        for b in range(a + 1, 120)
        if round(cos[a, b], 6) >= 0.95
    }
    got_pairs = {(r["a_id"], r["b_id"]) for r in got}
    assert got_pairs, "no near-dup pairs found"
    assert got_pairs <= true_pairs, got_pairs - true_pairs
    # 3-table OR-amplification on 4-bit buckets: planted twins
    # (cos ~0.9999) collide in at least one table w.h.p.
    assert len(got_pairs) >= 8, got_pairs
    for r in got:
        a, b = r["a_id"], r["b_id"]
        assert a < b
        assert abs(r["cos_sim"] - round(cos[a, b], 6)) < 1e-6


def test_ivf_topk_subset_and_recall(spark):
    """IVF results are a correctly-ranked subset of brute-force top-k
    with nonzero recall; every returned neighbor shares a probed
    cluster with its probe (the IVF contract)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ligra_spark.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(200, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, probes, k=5).collect()
    approx = ivf_topk(emb, probes, k=5, nlist=8, nprobe=3, dim=16).collect()
    exact_set = {(r["probe_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["probe_id"], r["vec_id"]) for r in approx}
    assert approx_set, "IVF returned no candidates"
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.2, recall
    # per-probe ranks are 1..n without gaps and cosine non-increasing
    by_probe = {}
    for r in approx:
        by_probe.setdefault(r["probe_id"], []).append((r["rank"], r["cos_sim"]))
    for pid, rs in by_probe.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        sims = [x[1] for x in rs]
        assert sims == sorted(sims, reverse=True)


def test_ivf_assignment_matches_numpy(spark):
    """Cluster assignment pins to a straight numpy argmin over the
    md5-derived codebook (ties by centroid id)."""
    import numpy as np

    from ligra_spark.functions.similarity import hyperplanes, ivf_assign_udf
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(50, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", ivf_assign_udf(8, 4, nprobe=1)(F.col("embedding")).getItem(0).alias("c")
        ).collect()
    }
    cents = np.array(hyperplanes(8, 4, 100), dtype=np.float64)
    v = vecs.astype(np.float64)
    d = (cents**2).sum(axis=1)[None, :] - 2.0 * (v @ cents.T)
    want = d.argmin(axis=1)
    assert got == {i: int(want[i]) for i in range(50)}


def test_asof_join_matches_python(spark):
    """asof_join pins to a straight python transcription, including
    the inclusive exact-timestamp match and no-match nulls."""
    from datetime import datetime, timedelta

    from ligra_spark.functions.temporal import asof_join

    t0 = datetime(2024, 1, 1)
    mk = lambda m: t0 + timedelta(minutes=m)
    left = spark.createDataFrame(
        [(1, 10, mk(5), 1.0), (2, 10, mk(10), 2.0), (3, 10, mk(2), 3.0),
         (4, 20, mk(7), 4.0), (5, 30, mk(9), 5.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(10, mk(3), 30.0), (10, mk(10), 31.0), (20, mk(1), 32.0), (20, mk(6), 33.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {r["event_id"]: (r["asof_ts"], r["asof_value"])
           for r in asof_join(left, right).collect()}
    assert got[1] == (mk(3), 30.0)     # most recent before 5 is 3
    assert got[2] == (mk(10), 31.0)    # EXACT timestamp matches (inclusive)
    assert got[3] == (None, None)      # earliest right row (min 3) is after min 2
    assert got[4] == (mk(6), 33.0)
    assert got[5] == (None, None)      # user 30 has no right rows


def test_range_join_matches_python(spark):
    """Binned range_join pins the half-open (ts, ts+W] interval,
    including rows in the NEXT time bucket and excluding exact-anchor
    and beyond-window rows."""
    from datetime import datetime, timedelta

    from ligra_spark.functions.temporal import range_join

    t0 = datetime(2024, 1, 1)
    mk = lambda s: t0 + timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, 7, mk(50)), (2, 7, mk(130)), (3, 8, mk(0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, mk(50), 1.0),   # exact anchor ts → excluded (strict >)
         (7, mk(51), 2.0),   # in (50, 110]
         (7, mk(110), 3.0),  # boundary: exactly +60 → included
         (7, mk(111), 4.0),  # beyond window of event 1; in window of none
         (7, mk(131), 5.0),  # in window of event 2
         (8, mk(60), 6.0)],  # boundary +60 AND next time bucket → found
        "user_id long, ts timestamp, value double",
    )
    got = sorted(
        (r["event_id"], r["win_value"])
        for r in range_join(left, right, window_s=60).collect()
    )
    assert got == [(1, 2.0), (1, 3.0), (2, 5.0), (3, 6.0)], got


def test_asof_join_null_payload_not_torn(spark):
    """A matched right row with a NULL payload must surface AS the
    match (null value, its own timestamp) — not be torn apart by
    per-column fills reaching back to an older non-null row."""
    from datetime import datetime, timedelta

    from ligra_spark.functions.temporal import asof_join

    t0 = datetime(2024, 1, 1)
    mk = lambda m: t0 + timedelta(minutes=m)
    left = spark.createDataFrame(
        [(1, 10, mk(5), 0.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [(10, mk(1), 5.0), (10, mk(2), None)],
        "user_id long, ts timestamp, value double",
    )
    r = asof_join(left, right).collect()[0]
    assert r["asof_ts"] == mk(2) and r["asof_value"] is None, r


def test_asof_join_chain_collision_raises(spark):
    from datetime import datetime

    from ligra_spark.functions.temporal import asof_join

    t0 = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, 1.0)], "user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [(1, t0, 2.0)], "user_id long, ts timestamp, value double"
    )
    once = asof_join(left, right)
    with pytest.raises(ValueError, match="prefix"):
        asof_join(once, right)


def test_corpus_prep_stage_semantics(docs):
    """Each composed stage does its job on constructed data: lang
    filter drops marker-free and empty docs, exact dedup keeps the min
    id of an identical-text class, LSH near-dedup drops the higher id
    of a whitespace-variant pair (identical token shingles => identical
    signatures => guaranteed band collision)."""
    from ligra_spark.functions import corpus_prep

    out = corpus_prep(docs, quality_min=0.3)
    rows = {r["doc_id"]: r for r in out.collect()}
    ids = set(rows)
    assert 0 in ids                      # class representative survives
    assert 1 not in ids                  # exact dup of 0 (min-id keeps 0)
    assert 5 not in ids                  # ws-variant: near-dup of 0, higher id
    assert 3 not in ids and 4 not in ids # 'und' language / empty
    assert ids <= {0, 2}
    r0 = rows[0]
    assert r0["lang_guess"] == "en" and r0["n_tokens"] == 9
    assert set(out.columns) == {
        "doc_id", "lang_guess", "n_tokens", "quality", "fingerprint"
    }


def test_corpus_prep_quality_threshold(docs):
    """quality_min above every doc's score yields an empty corpus."""
    from ligra_spark.functions import corpus_prep

    assert corpus_prep(docs, quality_min=0.99).count() == 0


def test_minhash_simhash_match_python_reference(spark):
    """Randomized differential test pinning the rewritten per-row
    kernels to a direct Python transcription of the spec: md5-based
    base hash, universal-hash mixes (minhash), distinct-token majority
    vote (simhash).  Covers empty / sub-shingle-length / repeated-token
    / multi-whitespace docs."""
    import hashlib
    import random
    import re

    from ligra_spark.functions import minhash_signatures, simhash16
    from ligra_spark.functions.dedup import _mix_consts

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [(0, ""), (1, "solo"), (2, "two tokens"), (3, "  spaced   out  x ")]
    for i in range(4, 64):
        n = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def h(s, seed):
        return int(hashlib.md5((f"s{seed}:" + s).encode()).hexdigest()[:8], 16)

    mixes = [_mix_consts(s) for s in range(8)]

    got_min = {
        r["doc_id"]: [r[f"h{s}"] for s in range(8)]
        for r in minhash_signatures(df, num_hashes=8, shingle_k=3).collect()
    }
    got_sim = {r["doc_id"]: r["simhash"] for r in simhash16(df).collect()}

    for i, t in rows:
        toks = re.split(r"\s+", t.strip()) if t.strip() else []
        sh = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        if not sh:
            assert i not in got_min, (i, t)
        else:
            base = [h(x, 0) for x in sh]
            exp = [min((a * v + b) % (1 << 32) for v in base) for a, b in mixes]
            assert got_min[i] == exp, (i, t)
        dtoks = list(dict.fromkeys(toks))
        if not dtoks:
            assert i not in got_sim, (i, t)
        else:
            hs = [h(x, 99) for x in dtoks]
            sim = sum(
                1 << b
                for b in range(16)
                if sum((v >> b) & 1 for v in hs) * 2 > len(dtoks)
            )
            assert got_sim[i] == sim, (i, t)


def test_neardup_clusters_family_closure(docs):
    """Exact copies + LSH-linked near-dups collapse into one cluster
    keyed by the min doc id; singletons keep themselves."""
    from ligra_spark.functions.dedup import lsh_candidate_pairs
    from ligra_spark.functions.dedup import minhash_signatures
    from ligra_spark.functions.dedup import neardup_clusters

    out = {r["doc_id"]: (r["cluster"], r["keep"]) for r in
           neardup_clusters(docs).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}

    # the cluster assignment must be the transitive closure of the LSH
    # candidate pairs (union-find over the same pairs the LSH stage emits)
    pairs = lsh_candidate_pairs(minhash_signatures(docs)).collect()
    parent = {i: i for i in out}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in out}
    assert {i: c for i, (c, _) in out.items()} == expected
    # exact dup family 0/1 must share a cluster rooted at 0; keeper flags
    assert out[0] == (0, 1) and out[1][0] == 0 and out[1][1] == 0
    # empty doc has no signature -> its own cluster, kept
    assert out[4] == (4, 1)


def test_neardup_clusters_transitive_chain(spark):
    """A family linked only pairwise (A~B, B~C) still collapses to one
    cluster — the star contraction closes transitivity."""
    from ligra_spark.apps.cc_star import two_phase_star_pairs
    from pyspark.sql import functions as F

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "u long, v long"
    )
    stars, rounds = two_phase_star_pairs(chain, 4)
    got = {(r["u"], r["v"]) for r in stars.collect()}
    assert got == {(2, 1), (3, 1), (4, 1), (11, 10)}
