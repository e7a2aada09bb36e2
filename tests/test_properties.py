"""Property-based tests (hypothesis) for the numpy-level kernels the
engine and fixtures depend on: edge symmetrization/dedup (including
the 2^32 packing boundary), CSR round-trips, and the clique expansion.
All pure numpy — no Spark session, so the whole file runs in seconds.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ligra_spark.adjacency import csr_to_edges, edges_to_csr
from ligra_spark.rmat import dedup_edges, make_symmetric
from ligra_spark.sources.convert import clique_expand

# ids straddling the 32-bit packing boundary exercise both the packed
# fast path and the np.unique fallback of make_symmetric/dedup_edges
_small_ids = st.integers(min_value=0, max_value=50)
_wide_ids = st.one_of(
    st.integers(min_value=0, max_value=50),
    st.integers(min_value=(1 << 32) - 2, max_value=(1 << 32) + 50),
)


def _edge_lists(ids):
    return st.lists(st.tuples(ids, ids), min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_edge_lists(_wide_ids))
def test_make_symmetric_equals_set_semantics(pairs):
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    s, d = make_symmetric(src, dst)
    got = set(zip(s.tolist(), d.tolist()))
    want = set()
    for u, v in pairs:
        if u != v:
            want.add((u, v))
            want.add((v, u))
    assert got == want
    # output is itself duplicate-free and sorted by (src, dst)
    assert len(s) == len(got)
    order = np.lexsort((d, s))
    assert (order == np.arange(len(s))).all()


@settings(max_examples=200, deadline=None)
@given(_edge_lists(_wide_ids))
def test_dedup_edges_equals_unique_pairs(pairs):
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    s, d = dedup_edges(src, dst)
    assert set(zip(s.tolist(), d.tolist())) == set(pairs)
    assert len(s) == len(set(pairs))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=40), _edge_lists(_small_ids))
def test_csr_roundtrip(n, pairs):
    pairs = [(u % n, v % n) for u, v in pairs]
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    offsets, targets = edges_to_csr(n, src, dst)
    s2, d2 = csr_to_edges(n, offsets, targets)
    # CSR keeps the multiset (duplicates preserved), grouped by src
    assert sorted(zip(s2.tolist(), d2.tolist())) == sorted(pairs)
    assert (np.diff(offsets) >= 0).all() and len(offsets) == n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 8)),
        min_size=0,
        max_size=30,
        unique=True,
    )
)
def test_clique_expand_counts(inc):
    v = np.array([p[1] for p in inc], dtype=np.int64)
    h = np.array([p[0] for p in inc], dtype=np.int64)
    s, d = clique_expand(v, h)
    # per hyperedge of degree l: exactly l*(l-1) ordered pairs, none
    # of them self-pairs, all within the hyperedge's pin set
    from collections import Counter

    degs = Counter(h.tolist())
    assert len(s) == sum(l * (l - 1) for l in degs.values())
    pins = {}
    for hh, vv in zip(h.tolist(), v.tolist()):
        pins.setdefault(hh, set()).add(vv)
    want = Counter()
    for hh, ps in pins.items():
        for a in ps:
            for b in ps:
                if a != b:
                    want[(a, b)] += 1
    assert Counter(zip(s.tolist(), d.tolist())) == want
