"""Hypergraph engine tests: HyperBFS / HyperCC vs numpy bipartite
oracles (reference semantics: ``apps/hyper/HyperBFS.C``,
``apps/hyper/HyperCC.C`` — race-free invariants: bipartite levels and
fixpoint min-labels)."""

import numpy as np
import pytest

from ligra_spark.fixtures import sample_graph_edges


NV, NH = 50, 24  # nh > max hedge id used -> exercises empty-hyperedge slots


@pytest.fixture(scope="module")
def incidence():
    """Deterministic incidence pairs derived from the reference sample
    graph: vertex = src % NV, hedge = dst % (NH - 4) (leaving 4 empty
    hyperedge slots)."""
    _, src, dst = sample_graph_edges()
    v = (src % NV).astype(np.int64)
    h = (dst % (NH - 4)).astype(np.int64)
    pairs = sorted(set(zip(v.tolist(), h.tolist())))
    return np.array([p[0] for p in pairs]), np.array([p[1] for p in pairs])


@pytest.fixture(scope="module")
def hg(spark, incidence):
    from ligra_spark.hygra import HyperGraph

    v, h = incidence
    import pandas as pd

    inc = spark.createDataFrame(pd.DataFrame({"vertex": v, "hedge": h}))
    return HyperGraph.from_incidence(spark, inc, nv=NV, nh=NH)


def _bip_adj(v, h):
    """Bipartite adjacency: nodes 0..NV-1 vertices, NV..NV+NH-1 edges."""
    src = np.concatenate([v, NV + h])
    dst = np.concatenate([NV + h, v])
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    off = np.searchsorted(s, np.arange(NV + NH + 1))
    return s, d, off


def test_hyper_bfs_levels(hg, incidence):
    from ligra_spark.apps import hyper_bfs

    v, h = incidence
    s, d, off = _bip_adj(v, h)
    lvl = np.full(NV + NH, -1, dtype=np.int64)
    lvl[0] = 0
    frontier, r = [0], 0
    while frontier:
        r += 1
        nxt = []
        for u in frontier:
            for w in d[off[u]: off[u + 1]]:
                if lvl[w] < 0:
                    lvl[w] = r
                    nxt.append(w)
        frontier = nxt
    out, _ = hyper_bfs(hg, root=0)
    got = {("v" if r["kind"] == "v" else "h", r["id"]): r["level"] for r in out.collect()}
    exp = {}
    for node in range(NV + NH):
        if lvl[node] >= 0:
            kind, nid = ("v", node) if node < NV else ("h", node - NV)
            exp[(kind, nid)] = int(lvl[node])
    assert got == exp


def test_hyper_cc_labels(hg, incidence):
    from ligra_spark.apps import hyper_cc

    v, h = incidence
    s, d, off = _bip_adj(v, h)
    lab = np.arange(NV + NH, dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, d, lab[s])
        if np.array_equal(new, lab):
            break
        lab = new
    out, _ = hyper_cc(hg)
    rows = out.collect()
    assert len(rows) == NV + NH
    got_v = {r["id"]: r["label"] for r in rows if r["kind"] == "v"}
    got_h = {r["id"]: r["label"] for r in rows if r["kind"] == "h"}
    for i in range(NV):
        assert got_v[i] == lab[i], (i, got_v[i], lab[i])
    members = set(h.tolist())
    for j in range(NH):
        if j in members:
            assert got_h[j] == lab[NV + j]
        else:
            assert got_h[j] is None  # untouched UINT_E_MAX slot


def test_hyper_cc_matches_plain_cc_projection(hg, incidence):
    """Two vertices sharing a hyperedge are in one component — the
    vertex labels must equal plain CC over the clique expansion."""
    from ligra_spark.apps import hyper_cc

    v, h = incidence
    # union-find over the clique expansion
    parent = list(range(NV))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    by_h = {}
    for vv, hh in zip(v.tolist(), h.tolist()):
        by_h.setdefault(hh, []).append(vv)
    for mem in by_h.values():
        for other in mem[1:]:
            ra, rb = find(mem[0]), find(other)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for i in range(NV):
        comp_min.setdefault(find(i), []).append(i)
    expect = {i: min(comp_min[find(i)]) for i in range(NV)}
    out, _ = hyper_cc(hg)
    got = {r["id"]: r["label"] for r in out.collect() if r["kind"] == "v"}
    assert got == expect
