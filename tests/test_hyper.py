"""Hypergraph engine tests: HyperBFS / HyperCC / HyperPageRank /
HyperKCore / HyperSSSP vs numpy bipartite oracles (reference
semantics: ``apps/hyper/HyperBFS.C``, ``HyperCC.C``,
``HyperPageRank.C``, ``HyperKCore.C``, ``HyperSSSP.C`` — race-free
invariants: bipartite levels, fixpoint min-labels, mass iteration,
sequential-dense peel, min-dist relaxation)."""

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


def test_hyper_pagerank_mass(hg, incidence):
    """HyperPageRank vs a numpy transcription of the reference's
    iteration (``apps/hyper/HyperPageRank.C:107-113``): reset pH,
    pH[h] += pV[v]/degV(v), reset pV, pV[v] += pH[h]/degH(h),
    pV = d*pV + (1-d)/nv."""
    from ligra_spark.apps import hyper_pagerank

    v, h = incidence
    degv = np.bincount(v, minlength=NV).astype(np.float64)
    degh = np.bincount(h, minlength=NH).astype(np.float64)
    damping, iters = 0.85, 5
    pv = np.full(NV, 1.0 / NV)
    ph = np.zeros(NH)
    for _ in range(iters):
        ph = np.zeros(NH)
        np.add.at(ph, h, pv[v] / degv[v])
        pv = np.zeros(NV)
        np.add.at(pv, v, ph[h] / degh[h])
        pv = damping * pv + (1.0 - damping) / NV
    out, ran = hyper_pagerank(hg, max_iters=iters, damping=damping)
    assert ran == iters
    rows = out.collect()
    assert len(rows) == NV + NH
    got_v = {r["id"]: r["rank"] for r in rows if r["kind"] == "v"}
    got_h = {r["id"]: r["rank"] for r in rows if r["kind"] == "h"}
    for i in range(NV):
        assert got_v[i] == pytest.approx(pv[i], abs=1e-9)
    for j in range(NH):
        assert got_h[j] == pytest.approx(ph[j], abs=1e-9)


def test_hyper_kcore_cores(hg, incidence):
    """HyperKCore vs a sequential transcription of the peel loop
    (``apps/hyper/HyperKCore.C:104-131``): remove deg<k vertices at
    core k-1, kill touched live hyperedges, decrement surviving
    members clamped at k-1 (``Update_Deg`` cond ``Degrees[d]>=k``)."""
    from ligra_spark.apps import hyper_kcore

    v, h = incidence
    hedges_of = {}
    members = {}
    for vv, hh in zip(v.tolist(), h.tolist()):
        hedges_of.setdefault(vv, []).append(hh)
        members.setdefault(hh, []).append(vv)
    deg = np.bincount(v, minlength=NV).astype(np.int64)
    core = np.full(NV, -1, dtype=np.int64)
    dead = np.zeros(NH, dtype=bool)
    k, active = 1, set(range(NV))
    while active:
        rm = sorted(u for u in active if deg[u] < k)
        if not rm:
            k += 1
            continue
        for u in rm:
            core[u] = k - 1
            deg[u] = k - 1
            active.discard(u)
        newly = sorted(
            {hh for u in rm for hh in hedges_of.get(u, []) if not dead[hh]}
        )
        cnt = np.zeros(NV, dtype=np.int64)
        for hh in newly:
            dead[hh] = True
            for u in members[hh]:
                cnt[u] += 1
        for u in active:
            deg[u] = max(deg[u] - cnt[u], k - 1)
    out, _ = hyper_kcore(hg)
    got = {r["id"]: r["core"] for r in out.collect()}
    assert len(got) == NV
    for i in range(NV):
        assert got[i] == core[i], (i, got[i], core[i])


@pytest.fixture(scope="module")
def whg(spark, incidence):
    """Weighted hypergraph: per-pin weight (v*7 + h*13) % 10 + 1,
    used in both directions (``WeightedHyperReader.C`` semantics)."""
    from ligra_spark.hygra import HyperGraph
    import pandas as pd

    v, h = incidence
    w = (v * 7 + h * 13) % 10 + 1
    inc = spark.createDataFrame(
        pd.DataFrame({"vertex": v, "hedge": h, "w": w})
    )
    return HyperGraph.from_incidence(spark, inc, nv=NV, nh=NH, weight_col="w")


def test_hyper_sssp_dists(whg, incidence):
    """HyperSSSP vs a numpy Bellman-Ford fixpoint over the weighted
    bipartite expansion (``apps/hyper/HyperSSSP.C:60-100``): the
    converged writeMin distances are bipartite shortest paths."""
    from ligra_spark.apps import hyper_sssp

    v, h = incidence
    w = ((v * 7 + h * 13) % 10 + 1).astype(np.int64)
    INF = np.iinfo(np.int64).max // 4
    dv = np.full(NV, INF)
    dh = np.full(NH, INF)
    dv[0] = 0
    changed = True
    while changed:
        changed = False
        # simple per-pin relaxation to fixpoint (small fixture)
        for vv, hh, ww in zip(v.tolist(), h.tolist(), w.tolist()):
            if dv[vv] + ww < dh[hh]:
                dh[hh] = dv[vv] + ww
                changed = True
            if dh[hh] + ww < dv[vv]:
                dv[vv] = dh[hh] + ww
                changed = True
    out, _ = hyper_sssp(whg, root=0)
    rows = out.collect()
    got_v = {r["id"]: r["dist"] for r in rows if r["kind"] == "v"}
    got_h = {r["id"]: r["dist"] for r in rows if r["kind"] == "h"}
    exp_v = {i: int(dv[i]) for i in range(NV) if dv[i] < INF}
    exp_h = {j: int(dh[j]) for j in range(NH) if dh[j] < INF}
    assert got_v == exp_v
    assert got_h == exp_h


def test_hyper_mis_flags(hg, incidence):
    """HyperMIS vs a sequential transcription of the Beame-Luby loop
    (``apps/hyper/HyperMIS.C:119-160``) using the same bit-exact
    ``hashInt`` sampling — flags must match EXACTLY (round numbers
    included) — plus the independence invariant: no live hyperedge
    fully inside the set."""
    from ligra_spark.apps import hyper_mis
    from ligra_spark.hashing import hash_int64

    v, h = incidence
    inc = set(zip(v.tolist(), h.tolist()))
    flags = np.zeros(NV, dtype=np.int64)
    processed, r = 0, 1
    while (flags == 0).any() and r < 300:
        r += 1
        und = np.nonzero(flags == 0)[0]
        tent = set(
            int(i)
            for i in und
            if int(hash_int64(np.uint64(i + processed))[()]) % 3 == 0
        )
        processed += len(und)
        members = {}
        for vv, hh in inc:
            members.setdefault(hh, set()).add(vv)
        full = {hh for hh, mem in members.items() if mem <= tent}
        vetoed = set().union(*(members[hh] for hh in full)) if full else set()
        in_new = tent - vetoed
        inc = {(vv, hh) for vv, hh in inc if vv not in in_new}
        pmem = {}
        for vv, hh in inc:
            pmem.setdefault(hh, set()).add(vv)
        forced = {next(iter(mem)) for mem in pmem.values() if len(mem) == 1}
        inc = {(vv, hh) for vv, hh in inc if len(pmem[hh]) >= 2}
        for u in in_new:
            flags[u] = r
        for u in forced:
            if flags[u] == 0:
                flags[u] = 1
    out, rounds = hyper_mis(hg)
    got = {row["id"]: row["flag"] for row in out.collect()}
    assert len(got) == NV
    for i in range(NV):
        assert got[i] == flags[i], (i, got[i], flags[i])
    # independence: no ORIGINAL hyperedge has all members in the MIS
    in_set = {i for i in range(NV) if flags[i] > 1}
    omem = {}
    for vv, hh in zip(v.tolist(), h.tolist()):
        omem.setdefault(hh, set()).add(vv)
    for hh, mem in omem.items():
        assert not (mem <= in_set), (hh, mem)


def test_hyper_bpath_levels(spark, incidence):
    """B-path BFS (``apps/hyper/HyperBPath.C:27-80``) on a DIRECTED
    hypergraph: hyperedges activate when ALL in-pins are visited,
    then scatter to their out-pins.  In-pins are folded into a small
    vertex range (0..7) so multi-pin activation actually happens; a
    single-in-pin bootstrap hyperedge at id NH-4 makes the traversal
    leave the root (B-path from a singleton root is otherwise stuck)."""
    import pandas as pd

    from ligra_spark.apps import hyper_bpath
    from ligra_spark.hygra import HyperGraph

    v, h = incidence
    boot = NH - 4  # empty slot in the undirected fixture
    in_v = np.concatenate([(v % 8), [0]])
    in_h = np.concatenate([h, [boot]])
    out_v = np.concatenate([v, [1, 2, 3]])
    out_h = np.concatenate([h, [boot, boot, boot]])

    def _dedup(a, b):
        pairs = sorted(set(zip(a.tolist(), b.tolist())))
        return pairs

    inp = _dedup(in_v, in_h)
    outp = _dedup(out_v, out_h)
    hg = HyperGraph.from_directed_incidence(
        spark,
        spark.createDataFrame(pd.DataFrame(inp, columns=["vertex", "hedge"])),
        spark.createDataFrame(pd.DataFrame(outp, columns=["vertex", "hedge"])),
        nv=NV, nh=NH,
    )
    # numpy oracle: exact transcription of the counter semantics
    need = np.zeros(NH, dtype=np.int64)
    in_pins_of_h, out_pins_of_h, hedges_of_v = {}, {}, {}
    for vv, hh in inp:
        need[hh] += 1
        in_pins_of_h.setdefault(hh, []).append(vv)
        hedges_of_v.setdefault(vv, []).append(hh)
    for vv, hh in outp:
        out_pins_of_h.setdefault(hh, []).append(vv)
    lvl_v = np.full(NV, -1, dtype=np.int64)
    lvl_h = np.full(NH, -1, dtype=np.int64)
    lvl_v[0] = 0
    frontier, t = [0], 0
    while frontier:
        t += 1
        new_h = []
        for u in frontier:
            for hh in hedges_of_v.get(u, ()):
                if lvl_h[hh] < 0:
                    need[hh] -= 1
                    if need[hh] == 0:
                        lvl_h[hh] = t
                        new_h.append(hh)
        if not new_h:
            break
        t += 1
        frontier = []
        for hh in new_h:
            for u in out_pins_of_h.get(hh, ()):
                if lvl_v[u] < 0:
                    lvl_v[u] = t
                    frontier.append(u)
    out, _ = hyper_bpath(hg, root=0)
    got = {(r["kind"], r["id"]): r["level"] for r in out.collect()}
    exp = {("v", i): int(lvl_v[i]) for i in range(NV) if lvl_v[i] >= 0}
    exp.update({("h", j): int(lvl_h[j]) for j in range(NH) if lvl_h[j] >= 0})
    assert got == exp
    # the bootstrap worked: traversal left the root
    assert len(exp) > 1


def test_hyper_kcore_efficient_cores(hg, incidence):
    """HyperKCore-Efficient vs a sequential transcription of the
    Julienne bucket loop (``apps/hyper/HyperKCore-Efficient.C:24-63``):
    peel the smallest bucket k (coreness k), kill touched live
    hyperedges, move each surviving member with D>k to bucket
    ``max(D - newly_dead_incident, k)`` (``apply_f``)."""
    from ligra_spark.apps import hyper_kcore, hyper_kcore_efficient

    v, h = incidence
    hedges_of, members = {}, {}
    for vv, hh in zip(v.tolist(), h.tolist()):
        hedges_of.setdefault(vv, []).append(hh)
        members.setdefault(hh, []).append(vv)
    D = np.bincount(v, minlength=NV).astype(np.int64)
    dead = np.zeros(NH, dtype=bool)
    live = set(range(NV))
    while live:
        k = min(D[u] for u in live)
        rm = sorted(u for u in live if D[u] == k)
        live -= set(rm)
        newly = sorted(
            {hh for u in rm for hh in hedges_of.get(u, []) if not dead[hh]}
        )
        cnt = np.zeros(NV, dtype=np.int64)
        for hh in newly:
            dead[hh] = True
            for u in members[hh]:
                cnt[u] += 1
        for u in live:
            if D[u] > k:
                D[u] = max(D[u] - cnt[u], k)
    out, _ = hyper_kcore_efficient(hg)
    got = {r["id"]: r["core"] for r in out.collect()}
    assert len(got) == NV
    for i in range(NV):
        assert got[i] == D[i], (i, got[i], D[i])
    # both reference variants compute the same coreness
    peel = {r["id"]: r["core"] for r in hyper_kcore(hg)[0].collect()}
    assert got == peel


def test_hyper_bc_deps(hg, incidence):
    """HyperBC vs a sequential transcription of the C code
    (``apps/hyper/HyperBC.C:106-178``) including the visited-flag
    ordering: forward sigma half-steps with per-half-step marking,
    then backward dependency accumulation where hyperedges one level
    past the deepest vertex level receive (but never propagate)."""
    from collections import defaultdict

    from ligra_spark.apps import hyper_bc

    v, h = incidence
    vh, hv = defaultdict(list), defaultdict(list)
    for vv, hh in zip(v.tolist(), h.tolist()):
        vh[vv].append(hh)
        hv[hh].append(vv)
    sigv = np.zeros(NV)
    sigh = np.zeros(NH)
    visv = np.zeros(NV, dtype=bool)
    vish = np.zeros(NH, dtype=bool)
    sigv[0] = 1.0
    visv[0] = True
    levels, frontier, rnd = [[0]], [0], 0
    while True:
        rnd += 1
        msgs = defaultdict(float)
        for u in frontier:
            for hh in vh.get(u, ()):
                if not vish[hh]:
                    msgs[hh] += sigv[u]
        newh = sorted(msgs)
        for hh in newh:
            sigh[hh] += msgs[hh]
            vish[hh] = True
        levels.append(newh)
        if not newh:
            break
        rnd += 1
        msgs = defaultdict(float)
        for hh in newh:
            for u in hv[hh]:
                if not visv[u]:
                    msgs[u] += sigh[hh]
        newv = sorted(msgs)
        for u in newv:
            sigv[u] += msgs[u]
            visv[u] = True
        levels.append(newv)
        if not newv:
            break
        frontier = newv
    if rnd % 2 == 0:
        rnd -= 1  # ended on empty vertex frontier; drop deepest hyperedge level
    # Levels[rnd] "deleted": never marked/processed in the backward pass
    depv, deph = np.zeros(NV), np.zeros(NH)
    visv[:] = False
    vish[:] = False
    for r in range(rnd - 1, 0, -2):
        for u in levels[r]:
            visv[u] = True
            depv[u] += 1.0
        for u in levels[r]:
            for hh in vh.get(u, ()):
                if not vish[hh]:
                    deph[hh] += depv[u] / sigv[u]
        for hh in levels[r - 1]:
            vish[hh] = True
        for hh in levels[r - 1]:
            for u in hv[hh]:
                if not visv[u]:
                    depv[u] += deph[hh] * sigv[u]
    out, _ = hyper_bc(hg, root=0)
    rows = out.collect()
    assert len(rows) == NV + NH
    got_v = {r["id"]: r["dep"] for r in rows if r["kind"] == "v"}
    got_h = {r["id"]: r["dep"] for r in rows if r["kind"] == "h"}
    for i in range(NV):
        assert got_v[i] == pytest.approx(depv[i], abs=1e-9), (i, got_v[i], depv[i])
    for j in range(NH):
        assert got_h[j] == pytest.approx(deph[j], abs=1e-9), (j, got_h[j], deph[j])
    # the traversal was nontrivial
    assert sum(1 for x in depv if x > 0) > 1
