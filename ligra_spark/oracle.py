"""Single-node numpy CSR oracle transcribing the reference apps' EXACT
semantics.  This is the correctness anchor for the Spark engine: every
distributed algorithm is differentially tested against these functions
on deterministic fixtures (tests/), and the frozen golden tables are
produced by them.

Each function documents the reference file:line whose semantics it
transcribes (semantics only — the implementation is fresh numpy).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "out_degrees",
    "pagerank",
    "pagerank_delta",
    "components",
    "label_propagation",
    "triangle_count",
    "bfs_levels",
    "kcore",
    "bellman_ford",
]


def out_degrees(n: int, src: np.ndarray) -> np.ndarray:
    return np.bincount(src, minlength=n).astype(np.int64)


def pagerank(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    max_iters: int = 100,
    damping: float = 0.85,
    epsilon: float = 1e-7,
) -> tuple[np.ndarray, int]:
    """PageRank, semantics of ``apps/PageRank.C:69-100``:

    p0 = 1/n; each round p_next[d] = damping * sum_{(s,d) in E}
    p_curr[s]/outdeg(s) + (1-damping)/n over ALL edges (duplicates
    count; dangling vertices' mass is simply lost — no redistribution);
    stop when L1(p_next - p_curr) < epsilon or after max_iters rounds.
    Returns (scores, rounds_run).
    """
    deg = out_degrees(n, src)
    p_curr = np.full(n, 1.0 / n, dtype=np.float64)
    const = (1.0 - damping) / n
    it = 0
    while it < max_iters:
        it += 1
        contrib = p_curr[src] / deg[src]  # deg>0 whenever src appears
        p_next = damping * np.bincount(dst, weights=contrib, minlength=n) + const
        l1 = np.abs(p_curr - p_next).sum()
        p_curr = p_next
        if l1 < epsilon:
            break
    return p_curr, it


def pagerank_delta(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    max_iters: int = 100,
    damping: float = 0.85,
    epsilon: float = 1e-7,
    epsilon2: float = 0.01,
) -> tuple[np.ndarray, int]:
    """PageRankDelta, semantics of ``apps/PageRankDelta.C:87-129``:

    state p=0, Delta=1/n, all vertices active.  Each round: nghSum[d] =
    sum over edges from ACTIVE s of Delta[s]/outdeg(s).  Round 1
    (``PR_Vertex_F_FirstRound``, :47-61): Delta = damping*nghSum +
    (1-damping)/n; p += Delta; Delta -= 1/n; active iff |Delta| >
    epsilon2 * p.  Later rounds (``PR_Vertex_F``, :63-75): Delta =
    damping*nghSum; active (and p += Delta) iff |Delta| > epsilon2*p.
    Stop when L1(Delta) < epsilon.  Returns (p, rounds_run).
    """
    deg = out_degrees(n, src)
    p = np.zeros(n, dtype=np.float64)
    delta = np.full(n, 1.0 / n, dtype=np.float64)
    active = np.ones(n, dtype=bool)
    one_over_n = 1.0 / n
    it = 0
    while it < max_iters:
        it += 1
        mask = active[src]
        ngh_sum = np.bincount(
            dst[mask], weights=delta[src[mask]] / deg[src[mask]], minlength=n
        )
        if it == 1:
            delta = damping * ngh_sum + (1.0 - damping) * one_over_n
            p = p + delta
            delta = delta - one_over_n
            active = np.abs(delta) > epsilon2 * p
        else:
            delta = damping * ngh_sum
            active = np.abs(delta) > epsilon2 * p
            p = np.where(active, p + delta, p)
        if np.abs(delta).sum() < epsilon:
            break
    return p, it


def components(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Connected components via min-label propagation to fixpoint
    (``apps/Components.C:52-68``).  Requires a symmetric edge table;
    the fixpoint label is the minimum vertex id in the component."""
    ids = np.arange(n, dtype=np.int64)
    while True:
        new = ids.copy()
        np.minimum.at(new, dst, ids[src])
        if np.array_equal(new, ids):
            return ids
        ids = new


def label_propagation(n: int, src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, int]:
    """Shortcutting label propagation (``apps/Components-Shortcut.C:
    61-81``, WSDM'18): min-label edge pass from active vertices + a
    pointer-jump ``IDs[i] = IDs[IDs[i]]``; a vertex stays active while
    its label changes.  Fixpoint equals `components`.  Returns
    (labels, rounds)."""
    ids = np.arange(n, dtype=np.int64)
    prev = ids.copy()
    active = np.ones(n, dtype=bool)
    rounds = 0
    while active.any():
        rounds += 1
        mask = active[src]
        np.minimum.at(ids, dst[mask], ids[src[mask]])
        ids = ids[ids]  # pointer jump (CC_Shortcut, :35-37)
        active = ids != prev
        prev = ids.copy()
    return ids, rounds


def triangle_count(n: int, src: np.ndarray, dst: np.ndarray) -> int:
    """Triangle count on a symmetric graph (``apps/Triangle.C:35-62``):
    for each edge (s,d) with s>d, count common neighbors c with
    c < d (< s); each triangle {x<y<z} is counted exactly once via the
    pair (z,y) with c=x."""
    # adjacency sets per vertex
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    total = 0
    adj = [d[offsets[i] : offsets[i + 1]] for i in range(n)]
    for ss, dd in zip(s, d):
        if ss > dd:
            A, B = adj[ss], adj[dd]
            A = A[A < dd]
            B = B[B < dd]
            total += np.intersect1d(A, B, assume_unique=True).size
    return int(total)


def bfs_levels(n: int, src: np.ndarray, dst: np.ndarray, root: int = 0) -> np.ndarray:
    """BFS level per vertex from root (-1 = unreachable).  Level sets
    are the race-free invariant of ``apps/BFS.C:42-53`` (parent ids are
    race-dependent, README note in SURVEY.md §2.4)."""
    levels = np.full(n, -1, dtype=np.int64)
    levels[root] = 0
    frontier = np.array([root], dtype=np.int64)
    lvl = 0
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    while frontier.size:
        lvl += 1
        nbrs = np.concatenate(
            [d[offsets[v] : offsets[v + 1]] for v in frontier]
        ) if frontier.size else np.empty(0, dtype=np.int64)
        nbrs = np.unique(nbrs)
        new = nbrs[levels[nbrs] < 0]
        levels[new] = lvl
        frontier = new
    return levels


def kcore(n: int, src: np.ndarray, dst: np.ndarray, max_k: int | None = None) -> np.ndarray:
    """Core numbers by iterative peeling (``apps/KCore.C:44-55``
    semantics; the fork caps ``max_k = min(n, 10)``, ``KCore.C:87`` —
    pass max_k=10 to reproduce that quirk).  Symmetric input."""
    deg = out_degrees(n, src).copy()
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    kmax = n if max_k is None else max_k
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    for k in range(1, kmax + 1):
        while True:
            peel = np.where(alive & (deg < k))[0]
            if peel.size == 0:
                break
            core[peel] = k - 1
            alive[peel] = False
            for v in peel:
                nb = d[offsets[v] : offsets[v + 1]]
                np.subtract.at(deg, nb[alive[nb]], 1)
        if not alive.any():
            break
    core[alive] = kmax
    return core


def bellman_ford(
    n: int, src: np.ndarray, dst: np.ndarray, weight: np.ndarray, root: int = 0
) -> np.ndarray:
    """SSSP, semantics of ``apps/BellmanFord.C:32-78``: writeMin
    relaxation from the improved frontier, at most n rounds.  Returns
    int64 distances (unreachable = max int sentinel, standing in for
    Ligra's INT_MAX init, :60)."""
    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, dtype=np.int64)
    dist[root] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[root] = True
    for _ in range(n):
        if not frontier.any():
            break
        mask = frontier[src]
        cand = dist.copy()
        np.minimum.at(cand, dst[mask], dist[src[mask]] + weight[mask])
        frontier = cand < dist
        dist = cand
    return dist


def bc_single_source(
    n: int, src: np.ndarray, dst: np.ndarray, root: int = 0
) -> np.ndarray:
    """Brandes single-source dependency scores, semantics of
    ``apps/BC.C:95-148``: forward level-BFS accumulating NumPaths
    (sigma), backward accumulation in inverse space over the transposed
    shortest-path DAG, final score = D'[v]*sigma[v] - 1 for reached
    vertices (``BC.C:143-145``); unreached vertices are NaN (Ligra's
    1/0 arithmetic) — we report them as 0 and exclude them in tests."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    levels = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.float64)
    levels[root], sigma[root] = 0, 1.0
    frontier = np.array([root], dtype=np.int64)
    level_sets = [frontier]
    lvl = 0
    while frontier.size:
        lvl += 1
        cand = {}
        for v in frontier:
            for w in d[offsets[v] : offsets[v + 1]]:
                if levels[w] < 0:
                    cand[w] = cand.get(w, 0.0) + sigma[v]
        nxt = np.array(sorted(cand), dtype=np.int64)
        for w in nxt:
            levels[w] = lvl
            sigma[w] = cand[w]
        frontier = nxt
        if nxt.size:
            level_sets.append(nxt)
    rounds = len(level_sets)
    with np.errstate(divide="ignore"):
        inv = np.where(sigma > 0, 1.0 / np.where(sigma > 0, sigma, 1), 0.0)
    D = np.zeros(n, dtype=np.float64)
    # backward (BC.C:124-138): descending levels; a level's vertices
    # first add 1/sigma, then pull D from their level+1 successors
    # along DAG edges (u->w with level[w] = level[u]+1)
    D[level_sets[rounds - 1]] += inv[level_sets[rounds - 1]]
    for r in range(rounds - 1, 0, -1):
        for u in level_sets[r - 1]:
            acc = 0.0
            for w in d[offsets[u] : offsets[u + 1]]:
                if levels[w] == r:
                    acc += D[w]
            D[u] += acc
        D[level_sets[r - 1]] += inv[level_sets[r - 1]]
    out = np.zeros(n, dtype=np.float64)
    reached = levels >= 0
    out[reached] = D[reached] * sigma[reached] - 1.0
    return out


def radii(n: int, src: np.ndarray, dst: np.ndarray, k: int = 64):
    """Multi-source radii estimate, semantics of ``apps/Radii.C:72-99``:
    sample min(n,64) sources v_i = hashInt(i) %% n, 64-bit visited
    masks, bitwise-OR propagation; radii[d] = last round d's mask grew
    (-1 for never-reached, 0 for sources).  Where the reference's init
    races on duplicate samples (last-writer ``NextVisited[v] = 1<<i``),
    we OR the bits (deterministic superset).  Returns (radii, rounds).
    """
    from .hashing import hash_int32

    kk = min(n, k)
    rad = np.full(n, -1, dtype=np.int64)
    visited = np.zeros(n, dtype=np.int64)
    nxt = np.zeros(n, dtype=np.int64)
    starts = []
    for i in range(kk):
        v = int(hash_int32(np.uint32(i))) % n
        rad[v] = 0
        bit = (1 << i) & 0xFFFFFFFFFFFFFFFF
        nxt[v] |= np.uint64(bit).astype(np.int64)
        starts.append(v)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    frontier = np.unique(np.array(starts, dtype=np.int64))
    rounds = 0
    while frontier.size:
        rounds += 1
        visited[frontier] = nxt[frontier]
        changed = set()
        for v in frontier:
            for w in d[offsets[v] : offsets[v + 1]]:
                to_write = visited[w] | visited[v]
                if visited[w] != to_write:
                    nxt[w] |= to_write
                    if rad[w] != rounds:
                        rad[w] = rounds
                        changed.add(int(w))
        frontier = np.array(sorted(changed), dtype=np.int64)
    return rad, rounds


def fm_masks(n: int, length: int = 2, seed: int = 0) -> np.ndarray:
    """Packed FM init masks (``FM-Ecc.C:81-85`` with a pinned seed):
    word j of vertex v = 1 << lowbit(hashInt(v*length + j + seed)),
    words packed into one int64 (32 bits per word, length <= 2)."""
    from .hashing import hash_int32

    idx = np.arange(n, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    for j in range(length):
        h = hash_int32((idx * length + j + seed).astype(np.uint32))
        low = h & (~h + np.uint32(1))
        pos = np.where(h == 0, 0, np.log2(np.maximum(low, 1).astype(np.float64))).astype(
            np.int64
        )
        out |= np.int64(1) << (pos + 32 * j)
    return out


def ecc_exact(
    n: int, src: np.ndarray, dst: np.ndarray, batch_size: int = 64
) -> tuple[np.ndarray, int]:
    """Exact eccentricity (``apps/eccentricity/kBFS-Exact.C:87-135``):
    every vertex is a BFS source in exactly one batch of
    ``batch_size`` consecutive ids; ecc[v] = max over reaching sources
    of dist(s, v) (0-init for never-reached, as the reference).
    Rounds per batch = last mask-change round + 1 (the empty closing
    superstep the wave loop runs to detect quiescence); returned total
    is the sum across batches."""
    ecc = np.zeros(n, dtype=np.int64)
    total_rounds = 0
    for start in range(0, n, batch_size):
        batch_max = 0
        for s in range(start, min(start + batch_size, n)):
            lv = bfs_levels(n, src, dst, root=s)
            reach = lv >= 0
            ecc[reach] = np.maximum(ecc[reach], lv[reach])
            if reach.any():
                batch_max = max(batch_max, int(lv[reach].max()))
        total_rounds += batch_max + 1
    return ecc, total_rounds


def ecc_kbfs(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    seed: int = 0,
    phase2_threshold: int | None = 1024,
) -> tuple[np.ndarray, int]:
    """Two-phase kBFS eccentricity (``kBFS-Ecc.C:110-290``;
    ``phase2_threshold=None`` = ``kBFS-1Phase-Ecc.C``), combined-run
    formulation: all components' waves in one pass, so rounds = (max
    wave depth + 1) per phase.  Size-1 components → 0, size-2 → 1;
    phase-1 sources per larger component = the DISTINCT positions
    ``hashInt(i + seed) %% size`` for i < min(size, 64); phase-2
    sources (components larger than the threshold) = the min(size, 64)
    members with highest phase-1 ecc, ties to larger id."""
    from .hashing import hash_int32

    comp = components(n, src, dst)
    ecc = np.zeros(n, dtype=np.int64)
    hvals = hash_int32(np.arange(64, dtype=np.uint32) + np.uint32(seed))

    def wave(source_ids: np.ndarray) -> tuple[np.ndarray, int]:
        e = np.zeros(n, dtype=np.int64)
        depth = -1
        for s in source_ids:
            lv = bfs_levels(n, src, dst, root=int(s))
            reach = lv >= 0
            e[reach] = np.maximum(e[reach], lv[reach])
            if reach.any():
                depth = max(depth, int(lv[reach].max()))
        # rounds = max wave depth + 1 (the closing no-change superstep)
        return e, (depth + 1 if len(source_ids) else 0)

    members_by_comp: dict[int, np.ndarray] = {}
    for c in np.unique(comp):
        members_by_comp[int(c)] = np.flatnonzero(comp == c)

    src1 = []
    for c, members in members_by_comp.items():
        size = len(members)
        if size == 1:
            continue
        if size == 2:
            ecc[members] = 1
            continue
        k = min(size, 64)
        idxs = sorted({int(hvals[i]) % size for i in range(k)})
        src1.extend(int(members[j]) for j in idxs)
    e1, r1 = wave(np.array(sorted(src1), dtype=np.int64))
    for c, members in members_by_comp.items():
        if len(members) > 2:
            ecc[members] = e1[members]

    r2 = 0
    if phase2_threshold is not None:
        src2 = []
        for c, members in members_by_comp.items():
            size = len(members)
            if size <= phase2_threshold:
                continue
            order = sorted(members, key=lambda v: (-ecc[v], -v))
            src2.extend(int(v) for v in order[: min(size, 64)])
        if src2:
            e2, r2 = wave(np.array(sorted(src2), dtype=np.int64))
            for c, members in members_by_comp.items():
                if len(members) > phase2_threshold:
                    ecc[members] = np.maximum(ecc[members], e2[members])
    return ecc, r1 + r2


def ecc_simple_approx(
    n: int, src: np.ndarray, dst: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, int]:
    """Simple 2-approx (``Simple-Approx-Ecc.C:122-154``) with the
    pinned pick: per component of size > 2, BFS from the member at
    position hashInt(seed) %% size (ascending-id order); every member
    gets that BFS's depth.  Returns (ecc, max depth + 1 across
    components — the combined-run supersteps)."""
    from .hashing import hash_int32

    comp = components(n, src, dst)
    ecc = np.zeros(n, dtype=np.int64)
    h = int(hash_int32(np.uint32(seed)))
    rounds = 0
    for c in np.unique(comp):
        members = np.flatnonzero(comp == c)
        size = len(members)
        if size == 1:
            continue
        if size == 2:
            ecc[members] = 1
            continue
        w = int(members[h % size])
        lv = bfs_levels(n, src, dst, root=w)
        ew = int(lv[members].max())
        ecc[members] = ew
        rounds = max(rounds, ew + 1)
    return ecc, rounds


def _rv_scaffold(n, src, dst, seed):
    """Shared RV/CLRSTV steps (see ``apps.ecc_rv``): per size>2
    component — hashInt positional samples (fallback + global cap),
    per-sample BFS, furthest-from-samples w, w-BFS, Ngh = first
    nghSize by (level, id), per-Ngh BFS.  Combined-run rounds."""
    from .apps.ecc_rv import _max_sample_size, _params
    from .hashing import hash_int32

    comp = components(n, src, dst)
    by_comp = {int(c): np.flatnonzero(comp == c) for c in np.unique(comp)}
    cap = _max_sample_size(n)
    h = hash_int32(np.arange(max(len(m) for m in by_comp.values()), dtype=np.uint32) + np.uint32(seed))
    h0 = int(hash_int32(np.uint32(seed)))

    samples, big = [], {}
    for c, members in by_comp.items():
        size = len(members)
        if size <= 2:
            continue
        big[c] = members
        _, ssize, _ = _params(size)
        picked = [int(members[i]) for i in range(size) if int(h[i]) % size < ssize]
        if not picked:
            picked = [int(members[h0 % size])]
        samples.extend(picked[:cap])
    if not samples:
        return comp, by_comp, None
    d1 = {s: bfs_levels(n, src, dst, root=s) for s in samples}
    r1 = 1 + max(int(lv[lv >= 0].max()) for lv in d1.values())
    sample_ecc = {s: int(lv[lv >= 0].max()) for s, lv in d1.items()}

    ws, wlv = {}, None
    wdist = np.full(n, -1, dtype=np.int64)
    rw = 0
    for c, members in big.items():
        mind = np.full(n, 1 << 30, dtype=np.int64)
        for s in samples:
            if comp[s] != c:
                continue
            mind[members] = np.minimum(mind[members], d1[s][members])
        w = int(max(members, key=lambda v: (mind[v], v)))
        ws[c] = w
        lv = bfs_levels(n, src, dst, root=w)
        wdist[members] = lv[members]
        rw = max(rw, 1 + int(lv[members].max()))
    w_ecc = {c: int(wdist[m].max()) for c, m in big.items()}

    nghs = {}
    for c, members in big.items():
        _, _, nsize = _params(len(members))
        order = sorted(members, key=lambda v: (wdist[v], v))
        nghs[c] = [int(v) for v in order[:nsize]]
    all_ngh = [v for lst in nghs.values() for v in lst]
    d2 = {v: bfs_levels(n, src, dst, root=v) for v in all_ngh}
    r2 = 1 + max(int(lv[lv >= 0].max()) for lv in d2.values())
    ngh_ecc = {v: int(lv[lv >= 0].max()) for v, lv in d2.items()}
    return comp, by_comp, (
        samples, d1, sample_ecc, ws, wdist, w_ecc, nghs, d2, ngh_ecc,
        r1 + rw + r2,
    )


def ecc_clrstv(
    n: int, src: np.ndarray, dst: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, int]:
    """CLRSTV (``CLRSTV.C:145-300``) with the pinned choices of
    ``apps.ecc_rv``: non-BFS'd v takes max over all BFS'd u of
    max(d(u,v), ecc(u) − d(u,v))."""
    comp, by_comp, sc = _rv_scaffold(n, src, dst, seed)
    ecc = np.zeros(n, dtype=np.int64)
    for c, members in by_comp.items():
        if len(members) == 2:
            ecc[members] = 1
    if sc is None:
        return ecc, 0
    samples, d1, sample_ecc, ws, wdist, w_ecc, nghs, d2, ngh_ecc, rounds = sc
    for c, members in by_comp.items():
        if len(members) <= 2:
            continue
        for v in members:
            v = int(v)
            if v in sample_ecc:
                ecc[v] = sample_ecc[v]
            elif v == ws[c]:
                ecc[v] = w_ecc[c]
            elif v in ngh_ecc:
                ecc[v] = ngh_ecc[v]
            else:
                best = max(wdist[v], w_ecc[c] - wdist[v])
                for s in samples:
                    if comp[s] != c:
                        continue
                    d = int(d1[s][v])
                    best = max(best, d, sample_ecc[s] - d)
                for u in nghs[c]:
                    d = int(d2[u][v])
                    best = max(best, d, ngh_ecc[u] - d)
                ecc[v] = best
    return ecc, rounds


def ecc_rv(
    n: int, src: np.ndarray, dst: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, int]:
    """RV (``RV.C:148-330``) with the pinned choices of
    ``apps.ecc_rv``: non-BFS'd v uses rv = max(max sample dist, d_w)
    and the path-recorded Ngh vertex vt (min-parent index
    propagation); ecc(v) = max(rv, ecc(vt)) when d(vt,v) <= d(vt,w),
    else max(rv, min sample ecc)."""
    comp, by_comp, sc = _rv_scaffold(n, src, dst, seed)
    ecc = np.zeros(n, dtype=np.int64)
    for c, members in by_comp.items():
        if len(members) == 2:
            ecc[members] = 1
    if sc is None:
        return ecc, 0
    samples, d1, sample_ecc, ws, wdist, w_ecc, nghs, d2, ngh_ecc, rounds = sc

    # wDist.second: min-parent propagation of the effective Ngh index
    order = np.lexsort((dst, src))
    s_e, d_e = src[order], dst[order]
    offsets = np.searchsorted(s_e, np.arange(n + 1, dtype=np.int64))
    sec = np.full(n, -1, dtype=np.int64)
    eff = np.full(n, -1, dtype=np.int64)
    ngh_idx = {}
    for c, lst in nghs.items():
        for j, v in enumerate(lst):
            ngh_idx[v] = j
    for c, members in by_comp.items():
        if len(members) <= 2:
            continue
        eff[ws[c]] = 0  # w is Ngh_s[0]
        maxlvl = int(wdist[members].max())
        for lvl in range(maxlvl):
            parents = [int(v) for v in members if wdist[v] == lvl]
            for p in parents:
                for child in d_e[offsets[p] : offsets[p + 1]]:
                    child = int(child)
                    if wdist[child] == lvl + 1:
                        if sec[child] < 0 or eff[p] < sec[child]:
                            sec[child] = eff[p]
            for v in members:
                if wdist[v] == lvl + 1:
                    eff[v] = ngh_idx.get(int(v), sec[v])

    for c, members in by_comp.items():
        if len(members) <= 2:
            continue
        min_r = min(sample_ecc[s] for s in samples if comp[s] == c)
        for v in members:
            v = int(v)
            if v in sample_ecc:
                ecc[v] = sample_ecc[v]
            elif v == ws[c]:
                ecc[v] = w_ecc[c]
            elif v in ngh_ecc:
                ecc[v] = ngh_ecc[v]
            else:
                rv = max(
                    max(int(d1[s][v]) for s in samples if comp[s] == c),
                    int(wdist[v]),
                )
                vt = nghs[c][sec[v]]
                if int(d2[vt][v]) <= int(d2[vt][ws[c]]):
                    ecc[v] = max(rv, ngh_ecc[vt])
                else:
                    ecc[v] = max(rv, min_r)
    return ecc, rounds


def ecc_tk(n: int, src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, int]:
    """Takes-Kosters exact eccentricity (``TK.C:74-206``): per
    component bound loop — odd iterations BFS from the argmax-upper
    vertex, even from argmin-lower (ties to largest id, the
    reference's rightmost-reduce over the ascending-id active list);
    v converges when lower == upper.  Returns (ecc, max per-component
    iteration count — the combined-run schedule)."""
    INF = (1 << 31) - 1
    comp = components(n, src, dst)
    ecc = np.zeros(n, dtype=np.int64)
    iters_max = 0
    for c in np.unique(comp):
        members = np.flatnonzero(comp == c)
        size = len(members)
        if size == 1:
            continue
        if size == 2:
            ecc[members] = 1
            continue
        W = list(members)
        lower = {int(v): 0 for v in W}
        upper = {int(v): INF for v in W}
        t = 0
        while W:
            t += 1
            if t % 2 == 1:
                w = max(W, key=lambda v: (upper[v], v))
            else:
                w = max(W, key=lambda v: (-lower[v], v))
            lv = bfs_levels(n, src, dst, root=int(w))
            ecc_w = int(lv[members].max())
            nw = []
            for v in W:
                d = int(lv[v])
                lower[v] = max(lower[v], ecc_w - d, d)
                upper[v] = min(upper[v], ecc_w + d)
                if lower[v] == upper[v]:
                    ecc[v] = lower[v]
                else:
                    nw.append(v)
            W = nw
        iters_max = max(iters_max, t)
    return ecc, iters_max


def ecc_fm(
    n: int, src: np.ndarray, dst: np.ndarray, length: int = 2, seed: int = 0
) -> tuple[np.ndarray, int]:
    """FM-sketch eccentricity (``apps/eccentricity/FM-Ecc.C:66-110``):
    OR-propagate the packed per-vertex FM masks; ecc[v] = last round
    v's mask grew (0 if never).  Same loop shape as :func:`radii` with
    every vertex a source of its own sketch.  Returns (ecc, rounds)."""
    ecc = np.zeros(n, dtype=np.int64)
    visited = np.zeros(n, dtype=np.int64)
    nxt = fm_masks(n, length, seed)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    frontier = np.arange(n, dtype=np.int64)
    rounds = 0
    while frontier.size:
        rounds += 1
        visited[frontier] = nxt[frontier]
        changed = set()
        for v in frontier:
            for w in d[offsets[v] : offsets[v + 1]]:
                to_write = visited[w] | visited[v]
                if visited[w] != to_write:
                    nxt[w] |= to_write
                    if ecc[w] != rounds:
                        ecc[w] = rounds
                        changed.add(int(w))
        frontier = np.array(sorted(changed), dtype=np.int64)
    return ecc, rounds


def loglog_masks(n: int, seed: int = 0) -> np.ndarray:
    """Packed LogLog init counters (``LogLog-Ecc.C:128-140`` with a
    pinned seed): register j (6 bits at offset 6j) = lowbit-position
    of hashInt64(v*10 + j + seed*10), 10 registers per vertex."""
    from .hashing import hash_int64

    idx = np.arange(n, dtype=np.uint64)
    out = np.zeros(n, dtype=np.int64)
    for j in range(10):
        h = hash_int64(idx * np.uint64(10) + np.uint64(j + seed * 10))
        low = h & (~h + np.uint64(1))
        pos = np.where(h == 0, 0, np.log2(np.maximum(low, 1).astype(np.float64))).astype(
            np.int64
        )
        out |= pos << (6 * j)
    return out


def _reg_max(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-register (6-bit lanes) max of packed counters — the
    deterministic twin of the broadword max (``LogLog-Ecc.C:40-57``)."""
    out = np.zeros_like(a)
    for j in range(10):
        ra = (a >> (6 * j)) & 63
        rb = (b >> (6 * j)) & 63
        out |= np.maximum(ra, rb) << (6 * j)
    return out


def ecc_loglog(
    n: int, src: np.ndarray, dst: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, int]:
    """LogLog-sketch eccentricity (``apps/eccentricity/LogLog-Ecc.C``):
    per-register-max propagation of the packed counters; ecc[v] = last
    round any register grew (Visited-gated — the deterministic
    superset of the reference's racy Next-gating, as in radii).
    Returns (ecc, rounds)."""
    ecc = np.zeros(n, dtype=np.int64)
    visited = np.zeros(n, dtype=np.int64)
    nxt = loglog_masks(n, seed)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    frontier = np.arange(n, dtype=np.int64)
    rounds = 0
    while frontier.size:
        rounds += 1
        visited[frontier] = nxt[frontier]
        changed = set()
        for v in frontier:
            for w in d[offsets[v] : offsets[v + 1]]:
                to_write = _reg_max(
                    visited[w : w + 1], visited[v : v + 1]
                )[0]
                if visited[w] != to_write:
                    nxt[w] = _reg_max(nxt[w : w + 1], np.array([to_write]))[0]
                    if ecc[w] != rounds:
                        ecc[w] = rounds
                        changed.add(int(w))
        frontier = np.array(sorted(changed), dtype=np.int64)
    return ecc, rounds


def mis_lex_first(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Lexicographically-first maximal independent set — the
    deterministic fixpoint of ``apps/MIS.C`` with priority = vertex id
    (``MIS.C:79``): greedy by ascending id on the symmetric graph.
    Returns a boolean membership array."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    in_set = np.zeros(n, dtype=bool)
    blocked = np.zeros(n, dtype=bool)
    for v in range(n):
        if not blocked[v]:
            in_set[v] = True
            blocked[d[offsets[v] : offsets[v + 1]]] = True
            blocked[v] = True
    return in_set


def cf_sgd(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    K: int = 20,
    num_iter: int = 5,
    step: float = 0.00000035,
    lam: float = 0.001,
) -> np.ndarray:
    """Collaborative-filtering gradient descent, semantics of
    ``apps/CF.C:83-137`` (default init 0.5, pull-based synchronous
    accumulation, K=20, 5 iterations): per iter,
    error[d] = sum over edges (s,d,w) of latent[s]*(w - <latent[d],
    latent[s]>); then latent += step*(-lambda*latent + error).
    Returns the (n, K) latent matrix."""
    latent = np.full((n, K), 0.5, dtype=np.float64)
    for _ in range(num_iter):
        est = np.einsum("ij,ij->i", latent[dst], latent[src])
        err = weight.astype(np.float64) - est
        grad = np.zeros((n, K), dtype=np.float64)
        np.add.at(grad, dst, latent[src] * err[:, None])
        latent = latent + step * (-lam * latent + grad)
    return latent


def setcover(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    epsilon: float = 0.01,
) -> tuple[np.ndarray, int]:
    """Bucketed greedy set cover, semantics of
    ``apps/bucketing/SetCover.C:25-96`` (MaNIS-style): every vertex is
    both a set (covering its out-neighbors) and an element.  Buckets by
    floor(x*ln(deg)) with x = 1/ln(1+eps), processed DECREASING; per
    round the current bucket's sets re-count their uncovered neighbors
    (the packEdges step), those still above ceil((1+eps)^k) acquire
    elements by writeMin(set id), and sets winning at least
    ceil((1+eps)^(k-1)) elements join the cover and mark them covered;
    losers' acquisitions reset.  writeMin makes the whole run
    deterministic (min set id wins each element).  Edge-level counts —
    duplicate edges count multiply, as upstream.

    Returns (in_cover bool array over n, rounds)."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    offsets = np.searchsorted(s, np.arange(n + 1, dtype=np.int64))
    x = 1.0 / np.log(1.0 + epsilon)

    def clamp_bucket(deg):
        return -1 if deg == 0 else int(np.floor(x * np.log(float(deg))))

    D = np.diff(offsets).astype(np.int64)
    bucket = np.array([clamp_bucket(int(dv)) for dv in D], dtype=np.int64)
    covered = np.zeros(n, dtype=bool)
    in_cover = np.zeros(n, dtype=bool)
    owner = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)  # free
    rounds = 0
    while True:
        live = bucket >= 0
        if not live.any():
            break
        k = int(bucket[live].max())
        active = np.where(bucket == k)[0]
        rounds += 1
        # 1. pack: recount uncovered out-edges (duplicates count)
        for v in active:
            nb = d[offsets[v] : offsets[v + 1]]
            D[v] = int((~covered[nb]).sum())
        thr = int(np.ceil((1.0 + epsilon) ** k))
        still = active[D[active] >= thr]
        # 2. writeMin acquisition over uncovered neighbors
        for v in still:
            nb = d[offsets[v] : offsets[v + 1]]
            nb = nb[~covered[nb]]
            np.minimum.at(owner, nb, v)
        # 3. won-edge counts; join cover when >= low threshold
        low = max(int(np.ceil((1.0 + epsilon) ** (k - 1))), 1)
        for v in still:
            nb = d[offsets[v] : offsets[v + 1]]
            nb = nb[~covered[nb]]
            if int((owner[nb] == v).sum()) >= low:
                in_cover[v] = True
        # 4. winners mark their elements covered; losers reset
        for v in still:
            nb = d[offsets[v] : offsets[v + 1]]
            nb = nb[~covered[nb]]
            won = nb[owner[nb] == v]
            if in_cover[v]:
                covered[won] = True
            owner[won] = np.iinfo(np.int64).max
        # 5. rebucket the processed bucket's sets
        for v in active:
            bucket[v] = -1 if in_cover[v] else clamp_bucket(int(D[v]))
    return in_cover, rounds


def heat_kernel_rand(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    seeds,
    t: float = 3.0,
    k_max: int = 10,
    n_walks: int = 10,
    seed: int = 1,
) -> dict[tuple[int, int], float]:
    """rand-HK-PR endpoint distribution — the pinned counter-based
    spec of :func:`ligra_spark.apps.heat_kernel_rand` (semantics of
    ``apps/localAlg/HeatKernel-Randomized-Serial.C:47-88`` with the
    deterministic ``ctr(s,w,j)`` hash stream, walk length capped at
    ``k_max``, neighbors indexed by ascending dst).  Returns
    {(seed_vertex, endpoint): p}."""
    import math

    from .hashing import hash_int32

    order = np.lexsort((dst, src))
    s_, d_ = src[order], dst[order]
    offsets = np.searchsorted(s_, np.arange(n + 1, dtype=np.int64))
    deg = (offsets[1:] - offsets[:-1]).astype(np.int64)
    probs = [math.exp(-t) * t ** k / math.factorial(k) for k in range(k_max)]
    stride = k_max + 1
    out: dict[tuple[int, int], float] = {}
    for sv in seeds:
        if deg[sv] == 0:
            continue
        counts: dict[int, int] = {}
        for w in range(n_walks):
            base = (int(sv) * n_walks + w) * stride + seed
            u = float(hash_int32(np.uint32(base & 0xFFFFFFFF))) / 4294967295.0
            x = int(sv)
            cdf = 0.0
            for j in range(k_max):
                cdf += probs[j]
                if u < cdf:
                    break
                if deg[x] == 0:
                    continue  # frozen; stays for remaining steps
                h = int(hash_int32(np.uint32((base + j + 1) & 0xFFFFFFFF)))
                x = int(d_[offsets[x] + h % int(deg[x])])
            counts[x] = counts.get(x, 0) + 1
        for x, c in counts.items():
            out[(int(sv), x)] = c / float(n_walks)
    return out
