"""Topology post-processing — the full PostProcess mode.

Behavioral reference: ``include/pipeline/PostProcess.cpp`` (standalone entry
:311, per-chunk entry :980; 1486 lines). For every internal branch with no
mapped mutations, the three nearest-neighbour-interchange resolutions of the
(child1, child2, sibling) triplet are scored against the carrier sets of
nearby SNPs using the approximate-match criterion of ``Map``
(PostProcess.cpp:136-203): a clade "supports" a pairing when clade ==
carriers exactly, or (for thr > 1 and DAF >= 4) when mismatches stay under
thr = 0.03N+1 with the 0.7/0.3 correct-carrier ratios. The resolution whose
supporting SNP is closest in (genetic, else physical) distance wins
(PostProcess.cpp:630-695); up to 5 sweeps per tree (:488). With
``randomise`` (PostProcess.cpp:700-860), unsupported adjacent node pairs are
re-resolved uniformly at random instead. Afterwards nodes are relabelled so
every parent's label exceeds its children's (Relabel, :18-70), per-node SNP
spans are reset to the tree span, and ALL mutations are re-mapped onto the
new topologies with ages from the current coordinates (:879-955).

The per-SNP ``Map`` scores are evaluated vectorized over the SNP window
(one (K,) score vector per clade) instead of the reference's per-SNP early
-exit loops; the reference's ring-buffer order dependence (approx fallback
enabled only while no exact support was seen *so far*) is replaced by the
deterministic equivalent "approx fallback only when no exact support exists
anywhere in the window".
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.topology import MutationRecord
from ..core.trees import AncesTree, Tree

BUF = 5000          # ring buffer of DAF>1 SNPs (PostProcess.cpp:414)


def _map_scores(block: np.ndarray, daf: np.ndarray, clade: np.ndarray,
                thr: int, N: int) -> np.ndarray:
    """Vectorized Map (PostProcess.cpp:136-203): per-SNP score of mapping
    the SNPs in ``block`` (K, N bool) onto a clade (N, bool). 0 = exact
    support; thr = no support; in between = approximate mismatch count."""
    nd = int(clade.sum())
    K = block.shape[0]
    scores = np.full(K, thr, dtype=np.int64)
    # outer guard: |DAF - num_desc| < thr (PostProcess.cpp:145-147)
    ok = np.abs(daf - nd) < thr
    if not ok.any():
        return scores
    matching = block[:, clade].sum(axis=1)
    non_matching = nd - matching
    exact = (non_matching == 0) & (matching == daf)
    small = daf < 4
    if thr <= 1:
        small = np.ones(K, dtype=bool)
    # small/exact path: score 0 iff clade == carriers
    scores[ok & small & exact] = 0
    sel = ok & ~small
    if sel.any():
        m, nm, d = matching[sel], non_matching[sel], daf[sel]
        s = np.full(sel.sum(), thr, dtype=np.int64)
        approx_val = d - m + nm
        cond = ((nm < thr) & (approx_val < thr) & (m > 0.7 * d)
                & (nm < 0.3 * (N - d))
                & (m > 0.7 * nd) & ((N - d - nm) > 0.7 * (N - nd)))
        s[cond] = approx_val[cond]
        s[(nm == 0) & (m == d)] = 0
        scores[sel] = s
    return scores


def _relabel(tree: Tree) -> np.ndarray:
    """Relabel internal nodes so every parent's label exceeds its
    children's (Relabel, PostProcess.cpp:18-70). Returns old->new map and
    rewires the tree arrays in place."""
    M = tree.num_nodes
    N = tree.N
    indeg = np.zeros(M, dtype=np.int64)
    for v in range(N, M):
        indeg[v] = 2
    import heapq
    ready = list(range(N))
    heapq.heapify(ready)
    newlab = np.empty(M, dtype=np.int32)
    nxt = 0
    parent = tree.parent
    while ready:
        v = heapq.heappop(ready)
        newlab[v] = nxt
        nxt += 1
        p = int(parent[v])
        if p >= 0:
            indeg[p] -= 1
            if indeg[p] == 0:
                heapq.heappush(ready, p)
    assert nxt == M
    # apply the permutation
    inv = np.empty(M, dtype=np.int64)
    inv[newlab] = np.arange(M)
    for name in ("branch_length", "num_events", "SNP_begin", "SNP_end"):
        arr = getattr(tree, name)
        arr[:] = arr[inv]
    newpar = np.full(M, -1, dtype=tree.parent.dtype)
    newcl = np.full(M, -1, dtype=tree.child_left.dtype)
    newcr = np.full(M, -1, dtype=tree.child_right.dtype)
    old_cl = tree.child_left.copy()
    old_cr = tree.child_right.copy()
    for v_old in range(M):
        v = newlab[v_old]
        p_old = int(parent[v_old])
        newpar[v] = newlab[p_old] if p_old >= 0 else -1
        c1, c2 = int(old_cl[v_old]), int(old_cr[v_old])
        newcl[v] = newlab[c1] if c1 >= 0 else -1
        newcr[v] = newlab[c2] if c2 >= 0 else -1
    tree.parent[:] = newpar
    tree.child_left[:] = newcl
    tree.child_right[:] = newcr
    return newlab


def post_process(anc: AncesTree, muts: List[MutationRecord],
                 G: np.ndarray, bp: np.ndarray,
                 rdist: Optional[np.ndarray] = None,
                 seed: int = 1, randomise: bool = False,
                 use_transitions: bool = True,
                 alleles: Optional[List[str]] = None) -> int:
    """Full PostProcess pass over a tree sequence. Mutates ``anc`` and
    ``muts`` in place; returns the number of rearranged nodes.

    ``rdist``: per-SNP genetic position (cM). When given, the support
    window threshold is 10 cM (PostProcess.cpp:368); else physical bp with
    a 10 Mb threshold (:359)."""
    rng = np.random.default_rng(seed)
    N = anc.N
    root = 2 * N - 2
    thr = int(0.03 * N) + 1
    L = G.shape[0]
    if rdist is None:
        rdist = np.asarray(bp, dtype=np.float64)
        threshold = 10e6
    else:
        rdist = np.asarray(rdist, dtype=np.float64)
        threshold = 10.0
    bp_init = float(rdist[-1])

    daf_all = G.sum(axis=1)
    elig = np.nonzero(daf_all > 1)[0]          # buffer-eligible SNPs
    elig_rank = np.searchsorted(elig, np.arange(L))

    num_updated = 0
    for t, mt in enumerate(anc.seq):
        tree = mt.tree
        leafmat = tree.leaf_matrix().astype(bool)
        coords = tree.coordinates(anc.sample_ages).astype(np.float64)
        tree_r = float(rdist[min(mt.pos, L - 1)])

        # SNP window: the BUF eligible SNPs around the tree position,
        # within the distance threshold
        center = int(elig_rank[min(mt.pos, L - 1)])
        lo = max(center - BUF // 2, 0)
        hi = min(center + BUF // 2, len(elig))
        win = elig[lo:hi]
        dist = np.abs(rdist[win] - tree_r)
        win = win[dist < threshold]
        dist = np.abs(rdist[win] - tree_r)
        block = G[win].astype(bool)
        dafb = daf_all[win].astype(np.int64)

        for _ in range(5):
            is_updated = False
            for i in range(root - 1, N - 1, -1):
                if tree.num_events[i] >= 1.0:
                    continue
                parent = int(tree.parent[i])
                if parent < 0:
                    continue
                n1 = int(tree.child_left[i])
                n2 = int(tree.child_right[i])
                n3 = int(tree.child_left[parent])
                if n3 == i:
                    n3 = int(tree.child_right[parent])

                if len(win) == 0:
                    break
                c12 = leafmat[n1] | leafmat[n2]
                c13 = leafmat[n1] | leafmat[n3]
                c23 = leafmat[n2] | leafmat[n3]
                s12 = _map_scores(block, dafb, c12, thr, N)
                s13 = _map_scores(block, dafb, c13, thr, N)
                s23 = _map_scores(block, dafb, c23, thr, N)
                # exact support: priority 12 > 13 > 23 (the reference only
                # evaluates the next pairing when the previous failed)
                e12 = s12 == 0
                e13 = (s13 == 0) & ~e12
                e23 = (s23 == 0) & ~e12 & ~e13
                ce12 = dist[e12].min() if e12.any() else bp_init
                ce13 = dist[e13].min() if e13.any() else bp_init
                ce23 = dist[e23].min() if e23.any() else bp_init

                if (ce12 > threshold and ce13 > threshold
                        and ce23 > threshold and thr > 1):
                    # approx fallback (PostProcess.cpp:592-625): the best
                    # partial score wins if it beats mapping onto each
                    # child alone or all three together
                    smin = np.full(len(win), thr, dtype=np.int64)
                    for c in (leafmat[n1], leafmat[n2], leafmat[n3],
                              c12 | leafmat[n3]):
                        smin = np.minimum(smin,
                                          _map_scores(block, dafb,
                                                      c.astype(bool), thr,
                                                      N))
                    d2 = dist + threshold
                    w12 = (s12 < s13) & (s12 < s23) & (s12 < smin)
                    w13 = (s13 < s12) & (s13 < s23) & (s13 < smin)
                    w23 = (s23 < s12) & (s23 < s13) & (s23 < smin)
                    if w12.any():
                        ce12 = min(ce12, d2[w12].min())
                    if w13.any():
                        ce13 = min(ce13, d2[w13].min())
                    if w23.any():
                        ce23 = min(ce23, d2[w23].min())

                if ((ce13 < ce12 and ce13 <= ce23)
                        or (ce13 <= ce12 and ce13 < ce23)):
                    keep, move, displaced = n1, n3, n2
                elif ((ce23 < ce12 and ce23 <= ce13)
                        or (ce23 <= ce12 and ce23 < ce13)):
                    keep, move, displaced = n2, n3, n1
                elif ((ce12 < ce23 and ce12 <= ce13)
                        or (ce12 <= ce23 and ce12 < ce13)):
                    tree.num_events[i] = 1.0
                    continue
                else:
                    continue

                is_updated = True
                num_updated += 1
                tree.child_left[i] = keep
                tree.child_right[i] = move
                tree.parent[keep] = i
                tree.parent[move] = i
                tree.child_left[parent] = i
                tree.child_right[parent] = displaced
                tree.parent[i] = parent
                tree.parent[displaced] = parent
                if coords[move] >= coords[i]:
                    coords[i] = (coords[parent] + coords[move]) / 2.0
                tree.num_events[i] = 1.0
                tree.branch_length[keep] = coords[i] - coords[keep]
                tree.branch_length[move] = coords[i] - coords[move]
                tree.branch_length[displaced] = (coords[parent]
                                                 - coords[displaced])
                tree.branch_length[i] = coords[parent] - coords[i]
                leafmat[i] = leafmat[keep] | leafmat[move]
            if not is_updated:
                break

        if randomise:
            _randomise_pass(tree, coords, rng, N, root)

        _relabel(tree)
        # reset spans + events (PostProcess.cpp:866-875)
        nxt_pos = (anc.seq[t + 1].pos if t + 1 < len(anc.seq) else L - 1)
        tree.SNP_begin[:] = mt.pos
        tree.SNP_end[:] = nxt_pos
        tree.num_events[:] = 0.0

    _remap_mutations(anc, muts, G, use_transitions, alleles)
    return num_updated


def _randomise_pass(tree: Tree, coords: np.ndarray,
                    rng: np.random.Generator, N: int, root: int):
    """--randomise (PostProcess.cpp:700-860): for adjacent unsupported
    node pairs (node + unsupported sibling with children), redistribute
    the four grandchildren uniformly over the two internal nodes."""
    for i in range(root - 1, N - 1, -1):
        if tree.num_events[i] >= 1.0:
            continue
        parent = int(tree.parent[i])
        if parent < 0:
            continue
        node2 = int(tree.child_left[parent])
        if node2 == i:
            node2 = int(tree.child_right[parent])
        if tree.num_events[node2] >= 1.0 or tree.child_left[node2] < 0:
            continue
        node1 = i
        child1 = int(tree.child_left[node1])
        child2 = int(tree.child_right[node1])
        child3 = int(tree.child_left[node2])
        child4 = int(tree.child_right[node2])
        remaining = [child1, child2, child3, child4]

        for ch in remaining:
            if coords[ch] >= coords[node1]:
                coords[node1] = (coords[parent] + coords[ch]) / 2.0
            if coords[ch] >= coords[node2]:
                coords[node2] = (coords[parent] + coords[ch]) / 2.0
        if node2 > node1:
            node1, node2 = node2, node1
        if coords[node2] > coords[node1]:
            coords[node1], coords[node2] = coords[node2], coords[node1]

        # pick node2's pair uniformly from the 6 pairings (:1003-1040)
        val = rng.random()
        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        a, b = pairs[min(int(val * 6), 5)]
        picked = [remaining[a], remaining[b]]
        rest = [remaining[j] for j in range(4) if j not in (a, b)]
        tree.child_left[node2] = picked[0]
        tree.child_right[node2] = picked[1]
        tree.parent[picked[0]] = node2
        tree.parent[picked[1]] = node2
        tree.branch_length[picked[0]] = coords[node2] - coords[picked[0]]
        tree.branch_length[picked[1]] = coords[node2] - coords[picked[1]]

        rest.append(node2)
        # pick node1's pair uniformly from the 3 pairings of the rest
        val = rng.random()
        pairs3 = [(0, 1), (0, 2), (1, 2)]
        a, b = pairs3[min(int(val * 3), 2)]
        picked1 = [rest[a], rest[b]]
        top = [rest[j] for j in range(3) if j not in (a, b)] + [node1]
        for ch in picked1:
            if coords[ch] >= coords[node1]:
                coords[node1] = (coords[parent] + coords[ch]) / 2.0
        tree.child_left[node1] = picked1[0]
        tree.child_right[node1] = picked1[1]
        tree.parent[picked1[0]] = node1
        tree.parent[picked1[1]] = node1
        tree.branch_length[picked1[0]] = coords[node1] - coords[picked1[0]]
        tree.branch_length[picked1[1]] = coords[node1] - coords[picked1[1]]
        tree.child_left[parent] = top[0]
        tree.child_right[parent] = top[1]
        tree.parent[top[0]] = parent
        tree.parent[top[1]] = parent
        tree.branch_length[top[0]] = coords[parent] - coords[top[0]]
        tree.branch_length[top[1]] = coords[parent] - coords[top[1]]


def _remap_mutations(anc: AncesTree, muts: List[MutationRecord],
                     G: np.ndarray, use_transitions: bool = True,
                     alleles: Optional[List[str]] = None):
    """Re-map every SNP onto its (possibly rearranged) tree and refresh
    branch / flipped / ages from the new coordinates
    (PostProcess.cpp:879-955)."""
    from ..core import mapmutation
    N = anc.N
    root = 2 * N - 2
    by_tree = {}
    for snp, m in enumerate(muts):
        by_tree.setdefault(m.tree, []).append(snp)
    for t, snps in by_tree.items():
        tree = anc.seq[t].tree
        leafmat = tree.leaf_matrix()
        coords = tree.coordinates(anc.sample_ages).astype(np.float64)
        carriers = G[[min(s, G.shape[0] - 1) for s in snps]].astype(np.uint8)
        res = mapmutation.map_mutations_block(tree, leafmat, carriers)
        for j, snp in enumerate(snps):
            m = muts[snp]
            daf = int(carriers[j].sum())
            if daf == N:
                tree.num_events[root] += 1.0
                m.branch = [root]
                m.flipped = False
                m.age_begin = float(coords[root])
                m.age_end = float(coords[root])
                continue
            if res.is_mapping[j] <= 2 and res.branch[j] >= 0:
                b = int(res.branch[j])
                m.branch = [b]
                m.flipped = bool(res.flipped[j])
                tree.num_events[b] += 1.0
                m.age_begin = float(coords[b])
                m.age_end = (float(coords[int(tree.parent[b])])
                             if b < root else float(coords[b]))
            else:
                brs, flp = mapmutation.force_map_mutation(
                    tree, carriers[j].astype(bool))
                m.branch = list(brs)
                m.flipped = flp
                m.age_begin = 0.0
                m.age_end = 0.0
