"""Equivalent-branch identification across adjacent marginal trees.

Behavioral reference: ``AncesTreeBuilder::BranchAssociation``
(``include/src/anc_builder.cpp:1433-1614``), ``Correlation::Pearson``
(``include/src/anc.cpp:821-860``) and the forward/backward propagation
``AssociateTrees`` (anc_builder.cpp:658-818).

TPU-native core: all pairwise leaf-set intersections of two trees are one
``(2N-1, N) @ (N, 2N-1)`` matmul; the Pearson matrix follows elementwise.
The greedy matching (exact-first, then best-score) runs on host over the
small candidate lists.
"""
from __future__ import annotations

from typing import List

import numpy as np

from .trees import Tree

THRESHOLD_BRANCHEQ = 0.95   # anc_builder.cpp:364
EXACT = 0.9999


def pearson_matrix(L1: np.ndarray, L2: np.ndarray) -> np.ndarray:
    """Pairwise Pearson correlations of two trees' leaf sets.

    L1, L2: (M, N) uint8 clade indicators. Implements anc.cpp:823-860
    including its special cases.
    """
    M, N = L1.shape
    n1 = L1.sum(axis=1).astype(np.float64)
    n2 = L2.sum(axis=1).astype(np.float64)
    prod = L1.astype(np.float64) @ L2.astype(np.float64).T   # (M, M)

    r = prod - n1[:, None] * (n2[None, :] / N)
    denom = np.sqrt((n1 / N) * (N - n1))[:, None] \
        * np.sqrt((n2 / N) * (N - n2))[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(r <= 0.0, 0.0, r / np.where(denom == 0, 1.0, denom))
    # exact equality -> 1
    exact_eq = (prod == n1[:, None]) & (prod == n2[None, :])
    r = np.where(exact_eq, 1.0, r)
    # full sets: 1 if equal sizes else 0
    full1 = n1[:, None] == N
    full2 = n2[None, :] == N
    anyfull = full1 | full2
    r = np.where(anyfull, np.where(n1[:, None] == n2[None, :], 1.0, 0.0), r)
    return r


def branch_association(ref_tree: Tree, tree: Tree) -> np.ndarray:
    """equivalent[k] = branch of ref_tree equivalent to branch k of tree
    (-1 if none), replicating the reference's staged matching."""
    N = tree.N
    M = tree.num_nodes
    Lt = tree.leaf_matrix()
    Lr = ref_tree.leaf_matrix()
    corr = pearson_matrix(Lt, Lr)

    eq = np.full(M, -1, dtype=np.int32)
    eq_ref = np.full(M, -1, dtype=np.int32)

    tp = tree.parent
    rp = ref_tree.parent

    # 1. leaves: sibling identity or parent-clade correlation
    for i in range(N):
        if eq[i] != -1:
            continue
        par = tp[i]
        rpar = rp[i]
        sib = tree.child_right[par] if tree.child_left[par] == i \
            else tree.child_left[par]
        if sib < N:
            rsibs = (ref_tree.child_left[rpar], ref_tree.child_right[rpar])
            if sib in rsibs:
                eq[i] = i
                eq_ref[i] = i
                eq[sib] = sib
                eq_ref[sib] = sib
        else:
            if corr[par, rpar] >= THRESHOLD_BRANCHEQ:
                eq[i] = i
                eq_ref[i] = i

    # precompute ref branches grouped by leaf count
    nl_r = Lr.sum(axis=1)
    nl_t = Lt.sum(axis=1)
    by_count: List[List[int]] = [[] for _ in range(N + 1)]
    for b in range(M):
        by_count[nl_r[b]].append(b)

    # 2. internal: exact matches (same index first, then same leaf count)
    unpaired = []
    for i in range(N, M - 1):
        if corr[i, i] >= EXACT and corr[tp[i], rp[i]] >= EXACT:
            eq[i] = i
            eq_ref[i] = i
        if eq[i] == -1:
            for j in by_count[nl_t[i]]:
                if corr[i, j] >= EXACT and corr[tp[i], rp[j]] >= EXACT:
                    eq[i] = j
                    eq_ref[j] = i
                    break
        if eq[i] == -1:
            unpaired.append(i)

    # 3. approximate matches: all >= threshold pairs, best score first
    #    (search space limited to compatible leaf counts,
    #     anc_builder.cpp:1434-1452)
    thr_inv = 1.0 / (THRESHOLD_BRANCHEQ * THRESHOLD_BRANCHEQ)
    possible = []
    for i in unpaired:
        c = nl_t[i]
        for c2 in range(1, N + 1):
            if c2 != c:
                lo, hi = (c, c2) if c < c2 else (c2, c)
                if thr_inv < hi / (N - hi + 1e-30) * ((N - lo) / lo):
                    continue
            for j in by_count[c2]:
                if eq_ref[j] != -1:
                    continue
                score = corr[i, j]
                if score >= THRESHOLD_BRANCHEQ \
                        and corr[tp[i], rp[j]] >= THRESHOLD_BRANCHEQ:
                    possible.append((score, i, j))
    possible.sort(key=lambda t: -t[0])
    for score, i, j in possible:
        if eq[i] == -1 and eq_ref[j] == -1:
            eq[i] = j
            eq_ref[j] = i
    return eq


def associate_trees(trees: List[Tree], equivalences: List[np.ndarray]):
    """Propagate num_events / SNP spans through equivalent-branch chains
    (AssociateTrees, anc_builder.cpp:658-818).

    trees: all marginal trees of a chunk in order; equivalences[t][k] = branch
    of trees[t] equivalent to branch k of trees[t+1]. Mutates trees in place.
    """
    n = len(trees)
    assert len(equivalences) == n - 1
    # forward: accumulate events and earliest SNP_begin
    for t in range(n - 1):
        eq = equivalences[t]
        prev, cur = trees[t], trees[t + 1]
        sel = eq != -1
        idx = np.nonzero(sel)[0]
        cur.num_events[idx] += prev.num_events[eq[idx]]
        cur.SNP_begin[idx] = prev.SNP_begin[eq[idx]]
    # backward: copy back accumulated events and latest SNP_end
    for t in range(n - 2, -1, -1):
        eq = equivalences[t]
        prev, cur = trees[t], trees[t + 1]
        sel = eq != -1
        idx = np.nonzero(sel)[0]
        prev.num_events[eq[idx]] = cur.num_events[idx]
        prev.SNP_end[eq[idx]] = cur.SNP_end[idx]
