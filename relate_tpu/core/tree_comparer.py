"""Tree-distance metrics.

Behavioral reference: ``include/src/tree_comparer.{hpp,cpp}``
(tree_comparer.hpp:9-18): Pearson-correlation distance, Robinson-Foulds
partition metric, branch-score distance, time-while-k-ancestors, pairwise
TMRCA matrix. All reformulated as leaf-set matrix reductions (the pairwise
correlation matrix is one matmul, see branch_association.pearson_matrix).
"""
from __future__ import annotations

import numpy as np

from .branch_association import pearson_matrix
from .trees import Tree, topological_order


def partition_metric(t1: Tree, t2: Tree) -> int:
    """Robinson-Foulds distance: clades present in one tree but not the
    other (internal, non-root clades)."""
    A = {tuple(r) for r in t1.leaf_matrix()[t1.N: -1]}
    B = {tuple(r) for r in t2.leaf_matrix()[t2.N: -1]}
    return len(A ^ B)


def pearson_distance(t1: Tree, t2: Tree) -> float:
    """1 - mean over branches of the best-matching Pearson correlation of
    leaf sets (symmetrized)."""
    L1 = t1.leaf_matrix()
    L2 = t2.leaf_matrix()
    c = pearson_matrix(L1[t1.N: -1], L2[t2.N: -1])
    if c.size == 0:
        return 0.0
    return float(1.0 - 0.5 * (c.max(axis=1).mean() + c.max(axis=0).mean()))


def branch_score(t1: Tree, t2: Tree) -> float:
    """Branch-score distance: L2 over clades of branch-length differences
    (0 where a clade is absent)."""
    def lengths(t: Tree):
        out = {}
        lm = t.leaf_matrix()
        for v in range(t.N, t.num_nodes - 1):
            out[tuple(lm[v])] = out.get(tuple(lm[v]), 0.0) \
                + float(t.branch_length[v])
        return out
    a = lengths(t1)
    b = lengths(t2)
    keys = set(a) | set(b)
    return float(np.sqrt(sum((a.get(k, 0.0) - b.get(k, 0.0)) ** 2
                             for k in keys)))


def time_while_k_ancestors(tree: Tree, k: int,
                           sample_ages=None) -> float:
    """Total time during which exactly k ancestral lineages exist."""
    coords = np.sort(tree.coordinates(sample_ages)[tree.N:])
    N = tree.N
    # N lineages on [0, coords[0]]; after the i-th coalescence (age
    # coords[i-1]) there are N-i lineages, until coords[i]
    if k > N or k < 2:
        return 0.0
    if k == N:
        return float(coords[0])
    i = N - k  # number of coalescences that have happened
    return float(coords[i] - coords[i - 1])


def pairwise_tmrca(tree: Tree, sample_ages=None) -> np.ndarray:
    """(N, N) matrix of pairwise TMRCAs via the cross-clade decomposition
    (each unordered pair coalesces at exactly one internal node)."""
    N = tree.N
    coords = tree.coordinates(sample_ages)
    lm = tree.leaf_matrix().astype(bool)
    out = np.zeros((N, N))
    for v in topological_order(tree.parent):
        a = np.nonzero(lm[tree.child_left[v]])[0]
        b = np.nonzero(lm[tree.child_right[v]])[0]
        out[np.ix_(a, b)] = coords[v]
        out[np.ix_(b, a)] = coords[v]
    return out
