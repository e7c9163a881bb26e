"""MinMatch tree-builder tests, ported from include/test/test_treebuilder.cpp."""
import numpy as np

from relate_tpu.core.treebuilder import quick_build


def test_good_distance_matrix():
    d = np.array([
        [0, 0, 1, 2, 2],
        [2, 0, 3, 4, 4],
        [0, 0, 0, 1, 1],
        [1, 1, 1, 0, 0],
        [1, 1, 1, 0, 0],
    ], dtype=np.float32)
    tree = quick_build(d, theta=0.025)
    expected_parent = [6, 6, 7, 5, 5, 8, 7, 8, -1]
    assert list(tree.parent) == expected_parent


def test_bad_distance_matrix_fallback():
    """No mutual-min candidate exists -> symmetrized-distance fallback
    (tree_builder.cpp:1167-1178)."""
    d = np.array([
        [0, 1, 2, 2],
        [3, 0, 1, 1],
        [0, 1, 0, 1],
        [1, 1, 0, 0],
    ], dtype=np.float32)
    tree = quick_build(d, theta=0.025)
    expected_parent = [6, 5, 4, 4, 5, 6, -1]
    assert list(tree.parent) == expected_parent


def test_zero_matrix_degenerate():
    """All-zero matrix: any topology is valid; must produce a proper binary
    tree (2N-1 nodes, every non-root with a parent)."""
    N = 6
    tree = quick_build(np.zeros((N, N), dtype=np.float32), theta=0.025)
    assert tree.parent[-1] == -1
    assert (tree.parent[:-1] >= N).all()
    # every internal node has exactly 2 children
    counts = np.bincount(tree.parent[tree.parent >= 0], minlength=2 * N - 1)
    assert (counts[N:] == 2).all()


def test_consistency_prior_prefers_previous_clades():
    """With d_CF from a previous tree, CF-consistent pairs score 0 and are
    preferred among candidates."""
    from relate_tpu.core.treebuilder import clade_prior_matrix
    d_prev = np.array([
        [0, 0, 1, 2, 2],
        [2, 0, 3, 4, 4],
        [0, 0, 0, 1, 1],
        [1, 1, 1, 0, 0],
        [1, 1, 1, 0, 0],
    ], dtype=np.float32)
    prev = quick_build(d_prev, theta=0.025)
    d_cf = clade_prior_matrix(prev, theta=0.025)
    # d_cf[i][j] should be 0 within previous clades, positive across
    assert d_cf[3, 4] < d_cf[3, 0]
    tree = quick_build(d_prev, d_cf=d_cf, theta=0.025)
    # CF-consistent pairs tie at score 0, so merge *order* (node numbering)
    # may differ; the clade structure must be preserved.
    def clades(t):
        return {tuple(row) for row in t.leaf_matrix()[t.N:]}
    assert clades(tree) == clades(prev)


def test_nhx_and_oriented_writers():
    """NHX carries per-node [&&NHX:S=..] tags (anc.cpp:213-284); oriented
    format is 'parent:branch_length ' per node, -1 at the root
    (anc.cpp:287-317)."""
    d = np.array([
        [0, 1, 5, 5, 5],
        [1, 0, 5, 5, 5],
        [5, 5, 0, 1, 2],
        [5, 5, 1, 0, 2],
        [5, 5, 2, 2, 0],
    ], dtype=np.float32)
    t = quick_build(d, theta=0.025)
    t.branch_length[:] = np.arange(t.num_nodes) * 0.5
    props = [f"p{v}" for v in range(t.num_nodes)]
    nhx = t.to_nhx(props)
    assert nhx.endswith(";")
    # every non-root node is tagged
    assert nhx.count("[&&NHX:S=") == t.num_nodes - 1
    assert f"[&&NHX:S=p{int(t.child_left[t.root])}]" in nhx
    ori = t.to_oriented()
    parts = ori.split()
    assert len(parts) == t.num_nodes
    assert parts[t.root].startswith("-1:")
    for v in range(t.num_nodes):
        p, bl = parts[v].split(":")
        assert int(p) == int(t.parent[v])
        assert abs(float(bl) - t.branch_length[v]) < 1e-6
