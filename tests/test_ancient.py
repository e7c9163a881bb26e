"""Ancient-sample (sample_ages > 0) paths.

The reference treats tip ages as a first-class variant across the stack:
MCMC initialization (branch_length_estimator.cpp:138-212, 2798-2930), the
tree builder's age grid (tree_builder.cpp:1123-1232), and the coalescence
statistics (CoalescentRateForSection.cpp:91-225). These were previously
untested here.
"""
import numpy as np
import pytest

from relate_tpu.core import mcmc
from relate_tpu.core.treebuilder import quick_build


@pytest.fixture
def ancient_setup():
    rng = np.random.default_rng(7)
    N = 12
    ages = np.zeros(N)
    ages[8:] = [500.0, 500.0, 2000.0, 3500.0]      # 4 ancient tips
    d = rng.random((N, N)).astype(np.float32)
    tree = quick_build(d, theta=0.01, seed=3, sample_ages=ages, Ne=3e4)
    return N, ages, tree


def test_pseudo_order_is_valid_extension(ancient_setup):
    """_pseudo_order must produce a linear extension of the tree poset in
    which every ancient tip precedes its ancestors and tips sort by age."""
    N, ages, tree = ancient_setup
    ages_n = ages / 3e4
    si, order = mcmc._pseudo_order(tree, ages_n)
    M = tree.num_nodes
    assert sorted(si.tolist()) == list(range(M))
    for v in range(M):
        p = int(tree.parent[v])
        if p >= 0:
            assert order[p] > order[v], f"parent {p} before child {v}"
    # tips appear in nondecreasing age order
    tip_positions = [order[i] for i in range(N)]
    tip_by_pos = [i for _, i in sorted(zip(tip_positions, range(N)))]
    tip_ages = ages_n[tip_by_pos]
    assert (np.diff(tip_ages) >= -1e-12).all()


def test_initial_coords_respect_tip_ages(ancient_setup):
    N, ages, tree = ancient_setup
    ages_n = ages / 3e4
    si, _ = mcmc._pseudo_order(tree, ages_n)
    coords = mcmc._initial_coords(si, N, ages_n)
    np.testing.assert_allclose(coords[:N], ages_n)
    # internal node ages increase along the order and exceed their
    # children's ages
    for v in range(N, tree.num_nodes):
        c1, c2 = int(tree.child_left[v]), int(tree.child_right[v])
        assert coords[v] > max(coords[c1], coords[c2]) - 1e-12


def test_treebuilder_age_grid_blocks_early_old_merges(ancient_setup):
    """A tree built with sample ages must place every ancient tip's parent
    above the tip's age (the age-grid penalty forbids merging an old
    lineage before the bound reaches its age)."""
    N, ages, tree = ancient_setup
    coords = tree.coordinates(ages)
    for i in range(N):
        p = int(tree.parent[i])
        assert coords[p] >= ages[i] - 1e-6, (i, ages[i], coords[p])


def test_run_mcmc_with_sample_ages(ancient_setup):
    """Branch-length MCMC with ancient tips: finite nonnegative lengths
    and parent ages above the oldest descendant tip."""
    N, ages, tree = ancient_setup
    L = 64
    tree.num_events[:] = np.random.default_rng(0).poisson(
        1.0, tree.num_nodes)
    tree.SNP_begin[:] = 0
    tree.SNP_end[:] = L - 1
    trees = [tree] * 3
    bl = mcmc.run_mcmc(trees, np.ones(L), L, Ne=3e4, seed=5,
                       sample_ages=ages, max_rounds=5)
    assert np.isfinite(bl).all() and (bl >= 0).all()
    # reconstruct node ages: age[v] = age of tip + sum of branch lengths
    # up the path must be consistent with parent age >= child age
    for b in range(3):
        coords = np.zeros(tree.num_nodes)
        coords[:N] = ages
        import relate_tpu.core.trees as T
        order = T.topological_order(tree.parent)
        for v in order:
            c1, c2 = int(tree.child_left[v]), int(tree.child_right[v])
            coords[v] = max(coords[c1] + bl[b, c1], coords[c2] + bl[b, c2])
        for v in range(tree.num_nodes):
            p = int(tree.parent[v])
            if p >= 0:
                assert coords[p] >= coords[v] - 1e-3


def test_coalescence_stats_ancient_device_matches_host(ancient_setup):
    from relate_tpu.evaluate import coalrate
    N, ages, tree = ancient_setup
    epochs = coalrate.default_epochs()
    trees = [tree] * 5
    f = np.arange(1.0, 6.0)
    c_d, o_d = coalrate.coalescence_stats(trees, f, epochs,
                                          sample_ages=ages)
    c_h, o_h = coalrate.coalescence_stats(trees, f, epochs,
                                          sample_ages=ages,
                                          use_device=False)
    np.testing.assert_allclose(c_d, c_h, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(o_d, o_h, rtol=1e-4, atol=1e-2)
