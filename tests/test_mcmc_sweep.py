"""Differential tests of the parallel MCMC sweeps (VERDICT r3 #7).

The parallel age gap sweep and the parallel adjacent-transposition order
sweep (core/mcmc.py make_sweep_fn / make_order_sweep_fn) change the
proposal mixture relative to the reference's serial kernel
(branch_length_estimator.cpp:2789). Their exactness arguments are
independent-set factorizations; these tests check the CLAIM empirically:
on a fixed tree batch, long chains run with sweeps disabled (pure
reference 70/30 single-proposal mixture) and with each sweep enabled must
agree in posterior node-age means and variances within Monte-Carlo error.
A biased sweep (e.g. a broken Hastings term or a non-independent
simultaneous update) shifts the posterior moments and fails.

Noise calibration: the seed-to-seed spread of the "none" baseline run
with itself (different seeds) sets the MC error floor; thresholds below
are ~2x that measured floor.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relate_tpu.core import mcmc, treebuilder

N = 12
M = 2 * N - 1
B = 48
L = 200


def _tree_batch(seed=3):
    rng = np.random.default_rng(seed)
    trees = []
    for _ in range(B):
        d = rng.random((N, N)).astype(np.float32)
        np.fill_diagonal(d, 1e9)
        t = treebuilder.quick_build(d + d.T, theta=0.001,
                                    seed=int(rng.integers(1 << 30)))
        t.num_events = rng.poisson(2.0, M).astype(np.float32)
        t.SNP_begin = np.zeros(M, np.int32)
        t.SNP_end = np.full(M, L, np.int32)
        trees.append(t)
    return trees


def _chain_setup(trees, use_vp=False):
    dist = np.ones(L + 1)
    parent = np.stack([t.parent for t in trees])
    cl = np.stack([t.child_left for t in trees])
    cr = np.stack([t.child_right for t in trees])
    nl = np.concatenate([np.full(N, N), 2 * N - 1 - np.arange(N, 2 * N - 1)])
    if use_vp:
        epochs = np.asarray([0.0, 0.25, 1.0], np.float32)
        rates = np.asarray([1.5, 0.7, 1.2], np.float32)
        rt = np.broadcast_to(rates, (B, 3)).astype(np.float32)
        cumR = np.zeros((B, 3), np.float32)
        cumR[:, 1:] = np.cumsum(rt[:, :2] * np.diff(epochs), axis=1)
    else:
        epochs = np.asarray([0.0], np.float32)
        rt = np.ones((B, 1), np.float32)
        cumR = np.zeros((B, 1), np.float32)
    st = mcmc.ChainStatic(
        parent=jnp.asarray(parent, jnp.int32),
        child_left=jnp.asarray(cl, jnp.int32),
        child_right=jnp.asarray(cr, jnp.int32),
        num_events=jnp.asarray(np.stack([t.num_events for t in trees])),
        mut_rate=jnp.asarray(
            mcmc.branch_mut_rates(trees, dist, L + 1, 3e4, 1.25e-8)),
        kc2_pos=jnp.asarray(nl * (nl - 1) / 2.0, jnp.float32),
        epochs=jnp.asarray(epochs),
        rates=jnp.asarray(rt), cumR=jnp.asarray(cumR),
        depth=jnp.asarray(mcmc.tree_depths(parent), jnp.int32))
    return st, parent, cl, cr


def _posterior_moments(st, cl, cr, sweeps, use_vp, seed, snapshots,
                       iters_per):
    """Posterior mean (Kahan running mean over EVERY post-burn-in
    sub-move) and variance (thinned snapshots) of node ages."""
    rng = np.random.default_rng(100 + seed)
    sidx0, order0 = mcmc._initial_orders_batch(cl, cr, N, rng)
    coords0 = mcmc._initial_coords_batch(sidx0, N).astype(np.float32)
    s = mcmc.init_chain_state(coords0, order0, sidx0)
    blk = mcmc._Block(N, M, use_vp, sweeps=sweeps)
    key = jax.random.PRNGKey(seed)
    s = blk.run(st, s, key, 400, False)          # burn-in
    samples = np.empty((snapshots, B, M), np.float64)
    for k in range(snapshots):
        s = blk.run(st, s, jax.random.fold_in(key, k + 1), iters_per,
                    True)
        samples[k] = np.asarray(s.coords, np.float64)
    mean = (np.asarray(s.ssum, np.float64)
            / np.asarray(s.count, np.float64)[:, None])
    return mean, samples.var(axis=0)


@pytest.mark.parametrize("use_vp", [False, True],
                         ids=["constNe", "piecewise"])
def test_sweeps_match_reference_mixture(use_vp):
    """Posterior moments with sweeps on == sweeps off, within MC error.

    Measured noise at these budgets (2026-08, CPU, seeds varied):
    none-vs-none (120k iters each): rel mean 1.6%, q99 6.3%; sweep-vs-
    sweep self-spread (8k iters): mean 4.1-5.5%, q99 16-23%; sweep-vs-
    none: mean 3.1-4.0% — indistinguishable from the self-spread, i.e. no
    detectable bias. Thresholds are ~2x those spreads: a broken Hastings
    term or non-factorizing simultaneous update shifts means by >>10%.
    """
    trees = _tree_batch()
    st, parent, cl, cr = _chain_setup(trees, use_vp)

    m_none, v_none = _posterior_moments(st, cl, cr, "none", use_vp,
                                        seed=1, snapshots=100,
                                        iters_per=400)
    for sweeps, seed in (("age", 2), ("both", 3), ("order", 4)):
        m_s, v_s = _posterior_moments(st, cl, cr, sweeps, use_vp,
                                      seed=seed, snapshots=100,
                                      iters_per=60)
        # internal-node ages only (leaves are pinned at 0)
        a0 = m_none[:, N:]
        a1 = m_s[:, N:]
        scale = np.maximum(a0, 1e-3)
        rel = np.abs(a1 - a0) / scale
        assert rel.mean() < 0.09, (sweeps, rel.mean())
        assert np.quantile(rel, 0.99) < 0.35, (sweeps,
                                               np.quantile(rel, 0.99))
        # variances agree on aggregate (per-node variance MC error is
        # larger; the batch mean pins the overall posterior width)
        s0 = v_none[:, N:].mean()
        s1 = v_s[:, N:].mean()
        assert abs(s1 - s0) / s0 < 0.2, (sweeps, s0, s1)


def _order_position_means(st, cl, cr, sweeps, seed, snapshots, iters_per):
    """Posterior mean sorted POSITION per internal node (thinned
    snapshots) — the order-statistics analog of _posterior_moments."""
    rng = np.random.default_rng(200 + seed)
    sidx0, order0 = mcmc._initial_orders_batch(cl, cr, N, rng)
    coords0 = mcmc._initial_coords_batch(sidx0, N).astype(np.float32)
    s = mcmc.init_chain_state(coords0, order0, sidx0)
    blk = mcmc._Block(N, M, False, sweeps=sweeps)
    key = jax.random.PRNGKey(seed)
    s = blk.run(st, s, key, 400, False)
    acc = np.zeros((B, M), np.float64)
    for k in range(snapshots):
        s = blk.run(st, s, jax.random.fold_in(key, k + 1), iters_per,
                    False)
        acc += np.asarray(s.order, np.float64)
    return (acc / snapshots)[:, N:]


def test_order_statistics_match_reference_mixture():
    """EVENT-ORDER mixing check (the ADVICE r3 concern): posterior mean
    sorted positions with sweeps on must match the pure single-proposal
    mixture within MC error — an under-mixed order (chains stuck near
    their initial linear extension) biases the position means and fails.

    Noise floor measured 2026-08 (CPU, none-vs-none different seeds,
    these budgets): mean abs position diff 0.11, max 0.55 of 11 internal
    slots. Thresholds ~3x that floor."""
    trees = _tree_batch()
    st, parent, cl, cr = _chain_setup(trees, False)
    o_none = _order_position_means(st, cl, cr, "none", 1,
                                   snapshots=120, iters_per=300)
    o_both = _order_position_means(st, cl, cr, "both", 2,
                                   snapshots=120, iters_per=50)
    diff = np.abs(o_both - o_none)
    assert diff.mean() < 0.35, diff.mean()
    assert diff.max() < 1.8, diff.max()


def test_order_sweep_actually_moves_order():
    """The order sweep must deliver order proposals (cprop counts them)
    and actually change sorted assignments — guards against a silently
    dead sweep making the A/B test vacuous."""
    trees = _tree_batch()
    st, parent, cl, cr = _chain_setup(trees, False)
    rng = np.random.default_rng(7)
    sidx0, order0 = mcmc._initial_orders_batch(cl, cr, N, rng)
    coords0 = mcmc._initial_coords_batch(sidx0, N).astype(np.float32)
    s = mcmc.init_chain_state(coords0, order0, sidx0)
    blk = mcmc._Block(N, M, False, sweeps="order")
    s2 = blk.run(st, s, jax.random.PRNGKey(0), 64, True)
    cprop = np.asarray(s2.cprop)[:, N:]
    assert cprop.mean() > 2.0, cprop.mean()      # order proposals counted
    changed = (np.asarray(s2.sorted_idx) != np.asarray(s.sorted_idx)).any(
        axis=1)
    assert changed.mean() > 0.5                  # most chains reordered
