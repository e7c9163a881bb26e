"""Pairwise group-rate MCMC prior (MCMCCoalRatesForRelate twin)."""
import numpy as np
import jax
import jax.numpy as jnp

from relate_tpu.core import mcmc
from relate_tpu.core.trees import Tree


def _random_tree(N, seed):
    """Random binary coalescent-ish topology as a Tree."""
    rng = np.random.default_rng(seed)
    M = 2 * N - 1
    parent = np.full(M, -1, np.int32)
    cl = np.full(M, -1, np.int32)
    cr = np.full(M, -1, np.int32)
    active = list(range(N))
    nxt = N
    while len(active) > 1:
        i, j = sorted(rng.choice(len(active), 2, replace=False))
        a, b = active[i], active[j]
        parent[a] = parent[b] = nxt
        cl[nxt], cr[nxt] = a, b
        active = [x for x in active if x not in (a, b)] + [nxt]
        nxt += 1
    t = Tree(parent=parent, child_left=cl, child_right=cr,
             branch_length=np.zeros(M),
             num_events=rng.poisson(2.0, M).astype(np.float32),
             SNP_begin=np.zeros(M, np.int32),
             SNP_end=np.full(M, 10, np.int32))
    return t


def _chain_inputs(N, seed, G, epochs, rates_scalar):
    tree = _random_tree(N, seed)
    M = 2 * N - 1
    rng = np.random.default_rng(seed + 1)
    si, order = mcmc._initial_order(tree, rng)
    coords = mcmc._initial_coords(si, N)
    return tree, si, order, coords


def test_pair_prior_reduces_to_scalar_prior():
    """With one group the level intensity 0.5*(S^T R S - <D, R>) equals
    C(nl,2)*rate, so _prior_window_pair must equal _prior_window exactly."""
    N = 6
    M = 2 * N - 1
    epochs = np.array([0.0, 0.3, 0.8, 1.5])
    rates = np.array([1.0, 2.5, 0.7, 1.2])
    tree, si, order, coords = _chain_inputs(N, 0, 1, epochs, rates)

    E = len(epochs)
    cumR = np.zeros((1, E))
    cumR[:, 1:] = np.cumsum(rates[: E - 1] * np.diff(epochs))
    Rg = rates[:, None, None]
    cumIR = cumR[0][:, None, None]
    F = mcmc.group_fractions([tree], np.zeros(N, np.int64), 1)
    st = mcmc.ChainStatic(
        parent=jnp.asarray(tree.parent[None], jnp.int32),
        child_left=jnp.asarray(tree.child_left[None], jnp.int32),
        child_right=jnp.asarray(tree.child_right[None], jnp.int32),
        num_events=jnp.asarray(tree.num_events[None], jnp.float32),
        mut_rate=jnp.ones((1, M), jnp.float32),
        kc2_pos=jnp.zeros(M, jnp.float32),
        epochs=jnp.asarray(epochs, jnp.float32),
        rates=jnp.asarray(rates[None], jnp.float32),
        cumR=jnp.asarray(cumR, jnp.float32),
        F=jnp.asarray(F), Rg=jnp.asarray(Rg, jnp.float32),
        cumIRg=jnp.asarray(cumIR, jnp.float32))

    cs = jnp.asarray(coords[si], jnp.float32)
    sidx = jnp.asarray(si, jnp.int32)
    kc2 = mcmc._kc2_from_sorted(sidx, N)
    leaf = sidx < N
    for lo, hi in [(0, M - 1), (2, 7), (N - 1, M - 1)]:
        ref = mcmc._prior_window(st, 0, cs, lo, hi, kc2, leaf)
        got = mcmc._prior_window_pair(st, 0, N, cs, sidx, lo, hi)
        np.testing.assert_allclose(float(got), float(ref),
                                   rtol=2e-5, atol=2e-5)


def test_run_mcmc_pair_prior_smoke():
    """Two asymmetric groups: chains converge and return finite positive
    branch lengths; within-group rate >> cross-group rate should push
    cross-group coalescences older on average."""
    N = 8
    trees = [_random_tree(N, s) for s in range(3)]
    L = 16
    dist = np.ones(L)
    epochs = np.array([0.0, 0.5, 2.0])
    G = 2
    R = np.zeros((3, G, G))
    R[:, 0, 0] = R[:, 1, 1] = 2.0
    R[:, 0, 1] = R[:, 1, 0] = 0.25
    memb = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    bl = mcmc.run_mcmc(trees, dist, L, Ne=1.0, mu=0.05, seed=3,
                       epochs=epochs, rates=np.array([1.0, 1.0, 1.0]),
                       group_R=R, memberships=memb, max_rounds=50)
    assert np.isfinite(bl).all()
    assert (bl >= 0).all()
    assert bl[:, :-1].max() > 0
