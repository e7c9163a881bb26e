"""Branch-length posterior sampling and whole-chromosome re-estimation.

Behavioral reference: ``include/evaluate/coalescent_rate/
ReEstimateBranchLengths.cpp`` — ReEstimateBranchLengths (:35-407) reruns the
MCMC on a final .anc/.mut under a .coal prior; SampleBranchLengths
(:409-1107) draws posterior samples every ``num_proposals`` (default
``1000*max(N/10,10)``, :683) after an initial converged run, writing
per-sample anc/mut, newick, or the binary .timeb format.

TPU-native: all trees sample in lockstep (vmapped chains); a sample is a
device snapshot of the coordinate vectors.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from ..core import mcmc
from ..core.topology import MutationRecord
from ..core.trees import AncesTree, Tree


def _normalized_prior(epochs, rates):
    rts = np.asarray(rates, dtype=np.float64)
    pos = rts[np.isfinite(rts) & (rts > 0)]
    avg_ne = 1.0 / pos.mean()
    return avg_ne, np.where(np.isfinite(rts) & (rts > 0), rts, 0.0) * avg_ne, \
        np.asarray(epochs, dtype=np.float64) / avg_ne


def reestimate_branch_lengths(anc: AncesTree, muts: List[MutationRecord],
                              dist: np.ndarray, mu: float,
                              epochs: np.ndarray, rates: np.ndarray,
                              seed: int = 1,
                              group_rates: Optional[np.ndarray] = None,
                              memberships: Optional[np.ndarray] = None):
    """Re-run the branch-length MCMC under a .coal prior, in place.

    With ``group_rates`` (E, G, G) and per-haplotype ``memberships``, the
    prior uses pairwise group coalescence rates
    (EstimateBranchLengthsWithSampleAge::MCMCCoalRatesForRelate)."""
    avg_ne, r_norm, e_norm = _normalized_prior(epochs, rates)
    trees = [mt.tree for mt in anc.seq]
    group_R = None
    if group_rates is not None:
        # normalize the pair matrix by the same average Ne so times stay in
        # Ne-generations units (ReEstimateBranchLengths.cpp:202-218)
        gr = np.asarray(group_rates, dtype=np.float64)
        group_R = np.where(np.isfinite(gr) & (gr > 0), gr, 0.0) * avg_ne
    bl = mcmc.run_mcmc(trees, dist.astype(np.float64), len(muts),
                       Ne=avg_ne, mu=mu, seed=seed,
                       epochs=e_norm, rates=r_norm,
                       group_R=group_R, memberships=memberships)
    for i, mt in enumerate(anc.seq):
        mt.tree.branch_length = bl[i]
    return anc


def sample_branch_lengths(anc: AncesTree, muts: List[MutationRecord],
                          dist: np.ndarray, mu: float,
                          epochs: np.ndarray, rates: np.ndarray,
                          num_samples: int = 100,
                          num_proposals: Optional[int] = None,
                          seed: int = 1) -> np.ndarray:
    """Posterior samples of branch lengths for every tree.

    Returns (num_samples, num_trees, 2N-1) branch lengths in generations.
    """
    trees = [mt.tree for mt in anc.seq]
    B = len(trees)
    N = trees[0].N
    M = trees[0].num_nodes
    L = len(muts)
    if num_proposals is None:
        num_proposals = 1000 * int(max(N / 10.0, 10.0))
    avg_ne, r_norm, e_norm = _normalized_prior(epochs, rates)
    delta = int(max(N / 10.0, 10.0))
    rng = np.random.default_rng(seed)

    # build chain state like run_mcmc
    E = len(e_norm)
    rt = np.broadcast_to(np.asarray(r_norm, dtype=np.float64), (B, E))
    cumR = np.zeros((B, E))
    widths = np.diff(e_norm)
    cumR[:, 1:] = np.cumsum(rt[:, : E - 1] * widths, axis=1)
    nl = np.concatenate([np.full(N, N), 2 * N - 1 - np.arange(N, M)])
    kc2 = nl * (nl - 1) / 2.0
    parent = np.stack([t.parent for t in trees])
    st = mcmc.ChainStatic(
        parent=np.asarray(parent, np.int32),
        child_left=np.stack([t.child_left for t in trees]).astype(np.int32),
        child_right=np.stack([t.child_right for t in trees]).astype(np.int32),
        num_events=np.stack([t.num_events for t in trees]).astype(np.float32),
        mut_rate=mcmc.branch_mut_rates(trees, dist, L, avg_ne, mu),
        kc2_pos=kc2.astype(np.float32),
        epochs=np.asarray(e_norm, np.float32),
        rates=rt.astype(np.float32),
        cumR=cumR.astype(np.float32))
    st = jax.tree.map(lambda x: jax.numpy.asarray(x), st)

    coords0 = np.empty((B, M), dtype=np.float32)
    order0 = np.empty((B, M), dtype=np.int32)
    sidx0 = np.empty((B, M), dtype=np.int32)
    for b, t in enumerate(trees):
        si, o = mcmc._initial_order(t, rng)
        coords0[b] = mcmc._initial_coords(si, N)
        order0[b] = o
        sidx0[b] = si
    import jax.numpy as jnp
    state = mcmc.ChainState(
        coords=jnp.asarray(coords0), order=jnp.asarray(order0),
        sorted_idx=jnp.asarray(sidx0),
        ssum=jnp.zeros((B, M), jnp.float32),
        scomp=jnp.zeros((B, M), jnp.float32),
        count=jnp.zeros((B,), jnp.float32),
        cprop=jnp.zeros((B, M), jnp.int32))

    block = mcmc._Block(N, M, True)
    key = jax.random.PRNGKey(seed)
    # burn-in to convergence (the reference's init=1 converged run,
    # SampleBranchLengths -> EstimateBranchLengths init pass)
    state = block.run(st, state, jax.random.fold_in(key, 0),
                      50 * delta, False)
    for rnd in range(1, 2000):
        state = block.run(st, state, jax.random.fold_in(key, 1_000_000 + rnd),
                          max(delta, 128), True)
        if bool(np.asarray(block.converged(st, state)).all()):
            break

    out = np.empty((num_samples, B, M), dtype=np.float64)
    for s in range(num_samples):
        state = block.run(st, state, jax.random.fold_in(key, s + 1),
                          num_proposals, False)
        coords = np.asarray(state.coords, dtype=np.float64)
        bl = np.zeros((B, M))
        for b in range(B):
            p = parent[b]
            selp = p >= 0
            bl[b, selp] = avg_ne * (coords[b, p[selp]] - coords[b, selp])
        out[s] = np.maximum(bl, 0.0)
    return out


def write_newick_samples(path: str, anc: AncesTree, samples: np.ndarray,
                         tree_index: int = 0):
    """One newick line per posterior sample of one tree."""
    with open(path, "w") as f:
        for s in range(samples.shape[0]):
            t = anc.seq[tree_index].tree.copy()
            t.branch_length = samples[s, tree_index]
            f.write(t.to_newick() + "\n")


def write_timeb(path: str, anc: AncesTree, samples: np.ndarray):
    """Binary sample format: header (i32 num_samples, i32 num_trees,
    i32 num_nodes) then f32 node *ages* per (sample, tree, node) — a compact
    column layout readable by numpy (documented self-describing variant of
    the reference's .timeb)."""
    S, T, M = samples.shape
    with open(path, "wb") as f:
        np.asarray([S, T, M], dtype=np.int32).tofile(f)
        for s in range(S):
            for t in range(T):
                tree = anc.seq[t].tree.copy()
                tree.branch_length = samples[s, t]
                tree.coordinates(anc.sample_ages).astype(np.float32).tofile(f)
