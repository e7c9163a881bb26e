"""Multi-chip sharding of the Relate pipeline.

The reference's entire distributed story is shell-level job arrays over a
shared filesystem (SURVEY §2.5: chunks x sections via SGE/Slurm/LSF, with
"write per-shard matrices, sum in a finalize step" as the all-reduce). The
TPU-native replacement:

- **targets axis** (haplotypes being painted): embarrassingly parallel —
  sharded across devices over ICI; each device paints its target shard
  against the replicated genotype panel.
- **trees axis** (branch-length MCMC chains): independent chains, sharded
  across devices.
- **chunks axis** (genome): data-parallel across hosts (DCN); artifacts
  merged at host 0 in Finalize.
- **reductions** (coalescence count/opportunity matrices, EM sufficient
  statistics): ``jax.lax.psum`` over the device mesh instead of the
  reference's filesystem sum (SummarizeCoalescentRateForGenome.cpp).

``multichip_step`` is the canonical sharded step used by the driver's
multi-chip dry run: a painting forward pass sharded over targets, an MCMC
proposal block sharded over trees, and a psum'd count-matrix reduction.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import mcmc, painting
from ..core.trees import Tree


def default_mesh(n_devices: Optional[int] = None,
                 axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "shard"):
    """Place a pytree of arrays with the leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_paint_fn(mesh: Mesh, model: painting.PaintingModel,
                          axis: str = "shard"):
    """Painting forward pass with the target-batch axis sharded over the
    mesh; G replicated. Returns a jitted fn of
    (G, idx, seqk, pfac, nxt, D, kmask, alpha0)."""
    fwd, _, _ = painting.make_painting_kernels(model)
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))

    def fn(G, idx, seqk, pfac, nxt, D, kmask, alpha0):
        return fwd(G, idx, seqk, pfac, nxt, D, kmask, alpha0)

    return jax.jit(
        fn,
        in_shardings=(repl, row, row, row, row, row, row, row),
        out_shardings=(NamedSharding(mesh, P(None, axis)),
                       NamedSharding(mesh, P(None, axis))))


def coalescence_counts_psum(ages_sharded, epochs, axis: str = "shard"):
    """Per-epoch coalescence-event counts, reduced with psum across the mesh
    (replacing the reference's per-chromosome .bin sum,
    SummarizeCoalescentRateForGenome.cpp:8)."""

    def local(ages):
        e = jnp.searchsorted(epochs, ages, side="right") - 1
        onehot = jax.nn.one_hot(e, len(epochs), dtype=jnp.float32)
        counts = onehot.sum(axis=(0, 1))
        return jax.lax.psum(counts, axis)

    return local(ages_sharded)


def multichip_step(mesh: Mesh, model: painting.PaintingModel,
                   paint_args, mcmc_static: mcmc.ChainStatic,
                   mcmc_state: mcmc.ChainState, key, epochs,
                   axis: str = "shard"):
    """One full sharded pipeline step:
    paint (targets sharded) -> MCMC proposals (trees sharded) ->
    coalescence-count psum (the EM sufficient statistic all-reduce).
    """
    N = int(mcmc_static.parent.shape[1] + 1) // 2
    M = int(mcmc_static.parent.shape[1])
    step = mcmc.make_step_fn(N, M, False)

    @partial(jax.jit,
             out_shardings=(NamedSharding(mesh, P(None, axis)),
                            None, None))
    def run(G, idx, seqk, pfac, nxt, D, kmask, alpha0, st, s, key):
        fwd, _, _ = painting.make_painting_kernels(model)
        alphas, ls = fwd(G, idx, seqk, pfac, nxt, D, kmask, alpha0)
        s2 = step(st, s, key, True)

        def count_fn(coords):
            e = jnp.searchsorted(epochs, coords, side="right") - 1
            onehot = jax.nn.one_hot(e, len(epochs), dtype=jnp.float32)
            return onehot.sum(axis=(0, 1))

        counts = count_fn(s2.coords)
        return alphas, s2, counts

    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))
    G, idx, seqk, pfac, nxt, D, kmask, alpha0 = paint_args
    G = jax.device_put(G, repl)
    paint_sharded = [jax.device_put(x, row)
                     for x in (idx, seqk, pfac, nxt, D, kmask, alpha0)]
    st = shard_batch(mesh, mcmc_static._replace(
        kc2_pos=np.asarray(mcmc_static.kc2_pos),
        epochs=np.asarray(mcmc_static.epochs)), axis)
    # non-batch fields replicated
    st = st._replace(kc2_pos=jax.device_put(np.asarray(mcmc_static.kc2_pos),
                                            repl),
                     epochs=jax.device_put(np.asarray(mcmc_static.epochs),
                                           repl))
    s = shard_batch(mesh, mcmc_state, axis)
    return run(G, *paint_sharded, st, s, key)


def dryrun(n_devices: int):
    """Compile-and-run a full multi-chip step on tiny shapes.

    Builds an ``n_devices`` mesh, shards the painting target axis and the
    MCMC tree axis across it, jits the combined step with real
    NamedShardings, and executes one step.
    """
    mesh = default_mesh(n_devices)
    rng = np.random.default_rng(0)
    # tiny panel: N=16 haps x L=64 SNPs; targets = all haps
    N, L = 16, 64
    G = (rng.random((L, N)) < 0.3).astype(np.uint8)
    r = np.full(L, 1e-4)
    model = painting.PaintingModel(N=N, theta=0.001)
    plan = painting.build_target_plan(G, r, model, 0, L - 1)
    alpha0 = painting.initial_alpha(G, model, 0, plan.targets)
    paint_args = (jnp.asarray(G), jnp.asarray(plan.idx),
                  jnp.asarray(plan.seqk), jnp.asarray(plan.pfac),
                  jnp.asarray(plan.nxt), jnp.asarray(plan.D),
                  jnp.asarray(plan.kmask), jnp.asarray(alpha0))

    # tiny tree batch: one tree per device x 2
    B = 2 * n_devices
    from ..core.treebuilder import quick_build
    d = rng.random((N, N)).astype(np.float32)
    tree = quick_build(d, theta=0.01)
    trees = [tree] * B
    dist = np.ones(L)
    M = tree.num_nodes

    nl = np.concatenate([np.full(N, N), 2 * N - 1 - np.arange(N, M)])
    kc2 = (nl * (nl - 1) / 2.0).astype(np.float32)
    st = mcmc.ChainStatic(
        parent=jnp.asarray(np.stack([t.parent for t in trees])),
        child_left=jnp.asarray(np.stack([t.child_left for t in trees])),
        child_right=jnp.asarray(np.stack([t.child_right for t in trees])),
        num_events=jnp.zeros((B, M), jnp.float32),
        mut_rate=jnp.asarray(mcmc.branch_mut_rates(trees, dist, L, 3e4,
                                                   1e-8)),
        kc2_pos=jnp.asarray(kc2),
        epochs=jnp.asarray([0.0, np.inf], jnp.float32),
        rates=jnp.ones((B, 1), jnp.float32),
        cumR=jnp.zeros((B, 2), jnp.float32))
    coords0 = np.zeros((B, M), np.float32)
    order0 = np.zeros((B, M), np.int32)
    sidx0 = np.zeros((B, M), np.int32)
    for b in range(B):
        si, o = mcmc._initial_order(tree, np.random.default_rng(b))
        coords0[b] = mcmc._initial_coords(si, N)
        order0[b] = o
        sidx0[b] = si
    s = mcmc.ChainState(
        coords=jnp.asarray(coords0), order=jnp.asarray(order0),
        sorted_idx=jnp.asarray(sidx0),
        ssum=jnp.zeros((B, M), jnp.float32),
        scomp=jnp.zeros((B, M), jnp.float32),
        count=jnp.zeros((B,), jnp.float32),
        cprop=jnp.zeros((B, M), jnp.int32))

    epochs = jnp.asarray([0.0, 0.5, 1.0, 2.0], jnp.float32)
    alphas, s2, counts = multichip_step(mesh, model, paint_args, st, s,
                                        jax.random.PRNGKey(0), epochs)
    jax.block_until_ready((alphas, s2.coords, counts))
    assert np.isfinite(np.asarray(counts)).all()
    return counts
