"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

These gate the driver's multi-chip dryrun: `dryrun_multichip(8)` must
compile and execute with real NamedShardings on a genuine 8-device mesh
(conftest.py forces JAX_PLATFORMS=cpu with
--xla_force_host_platform_device_count=8), so a sharding regression fails
CI instead of only surfacing in MULTICHIP_r*.json.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relate_tpu.parallel import mesh as pmesh


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 jax devices")


@needs_8
def test_dryrun_multichip_8():
    counts = pmesh.dryrun(8)
    assert np.isfinite(np.asarray(counts)).all()


@needs_8
def test_coalescence_counts_psum_matches_host():
    mesh = pmesh.default_mesh(8)
    rng = np.random.default_rng(1)
    ages = rng.random((16, 31)).astype(np.float32) * 3.0
    epochs = np.array([0.0, 0.5, 1.0, 2.0], np.float32)
    out = np.asarray(pmesh.coalescence_counts_psum(mesh, ages, epochs))
    e = np.searchsorted(epochs, ages, side="right") - 1
    expect = np.bincount(e.ravel(), minlength=len(epochs)).astype(np.float32)
    np.testing.assert_allclose(out, expect)


@needs_8
def test_shard_batch_replicates_constants():
    from relate_tpu.core import mcmc
    mesh = pmesh.default_mesh(8)
    B, M = 16, 31
    st = mcmc.ChainStatic(
        parent=jnp.zeros((B, M), jnp.int32),
        child_left=jnp.zeros((B, M), jnp.int32),
        child_right=jnp.zeros((B, M), jnp.int32),
        num_events=jnp.zeros((B, M), jnp.float32),
        mut_rate=jnp.zeros((B, M), jnp.float32),
        kc2_pos=jnp.zeros((M,), jnp.float32),   # M=31 does NOT divide 8
        epochs=jnp.zeros((5,), jnp.float32),
        rates=jnp.ones((B, 4), jnp.float32),
        cumR=jnp.zeros((B, 5), jnp.float32))
    placed = pmesh.shard_batch(mesh, st, B)
    from jax.sharding import PartitionSpec as P
    assert placed.parent.sharding.spec == P("shard")
    assert placed.kc2_pos.sharding.spec in (P(), P(None))
    assert placed.epochs.sharding.spec in (P(), P(None))
