"""Pallas merge-scan kernel vs its XLA twin (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relate_tpu.ops.merge_scan import merge_scan_pallas
from relate_tpu.core.topology_device import _merge_scan


@pytest.mark.parametrize("threshold", [1e-6, 5.0])
def test_merge_scan_pallas_matches_xla(threshold):
    # continuous random distances -> unique minima -> tie draws irrelevant,
    # so the two implementations must agree exactly despite different RNGs
    rng = np.random.default_rng(0)
    N = 40
    d = rng.random((N, N)).astype(np.float32) * 100
    np.fill_diagonal(d, 0)
    dcf = rng.random((N, N)).astype(np.float32) * 100
    cis_p, cjs_p, cl_p = merge_scan_pallas(
        jnp.asarray(d), jnp.asarray(dcf), False, threshold, 1e-6, 7,
        interpret=True)
    cis_x, cjs_x, cl_x = _merge_scan(
        jnp.asarray(d), jnp.asarray(dcf), jnp.bool_(False),
        jnp.float32(threshold), jnp.float32(1e-6), jax.random.PRNGKey(7))
    assert np.array_equal(np.asarray(cis_p), np.asarray(cis_x))
    assert np.array_equal(np.asarray(cjs_p), np.asarray(cjs_x))
    assert np.array_equal(np.asarray(cl_p), np.asarray(cl_x))


def test_merge_scan_pallas_cf_mode_structurally_valid():
    rng = np.random.default_rng(1)
    N = 33  # deliberately not a multiple of 8/128: exercises padding
    d = rng.random((N, N)).astype(np.float32) * 100
    np.fill_diagonal(d, 0)
    dcf = rng.random((N, N)).astype(np.float32) * 100
    cis, cjs, clades = merge_scan_pallas(
        jnp.asarray(d), jnp.asarray(dcf), True, 5.0, 5.0, 11,
        interpret=True)
    cis = np.asarray(cis)
    cjs = np.asarray(cjs)
    clades = np.asarray(clades)
    live = set(range(N))
    for t in range(N - 1):
        a, b = int(cis[t]), int(cjs[t])
        assert a in live and b in live and a != b
        live.discard(a)
        live.discard(b)
        live.add(N + t)
    assert live == {2 * N - 2}
    assert clades[-1].sum() == N
