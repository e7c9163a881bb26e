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


def test_merge_scan_large_variant_matches_small(monkeypatch):
    """The HBM-input large-N kernel (same tie-break hash, clades rebuilt
    off-chip) must produce IDENTICAL merges and clades to the all-VMEM
    kernel for the same seed — the N>1024 fast path is not a silent
    approximation (VERDICT r4 #2)."""
    monkeypatch.delenv("RELATE_TPU_MERGE_LARGE", raising=False)
    rng = np.random.default_rng(5)
    N = 48
    d = rng.random((N, N)).astype(np.float32) * 100
    np.fill_diagonal(d, 0)
    dcf = rng.random((N, N)).astype(np.float32) * 100
    small = merge_scan_pallas(jnp.asarray(d), jnp.asarray(dcf), True,
                              5.0, 5.0, 13, interpret=True)
    monkeypatch.setenv("RELATE_TPU_MERGE_LARGE", "1")
    large = merge_scan_pallas(jnp.asarray(d), jnp.asarray(dcf), True,
                              5.0, 5.0, 13, interpret=True)
    for a, b in zip(small, large):
        assert np.array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Painting kernels (ops/paint_kernels.py) vs the lax.scan twin
# ---------------------------------------------------------------------------

def _paint_fixture(seed=3, N=8, L=64):
    from relate_tpu.core import painting
    rng = np.random.default_rng(seed)
    G = (rng.random((L, N)) < 0.3).astype(np.uint8)
    r = rng.random(L) * 0.05
    model = painting.PaintingModel(N=N, theta=0.001)
    return painting, G, r, model


def _kernel_inputs(painting, G, r, model, plan, alpha0, beta_end,
                   Bp=128, Np=32):
    """Assemble padded kernel-layout inputs from a host TargetPlan."""
    L, N = G.shape
    B, Dmax = plan.idx.shape
    idx = np.zeros((Bp, Dmax), np.int32); idx[:B] = plan.idx
    seqk = np.zeros((Bp, Dmax), np.uint8); seqk[:B] = plan.seqk
    D = np.zeros(Bp, np.int32); D[:B] = plan.D
    Gp = np.zeros((L, Np), np.uint8); Gp[:, :N] = G
    grows = Gp[idx.T.reshape(-1)].reshape(Dmax, Bp, Np)
    mism = (seqk.T[:, :, None] > grows).astype(np.int8).transpose(0, 2, 1)
    pfacT = np.zeros((Dmax, Bp), np.float32); pfacT[:, :B] = plan.pfac.T
    nxtT = np.zeros((Dmax, Bp), np.float32); nxtT[:, :B] = plan.nxt.T
    z = np.zeros((1, Bp), np.float32)
    shifts = (np.concatenate([z, pfacT[:-1]]), np.concatenate([z, nxtT[:-1]]),
              np.concatenate([pfacT[1:], z]), np.concatenate([nxtT[1:], z]))
    a0 = np.zeros((Np, Bp), np.float32); a0[:N, :B] = np.asarray(alpha0).T
    be = np.zeros((Np, Bp), np.float32); be[:N, :B] = np.asarray(beta_end).T
    kmask = np.zeros((Np, Bp), np.float32)
    for b in range(B):
        kmask[:N, b] = plan.kmask[b]
    return D, mism, shifts, a0, be, kmask


def test_paint_pallas_kernels_match_scan():
    """fwd/bwd Pallas kernels (interpret) == the lax.scan twins on all
    valid rows; backward padding rows are zero by contract."""
    from relate_tpu.ops import paint_kernels
    painting, G, r, model = _paint_fixture()
    L, N = G.shape
    plan = painting.build_target_plan(G, r, model, 0, L - 1)
    alpha0 = painting.initial_alpha(G, model, 0, np.arange(N, dtype=np.int32))
    beta_end = np.ones((N, N), np.float32)
    painter = painting.Painter(G, r, model)
    dev = painter._plan_dev(plan)
    a_all, lss = painter._run_fwd(plan, alpha0, dev)
    topo_s, lstot_s, _, _ = painter._run_bwd(plan, a_all, lss, beta_end, dev)
    a_all, lss = np.asarray(a_all), np.asarray(lss)
    topo_s, lstot_s = np.asarray(topo_s), np.asarray(lstot_s)

    D, mism, shifts, a0, be, kmask = _kernel_inputs(
        painting, G, r, model, plan, alpha0, beta_end)
    pfacm1, nxtm1, pfacp1, nxtp1 = (jnp.asarray(x) for x in shifts)
    al_k, ls_k = paint_kernels.fwd_pallas(
        jnp.asarray(D[None, :]), jnp.asarray(a0), jnp.asarray(kmask),
        jnp.asarray(mism), pfacm1, nxtm1, theta=model.theta, interpret=True)
    topo_k, lstot_k = paint_kernels.bwd_pallas(
        jnp.asarray(D[None, :]), jnp.asarray(be), jnp.asarray(kmask),
        jnp.asarray(mism), pfacp1, nxtp1, al_k, ls_k,
        theta=model.theta, interpret=True)
    al_k, ls_k = np.asarray(al_k), np.asarray(ls_k)
    topo_k, lstot_k = np.asarray(topo_k), np.asarray(lstot_k)
    for b in range(N):
        d = plan.D[b]
        np.testing.assert_allclose(al_k[:d, :N, b], a_all[:d, b, :],
                                   rtol=1e-5, atol=1e-30)
        np.testing.assert_allclose(ls_k[:d, b], lss[:d, b],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(topo_k[:d, :N, b], topo_s[:d, b, :],
                                   rtol=1e-5, atol=1e-30)
        np.testing.assert_allclose(lstot_k[:d, b], lstot_s[:d, b],
                                   rtol=1e-5, atol=1e-4)


def test_device_planner_matches_host_plan():
    """make_device_planner == build_target_plan (idx/seqk/D exactly,
    pfac/nxt within two-float f32 tolerance)."""
    from relate_tpu.core import painting
    painting_mod, G, r, model = _paint_fixture(seed=11, N=8, L=200)
    L, N = G.shape
    targets = np.arange(N, dtype=np.int32)
    plan = painting_mod.build_target_plan(G, r, model, 0, L - 1, targets)
    planner = painting_mod.make_device_planner(model)
    S = np.zeros(L + 1); np.cumsum(r, out=S[1:])
    S_hi = S.astype(np.float32)
    S_lo = (S - S_hi.astype(np.float64)).astype(np.float32)
    Dmax = int(plan.D.max())
    fin = np.full(N, r[L - 1], np.float32)
    GT = jnp.asarray(np.ascontiguousarray(G.T))
    idx_d, seqk_d, D_d, mismT, shifts, kmaskT = planner(
        jnp.asarray(G), GT, jnp.asarray(S_hi), jnp.asarray(S_lo),
        jnp.asarray(targets), jnp.zeros(N, jnp.int32),
        jnp.full(N, L - 1, jnp.int32), jnp.asarray(fin), N, Dmax=Dmax)
    assert np.array_equal(np.asarray(idx_d), plan.idx)
    assert np.array_equal(np.asarray(seqk_d), plan.seqk)
    assert np.array_equal(np.asarray(D_d), plan.D)
    mism_ref = (plan.seqk.T[:, :, None]
                > G[plan.idx.T]).astype(np.int8).transpose(0, 2, 1)
    assert np.array_equal(np.asarray(mismT), mism_ref)
    pfacm1 = np.asarray(shifts[0])
    np.testing.assert_allclose(pfacm1[1:], plan.pfac.T[:-1], rtol=2e-5,
                               atol=1e-12)
    nxtm1 = np.asarray(shifts[1])
    np.testing.assert_allclose(nxtm1[1:], plan.nxt.T[:-1], rtol=1e-5,
                               atol=1e-6)
    assert np.array_equal(np.asarray(kmaskT).T, plan.kmask)
