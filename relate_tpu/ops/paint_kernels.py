"""Pallas TPU kernels for the Li & Stephens painting scans.

Semantics twin of the ``lax.scan`` kernels in ``core/painting.py``
(behavioral reference ``include/src/fast_painting.cpp``), fused into two
``pallas_call``s that keep the per-target HMM state (alpha/beta row,
logscale, running sum) resident in VMEM across the whole derived-site
sweep. Under XLA the scan pays per-step while-loop and dynamic-slice
overhead on tiny (B, N) blocks; here a grid step is a handful of VPU
passes plus pipelined HBM streams.

Layout notes (TPU lanes are the fastest axis and cannot be cheaply
transposed in-kernel):

- all state is (N, B): copying *sources* in sublanes, *target* haplotypes
  in lanes. Per-target scalars (running sums, logscales, transition
  factors) are then natural (1, B) lane vectors.
- the per-step mismatch indicators are precomputed OUTSIDE the kernel
  (one XLA gather of panel rows, ``painting.make_device_planner``) and
  streamed as a (Dmax, N, B) int8 array; this removes the per-step
  dynamic gather that dominates the XLA scan's step cost.
- both passes iterate PHYSICAL step rows (forward: 0..Dmax-1, backward:
  Dmax-1..0 via a reversed index map). Targets with fewer than Dmax steps
  simply hold their carry on rows >= D[b] (forward) / join at their own
  row D[b]-1 (backward) — no per-target reversal gathers are needed,
  unlike the scan twin's ``take_along_axis`` reorderings.
- K step rows are processed per grid step (inner unrolled loop) to
  amortize pipeline/grid overhead; Dmax must be a multiple of K
  (the caller buckets it).
- logscales accumulate with Kahan compensation (the reference carries
  them in double; plain f32 accumulation drifts ~1e-2 over ~5k steps).
- backward output rows j >= D[b] are ZERO (the scan twin replicates row
  D[b]-1 there); consumers never read those rows (distance assembly
  clamps row+1 reads into discarded ``where`` branches).

Targets are tiled over the leading grid dimension so VMEM holds only a
(N, TB) state slab; each tile runs its own full Dmax sweep.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOWER_RESCALE = 1e-10
UPPER_RESCALE = 1e10


def _f32(x):
    return x.astype(jnp.int32).astype(jnp.float32)


def _fwd_kernel(D_ref, alpha0_ref, kmask_ref, mism_ref, pfacm1_ref,
                nxtm1_ref, alphas_out, lss_out,
                alpha_scr, ls_scr, lsc_scr, asum_scr, *, theta, K):
    """One grid step = K derived-site rows for one target tile.

    Recurrence (fast_painting.cpp:264-378): alpha' = (alpha + rx)*em with
    rx = pfac[j-1]*sum(alpha), em = 1 + theta_ratio*mismatch, rescaled
    into [1e-10, 1e10] with the correction accumulated in the logscale.
    """
    jb = pl.program_id(1)
    theta_ratio = np.float32(theta / (1.0 - theta) - 1.0)
    kmask = kmask_ref[:, :]
    D = D_ref[:, :]

    alpha = alpha_scr[:, :]
    ls = ls_scr[:, :]
    comp = lsc_scr[:, :]
    asum_eff = asum_scr[:, :]
    a0 = alpha0_ref[:, :] * kmask
    for kk in range(K):
        j = jb * K + kk
        is_first = j == 0
        valid = j < D
        rx = asum_eff * pfacm1_ref[kk]
        em = 1.0 + theta_ratio * _f32(mism_ref[kk])
        alpha_new = (alpha + rx) * em * kmask
        asum = jnp.sum(alpha_new, axis=0, keepdims=True)
        cond = (asum < LOWER_RESCALE) | (asum > UPPER_RESCALE)
        safe = jnp.where(asum > 0, asum, 1.0)
        alpha_new = jnp.where(cond, alpha_new / safe, alpha_new)
        logcorr = jnp.where(cond, jnp.log(safe), 0.0)
        asum_eff_new = jnp.where(cond, 1.0, asum)
        # Kahan-compensated logscale accumulation
        y = (nxtm1_ref[kk] + logcorr) - comp
        t = ls + y
        comp_new = (t - ls) - y
        upd = valid & jnp.logical_not(is_first)
        alpha = jnp.where(is_first, a0, jnp.where(upd, alpha_new, alpha))
        ls = jnp.where(is_first, 0.0, jnp.where(upd, t, ls))
        comp = jnp.where(is_first, 0.0, jnp.where(upd, comp_new, comp))
        asum_eff = jnp.where(is_first, jnp.sum(a0, axis=0, keepdims=True),
                             jnp.where(upd, asum_eff_new, asum_eff))
        alphas_out[kk] = alpha
        lss_out[kk] = ls
    alpha_scr[:, :] = alpha
    ls_scr[:, :] = ls
    lsc_scr[:, :] = comp
    asum_scr[:, :] = asum_eff


def _bwd_kernel(D_ref, beta_end_ref, kmask_ref, mism_ref, mism_nxt_ref,
                pfacp1_ref, nxtp1_ref, alphas_ref, lsf_ref,
                topo_out, lstot_out, beta_scr, pls_scr, plsc_scr, bsum_scr,
                *, theta, K, emit_beta=False):
    """Backward + fused posterior, iterating physical rows descending.

    Matches the scan twin on valid rows: a target joins at its own last
    row (beta = beta_end, no rescale, fast_painting.cpp:396-470), the
    transition into row j reads interval j+1 (the reference's
    decrement-after-use quirk), and the emitted posterior row is
    alpha*beta with the PRE-rescale beta. ``mism_nxt_ref`` is a one-row
    view of the mismatch stream at the first row of the block above
    (row j+1 for the block's top row).
    """
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    jb = nblk - 1 - i
    ntheta = np.float32(1.0 - theta)
    theta32 = np.float32(theta)
    theta_ratio = np.float32(theta / (1.0 - theta) - 1.0)
    kmask = kmask_ref[:, :]
    D = D_ref[:, :]

    beta = beta_scr[:, :]
    pls = pls_scr[:, :]
    comp = plsc_scr[:, :]
    bsum_eff = bsum_scr[:, :]
    beta_init = beta_end_ref[:, :] * kmask
    first_blk = i == 0
    for kk in range(K - 1, -1, -1):
        j = jb * K + kk
        is_init = j == D - 1
        is_step = j < D - 1
        active = j < D

        if kk == K - 1:
            dnext = _f32(mism_nxt_ref[0])
            # the very first (highest) block reads uninitialized scratch;
            # every target's chain starts at j = D-1 <= Dmax-1 with the
            # is_init branch, so zero the carries to keep the (discarded)
            # step-branch arithmetic NaN-free.
            beta_c = jnp.where(first_blk, 0.0, beta)
            pls_c = jnp.where(first_blk, 0.0, pls)
            comp_c = jnp.where(first_blk, 0.0, comp)
            bsum_c = jnp.where(first_blk, 1.0, bsum_eff)
        else:
            dnext = _f32(mism_ref[kk + 1])
            beta_c, pls_c, comp_c, bsum_c = beta, pls, comp, bsum_eff

        rx = bsum_c * pfacp1_ref[kk]
        b1 = rx / ntheta
        bt = rx / theta32 - b1
        em_next = 1.0 + theta_ratio * dnext
        beta_step = (beta_c + dnext * bt + b1) * em_next * kmask
        beta_new = jnp.where(is_init, beta_init, beta_step)

        mism_j = _f32(mism_ref[kk])
        w = jnp.where(mism_j > 0, theta32, ntheta)
        bsum = jnp.sum(w * beta_new, axis=0, keepdims=True)
        topo = alphas_ref[kk] * beta_new     # pre-rescale, as the reference
        cond = is_step & ((bsum < LOWER_RESCALE) | (bsum > UPPER_RESCALE))
        safe = jnp.where(bsum > 0, bsum, 1.0)
        beta_fin = jnp.where(cond, beta_new / safe, beta_new)
        logcorr = jnp.where(cond, jnp.log(safe), 0.0)
        bsum_new = jnp.where(cond, 1.0, bsum)
        # Kahan-compensated backward logscale
        pls_old = jnp.where(is_init, 0.0, pls_c)
        comp_old = jnp.where(is_init, 0.0, comp_c)
        inc = jnp.where(is_init, 0.0, nxtp1_ref[kk])
        y = (inc + logcorr) - comp_old
        pls_new = pls_old + y
        comp_new = (pls_new - pls_old) - y
        ls_row = lsf_ref[kk] + pls_new

        beta = jnp.where(active, beta_fin, beta_c)
        pls = jnp.where(active, pls_new, pls_c)
        comp = jnp.where(active, comp_new, comp_c)
        bsum_eff = jnp.where(active, bsum_new, bsum_c)
        if emit_beta:
            # stepping-stone extraction wants the post-rescale beta row and
            # the backward-only logscale (fast_painting.cpp:587-601)
            topo_out[kk] = jnp.where(active, beta_fin, 0.0)
            lstot_out[kk] = jnp.where(active, pls_new, 0.0)
        else:
            topo_out[kk] = jnp.where(active, topo, 0.0)
            lstot_out[kk] = jnp.where(active, ls_row, 0.0)
    beta_scr[:, :] = beta
    pls_scr[:, :] = pls
    plsc_scr[:, :] = comp
    bsum_scr[:, :] = bsum_eff


def _tile(B: int, N: int = 0) -> int:
    """Target-tile width. The per-step VMEM working set scales with N*TB
    (alpha0/kmask residents, K*N*TB streams, N*TB scratch), so TB must
    shrink as N grows: N*TB <= 2^17 keeps the fwd/bwd blocks inside the
    ~16MB scoped-VMEM limit (N=1024, TB=512 measured 19.07M > 16M).
    Pallas requires lane blocks divisible by 128 (or the full width), so
    128 is the floor — at N >= 2048 the K-row chooser compensates by
    dropping to K=1 (per-block working set stays ~2MB/stream)."""
    for tb in (512, 256, 128):
        if B % tb == 0 and (N * tb <= (1 << 17) or tb == 128):
            return tb
    return B


def _krows(Dmax: int, N: int, TB: int) -> int:
    """Rows per grid step: amortize pipeline overhead while keeping the
    double-buffered streams (~4 f32 K*N*TB blocks) within ~8MB of VMEM."""
    k = max(1, (8 << 20) // (4 * 4 * N * TB))
    k = 1 << (k.bit_length() - 1)
    while Dmax % k:
        k >>= 1
    return max(k, 1)


@functools.partial(jax.jit, static_argnames=("theta", "interpret"))
def fwd_pallas(D, alpha0, kmask, mism, pfacm1, nxtm1, *, theta,
               interpret=False):
    """Forward sweep. Shapes: D (1,B) i32; alpha0/kmask (N,B) f32;
    mism (Dmax,N,B) i8; pfacm1/nxtm1 (Dmax,B) f32 (interval j-1 at row j).
    Returns alphas (Dmax,N,B) f32 (post-rescale rows), lss (Dmax,B) f32."""
    Dmax, N, B = mism.shape
    TB = _tile(B, N)
    K = _krows(Dmax, N, TB)
    grid = (B // TB, Dmax // K)
    blk3 = lambda t, j: (j, 0, t)
    alphas, lss3 = pl.pallas_call(
        functools.partial(_fwd_kernel, theta=theta, K=K),
        out_shape=(jax.ShapeDtypeStruct((Dmax, N, B), jnp.float32),
                   jax.ShapeDtypeStruct((Dmax, 1, B), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB), lambda t, j: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), lambda t, j: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), lambda t, j: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N, TB), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), blk3, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((K, N, TB), blk3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((K, 1, TB), blk3, memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((N, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # large-N blocks (N=2048, TB=128) need ~18-24MB of scoped
            # VMEM; the 16MB default is conservative (v5e has 128MB)
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(D, alpha0, kmask, mism, pfacm1[:, None, :], nxtm1[:, None, :])
    return alphas, lss3[:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("theta", "interpret", "emit_beta"))
def bwd_pallas(D, beta_end, kmask, mism, pfacp1, nxtp1, alphas, lsf, *,
               theta, interpret=False, emit_beta=False):
    """Backward + posterior sweep. pfacp1/nxtp1 (Dmax,B): interval j+1 at
    row j. alphas/lsf: the forward outputs. Returns topo (Dmax,N,B) f32
    (zeros on rows >= D[b]), lstot (Dmax,B) f32."""
    Dmax, N, B = mism.shape
    TB = _tile(B, N)
    K = _krows(Dmax, N, TB)
    nblk = Dmax // K
    grid = (B // TB, nblk)
    rev3 = lambda t, i: (nblk - 1 - i, 0, t)
    # one-row stream at the first row of the block above (row j+1 for the
    # top row of each block); clamped on the highest block (unused there).
    # NOTE: index units are rows for this spec (block shape (1, N, TB)).
    nxt_row = lambda t, i: (jnp.minimum((nblk - i) * K, Dmax - 1), 0, t)
    topo, lstot3 = pl.pallas_call(
        functools.partial(_bwd_kernel, theta=theta, K=K,
                          emit_beta=emit_beta),
        out_shape=(jax.ShapeDtypeStruct((Dmax, N, B), jnp.float32),
                   jax.ShapeDtypeStruct((Dmax, 1, B), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), lambda t, i: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N, TB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, TB), nxt_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N, TB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), rev3, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((K, N, TB), rev3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((K, 1, TB), rev3, memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((N, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(D, beta_end, kmask, mism, mism, pfacp1[:, None, :], nxtp1[:, None, :],
      alphas, lsf[:, None, :])
    return topo, lstot3[:, 0, :]


# ---------------------------------------------------------------------------
# Capture-row variants: the stepping-stone passes need ONE row per target
# (the checkpoint at the next window boundary), not the full (Dmax, N, B)
# row stream — at N=2048 that stream is gigabytes per window and OOMs HBM.
# These kernels run the identical recurrences but keep only a captured
# (N, B) slab + (1, B) logscale where the step row equals ``want``.
# The backward capture also needs NO forward outputs (the posterior
# emission is what consumed them), halving the stones' backward cost.
# ---------------------------------------------------------------------------

def _fwd_capture_kernel(D_ref, want_ref, alpha0_ref, kmask_ref, mism_ref,
                        pfacm1_ref, nxtm1_ref, acap_out, lscap_out,
                        alpha_scr, ls_scr, lsc_scr, asum_scr,
                        *, theta, K):
    jb = pl.program_id(1)
    theta_ratio = np.float32(theta / (1.0 - theta) - 1.0)
    kmask = kmask_ref[:, :]
    D = D_ref[:, :]
    want = want_ref[:, :]

    alpha = alpha_scr[:, :]
    ls = ls_scr[:, :]
    comp = lsc_scr[:, :]
    asum_eff = asum_scr[:, :]
    a0 = alpha0_ref[:, :] * kmask
    acap = acap_out[:, :]
    lscap = lscap_out[:, :]
    for kk in range(K):
        j = jb * K + kk
        is_first = j == 0
        valid = j < D
        rx = asum_eff * pfacm1_ref[kk]
        em = 1.0 + theta_ratio * _f32(mism_ref[kk])
        alpha_new = (alpha + rx) * em * kmask
        asum = jnp.sum(alpha_new, axis=0, keepdims=True)
        cond = (asum < LOWER_RESCALE) | (asum > UPPER_RESCALE)
        safe = jnp.where(asum > 0, asum, 1.0)
        alpha_new = jnp.where(cond, alpha_new / safe, alpha_new)
        logcorr = jnp.where(cond, jnp.log(safe), 0.0)
        asum_eff_new = jnp.where(cond, 1.0, asum)
        y = (nxtm1_ref[kk] + logcorr) - comp
        t = ls + y
        comp_new = (t - ls) - y
        upd = valid & jnp.logical_not(is_first)
        alpha = jnp.where(is_first, a0, jnp.where(upd, alpha_new, alpha))
        ls = jnp.where(is_first, 0.0, jnp.where(upd, t, ls))
        comp = jnp.where(is_first, 0.0, jnp.where(upd, comp_new, comp))
        asum_eff = jnp.where(is_first, jnp.sum(a0, axis=0, keepdims=True),
                             jnp.where(upd, asum_eff_new, asum_eff))
        hit = j == want
        acap = jnp.where(is_first, 0.0, acap)
        lscap = jnp.where(is_first, 0.0, lscap)
        acap = jnp.where(hit, alpha, acap)
        lscap = jnp.where(hit, ls, lscap)
    acap_out[:, :] = acap
    lscap_out[:, :] = lscap
    alpha_scr[:, :] = alpha
    ls_scr[:, :] = ls
    lsc_scr[:, :] = comp
    asum_scr[:, :] = asum_eff


@functools.partial(jax.jit, static_argnames=("theta", "interpret"))
def fwd_capture_pallas(D, want, alpha0, kmask, mism, pfacm1, nxtm1, *,
                       theta, interpret=False):
    """Forward sweep capturing the row ``want[b]`` per target: returns
    (acap (N, B) f32, lscap (B,) f32) — no (Dmax, N, B) output."""
    Dmax, N, B = mism.shape
    TB = _tile(B, N)
    K = _krows(Dmax, N, TB)
    grid = (B // TB, Dmax // K)
    blk3 = lambda t, j: (j, 0, t)
    tile2 = lambda t, j: (0, t)
    acap, lscap = pl.pallas_call(
        functools.partial(_fwd_capture_kernel, theta=theta, K=K),
        out_shape=(jax.ShapeDtypeStruct((N, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N, TB), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), blk3, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((N, TB), tile2, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TB), tile2, memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((N, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(D, want, alpha0, kmask, mism, pfacm1[:, None, :], nxtm1[:, None, :])
    return acap, lscap[0]


def _bwd_capture_kernel(D_ref, want_ref, beta_end_ref, kmask_ref, mism_ref,
                        mism_nxt_ref, pfacp1_ref, nxtp1_ref,
                        bcap_out, lscap_out,
                        beta_scr, pls_scr, plsc_scr, bsum_scr,
                        *, theta, K):
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    jb = nblk - 1 - i
    ntheta = np.float32(1.0 - theta)
    theta32 = np.float32(theta)
    theta_ratio = np.float32(theta / (1.0 - theta) - 1.0)
    kmask = kmask_ref[:, :]
    D = D_ref[:, :]
    want = want_ref[:, :]

    beta = beta_scr[:, :]
    pls = pls_scr[:, :]
    comp = plsc_scr[:, :]
    bsum_eff = bsum_scr[:, :]
    beta_init = beta_end_ref[:, :] * kmask
    first_blk = i == 0
    bcap = jnp.where(first_blk, 0.0, bcap_out[:, :])
    lscap = jnp.where(first_blk, 0.0, lscap_out[:, :])
    for kk in range(K - 1, -1, -1):
        j = jb * K + kk
        is_init = j == D - 1
        is_step = j < D - 1
        active = j < D

        if kk == K - 1:
            dnext = _f32(mism_nxt_ref[0])
            beta_c = jnp.where(first_blk, 0.0, beta)
            pls_c = jnp.where(first_blk, 0.0, pls)
            comp_c = jnp.where(first_blk, 0.0, comp)
            bsum_c = jnp.where(first_blk, 1.0, bsum_eff)
        else:
            dnext = _f32(mism_ref[kk + 1])
            beta_c, pls_c, comp_c, bsum_c = beta, pls, comp, bsum_eff

        rx = bsum_c * pfacp1_ref[kk]
        b1 = rx / ntheta
        bt = rx / theta32 - b1
        em_next = 1.0 + theta_ratio * dnext
        beta_step = (beta_c + dnext * bt + b1) * em_next * kmask
        beta_new = jnp.where(is_init, beta_init, beta_step)

        mism_j = _f32(mism_ref[kk])
        w = jnp.where(mism_j > 0, theta32, ntheta)
        bsum = jnp.sum(w * beta_new, axis=0, keepdims=True)
        cond = is_step & ((bsum < LOWER_RESCALE) | (bsum > UPPER_RESCALE))
        safe = jnp.where(bsum > 0, bsum, 1.0)
        beta_fin = jnp.where(cond, beta_new / safe, beta_new)
        logcorr = jnp.where(cond, jnp.log(safe), 0.0)
        bsum_new = jnp.where(cond, 1.0, bsum)
        pls_old = jnp.where(is_init, 0.0, pls_c)
        comp_old = jnp.where(is_init, 0.0, comp_c)
        inc = jnp.where(is_init, 0.0, nxtp1_ref[kk])
        y = (inc + logcorr) - comp_old
        pls_new = pls_old + y
        comp_new = (pls_new - pls_old) - y

        beta = jnp.where(active, beta_fin, beta_c)
        pls = jnp.where(active, pls_new, pls_c)
        comp = jnp.where(active, comp_new, comp_c)
        bsum_eff = jnp.where(active, bsum_new, bsum_c)
        hit = (j == want) & active
        bcap = jnp.where(hit, beta_fin, bcap)
        lscap = jnp.where(hit, pls_new, lscap)
    bcap_out[:, :] = bcap
    lscap_out[:, :] = lscap
    beta_scr[:, :] = beta
    pls_scr[:, :] = pls
    plsc_scr[:, :] = comp
    bsum_scr[:, :] = bsum_eff


@functools.partial(jax.jit, static_argnames=("theta", "interpret"))
def bwd_capture_pallas(D, want, beta_end, kmask, mism, pfacp1, nxtp1, *,
                       theta, interpret=False):
    """Backward sweep capturing the POST-rescale beta row ``want[b]`` and
    the backward-only logscale there (the stepping-stone checkpoint,
    fast_painting.cpp:587-601). Needs no forward outputs. Returns
    (bcap (N, B) f32, lscap (B,) f32)."""
    Dmax, N, B = mism.shape
    TB = _tile(B, N)
    K = _krows(Dmax, N, TB)
    nblk = Dmax // K
    grid = (B // TB, nblk)
    rev3 = lambda t, i: (nblk - 1 - i, 0, t)
    nxt_row = lambda t, i: (jnp.minimum((nblk - i) * K, Dmax - 1), 0, t)
    tile2 = lambda t, i: (0, t)
    bcap, lscap = pl.pallas_call(
        functools.partial(_bwd_capture_kernel, theta=theta, K=K),
        out_shape=(jax.ShapeDtypeStruct((N, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TB), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N, TB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, TB), nxt_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, TB), rev3, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((N, TB), tile2, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TB), tile2, memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((N, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
            pltpu.VMEM((1, TB), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(D, want, beta_end, kmask, mism, mism, pfacp1[:, None, :],
      nxtp1[:, None, :])
    return bcap, lscap[0]
