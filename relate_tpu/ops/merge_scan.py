"""Pallas TPU kernel for the MinMatch merge scan.

The merge loop (N-1 sequential steps of masked-min candidate selection +
cluster-size-weighted rank-1 distance updates; semantics of
``core/treebuilder._quick_build_scan`` / ``core/topology_device._merge_scan``,
behavioral reference ``include/src/tree_builder.cpp``) is the hot inner
kernel of tree building. Under XLA each step is ~20 separate full-matrix VPU
passes with fusion-boundary overhead; this kernel keeps all state resident
in VMEM and fuses the entire loop into one ``pallas_call``.

TPU-shape tricks used here (lanes cannot be dynamically indexed or cheaply
transposed):

- the distance matrix ``d`` AND its transpose ``dt`` are both maintained;
  every "column" quantity is computed from ``dt`` rows.
- row-minima are needed both as an (N, 1) sublane vector (reduce d over
  axis 1) and as a (1, N) lane vector (reduce the masked ``dt`` over
  axis 0) — never via transposing an (N, 1).
- the column update ``d[:, j] = w*d[:, i] + (1-w)*d[:, j]`` is a masked
  row-sum: ``(d * s_row).sum(axis=1, keepdims=True)`` with the selector
  ``s_row = w·[col==i] + (1-w)·[col==j]``, written back with a lane mask.
- cluster sizes / node-id relabels live in SMEM (dynamic scalar indexing).
- tie-breaking uses a symmetric elementwise integer hash of
  (min(a,b), max(a,b), step, seed) — deterministic given the seed, but not
  draw-for-draw identical to the XLA path's ``jax.random`` ties (documented
  deviation; ties are seed-level noise in both).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

INF = np.float32(3.0e38)


def _kernel(iparams_ref, fparams_ref, d_in, dt_in, dcf_in, dcft_in,
            cis_ref, cjs_ref, clades_ref,
            d_ref, dt_ref, dcf_ref, dcft_ref,
            act_row, act_col, csets, sizes, conv):
    N = d_ref.shape[0]
    seed = iparams_ref[0]
    use_cf = iparams_ref[1] > 0
    n_real = iparams_ref[2]
    threshold = fparams_ref[0]
    threshold_cf = fparams_ref[1]

    d_ref[:, :] = d_in[:, :]
    dt_ref[:, :] = dt_in[:, :]
    dcf_ref[:, :] = dcf_in[:, :]
    dcft_ref[:, :] = dcft_in[:, :]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    offdiag = col_ids != row_ids
    col1N = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    rowN1 = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

    act_row[:, :] = (col1N < n_real).astype(jnp.float32)
    act_col[:, :] = (rowN1 < n_real).astype(jnp.float32)
    csets[:, :] = (col_ids == row_ids).astype(jnp.float32)
    for s in range(sizes.shape[0]):
        sizes[s] = 1.0
        conv[s] = s

    def step(t, _):
        mask2 = (act_col[:, :] > 0.5) & (act_row[:, :] > 0.5) & offdiag
        d = d_ref[:, :]
        dt = dt_ref[:, :]
        # row minima of d, as a column vector and (via the masked transpose,
        # reduced over sublanes) as a lane vector
        mv_col = jnp.min(jnp.where(mask2, d, INF), axis=1,
                         keepdims=True) + threshold
        mv_row = jnp.min(jnp.where(mask2, dt, INF), axis=0,
                         keepdims=True) + threshold
        within = d <= mv_col            # d[a,b] within row-a band
        within_t = dt <= mv_row         # d[b,a] within row-b band
        mutual = mask2 & within & within_t

        dcf = dcf_ref[:, :]
        dcft = dcft_ref[:, :]
        mvcf_col = jnp.min(jnp.where(mask2, dcf, INF), axis=1,
                           keepdims=True) + threshold_cf
        mvcf_row = jnp.min(jnp.where(mask2, dcft, INF), axis=0,
                           keepdims=True) + threshold_cf
        cfmut = (dcf <= mvcf_col) & (dcft <= mvcf_row)

        sym = d + dt
        score = jnp.where(use_cf & cfmut, 0.0, sym)
        eff_mut = jnp.where(mutual, score, INF)
        have = jnp.min(eff_mut) < INF
        eff = jnp.where(have, eff_mut,
                        jnp.where(mask2, sym, INF))

        # symmetric per-step hash for tie-breaking
        lo = jnp.minimum(row_ids, col_ids)
        hi = jnp.maximum(row_ids, col_ids)
        h = lo * jnp.int32(-1640531527) + hi * jnp.int32(-2048144789)
        h = h ^ (seed * jnp.int32(747796405) + t * jnp.int32(374761393))
        h = h ^ jax.lax.shift_right_logical(h, 15)
        h = h * jnp.int32(739213477)
        h = h ^ jax.lax.shift_right_logical(h, 12)
        tie = (h & jnp.int32(0x7FFFFF)).astype(jnp.float32)

        m = jnp.min(eff)
        tsel = jnp.where(eff == m, tie, INF)
        best = jnp.min(tsel)
        flat = jnp.where(tsel == best, row_ids * N + col_ids,
                         jnp.int32(N * N - 1))
        idx = jnp.min(flat)
        a = idx // N
        b = idx % N
        i = jnp.minimum(a, b)
        j = jnp.maximum(a, b)

        si = sizes[i]
        sj = sizes[j]
        w = si / (si + sj)
        s_row = jnp.where(col1N == i, w,
                          jnp.where(col1N == j, 1.0 - w, 0.0))
        colj = col_ids == j

        # d: row j then column j (matches the XLA twin's update order;
        # discrepancies only on masked entries — see module docstring)
        d_ref[j, :] = w * d_ref[i, :] + (1.0 - w) * d_ref[j, :]
        new_col = jnp.sum(d_ref[:, :] * s_row, axis=1, keepdims=True)
        d_ref[:, :] = jnp.where(colj, new_col, d_ref[:, :])
        # dt mirrors: its row j is d's column j, its column j is d's row j
        dt_ref[j, :] = w * dt_ref[i, :] + (1.0 - w) * dt_ref[j, :]
        new_colt = jnp.sum(dt_ref[:, :] * s_row, axis=1, keepdims=True)
        dt_ref[:, :] = jnp.where(colj, new_colt, dt_ref[:, :])

        dcf_ref[j, :] = w * dcf_ref[i, :] + (1.0 - w) * dcf_ref[j, :]
        new_ccol = jnp.sum(dcf_ref[:, :] * s_row, axis=1, keepdims=True)
        dcf_ref[:, :] = jnp.where(colj, new_ccol, dcf_ref[:, :])
        dcft_ref[j, :] = w * dcft_ref[i, :] + (1.0 - w) * dcft_ref[j, :]
        new_ccolt = jnp.sum(dcft_ref[:, :] * s_row, axis=1, keepdims=True)
        dcft_ref[:, :] = jnp.where(colj, new_ccolt, dcft_ref[:, :])

        clade = csets[i, :] + csets[j, :]
        csets[j, :] = clade
        clades_ref[t, :] = clade
        cis_ref[t] = conv[i]
        cjs_ref[t] = conv[j]

        act_row[:, :] = jnp.where(col1N == i, 0.0, act_row[:, :])
        act_col[:, :] = jnp.where(rowN1 == i, 0.0, act_col[:, :])
        sizes[j] = si + sj
        conv[j] = n_real + t
        return 0

    jax.lax.fori_loop(0, n_real - 1, step, 0)


def _kernel_large(iparams_ref, fparams_ref, d_in, dt_in, dcf_in, dcft_in,
                  cis_ref, cjs_ref,
                  d_ref, dt_ref, dcf_ref, dcft_ref,
                  act_row, act_col, sizes, conv, dma_sems):
    """Large-N variant (VERDICT r4: lift the N<=1024 cap): inputs stay in
    HBM and are DMA'd into the four VMEM scratch matrices; no clade-set
    matrix or clade output lives on chip — the (N-1, N) clade indicators
    are reconstructed OUTSIDE the kernel from the merge lists
    (``clades_from_merges``), which removes ~2 N^2 floats of VMEM and
    lets N=2048 fit v5e's 128MB VMEM (4 x 16.8MB matrices + ~47MB of
    step-body temporaries); N beyond MAX_N_LARGE routes to the
    incremental HBM-resident kernel (``merge_scan_incremental``)."""
    N = d_ref.shape[0]
    seed = iparams_ref[0]
    use_cf = iparams_ref[1] > 0
    n_real = iparams_ref[2]
    threshold = fparams_ref[0]
    threshold_cf = fparams_ref[1]

    copies = [
        pltpu.make_async_copy(d_in, d_ref, dma_sems.at[0]),
        pltpu.make_async_copy(dt_in, dt_ref, dma_sems.at[1]),
        pltpu.make_async_copy(dcf_in, dcf_ref, dma_sems.at[2]),
        pltpu.make_async_copy(dcft_in, dcft_ref, dma_sems.at[3]),
    ]
    for c in copies:
        c.start()

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    offdiag = col_ids != row_ids
    col1N = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    rowN1 = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

    act_row[:, :] = (col1N < n_real).astype(jnp.float32)
    act_col[:, :] = (rowN1 < n_real).astype(jnp.float32)

    def init_smem(s, _):
        sizes[s] = 1.0
        conv[s] = s
        return 0
    jax.lax.fori_loop(0, sizes.shape[0], init_smem, 0)
    for c in copies:
        c.wait()

    def step(t, _):
        mask2 = (act_col[:, :] > 0.5) & (act_row[:, :] > 0.5) & offdiag
        d = d_ref[:, :]
        dt = dt_ref[:, :]
        mv_col = jnp.min(jnp.where(mask2, d, INF), axis=1,
                         keepdims=True) + threshold
        mv_row = jnp.min(jnp.where(mask2, dt, INF), axis=0,
                         keepdims=True) + threshold
        within = d <= mv_col
        within_t = dt <= mv_row
        mutual = mask2 & within & within_t

        dcf = dcf_ref[:, :]
        dcft = dcft_ref[:, :]
        mvcf_col = jnp.min(jnp.where(mask2, dcf, INF), axis=1,
                           keepdims=True) + threshold_cf
        mvcf_row = jnp.min(jnp.where(mask2, dcft, INF), axis=0,
                           keepdims=True) + threshold_cf
        cfmut = (dcf <= mvcf_col) & (dcft <= mvcf_row)

        sym = d + dt
        score = jnp.where(use_cf & cfmut, 0.0, sym)
        eff_mut = jnp.where(mutual, score, INF)
        have = jnp.min(eff_mut) < INF
        eff = jnp.where(have, eff_mut,
                        jnp.where(mask2, sym, INF))

        lo = jnp.minimum(row_ids, col_ids)
        hi = jnp.maximum(row_ids, col_ids)
        h = lo * jnp.int32(-1640531527) + hi * jnp.int32(-2048144789)
        h = h ^ (seed * jnp.int32(747796405) + t * jnp.int32(374761393))
        h = h ^ jax.lax.shift_right_logical(h, 15)
        h = h * jnp.int32(739213477)
        h = h ^ jax.lax.shift_right_logical(h, 12)
        tie = (h & jnp.int32(0x7FFFFF)).astype(jnp.float32)

        m = jnp.min(eff)
        tsel = jnp.where(eff == m, tie, INF)
        best = jnp.min(tsel)
        flat = jnp.where(tsel == best, row_ids * N + col_ids,
                         jnp.int32(N * N - 1))
        idx = jnp.min(flat)
        a = idx // N
        b = idx % N
        i = jnp.minimum(a, b)
        j = jnp.maximum(a, b)

        si = sizes[i]
        sj = sizes[j]
        w = si / (si + sj)
        s_row = jnp.where(col1N == i, w,
                          jnp.where(col1N == j, 1.0 - w, 0.0))
        colj = col_ids == j

        d_ref[j, :] = w * d_ref[i, :] + (1.0 - w) * d_ref[j, :]
        new_col = jnp.sum(d_ref[:, :] * s_row, axis=1, keepdims=True)
        d_ref[:, :] = jnp.where(colj, new_col, d_ref[:, :])
        dt_ref[j, :] = w * dt_ref[i, :] + (1.0 - w) * dt_ref[j, :]
        new_colt = jnp.sum(dt_ref[:, :] * s_row, axis=1, keepdims=True)
        dt_ref[:, :] = jnp.where(colj, new_colt, dt_ref[:, :])

        dcf_ref[j, :] = w * dcf_ref[i, :] + (1.0 - w) * dcf_ref[j, :]
        new_ccol = jnp.sum(dcf_ref[:, :] * s_row, axis=1, keepdims=True)
        dcf_ref[:, :] = jnp.where(colj, new_ccol, dcf_ref[:, :])
        dcft_ref[j, :] = w * dcft_ref[i, :] + (1.0 - w) * dcft_ref[j, :]
        new_ccolt = jnp.sum(dcft_ref[:, :] * s_row, axis=1, keepdims=True)
        dcft_ref[:, :] = jnp.where(colj, new_ccolt, dcft_ref[:, :])

        cis_ref[t] = conv[i]
        cjs_ref[t] = conv[j]

        act_row[:, :] = jnp.where(col1N == i, 0.0, act_row[:, :])
        act_col[:, :] = jnp.where(rowN1 == i, 0.0, act_col[:, :])
        sizes[j] = si + sj
        conv[j] = n_real + t
        return 0

    jax.lax.fori_loop(0, n_real - 1, step, 0)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _run_large(d, dt, dcf, dcft, use_cf, threshold, threshold_cf, seed, n,
               interpret=False):
    Np = d.shape[0]
    iparams = jnp.stack([seed.astype(jnp.int32),
                         jnp.where(use_cf, 1, 0).astype(jnp.int32),
                         jnp.int32(n)])
    fparams = jnp.stack([threshold.astype(jnp.float32),
                         threshold_cf.astype(jnp.float32)])
    out_shapes = (
        jax.ShapeDtypeStruct((Np,), jnp.int32),
        jax.ShapeDtypeStruct((Np,), jnp.int32),
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    cis, cjs = pl.pallas_call(
        _kernel_large,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            any_spec, any_spec, any_spec, any_spec,
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((Np, Np), jnp.float32),   # d
            pltpu.VMEM((Np, Np), jnp.float32),   # dT
            pltpu.VMEM((Np, Np), jnp.float32),   # dcf
            pltpu.VMEM((Np, Np), jnp.float32),   # dcfT
            pltpu.VMEM((1, Np), jnp.float32),    # active (row form)
            pltpu.VMEM((Np, 1), jnp.float32),    # active (col form)
            pltpu.SMEM((Np,), jnp.float32),      # cluster sizes
            pltpu.SMEM((Np,), jnp.int32),        # node-id relabel
            pltpu.SemaphoreType.DMA((4,)),       # input DMAs
        ],
        compiler_params=pltpu.CompilerParams(
            # 4 NpxNp f32 scratch matrices (67MB at Np=2048) plus ~47MB
            # of step-body stack temporaries (measured 113.97M at 2048);
            # v5e has 128MB physical VMEM
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(iparams, fparams, d, dt, dcf, dcft)
    return cis, cjs


def clades_from_merges(cis, cjs, N: int):
    """(N-1, N) clade leaf-indicator rows from the merge lists — the
    off-chip reconstruction that replaces the large kernel's clade-set
    scratch matrix. Node ids: [0, N) leaves, N+t = cluster born at step t.
    """
    C0 = jnp.concatenate([jnp.eye(N, dtype=jnp.float32),
                          jnp.zeros((N - 1, N), jnp.float32)], axis=0)

    def stepc(C, x):
        ci, cj, t = x
        clade = C[ci] + C[cj]
        return C.at[N + t].set(clade), clade

    _, clades = jax.lax.scan(
        stepc, C0, (cis, cjs, jnp.arange(N - 1, dtype=jnp.int32)))
    return clades


def _pad128(n: int) -> int:
    return max(128, -(-n // 128) * 128)


@functools.partial(jax.jit,
                   static_argnames=("n", "interpret"))
def _run(d, dcf, use_cf, threshold, threshold_cf, seed, n,
         interpret=False):
    Np = d.shape[0]
    iparams = jnp.stack([seed.astype(jnp.int32),
                         jnp.where(use_cf, 1, 0).astype(jnp.int32),
                         jnp.int32(n)])
    fparams = jnp.stack([threshold.astype(jnp.float32),
                         threshold_cf.astype(jnp.float32)])
    out_shapes = (
        jax.ShapeDtypeStruct((Np,), jnp.int32),
        jax.ShapeDtypeStruct((Np,), jnp.int32),
        jax.ShapeDtypeStruct((Np, Np), jnp.float32),
    )
    cis, cjs, clades = pl.pallas_call(
        _kernel,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((Np, Np), jnp.float32),   # d
            pltpu.VMEM((Np, Np), jnp.float32),   # dT
            pltpu.VMEM((Np, Np), jnp.float32),   # dcf
            pltpu.VMEM((Np, Np), jnp.float32),   # dcfT
            pltpu.VMEM((1, Np), jnp.float32),    # active (row form)
            pltpu.VMEM((Np, 1), jnp.float32),    # active (col form)
            pltpu.VMEM((Np, Np), jnp.float32),   # clade sets
            pltpu.SMEM((Np,), jnp.float32),      # cluster sizes
            pltpu.SMEM((Np,), jnp.int32),        # node-id relabel
        ],
        compiler_params=pltpu.CompilerParams(
            # scratch counts against the scoped-VMEM stack: 5 NpxNp f32
            # matrices at Np=1024 are 20MB; the 16MB default refuses them
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(iparams, fparams, d, d.T, dcf, dcf.T)
    return cis, cjs, clades


# beyond this N the all-VMEM kernel (12 N^2 floats incl. inputs, clade
# sets and output) no longer fits v5e's 128MB VMEM; the large variant
# (4 N^2 f32 scratch + ~50MB of step-body stack temporaries, measured)
# takes over up to MAX_N_LARGE = 2048. Beyond THAT, the HBM-resident
# incremental kernel (ops/merge_scan_inc.py) removes the VMEM wall
# entirely AND drops per-step work from O(N^2) to amortized O(N).
MAX_N_SMALL = 1024
MAX_N_LARGE = 2048
MAX_N_INC = 16384


def merge_scan_pallas(d, dcf, use_cf, threshold, threshold_cf, seed,
                      interpret: bool = False):
    """Fused merge scan; drop-in for topology_device._merge_scan.

    d, dcf: (N, N) float32. Pads internally to a multiple of 128.
    Returns (cis, cjs, clades) with shapes ((N-1,), (N-1,), (N-1, N)).

    N <= 1024 runs the all-VMEM kernel; 1024 < N <= 2048 the HBM-input
    variant with off-chip clade reconstruction (same semantics, same
    tie-break hash — outputs are interchangeable); N > 2048 (or
    RELATE_TPU_MERGE_INC=1) the incremental HBM-resident kernel
    (ops/merge_scan_inc.py — amortized O(N)/step, stale-CF semantics per
    the reference, its module docstring documents the deviations).
    """
    import os
    N = d.shape[0]
    if (N > MAX_N_LARGE
            or os.environ.get("RELATE_TPU_MERGE_INC") == "1"):
        if N > MAX_N_INC:
            raise ValueError(
                f"merge scan supports N <= {MAX_N_INC} (got {N})")
        from .merge_scan_inc import merge_scan_incremental
        return merge_scan_incremental(d, dcf, use_cf, threshold,
                                      threshold_cf, seed,
                                      interpret=interpret)
    Np = _pad128(N)
    if Np != N:
        pad = ((0, Np - N), (0, Np - N))
        d = jnp.pad(d, pad)
        dcf = jnp.pad(dcf, pad)
    use_large = (N > MAX_N_SMALL
                 or os.environ.get("RELATE_TPU_MERGE_LARGE") == "1")
    if use_large:
        d = jnp.asarray(d, jnp.float32)
        dcf = jnp.asarray(dcf, jnp.float32)
        cis, cjs = _run_large(
            d, d.T, dcf, dcf.T,
            jnp.asarray(use_cf, bool), jnp.asarray(threshold, jnp.float32),
            jnp.asarray(threshold_cf, jnp.float32),
            jnp.asarray(seed, jnp.int32), N, interpret)
        cis = cis[:N - 1]
        cjs = cjs[:N - 1]
        return cis, cjs, clades_from_merges(cis, cjs, N)
    cis, cjs, clades = _run(
        jnp.asarray(d, jnp.float32), jnp.asarray(dcf, jnp.float32),
        jnp.asarray(use_cf, bool), jnp.asarray(threshold, jnp.float32),
        jnp.asarray(threshold_cf, jnp.float32),
        jnp.asarray(seed, jnp.int32), N, interpret)
    return cis[:N - 1], cjs[:N - 1], clades[:N - 1, :N]
