"""Incremental MinMatch merge scan for large N — HBM-resident Pallas kernel.

The VMEM kernels (ops/merge_scan.py) hold 4 NxN f32 matrices on chip and do
O(N^2) VPU work per merge step: a hard N<=2048 wall (VMEM) and an O(N^3)
per-tree asymptotic (VERDICT r4 missing #1 / weak #1). This kernel keeps the
matrices in HBM and maintains *per-row candidate caches* the way the C++
reference does (MinMatch::Coalesce, include/src/tree_builder.cpp:1843-2070):
amortized O(N) work per step, so a tree costs ~O(N^2) total.

Key invariant (the reference notes it at tree_builder.cpp:1877): row minima
of d only INCREASE through the scan — the merged column is a convex blend of
two active entries, so it can never undercut a row's minimum; removing a
column can only raise it. Hence per-row state can be maintained
incrementally, with a full row re-scan ("repair") only when a row's cached
minimum or cached candidate is actually touched.

Semantics relative to the XLA twin (core/topology_device._merge_scan):
- identical candidate/merge rule: mutual-row-min within threshold, score =
  d[i,j]+d[j,i] (0 when also mutually-min in the CF prior), fallback to the
  global symmetrized argmin when no mutual pair exists, cluster-size-weighted
  averaging of the merged row/column.
- tie-breaking uses a per-PAIR static integer hash of (min,max,seed) instead
  of per-step draws (the cached candidate must keep a stable tie key). The
  VMEM kernels already deviate the same way per step.
- CF row minima follow the REFERENCE (tree_builder.cpp:2483-2510): d_CF is
  merged by weighted averages, but min_values_CF is refreshed only for the
  newly merged cluster j; other rows keep their (possibly stale) value. The
  XLA twin recomputes them fresh each step. Both land within the e2e golden
  tolerance; the reference comment documents the approximation.
- repair order is ascending row index (deterministic); the reference's
  deque order differs on exact ties only.

TPU mechanics (all probed on v5e, scripts/probe_mosaic.py):
- HBM DMA is (8,128)-tile aligned -> all matrix access is 8-row "groups";
  the merged row is patched inside its group and the group written back.
- Merged COLUMNS cannot be written to row-major HBM storage; they are held
  in a VMEM pending cache (KP lane-form vectors + an exclusive one-hot id
  matrix + per-slot ages) and applied lazily: any row read is corrected as
      fresh = raw*(1-kmask) + sum_slots(valid * pend * onehot)
  with valid = slot_age > row_version. Every KP merges the cache is FLUSHED
  into the raw storage by a tiled read-modify-write pass whose scatter runs
  on the MXU with an exact 3-way bf16 split (one-hot exclusivity makes every
  output a single product, so f32 bit-exactness survives the MXU).
- per-row gathers from the pending cache read only the 128-lane block
  containing the row's lane (dynamic aligned lane slice).

`merge_scan_inc_host` is the bit-exact NumPy twin used by the tests.

Measured (v5e, N=5008, scripts/profile_n5008.py round 5): ~0.55 s/tree,
FLAT across KP=128/256/512 — the pending-cache flush is NOT the
bottleneck; the cost is the ~110 us/step serial chain (group-DMA
round-trips + the repair loop's sequential row rescans). Further speedup
needs restructuring of that chain (batched/speculative repairs), not
cache tuning.
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

# hash constants (same family as ops/merge_scan.py, without the step term)
_H1 = -1640531527
_H2 = -2048144789
_H3 = 747796405
_H4 = 739213477


def _tie_hash_np(lo, hi, seed):
    """Static per-pair tie hash -> float32 in [0, 2^23). int32 wraparound."""
    lo = np.asarray(lo).astype(np.int64)
    hi = np.asarray(hi).astype(np.int64)

    def trunc(x):
        return ((x + 2**31) % 2**32 - 2**31).astype(np.int64)

    h = trunc(lo * _H1 + hi * _H2)
    h = trunc(h ^ trunc(np.int64(seed) * _H3))
    h = trunc(h ^ ((h % 2**32) >> 15))
    h = trunc(h * _H4)
    h = trunc(h ^ ((h % 2**32) >> 12))
    return (h & 0x7FFFFF).astype(np.float32)


# --------------------------------------------------------------------------
# NumPy twin — the executable spec of the kernel's exact semantics.
# --------------------------------------------------------------------------

def merge_scan_inc_host(d, dcf, use_cf, threshold, threshold_cf, seed):
    """Bit-exact host twin of the incremental kernel (float32 throughout).

    Returns (cis, cjs) int32 (N-1,) merge lists in node-id space
    (leaves 0..N-1, cluster born at step t = N+t)."""
    d = np.array(d, dtype=np.float32)
    dcf = np.array(dcf, dtype=np.float32)
    N = d.shape[0]
    thr = np.float32(threshold)
    thrcf = np.float32(threshold_cf)
    active = np.ones(N, dtype=bool)
    sizes = np.ones(N, dtype=np.float32)
    conv = np.arange(N, dtype=np.int32)
    lanes = np.arange(N, dtype=np.int32)

    def row_min(mat, a):
        m = np.where(active & (lanes != a), mat[a], INF)
        return np.float32(m.min())

    rm = np.array([row_min(d, a) for a in range(N)], dtype=np.float32)
    rmcf = np.array([row_min(dcf, a) for a in range(N)], dtype=np.float32)

    cand_s = np.full(N, INF, np.float32)
    cand_t = np.full(N, INF, np.float32)
    cand_p = np.full(N, -1, np.int32)

    def eff_row(w):
        """(eff, tie) vectors for row w against all partners."""
        mask = active & (lanes != w)
        mutual = mask & (d[w] <= rm[w] + thr) & (d[:, w] <= rm + thr)
        if use_cf:
            cfm = (dcf[w] <= rmcf[w] + thrcf) & (dcf[:, w] <= rmcf + thrcf)
            score = np.where(cfm, np.float32(0.0),
                             (d[w] + d[:, w]).astype(np.float32))
        else:
            score = (d[w] + d[:, w]).astype(np.float32)
        eff = np.where(mutual, score, INF).astype(np.float32)
        tie = _tie_hash_np(np.minimum(lanes, w), np.maximum(lanes, w), seed)
        return eff, tie

    def rescan(w, fold=True):
        eff, tie = eff_row(w)
        m = np.float32(eff.min())
        if m >= INF:
            cand_s[w], cand_t[w], cand_p[w] = INF, INF, -1
        else:
            t1 = tie[eff == m].min()
            p = lanes[(eff == m) & (tie == t1)].min()
            cand_s[w], cand_t[w], cand_p[w] = m, t1, p
        if fold:
            better = (eff < cand_s) | ((eff == cand_s) & (tie < cand_t))
            better &= active & (lanes != w)
            cand_s[better] = eff[better]
            cand_t[better] = tie[better]
            cand_p[better] = w

    for w in range(N):
        if active[w]:
            rescan(w, fold=False)

    cis = np.zeros(N - 1, np.int32)
    cjs = np.zeros(N - 1, np.int32)

    for t in range(N - 1):
        ok = active & (cand_s < INF)
        if ok.any():
            m = cand_s[ok].min()
            sel = ok & (cand_s == m)
            t1 = cand_t[sel].min()
            a = lanes[sel & (cand_t == t1)].min()
            b = cand_p[a]
        else:
            # fallback: global symmetrized argmin over active pairs
            mask2 = (active[:, None] & active[None, :]
                     & (lanes[:, None] != lanes[None, :]))
            sym = (d + d.T).astype(np.float32)
            eff = np.where(mask2, sym, INF)
            m = eff.min()
            tie2 = _tie_hash_np(np.minimum(lanes[:, None], lanes[None, :]),
                                np.maximum(lanes[:, None], lanes[None, :]),
                                seed)
            tsel = np.where(eff == m, tie2, INF)
            t1 = tsel.min()
            flat = np.where(tsel == t1)
            a, b = int(flat[0][0]), int(flat[1][0])
        i, j = int(min(a, b)), int(max(a, b))

        cis[t] = conv[i]
        cjs[t] = conv[j]

        w_frac = np.float32(sizes[i] / (sizes[i] + sizes[j]))
        ri_d = d[i].copy()
        rj_d = d[j].copy()
        ci_d = d[:, i].copy()
        cj_d = d[:, j].copy()
        nrow = (w_frac * ri_d + (1 - w_frac) * rj_d).astype(np.float32)
        ncol = (w_frac * ci_d + (1 - w_frac) * cj_d).astype(np.float32)
        nrow_cf = (w_frac * dcf[i] + (1 - w_frac) * dcf[j]).astype(np.float32)
        ncol_cf = (w_frac * dcf[:, i]
                   + (1 - w_frac) * dcf[:, j]).astype(np.float32)

        # rm maintenance: detect rows whose min was at column i or j
        hit = active & (lanes != i) & (lanes != j) & \
            ((ci_d == rm) | (cj_d == rm))
        rm_safe = np.minimum(rm, ncol)   # no-op mathematically; keeps exact
        rm = np.where(active & (lanes != i) & (lanes != j) & ~hit,
                      rm_safe, rm).astype(np.float32)

        dirty = (active & ((cand_p == i) | (cand_p == j))) | hit
        dirty[j] = True
        dirty[i] = False

        # apply the merge (the kernel stores nrow in raw with the diagonal
        # patched to ncol[j], and pends ncol/nrow as lazy columns — value-
        # identical to direct updates)
        d[j, :] = nrow
        d[:, j] = ncol
        dcf[j, :] = nrow_cf
        dcf[:, j] = ncol_cf

        active[i] = False
        cand_s[i] = INF
        sizes[j] = np.float32(sizes[i] + sizes[j])
        conv[j] = N + t

        for w in np.nonzero(dirty & active)[0]:
            if hit[w] or w == j:
                rm[w] = row_min(d, w)
            if w == j:
                # reference-style CF minima: only row j refreshed
                # (tree_builder.cpp:2485-2510); other rows keep stale values
                rmcf[j] = row_min(dcf, j)
            rescan(w, fold=True)

    return cis, cjs


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

import os as _os
# perf-bisection knobs (comma list): no_repairs, stub_fallback,
# no_corrections, no_flush, no_dma
_DEBUG = frozenset(
    x for x in _os.environ.get("RELATE_TPU_INC_DEBUG", "").split(",") if x)


def _make_kernel(Np: int, KP: int):
    """Build the kernel body for padded size Np (mult of 128), pend cap KP."""
    NT = Np // 128          # lane blocks / flush tiles

    def tie_vec(w, seed):
        """(1, Np) f32 static pair hash of (min(w,lane), max(w,lane))."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        lo = jnp.minimum(lane, w)
        hi = jnp.maximum(lane, w)
        h = lo * jnp.int32(_H1) + hi * jnp.int32(_H2)
        h = h ^ (seed * jnp.int32(_H3))
        h = h ^ jax.lax.shift_right_logical(h, 15)
        h = h * jnp.int32(_H4)
        h = h ^ jax.lax.shift_right_logical(h, 12)
        return (h & jnp.int32(0x7FFFFF)).astype(jnp.float32)

    def kernel(iparams, fparams, d_i, dt_i, dcf_i, dcft_i,
               cis_ref, cjs_ref, d, dt, dcf, dcft,
               grp, pend, onehot, onehot_bf, age, st, sizes, conv, scal,
               tile, tile2, sems, wsems):
        seed = iparams[0]
        use_cf = iparams[1] > 0
        n_real = iparams[2]
        thr = fparams[0]
        thrcf = fparams[1]
        mats = (d, dt, dcf, dcft)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        lane_f = lane.astype(jnp.float32)

        # ---- state rows in st (f32, lane form) ----
        RM, RMCF, ACT, CSC, CTIE, CPART, VER = range(7)

        def sget(r):
            return st[r:r + 1, :]

        def sput(r, v):
            st[r:r + 1, :] = v

        def smask(r, cond, v):
            st[r:r + 1, :] = jnp.where(cond, v, st[r:r + 1, :])

        def extract(vec, idx):
            """scalar = vec[0, idx] via masked min (works for INF too)."""
            return jnp.min(jnp.where(lane == idx, vec, INF))

        def extract_i(vec_i32, idx):
            return jnp.min(jnp.where(lane == idx, vec_i32, jnp.int32(2**30)))

        # ---------------- init ----------------
        # d..dcft are input_output_aliased: the out refs already hold the
        # input matrices (XLA donates or copies before the kernel runs).
        onehot[:, :] = jnp.zeros((KP, Np), jnp.float32)
        age[:, :] = jnp.full((KP, 1), -2.0, jnp.float32)
        sput(ACT, (lane < n_real).astype(jnp.float32))
        sput(VER, jnp.full((1, Np), -1.0, jnp.float32))
        sput(CSC, jnp.full((1, Np), INF, jnp.float32))
        sput(CTIE, jnp.full((1, Np), INF, jnp.float32))
        sput(CPART, jnp.full((1, Np), -1.0, jnp.float32))

        def init_smem(s, _):
            sizes[s] = 1.0
            conv[s] = s
            return 0
        jax.lax.fori_loop(0, Np, init_smem, 0)
        scal[0] = 0          # pend_count

        # pass 1: row minima of d and dcf (tiles of 128 rows)
        def pass1(tb, _):
            A = pl.multiple_of(tb * 128, 8)
            cp = pltpu.make_async_copy(d.at[pl.ds(A, 128), :], tile,
                                       sems.at[0])
            cp2 = pltpu.make_async_copy(dcf.at[pl.ds(A, 128), :], tile2,
                                        sems.at[1])
            cp.start(); cp2.start()
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, Np), 0) \
                + tb * 128
            cols = jax.lax.broadcasted_iota(jnp.int32, (128, Np), 1)
            mask = (cols < n_real) & (cols != rows)
            cp.wait()
            rmA = jnp.min(jnp.where(mask, tile[:, :], INF), axis=1,
                          keepdims=True)
            st[RM:RM + 1, pl.ds(pl.multiple_of(tb * 128, 128), 128)] = \
                jnp.reshape(rmA, (1, 128))
            cp2.wait()
            rmcfA = jnp.min(jnp.where(mask, tile2[:, :], INF), axis=1,
                            keepdims=True)
            st[RMCF:RMCF + 1, pl.ds(pl.multiple_of(tb * 128, 128), 128)] = \
                jnp.reshape(rmcfA, (1, 128))
            return 0
        jax.lax.fori_loop(0, NT, pass1, 0)

        # pass 2: initial per-row candidates (needs all 4 matrices + rm)
        def pass2(tb, _):
            A = pl.multiple_of(tb * 128, 8)
            Al = pl.multiple_of(tb * 128, 128)
            c0 = pltpu.make_async_copy(d.at[pl.ds(A, 128), :], tile, sems.at[0])
            c1 = pltpu.make_async_copy(dt.at[pl.ds(A, 128), :], tile2,
                                       sems.at[1])
            c0.start(); c1.start()
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, Np), 0) \
                + tb * 128
            cols = jax.lax.broadcasted_iota(jnp.int32, (128, Np), 1)
            mask = (cols < n_real) & (cols != rows) & \
                (rows < n_real)
            rm_row = sget(RM)                                # (1, Np)
            rmA = jnp.reshape(st[RM:RM + 1, pl.ds(Al, 128)], (128, 1))
            c0.wait(); c1.wait()
            dA = tile[:, :]
            dtA = tile2[:, :]
            mutual = mask & (dA <= rmA + thr) & (dtA <= rm_row + thr)
            if True:
                rmcf_row = sget(RMCF)
                rmcfA = jnp.reshape(st[RMCF:RMCF + 1, pl.ds(Al, 128)],
                                    (128, 1))
                c2 = pltpu.make_async_copy(dcf.at[pl.ds(A, 128), :], tile,
                                           sems.at[0])
                sym = dA + dtA
                c2.start(); c2.wait()
                cfA = tile[:, :]
                c3 = pltpu.make_async_copy(dcft.at[pl.ds(A, 128), :], tile,
                                           sems.at[2])
                incf = cfA <= rmcfA + thrcf
                c3.start(); c3.wait()
                cftA = tile[:, :]
                cfm = incf & (cftA <= rmcf_row + thrcf)
                score = jnp.where(use_cf & cfm, 0.0, sym)
            eff = jnp.where(mutual, score, INF)
            lo = jnp.minimum(rows, cols)
            hi = jnp.maximum(rows, cols)
            h = lo * jnp.int32(_H1) + hi * jnp.int32(_H2)
            h = h ^ (seed * jnp.int32(_H3))
            h = h ^ jax.lax.shift_right_logical(h, 15)
            h = h * jnp.int32(_H4)
            h = h ^ jax.lax.shift_right_logical(h, 12)
            tie = (h & jnp.int32(0x7FFFFF)).astype(jnp.float32)
            mrow = jnp.min(eff, axis=1, keepdims=True)       # (128,1)
            t1 = jnp.min(jnp.where(eff == mrow, tie, INF), axis=1,
                         keepdims=True)
            p = jnp.min(jnp.where((eff == mrow) & (tie == t1), cols,
                                  jnp.int32(Np)), axis=1, keepdims=True)
            st[CSC:CSC + 1, pl.ds(Al, 128)] = jnp.reshape(mrow, (1, 128))
            st[CTIE:CTIE + 1, pl.ds(Al, 128)] = jnp.reshape(t1, (1, 128))
            st[CPART:CPART + 1, pl.ds(Al, 128)] = jnp.reshape(
                p.astype(jnp.float32), (1, 128))
            return 0
        jax.lax.fori_loop(0, NT, pass2, 0)

        # ---------------- helpers used in the merge loop ----------------

        def corrections(w, raws):
            """Fresh lane-form rows of the 4 matrices for row w.

            raws: tuple of 4 (1,Np) raw row vectors (already in VMEM).
            Reads only the 128-lane pend block containing w."""
            if "no_corrections" in _DEBUG:
                return list(raws)
            ver_w = extract(sget(VER), w)
            wb = pl.multiple_of((w // 128) * 128, 128)
            blk = pend[:, pl.ds(wb, 128)]                    # (4KP, 128)
            bl_lane = jax.lax.broadcasted_iota(jnp.int32, (4 * KP, 128), 1)
            colv = jnp.sum(jnp.where(bl_lane + wb == w, blk, 0.0),
                           axis=1, keepdims=True)            # (4KP, 1)
            valid = (age[:, :] > ver_w).astype(jnp.float32)  # (KP, 1)
            kmask = jnp.sum(valid * onehot[:, :], axis=0, keepdims=True)
            out = []
            for k, raw in enumerate(raws):
                cv = colv[k * KP:(k + 1) * KP] * valid       # (KP,1)
                corr = jnp.sum(cv * onehot[:, :], axis=0, keepdims=True)
                out.append(raw * (1.0 - kmask) + corr)
            return out

        def read_rows(w, base):
            """DMA the 8-row groups containing w for all 4 matrices into
            grp[base*32 .. base*32+32), return raw (1,Np) rows."""
            if "no_dma" in _DEBUG:
                return [grp[pl.ds(base * 32 + 8 * k, 1), :]
                        for k in range(4)]
            g = pl.multiple_of((w // 8) * 8, 8)
            cps = []
            for k, m in enumerate(mats):
                cp = pltpu.make_async_copy(
                    m.at[pl.ds(g, 8), :],
                    grp.at[pl.ds(base * 32 + 8 * k, 8), :],
                    sems.at[base * 4 + k])
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()
            sub = w % 8
            return [grp[pl.ds(base * 32 + 8 * k + sub, 1), :]
                    for k in range(4)]

        def flush():
            """Apply the pending column cache to the raw storage."""
            if "no_flush" in _DEBUG:
                onehot[:, :] = jnp.zeros((KP, Np), jnp.float32)
                age[:, :] = jnp.full((KP, 1), -2.0, jnp.float32)
                scal[0] = 0
                return
            onehot_bf[:, :] = onehot[:, :].astype(jnp.bfloat16)
            dn = (((0,), (0,)), ((), ()))

            def flt(idx, _):
                mk = idx % 4
                tb = idx // 4
                A = pl.multiple_of(tb * 128, 8)
                Al = pl.multiple_of(tb * 128, 128)
                for k, m in enumerate(mats):
                    @pl.when(mk == k)
                    def _():
                        cp = pltpu.make_async_copy(m.at[pl.ds(A, 128), :],
                                                   tile, sems.at[0])
                        cp.start(); cp.wait()
                for k in range(1):
                    P_A = pend[:, pl.ds(Al, 128)]            # (4KP,128)
                    ver_A = st[VER:VER + 1, pl.ds(Al, 128)]  # (1,128)
                    valid = (age[:, :] > ver_A).astype(jnp.float32)
                    # select this matrix's pend block: rows mk*KP..mk*KP+KP.
                    # mk is dynamic -> gather via masked sum over the 4
                    # blocks (only one contributes).
                    rsub = jax.lax.broadcasted_iota(jnp.int32,
                                                    (4 * KP, 128), 0)
                    psel = jnp.where((rsub >= mk * KP)
                                     & (rsub < (mk + 1) * KP), P_A, 0.0)
                    Pm = (psel[0:KP] + psel[KP:2 * KP] + psel[2 * KP:3 * KP]
                          + psel[3 * KP:]) * valid            # (KP,128)
                    hi16 = Pm.astype(jnp.bfloat16)
                    r1 = Pm - hi16.astype(jnp.float32)
                    mid = r1.astype(jnp.bfloat16)
                    lo16 = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                    oh = onehot_bf[:, :]
                    corr = (jax.lax.dot_general(
                                hi16, oh, dn,
                                preferred_element_type=jnp.float32)
                            + jax.lax.dot_general(
                                mid, oh, dn,
                                preferred_element_type=jnp.float32)
                            + jax.lax.dot_general(
                                lo16, oh, dn,
                                preferred_element_type=jnp.float32))
                    km = jax.lax.dot_general(
                        valid.astype(jnp.bfloat16), oh, dn,
                        preferred_element_type=jnp.float32)
                    tile[:, :] = tile[:, :] * (1.0 - km) + corr
                for k, m in enumerate(mats):
                    @pl.when(mk == k)
                    def _():
                        cp = pltpu.make_async_copy(
                            tile, m.at[pl.ds(A, 128), :], sems.at[0])
                        cp.start(); cp.wait()
                return 0
            jax.lax.fori_loop(0, NT * 4, flt, 0)
            onehot[:, :] = jnp.zeros((KP, Np), jnp.float32)
            age[:, :] = jnp.full((KP, 1), -2.0, jnp.float32)
            scal[0] = 0

        def repair(w, refresh_rm, refresh_rmcf):
            """Full rescan of row w: recompute rm/rmcf if flagged, rebuild
            its candidate and fold improvements into all rows."""
            raws = read_rows(w, 2)
            fd, fdt, fcf, fcft = corrections(w, raws)
            act = sget(ACT) > 0.5
            mask = act & (lane != w)

            rm_w0 = extract(sget(RM), w)
            rm_w = jnp.where(refresh_rm,
                             jnp.min(jnp.where(mask, fd, INF)), rm_w0)
            smask(RM, lane == w, rm_w)
            rmcf_w0 = extract(sget(RMCF), w)
            rmcf_w = jnp.where(refresh_rmcf,
                               jnp.min(jnp.where(mask, fcf, INF)), rmcf_w0)
            smask(RMCF, lane == w, rmcf_w)

            mutual = mask & (fd <= rm_w + thr) & (fdt <= sget(RM) + thr)
            cfm = (fcf <= rmcf_w + thrcf) & (fcft <= sget(RMCF) + thrcf)
            score = jnp.where(use_cf & cfm, 0.0, fd + fdt)
            eff = jnp.where(mutual, score, INF)
            tie = tie_vec(w, seed)

            m = jnp.min(eff)
            t1 = jnp.min(jnp.where(eff == m, tie, INF))
            p = jnp.min(jnp.where((eff == m) & (tie == t1), lane,
                                  jnp.int32(Np)))
            have = m < INF
            smask(CSC, lane == w, jnp.where(have, m, INF))
            smask(CTIE, lane == w, jnp.where(have, t1, INF))
            smask(CPART, lane == w,
                  jnp.where(have, p.astype(jnp.float32), -1.0))

            better = mask & ((eff < sget(CSC))
                             | ((eff == sget(CSC)) & (tie < sget(CTIE))))
            smask(CSC, better, eff)
            smask(CTIE, better, tie)
            smask(CPART, better, jnp.float32(w))

        def fallback_select():
            """Global symmetrized lexmin over active pairs (streamed).
            Flushes first so the raw storage is fully fresh."""
            flush()

            def ftile(tb, carry):
                bs, bt, bi, bj = carry
                A = pl.multiple_of(tb * 128, 8)
                Al = pl.multiple_of(tb * 128, 128)
                c0 = pltpu.make_async_copy(d.at[pl.ds(A, 128), :], tile,
                                           sems.at[0])
                c1 = pltpu.make_async_copy(dt.at[pl.ds(A, 128), :], tile2,
                                           sems.at[1])
                c0.start(); c1.start()
                rows = jax.lax.broadcasted_iota(jnp.int32, (128, Np), 0) \
                    + tb * 128
                cols = jax.lax.broadcasted_iota(jnp.int32, (128, Np), 1)
                actA = jnp.reshape(st[ACT:ACT + 1, pl.ds(Al, 128)], (128, 1))
                mask = (actA > 0.5) & (sget(ACT) > 0.5) & (cols != rows)
                c0.wait(); c1.wait()
                sym = tile[:, :] + tile2[:, :]
                eff = jnp.where(mask, sym, INF)
                lo = jnp.minimum(rows, cols)
                hi = jnp.maximum(rows, cols)
                h = lo * jnp.int32(_H1) + hi * jnp.int32(_H2)
                h = h ^ (seed * jnp.int32(_H3))
                h = h ^ jax.lax.shift_right_logical(h, 15)
                h = h * jnp.int32(_H4)
                h = h ^ jax.lax.shift_right_logical(h, 12)
                tie = (h & jnp.int32(0x7FFFFF)).astype(jnp.float32)
                m = jnp.min(eff)
                t1 = jnp.min(jnp.where(eff == m, tie, INF))
                flat = jnp.min(jnp.where((eff == m) & (tie == t1),
                                         rows * Np + cols,
                                         jnp.int32(2**30)))
                ii = (flat // Np).astype(jnp.float32)
                jj = (flat % Np).astype(jnp.float32)
                better = (m < bs) | ((m == bs) & (t1 < bt))
                return (jnp.where(better, m, bs),
                        jnp.where(better, t1, bt),
                        jnp.where(better, ii, bi),
                        jnp.where(better, jj, bj))
            bs, bt, bi, bj = jax.lax.fori_loop(
                0, NT, ftile,
                (INF, INF, jnp.float32(0), jnp.float32(0)))
            return bi.astype(jnp.int32), bj.astype(jnp.int32)

        # ---------------- the merge loop ----------------
        def step(t, _):
            @pl.when(scal[0] >= KP)
            def _():
                flush()

            act = sget(ACT) > 0.5
            csc = jnp.where(act, sget(CSC), INF)
            m = jnp.min(csc)

            def cached_select():
                t1 = jnp.min(jnp.where(csc == m, sget(CTIE), INF))
                a = jnp.min(jnp.where((csc == m) & (sget(CTIE) == t1),
                                      lane, jnp.int32(Np)))
                b = extract(sget(CPART), a).astype(jnp.int32)
                return a, b

            if "stub_fallback" in _DEBUG:
                a, b = cached_select()
            else:
                a, b = jax.lax.cond(m < INF, cached_select, fallback_select)
            i = jnp.minimum(a, b)
            j = jnp.maximum(a, b)

            cis_ref[t] = conv[i]
            cjs_ref[t] = conv[j]

            si = sizes[i]
            sj = sizes[j]
            wf = si / (si + sj)

            raws_i = read_rows(i, 0)
            fi = corrections(i, raws_i)       # fresh rows of i (d,dt,cf,cft)
            raws_j = read_rows(j, 1)
            fj = corrections(j, raws_j)

            nrow = wf * fi[0] + (1.0 - wf) * fj[0]
            ncol = wf * fi[1] + (1.0 - wf) * fj[1]
            nrow_cf = wf * fi[2] + (1.0 - wf) * fj[2]
            ncol_cf = wf * fi[3] + (1.0 - wf) * fj[3]

            # rm maintenance (monotone): rows whose min sat at col i or j
            rm_now = sget(RM)
            hit = act & (lane != i) & (lane != j) & \
                ((fi[1] == rm_now) | (fj[1] == rm_now))
            nohit = act & (lane != i) & (lane != j) & ~hit
            smask(RM, nohit, jnp.minimum(rm_now, ncol))

            dirty = (act & ((sget(CPART) == i.astype(jnp.float32))
                            | (sget(CPART) == j.astype(jnp.float32)))) | hit
            dirty = (dirty | (lane == j)) & (lane != i)

            # deactivate i
            smask(ACT, lane == i, 0.0)
            smask(CSC, lane == i, INF)
            sizes[j] = si + sj
            conv[j] = n_real + t

            # write merged rows back into raw storage (patch the group
            # buffers at sublane j%8 of base-1 blocks, then write groups)
            ncol_jj = extract(ncol, j)
            nrow_st = jnp.where(lane == j, ncol_jj, nrow)
            subj = j % 8
            grp[pl.ds(32 + subj, 1), :] = nrow_st         # d group, base 1
            grp[pl.ds(32 + 8 + subj, 1), :] = ncol        # dt group
            ncol_cf_jj = extract(ncol_cf, j)
            nrowcf_st = jnp.where(lane == j, ncol_cf_jj, nrow_cf)
            grp[pl.ds(32 + 16 + subj, 1), :] = nrowcf_st  # dcf group
            grp[pl.ds(32 + 24 + subj, 1), :] = ncol_cf    # dcft group
            gj = pl.multiple_of((j // 8) * 8, 8)
            wcps = []
            for k, mm in enumerate(mats):
                cp = pltpu.make_async_copy(
                    grp.at[pl.ds(32 + 8 * k, 8), :],
                    mm.at[pl.ds(gj, 8), :], wsems.at[k])
                cp.start()
                wcps.append(cp)

            # pend the merged columns (lazy column updates)
            slot = scal[0]
            pend[pl.ds(slot, 1), :] = ncol
            pend[pl.ds(KP + slot, 1), :] = nrow
            pend[pl.ds(2 * KP + slot, 1), :] = ncol_cf
            pend[pl.ds(3 * KP + slot, 1), :] = nrow_cf
            ohrow = (lane == j).astype(jnp.float32)
            kp_rows = jax.lax.broadcasted_iota(jnp.int32, (KP, Np), 1)
            onehot[:, :] = jnp.where(kp_rows == j, 0.0, onehot[:, :])
            onehot[pl.ds(slot, 1), :] = ohrow
            age[pl.ds(slot, 1), :] = jnp.full((1, 1), 1.0) * t
            scal[0] = slot + 1
            smask(VER, lane == j, jnp.float32(1.0) * t)

            for cp in wcps:
                cp.wait()

            # repairs, ascending lane order
            if "no_repairs" in _DEBUG:
                dirty = dirty & (lane == j)
            ndirty = jnp.sum(dirty.astype(jnp.int32))

            def rbody(r, dd):
                w = jnp.min(jnp.where(dd > 0.5, lane, jnp.int32(Np)))
                is_hit = extract(jnp.where(hit, 1.0, 0.0), w) > 0.5
                repair(w, is_hit | (w == j), w == j)
                return jnp.where(lane == w, 0.0, dd)

            jax.lax.fori_loop(0, ndirty, rbody,
                              jnp.where(dirty, 1.0, 0.0))
            return 0

        jax.lax.fori_loop(0, n_real - 1, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "kp", "interpret"))
def _run_inc(d, dt, dcf, dcft, use_cf, threshold, threshold_cf, seed, n,
             kp=128, interpret=False):
    Np = d.shape[0]
    KP = kp
    iparams = jnp.stack([seed.astype(jnp.int32),
                         jnp.where(use_cf, 1, 0).astype(jnp.int32),
                         jnp.int32(n)])
    fparams = jnp.stack([threshold.astype(jnp.float32),
                         threshold_cf.astype(jnp.float32)])
    kern = _make_kernel(Np, KP)
    out_shapes = (
        jax.ShapeDtypeStruct((Np,), jnp.int32),
        jax.ShapeDtypeStruct((Np,), jnp.int32),
        jax.ShapeDtypeStruct((Np, Np), jnp.float32),
        jax.ShapeDtypeStruct((Np, Np), jnp.float32),
        jax.ShapeDtypeStruct((Np, Np), jnp.float32),
        jax.ShapeDtypeStruct((Np, Np), jnp.float32),
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    res = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            any_spec, any_spec, any_spec, any_spec,
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   any_spec, any_spec, any_spec, any_spec),
        scratch_shapes=[
            pltpu.VMEM((96, Np), jnp.float32),    # grp: 3 bases x 32 rows
            pltpu.VMEM((4 * KP, Np), jnp.float32),  # pend
            pltpu.VMEM((KP, Np), jnp.float32),    # onehot
            pltpu.VMEM((KP, Np), jnp.bfloat16),   # onehot bf16 (flush)
            pltpu.VMEM((KP, 1), jnp.float32),     # slot ages
            pltpu.VMEM((8, Np), jnp.float32),     # lane-form state rows
            pltpu.SMEM((Np,), jnp.float32),       # sizes
            pltpu.SMEM((Np,), jnp.int32),         # conv
            pltpu.SMEM((8,), jnp.int32),          # scalars (pend count...)
            pltpu.VMEM((128, Np), jnp.float32),   # tile
            pltpu.VMEM((128, Np), jnp.float32),   # tile2
            pltpu.SemaphoreType.DMA((12,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=112 * 1024 * 1024),
        input_output_aliases={2: 2, 3: 3, 4: 4, 5: 5},
        interpret=interpret,
    )(iparams, fparams, d, dt, dcf, dcft)
    return res[0], res[1]


def merge_scan_incremental(d, dcf, use_cf, threshold, threshold_cf, seed,
                           kp: int = 128, interpret: bool = False):
    """Drop-in for merge_scan_pallas at large N: returns (cis, cjs, clades).

    d, dcf: (N, N) float32; pads to a multiple of 128 internally.
    """
    from .merge_scan import clades_from_merges, _pad128
    N = d.shape[0]
    Np = _pad128(N)
    if Np != N:
        pad = ((0, Np - N), (0, Np - N))
        d = jnp.pad(d, pad)
        dcf = jnp.pad(dcf, pad)
    d = jnp.asarray(d, jnp.float32)
    dcf = jnp.asarray(dcf, jnp.float32)
    cis, cjs = _run_inc(
        d, d.T, dcf, dcf.T, jnp.asarray(use_cf, bool),
        jnp.asarray(threshold, jnp.float32),
        jnp.asarray(threshold_cf, jnp.float32),
        jnp.asarray(seed, jnp.int32), N, kp=kp, interpret=interpret)
    cis = cis[:N - 1]
    cjs = cjs[:N - 1]
    return cis, cjs, clades_from_merges(cis, cjs, N)
