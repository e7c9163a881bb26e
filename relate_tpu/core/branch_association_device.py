"""Device-resident FindEquivalentBranches: leaf matrices, Pearson
correlations AND the staged matcher run on device, batched over adjacent
tree pairs.

Behavioral reference: ``AncesTreeBuilder::BranchAssociation``
(include/src/anc_builder.cpp:1433-1614) and ``Correlation::Pearson``
(include/src/anc.cpp:821-860) — the same semantics as the host matcher in
``branch_association.py`` (its ``_match_from_corr`` is the differential
oracle; see tests/test_ancbuilder.py).

TPU mapping: leaf-set indicators are built on device from the parent
arrays (a readiness-propagation ``while_loop``), all pairwise leaf-set
intersections are one batched (M, N) @ (N, M) float32 MXU matmul per pair
(0/1 counts < 2^24 are exact), and the three matching stages are
vectorized masks + scatter-max. The only sequential piece — the reference's
best-score-first greedy assignment of approximate matches — is a
``lax.scan`` over the (tiny, top-K-bounded) sorted candidate list. Pairs
whose candidate lists overflow the static bounds fall back to the host
matcher (rare: adjacent trees share most clades).

Per pair, only the (M,) equivalence vector crosses the device link —
~2 KB instead of the (M, M) correlation matrix.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .branch_association import (THRESHOLD_BRANCHEQ, EXACT,
                                 _count_compat_table, _match_from_corr,
                                 _pearson_from_products)
from .trees import Tree

# per-row / global candidate bounds for the stage-3 greedy (overflowing
# pairs fall back to the host matcher)
TOPK_PER_ROW = 8
MAX_CANDIDATES = 512


def _leafmats(parent, cl, cr, N):
    """(B, M) parent/children arrays -> (B, M, N) f32 leaf indicators.

    Bottom-up readiness propagation (children before parents), iterated to
    a fixed point under ``lax.while_loop`` — correct for any labeling, not
    just merge order."""
    import jax
    import jax.numpy as jnp

    B, M = parent.shape
    out0 = jnp.zeros((B, M, N), jnp.float32).at[:, :N, :].set(
        jnp.eye(N, dtype=jnp.float32))
    ready0 = jnp.concatenate([jnp.ones((B, N), bool),
                              jnp.zeros((B, M - N), bool)], axis=1)

    def cond(c):
        _, ready = c
        return ~ready.all()

    def body(c):
        out, ready = c
        clr = jnp.take_along_axis(ready, jnp.maximum(cl, 0), axis=1)
        crr = jnp.take_along_axis(ready, jnp.maximum(cr, 0), axis=1)
        can = clr & crr & (cl >= 0) & ~ready
        lrow = jnp.take_along_axis(out, jnp.maximum(cl, 0)[:, :, None],
                                   axis=1)
        rrow = jnp.take_along_axis(out, jnp.maximum(cr, 0)[:, :, None],
                                   axis=1)
        out = jnp.where(can[:, :, None], lrow + rrow, out)
        return out, ready | can

    out, _ = jax.lax.while_loop(cond, body, (out0, ready0))
    return out


def _pearson_device(prod, n1, n2, N):
    """jnp twin of branch_association._pearson_from_products."""
    import jax.numpy as jnp

    Nf = jnp.float32(N)
    r = prod - n1[:, None] * (n2[None, :] / Nf)
    d1 = jnp.sqrt((n1 / Nf) * (Nf - n1))
    d2 = jnp.sqrt((n2 / Nf) * (Nf - n2))
    denom = d1[:, None] * d2[None, :]
    r = jnp.where(denom != 0, r / jnp.where(denom == 0, 1.0, denom), r)
    r = jnp.maximum(r, 0.0)
    exact_eq = (prod == n1[:, None]) & (prod == n2[None, :])
    r = jnp.where(exact_eq, 1.0, r)
    full1 = n1[:, None] == Nf
    full2 = n2[None, :] == Nf
    r = jnp.where(full1 | full2,
                  jnp.where(full1 & full2, 1.0, 0.0), r)
    return r


def _match_pair(corr, tp, t_cl, t_cr, rp, r_cl, r_cr, nl_t, nl_r, compat,
                N, M):
    """Device twin of branch_association._match_from_corr for ONE pair.

    Returns (eq (M,) int32, overflow bool)."""
    import jax
    import jax.numpy as jnp

    THR = jnp.float32(THRESHOLD_BRANCHEQ)
    EX = jnp.float32(EXACT)
    ar = jnp.arange(M)

    eq = jnp.full(M, -1, jnp.int32)
    eq_ref = jnp.full(M, -1, jnp.int32)

    # --- stage 1: leaves ------------------------------------------------
    li = jnp.arange(N)
    par = tp[:N]
    rpar = rp[:N]
    sib = jnp.where(t_cl[par] == li, t_cr[par], t_cl[par])
    leaf_sib = sib < N
    rsib_match = (r_cl[rpar] == sib) | (r_cr[rpar] == sib)
    cond_a = leaf_sib & rsib_match
    cond_b = ~leaf_sib & (corr[par, rpar] >= THR)
    sel = cond_a | cond_b
    leaf_val = jnp.where(sel, li, -1).astype(jnp.int32)
    eq = eq.at[li].set(leaf_val)
    eq_ref = eq_ref.at[li].set(leaf_val)
    # cond_a additionally pairs the (leaf) sibling with itself
    sib_val = jnp.where(cond_a, sib, -1).astype(jnp.int32)
    eq = eq.at[jnp.where(cond_a, sib, 0)].max(sib_val)
    eq_ref = eq_ref.at[jnp.where(cond_a, sib, 0)].max(sib_val)

    # --- stage 2: internal exact matches --------------------------------
    is_int = (ar >= N) & (ar < M - 1)
    diag_ok = is_int & (corr[ar, ar] >= EX) & (corr[tp, rp] >= EX)
    # rows without a diagonal match scan equal-leaf-count branches for the
    # lowest exactly-matching j
    pc = corr[tp][:, rp]                          # corr[tp[i], rp[j]]
    cand2 = (corr >= EX) & (pc >= EX) & (nl_t[:, None] == nl_r[None, :])
    j_first = jnp.where(cand2.any(axis=1),
                        jnp.argmin(jnp.where(cand2, ar[None, :], M),
                                   axis=1), -1).astype(jnp.int32)
    use_scan = is_int & ~diag_ok & (j_first >= 0)
    eq_int = jnp.where(diag_ok, ar.astype(jnp.int32),
                       jnp.where(use_scan, j_first, -1))
    eq = jnp.where(is_int, eq_int, eq)
    # eq_ref last-write-wins in ascending-i order == scatter max
    targets = jnp.where(diag_ok, ar,
                        jnp.where(use_scan, j_first, M))
    vals = jnp.where(diag_ok | use_scan, ar, -1).astype(jnp.int32)
    eq_ref = jnp.concatenate([eq_ref, jnp.full(1, -1, jnp.int32)])
    eq_ref = eq_ref.at[targets].max(vals)[:M]

    # --- stage 3: approximate matches, best score first ------------------
    unpaired = is_int & (eq == -1)
    cand3 = ((corr >= THR) & (pc >= THR) & (eq_ref[None, :] == -1)
             & compat[nl_t[:, None], nl_r[None, :]] & unpaired[:, None])
    score = jnp.where(cand3, corr, -jnp.inf)
    # per-row top-K then global multi-key sort replicating the host
    # lexsort((j, nl_r[j], i, -score))
    row_over = cand3.sum(axis=1) > TOPK_PER_ROW
    vals_k, idx_k = jax.lax.top_k(score, TOPK_PER_ROW)    # (M, K)
    flat_s = vals_k.reshape(-1)
    flat_i = jnp.repeat(ar, TOPK_PER_ROW).astype(jnp.int32)
    flat_j = idx_k.reshape(-1).astype(jnp.int32)
    valid = jnp.isfinite(flat_s)
    total_over = valid.sum() > MAX_CANDIDATES
    overflow = row_over.any() | total_over
    neg_s = jnp.where(valid, -flat_s, jnp.inf)
    _, _, _, _, s_i, s_j, s_v = jax.lax.sort(
        (neg_s, flat_i, nl_r[flat_j], flat_j, flat_i, flat_j,
         valid.astype(jnp.int32)), num_keys=4)
    s_i = s_i[:MAX_CANDIDATES]
    s_j = s_j[:MAX_CANDIDATES]
    s_v = s_v[:MAX_CANDIDATES]

    def greedy(carry, x):
        eq, eq_ref = carry
        i, j, v = x
        free = (v > 0) & (eq[i] == -1) & (eq_ref[j] == -1)
        eq = eq.at[i].set(jnp.where(free, j, eq[i]))
        eq_ref = eq_ref.at[j].set(jnp.where(free, i, eq_ref[j]))
        return (eq, eq_ref), None

    (eq, eq_ref), _ = jax.lax.scan(greedy, (eq, eq_ref), (s_i, s_j, s_v))
    return eq, overflow


_KERNEL_CACHE = {}


def _pair_kernel(N: int, M: int):
    """Jitted batched (leafmat -> corr -> match) program for one (N, M)."""
    key = (N, M)
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    import jax
    import jax.numpy as jnp

    compat_np = _count_compat_table(N)

    def kernel(parent, cl, cr):
        # parent/cl/cr: (T, M) for T = B+1 consecutive trees -> B pairs
        compat = jnp.asarray(compat_np)
        L = _leafmats(parent, cl, cr, N)              # (T, M, N) f32
        nl = L.sum(axis=2)                            # (T, M)
        prod = jnp.einsum("bmn,bkn->bmk", L[1:], L[:-1],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        corr = jax.vmap(lambda p, a, b: _pearson_device(p, a, b, N))(
            prod, nl[1:], nl[:-1])

        def one(corr_k, tpk, tclk, tcrk, rpk, rclk, rcrk, nlt, nlr):
            return _match_pair(corr_k, tpk, tclk, tcrk, rpk, rclk, rcrk,
                               nlt.astype(jnp.int32),
                               nlr.astype(jnp.int32), compat, N, M)

        eq, over = jax.vmap(one)(corr, parent[1:], cl[1:], cr[1:],
                                 parent[:-1], cl[:-1], cr[:-1],
                                 nl[1:], nl[:-1])
        return eq, over

    k = jax.jit(kernel)
    _KERNEL_CACHE[key] = k
    return k


def branch_association_many_device(trees: List[Tree],
                                   pair_chunk: int = 256
                                   ) -> List[np.ndarray]:
    """Equivalences for every adjacent pair of ``trees``, computed on
    device in ``pair_chunk``-pair batches; overflowed pairs (bounded
    candidate buffers exceeded) redo on the host matcher."""
    T = len(trees)
    if T < 2:
        return []
    N = trees[0].N
    M = trees[0].num_nodes
    kernel = _pair_kernel(N, M)
    parent = np.stack([t.parent for t in trees]).astype(np.int32)
    cl = np.stack([t.child_left for t in trees]).astype(np.int32)
    cr = np.stack([t.child_right for t in trees]).astype(np.int32)

    eqs: List[Optional[np.ndarray]] = []
    # pad the last chunk to the chunk size so at most two shapes compile
    for s in range(0, T - 1, pair_chunk):
        e = min(s + pair_chunk, T - 1)
        n = e - s
        idx = np.arange(s, s + pair_chunk + 1)
        idx = np.minimum(idx, T - 1)
        eq, over = kernel(parent[idx], cl[idx], cr[idx])
        eq = np.asarray(eq)[:n]
        over = np.asarray(over)[:n]
        for k in range(n):
            if over[k]:
                eqs.append(None)    # host fallback below
            else:
                eqs.append(eq[k])

    for p, v in enumerate(eqs):
        if v is None:
            Lr = trees[p].leaf_matrix().astype(np.float32)
            Lt = trees[p + 1].leaf_matrix().astype(np.float32)
            prod = Lt @ Lr.T
            corr = _pearson_from_products(prod, Lt.sum(axis=1),
                                          Lr.sum(axis=1), N)
            eqs[p] = _match_from_corr(trees[p], trees[p + 1], corr,
                                      nl_r=Lr.sum(axis=1),
                                      nl_t=Lt.sum(axis=1))
    return eqs
