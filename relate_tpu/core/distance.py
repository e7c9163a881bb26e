"""Distance-matrix assembly from painting posteriors.

Behavioral reference: ``DistanceMeasure::GetMatrix``
(``include/src/anc_builder.cpp:108-207``). For target n at SNP s:

- if n carries the derived allele at s (or s is the first/last SNP of the
  chunk), its distance row is ``-(fast_log(posterior_row) + logscale)`` with
  the row minimum subtracted and diagonal zeroed;
- otherwise the row interpolates between n's bracketing derived-site
  posterior rows, weighted by recombination position (anc_builder.cpp:139-188).

The per-target row state (index of the last derived step <= s, bracketing
rpos values) is tracked by the caller (the topology builder) exactly like the
reference's ``v_snp_prev``/``v_rpos_prev``/``v_rpos_next`` bookkeeping.

All rows are assembled in one batched device call per rebuild SNP.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fastlog import fast_log


class RowState(NamedTuple):
    """Per-target interpolation state at the current SNP."""
    row: np.ndarray         # (N,) int32: index of last derived step <= snp
    rpos_prev: np.ndarray   # (N,) float64
    rpos_next: np.ndarray   # (N,) float64


def _assemble_ops(topology, logscale, rows, is_exact, wl, wr, kcol):
    """Batched GetMatrix.

    topology: (Dmax, B, N); logscale: (Dmax, B); rows: (B,) step index per
    target; is_exact: (B,) bool; wl/wr: (B,) interpolation weights;
    kcol: (B,) own-column index of each target.
    Returns (B, N) float32 distance matrix (row-min normalized, diag 0).
    """
    B = rows.shape[0]
    bidx = jnp.arange(B)
    top_prev = topology[rows, bidx]                 # (B, N)
    ls_prev = logscale[rows, bidx]                  # (B,)
    rows_n = jnp.minimum(rows + 1, topology.shape[0] - 1)
    top_next = topology[rows_n, bidx]
    ls_next = logscale[rows_n, bidx]

    exact_val = fast_log(top_prev) + ls_prev[:, None]

    # interpolated value, computed in the branch with the larger logscale
    # (anc_builder.cpp:170-186)
    use_next = ls_prev <= ls_next
    e_pn = jnp.exp(ls_prev - ls_next)
    e_np = jnp.exp(ls_next - ls_prev)
    interp_next = fast_log(wl[:, None] * top_prev * e_pn[:, None]
                           + wr[:, None] * top_next) + ls_next[:, None]
    interp_prev = fast_log(wl[:, None] * top_prev
                           + wr[:, None] * top_next * e_np[:, None]) \
        + ls_prev[:, None]
    interp_val = jnp.where(use_next[:, None], interp_next, interp_prev)

    val = jnp.where(is_exact[:, None], exact_val, interp_val)
    mat = -val                                       # scale = -1.0
    rowmin = mat.min(axis=1)
    mat = mat - rowmin[:, None]
    mat = mat.at[bidx, kcol].set(0.0)
    return mat


_assemble = jax.jit(_assemble_ops)


class DistanceAssembler:
    """Stateful per-window distance assembly, mirroring DistanceMeasure."""

    def __init__(self, G: np.ndarray, rpos: np.ndarray,
                 nxt: np.ndarray | None = None):
        self.G = G
        self.rpos = np.asarray(rpos, dtype=np.float64)
        self.L, self.N = G.shape
        # optional precomputed (L, N) next-derived-rpos table
        # (topology_device.next_derived_rpos); avoids O(L) per-target
        # np.nonzero scans in matrix_inputs
        self.nxt = nxt

    def init_state(self, plan, snp: int) -> RowState:
        """Row/rpos state at window entry (DistanceMeasure::Assign /
        GetTopologyWithRepaint, anc_builder.cpp:17-46,77-106).

        row[n] = number of derived sites of n in [section_startpos, snp]
        (row 0 of the repaint is one step before section start);
        rpos_prev[n] = rpos at the last true-derived site of n <= snp (or 0).
        """
        N = self.N
        # row[n] = index of the last plan step <= snp. Steps of n are
        # {first_n} u {derived sites in (first_n, last_n)} u {last_n} and
        # snp is inside [first_n, last_n), so this is the count of derived
        # sites of n in (first_n, snp] — computed from prefix counts, with
        # no per-target searchsorted (plan.idx may live on device).
        first = np.asarray(plan.idx[:, 0]).astype(np.int64)
        lo = int(first.min())
        seg = np.zeros((snp + 2 - lo, N), dtype=np.int32)
        np.cumsum(self.G[lo:snp + 1] != 0, axis=0, out=seg[1:])
        cols = np.arange(N)
        row = (seg[snp + 1 - lo, cols]
               - seg[first + 1 - lo, cols]).astype(np.int64)
        # last true-derived site <= snp per target (reference's tsnp loop,
        # anc_builder.cpp:31-38), as one masked running max
        posmax = np.where(self.G[:snp + 1] == 1,
                          np.arange(snp + 1, dtype=np.int64)[:, None], 0)
        tsnp = posmax.max(axis=0)
        rpos_prev = self.rpos[tsnp]
        return RowState(row=row, rpos_prev=rpos_prev,
                        rpos_next=rpos_prev.copy())

    def advance(self, state: RowState, snp: int,
                carriers: np.ndarray) -> RowState:
        """Per-SNP update before matrix assembly: carriers advance to their
        own row and refresh rpos_prev (anc_builder.cpp:487-495)."""
        row = state.row.copy()
        rp = state.rpos_prev.copy()
        row[carriers] += 1
        rp[carriers] = self.rpos[snp]
        return RowState(row=row, rpos_prev=rp, rpos_next=state.rpos_next)

    def matrix_inputs(self, state: RowState, snp: int,
                      is_first_or_last: bool):
        """Host-side per-SNP inputs for the assembly kernel:
        (rows, is_exact, wl, wr), updating the stale rpos_next state."""
        N = self.N
        G = self.G
        derived = G[snp] == 1
        is_exact = derived | is_first_or_last
        rpos_next = state.rpos_next.copy()
        stale = ~is_exact & (rpos_next <= state.rpos_prev)
        if self.nxt is not None:
            rpos_next[stale] = self.nxt[snp][stale]
        else:
            for n in np.nonzero(stale)[0]:
                nd = np.nonzero(G[snp:, n])[0]
                l = snp + nd[0] if len(nd) else self.L - 1
                rpos_next[n] = self.rpos[l]
        state.rpos_next[:] = rpos_next

        denom = rpos_next - state.rpos_prev
        same = denom == 0
        safe = np.where(same, 1.0, denom)
        wl = np.where(same, 0.5, (rpos_next - self.rpos[snp]) / safe)
        wr = np.where(same, 0.5, (self.rpos[snp] - state.rpos_prev) / safe)
        return (state.row.astype(np.int32), is_exact,
                wl.astype(np.float32), wr.astype(np.float32))

    def get_matrix(self, paint_out, state: RowState, snp: int,
                   is_first_or_last: bool) -> np.ndarray:
        """Assemble the full N x N distance matrix at ``snp``."""
        rows, is_exact, wl, wr = self.matrix_inputs(state, snp,
                                                    is_first_or_last)
        mat = _assemble(paint_out.topology, paint_out.logscale,
                        jnp.asarray(rows), jnp.asarray(is_exact),
                        jnp.asarray(wl), jnp.asarray(wr),
                        jnp.asarray(paint_out.plan.targets, jnp.int32))
        return np.asarray(mat)
