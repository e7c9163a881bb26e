"""Selection-evidence scan.

Behavioral reference: ``include/evaluate/selection/RelateSelection.cpp``:
- ``Frequency`` (:330-...): per SNP, the number of carrier lineages and
  total lineages at each epoch boundary, walked from the root down
  (.freq/.lin files; epochs listed oldest-first), plus the lineage counts
  when the derived allele reaches half its present count and count 2.
- ``Selection`` (:190-330): log10 p-value that a mutation observed at fk of
  k lineages rises to fN of N under neutrality — the hypergeometric tail
  P(f >= fN | N, k, fk) (log_pvalue, :141-178) — per epoch and for the
  DAF-half / freq-2 anchor points (.sele).
- ``Quality`` (:mapping quality per SNP; fraction of branches with
  mutations, fraction of non-mapping SNPs per tree).

Vectorized reformulation: lineage counts at all epoch boundaries for one
tree are a rank-1 comparison ``coords > epochs``; carrier counts restrict
the comparison to the mutation's clade (a masked sum). All SNPs on the same
tree share the tree-level quantities.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.topology import MutationRecord
from ..core.trees import AncesTree, Tree


def lineages_at(tree: Tree, coords: np.ndarray,
                times: np.ndarray) -> np.ndarray:
    """Number of branches crossing each time (0 above the root age)."""
    N = tree.N
    internal = coords[N:]
    counts = 1 + (internal[None, :] > times[:, None]).sum(axis=1)
    counts = np.where(times > coords[tree.root], 0, counts)
    return counts


def carriers_at(tree: Tree, coords: np.ndarray, leafmat: np.ndarray,
                branch: int, times: np.ndarray) -> np.ndarray:
    """Number of carrier lineages crossing each time: branches in the
    mutation branch's subtree (incl. itself) whose span covers t; 0 at/above
    the parent of the mutation branch."""
    N = tree.N
    # subtree membership: node u is in subtree(b) iff clade(u) subset clade(b)
    sub = (leafmat & ~leafmat[branch]).sum(axis=1) == 0   # (M,)
    par = tree.parent.copy()
    par_coord = np.where(par >= 0, coords[np.maximum(par, 0)], np.inf)
    lo = coords
    crossing = (lo[None, :] <= times[:, None]) \
        & (times[:, None] < par_coord[None, :])
    counts = (crossing & sub[None, :]).sum(axis=1)
    ptop = coords[tree.parent[branch]] if tree.parent[branch] >= 0 else np.inf
    counts = np.where(times >= ptop, 0, counts)
    return counts


def compute_freq_lin(anc: AncesTree, muts: List[MutationRecord],
                     epochs: np.ndarray, bp=None, rsid=None):
    """Per-SNP carrier/lineage counts at epoch boundaries (oldest-first,
    like the reference's .freq/.lin) plus the DAF-half and freq-2 lineage
    anchors. Returns a list of dict rows (None for skipped SNPs:
    non-mapping, flipped, or rare).

    Vectorized per tree: all SNPs mapped to the same tree share the
    lineage-count vector, and their carrier counts come from one
    (epochs x nodes) @ (nodes x snps) subtree-crossing matmul instead of
    the reference's per-SNP root-down walk (RelateSelection.cpp:330+)."""
    E = len(epochs)
    times = epochs[::-1].copy()            # oldest first
    rows: list = [None] * len(muts)

    by_tree = {}
    for snp, m in enumerate(muts):
        if len(m.branch) != 1 or m.flipped:
            continue
        by_tree.setdefault(m.tree, []).append(snp)

    for t, snps in sorted(by_tree.items()):
        tree = anc.seq[t].tree
        N = tree.N
        M = tree.num_nodes
        coords = tree.coordinates(anc.sample_ages)
        leafmat = tree.leaf_matrix().astype(bool)
        snps = [s for s in snps
                if 0 <= muts[s].branch[0] < tree.root]
        if not snps:
            continue
        bs = np.asarray([muts[s].branch[0] for s in snps])
        S = len(bs)

        lin = lineages_at(tree, coords, times)                 # (E,)
        # subtree membership: node u in subtree(b) iff clade(u) ⊆ clade(b)
        Lf = leafmat.astype(np.float64)                        # (M, N)
        sub = (Lf @ (1.0 - Lf[bs]).T) == 0                     # (M, S)
        par = tree.parent
        par_coord = np.where(par >= 0, coords[np.maximum(par, 0)], np.inf)
        crossing = (coords[None, :] <= times[:, None]) \
            & (times[:, None] < par_coord[None, :])            # (E, M)
        frq = crossing.astype(np.float64) @ sub                # (E, S)
        ptop = np.where(par[bs] >= 0, coords[np.maximum(par[bs], 0)],
                        np.inf)
        frq = np.where(times[:, None] >= ptop[None, :], 0,
                       frq).astype(np.int64)

        daf = leafmat[bs].sum(axis=1).astype(np.int64)
        # anchor ages: subtree internal-node coalescence times, descending
        sub_int = sub[N:]                                      # (M-N, S)
        ages_int = coords[N:]
        masked = np.where(sub_int, ages_int[:, None], -np.inf)  # (M-N, S)
        ages_desc = -np.sort(-masked, axis=0)                  # desc per SNP
        n_sub = sub_int.sum(axis=0)

        int_sorted = np.sort(ages_int)

        def lin_at(tq):
            # lineages crossing time tq-eps: 1 + #internal ages > tq-eps
            cnt = 1 + (M - N) - np.searchsorted(int_sorted, tq - 1e-9,
                                                side="right")
            return np.where(tq - 1e-9 > coords[tree.root], 0, cnt)

        daf_half = (daf + 1) // 2
        # target <= 1 -> parent age of b; else (target-1)-th subtree
        # coalescence age (descending)
        def anchor_lin(target):
            out = np.full(S, -1, dtype=np.int64)
            t_par = ptop.copy()
            use_par = target <= 1
            k = np.maximum(target - 2, 0)
            has_k = (target - 2) < n_sub
            tq = np.where(use_par, t_par,
                          ages_desc[np.minimum(k, ages_desc.shape[0] - 1),
                                    np.arange(S)])
            valid = (use_par & np.isfinite(t_par)) | (~use_par & has_k)
            la = lin_at(tq)
            out[valid] = la[valid]
            return out

        lw_half = np.where(daf_half > 1, anchor_lin(daf_half), -1)
        lw_2 = anchor_lin(np.full(S, 2))

        for j, snp in enumerate(snps):
            rows[snp] = {
                "snp": snp,
                "pos": int(bp[snp]) if bp is not None else snp,
                "rsid": rsid[snp] if rsid is not None else ".",
                "freq": frq[:, j], "lin": lin, "daf": int(daf[j]),
                "lin_when_half": int(lw_half[j]),
                "lin_when_freq2": int(lw_2[j]),
            }
    return rows


def log_pvalue(k: int, fk: float, N: int, fN: float,
               logF: np.ndarray) -> float:
    """log10 P(frequency >= fN | N, k, fk) (RelateSelection.cpp:141-178)."""
    return float(log_pvalue_batch(np.asarray([k]), np.asarray([fk]), N,
                                  np.asarray([fN]), logF)[0])


def log_pvalue_batch(k: np.ndarray, fk: np.ndarray, N: int, fN: np.ndarray,
                     logF: np.ndarray,
                     max_cells: int = 20_000_000) -> np.ndarray:
    """Vectorized :func:`log_pvalue` over arrays of (k, fk, fN).

    The reference's per-call O(N) tail recursion
    (RelateSelection.cpp:141-178: ``px += log(...)``, ``logp =
    logaddexp(logp, px)``) is a logsumexp over ``px(x) = px(x0) +
    cumsum(log terms)`` — computed here for a whole (SNP x epoch) batch as
    one (B, maxlen) cumsum + masked logsumexp, chunked so no intermediate
    exceeds ``max_cells`` floats. Exactly matches the scalar recursion
    (same term order; the only reassociation is the logsumexp, stable via
    max-subtraction)."""
    k = np.asarray(k, dtype=np.int64)
    fk = np.asarray(fk, dtype=np.int64)
    fN = np.asarray(fN, dtype=np.int64)
    out = np.ones(len(k), dtype=np.float64)
    valid = (fk >= 2) & (k != -1) & (fN < N) & (fk < k) & (fN > 0)
    if not valid.any():
        return out
    kv = k[valid]
    fkv = fk[valid]
    fNv = fN[valid]
    lf = logF

    def at(i):
        return lf[np.clip(i, 0, len(lf) - 1)]

    px0 = (at(N - fNv - 1) - at(kv - fkv - 1) - at(N - kv + fkv - fNv)
           + at(fNv - 1) - at(fkv - 1) - at(fNv - fkv)
           - (at(N - 1) - at(kv - 1) - at(N - kv)))
    x0 = fNv - fkv
    y = N - kv
    c = N - 1
    L = y - x0                       # number of recursion terms (>= 0)
    res = np.empty(len(kv), dtype=np.float64)
    maxL = int(L.max())
    chunk = max(1, max_cells // max(maxL, 1))
    for s in range(0, len(kv), chunk):
        sl = slice(s, s + chunk)
        Ls = L[sl]
        mL = int(Ls.max()) if len(Ls) else 0
        if mL == 0:
            res[sl] = px0[sl]
            continue
        j = np.arange(mL, dtype=np.int64)[None, :]
        xs = x0[sl][:, None] + j                      # term evaluated at x
        in_range = j < Ls[:, None]
        ys = y[sl][:, None]
        var = fkv[sl][:, None] + xs
        num = (ys - xs) * var
        den = (xs + 1.0) * (c - var)
        term = np.where(in_range & (num > 0) & (den > 0),
                        np.log(np.maximum(num, 1e-300))
                        - np.log(np.maximum(den, 1e-300)), -np.inf)
        px = px0[sl][:, None] + np.cumsum(term, axis=1)
        px = np.where(in_range, px, -np.inf)
        allpx = np.concatenate([px0[sl][:, None], px], axis=1)
        mx = allpx.max(axis=1, keepdims=True)
        res[sl] = (mx[:, 0]
                   + np.log(np.exp(allpx - mx).sum(axis=1)))
    res = np.minimum(res, 0.0)
    out[valid] = res / np.log(10)
    return out


def selection_scan(anc: AncesTree, muts: List[MutationRecord],
                   epochs: np.ndarray, bp=None, rsid=None):
    """Frequency + Selection in one pass. Returns (rows, pvalue table):
    for each usable SNP, per-epoch log10 p-values (oldest-first) and the
    DAF-half / freq-2 p-values."""
    N = anc.N
    logF = np.zeros(N + 1)
    logF[1:] = np.cumsum(np.log(np.arange(1, N + 1)))
    rows = compute_freq_lin(anc, muts, epochs, bp, rsid)
    # one batched hypergeometric-tail evaluation over every (SNP, epoch)
    # pair + the two anchors (the per-call scalar loop was O(SNPs*E*N)
    # host time at genome scale)
    live = [row for row in rows if row is not None and row["daf"] > 2]
    E = len(epochs)
    pv_map = {}
    if live:
        ks, fks, fNs = [], [], []
        for row in live:
            fN = row["daf"]
            ks.extend(int(row["lin"][i]) for i in range(E))
            fks.extend(int(row["freq"][i]) for i in range(E))
            fNs.extend([fN] * E)
            ks.append(int(row["lin_when_half"]))
            fks.append((fN + 1) // 2)
            fNs.append(fN)
            ks.append(int(row["lin_when_freq2"]))
            fks.append(2)
            fNs.append(fN)
        flat = log_pvalue_batch(np.asarray(ks), np.asarray(fks), N,
                                np.asarray(fNs), logF)
        for i, row in enumerate(live):
            base = i * (E + 2)
            pv_map[row["snp"]] = (flat[base: base + E],
                                  flat[base + E], flat[base + E + 1])
    out = []
    for row in rows:
        if row is None:
            out.append(None)
            continue
        if row["daf"] <= 2:
            pv = np.ones(E)
            p_half = p_2 = 1.0
        else:
            pv, p_half, p_2 = pv_map[row["snp"]]
        out.append({"snp": row["snp"], "pos": row["pos"],
                    "rsid": row["rsid"], "pvalues": pv,
                    "p_half": p_half, "p_freq2": p_2})
    return rows, out


def write_freq_lin(path_prefix: str, rows, epochs: np.ndarray):
    times = epochs[::-1]
    hdr = "pos rs_id " + " ".join(f"{t:f}" for t in times)
    with open(path_prefix + ".freq", "w") as ff, \
            open(path_prefix + ".lin", "w") as fl:
        ff.write(hdr + " TreeFreq DataFreq\n")
        fl.write(hdr + " when_DAF_is_half when_mutation_has_freq2\n")
        for row in rows:
            if row is None:
                continue
            ff.write(f"{row['pos']} {row['rsid']} "
                     + " ".join(str(int(x)) for x in row["freq"])
                     + f" {row['daf']} {row['daf']}\n")
            fl.write(f"{row['pos']} {row['rsid']} "
                     + " ".join(str(int(x)) for x in row["lin"])
                     + f" {row['lin_when_half']} {row['lin_when_freq2']}\n")


def write_sele(path: str, scan, epochs: np.ndarray):
    times = epochs[::-1]
    with open(path, "w") as f:
        f.write("pos rs_id " + " ".join(f"{t:f}" for t in times)
                + " when_DAF_is_half when_mutation_has_freq2\n")
        for row in scan:
            if row is None:
                continue
            f.write(f"{row['pos']} {row['rsid']} "
                    + " ".join(f"{p:.4g}" for p in row["pvalues"])
                    + f" {row['p_half']:.4g} {row['p_freq2']:.4g}\n")


def quality(anc: AncesTree, muts: List[MutationRecord]):
    """Per-tree mapping-quality metrics (RelateSelection Quality mode):
    SNPs on tree, fraction of branches carrying >= 1 mutation, fraction of
    non-mapping SNPs."""
    T = len(anc.seq)
    num_snps = np.zeros(T)
    num_notmapping = np.zeros(T)
    for m in muts:
        num_snps[m.tree] += 1
        if len(m.branch) > 1:
            num_notmapping[m.tree] += 1
    frac_branches = np.zeros(T)
    for t, mt in enumerate(anc.seq):
        ne = mt.tree.num_events
        frac_branches[t] = (ne[:-1] > 0).mean()
    with np.errstate(invalid="ignore", divide="ignore"):
        frac_nm = np.where(num_snps > 0, num_notmapping / num_snps, 0.0)
    return {"num_snps_on_tree": num_snps,
            "frac_branches_with_mut": frac_branches,
            "frac_not_mapping": frac_nm}


def sds(anc: AncesTree, muts: List[MutationRecord], bp=None, rsid=None):
    """SDS-like statistic (RelateSelection.cpp:816-1090): per usable SNP,
    log((sum of ancestral tip branch lengths / sum of derived tip branch
    lengths) * DAF) / (N - DAF)."""
    N = anc.N
    out = []
    cur_tree = -1
    tree = leafmat = tipbl = None
    for snp, m in enumerate(muts):
        if len(m.branch) != 1 or m.flipped:
            out.append(None)
            continue
        b = m.branch[0]
        if m.tree != cur_tree:
            cur_tree = m.tree
            tree = anc.seq[cur_tree].tree
            leafmat = tree.leaf_matrix().astype(bool)
            tipbl = tree.branch_length[:N]
        if b < 0 or b == tree.root:
            out.append(None)
            continue
        dmask = leafmat[b][:N]
        daf = int(dmask.sum())
        if daf == 0 or daf == N:
            out.append(None)
            continue
        d_sds = float(tipbl[dmask].sum())
        a_sds = float(tipbl[~dmask].sum())
        if d_sds <= 0:
            out.append(None)
            continue
        r = float(np.log((a_sds / d_sds) * daf) / (N - daf))
        out.append({"snp": snp,
                    "pos": int(bp[snp]) if bp is not None else snp,
                    "rsid": rsid[snp] if rsid is not None else ".",
                    "rSDS": r})
    return out


def write_sds(path: str, rows):
    with open(path, "w") as f:
        f.write("pos rs_id rSDS\n")
        for r in rows:
            if r is None:
                continue
            f.write(f"{r['pos']} {r['rsid']} {r['rSDS']:g}\n")


def freq_diff(rows, N: int):
    """FreqDiff (RelateSelection.cpp:1098-1330): per-epoch derived-fraction
    changes (newest-first), -10 where undefined, plus a z-scored version
    standardized within SNPs of the same present-day count.

    rows: output of compute_freq_lin. Returns (diffs, zdiffs) lists aligned
    with rows; each entry is (pos, rsid, diff array, fN)."""
    diffs = []
    E = None
    for row in rows:
        if row is None:
            diffs.append(None)
            continue
        # reverse to newest-first and drop the anchor columns
        f = row["freq"][::-1].astype(np.float64)
        k = row["lin"][::-1].astype(np.float64)
        E = len(f)
        d = np.full(E - 1, -10.0)
        ok = (f[1:] > 0) & (k[1:] > 0.1 * N)
        with np.errstate(divide="ignore", invalid="ignore"):
            val = f[1:] / np.maximum(k[1:], 1e-30) \
                - f[:-1] / np.maximum(k[:-1], 1e-30)
        d[ok] = val[ok]
        diffs.append({"pos": row["pos"], "rsid": row["rsid"], "diff": d,
                      "fN": int(row["freq"][-1])})
    # per-fN mean/sd over valid entries
    stats = {}
    for r in diffs:
        if r is None:
            continue
        m = stats.setdefault(r["fN"], [np.zeros(E - 1), np.zeros(E - 1),
                                       np.zeros(E - 1)])
        ok = r["diff"] != -10
        m[0][ok] += r["diff"][ok]
        m[1][ok] += r["diff"][ok] ** 2
        m[2][ok] += 1
    zdiffs = []
    for r in diffs:
        if r is None or r["fN"] <= 1:
            zdiffs.append(None)
            continue
        s, s2, c = stats[r["fN"]]
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(c > 0, s / np.maximum(c, 1), 0.0)
            var = np.where(c > 1, (s2 - c * mean * mean)
                           / np.maximum(c - 1, 1), 0.0)
            sd = np.sqrt(np.maximum(var, 0.0))
            z = np.where((r["diff"] != -10) & (sd > 0),
                         (r["diff"] - mean) / np.where(sd > 0, sd, 1.0),
                         np.nan)
        zdiffs.append({"pos": r["pos"], "rsid": r["rsid"], "z": z,
                       "fN": r["fN"]})
    return diffs, zdiffs


def write_freqdiff(prefix: str, diffs, zdiffs, epochs=None):
    """Write .freqdiff/.zfreqdiff in the reference's layout
    (RelateSelection.cpp FreqDiff): header row of epoch boundaries in
    generations OLDEST-first (float32-printed), one row per usable SNP
    with the per-epoch diffs oldest-first, then the present-day derived
    count (TreeFreq)."""
    header = None
    if epochs is not None:
        header = ("pos rs_id "
                  + " ".join(f"{x:f}" for x in
                             np.asarray(epochs, np.float32)[::-1])
                  + " TreeFreq\n")
    with open(prefix + ".freqdiff", "w") as f:
        if header:
            f.write(header)
        for r in diffs:
            if r is None:
                continue
            f.write(f"{r['pos']} {r['rsid']} "
                    + " ".join(f"{x:g}" for x in r["diff"][::-1])
                    + f" {r['fN']}\n")
    with open(prefix + ".zfreqdiff", "w") as f:
        if header:
            f.write(header)
        for r in zdiffs:
            if r is None:
                continue
            f.write(f"{r['pos']} {r['rsid']} "
                    + " ".join("NA" if np.isnan(x) else f"{x:g}"
                               for x in r["z"][::-1]) + f" {r['fN']}\n")
