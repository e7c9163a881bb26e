"""Mutation-rate-through-time estimation.

Behavioral reference: ``include/evaluate/mutation_rate/`` —
AvgMutationRate.cpp (:296-1010): per epoch, mutations (each SNP's age
interval [age_begin, age_end] spread uniformly across epochs) over
opportunity (total tree branch length in the epoch times the bases each SNP
accounts for); MutationDensity (:1015-) walks one sample's root path.
RelateMutationRate.cpp adds the 96 trinucleotide-context categories
(cf. include/test/test_applications.cpp:3-40) for the WithContext modes.

Vectorized: per tree, branch-length-in-epoch is an interval-overlap matrix
reduction; mutation spreading is a clipped-overlap computation over all SNPs
at once.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.topology import MutationRecord
from ..core.trees import AncesTree, Tree

BASES = "ACGT"


def mutation_categories() -> List[str]:
    """The 96 strand-collapsed trinucleotide context categories, in the
    reference's ordering (RelateMutationRate.cpp; test_applications.cpp)."""
    cats = []
    for up in BASES:
        for down in BASES:
            for anc in BASES:
                for der in BASES:
                    if anc != der:
                        cats.append(f"{up}{anc}{down}/{up}{der}{down}")
    # reference collapses strands: keep categories with ancestral in {C, T}
    out = [c for c in cats if c[1] in "CT"]
    assert len(out) == 96
    return out


def reverse_complement(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def collapse_category(up: str, anc: str, der: str, down: str) -> Optional[str]:
    """Map a mutation with context to its strand-collapsed category."""
    if anc not in BASES or der not in BASES or up not in BASES \
            or down not in BASES or anc == der:
        return None
    if anc in "CT":
        return f"{up}{anc}{down}/{up}{der}{down}"
    rc = reverse_complement(f"{up}{anc}{down}")
    rcd = reverse_complement(f"{up}{der}{down}")
    return f"{rc}/{rcd}"


def branch_length_in_epochs(tree: Tree, epochs: np.ndarray,
                            sample_ages: Optional[np.ndarray] = None
                            ) -> np.ndarray:
    """Total tree branch length within each epoch."""
    coords = tree.coordinates(sample_ages)
    lo = coords[:-1]
    hi = np.where(tree.parent[:-1] >= 0,
                  coords[np.maximum(tree.parent[:-1], 0)], lo)
    e_lo = epochs[:, None]
    e_hi = np.append(epochs[1:], np.inf)[:, None]
    ov = np.clip(np.minimum(hi[None, :], e_hi) - np.maximum(lo[None, :], e_lo),
                 0.0, None)
    return ov.sum(axis=1)


def spread_mutations(ages: np.ndarray, epochs: np.ndarray) -> np.ndarray:
    """Spread each mutation's [age_begin, age_end] uniformly over epochs
    (AvgMutationRate.cpp:540-570). ages: (n, 2). Returns (E,) counts."""
    E = len(epochs)
    ab, ae = ages[:, 0], ages[:, 1]
    bl = np.maximum(ae - ab, 1e-30)
    e_lo = epochs[None, :]
    e_hi = np.append(epochs[1:], np.inf)[None, :]
    ov = np.clip(np.minimum(ae[:, None], e_hi)
                 - np.maximum(ab[:, None], e_lo), 0.0, None)
    w = ov / bl[:, None]
    # point mutations (ab == ae) all mass to the containing epoch
    point = ae <= ab
    if point.any():
        e = np.clip(np.searchsorted(epochs, ab[point], side="right") - 1,
                    0, E - 1)
        w[point] = 0.0
        w[np.nonzero(point)[0], e] = 1.0
    return w.sum(axis=0)


def snp_bases(dist: np.ndarray) -> np.ndarray:
    """Bases accounted to each SNP: half the flanking gaps
    (AvgMutationRate count_bases)."""
    L = len(dist)
    b = np.zeros(L)
    b += 0.5 * dist
    b[1:] += 0.5 * dist[:-1]
    return b


def avg_mutation_rate(anc: AncesTree, muts: List[MutationRecord],
                      dist: np.ndarray, epochs: np.ndarray,
                      categories: Optional[np.ndarray] = None,
                      num_categories: int = 1):
    """Mutations / opportunity per epoch (optionally split by category).

    categories: per-SNP integer category (or None for a single category).
    Returns (mutation (E, C), opportunity (E, C), rate (E, C))."""
    E = len(epochs)
    C = num_categories
    if categories is None:
        categories = np.zeros(len(muts), dtype=np.int64)
    bases = snp_bases(dist)

    mutation = np.zeros((E, C))
    opportunity = np.zeros((E, C))
    tree_bl = {}
    tree_of_snp = np.asarray([m.tree for m in muts])
    ages = np.asarray([[m.age_begin, m.age_end] for m in muts])

    # mutations: only mapped, single-branch SNPs contribute
    mapped = np.asarray([len(m.branch) == 1 and m.age_end > 0 for m in muts])
    for c in range(C):
        sel = mapped & (categories == c)
        if sel.any():
            mutation[:, c] = spread_mutations(ages[sel], epochs)

    # opportunity: per tree, bl-in-epoch x bases of its SNPs (per category)
    for t, mt in enumerate(anc.seq):
        sel = tree_of_snp == t
        if not sel.any():
            continue
        blep = branch_length_in_epochs(mt.tree, epochs, anc.sample_ages)
        for c in range(C):
            bsum = bases[sel & (categories == c)].sum()
            if bsum > 0:
                opportunity[:, c] += blep * bsum

    with np.errstate(divide="ignore", invalid="ignore"):
        rate = np.where(opportunity > 0, mutation / opportunity, np.nan)
    return mutation, opportunity, rate


def categorize_snps(bp: np.ndarray, ancestral: List[str],
                    alternative: List[str], ancestor_seq: str
                    ) -> Tuple[np.ndarray, List[str]]:
    """Per-SNP trinucleotide-context category index from an ancestral-genome
    fasta (RelateMutationRate WithContext modes). -1 for unusable SNPs."""
    cats = mutation_categories()
    index = {c: i for i, c in enumerate(cats)}
    out = np.full(len(bp), -1, dtype=np.int64)
    n = len(ancestor_seq)
    for i, pos in enumerate(bp):
        p = int(pos) - 1          # bp is 1-based
        if p <= 0 or p + 1 >= n:
            continue
        up, down = ancestor_seq[p - 1], ancestor_seq[p + 1]
        a, d = ancestral[i], alternative[i]
        if len(a) != 1 or len(d) != 1:
            continue
        cat = collapse_category(up, a.upper(), d.upper(), down)
        if cat is not None and cat in index:
            out[i] = index[cat]
    return out, cats


def write_rate(path: str, epochs: np.ndarray, rate: np.ndarray):
    """<output>_avg.rate format: 'epoch rate' lines."""
    rate = np.atleast_2d(rate.T).T
    with open(path, "w") as f:
        for e in range(len(epochs)):
            r = rate[e, 0] if e < rate.shape[0] else np.nan
            f.write(f"{epochs[e]:g} {r:g}\n")


def mutation_density(anc: AncesTree, muts: List[MutationRecord],
                     dist: np.ndarray, epochs: np.ndarray, sample: int):
    """Per-epoch mutation counts and opportunity along one sample's
    root path (MutationDensity, AvgMutationRate.cpp:1015-)."""
    E = len(epochs)
    out_m = np.zeros((len(anc.seq), E))
    out_o = np.zeros((len(anc.seq), E))
    S = np.zeros(len(dist) + 1)
    np.cumsum(dist, out=S[1:])
    for t, mt in enumerate(anc.seq):
        tree = mt.tree
        coords = tree.coordinates(anc.sample_ages)
        node = sample
        total_age = coords[sample]
        while tree.parent[node] >= 0:
            bl = coords[tree.parent[node]] - coords[node]
            ne = float(tree.num_events[node])
            sb, se = int(tree.SNP_begin[node]), int(tree.SNP_end[node])
            persistence = S[se + 1] - S[sb]
            lo, hi = total_age, total_age + bl
            e_lo = epochs
            e_hi = np.append(epochs[1:], np.inf)
            ov = np.clip(np.minimum(hi, e_hi) - np.maximum(lo, e_lo),
                         0.0, None)
            if bl > 0:
                out_m[t] += ne * ov / bl
            out_o[t] += persistence * ov
            total_age = hi
            node = int(tree.parent[node])
    return out_m, out_o
