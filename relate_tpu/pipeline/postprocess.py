"""Topology post-processing (NNI refinement of unsupported branches).

Behavioral reference: ``include/pipeline/PostProcess.cpp`` (beta mode): for
each internal branch with no mapped mutations, evaluate the three
nearest-neighbour-interchange resolutions of the (child1, child2, sibling)
triplet against nearby SNPs' carrier sets, and keep the resolution whose
supporting SNP is closest (PostProcess.cpp:560-700). The reference's scoring
walks candidate SNPs per branch with approximate set matches; here the
carrier sets are compared as clade bitmask equalities over a window of SNPs
around the tree span (a deterministic simplification of the same
criterion).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..core.topology import MutationRecord
from ..core.trees import AncesTree


def post_process(anc: AncesTree, muts: List[MutationRecord],
                 G: np.ndarray, bp: np.ndarray,
                 window_snps: int = 200, seed: int = 1,
                 randomise: bool = False) -> int:
    """Refine zero-event internal branches by NNI; returns the number of
    rearranged nodes. Mutates ``anc`` in place; mutation records whose
    branch clades changed keep their branch ids (ids are positional).

    With ``randomise`` (PostProcess.cpp's --randomise), unsupported
    branches pick one of the three NNI resolutions uniformly at random
    instead of by closest supporting SNP."""
    rng = np.random.default_rng(seed)
    num_updated = 0
    L = G.shape[0]
    for t, mt in enumerate(anc.seq):
        tree = mt.tree
        N = tree.N
        leafmat = tree.leaf_matrix().astype(bool)
        lo = int(tree.SNP_begin[0])
        hi = int(tree.SNP_end[0])
        wlo = max(lo - window_snps, 0)
        whi = min(hi + window_snps, L - 1)
        block = G[wlo:whi + 1].astype(bool)
        snp_pos = np.arange(wlo, whi + 1)
        center = (lo + hi) / 2.0

        for i in range(N, tree.num_nodes - 1):
            if tree.num_events[i] != 0.0:
                continue
            parent = int(tree.parent[i])
            if parent < 0:
                continue
            n1 = int(tree.child_left[i])
            n2 = int(tree.child_right[i])
            n3 = int(tree.child_left[parent])
            if n3 == i:
                n3 = int(tree.child_right[parent])

            def closest_support(a, b):
                clade = leafmat[a] | leafmat[b]
                match = (block == clade[None, :]).all(axis=1)
                if not match.any():
                    return np.inf
                return np.abs(snp_pos[match] - center).min()

            if randomise:
                choice = rng.integers(3)
                if choice == 0:
                    tree.num_events[i] = 1.0
                    continue
                keep, move = (n1, n3) if choice == 1 else (n2, n3)
            else:
                d12 = closest_support(n1, n2)   # current arrangement
                d13 = closest_support(n1, n3)
                d23 = closest_support(n2, n3)
                best = min(d12, d13, d23)
                if not np.isfinite(best):
                    continue
                if d13 == best and d13 < d12:
                    keep, move = n1, n3
                elif d23 == best and d23 < d12:
                    keep, move = n2, n3
                else:
                    tree.num_events[i] = 1.0
                    continue
            # rearrange: i's children become (keep, move); the displaced
            # child pairs with i under parent
            displaced = n2 if keep == n1 else n1
            tree.child_left[i] = keep
            tree.child_right[i] = move
            tree.parent[keep] = i
            tree.parent[move] = i
            if tree.child_left[parent] == n3:
                tree.child_left[parent] = i
                tree.child_right[parent] = displaced
            else:
                tree.child_right[parent] = i
                tree.child_left[parent] = displaced
            tree.parent[displaced] = parent
            tree.parent[i] = parent
            tree.num_events[i] = 1.0
            leafmat[i] = leafmat[keep] | leafmat[move]
            num_updated += 1
    return num_updated
