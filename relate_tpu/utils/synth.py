"""Deterministic synthetic haplotype panels for benchmarking.

Allele frequencies follow the neutral-ish site-frequency spectrum
(p(f) ~ 1/f), giving realistic per-target derived-site densities — the
quantity that determines painting work. Not a coalescent simulator; used
only for like-for-like throughput comparisons between this framework and
the reference binary on identical inputs.
"""
from __future__ import annotations

import numpy as np


def synth_panel(N: int, L: int, seed: int = 7, bp_spacing: int = 500):
    """Returns (G (L, N) uint8, bp (L,) int64)."""
    rng = np.random.default_rng(seed)
    # SFS-like derived counts: P(k) ~ 1/k for k in 1..N-1
    k = np.arange(1, N)
    w = 1.0 / k
    counts = rng.choice(k, size=L, p=w / w.sum())
    G = np.zeros((L, N), dtype=np.uint8)
    # correlated carriers: choose a contiguous block of a random permutation
    # per segment to mimic LD (cheap approximation)
    perm = rng.permutation(N)
    for l in range(L):
        if l % 64 == 0:
            perm = rng.permutation(N)
        off = int(rng.integers(N))
        idx = np.concatenate([perm[off:], perm[:off]])[:counts[l]]
        G[l, idx] = 1
    bp = (np.arange(L, dtype=np.int64) + 1) * bp_spacing
    return G, bp


def write_haps_sample(G: np.ndarray, bp: np.ndarray, prefix: str):
    """Write .haps/.sample files readable by both frameworks."""
    L, N = G.shape
    assert N % 2 == 0
    with open(prefix + ".haps", "w") as f:
        for l in range(L):
            alleles = " ".join(str(int(x)) for x in G[l])
            f.write(f"1 snp{l} {bp[l]} A T {alleles}\n")
    with open(prefix + ".sample", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(N // 2):
            f.write(f"s{i} s{i} 0\n")


def write_flat_map(path: str, max_bp: int, cm_per_mb: float = 1.0):
    with open(path, "w") as f:
        f.write("pos COMBINED_rate Genetic_Map\n")
        step = 1000000
        for bp in range(0, max_bp + 2 * step, step):
            f.write(f"{bp} {cm_per_mb} {bp / 1e6 * cm_per_mb}\n")
