"""Python equivalents of the reference's L6 shell-script drivers
(``scripts/``): EstimatePopulationSize.sh, DetectSelection.sh,
SampleBranchLengths.sh / ReEstimateBranchLengths.sh, PrepareInputFiles.sh.

The shell scripts orchestrate binaries through temp files and job arrays;
here each driver is a plain function over in-memory tree sequences, with the
device parallelism inside the called kernels.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..core.topology import MutationRecord
from ..evaluate import coalrate, mutrate, sampling, selection
from ..io import ancmut, extract, fileformats
from ..io import haps as hio


def _load_pair(prefix: str):
    anc = ancmut.read_anc_text(prefix + ".anc")
    md = ancmut.read_mut_final(prefix + ".mut")
    recs = [MutationRecord(tree=m["tree"], branch=m["branch"],
                           flipped=bool(m["flipped"]),
                           age_begin=m["age_begin"], age_end=m["age_end"])
            for m in md]
    bp = np.asarray([m["pos"] for m in md])
    dist = np.asarray([m["dist"] for m in md], dtype=np.float64)
    rsid = [m["rsid"] for m in md]
    alleles = [m["alleles"] for m in md]
    return anc, recs, bp, dist, rsid, alleles


def _dump_pair(prefix: str, anc, recs, bp, dist, rsid, alleles):
    ancmut.get_age(anc, recs)
    rows = []
    for snp, m in enumerate(recs):
        br = " ".join(str(b) for b in m.branch)
        rows.append(
            f"{snp};{bp[snp]};{int(dist[snp])};{rsid[snp]};{m.tree};{br};"
            f"{1 if len(m.branch) > 1 else 0};{int(m.flipped)};"
            f"{ancmut._fmt_g(m.age_begin)};{ancmut._fmt_g(m.age_end)};"
            f"{alleles[snp]};")
    ancmut.write_anc_text(prefix + ".anc", anc)
    ancmut.write_mut_final(prefix + ".mut", rows)


def estimate_population_size(input_prefix: str, output_prefix: str,
                             mu: float = 1.25e-8,
                             years_per_gen: float = 28.0,
                             poplabels_path: Optional[str] = None,
                             bins: Optional[tuple] = None,
                             num_iter: int = 10, seed: int = 1,
                             threshold_frac: float = 0.5,
                             reestimate_final: bool = True,
                             verbose: bool = True, mesh=None):
    """EstimatePopulationSize.sh: joint EM over coalescence rates and branch
    lengths; writes <output>.coal (+ by-group pairwise if poplabels) and the
    re-estimated <output>.anc/.mut."""
    anc, recs, bp, dist, rsid, alleles = _load_pair(input_prefix)
    if threshold_frac > 0:
        anc, recs = extract.remove_trees_with_few_mutations(
            anc, recs, threshold_frac)
    group_of_hap = None
    names = None
    if poplabels_path:
        pl = hio.read_poplabels(poplabels_path)
        group_of_hap = pl.group_of_haplotype[: anc.N]
        names = pl.groups
    epochs = coalrate.epochs_from_bins(*bins, years_per_gen) if bins \
        else coalrate.default_epochs(years_per_gen)
    epochs, rates, whole = coalrate.estimate_popsize_em(
        anc, recs, dist, mu=mu, epochs=epochs, num_iter=num_iter,
        seed=seed, group_of_hap=group_of_hap, verbose=verbose, mesh=mesh)
    coalrate.write_coal(output_prefix + ".coal", epochs, whole, ["0"])
    if verbose:
        # terminal popsize plot (plot.cpp via FinalizePopulationSize.cpp:2)
        from ..utils.asciiplot import ascii_plot
        import sys as _sys
        with np.errstate(divide="ignore"):
            ne = np.where(np.asarray(whole) > 0,
                          0.5 / np.maximum(np.asarray(whole), 1e-300), 0.0)
        _sys.stderr.write(ascii_plot(epochs, ne))
    if group_of_hap is not None:
        coalrate.write_coal(output_prefix + ".pairwise.coal", epochs,
                            rates, names)
    if reestimate_final:
        # final pass mirrors the .sh: posterior-MEAN re-estimate of the
        # ORIGINAL (unfiltered) trees under the final .coal
        anc_f, recs_f, bp_f, dist_f, rsid_f, alleles_f = \
            _load_pair(input_prefix)
        sampling.reestimate_branch_lengths(anc_f, recs_f, dist_f, mu,
                                           epochs, whole,
                                           seed=seed + num_iter)
        _dump_pair(output_prefix, anc_f, recs_f, bp_f, dist_f, rsid_f,
                   alleles_f)
    return epochs, rates


def detect_selection(input_prefix: str, output_prefix: str,
                     mu: float = 1.25e-8, years_per_gen: float = 28.0,
                     first_bp: Optional[int] = None,
                     last_bp: Optional[int] = None):
    """DetectSelection.sh: frequency-through-time + selection p-values +
    per-tree quality; writes .freq/.lin/.sele/.qual."""
    anc, recs, bp, dist, rsid, alleles = _load_pair(input_prefix)
    if first_bp is not None and last_bp is not None:
        anc, recs, (lo, hi) = extract.anc_mut_for_subregion(
            anc, recs, bp, first_bp, last_bp)
        bp, rsid = bp[lo:hi + 1], rsid[lo:hi + 1]
    epochs = coalrate.default_epochs(years_per_gen)
    rows, scan = selection.selection_scan(anc, recs, epochs, bp, rsid)
    selection.write_freq_lin(output_prefix, rows, epochs)
    selection.write_sele(output_prefix + ".sele", scan, epochs)
    q = selection.quality(anc, recs)
    with open(output_prefix + ".qual", "w") as f:
        f.write("tree num_snps frac_branches_with_mut frac_not_mapping\n")
        for t in range(len(anc.seq)):
            f.write(f"{t} {q['num_snps_on_tree'][t]:g} "
                    f"{q['frac_branches_with_mut'][t]:g} "
                    f"{q['frac_not_mapping'][t]:g}\n")
    return output_prefix


def sample_branch_lengths(input_prefix: str, output_prefix: str,
                          coal_path: str, mu: float = 1.25e-8,
                          num_samples: int = 100,
                          first_bp: Optional[int] = None,
                          last_bp: Optional[int] = None,
                          fmt: str = "anc", seed: int = 1):
    """SampleBranchLengths.sh: posterior branch-length samples under a .coal
    prior; fmt in {anc, newick, timeb}."""
    anc, recs, bp, dist, rsid, alleles = _load_pair(input_prefix)
    if first_bp is not None and last_bp is not None:
        anc, recs, (lo, hi) = extract.anc_mut_for_subregion(
            anc, recs, bp, first_bp, last_bp)
        bp, dist = bp[lo:hi + 1], dist[lo:hi + 1]
        rsid, alleles = rsid[lo:hi + 1], alleles[lo:hi + 1]
        extract.extract_dist_from_mut(
            [{"pos": bp[i], "dist": int(dist[i])} for i in range(len(bp))],
            output_prefix + ".dist")
    names, epochs, rates = coalrate.read_coal(coal_path)
    samples = sampling.sample_branch_lengths(
        anc, recs, dist, mu, epochs, rates[:, 0, 0], num_samples=num_samples,
        seed=seed)
    if fmt == "newick":
        with open(output_prefix + ".newick", "w") as f:
            for t in range(len(anc.seq)):
                for s in range(num_samples):
                    tr = anc.seq[t].tree.copy()
                    tr.branch_length = samples[s, t]
                    f.write(tr.to_newick() + "\n")
    elif fmt == "timeb":
        sampling.write_timeb(output_prefix + ".timeb", anc, samples,
                             muts=recs, bp=bp, alleles=alleles)
    else:
        # mean over samples into one anc/mut (plus all samples as .npy)
        mean_bl = samples.mean(axis=0)
        for i, mt in enumerate(anc.seq):
            mt.tree.branch_length = mean_bl[i]
        _dump_pair(output_prefix, anc, recs, bp, dist, rsid, alleles)
        np.save(output_prefix + "_samples.npy", samples)
    return samples


def reestimate_branch_lengths(input_prefix: str, output_prefix: str,
                              coal_path: str, mu: float = 1.25e-8,
                              seed: int = 1,
                              poplabels_path: Optional[str] = None):
    """ReEstimateBranchLengths.sh: whole-chromosome re-estimation under a
    .coal prior; with ``poplabels_path`` the prior uses pairwise group
    rates (ReEstimateBranchLengths.cpp:144-232 with --poplabels)."""
    anc, recs, bp, dist, rsid, alleles = _load_pair(input_prefix)
    names, epochs, rates = coalrate.read_coal(coal_path)
    memberships = None
    if poplabels_path is not None:
        pl = hio.read_poplabels(poplabels_path)
        memberships = pl.group_of_haplotype[: anc.N]
        if rates.shape[1] != pl.num_groups:
            raise SystemExit(
                f"coal file has {rates.shape[1]} groups, poplabels "
                f"{pl.num_groups}")
    sampling.reestimate_branch_lengths(anc, recs, dist, mu, epochs,
                                       rates[:, 0, 0], seed=seed,
                                       group_rates=(rates if memberships
                                                    is not None else None),
                                       memberships=memberships)
    _dump_pair(output_prefix, anc, recs, bp, dist, rsid, alleles)


def prepare_input_files(haps_path: str, sample_path: str, out_prefix: str,
                        ancestor_path: Optional[str] = None,
                        mask_path: Optional[str] = None,
                        remove_ids: Optional[List[str]] = None,
                        poplabels_path: Optional[str] = None):
    """PrepareInputFiles.sh: flip against ancestor, apply mask, drop
    samples, remove non-biallelics; writes <out>.haps.gz/.sample/.dist/.annot.
    """
    data = hio.read_haps(haps_path, sample_path)
    _, ids = hio.read_sample(sample_path)
    if remove_ids:
        drop = [i for i, x in enumerate(ids)
                if x.rsplit("_", 1)[0] in set(remove_ids)]
        data = fileformats.remove_samples(data, drop)
        ids = [x for i, x in enumerate(ids) if i not in set(drop)]
    data, _ = fileformats.remove_non_biallelic_snps(data)
    if ancestor_path:
        anc_seq = hio.read_fasta(ancestor_path)
        data, _ = fileformats.flip_haps_using_ancestor(data, anc_seq)
    else:
        anc_seq = None
    if mask_path:
        mask = hio.read_fasta(mask_path)
        data, _ = fileformats.filter_haps_using_mask(data, mask)
    fileformats.write_haps(data, out_prefix + ".haps.gz")
    with open(out_prefix + ".sample", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in range(0, len(ids), 2):
            f.write(f"{ids[i].rsplit('_', 1)[0]} "
                    f"{ids[i].rsplit('_', 1)[0]} 0\n")
    d = hio.compute_dist(data.bp)
    with open(out_prefix + ".dist", "w") as f:
        f.write("#pos dist\n")
        for i in range(data.L):
            f.write(f"{data.bp[i]} {d[i]}\n")
    if poplabels_path or anc_seq is not None:
        pl = hio.read_poplabels(poplabels_path) if poplabels_path else None
        header, rows = fileformats.generate_snp_annotations(data, anc_seq, pl)
        with open(out_prefix + ".annot", "w") as f:
            f.write(header + "\n")
            for r in rows:
                f.write(r + "\n")
    return out_prefix
