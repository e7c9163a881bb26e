"""CLI for the post-inference tool suite, mirroring the reference binaries
RelateCoalescentRate / RelateMutationRate / RelateSelection / RelateExtract /
RelateFileFormats / RelateTreeView (see SURVEY §2.3-2.4 for mode lists).

Usage: python -m relate_tpu.pipeline.tools_cli <tool> --mode <Mode> ...
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _load_pair(prefix):
    from .scripts import _load_pair
    return _load_pair(prefix)


def _merged_mut_rows(recs, bp, dist, rsid, alleles,
                     extra_bp, extra_recs, extra_rsid, extra_alleles):
    """Interleave existing mutation records with newly-mapped extra SNPs by
    position; extras carry dist=0 (GetTreeOfInterest.cpp:250-259)."""
    from ..io import ancmut
    items = [(int(bp[i]), recs[i], int(dist[i]), rsid[i], alleles[i])
             for i in range(len(bp))]
    items += [(int(extra_bp[i]), extra_recs[i], 0, extra_rsid[i],
               extra_alleles[i]) for i in range(len(extra_bp))]
    items.sort(key=lambda t: t[0])
    rows = []
    for snp, (pos, m, d, rs, al) in enumerate(items):
        br = " ".join(str(b) for b in m.branch)
        rows.append(
            f"{snp};{pos};{d};{rs};{m.tree};{br};"
            f"{1 if len(m.branch) != 1 else 0};{int(m.flipped)};"
            f"{ancmut._fmt_g(m.age_begin)};{ancmut._fmt_g(m.age_end)};"
            f"{al};")
    return rows


def _chr_list(args):
    """Chromosome names from --chr (file of names) or
    --first_chr..--last_chr (RelateCoalescentRate.cpp:57-79); None when
    neither is given (single whole-genome input)."""
    if args.chr:
        from ..io.haps import smart_open
        with smart_open(args.chr) as f:
            return [line.strip() for line in f if line.strip()]
    if args.first_chr is not None and args.last_chr is not None:
        if args.first_chr < 0 or args.last_chr < 0:
            raise SystemExit("Do not use negative chr indices.")
        return [str(c) for c in range(args.first_chr, args.last_chr + 1)]
    return None


def _mesh_of(args):
    """Device mesh from --devices N (the ICI sharding axis for the EM's
    psum-reduced statistics and sampled chains); None single-device."""
    if getattr(args, "devices", 0):
        from ..parallel.mesh import default_mesh
        return default_mesh(args.devices)
    return None


def coalescent_rate(args):
    from ..evaluate import coalrate
    from .scripts import estimate_population_size
    mesh = _mesh_of(args)
    epochs = coalrate.epochs_from_bins(*args.bins, args.years_per_gen) \
        if args.bins else coalrate.default_epochs(args.years_per_gen)
    if args.mode == "EstimatePopulationSize":
        chrs = _chr_list(args)
        inputs = [args.input] if chrs is None else \
            [f"{args.input}_chr{c}" for c in chrs]
        group = None
        names = ["0"]
        per_chr = []
        for prefix in inputs:
            anc, recs, bp, dist, rsid, alleles = _load_pair(prefix)
            spans = coalrate.tree_spans(anc, recs, dist)
            trees = [mt.tree for mt in anc.seq]
            if args.poplabels and group is None:
                if args.poplabels == "hap":
                    # per-haplotype-pair rates
                    # (FinalizePopulationSizeByHaplotype)
                    group = np.arange(anc.N)
                    names = [str(h) for h in range(anc.N)]
                else:
                    from ..io import haps as hio
                    pl = hio.read_poplabels(args.poplabels)
                    group = pl.group_of_haplotype[: anc.N]
                    names = pl.groups
            per_chr.append(coalrate.coalescence_stats(trees, spans, epochs,
                                                      group, mesh=mesh))
        # genome-level sum — the in-memory replacement of the reference's
        # per-chromosome .bin sum (SummarizeCoalescentRateForGenome.cpp:8)
        c, o = coalrate.summarize_for_genome(per_chr)
        whole = coalrate.finalize_rates(c.sum(axis=(1, 2)), o.sum(axis=(1, 2)))
        coalrate.write_coal(args.output + ".coal", epochs, whole, ["0"])
        if group is not None:
            coalrate.write_coal(args.output + ".pairwise.coal", epochs,
                                coalrate.finalize_rates(c, o), names)
    elif args.mode == "CoalRateForTree":
        anc, recs, bp, dist, rsid, alleles = _load_pair(args.input)
        trees = [mt.tree for mt in anc.seq]
        counts, opp, rates = coalrate.coal_rate_for_tree(trees, epochs)
        np.savez(args.output + ".rates.npz", epochs=epochs, counts=counts,
                 opportunity=opp, rates=rates)
    elif args.mode == "GenerateConstCoalFile":
        coalrate.generate_const_coal(args.output + ".coal", args.effectiveN,
                                     epochs)
    elif args.mode == "ReEstimateBranchLengths":
        from .scripts import reestimate_branch_lengths
        reestimate_branch_lengths(args.input, args.output, args.coal,
                                  mu=args.mutation_rate, seed=args.seed,
                                  poplabels_path=args.poplabels)
    elif args.mode == "SampleBranchLengths":
        from .scripts import sample_branch_lengths
        sample_branch_lengths(args.input, args.output, args.coal,
                              mu=args.mutation_rate,
                              num_samples=args.num_samples,
                              first_bp=args.first_bp, last_bp=args.last_bp,
                              fmt=args.format, seed=args.seed)
    elif args.mode == "EstimatePopulationSizeEM":
        estimate_population_size(args.input, args.output,
                                 mu=args.mutation_rate,
                                 years_per_gen=args.years_per_gen,
                                 poplabels_path=args.poplabels,
                                 bins=args.bins, num_iter=args.num_iter,
                                 seed=args.seed, mesh=mesh)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def mutation_rate(args):
    from ..evaluate import coalrate, mutrate
    if args.mode in ("SummarizeForGenome", "SummarizeForGenomeForCategory",
                     "Finalize", "FinalizeForCategory",
                     "FinalizeMutationCount", "XY"):
        return mutation_rate_summary(args)
    chrs = _chr_list(args)
    if chrs is not None:
        # per-chromosome loop + genome summarize + finalize
        # (RelateMutationRate ForChromosome modes -> SummarizeForGenome ->
        # Finalize; EstimatePopulationSize.sh:428-461)
        import copy
        outs = []
        for c in chrs:
            a = copy.copy(args)
            a.chr = None
            a.first_chr = a.last_chr = None
            a.input = f"{args.input}_chr{c}"
            a.output = f"{args.output}_chr{c}"
            mutation_rate(a)
            outs.append(a.output)
        a = copy.copy(args)
        a.input = ",".join(outs)
        a.mode = "SummarizeForGenomeForCategory" \
            if "Category" in args.mode or "Context" in args.mode \
            else "SummarizeForGenome"
        mutation_rate_summary(a)
        a.input = a.output
        a.mode = "FinalizeForCategory" if "ForCategory" in a.mode \
            else "Finalize"
        mutation_rate_summary(a)
        return
    anc, recs, bp, dist, rsid, alleles = _load_pair(args.input)
    epochs = coalrate.epochs_from_bins(*args.bins, args.years_per_gen) \
        if args.bins else coalrate.default_epochs(args.years_per_gen)
    if args.mode in ("Avg", "FinalizeAvg"):
        m, o, r = mutrate.avg_mutation_rate(anc, recs, dist, epochs)
        mutrate.write_rate(args.output + "_avg.rate", epochs, r)
        np.savez(args.output + "_avg.npz", epochs=epochs, mutation=m,
                 opportunity=o)
    elif args.mode in ("WithContext", "WithContextForChromosome",
                       "MutationRateForCategory",
                       "ForCategoryForChromosome",
                       "ForCategoryForPopForChromosome"):
        from ..io import haps as hio
        anc_seq = hio.read_fasta(args.ancestor)
        if args.mode == "ForCategoryForPopForChromosome" and args.poplabels:
            # restrict the trees to the population of interest first
            from ..io import extract as _ext
            pl = hio.read_poplabels(args.poplabels)
            keep = [h for h in range(anc.N)
                    if pl.groups[pl.group_of_haplotype[h]] in
                    set(args.pop_of_interest.split(","))]
            anc, recs = _ext.subtrees_for_subpopulation(anc, recs, keep)
        ancestral = [a.split("/")[0] for a in alleles]
        alternative = [a.split("/")[1] if "/" in a else "N" for a in alleles]
        cats, names = mutrate.categorize_snps(bp, ancestral, alternative,
                                              anc_seq)
        m, o, r = mutrate.avg_mutation_rate(anc, recs, dist, epochs,
                                            categories=cats,
                                            num_categories=len(names))
        _write_cat_rate(args.output + ".rate", epochs, names, r)
        np.savez(args.output + "_bycat.npz", epochs=epochs, mutation=m,
                 opportunity=o, names=np.asarray(names))
    elif args.mode == "MutationDensity":
        m, o = mutrate.mutation_density(anc, recs, dist, epochs,
                                        args.sample_id)
        np.savez(args.output + ".density.npz", epochs=epochs, mutation=m,
                 opportunity=o)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def _write_cat_rate(path, epochs, names, r):
    with open(path, "w") as f:
        f.write("epoch " + " ".join(names) + "\n")
        for e in range(len(epochs)):
            row = r[e] if np.ndim(r[e]) else [r[e]]
            f.write(f"{epochs[e]:g} " + " ".join(f"{x:g}" for x in row)
                    + "\n")


def mutation_rate_summary(args):
    """Genome-level aggregation modes that consume per-chromosome .npz
    stats instead of anc/mut (SummarizeForGenome[ForCategory],
    Finalize[ForCategory], FinalizeMutationCount, XY;
    RelateMutationRate.cpp:3453-3634). ``--input`` is a comma-separated
    list of per-chromosome output prefixes."""
    from ..evaluate import mutrate
    suffix = "_bycat.npz" if "ForCategory" in args.mode else "_avg.npz"
    parts = [np.load(p + suffix, allow_pickle=True)
             for p in args.input.split(",")]
    epochs = parts[0]["epochs"]
    m = sum(p["mutation"] for p in parts)
    o = sum(p["opportunity"] for p in parts)
    names = (list(parts[0]["names"]) if "names" in parts[0].files
             else ["all"])
    if args.mode.startswith("SummarizeForGenome"):
        np.savez(args.output + (suffix if suffix.endswith("npz") else ""),
                 epochs=epochs, mutation=m, opportunity=o,
                 names=np.asarray(names))
    elif args.mode in ("Finalize", "FinalizeForCategory"):
        r = np.where(o > 0, m / np.maximum(o, 1e-300), 0.0)
        _write_cat_rate(args.output + ".rate", epochs, names, r)
    elif args.mode == "FinalizeMutationCount":
        _write_cat_rate(args.output + ".count", epochs, names, m)
    elif args.mode == "XY":
        # alpha estimate: ratio of X to autosome mutation rates per epoch
        # (the reference's XY mode compares chrX vs autosome rates)
        if len(parts) < 2:
            raise SystemExit("XY needs two inputs: autosomes,chrX")
        ra = np.where(parts[0]["opportunity"] > 0,
                      parts[0]["mutation"]
                      / np.maximum(parts[0]["opportunity"], 1e-300), 0.0)
        rx = np.where(parts[1]["opportunity"] > 0,
                      parts[1]["mutation"]
                      / np.maximum(parts[1]["opportunity"], 1e-300), 0.0)
        ratio = np.where(ra > 0, rx / np.maximum(ra, 1e-300), 0.0)
        _write_cat_rate(args.output + ".xy", epochs, names, ratio)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def selection_tool(args):
    from ..evaluate import coalrate, selection
    anc, recs, bp, dist, rsid, alleles = _load_pair(args.input)
    epochs = coalrate.default_epochs(args.years_per_gen)
    if args.mode == "Frequency":
        rows = selection.compute_freq_lin(anc, recs, epochs, bp, rsid)
        selection.write_freq_lin(args.output, rows, epochs)
    elif args.mode == "Selection":
        rows, scan = selection.selection_scan(anc, recs, epochs, bp, rsid)
        selection.write_sele(args.output + ".sele", scan, epochs)
    elif args.mode == "Quality":
        q = selection.quality(anc, recs)
        with open(args.output + ".qual", "w") as f:
            f.write("tree num_snps frac_branches_with_mut frac_not_mapping\n")
            for t in range(len(anc.seq)):
                f.write(f"{t} {q['num_snps_on_tree'][t]:g} "
                        f"{q['frac_branches_with_mut'][t]:g} "
                        f"{q['frac_not_mapping'][t]:g}\n")
    elif args.mode == "SDS":
        rows = selection.sds(anc, recs, bp, rsid)
        selection.write_sds(args.output + ".sds", rows)
    elif args.mode == "FreqDiff":
        rows = selection.compute_freq_lin(anc, recs, epochs, bp, rsid)
        diffs, zdiffs = selection.freq_diff(rows, anc.N)
        selection.write_freqdiff(args.output, diffs, zdiffs, epochs)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def extract_tool(args):
    from ..io import ancmut, extract
    if args.mode == "ConvertNewickToTimeb":
        extract.convert_newick_to_timeb(args.input + ".newick",
                                        args.output + ".timeb")
        return
    if args.mode == "CombineAncMut":
        # inverse of DivideAncMut: chunks live at <output>_chr<i>; their
        # per-chunk metadata is concatenated, NOT taken from --input
        # (extract/AncMutChunks.cpp:214-325)
        import os
        from .scripts import _load_pair as lp, _dump_pair
        parts, bps, dists, rsids, alls = [], [], [], [], []
        i = 1
        while os.path.exists(f"{args.output}_chr{i}.anc"):
            a, m, b, d, r, al = lp(f"{args.output}_chr{i}")
            parts.append((a, m))
            bps.append(b)
            dists.append(d)
            rsids.extend(r)
            alls.extend(al)
            i += 1
        if not parts:
            raise SystemExit(f"no chunks found at {args.output}_chr1.anc")
        anc2, recs2 = extract.combine_anc_mut(parts)
        _dump_pair(args.output, anc2, recs2, np.concatenate(bps),
                   np.concatenate(dists), rsids, alls)
        return
    anc, recs, bp, dist, rsid, alleles = _load_pair(args.input)
    if args.mode == "AncToNewick":
        nw = extract.anc_to_newick(anc, recs, bp, args.first_bp,
                                   args.last_bp)
        with open(args.output + ".newick", "w") as f:
            f.write("\n".join(nw) + "\n")
    elif args.mode == "SubTreesForSubpopulation":
        from ..io import haps as hio
        pl = hio.read_poplabels(args.poplabels)
        keep = [h for h in range(anc.N)
                if pl.groups[pl.group_of_haplotype[h]] in
                set(args.pop_of_interest.split(","))]
        sub_anc, sub_muts = extract.subtrees_for_subpopulation(anc, recs,
                                                               keep)
        from .scripts import _dump_pair
        _dump_pair(args.output, sub_anc, sub_muts, bp, dist, rsid, alleles)
    elif args.mode == "AncMutForSubregion":
        sub, subm, (lo, hi) = extract.anc_mut_for_subregion(
            anc, recs, bp, args.first_bp, args.last_bp)
        from .scripts import _dump_pair
        _dump_pair(args.output, sub, subm, bp[lo:hi + 1], dist[lo:hi + 1],
                   rsid[lo:hi + 1], alleles[lo:hi + 1])
    elif args.mode == "RemoveTreesWithFewMutations":
        anc2, recs2 = extract.remove_trees_with_few_mutations(
            anc, recs, args.threshold)
        from .scripts import _dump_pair
        _dump_pair(args.output, anc2, recs2, bp, dist, rsid, alleles)
    elif args.mode == "ExtractDistFromMut":
        extract.extract_dist_from_mut(
            [{"pos": bp[i], "dist": int(dist[i])} for i in range(len(bp))],
            args.output + ".dist")
    elif args.mode == "DivideAncMut":
        chunks = extract.divide_anc_mut(anc, recs, args.threads)
        from .scripts import _dump_pair
        off = 0
        for i, (a, m) in enumerate(chunks):
            n = len(m)
            _dump_pair(f"{args.output}_chr{i+1}", a, m, bp[off:off + n],
                       dist[off:off + n], rsid[off:off + n],
                       alleles[off:off + n])
            off += n
    elif args.mode == "MapMutations":
        # read extra SNPs from a second haps/sample pair, map each onto the
        # tree covering its position, and write a merged .mut — SNPs at
        # already-existing positions are skipped
        # (extract/GetTreeOfInterest.cpp:128-290)
        if not args.haps or not args.sample:
            raise SystemExit("MapMutations needs --haps and --sample for "
                             "the extra SNPs")
        from ..io import haps as hio
        data = hio.read_haps(args.haps, args.sample)
        new = ~np.isin(data.bp, bp)
        extras = extract.map_extra_mutations(
            anc, recs, bp, data.bp[new], data.genotypes[new])
        rows = _merged_mut_rows(
            recs, bp, dist, rsid, alleles,
            data.bp[new], extras,
            [data.rsid[i] for i in np.nonzero(new)[0]],
            [f"{data.ancestral[i]}/{data.alternative[i]}"
             for i in np.nonzero(new)[0]])
        from ..io import ancmut as _ancmut
        _ancmut.write_mut_final(args.output + ".mut", rows)
    elif args.mode == "UnlinkTips":
        tips = [int(x) for x in args.pop_of_interest.split(",") if x]
        anc2 = extract.unlink_tips(anc, tips)
        from .scripts import _dump_pair
        _dump_pair(args.output, anc2, recs, bp, dist, rsid, alleles)
    elif args.mode == "GetMut":
        extract.get_mut(anc, recs)
        from .scripts import _dump_pair
        _dump_pair(args.output, anc, recs, bp, dist, rsid, alleles)
    elif args.mode == "AncientToModern":
        anc2 = extract.ancient_to_modern(anc)
        from .scripts import _dump_pair
        _dump_pair(args.output, anc2, recs, bp, dist, rsid, alleles)
    elif args.mode == "CountMutonBranches":
        rows = extract.count_mut_on_branches(anc, recs)
        with open(args.output + ".mutcount", "w") as f:
            f.write("tree branch count\n")
            for t, b, c in rows:
                f.write(f"{t} {b} {c}\n")
    elif args.mode == "GetAllBranchesOfMut":
        with open(args.output + ".branches", "w") as f:
            f.write("snp branches\n")
            for snp, brs in extract.all_branches_of_mut(recs):
                f.write(f"{snp} {' '.join(str(b) for b in brs)}\n")
    elif args.mode == "CheckBranchPersistence":
        per = extract.check_branch_persistence(anc, recs, bp)
        with open(args.output + ".persistence", "w") as f:
            f.write("snp bp persisted_bases\n")
            for snp, v in enumerate(per):
                f.write(f"{snp} {bp[snp]} {v:g}\n")
    elif args.mode == "GenerateSNPAnnotationsUsingTree":
        rows = extract.generate_snp_annotations_using_tree(anc, recs, bp,
                                                           alleles)
        with open(args.output + ".annot", "w") as f:
            f.write("upstream_allele;downstream_allele;\n")
            f.write("\n".join(rows) + "\n")
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def fileformats_tool(args):
    """RelateFileFormats twin (FileFormats.cpp:17-1128 + anc.cpp importers
    + ConvertToTreeSequence.cpp)."""
    from ..io import fileformats, importers
    from ..io import haps as hio

    if args.mode == "ConvertFromVcf":
        fileformats.convert_from_vcf(args.input, args.output)
    elif args.mode == "ConvertFromHapLegendSample":
        fileformats.convert_from_hap_legend_sample(
            args.input + ".hap.gz", args.input + ".legend.gz",
            args.input + ".sample", args.output)
    elif args.mode in ("RemoveNonBiallelicSNPs", "RemoveSamples",
                       "FilterHapsUsingMask", "FlipHapsUsingAncestor",
                       "GenerateSNPAnnotations"):
        data = hio.read_haps(args.input + ".haps.gz",
                             args.input + ".sample.gz")
        if args.mode == "RemoveNonBiallelicSNPs":
            data, _ = fileformats.remove_non_biallelic_snps(data)
        elif args.mode == "RemoveSamples":
            with open(args.remove_ids) as f:
                drop_names = {x.strip() for x in f if x.strip()}
            _, ids = hio.read_sample(args.input + ".sample.gz")
            drop = [i for i, x in enumerate(ids)
                    if x.rsplit("_", 1)[0] in drop_names]
            data = fileformats.remove_samples(data, drop)
        elif args.mode == "FilterHapsUsingMask":
            mask = hio.read_fasta(args.mask)
            data, _ = fileformats.filter_haps_using_mask(data, mask)
        elif args.mode == "FlipHapsUsingAncestor":
            anc_seq = hio.read_fasta(args.ancestor)
            data, _ = fileformats.flip_haps_using_ancestor(data, anc_seq)
        else:
            anc_seq = hio.read_fasta(args.ancestor) if args.ancestor else None
            pl = hio.read_poplabels(args.poplabels) if args.poplabels \
                else None
            header, rows = fileformats.generate_snp_annotations(
                data, anc_seq, pl)
            with open(args.output + ".annot", "w") as f:
                f.write(header + "\n")
                f.write("\n".join(rows) + "\n")
            return
        fileformats.write_haps(data, args.output)
    elif args.mode in ("ConvertToTreeSequence", "ConvertToTreeSequenceTxt"):
        anc, recs, bp, dist, rsid, alleles = _load_pair(args.input)
        fileformats.to_tree_sequence(anc, recs, bp,
                                     args.output + ".trees",
                                     alleles=alleles)
    elif args.mode in ("ConvertFromNewick", "ConvertFromRent",
                       "ConvertFromArgweaverSMC", "ConvertFromMsPrime"):
        if args.mode == "ConvertFromNewick":
            anc = importers.read_newick(args.input, args.effectiveN)
        elif args.mode == "ConvertFromRent":
            anc = importers.read_rent(args.input, args.effectiveN)
        elif args.mode == "ConvertFromArgweaverSMC":
            anc = importers.read_argweaver_smc(args.input)
        else:
            anc = importers.read_msprime(args.input)
        from ..io import ancmut
        ancmut.write_anc_text(args.output + ".anc", anc)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def treeview_tool(args):
    """RelateTreeView twin — all four modes
    (treeview/RelateTreeView.cpp:29-44)."""
    from ..io import treeview
    anc, recs, bp, dist, rsid, alleles = _load_pair(args.input)
    mode = args.mode or "TreeView"
    if mode in ("TreeView", "TreeViewSample"):
        t = treeview.tree_at_bp(anc, recs, bp, args.bp_of_interest)
        treeview.write_plot_coords(args.output + ".coords", anc, recs, t)
        try:
            treeview.render_tree(anc.seq[t].tree, args.output + ".png",
                                 anc.sample_ages)
        except ImportError:
            pass
    elif mode == "MutationsOnBranches":
        t = treeview.tree_at_bp(anc, recs, bp, args.bp_of_interest)
        by_branch = treeview.mutations_on_branches(anc, recs, t)
        with open(args.output + ".muts", "w") as f:
            f.write("branch snp pos\n")
            for b in sorted(by_branch):
                for snp in by_branch[b]:
                    f.write(f"{b} {snp} {bp[snp]}\n")
    elif mode == "BranchesBelowMutation":
        snp = int(np.searchsorted(bp, args.bp_of_interest, side="right")) - 1
        snp = min(max(snp, 0), len(recs) - 1)
        nodes = treeview.branches_below_mutation(anc, recs, snp)
        tree = anc.seq[recs[snp].tree].tree
        coords = tree.coordinates(anc.sample_ages)
        with open(args.output + ".branches", "w") as f:
            f.write("node parent age\n")
            for v in nodes:
                f.write(f"{v} {tree.parent[v]} {coords[v]:g}\n")
    else:
        raise SystemExit(f"unknown mode {mode}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="relate_tpu.tools")
    p.add_argument("tool", choices=["CoalescentRate", "MutationRate",
                                    "Selection", "Extract", "TreeView",
                                    "FileFormats"])
    p.add_argument("--mode", default="")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("--haps")
    p.add_argument("--sample")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-m", "--mutation_rate", type=float, default=1.25e-8)
    p.add_argument("-N", "--effectiveN", type=float, default=3e4)
    p.add_argument("--coal")
    p.add_argument("--poplabels")
    p.add_argument("--pop_of_interest", default="")
    p.add_argument("--ancestor")
    p.add_argument("--years_per_gen", type=float, default=28.0)
    # multi-chromosome looping (RelateCoalescentRate.cpp:57-79):
    # --chr = file of chromosome names; or an integer range
    p.add_argument("--chr")
    p.add_argument("--first_chr", type=int)
    p.add_argument("--last_chr", type=int)
    p.add_argument("--bins", type=lambda s: tuple(map(float, s.split(","))))
    p.add_argument("--num_iter", type=int, default=10)
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--first_bp", type=int)
    p.add_argument("--last_bp", type=int)
    p.add_argument("--bp_of_interest", type=int, default=0)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--threads", type=int, default=1)
    p.add_argument("--sample_id", type=int, default=0)
    p.add_argument("--format", default="anc")
    p.add_argument("--mask")
    p.add_argument("--remove_ids")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--devices", type=int, default=0,
                   help="shard evaluate/EM tree batches over the first N "
                        "jax devices (psum-reduced statistics)")
    args = p.parse_args(argv)
    from ..utils.trace import stage
    with stage(f"{args.tool}.{args.mode or 'default'}"):
        {"CoalescentRate": coalescent_rate, "MutationRate": mutation_rate,
         "Selection": selection_tool, "Extract": extract_tool,
         "TreeView": treeview_tool, "FileFormats": fileformats_tool}[
             args.tool](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
