"""Input-file conversion and preparation utilities.

Behavioral reference: ``include/file_formats/FileFormats.cpp`` —
ConvertFromVcf (:217), ConvertFromHapLegendSample (:17),
RemoveNonBiallelicSNPs (:534), RemoveSamples (:628), FilterHapsUsingMask
(:802), FlipHapsUsingAncestor (:955), GenerateSNPAnnotations (:1128) — and
ConvertToTreeSequence.cpp (tskit export; the vendored tskit 0.99.1 C library
is replaced by the modern ``tskit`` Python package when available).
"""
from __future__ import annotations

import gzip
from typing import List, Optional, Tuple

import numpy as np

from .haps import HapsData, smart_open, read_fasta


def convert_from_vcf(vcf_path: str, out_prefix: str):
    """Phased VCF -> .haps/.sample (ConvertFromVcf, FileFormats.cpp:217)."""
    ids: List[str] = []
    rows = []
    with smart_open(vcf_path) as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                ids = line.split()[9:]
                continue
            p = line.rstrip("\n").split("\t")
            chrom, pos, rsid, ref, alt = p[0], p[1], p[2], p[3], p[4]
            gts = []
            ok = True
            for g in p[9:]:
                g = g.split(":")[0]
                alleles = g.replace("|", "/").split("/")
                for a in alleles[:2]:
                    if a not in ("0", "1"):
                        ok = False
                        break
                    gts.append(a)
                if not ok:
                    break
            if not ok:
                continue
            rows.append((chrom, rsid, pos, ref, alt, gts))
    with open(out_prefix + ".haps", "w") as f:
        for chrom, rsid, pos, ref, alt, gts in rows:
            f.write(f"{chrom} {rsid} {pos} {ref} {alt} "
                    + " ".join(gts) + "\n")
    with open(out_prefix + ".sample", "w") as f:
        f.write("ID_1 ID_2 missing\n0 0 0\n")
        for i in ids:
            f.write(f"{i} {i} 0\n")


def convert_from_hap_legend_sample(hap_path: str, legend_path: str,
                                   sample_path: str, out_prefix: str,
                                   chrom: str = "1"):
    """IMPUTE hap/legend/sample -> .haps/.sample
    (ConvertFromHapLegendSample, FileFormats.cpp:17)."""
    with smart_open(legend_path) as f:
        next(f)
        legend = [ln.split() for ln in f if ln.strip()]
    with smart_open(hap_path) as fh, open(out_prefix + ".haps", "w") as fo:
        for (lid, pos, a0, a1), line in zip(
                ((r[0], r[1], r[2], r[3]) for r in legend), fh):
            alleles = line.split()
            fo.write(f"{chrom} {lid} {pos} {a0} {a1} "
                     + " ".join(alleles) + "\n")
    with smart_open(sample_path) as f, \
            open(out_prefix + ".sample", "w") as fo:
        lines = [ln.split() for ln in f if ln.strip()]
        fo.write("ID_1 ID_2 missing\n0 0 0\n")
        for r in lines[1:]:
            fo.write(f"{r[0]} {r[0]} 0\n")


def remove_non_biallelic_snps(data: HapsData) -> Tuple[HapsData, np.ndarray]:
    """Drop SNPs at duplicated positions (RemoveNonBiallelicSNPs,
    FileFormats.cpp:534). Returns (filtered, kept index)."""
    bp = data.bp
    dup = np.zeros(len(bp), dtype=bool)
    dup[1:] |= bp[1:] == bp[:-1]
    dup[:-1] |= bp[1:] == bp[:-1]
    keep = np.nonzero(~dup)[0]
    return _subset_snps(data, keep), keep


def remove_samples(data: HapsData, drop_haps: List[int]) -> HapsData:
    """Remove haplotype columns (RemoveSamples, FileFormats.cpp:628)."""
    keep = np.asarray([i for i in range(data.N) if i not in set(drop_haps)])
    return HapsData(genotypes=data.genotypes[:, keep], bp=data.bp,
                    rsid=data.rsid, ancestral=data.ancestral,
                    alternative=data.alternative, chrom=data.chrom)


def filter_haps_using_mask(data: HapsData, mask_seq: str,
                           pass_chars: str = "P"
                           ) -> Tuple[HapsData, np.ndarray]:
    """Keep SNPs whose (1-based) position passes the genome mask
    (FilterHapsUsingMask, FileFormats.cpp:802)."""
    keep = []
    n = len(mask_seq)
    for i, pos in enumerate(data.bp):
        p = int(pos) - 1
        if 0 <= p < n and mask_seq[p] in pass_chars:
            keep.append(i)
    keep = np.asarray(keep, dtype=np.int64)
    return _subset_snps(data, keep), keep


def flip_haps_using_ancestor(data: HapsData, ancestor_seq: str
                             ) -> Tuple[HapsData, np.ndarray]:
    """Polarize alleles against an ancestral genome: SNPs whose stated
    ancestral allele mismatches the ancestor fasta are flipped; SNPs with
    no confident ancestral base are dropped (FlipHapsUsingAncestor,
    FileFormats.cpp:955)."""
    G = data.genotypes.copy()
    anc = list(data.ancestral)
    alt = list(data.alternative)
    keep = []
    n = len(ancestor_seq)
    for i, pos in enumerate(data.bp):
        p = int(pos) - 1
        if not (0 <= p < n):
            continue
        base = ancestor_seq[p].upper()
        if base not in "ACGT":
            continue
        if base == anc[i].upper():
            keep.append(i)
        elif base == alt[i].upper():
            G[i] = 1 - G[i]
            anc[i], alt[i] = alt[i], anc[i]
            keep.append(i)
    keep = np.asarray(keep, dtype=np.int64)
    out = HapsData(genotypes=G[keep], bp=data.bp[keep],
                   rsid=[data.rsid[i] for i in keep],
                   ancestral=[anc[i] for i in keep],
                   alternative=[alt[i] for i in keep],
                   chrom=[data.chrom[i] for i in keep])
    return out, keep


def generate_snp_annotations(data: HapsData, ancestor_seq: Optional[str],
                             poplabels=None) -> List[str]:
    """Per-SNP annotation rows: upstream/downstream ancestral bases and
    per-group carrier counts (GenerateSNPAnnotations,
    FileFormats.cpp:1128)."""
    rows = []
    G = data.genotypes
    groups = poplabels.groups if poplabels is not None else []
    header = "upstream_allele;downstream_allele;" \
        + ";".join(groups) + (";" if groups else "")
    for i, pos in enumerate(data.bp):
        up = down = "NA"
        if ancestor_seq is not None:
            p = int(pos) - 1
            if 1 <= p < len(ancestor_seq) - 1:
                up = ancestor_seq[p - 1].upper()
                down = ancestor_seq[p + 1].upper()
        row = f"{up};{down};"
        if poplabels is not None:
            counts = np.zeros(len(groups), dtype=np.int64)
            for h in np.nonzero(G[i])[0]:
                counts[poplabels.group_of_haplotype[h]] += 1
            row += ";".join(str(c) for c in counts) + ";"
        rows.append(row)
    return header, rows


def _subset_snps(data: HapsData, keep: np.ndarray) -> HapsData:
    return HapsData(genotypes=data.genotypes[keep], bp=data.bp[keep],
                    rsid=[data.rsid[i] for i in keep],
                    ancestral=[data.ancestral[i] for i in keep],
                    alternative=[data.alternative[i] for i in keep],
                    chrom=[data.chrom[i] for i in keep])


def write_haps(data: HapsData, path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for i in range(data.L):
            alleles = " ".join(str(int(x)) for x in data.genotypes[i])
            f.write(f"{data.chrom[i]} {data.rsid[i]} {data.bp[i]} "
                    f"{data.ancestral[i]} {data.alternative[i]} {alleles}\n")


def to_tree_sequence(anc, muts, bp: np.ndarray, out_path: str,
                     alleles=None):
    """Export .anc/.mut to a tskit .trees file (ConvertToTreeSequence,
    ``include/file_formats/ConvertToTreeSequence.cpp:221``).

    Writes the kastore/tskit file-format-12 container natively
    (``io/kastore.py``) — no tskit package required. Leaves are shared
    sample nodes 0..N-1; each marginal tree contributes its own internal
    nodes with strictly-increasing coalescence times (epsilon bumps on
    ties, as the reference enforces parent > child times).
    """
    from . import kastore as _ks

    N = anc.N
    seq_len = float(bp[-1]) + 1.0
    sample_ages = anc.sample_ages
    node_time = [float(sample_ages[i]) if sample_ages is not None else 0.0
                 for i in range(N)]
    node_flags = [1] * N          # TSK_NODE_IS_SAMPLE

    T = len(anc.seq)
    starts = [mt.pos for mt in anc.seq] + [len(bp)]
    muts_by_tree = {}
    for snp, m in enumerate(muts):
        if len(m.branch) == 1:
            muts_by_tree.setdefault(m.tree, []).append(snp)

    e_left, e_right, e_parent, e_child = [], [], [], []
    s_pos, s_anc = [], []
    m_site, m_node, m_der = [], [], []
    for t, mt in enumerate(anc.seq):
        tree = mt.tree
        coords = tree.coordinates(sample_ages)
        left = 0.0 if t == 0 else float(bp[min(starts[t], len(bp) - 1)])
        right = (float(bp[min(starts[t + 1], len(bp) - 1)])
                 if t + 1 < T else seq_len)
        if right <= left:
            continue
        node_map = {v: v for v in range(N)}
        order = np.argsort(coords[N:], kind="stable") + N
        prev = float(coords[:N].max()) if N else 0.0
        for v in order:
            tt = max(float(coords[v]), prev + 1e-6)
            prev = tt
            node_map[int(v)] = len(node_time)
            node_time.append(tt)
            node_flags.append(0)
        for v in range(tree.num_nodes):
            if tree.parent[v] >= 0:
                e_left.append(left)
                e_right.append(right)
                e_parent.append(node_map[int(tree.parent[v])])
                e_child.append(node_map[v])
        for snp in muts_by_tree.get(t, []):
            a0, a1 = ("0", "1")
            if alleles is not None and "/" in alleles[snp]:
                a0, a1 = alleles[snp].split("/")[:2]
            m_site.append(len(s_pos))
            s_pos.append(float(bp[snp]))
            s_anc.append(a0 or "0")
            m_node.append(node_map[int(muts[snp].branch[0])])
            m_der.append(a1 or "1")

    # tskit edge ordering: (time[parent], parent, child, left)
    nt = np.asarray(node_time)
    ep = np.asarray(e_parent, np.int32)
    ec = np.asarray(e_child, np.int32)
    el = np.asarray(e_left)
    er = np.asarray(e_right)
    o = np.lexsort((el, ec, ep, nt[ep]))
    _ks.trees_dump(
        out_path, sequence_length=seq_len,
        node_time=nt, node_flags=np.asarray(node_flags, np.uint32),
        edge_left=el[o], edge_right=er[o],
        edge_parent=ep[o], edge_child=ec[o],
        site_position=np.asarray(s_pos), site_ancestral=s_anc,
        mut_site=np.asarray(m_site, np.int32),
        mut_node=np.asarray(m_node, np.int32), mut_derived=m_der,
        provenance="")
    return out_path
