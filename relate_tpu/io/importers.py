"""Tree-sequence importers: Newick, RENT+, ARGweaver .smc, msprime text.

Functional equivalents of ``AncesTree::ReadNewick/ReadRent/
ReadArgweaverSMC/ReadMsPrime`` (``include/src/anc.cpp:1173-1750``) built on
one generic Newick parser instead of the reference's per-format character
scanners. All return :class:`~relate_tpu.core.trees.AncesTree`.
"""
from __future__ import annotations

import re
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.trees import AncesTree, MarginalTree, Tree
from .haps import smart_open


class _NwNode:
    __slots__ = ("name", "length", "children")

    def __init__(self):
        self.name = ""
        self.length = 0.0
        self.children: List["_NwNode"] = []


def _parse_newick_str(s: str) -> _NwNode:
    """Parse one Newick string (';' optional) into a nested node tree.
    NHX/argweaver comments in [...] are ignored; node names may be any
    token not containing '(),:;'."""
    s = re.sub(r"\[[^\]]*\]", "", s.strip())
    if s.endswith(";"):
        s = s[:-1]
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 4 * len(s) + 1000))
    pos = 0

    def parse() -> _NwNode:
        nonlocal pos
        node = _NwNode()
        if pos < len(s) and s[pos] == "(":
            pos += 1
            while True:
                node.children.append(parse())
                if s[pos] == ",":
                    pos += 1
                    continue
                if s[pos] == ")":
                    pos += 1
                    break
        m = re.match(r"[^(),:;]*", s[pos:])
        node.name = m.group(0)
        pos += len(node.name)
        if pos < len(s) and s[pos] == ":":
            pos += 1
            m = re.match(r"[^(),:;]+", s[pos:])
            node.length = float(m.group(0))
            pos += len(m.group(0))
        return node

    root = parse()
    return root


def newick_to_tree(s: str, leaf_base: int = 0, scale: float = 1.0,
                   leaf_map: Optional[Dict[str, int]] = None) -> Tree:
    """Newick -> array Tree. Leaves must be labeled with integers (minus
    ``leaf_base``) or resolvable through ``leaf_map``; internal ids are
    assigned in post-order so the root lands at 2N-1."""
    root = _parse_newick_str(s)
    leaves: List[_NwNode] = []

    def count(n: _NwNode):
        if not n.children:
            leaves.append(n)
        for c in n.children:
            count(c)
    count(root)
    N = len(leaves)
    M = 2 * N - 1
    parent = np.full(M, -1, np.int32)
    cl = np.full(M, -1, np.int32)
    cr = np.full(M, -1, np.int32)
    bl = np.zeros(M, np.float64)
    next_internal = [N]

    def assign(n: _NwNode) -> int:
        if not n.children:
            if leaf_map is not None and n.name in leaf_map:
                return leaf_map[n.name]
            return int(n.name) - leaf_base
        if len(n.children) != 2:
            raise ValueError("importers require strictly binary trees")
        a = assign(n.children[0])
        b = assign(n.children[1])
        v = next_internal[0]
        next_internal[0] += 1
        parent[a] = parent[b] = v
        cl[v], cr[v] = a, b
        bl[a] = n.children[0].length * scale
        bl[b] = n.children[1].length * scale
        return v

    r = assign(root)
    if r != M - 1:
        raise ValueError("malformed newick tree")
    return Tree(parent=parent, child_left=cl, child_right=cr,
                branch_length=bl)


def read_newick(path: str, Ne: float = 1.0) -> AncesTree:
    """Lines of ``pos newick`` with 0-based integer leaf labels
    (AncesTree::ReadNewick, anc.cpp:1556); branch lengths scaled by Ne."""
    seq = []
    with smart_open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            pos_s, nw = line.split(None, 1)
            t = newick_to_tree(nw, leaf_base=0, scale=Ne)
            seq.append(MarginalTree(pos=int(float(pos_s)), tree=t))
    return AncesTree(N=seq[0].tree.N, seq=seq)


def read_rent(path: str, Ne: float = 1.0) -> AncesTree:
    """RENT+ trees output: ``pos newick`` with 1-based leaf labels
    (AncesTree::ReadRent, anc.cpp:1416)."""
    seq = []
    with smart_open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            pos_s, nw = line.split(None, 1)
            t = newick_to_tree(nw, leaf_base=1, scale=Ne)
            seq.append(MarginalTree(pos=int(float(pos_s)), tree=t))
    return AncesTree(N=seq[0].tree.N, seq=seq)


def read_argweaver_smc(path: str) -> AncesTree:
    """ARGweaver .smc: a NAMES header mapping leaves, then
    ``TREE\\tstart\\tend\\tnewick`` lines with [&&NHX] annotations
    (AncesTree::ReadArgweaverSMC, anc.cpp:1215). Leaf k of the newick maps
    to NAMES column k; argweaver's internal node labels are ignored (ids
    are reassigned in post-order)."""
    seq = []
    leaf_map: Dict[str, int] = {}
    with smart_open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if not parts:
                continue
            if parts[0] == "NAMES":
                # argweaver: NAMES n1 n2 ... — newick leaf j is sample
                # int(names[j])-1 in the reference's convention
                for j, name in enumerate(parts[1:]):
                    leaf_map[str(j)] = int(name) - 1 \
                        if name.isdigit() else j
            elif parts[0] == "TREE":
                start = int(float(parts[1]))
                nw = parts[3]
                t = _argweaver_tree(nw, leaf_map)
                seq.append(MarginalTree(pos=start, tree=t))
    return AncesTree(N=seq[0].tree.N, seq=seq)


def _argweaver_tree(nw: str, leaf_map: Dict[str, int]) -> Tree:
    # argweaver labels every node with its own id; leaves are those ids
    # that appear in leaf_map-resolved positions. Build via the generic
    # parser but route leaf names through the map.
    root = _parse_newick_str(nw)
    return _assign_with_map(root, leaf_map)


def _assign_with_map(root: _NwNode, leaf_map: Dict[str, int]) -> Tree:
    leaves: List[_NwNode] = []

    def count(n: _NwNode):
        if not n.children:
            leaves.append(n)
        for c in n.children:
            count(c)
    count(root)
    N = len(leaves)
    M = 2 * N - 1
    parent = np.full(M, -1, np.int32)
    cl = np.full(M, -1, np.int32)
    cr = np.full(M, -1, np.int32)
    bl = np.zeros(M, np.float64)
    nxt = [N]

    def assign(n: _NwNode) -> int:
        if not n.children:
            return leaf_map.get(n.name, int(n.name))
        a = assign(n.children[0])
        b = assign(n.children[1])
        v = nxt[0]
        nxt[0] += 1
        parent[a] = parent[b] = v
        cl[v], cr[v] = a, b
        bl[a] = n.children[0].length
        bl[b] = n.children[1].length
        return v

    assign(root)
    return Tree(parent=parent, child_left=cl, child_right=cr,
                branch_length=bl)


def read_msprime(path: str) -> AncesTree:
    """msprime text export (AncesTree::ReadMsPrime / Tree::GetMsPrime,
    anc.cpp:6-36,1173): a comment line; ``N num_snps``; then per SNP a
    position line followed by 2N-1 node lines ``node [cl cr bl_l bl_r]``."""
    seq = []
    with smart_open(path) as f:
        f.readline()
        N, num_snp = (int(x) for x in f.readline().split()[:2])
        M = 2 * N - 1
        for _ in range(num_snp):
            pos = int(float(f.readline().strip()))
            parent = np.full(M, -1, np.int32)
            cl = np.full(M, -1, np.int32)
            cr = np.full(M, -1, np.int32)
            bl = np.zeros(M, np.float64)
            for _ in range(M):
                toks = f.readline().split()
                v = int(float(toks[0]))
                if len(toks) > 1:
                    a, b = int(float(toks[1])), int(float(toks[2]))
                    cl[v], cr[v] = a, b
                    parent[a] = parent[b] = v
                    bl[a] = float(toks[3])
                    bl[b] = float(toks[4])
            seq.append(MarginalTree(pos=pos, tree=_canonicalize(
                N, parent, cl, cr, bl)))
    return AncesTree(N=N, seq=seq)


def _canonicalize(N: int, parent, cl, cr, bl) -> Tree:
    """Renumber internal nodes into post-order (root last), the layout the
    rest of the framework assumes; msprime ids can be arbitrary."""
    M = 2 * N - 1
    root = int(np.nonzero(parent < 0)[0][-1])
    newid = np.full(M, -1, np.int32)
    newid[:N] = np.arange(N)
    nxt = [N]
    stack = [(root, False)]
    while stack:
        v, done = stack.pop()
        if v < N:
            continue
        if done:
            newid[v] = nxt[0]
            nxt[0] += 1
        else:
            stack.append((v, True))
            stack.append((int(cr[v]), False))
            stack.append((int(cl[v]), False))
    p2 = np.full(M, -1, np.int32)
    c1 = np.full(M, -1, np.int32)
    c2 = np.full(M, -1, np.int32)
    b2 = np.zeros(M, np.float64)
    for v in range(M):
        nv = newid[v]
        b2[nv] = bl[v]
        if parent[v] >= 0:
            p2[nv] = newid[parent[v]]
        if cl[v] >= 0:
            c1[nv] = newid[cl[v]]
            c2[nv] = newid[cr[v]]
    return Tree(parent=p2, child_left=c1, child_right=c2, branch_length=b2)
