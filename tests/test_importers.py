"""Tree importers (Newick / RENT+ / ARGweaver SMC / msprime text)."""
import numpy as np

from relate_tpu.io import importers, extract
from relate_tpu.core.trees import AncesTree, MarginalTree, Tree


def _tree():
    return Tree(parent=np.asarray([3, 3, 4, 4, -1], np.int32),
                child_left=np.asarray([-1, -1, -1, 0, 3], np.int32),
                child_right=np.asarray([-1, -1, -1, 1, 2], np.int32),
                branch_length=np.asarray([1.5, 1.5, 3.25, 1.75, 0.]))


def _same_topology(a: Tree, b: Tree):
    # compare clades via leaves-below
    def clades(t):
        cl = []
        for v in range(t.N, t.num_nodes):
            stack, leaves = [v], []
            while stack:
                u = stack.pop()
                if u < t.N:
                    leaves.append(u)
                else:
                    stack += [int(t.child_left[u]), int(t.child_right[u])]
            cl.append(frozenset(leaves))
        return set(cl)
    return clades(a) == clades(b)


def test_newick_roundtrip(tmp_path):
    t = _tree()
    p = tmp_path / "t.newick"
    p.write_text(f"0 {t.to_newick()}\n10 {t.to_newick()}\n")
    anc = importers.read_newick(str(p), Ne=2.0)
    assert anc.N == 3 and len(anc.seq) == 2
    got = anc.seq[0].tree
    assert _same_topology(t, got)
    # branch lengths scaled by Ne
    np.testing.assert_allclose(sorted(got.branch_length[:2]),
                               [3.0, 3.0])
    assert anc.seq[1].pos == 10


def test_rent_one_based(tmp_path):
    t = _tree()
    nw = t.to_newick()
    # relabel to 1-based
    nw1 = nw.replace("0:", "1:").replace("1:", "1:")  # careful below
    # build manually: leaves 1,2,3
    nw1 = "((1:1.50000,2:1.50000):1.75000,3:3.25000);"
    p = tmp_path / "t.trees"
    p.write_text(f"55 {nw1}\n")
    anc = importers.read_rent(str(p), Ne=1.0)
    assert anc.N == 3
    assert anc.seq[0].pos == 55
    assert _same_topology(t, anc.seq[0].tree)


def test_argweaver_smc(tmp_path):
    smc = ("NAMES\t1\t2\t3\n"
           "REGION\tchr\t1\t1000\n"
           "TREE\t1\t400\t((0:1.5[&&NHX:age=0],1:1.5[&&NHX:age=0])"
           "3:1.75[&&NHX:age=0],2:3.25[&&NHX:age=0])4[&&NHX:age=0];\n")
    p = tmp_path / "t.smc"
    p.write_text(smc)
    anc = importers.read_argweaver_smc(str(p))
    assert anc.N == 3 and len(anc.seq) == 1
    assert _same_topology(_tree(), anc.seq[0].tree)


def test_msprime_text(tmp_path):
    # node lines: "v cl cr bl_l bl_r"; arbitrary internal numbering
    txt = ("#msprime\n3 1\n123\n0\n1\n2\n4 1 2 1.5 3.25\n3 0 4 3.0 1.75\n")
    p = tmp_path / "t.txt"
    p.write_text(txt)
    anc = importers.read_msprime(str(p))
    t = anc.seq[0].tree
    assert anc.seq[0].pos == 123
    assert t.root == t.num_nodes - 1
    assert t.parent[t.root] == -1
    # canonicalized: root last, parents valid
    for v in range(t.num_nodes - 1):
        assert t.parent[v] >= 0


def test_convert_newick_to_timeb(tmp_path):
    t = _tree()
    p = tmp_path / "s.newick"
    p.write_text((t.to_newick() + "\n") * 3)
    out = str(tmp_path / "s.timeb")
    extract.convert_newick_to_timeb(str(p), out)
    hdr = np.fromfile(out, dtype=np.int32, count=3)
    assert list(hdr) == [3, 1, 5]
    ages = np.fromfile(out, dtype=np.float32, offset=12).reshape(3, 5)
    assert (ages[:, 3:] > 0).all()
