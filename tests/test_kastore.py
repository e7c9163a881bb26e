"""Native kastore container + .trees exporter."""
import numpy as np
import pytest

from relate_tpu.core.topology import MutationRecord
from relate_tpu.core.trees import AncesTree, MarginalTree, Tree
from relate_tpu.io import fileformats, kastore


def test_kastore_roundtrip(tmp_path):
    items = {
        "alpha": np.arange(7, dtype=np.float64),
        "b/nested": np.asarray([1, -2, 3], np.int32),
        "empty": np.zeros(0, np.uint32),
        "text": np.frombuffer(b"hello", np.int8).copy(),
    }
    p = str(tmp_path / "t.kas")
    kastore.dump(p, items)
    back = kastore.load(p)
    assert sorted(back) == sorted(items)
    for k in items:
        assert back[k].dtype == items[k].dtype
        np.testing.assert_array_equal(back[k], items[k])


def _tiny_ancmut():
    # 3 leaves: ((0,1),2) then ((1,2),0)
    t1 = Tree(parent=np.asarray([3, 3, 4, 4, -1], np.int32),
              child_left=np.asarray([-1, -1, -1, 0, 3], np.int32),
              child_right=np.asarray([-1, -1, -1, 1, 2], np.int32),
              branch_length=np.asarray([1., 1., 2., 1., 0.]))
    t2 = Tree(parent=np.asarray([4, 3, 3, 4, -1], np.int32),
              child_left=np.asarray([-1, -1, -1, 1, 0], np.int32),
              child_right=np.asarray([-1, -1, -1, 2, 3], np.int32),
              branch_length=np.asarray([3., 1., 1., 2., 0.]))
    anc = AncesTree(N=3, seq=[MarginalTree(0, t1), MarginalTree(2, t2)])
    muts = [MutationRecord(tree=0, branch=[0]),
            MutationRecord(tree=0, branch=[3]),
            MutationRecord(tree=1, branch=[1]),
            MutationRecord(tree=1, branch=[0, 3])]  # not mapping -> skipped
    bp = np.asarray([100, 200, 300, 400])
    return anc, muts, bp


def test_trees_export_native(tmp_path):
    anc, muts, bp = _tiny_ancmut()
    p = str(tmp_path / "out.trees")
    fileformats.to_tree_sequence(anc, muts, bp, p)
    ks = kastore.load(p)
    assert bytes(ks["format/name"]).decode() == "tskit.trees"
    assert list(ks["format/version"]) == [12, 0]
    assert ks["sequence_length"][0] == 401.0
    # 2 trees x 4 edges
    assert len(ks["edges/left"]) == 8
    nt = ks["nodes/time"]
    assert len(nt) == 3 + 2 * 2
    # edge times strictly positive, parent older than child
    tp = nt[ks["edges/parent"]]
    tc = nt[ks["edges/child"]]
    assert (tp > tc).all()
    # edges sorted by (time[parent], parent, child, left)
    order = np.lexsort((ks["edges/left"], ks["edges/child"],
                        ks["edges/parent"], tp))
    assert (order == np.arange(8)).all()
    # mutations: 3 mapping ones, sites at bp of their snps
    assert len(ks["mutations/site"]) == 3
    np.testing.assert_array_equal(ks["sites/position"], [100, 200, 300])
    # offsets are valid cumulative arrays
    for key in ("sites/ancestral_state", "mutations/derived_state"):
        off = ks[key + "_offset"]
        assert off[0] == 0 and off[-1] == len(ks[key])
    # indexes present and are permutations
    ins = ks["indexes/edge_insertion_order"]
    assert sorted(ins) == list(range(8))
    # validate with tskit when available (not in the base image)
    try:
        import tskit
    except ImportError:
        return
    ts = tskit.load(p)
    assert ts.num_trees >= 2
    assert ts.num_mutations == 3
