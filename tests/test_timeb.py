"""Byte-compatible .timeb (SampleBranchLengthsBinary,
ReEstimateBranchLengths.cpp:1109-1453 + parse_timeb.py)."""
import gzip
import os

import numpy as np
import pytest

from relate_tpu.evaluate.sampling import read_timeb, write_timeb


def test_read_reference_timeb(golden_dir, tmp_path):
    """Our parser must read the reference binary's own .timeb output
    (first 200 records of RelateCoalescentRate --mode SampleBranchLengths
    --format b on the golden example)."""
    src = golden_dir / "sbl_head.timeb"
    if not src.exists():
        pytest.skip("timeb fixture absent")
    recs = read_timeb(str(src))
    assert len(recs) == 200
    for r in recs:
        assert r["N"] == 8
        assert 0 <= r["daf"] <= 8
        assert r["anctimes"].shape == (3, max(0, 8 - r["daf"] - 1))
        assert r["dertimes"].shape == (3, max(0, r["daf"] - 1))
        # per-sample segments sorted ascending (the reference sorts each)
        for arr in (r["anctimes"], r["dertimes"]):
            if arr.size:
                assert (np.diff(arr, axis=1) >= 0).all()
    # bps strictly increasing across records
    bps = [r["bp"] for r in recs]
    assert bps == sorted(bps)


def test_timeb_round_trip(tmp_path):
    """write_timeb -> read_timeb round trip with the reference layout."""
    from relate_tpu.core.topology import MutationRecord
    from relate_tpu.core.treebuilder import quick_build
    from relate_tpu.core.trees import AncesTree, MarginalTree

    rng = np.random.default_rng(0)
    N = 8
    d = rng.random((N, N)).astype(np.float32)
    tree = quick_build(d, theta=0.01)
    tree.branch_length[:] = rng.random(tree.num_nodes) * 100
    anc = AncesTree(N=N, seq=[MarginalTree(pos=0, tree=tree)],
                    sample_ages=None)
    S = 4
    samples = np.abs(rng.random((S, 1, tree.num_nodes))) * 50
    muts = [MutationRecord(tree=0, branch=[int(tree.child_left[N])]),
            MutationRecord(tree=0, branch=[]),              # non-mapping
            MutationRecord(tree=0, branch=[2 * N - 2])]     # root
    bp = np.array([100, 200, 300])
    alleles = ["A/T", "C/G", "G/A"]
    path = str(tmp_path / "x.timeb")
    write_timeb(path, anc, samples, muts=muts, bp=bp, alleles=alleles)
    recs = read_timeb(path)
    assert len(recs) == 3
    assert [r["bp"] for r in recs] == [100, 200, 300]
    assert [r["anc_allele"] for r in recs] == ["A", "C", "G"]
    assert recs[1]["daf"] == 0 and recs[1]["anctimes"].shape == (S, N - 1)
    assert recs[2]["daf"] == N and recs[2]["dertimes"].shape == (S, N - 1)
    b = muts[0].branch[0]
    daf = int(tree.leaf_matrix()[b].sum())
    assert recs[0]["daf"] == daf
    assert recs[0]["anctimes"].shape == (S, N - daf - 1)
