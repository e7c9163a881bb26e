"""Evaluate-stack differential tests (coalescence rates, selection scan)."""
import numpy as np
import pytest

from relate_tpu.core.topology import MutationRecord
from relate_tpu.evaluate import coalrate, selection
from relate_tpu.io import ancmut


@pytest.fixture(scope="module")
def final_pair(golden_dir):
    anc = ancmut.read_anc_text(str(golden_dir / "golden.anc"))
    muts_d = ancmut.read_mut_final(str(golden_dir / "golden.mut"))
    recs = [MutationRecord(tree=m["tree"], branch=m["branch"],
                           flipped=bool(m["flipped"])) for m in muts_d]
    bp = np.array([m["pos"] for m in muts_d])
    dist = np.array([m["dist"] for m in muts_d], dtype=np.float64)
    rsid = [m["rsid"] for m in muts_d]
    return anc, recs, bp, dist, rsid


@pytest.mark.golden
def test_coalescence_rates_match_reference(golden_dir, final_pair):
    """Whole-sample per-epoch rates vs RelateCoalescentRate
    --mode EstimatePopulationSize on identical input (bins 3,7,0.2)."""
    anc, recs, bp, dist, rsid = final_pair
    epochs = coalrate.epochs_from_bins(3, 7, 0.2, 28.0)
    spans = coalrate.tree_spans(anc, recs, dist)
    trees = [mt.tree for mt in anc.seq]
    c, o = coalrate.coalescence_stats(trees, spans, epochs)
    mine = coalrate.finalize_rates(c.sum(axis=(1, 2)), o.sum(axis=(1, 2)))
    names, eref, rref = coalrate.read_coal(str(golden_dir / "checkrate.coal"))
    E = min(len(mine), rref.shape[0])
    rr, mm = rref[:E, 0, 0], mine[:E]
    sel = np.isfinite(rr) & np.isfinite(mm) & (rr > 0)
    assert sel.sum() >= 15
    np.testing.assert_allclose(mm[sel], rr[sel], rtol=1e-4)


@pytest.mark.golden
def test_selection_scan_matches_reference(golden_dir, final_pair):
    """freq/lin lineage counts + .sele log10 p-values vs RelateSelection
    on identical input (bit-exact on the compared prefix)."""
    anc, recs, bp, dist, rsid = final_pair
    epochs = coalrate.default_epochs(28.0)
    K = 800
    rows, scan = selection.selection_scan(anc, recs[:K], epochs, bp, rsid)

    def load(path, ncol):
        out = {}
        with open(path) as f:
            f.readline()
            for line in f:
                p = line.split()
                out[int(p[0])] = p[2:]
        return out

    gf = load(golden_dir / "goldenfreq.freq.head", 31)
    gl = load(golden_dir / "goldenfreq.lin.head", 33)
    gs = load(golden_dir / "goldensel.sele.head", 33)

    ncmp = 0
    for row, sc in zip(rows, scan):
        if row is None or row["pos"] not in gf:
            continue
        ncmp += 1
        np.testing.assert_array_equal(
            row["freq"], [int(float(x)) for x in gf[row["pos"]][:31]])
        lg = gl[row["pos"]]
        np.testing.assert_array_equal(
            row["lin"], [int(float(x)) for x in lg[:31]])
        assert row["lin_when_half"] == int(lg[-2])
        assert row["lin_when_freq2"] == int(lg[-1])
        mine = np.concatenate([sc["pvalues"], [sc["p_half"], sc["p_freq2"]]])
        gold = np.asarray([float(x) for x in gs[row["pos"]]])
        np.testing.assert_allclose(mine, gold, atol=1e-4)
    assert ncmp > 500


@pytest.mark.golden
def test_sds_matches_reference(golden_dir, final_pair):
    """rSDS vs RelateSelection --mode SDS on identical input: the compared
    prefix is byte-identical (fixture: first 2000 lines of ref output)."""
    anc, recs, bp, dist, rsid = final_pair
    rows = selection.sds(anc, recs, bp, rsid)
    gold = {}
    with open(golden_dir / "ref_sds_head.SDS") as f:
        f.readline()
        for line in f:
            p = line.split()
            gold[int(p[0])] = p[2]
    ncmp = 0
    for r in rows:
        if r is None or r["pos"] not in gold:
            continue
        assert f"{r['rSDS']:g}" == gold[r["pos"]], r
        ncmp += 1
    assert ncmp > 1500


@pytest.mark.golden
def test_freqdiff_matches_reference(golden_dir, final_pair):
    """Per-epoch frequency diffs vs RelateSelection --mode FreqDiff
    (data rows byte-identical; header epoch ages differ by float32
    rounding of the reference's float log10)."""
    anc, recs, bp, dist, rsid = final_pair
    epochs = coalrate.default_epochs(28.0)
    rows = selection.compute_freq_lin(anc, recs, epochs, bp, rsid)
    diffs, zdiffs = selection.freq_diff(rows, anc.N)
    gold = {}
    with open(golden_dir / "ref_freqdiff_head") as f:
        f.readline()
        for line in f:
            p = line.split()
            gold[int(p[0])] = p[2:]
    ncmp = 0
    for r in diffs:
        if r is None or r["pos"] not in gold:
            continue
        mine = [f"{x:g}" for x in r["diff"][::-1]] + [str(r["fN"])]
        assert mine == gold[r["pos"]], r["pos"]
        ncmp += 1
    assert ncmp > 150


def test_coalescence_stats_device_matches_host(final_pair):
    """The batched device kernel must reproduce the reference-structured
    host recursion (counts exactly — integer pair blocks; opportunity to
    f32 precision)."""
    import numpy as np
    from relate_tpu.evaluate import coalrate
    anc, recs, bp, dist = final_pair[:4]
    epochs = coalrate.default_epochs()
    spans = coalrate.tree_spans(anc, recs, dist)
    trees = [mt.tree for mt in anc.seq][:512]
    spans = spans[:512]
    grp = np.arange(anc.N) % 3
    c_d, o_d = coalrate.coalescence_stats(trees, spans, epochs, grp)
    c_h, o_h = coalrate.coalescence_stats(trees, spans, epochs, grp,
                                          use_device=False)
    np.testing.assert_allclose(c_d, c_h, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(o_d, o_h, rtol=1e-5, atol=1e-3)
