"""Painting HMM tests.

test_painting_golden is the canonical hand-computed case ported from the
reference's ``include/test/test_painting.cpp:7-135``: N=5, L=10, r=0 —
the posterior must be constant across sites and encode the mismatch-count
matrix d via round((log top + logscale + normconst)/log(theta/(1-theta))).
"""
import numpy as np
import pytest

from relate_tpu.core import painting
from relate_tpu.core.fastlog import fast_log


def _golden_case():
    N, L = 5, 10
    rows = [
        "0110000000",
        "0110010100",
        "0100000000",
        "0000100000",
        "0000100000",
    ]
    G = np.array([[int(c) for c in r] for r in rows], dtype=np.uint8).T  # (L,N)
    r = np.zeros(L)
    d = np.array([
        [0, 0, 1, 2, 2],
        [2, 0, 3, 4, 4],
        [0, 0, 0, 1, 1],
        [1, 1, 1, 0, 0],
        [1, 1, 1, 0, 0],
    ], dtype=np.float64)
    return G, r, d


def test_painting_golden():
    G, r, d = _golden_case()
    L, N = G.shape
    model = painting.PaintingModel(N=N, theta=0.025)
    painter = painting.Painter(G, r, model)

    targets = np.arange(N, dtype=np.int32)
    alpha0 = painting.initial_alpha(G, model, 0, targets)
    beta_end = np.ones((N, N), dtype=np.float32)
    out = painter.repaint_from_arrays(
        np.zeros(N, dtype=np.int64), np.full(N, L - 1, dtype=np.int64),
        alpha0, np.zeros(N, np.float32), beta_end, np.zeros(N, np.float32),
        targets)

    topo = np.asarray(out.topology)       # (Dmax, B, N)
    ls = np.asarray(out.logscale)         # (Dmax, B)
    rescale = np.log(model.theta / (1 - model.theta))

    for b in range(N):
        D = int(out.plan.D[b])
        norm = np.log(N - 1.0) - D * np.log(model.ntheta)
        ref_top = topo[0, b]
        ref_ls = ls[0, b]
        for j in range(D):
            # posterior constant across sites when r = 0
            assert abs(ls[j, b] - ref_ls) < 1e-4
            np.testing.assert_allclose(topo[j, b], ref_top, atol=1e-5)
            for n in range(N):
                if n == b:
                    continue
                val = (np.log(topo[j, b, n]) + ls[j, b] + norm) / rescale
                assert round(val) == d[b, n], (b, n, j, val)


def test_fast_log_matches_reference_values():
    # spot values computed with the C fast_log on x86 (bit-exact algorithm)
    x = np.array([1.0, 2.0, 0.5, 0.1, 123.456], dtype=np.float32)
    got = np.asarray(fast_log(x))
    # fast_log(1.0) = 0 exactly by construction of the polynomial
    assert abs(got[0]) < 1e-7
    np.testing.assert_allclose(got, np.log(x), atol=5e-3)


@pytest.mark.golden
def test_repaint_matches_reference_checkpoints(golden_dir, golden_chunk):
    """Differential test: our stepping-stone checkpoints vs the reference
    paint file on the example chunk (single window). The reference's RLE
    codec is lossy at 1e-3 relative, which bounds achievable agreement."""
    from relate_tpu.io import refpaint

    ch = golden_chunk
    N = ch.N
    recs = refpaint.read_paint_file(str(golden_dir / "paint_relate_0.bin"), N)

    model = painting.PaintingModel(N=N, theta=0.001)
    painter = painting.Painter(ch.G, ch.r, model)
    cps = painter.paint_stepping_stones(np.array([0, ch.L]))
    assert len(cps) == 1
    cp = cps[0]

    for n, rec in enumerate(recs):
        assert rec.bsb == cp.bsb[n]
        assert rec.bse == cp.bse[n]
        # alpha checkpoint at window 0 is the prior row
        np.testing.assert_allclose(cp.alpha[n], rec.alpha, rtol=5e-3,
                                   atol=1e-12)
        assert abs(cp.ls_alpha[n] - rec.ls_alpha) < 1e-3
        np.testing.assert_allclose(cp.beta[n], rec.beta, rtol=5e-3,
                                   atol=1e-12)
        assert abs(cp.ls_beta[n] - rec.ls_beta) < 2e-3 * max(
            1.0, abs(rec.ls_beta))
