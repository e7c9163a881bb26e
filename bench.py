"""Benchmark: painting throughput on a representative synthetic panel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: N=256 haplotypes x L=30,000 SNPs (SFS-distributed frequencies,
seed 7) — full all-vs-all painting posterior (stepping stones + window
repaint), the dominant compute stage of the pipeline.

Baseline: the reference C++ binary's `Relate --mode Paint` on the *same*
panel, single core, measured on this machine: 3.08 s => 9,740 SNPs/s
(binary built from /root/reference with default flags; see
tests/golden/README.md for the build recipe).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SNPS_PER_S = 9740.0   # C++ Relate --mode Paint, same panel, 1 core
N, L = 256, 30000


def main():
    from relate_tpu.core import painting
    from relate_tpu.utils import synth

    import jax

    G, bp = synth.synth_panel(N, L)
    r = np.full(L, 2500 * 0.5e-8 * 500)
    model = painting.PaintingModel(N=N, theta=0.001)
    painter = painting.Painter(G, r, model)
    cps = painter.paint_stepping_stones(np.array([0, L]))

    # a dependent scalar reduction forces the device chain to finish —
    # block_until_ready alone under-reports through the axon tunnel
    force = jax.jit(lambda x: x.sum())

    # warm up (compile), then measure amortized over reps
    out = painter.repaint(cps[0])
    float(force(out.topology))
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = painter.repaint(cps[0])
    float(force(out.topology))
    elapsed = (time.time() - t0) / reps

    value = L / elapsed
    print(json.dumps({
        "metric": "painting_snps_per_s_per_chip",
        "value": round(value, 1),
        "unit": "SNPs/s (N=256 all-vs-all painting posterior)",
        "vs_baseline": round(value / BASELINE_SNPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
