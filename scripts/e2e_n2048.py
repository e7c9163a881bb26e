"""First full-chromosome end-to-end run at N=2048 (VERDICT r4 #4).

run_all on the bench's N=2048 x 30k-SNP coalescent panel — every stage
(stones, per-section tree building, FEB, MCMC at M=4095, CombineSections,
Finalize) on the production fast paths with auto HBM window planning.
Writes N2048_E2E.json with per-stage wall seconds and a projected
1000G-chr20-scale wall clock.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from relate_tpu.pipeline import relate
from relate_tpu.utils import trace
from relate_tpu.utils.synth import synth_panel, write_flat_map, \
    write_haps_sample

N2, L2 = 2048, 30000

out = {}
d = tempfile.mkdtemp(prefix="e2e2048_")
G, bp = synth_panel(N2, L2, seed=9)
prefix = os.path.join(d, "panel")
write_haps_sample(G, bp, prefix)
write_flat_map(prefix + ".map", int(bp[-1]))
print("panel written", flush=True)

trace.STAGES.clear()
t0 = time.time()
relate.run_all(prefix + ".haps", prefix + ".sample", prefix + ".map",
               os.path.join(d, "out"), seed=1, verbose=True)
e2e_s = time.time() - t0
out["n2048_e2e_s"] = round(e2e_s, 1)
out["n2048_e2e_snps_per_s"] = round(L2 / e2e_s, 2)
out["stages"] = {r["stage"]: r["wall_s"] for r in trace.STAGES}
# projections: 1000G chr20 ~ 500k usable SNPs at N=5008 is the flagship;
# this point scales the N=2048 panel linearly in L (windows are
# independent; MCMC is per-tree)
out["projected_chr20_500k_snps_at_n2048_h"] = round(
    e2e_s / L2 * 500000 / 3600.0, 2)
# measured single-core reference at this N: BuildTopology 11.8 SNPs/s
# alone => >= L/11.8 s; Paint adds L/190 s
ref_bt = L2 / 11.807
ref_paint = L2 / 189.94
out["ref_1core_paint_plus_bt_s_lower_bound"] = round(ref_paint + ref_bt, 1)
out["vs_ref_1core_paint_bt_lower_bound"] = round(
    (ref_paint + ref_bt) / e2e_s, 2)
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "N2048_E2E.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
import shutil
shutil.rmtree(d, ignore_errors=True)
