"""Resume the N=2048 e2e from the staged artifacts after the FEB fix.

Times the remaining stages (FEB, InferBranchLengths, CombineSections,
Finalize) on the existing store — the stage-file resume model working as
designed — and merges with the already-measured paint/build walls.
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from relate_tpu.pipeline import relate
from relate_tpu.utils import trace

d = sorted(glob.glob("/tmp/e2e2048_*/"))[-1]
store = relate.ArtifactStore(os.path.join(d, "out.tmpdir"))
out = {"stages": {"chunk0.paint": 248.2, "chunk0.build_topology": 3868.8}}

for name, fn in [
    ("chunk0.find_equivalent_branches",
     lambda: relate.find_equivalent_branches(store, 0)),
    ("chunk0.infer_branch_lengths",
     lambda: relate.infer_branch_lengths(store, 0, Ne=3e4, mu=1.25e-8,
                                         seed=1)),
    ("chunk0.combine_sections", lambda: relate.combine_sections(store, 0)),
    ("finalize", lambda: relate.finalize(store, os.path.join(d, "out"),
                                         cleanup=False)),
]:
    t0 = time.time()
    fn()
    out["stages"][name] = round(time.time() - t0, 1)
    print(name, out["stages"][name], flush=True)

L2 = 30000
e2e_s = sum(out["stages"].values())
out["n2048_e2e_s"] = round(e2e_s, 1)
out["n2048_e2e_snps_per_s"] = round(L2 / e2e_s, 2)
out["note"] = ("paint/build walls from the first run (FEB pair batches "
               "then OOM'd and were resized; stage resume from artifacts "
               "— the reference's restart model)")
out["projected_chr20_500k_snps_at_n2048_h"] = round(
    e2e_s / L2 * 500000 / 3600.0, 2)
ref_bt = L2 / 11.807
ref_paint = L2 / 189.94
out["ref_1core_paint_plus_bt_s_lower_bound"] = round(ref_paint + ref_bt, 1)
out["vs_ref_1core_paint_bt_lower_bound"] = round(
    (ref_paint + ref_bt) / e2e_s, 2)
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "N2048_E2E.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
