"""Resume the N=2048 e2e: finish build windows 70-79 (the handoff-slab
HBM hang is fixed — device slabs are now freed as build consumes them),
then run FEB / InferBranchLengths / CombineSections / Finalize from the
staged artifacts, and write N2048_E2E.json.

Stage walls for paint/build come from the full-pass measurements (paint
213.6s this run; build 3868.8s from the prior complete 80-window pass of
the same panel+seeds — this run reproduced its first 70 windows at the
same rate before the now-fixed hang).
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

d = sorted(glob.glob("/tmp/e2e2048_*/"))[-1]
store = relate.ArtifactStore(os.path.join(d, "out.tmpdir"))
out = {"stages": {"chunk0.paint": 213.6, "chunk0.build_topology": 3868.8}}

# find the first missing window artifact and finish the build
cdir = os.path.join(d, "out.tmpdir", "chunk_0")
have = {int(f.split("_")[1].split(".")[0])
        for f in os.listdir(cdir) if f.startswith("trees_")}
first_missing = min(set(range(80)) - have) if len(have) < 80 else None
print("resuming build at window", first_missing, flush=True)
if first_missing is not None:
    t0 = time.time()
    relate.build_topology(store, 0, seed=1, first_section=first_missing)
    out["build_resume_tail_s"] = round(time.time() - t0, 1)
    print("build tail done in", out["build_resume_tail_s"], flush=True)

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
out["note"] = ("paint/build walls from the full 80-window passes of the "
               "same panel+seeds; FEB-onward measured in this resumed run "
               "(stage-file resume — the reference's restart model)")
out["projected_chr20_500k_snps_at_n2048_h"] = round(
    e2e_s / L2 * 500000 / 3600.0, 2)
ref_bt = L2 / 11.807
ref_paint = L2 / 189.94
out["ref_1core_paint_plus_bt_s_lower_bound"] = round(ref_paint + ref_bt, 1)
out["vs_ref_1core_paint_bt_lower_bound"] = round(
    (ref_paint + ref_bt) / e2e_s, 2)
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "N2048_E2E.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
