"""Measure the reference C++ Relate on the SAME panels bench.py uses.

VERDICT r4 #2: replace every estimated baseline with a measurement.
Produces BASELINE_MEASURED.json at the repo root with:

- n256: --mode All single core (e2e), plus RelateParallel.sh --threads 8
  (the north-star comparison basis: >=5x vs 8-core CPU Relate)
- n2048: MakeChunks --memory 1, Paint (all stepping stones for chunk 0,
  SNPs/s), BuildTopology on section 0 (SNPs/s) — single core
- n5008: same on a truncated panel (paint + first-section tree build)

The reference build lives at /tmp/refsrc (out-of-tree copy of
/root/reference — its CMake hardcodes bin/ into the read-only source dir).
Binaries are plain single-threaded C++ (SURVEY §2.5).
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from relate_tpu.utils import synth

REF = os.environ.get("RELATE_REF_BIN", "/tmp/refsrc/bin")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BASELINE_MEASURED.json")
WORK = "/tmp/refbaseline"

RESULTS = {}


def _emit():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS), flush=True)


def run(cmd, cwd, timeout=7200):
    t0 = time.time()
    p = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True,
                       timeout=timeout)
    dt = time.time() - t0
    if p.returncode != 0:
        print("FAILED:", " ".join(cmd), file=sys.stderr)
        print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"rc={p.returncode}")
    return dt


def write_panel(N, L, seed, d):
    G, bp = synth.synth_panel(N, L, seed=seed)
    prefix = os.path.join(d, "panel")
    synth.write_haps_sample(G, bp, prefix)
    synth.write_flat_map(prefix + ".map", int(bp[-1]))
    return prefix, G, bp


def bench_n256(single=True):
    d = os.path.join(WORK, "n256")
    if single:
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    prefix, _, _ = write_panel(256, 30000, 7, d)
    if single:
        # --mode All single core (fresh measurement on this machine)
        t = run([os.path.join(REF, "Relate"), "--mode", "All", "-m",
                 "1.25e-8", "-N", "30000", "--haps", prefix + ".haps",
                 "--sample", prefix + ".sample", "--map", prefix + ".map",
                 "--seed", "1", "-o", "out_all"], cwd=d)
        RESULTS["n256_all_1core_s"] = round(t, 1)
        _emit()
    # 8-core RelateParallel.sh (PATH_TO_RELATE resolves to the scripts
    # dir's grandparent, so mirror the release layout: bin/ + scripts/)
    sdir = os.path.join(d, "scripts")
    if not os.path.isdir(sdir):
        shutil.copytree("/root/reference/scripts", sdir)
    if not os.path.exists(os.path.join(d, "bin")):
        os.symlink(REF, os.path.join(d, "bin"))
    env = dict(os.environ)
    d8 = os.path.join(d, "par8")
    os.makedirs(d8)
    t0 = time.time()
    p = subprocess.run(
        ["bash", os.path.join(sdir, "RelateParallel", "RelateParallel.sh"),
         "-m", "1.25e-8", "-N", "30000", "--haps", prefix + ".haps",
         "--sample", prefix + ".sample", "--map", prefix + ".map",
         "--seed", "1", "-o", "out_par8", "--threads", "8"],
        cwd=d8, env=env, capture_output=True, text=True, timeout=7200)
    t8 = time.time() - t0
    if p.returncode != 0 or not os.path.exists(
            os.path.join(d8, "out_par8.anc")):
        print("RelateParallel failed:", p.stdout[-3000:], p.stderr[-2000:],
              file=sys.stderr)
        RESULTS["n256_all_8core_s"] = None
        RESULTS["n256_all_8core_error"] = (p.stdout[-500:] or "") + \
            (p.stderr[-500:] or "")
    else:
        RESULTS["n256_all_8core_s"] = round(t8, 1)
        RESULTS.pop("n256_all_8core_error", None)
    ncores = os.cpu_count()
    RESULTS["n256_cores_note"] = (
        f"machine has {ncores} cores; an honest 8-core measurement is "
        f"impossible here — n256_all_8core_s is 8 worker processes on "
        f"{ncores} cores. Ideal-8-core lower bound = 1core/8 = "
        f"{round(RESULTS.get('n256_all_1core_s', 0) / 8.0, 1)}s")
    _emit()


def bench_bigN(N, L, seed, mem_gb, tag, bt_seconds_budget=3600):
    d = os.path.join(WORK, tag)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    prefix, G, bp = write_panel(N, L, seed, d)
    t = run([os.path.join(REF, "Relate"), "--mode", "MakeChunks",
             "--haps", prefix + ".haps", "--sample", prefix + ".sample",
             "--map", prefix + ".map", "--memory", str(mem_gb),
             "-o", "out"], cwd=d)
    RESULTS[f"{tag}_makechunks_s"] = round(t, 1)
    # window boundaries from parameters_c0.bin: int N, int L, int num_windows+1, ints
    with open(os.path.join(d, "out", "parameters_c0.bin"), "rb") as f:
        import struct
        _N, _L, nw1 = struct.unpack("iii", f.read(12))
        bounds = struct.unpack(f"{nw1}i", f.read(4 * nw1))
    RESULTS[f"{tag}_num_windows"] = nw1 - 1
    RESULTS[f"{tag}_first_window_snps"] = bounds[1] - bounds[0]
    RESULTS[f"{tag}_chunk_snps"] = _L
    _emit()
    # Paint: all stepping stones for chunk 0 (the analog of our
    # paint_stepping_stones over the chunk)
    t = run([os.path.join(REF, "Relate"), "--mode", "Paint",
             "-o", "out", "--chunk_index", "0"], cwd=d, timeout=14400)
    RESULTS[f"{tag}_paint_s"] = round(t, 1)
    RESULTS[f"{tag}_paint_snps_per_s"] = round(_L / t, 2)
    _emit()
    # BuildTopology on section 0 only (the same work as our bench's
    # first-window tree build; sections == windows)
    t = run([os.path.join(REF, "Relate"), "--mode", "BuildTopology",
             "-o", "out", "--chunk_index", "0", "--first_section", "0",
             "--last_section", "0", "--seed", "1"], cwd=d,
            timeout=bt_seconds_budget)
    w = bounds[1] - bounds[0]
    RESULTS[f"{tag}_buildtopology_s"] = round(t, 1)
    RESULTS[f"{tag}_buildtopology_snps_per_s"] = round(w / t, 3)
    _emit()


if __name__ == "__main__":
    os.makedirs(WORK, exist_ok=True)
    which = sys.argv[1:] or ["n2048", "n5008", "n256"]
    if os.path.exists(OUT):
        with open(OUT) as f:
            RESULTS.update(json.load(f))
    RESULTS["host"] = os.uname().nodename
    RESULTS["note"] = ("reference C++ built -O3 from /root/reference HEAD; "
                       "single-threaded binaries; same synth panels as "
                       "bench.py (synth_panel seeds 7/9/11)")
    if "n2048" in which:
        bench_bigN(2048, 30000, 9, 1.0, "n2048")
    if "n5008" in which:
        # truncated panel: enough SNPs for MakeChunks to produce >=1 window
        # at a modest memory budget; tree build timed on section 0 only
        bench_bigN(5008, 12000, 11, 2.0, "n5008", bt_seconds_budget=10800)
    if "n256" in which:
        bench_n256()
    if "n256par" in which:
        bench_n256(single=False)
    _emit()
