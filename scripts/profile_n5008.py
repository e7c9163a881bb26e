"""Profile the N=5008 hot paths: incremental merge scan (KP sweep),
section-kernel interior, and window repaint vs its HBM roofline.

Run on the real TPU after the e2e job frees HBM. Prints one JSON line.
"""
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
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("PROF_N", "5008"))
out = {"N": N}


def note(msg):
    print("[prof %6.1fs] %s" % (time.time() - T0, msg), file=sys.stderr,
          flush=True)


T0 = time.time()

# ---- merge scan incremental: KP sweep ------------------------------------
from relate_tpu.ops.merge_scan_inc import merge_scan_incremental

rng = np.random.default_rng(5)
A = rng.random((N, N)).astype(np.float32) * 50
d = A + A.T
np.fill_diagonal(d, 0)
dcf = (rng.random((N, N)).astype(np.float32) * 10)
dcf = dcf + dcf.T
np.fill_diagonal(dcf, 0)
dj = jnp.asarray(d)
dcfj = jnp.asarray(dcf)

for kp in (int(x) for x in os.environ.get("PROF_KPS", "128,256,512").split(",")):
    try:
        cis, cjs, _ = merge_scan_incremental(dj, dcfj, True, 0.05, 0.05, 7,
                                             kp=kp)
        cis.block_until_ready()
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            cis, cjs, _ = merge_scan_incremental(dj, dcfj, True, 0.05, 0.05,
                                                 7, kp=kp)
            cis.block_until_ready()
        w = (time.time() - t0) / reps
        out[f"merge_inc_kp{kp}_s"] = round(w, 3)
        note(f"merge_inc kp={kp}: {w:.3f}s/tree")
    except Exception as e:
        out[f"merge_inc_kp{kp}_error"] = f"{type(e).__name__}: {e}"
        note(f"merge_inc kp={kp} FAILED: {e}")
    print(json.dumps(out), flush=True)

# ---- painting: stones + repaint vs roofline ------------------------------
if os.environ.get("PROF_PAINT", "1") != "0":
    from relate_tpu.core import painting
    from relate_tpu.io import chunking
    from relate_tpu.utils import synth

    Lp = int(os.environ.get("PROF_L", "12000"))
    G, bp = synth.synth_panel(N, Lp, seed=11)
    _, wplans = chunking.plan_chunks_and_windows(G, None)
    bounds_all = np.asarray(wplans[0].boundaries)
    bounds = bounds_all[: min(5, len(bounds_all))]
    L2 = int(bounds[-1])
    G = G[:L2]
    r = np.full(L2, 2500 * 0.5e-8 * 500)
    model = painting.PaintingModel(N=N, theta=0.001)
    painter = painting.Painter(G, r, model)
    w_len = int(bounds[1] - bounds[0])
    note(f"panel ready: {len(bounds)-1} windows of ~{w_len} SNPs")

    t0 = time.time()
    cps = painter.paint_stepping_stones(bounds)
    cold = time.time() - t0
    t0 = time.time()
    cps = painter.paint_stepping_stones(bounds)
    warm = time.time() - t0
    snps = int(bounds[-1] - bounds[0])
    out["stones_cold_s"] = round(cold, 2)
    out["stones_warm_s"] = round(warm, 2)
    out["stones_snps_per_s"] = round(snps / warm, 1)
    note(f"stones: cold {cold:.1f}s warm {warm:.1f}s ({snps/warm:.0f} SNPs/s)")
    print(json.dumps(out), flush=True)

    force = jax.jit(lambda x: x.sum())
    o = painter.repaint(cps[0])
    float(force(o.logscale))
    del o
    t0 = time.time()
    o = painter.repaint(cps[0])
    float(force(o.logscale))
    rep = time.time() - t0
    del o
    out["repaint_s"] = round(rep, 3)
    out["repaint_snps_per_s"] = round(w_len / rep, 1)
    # roofline: posterior out (w_len, N, N) f32? check actual shapes
    note(f"repaint: {rep:.2f}s/window ({w_len/rep:.0f} SNPs/s)")
    print(json.dumps(out), flush=True)

# ---- section kernel interior ---------------------------------------------
if os.environ.get("PROF_SECTION", "1") != "0":
    from relate_tpu.core import topology_device
    rpos = np.cumsum(r)
    state = np.ones(L2, dtype=np.int32)
    S2 = min(int(os.environ.get("PROF_S", "256")), w_len - 1)
    kern = topology_device.make_section_kernel(0.001, N, L2, 1)
    t0 = time.time()
    res = topology_device.build_topology_section_device(
        painter, cps[0], G, rpos, state, bp[:L2], int(bounds[0]),
        int(bounds[0]) + S2 - 1, seed=1, kernel=kern)
    coldb = time.time() - t0
    t0 = time.time()
    res = topology_device.build_topology_section_device(
        painter, cps[0], G, rpos, state, bp[:L2], int(bounds[0]),
        int(bounds[0]) + S2 - 1, seed=1, kernel=kern)
    warmb = time.time() - t0
    ntr = len(res.anc.seq)
    out["section_S"] = S2
    out["section_warm_s"] = round(warmb, 2)
    out["section_snps_per_s"] = round(S2 / warmb, 2)
    out["section_num_trees"] = ntr
    out["section_s_per_tree"] = round(warmb / max(ntr, 1), 3)
    note(f"section: cold {coldb:.1f}s warm {warmb:.1f}s, {ntr} trees "
         f"({warmb/max(ntr,1):.3f}s/tree incl. non-rebuild steps)")
    print(json.dumps(out), flush=True)

print(json.dumps(out), flush=True)
