"""Time the incremental kernel at N=5008 under RELATE_TPU_INC_DEBUG knobs."""
import os, subprocess, sys

VARIANTS = [
    "",                                   # full
    "stub_fallback",
    "no_repairs",
    "no_repairs,stub_fallback",
    "no_repairs,no_corrections,stub_fallback",
    "no_repairs,no_corrections,no_flush,stub_fallback",
    "no_repairs,no_corrections,no_flush,no_dma,stub_fallback",
]

BODY = r'''
import numpy as np, jax, jax.numpy as jnp, time, os
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from relate_tpu.ops.merge_scan_inc import merge_scan_incremental
N = 5008
rng = np.random.default_rng(1)
A = rng.random((N, N)).astype(np.float32) * 50
d = A + A.T + rng.random((N, N)).astype(np.float32) * 2
np.fill_diagonal(d, 0)
dcf = (rng.integers(0, 40, (N, N)) * 6.9).astype(np.float32)
np.fill_diagonal(dcf, 0)
dj, cj_ = jnp.asarray(d), jnp.asarray(dcf)
cis, cjs, cl = merge_scan_incremental(dj, cj_, True, 1.38, 0.0069, 11, kp=128)
float(jnp.asarray(cis).sum())
t0 = time.time()
cis, cjs, cl = merge_scan_incremental(dj, cj_, True, 1.38, 0.0069, 11, kp=128)
float(jnp.asarray(cis).sum())
dt = time.time()-t0
print("WARM %.3fs  %.1f us/step" % (dt, dt/(N-1)*1e6), flush=True)
'''

for v in VARIANTS:
    env = dict(os.environ)
    env["RELATE_TPU_INC_DEBUG"] = v
    p = subprocess.run([sys.executable, "-c", BODY], env=env,
                       capture_output=True, text=True, timeout=560)
    out = [l for l in p.stdout.splitlines() if l.startswith("WARM")]
    print(f"{v or 'full':55s} {out[0] if out else 'FAIL: ' + p.stderr[-200:]}",
          flush=True)
