"""Full-pipeline scaling table on a virtual CPU mesh (VERDICT r4 #8).

Runs run_all on a mid-size panel at 1/2/4/8 virtual devices and reports
wall clock + parallel efficiency. Structure-validation for the >=80%
multi-host scaling target: real multi-chip hardware is not reachable from
this box, so this exercises the REAL mesh-sharded code path (shard_map
painting/MCMC over jax.sharding.Mesh) with XLA CPU devices, where the
compute is real but per-device speedups are bounded by the 2 physical
cores. Output: SCALING.json + a markdown table on stdout.
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from relate_tpu.parallel import mesh as pmesh
from relate_tpu.pipeline import relate
from relate_tpu.utils.synth import synth_panel, write_flat_map, \
    write_haps_sample

N, L = 64, 6000


def main():
    import tempfile, shutil
    G, bp = synth_panel(N, L, seed=21)
    rows = []
    base = None
    for ndev in (1, 2, 4, 8):
        d = tempfile.mkdtemp(prefix=f"scal{ndev}_")
        try:
            prefix = os.path.join(d, "p")
            write_haps_sample(G, bp, prefix)
            write_flat_map(prefix + ".map", int(bp[-1]))
            m = pmesh.default_mesh(ndev) if ndev > 1 else None
            # warm run (compile cache differs per mesh shape)
            t0 = time.time()
            relate.run_all(prefix + ".haps", prefix + ".sample",
                           prefix + ".map", os.path.join(d, "out"),
                           seed=1, mesh=m)
            wall = time.time() - t0
            if base is None:
                base = wall
            eff = base / (wall * 1)  # same physical cores: report raw wall
            rows.append(dict(devices=ndev, wall_s=round(wall, 1),
                             rel_to_1dev=round(base / wall, 3)))
            print(f"devices={ndev} wall={wall:.1f}s rel={base/wall:.3f}",
                  flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    out = dict(panel=f"N={N} L={L}", rows=rows,
               note=("virtual CPU mesh on a 2-core host: validates the "
                     "sharded pipeline structure end-to-end; wall-clock "
                     "speedups need real chips"))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
