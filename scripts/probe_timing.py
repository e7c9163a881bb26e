"""Bisect the per-step cost of the incremental merge-step schedule.

Variants (cumulative feature sets) timed at Np=5120, Kp=128:
  v0: fori loop + scalar only
  v1: + 16 group-read DMAs (8 started parallel, wait all)
  v2: + dynamic-sublane row extraction + averaging + store back
  v3: + 4 group-write DMAs
  v4: + pend stores (4 dyn-sublane stores) + onehot maintenance
  v5: + gather (VPU masked reduce over pend) + scatter (VPU reduce)
  v6: + ~30 lane-vector state ops (selection-like reductions)
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP = 5120
KP = 128
STEPS = 4096


def build(level):
    def kern(d_in, cis, d, dt, dcf, dcft, grp, pend, onehot, vecs, sems):
        mats = [d, dt, dcf, dcft]
        for k, dst in enumerate(mats):
            pltpu.make_async_copy(d_in, dst, sems.at[k]).start()
        for k, dst in enumerate(mats):
            pltpu.make_async_copy(d_in, dst, sems.at[k]).wait()
        onehot[:, :] = jnp.zeros((KP, NP), jnp.float32)

        def step(t, acc):
            i = (t * 7919) % (NP - 64)
            j = i + 17
            gi = pl.multiple_of((i // 8) * 8, 8)
            gj = pl.multiple_of((j // 8) * 8, 8)
            if level >= 1:
                rd = []
                for k, st_ in enumerate(mats):
                    r1 = pltpu.make_async_copy(st_.at[pl.ds(gi, 8), :],
                                               grp.at[pl.ds(16 * k, 8), :],
                                               sems.at[k])
                    r2 = pltpu.make_async_copy(st_.at[pl.ds(gj, 8), :],
                                               grp.at[pl.ds(16 * k + 8, 8), :],
                                               sems.at[4 + k])
                    r1.start(); r2.start()
                    rd.append((r1, r2))
                for r1, r2 in rd:
                    r1.wait(); r2.wait()
            if level >= 2:
                for k in range(4):
                    ri = grp[pl.ds(16 * k + (i % 8), 1), :]
                    rj = grp[pl.ds(16 * k + 8 + (j % 8), 1), :]
                    nr = 0.5 * ri + 0.5 * rj
                    grp[pl.ds(16 * k + 8 + (j % 8), 1), :] = nr
            if level >= 4:
                slot = t % KP
                for k in range(2):
                    nr = grp[pl.ds(16 * k + 8 + (j % 8), 1), :]
                    pend[pl.ds(slot + KP * k, 1), :] = nr
                lanes2 = jax.lax.broadcasted_iota(jnp.int32, (KP, NP), 1)
                onehot[:, :] = jnp.where(lanes2 == j, 0.0, onehot[:, :])
                onehot[pl.ds(slot, 1), :] = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1) == j
                ).astype(jnp.float32)
            if level >= 5:
                lanesp = jax.lax.broadcasted_iota(jnp.int32, (2 * KP, NP), 1)
                colv = jnp.sum(jnp.where(lanesp == j, pend[:, :], 0.0),
                               axis=1, keepdims=True)      # (2KP,1)
                corr = jnp.sum(colv[0:KP] * onehot[:, :], axis=0,
                               keepdims=True)              # (1,NP)
                grp[0:1, :] = grp[0:1, :] + corr
            if level >= 6:
                v = vecs[0:1, :]
                for r in range(10):
                    m = jnp.min(v + jnp.float32(r))
                    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)
                    idx = jnp.min(jnp.where(v == m, lanes, jnp.int32(NP)))
                    v = jnp.where(lanes == idx, v + 1.0, v)
                vecs[0:1, :] = v
            if level >= 3:
                wr = []
                for k, st_ in enumerate(mats):
                    w1 = pltpu.make_async_copy(grp.at[pl.ds(16 * k + 8, 8), :],
                                               st_.at[pl.ds(gj, 8), :],
                                               sems.at[k])
                    w1.start()
                    wr.append(w1)
                for w1 in wr:
                    w1.wait()
            return acc + i

        acc = jax.lax.fori_loop(0, STEPS, step, 0)
        cis[0] = acc

    return kern


def main():
    d0 = jnp.zeros((NP, NP), jnp.float32)
    prev = None
    levels = [int(x) for x in sys.argv[1:]] or list(range(7))
    for level in levels:
        kern = build(level)
        f = jax.jit(lambda a, kern=kern: pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((1,), jnp.int32),) +
                      (jax.ShapeDtypeStruct((NP, NP), jnp.float32),) * 4,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),) +
                      (pl.BlockSpec(memory_space=pl.ANY),) * 4,
            scratch_shapes=[
                pltpu.VMEM((64, NP), jnp.float32),
                pltpu.VMEM((2 * KP, NP), jnp.float32),
                pltpu.VMEM((KP, NP), jnp.float32),
                pltpu.VMEM((8, NP), jnp.float32),
                pltpu.SemaphoreType.DMA((8,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
        )(a))
        force = jax.jit(lambda r: r[0][0] + r[1][0, 0].astype(jnp.int32)
                        + r[4][-1, -1].astype(jnp.int32))
        float(force(f(d0)))
        t0 = time.time()
        for _ in range(3):
            float(force(f(d0)))
        dt_s = (time.time() - t0) / 3
        per = dt_s / STEPS * 1e6
        d = "" if prev is None else f"  (+{per - prev:.1f})"
        print(f"v{level}: {per:7.1f} us/step{d}", flush=True)
        prev = per


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
