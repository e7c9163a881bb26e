"""Probe Mosaic/Pallas primitives for the incremental merge-scan kernel.

Learned so far: HBM (ANY) DMA slices must be tile-aligned — (8,128) for
f32 — so all HBM access is 8-row "group" granularity.

P1. dynamic 8-row group DMA HBM->VMEM and back (start = 8*(i//8))
P2. dynamic-sublane vector store/load in VMEM at a traced row index
P3. small MXU matmuls in-kernel: (1,Kp)@(Kp,Np)
P4. lane-dynamic single-column load from a (Kp,Np) VMEM ref
P5. while_loop + scalar extraction (known good, re-check together)
P6. (Kp,1)->(1,Kp) reshape relayout
P7. timing of the full merge-step-like schedule at Np=5120
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Np = 512
Kp = 128


def probe_group_dma():
    def kern(iparams, d_in, d_out, grp, sems):
        i = iparams[0]
        cp = pltpu.make_async_copy(d_in, d_out, sems.at[0])
        cp.start(); cp.wait()
        g0 = pl.multiple_of((i // 8) * 8, 8)
        r = pltpu.make_async_copy(d_out.at[pl.ds(g0, 8), :], grp, sems.at[1])
        r.start(); r.wait()
        # modify row i%8 of the group via dynamic-sublane store (P2)
        sub = i % 8
        row = grp[pl.ds(sub, 1), :]
        grp[pl.ds(sub, 1), :] = row * 3.0
        w = pltpu.make_async_copy(grp, d_out.at[pl.ds(g0, 8), :], sems.at[1])
        w.start(); w.wait()

    d = jnp.asarray(np.arange(Np * Np, dtype=np.float32).reshape(Np, Np))
    iparams = jnp.array([11], jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Np, Np), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, Np), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(iparams, d)
    out = np.asarray(out)
    exp = np.asarray(d).copy()
    exp[11] *= 3.0
    ok = np.allclose(out, exp)
    print("P1/P2 group DMA + dyn-sublane store:", "OK" if ok else "FAIL")


def probe_matmul_lane_dyn():
    def kern(iparams, pend_ref, onehot_ref, out_ref, out2_ref):
        w = iparams[0]
        # P4 (revised): matvec gather of column w: pend @ e_w
        ew = (jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0) == w
              ).astype(jnp.float32)
        col = jnp.dot(pend_ref[:, :], ew,
                      preferred_element_type=jnp.float32)   # (Kp, 1)
        # P6: relayout to (1, Kp)
        colT = jnp.reshape(col, (1, Kp))
        # P3: MXU matmul (1,Kp)@(Kp,Np)
        out_ref[:, :] = jnp.dot(colT, onehot_ref[:, :],
                                preferred_element_type=jnp.float32)
        out2_ref[:, :] = colT

    pend = np.random.RandomState(0).rand(Kp, Np).astype(np.float32)
    onehot = np.zeros((Kp, Np), np.float32)
    ids = np.random.RandomState(1).randint(0, Np, Kp)
    onehot[np.arange(Kp), ids] = 1.0
    w = 37
    out, out2 = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, Np), jnp.float32),
                   jax.ShapeDtypeStruct((1, Kp), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(jnp.array([w], jnp.int32), jnp.asarray(pend), jnp.asarray(onehot))
    exp = pend[:, w:w + 1].T @ onehot
    ok1 = np.allclose(np.asarray(out), exp, atol=1e-5)
    ok2 = np.allclose(np.asarray(out2)[0], pend[:, w])
    print("P4 lane-dyn load:", "OK" if ok2 else "FAIL")
    print("P3/P6 matmul+reshape:", "OK" if ok1 else "FAIL")


def probe_while():
    def kern(x_ref, out_ref, st):
        v = x_ref[:, :]
        m = jnp.min(v)
        lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        idx = jnp.min(jnp.where(v == m, lanes, jnp.int32(Np)))
        st[0] = idx

        def cond(c):
            return c > 0

        def body(c):
            st[0] = st[0] - 1
            return c - 1

        final = jax.lax.while_loop(cond, body, idx)
        out_ref[0] = idx
        out_ref[1] = final + 7

    x = jnp.asarray(np.arange(Np, dtype=np.float32)[::-1].copy()).reshape(1, Np)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x)
    out = np.asarray(out)
    ok = out[0] == Np - 1 and out[1] == 7
    print("P5 while_loop + scalar extract:", "OK" if ok else f"FAIL {out}")


def probe_timing():
    NP = 5120
    KP = 256
    STEPS = 256

    def kern(d_in, cis, d, dt, dcf, dcft, grp, pend, onehot, sems):
        for k, dst in enumerate([d, dt, dcf, dcft]):
            pltpu.make_async_copy(d_in, dst, sems.at[k]).start()
        for k, dst in enumerate([d, dt, dcf, dcft]):
            pltpu.make_async_copy(d_in, dst, sems.at[k]).wait()
        onehot[:, :] = jnp.zeros((KP, NP), jnp.float32)

        def step(t, _):
            i = (t * 7919) % (NP - 64)
            j = i + 17
            gi = pl.multiple_of((i // 8) * 8, 8)
            gj = pl.multiple_of((j // 8) * 8, 8)
            # 8 group reads in parallel
            rd = []
            for k, st_ in enumerate([d, dt, dcf, dcft]):
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
            # per-matrix: extract rows i,j, avg, store back into row j slot,
            # plus lane-dynamic pend ops and the scatter matmul
            slot = t % KP
            for k in range(4):
                ri = grp[pl.ds(16 * k + (i % 8), 1), :]
                rj = grp[pl.ds(16 * k + 8 + (j % 8), 1), :]
                nr = 0.5 * ri + 0.5 * rj
                grp[pl.ds(16 * k + 8 + (j % 8), 1), :] = nr
                pend[pl.ds(slot + KP * (k // 2), 1), :] = nr  # 2 shared bufs
            # corrections for two rows: matvec gather + scatter matmul
            ej = (jax.lax.broadcasted_iota(jnp.int32, (NP, 2), 0) == j
                  ).astype(jnp.float32)
            cols2 = jnp.dot(pend[:, :], ej,
                            preferred_element_type=jnp.float32)  # (2KP, 2)
            colT = jnp.reshape(cols2[0:KP, 0:1], (1, KP))
            corr = jnp.dot(colT, onehot[:, :],
                           preferred_element_type=jnp.float32)
            grp[0:1, :] = grp[0:1, :] + corr
            # onehot maintenance: zero col j, set row slot
            lanes = jax.lax.broadcasted_iota(jnp.int32, (KP, NP), 1)
            onehot[:, :] = jnp.where(lanes == j, 0.0, onehot[:, :])
            onehot[pl.ds(slot, 1), :] = (
                jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1) == j
            ).astype(jnp.float32)
            # 4 group writes
            wr = []
            for k, st_ in enumerate([d, dt, dcf, dcft]):
                w1 = pltpu.make_async_copy(grp.at[pl.ds(16 * k + 8, 8), :],
                                           st_.at[pl.ds(gj, 8), :],
                                           sems.at[k])
                w1.start()
                wr.append(w1)
            for w1 in wr:
                w1.wait()
            return 0

        jax.lax.fori_loop(0, STEPS, step, 0)
        cis[0] = 1

    d0 = jnp.zeros((NP, NP), jnp.float32)
    f = jax.jit(lambda a: pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1,), jnp.int32),
                   jax.ShapeDtypeStruct((NP, NP), jnp.float32),
                   jax.ShapeDtypeStruct((NP, NP), jnp.float32),
                   jax.ShapeDtypeStruct((NP, NP), jnp.float32),
                   jax.ShapeDtypeStruct((NP, NP), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),) +
                  (pl.BlockSpec(memory_space=pl.ANY),) * 4,
        scratch_shapes=[
            pltpu.VMEM((64, NP), jnp.float32),      # group bufs
            pltpu.VMEM((2 * KP, NP), jnp.float32),  # pend bufs
            pltpu.VMEM((KP, NP), jnp.float32),      # onehot
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024),
    )(a))
    r = f(d0)
    jax.block_until_ready(r)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        r = f(d0)
        jax.block_until_ready(r)
    dt_s = (time.time() - t0) / reps
    per_step = (dt_s - 0.0) / STEPS
    print(f"P7 timing: {STEPS} steps in {dt_s*1e3:.2f} ms => "
          f"{per_step*1e6:.1f} us/step (Np={NP}, incl. 4x matrix init copy)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "3", "5", "7"]
    print("devices:", jax.devices())
    if "1" in which:
        probe_group_dma()
    if "3" in which:
        probe_matmul_lane_dyn()
    if "5" in which:
        probe_while()
    if "7" in which:
        probe_timing()
