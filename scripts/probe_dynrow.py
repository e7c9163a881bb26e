"""Isolate the cost of dynamic-sublane VMEM access patterns used by the
incremental merge kernel: is `buf[pl.ds(slot,1), :] = vec` O(row) or
O(buffer)? Compares stores into small vs large buffers."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP = 5120
STEPS = 4096


def build(rows_small, rows_big, n_stores):
    def kern(x_ref, out_ref, small, big):
        def step(t, acc):
            slot = (t * 13) % rows_small
            slot_b = (t * 13) % rows_big
            v = x_ref[:, :] + acc.astype(jnp.float32)
            for k in range(n_stores):
                if rows_big > 0:
                    big[pl.ds(slot_b, 1), :] = v
                else:
                    small[pl.ds(slot, 1), :] = v
            return acc + 1
        acc = jax.lax.fori_loop(0, STEPS, step, 0)
        out_ref[0] = acc

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((max(rows_small, 8), NP), jnp.float32),
            pltpu.VMEM((max(rows_big, 8), NP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    x = jnp.ones((1, NP), jnp.float32)
    for label, rs, rb, ns in [
            ("baseline 0 stores", 8, 0, 0),
            ("4 stores into (8,Np)", 8, 0, 4),
            ("4 stores into (512,Np)", 8, 512, 4),
            ("4 stores into (2048,Np)", 8, 2048, 4),
    ]:
        f = jax.jit(lambda a, rs=rs, rb=rb, ns=ns: build(rs, rb, ns)(a))
        force = jax.jit(lambda r: r[0])
        int(force(f(x)))
        t0 = time.time()
        for _ in range(3):
            int(force(f(x)))
        per = (time.time() - t0) / 3 / STEPS * 1e6
        print(f"{label:28s} {per:6.2f} us/step", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
