"""Does Mosaic lower a vector gather from a VMEM-resident table, and how fast?

Variants tried at N=32768 indices into a (4096, 16) f32 VMEM table (the
3-x-plane slab size of the 64^3 NDT window is 12288 rows; 4096 here to be
safely inside VMEM with room for the points):

  1. jnp.take(table, idx, axis=0)
  2. jnp.take_along_axis(table, broadcast idx, axis=0)
  3. table[idx] advanced indexing
  4. one-hot matmul inside the kernel (MXU)
  5. fori_loop of per-index dynamic slices (scalar path, expected slow)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_pallas_gather_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 32768
T = 4096


def timeit(name, fn, reps=20):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa
        msg = str(e).replace("\n", " ")[:220]
        print(f"{name:40s} FAILED: {type(e).__name__}: {msg}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.3f} ms   ({N/dt/1e9:.2f} Gidx/s)")
    return dt


def call(kernel, idx, table, out_rows=True):
    shape = (N, 16) if out_rows else (N,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, table)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    table = jnp.asarray(rng.normal(size=(T, 16)), jnp.float32)

    def k_take(idx_ref, t_ref, out_ref):
        out_ref[:] = jnp.take(t_ref[:], idx_ref[:], axis=0)

    timeit("1. jnp.take axis0",
           lambda: jax.jit(lambda i, t: call(k_take, i, t))(idx, table))

    def k_taa(idx_ref, t_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[:][:, None], (N, 16))
        out_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0)

    timeit("2. take_along_axis bcast",
           lambda: jax.jit(lambda i, t: call(k_taa, i, t))(idx, table))

    def k_adv(idx_ref, t_ref, out_ref):
        out_ref[:] = t_ref[:][idx_ref[:]]

    timeit("3. advanced indexing",
           lambda: jax.jit(lambda i, t: call(k_adv, i, t))(idx, table))

    def k_onehot(idx_ref, t_ref, out_ref):
        # chunked one-hot matmul: (512, T) @ (T, 16)
        def body(c, _):
            ii = idx_ref[pl.ds(c * 512, 512)]
            oh = (ii[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (512, T), 1)).astype(jnp.bfloat16)
            out_ref[pl.ds(c * 512, 512), :] = jnp.dot(
                oh, t_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            return ()
        jax.lax.fori_loop(0, N // 512, body, ())

    timeit("4. in-kernel one-hot MXU",
           lambda: jax.jit(lambda i, t: call(k_onehot, i, t))(idx, table))

    def k_scalar(idx_ref, t_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = t_ref[pl.ds(idx_ref[i], 1), :]
            return ()
        jax.lax.fori_loop(0, N, body, ())

    timeit("5. scalar dynamic-slice loop",
           lambda: jax.jit(lambda i, t: call(k_scalar, i, t))(idx, table),
           reps=3)

    # 6. XLA take at the same size, for reference
    timeit("6. XLA jnp.take (same size)",
           lambda: jax.jit(lambda i, t: jnp.take(t, i, axis=0))(idx, table))


if __name__ == "__main__":
    main()
