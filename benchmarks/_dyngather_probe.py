"""Probe Mosaic's equal-shape dynamic gather (tpu.DynamicGatherOp).

The earlier probe showed Mosaic rejects jnp.take when input/indices/output
shapes differ — suggesting the supported form is out[i, j] = table[idx[i, j], j]
with all three the SAME shape. If that compiles and runs fast, the NDT terms
kernel can keep a (N_pad, 16) slab in VMEM and gather per-point rows
directly.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_dyngather_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, reps=20):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name:52s} FAILED: {type(e).__name__}: {msg}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.3f} ms")
    return dt


def make(kernel, shape, n_in=2):
    def run(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
    return jax.jit(run)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # --- equal-shape gather: (32768, 16) table, (32768, 16) idx ----------
    N = 32768
    table = jnp.asarray(rng.normal(size=(N, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (N,)), jnp.int32)
    idx2d = jnp.broadcast_to(idx[:, None], (N, 16))

    def k_eq(idx_ref, t_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(t_ref[:], idx_ref[:], axis=0)

    f = make(k_eq, (N, 16))
    t = timeit("equal-shape take_along_axis (32k,16)", f, idx2d, table)
    if t:
        print(f"    -> {N/t/1e9:.2f} G rows/s, "
              f"{N*16*4/t/1e9:.1f} GB/s effective")
        # verify correctness
        out = f(idx2d, table)
        ref = np.asarray(table)[np.asarray(idx)]
        print("    correct:", bool(np.allclose(np.asarray(out), ref)))

    # --- (8192, 128) layout ----------------------------------------------
    M = 8192
    tab128 = jnp.asarray(rng.normal(size=(M, 128)), jnp.float32)
    idxm = jnp.asarray(rng.integers(0, M, (M,)), jnp.int32)
    idxm2d = jnp.broadcast_to(idxm[:, None], (M, 128))

    f2 = make(k_eq, (M, 128))
    t = timeit("equal-shape take_along_axis (8k,128)", f2, idxm2d, tab128)
    if t:
        print(f"    -> {M/t/1e9:.2f} G rows/s, "
              f"{M*128*4/t/1e9:.1f} GB/s effective")

    # --- per-lane independent indices (true dynamic gather) ---------------
    idx_lane = jnp.asarray(rng.integers(0, M, (M, 128)), jnp.int32)
    t = timeit("per-lane idx take_along_axis (8k,128)", f2, idx_lane, tab128)

    # --- gather SMALLER than table: idx rows < table rows ------------------
    def k_sub(idx_ref, t_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(t_ref[:], idx_ref[:], axis=0)

    NS = 4096

    def run_sub(i, tbl):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((NS, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, tbl)

    idxs = jnp.asarray(rng.integers(0, M, (NS, 128)), jnp.int32)
    timeit("sub-shape take_along_axis (4k out of 8k)",
           jax.jit(run_sub), idxs, tab128)

    # --- in-kernel one-hot MXU retry (simple, no fori) ---------------------
    def k_onehot(idx_ref, t_ref, out_ref):
        ii = idx_ref[:, 0]                                  # (256,)
        oh = (ii[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (256, 2048), 1)).astype(jnp.float32)
        out_ref[:] = jnp.dot(oh, t_ref[:],
                             preferred_element_type=jnp.float32)

    tab2k = jnp.asarray(rng.normal(size=(2048, 128)), jnp.float32)
    idx256 = jnp.asarray(rng.integers(0, 2048, (256, 1)), jnp.int32)

    def run_oh(i, tbl):
        return pl.pallas_call(
            k_onehot,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, tbl)

    timeit("in-kernel one-hot f32 (256 of 2048)", jax.jit(run_oh),
           idx256, tab2k)


if __name__ == "__main__":
    main()
