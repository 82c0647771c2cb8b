"""Microbenchmark: candidate lowering strategies for the NDT terms pass.

The round-2 measurement put the XLA `jnp.take` tier-9 gather at 5.39 ms per
pass (1.3% of HBM speed-of-light) at the 32k-point workload. This script
measures, on the real chip, every candidate replacement so the round-3
Pallas kernel is designed from data instead of guesses:

  a. current tier-9 XLA gather (baseline)
  b. tier-0 rows16 XLA gather (27 small-row indices/pt)
  c. dense-raster formulation: scatter points to (G, Q, 4), 27 static rolls
     of the rows16 table, fully dense elementwise math (no gathers at all)
  d. Pallas in-kernel jnp.take from a VMEM-resident table (does Mosaic
     lower a vector gather at all? at what rate?)
  e. one-hot MXU gather within an x-slab

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_gather_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 32768          # scan points
WB = 6             # window bits
W = 1 << WB
G = W ** 3         # 262144 cells
Q = 4              # raster per-cell point capacity


def timeit(name, fn, reps=20):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:8.3f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    # points uniformly over the window, in cell units
    pts = jnp.asarray(rng.uniform(1, W - 1, (N, 3)), jnp.float32)
    cc = pts.astype(jnp.int32)
    key = (cc[:, 0] * W + cc[:, 1]) * W + cc[:, 2]
    rows16 = jnp.asarray(rng.normal(size=(G, 16)), jnp.float32)
    rows144 = jnp.asarray(rng.normal(size=(G, 144)), jnp.float32)
    d3 = jnp.array([-1, 0, 1], jnp.int32)

    # --- a. tier-9 gather: 3 idx/pt, 576 B rows --------------------------
    @jax.jit
    def tier9(key, rows144):
        starts = key[:, None] + d3 * (W * W)
        rows = jnp.take(rows144, jnp.clip(starts, 0, G - 1), axis=0)
        return jnp.sum(rows.reshape(N, 27, 16), axis=(1, 2))

    timeit("a. XLA take tier-9 (3 idx/pt)", lambda: tier9(key, rows144))

    # --- b. tier-0 gather: 27 idx/pt, 64 B rows --------------------------
    doff = (d3[:, None, None] * W * W + d3[None, :, None] * W
            + d3[None, None, :]).reshape(-1)

    @jax.jit
    def tier0(key, rows16):
        idx = jnp.clip(key[:, None] + doff, 0, G - 1)
        rows = jnp.take(rows16, idx, axis=0)
        return jnp.sum(rows, axis=(1, 2))

    timeit("b. XLA take tier-0 (27 idx/pt)", lambda: tier0(key, rows16))

    # --- c. dense raster, pure XLA ---------------------------------------
    # scatter: points into (G, Q, 4); slot via cumulative count per key
    @jax.jit
    def raster_scatter(pts, key):
        order = jnp.argsort(key)
        sk = jnp.take(key, order)
        sp = jnp.take(pts, order, axis=0)
        # rank within segment
        idx = jnp.arange(N, dtype=jnp.int32)
        is_start = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        seg_start = jnp.maximum.accumulate(jnp.where(is_start, idx, 0))
        rank = idx - seg_start
        ok = rank < Q
        flat = jnp.where(ok, sk * Q + rank, G * Q)
        R = jnp.zeros((G * Q, 4), jnp.float32)
        R = R.at[flat].set(jnp.concatenate(
            [sp, jnp.ones((N, 1), jnp.float32)], 1), mode="drop")
        return R.reshape(G, Q * 4)

    R = raster_scatter(pts, key)
    timeit("c0. raster scatter (sort+set)", lambda: raster_scatter(pts, key))

    def roll_terms(R, rows16):
        # 27 static shifts of rows16 against the dense raster
        acc = jnp.zeros((G,), jnp.float32)
        Rr = R.reshape(G, Q, 4)
        p = Rr[:, :, :3]
        m = Rr[:, :, 3]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    sh = (dx * W + dy) * W + dz
                    rr = jnp.roll(rows16, -sh, axis=0)     # (G, 16)
                    mu = rr[:, None, 0:3]
                    r = p - mu
                    d2 = jnp.sum(r * r, axis=-1) * rr[:, None, 3]
                    s = jnp.exp(-0.5 * jnp.minimum(d2, 30.0)) * m
                    acc = acc + jnp.sum(s * d2, axis=1)
        return acc

    roll_jit = jax.jit(roll_terms)
    timeit("c1. raster 27-roll terms (XLA)", lambda: roll_jit(R, rows16))

    # --- d. Pallas: VMEM table + in-kernel vector gather ------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gk(key_ref, rows_ref, out_ref):
        idx = key_ref[:]                       # (N,)
        rows = jnp.take(rows_ref[:], idx, axis=0)   # (N, 16) ???
        out_ref[:] = jnp.sum(rows, axis=1)

    def pallas_take(key, rows16):
        return pl.pallas_call(
            gk,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(key, rows16[: 1 << 15])   # small table to fit VMEM

    timeit("d. Pallas in-kernel jnp.take",
           lambda: jax.jit(pallas_take)(jnp.clip(key, 0, (1 << 15) - 1),
                                        rows16))

    # --- e. one-hot MXU gather within slab --------------------------------
    SL = 1 << 12   # slab rows

    @jax.jit
    def onehot(key, rows16):
        # points in one slab only (pretend): local idx
        lk = key % SL
        oh = jax.nn.one_hot(lk, SL, dtype=jnp.bfloat16)     # (N, SL)
        rows = jnp.dot(oh, rows16[:SL].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(rows, axis=1)

    timeit("e. one-hot MXU gather (1 idx/pt)", lambda: onehot(key, rows16))


if __name__ == "__main__":
    main()
