"""Chip benchmark of the Pallas NDT terms kernel at production size.

W=(64,64,64), Q=4, 32k scan points: compares the kernel pass time against
the XLA tier-9 gather path and the HBM/VPU roofline floors.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_terms_kernel_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_slam.kernels.ndt_terms import (build_terms_raster, ndt_terms_raster,
                                        rows_to_planes)

DIMS = (64, 64, 64)
Q = 4
N = 32768
LEAF = 0.5


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.3f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    wx, wy, wz = DIMS
    g = wx * wy * wz
    rows = np.zeros((g, 16), np.float32)
    occ = rng.uniform(size=g) < 0.4
    cell = np.stack(np.meshgrid(np.arange(wx), np.arange(wy), np.arange(wz),
                                indexing="ij"), -1).reshape(g, 3)
    rows[:, 0:3] = (cell + 0.5) * LEAF
    rows[:, 3] = rows[:, 6] = rows[:, 8] = 25.0     # isotropic Lambda
    rows[:, 9] = occ
    rows16 = jnp.asarray(rows)
    planes = jax.block_until_ready(rows_to_planes(rows16, DIMS))

    pts = jnp.asarray(rng.uniform(1.0, 31.0, (N, 3)), jnp.float32)
    mask = jnp.ones((N,), bool)
    T0 = jnp.eye(4, dtype=jnp.float32)
    gamma = jnp.float32(4.0)

    raster, dropped = jax.block_until_ready(build_terms_raster(
        pts, mask, T0, jnp.zeros(3), LEAF, DIMS, Q))
    print(f"dropped: {int(dropped)} / {N}")

    t_r = timeit("raster build (sort+scatter, XLA)",
                 lambda: build_terms_raster(pts, mask, T0, jnp.zeros(3),
                                            LEAF, DIMS, Q)[0], reps=10)

    t_k = timeit("pallas terms pass",
                 lambda: ndt_terms_raster(raster, planes, T0, gamma, 1.0,
                                          DIMS, Q))
    out = ndt_terms_raster(raster, planes, T0, gamma, 1.0, DIMS, Q)
    print("H[0,0]", float(out[0][0, 0]), "cost", float(out[2]),
          "matched", int(out[3]))

    t_p = timeit("rows_to_planes relayout (XLA)",
                 lambda: rows_to_planes(rows16, DIMS), reps=10)

    hbm_bytes = (g * 16 * 4) * 3 + g * Q * 4 * 4
    print(f"HBM model: {hbm_bytes/1e6:.1f} MB -> floor "
          f"{hbm_bytes/819e9*1e6:.0f} us")
    lane_ops = 27 * g * Q * 38
    print(f"VPU model: {lane_ops/1e9:.2f} G lane-ops -> floor "
          f"~{lane_ops/3.85e12*1e6:.0f} us")
    print(f"kernel at {hbm_bytes/819e9/t_k*100:.0f}% of HBM floor, "
          f"{lane_ops/3.85e12/t_k*100:.0f}% of VPU floor")


if __name__ == "__main__":
    main()
