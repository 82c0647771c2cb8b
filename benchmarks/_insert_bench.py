"""Chip benchmark: incremental vs full map insert at the config-3 workload.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_insert_bench.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt*1e3:9.3f} ms")
    return dt


def main():
    import sys
    sys.path.insert(0, "/root/repo")
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.mapping.voxel_map import (empty_map, insert_cloud,
                                            scan_to_voxel_stats,
                                            insert_scan_stats,
                                            insert_scan_stats_incremental)

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    spec = VoxelGridSpec.centered(leaf=0.5, half_extent=128.0)
    # warm map: ~100k voxels
    base = rng.uniform(-100, 100, (300000, 3)).astype(np.float32)
    vmap = empty_map(262144)
    vmap = insert_cloud(vmap, PointCloud.from_points(jnp.asarray(base),
                                                     capacity=524288),
                        spec, 0.0, incremental=False)
    print("map occupied:", int(vmap.n_occupied()))

    # a 65k scan that mostly hits existing voxels + ~1k new
    scan_pts = base[rng.integers(0, 300000, 64000)] \
        + rng.normal(0, 0.1, (64000, 3)).astype(np.float32)
    new_pts = rng.uniform(100, 110, (1500, 3)).astype(np.float32)
    cloud = PointCloud.from_points(
        jnp.asarray(np.concatenate([scan_pts, new_pts]), jnp.float32),
        capacity=65536)

    agg = jax.jit(functools.partial(scan_to_voxel_stats, spec=spec))
    keys, cnt, ssum, souter = agg(cloud)
    jax.block_until_ready(keys)
    timeit("scan_to_voxel_stats (65k cloud)", agg, cloud, reps=10)

    st = jnp.float32(1.0)

    def inc():
        return insert_scan_stats_incremental(
            VoxelMapCopy(vmap), keys, cnt, ssum, souter, st)

    # donation: pass a fresh copy each call so the timing loop is honest
    def VoxelMapCopy(m):
        return jax.tree.map(lambda x: x + 0 if x.dtype != jnp.int32
                            else x | 0, m)

    out = inc()
    print("occupied after inc insert:", int(out.n_occupied()))
    timeit("insert_scan_stats_incremental", inc, reps=10)

    def full():
        return insert_scan_stats(VoxelMapCopy(vmap), keys, cnt, ssum,
                                 souter, st)

    timeit("insert_scan_stats (full merge)", full, reps=5)


if __name__ == "__main__":
    main()
