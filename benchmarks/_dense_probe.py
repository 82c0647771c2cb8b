"""Time the real mapping.dense_map ops on the chip (config2/3 workload)."""
import sys
sys.path.insert(0, ".")
import numpy as np
from tpu_slam.utils.tpu_env import ensure_tpu_compile_env
ensure_tpu_compile_env()
import jax
import jax.numpy as jnp
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.kernels.voxel_hash import VoxelGridSpec
from tpu_slam.mapping.dense_map import (empty_grid, grid_coarsen, grid_insert,
                                        grid_ndt_field, grid_scroll,
                                        centered_origin_cell, DenseMomentGrid)
from tpu_slam.mapping.voxel_map import coarse_spec_of
from tpu_slam.utils.devtime import slope_time

print(f"devices: {jax.devices()}", flush=True)
world = syn.dense_city(extent=200.0, seed=0)
map_spec = VoxelGridSpec.centered(leaf=0.5, half_extent=128.0)
T_pose = syn.se2_pose(-4.0, -4.0, 0.3, z=1.8)
rng = np.random.default_rng(0)
pts, valid = syn.simulate_vlp16_revolution(world, T_pose, n_azimuth=8192,
                                           max_range=75.0, noise_std=0.01,
                                           rng=rng)
cloud = PointCloud.from_points(jnp.asarray(pts[valid]), capacity=131072)
Tw = jnp.asarray(T_pose, jnp.float32)
wcloud = cloud.transform(Tw)
scan = voxel_downsample(cloud, VoxelGridSpec.centered(leaf=0.2, half_extent=102.0),
                        capacity=32768)
wscan = scan.transform(Tw)

dims = (160, 160, 32)
c0 = np.array(centered_origin_cell(Tw[:3, 3], map_spec, dims, align=4))
grid0 = jax.block_until_ready(
    grid_insert(empty_grid(dims, jnp.asarray(c0)), wcloud, map_spec))
print("grid occupied cells:", int(jnp.sum(grid0.rows[:, 0] > 0)), flush=True)


def timeit(name, fn, k0=2, k1=12):
    t = slope_time(fn, k0, k1)
    print(f"{name}: {t*1e3:8.2f} ms", flush=True)
    return t


@jax.jit
def ins_raw(K, rows):
    def body(i, rows):
        g = DenseMomentGrid(rows=rows, origin_cell=jnp.asarray(c0), dims=dims)
        c2 = PointCloud(points=wcloud.points + i.astype(jnp.float32) * 1e-6,
                        mask=wcloud.mask)
        return grid_insert(g, c2, map_spec).rows
    return jax.lax.fori_loop(0, K, body, rows)[0, 0]


timeit("grid_insert raw 131k", lambda K: ins_raw(K, grid0.rows))


@jax.jit
def ins_ds(K, rows):
    def body(i, rows):
        g = DenseMomentGrid(rows=rows, origin_cell=jnp.asarray(c0), dims=dims)
        c2 = PointCloud(points=wscan.points + i.astype(jnp.float32) * 1e-6,
                        mask=wscan.mask)
        return grid_insert(g, c2, map_spec).rows
    return jax.lax.fori_loop(0, K, body, rows)[0, 0]


timeit("grid_insert ds 32k", lambda K: ins_ds(K, grid0.rows))


@jax.jit
def field_loop(K):
    def body(i, acc):
        g = DenseMomentGrid(rows=grid0.rows.at[0, 0].add(acc * 1e-12 + 1e-6),
                            origin_cell=jnp.asarray(c0), dims=dims)
        f = grid_ndt_field(g, map_spec)
        return acc + f.planes[32, 0, 0, 0] + f.planes[0, 0, 0, 0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


timeit("grid_ndt_field fine (160x160x32)", field_loop)

cspec = coarse_spec_of(map_spec, 4)


@jax.jit
def coarse_loop(K):
    def body(i, acc):
        g = DenseMomentGrid(rows=grid0.rows.at[0, 0].add(acc * 1e-12 + 1e-6),
                            origin_cell=jnp.asarray(c0), dims=dims)
        cg = grid_coarsen(g, map_spec, 4)
        f = grid_ndt_field(cg, cspec)
        return acc + f.planes[8, 0, 0, 0] + f.planes[0, 0, 0, 0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


timeit("grid_coarsen+field (40x40x8)", coarse_loop)


@jax.jit
def scroll_loop(K, rows):
    def body(i, rows):
        g = DenseMomentGrid(rows=rows, origin_cell=jnp.asarray(c0), dims=dims)
        sh = jnp.stack([(i % 3 - 1) * 4, ((i + 1) % 3 - 1) * 4, jnp.int32(0)])
        return grid_scroll(g, sh).rows
    return jax.lax.fori_loop(0, K, body, rows)[0, 0]


timeit("grid_scroll", lambda K: scroll_loop(K, grid0.rows))
