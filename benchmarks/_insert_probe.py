"""Profile the map-insert path stage by stage on the chip.

Round-3 measured insert_cloud at 249.9 ms/scan on the config2/3 workload
(131k-capacity raw cloud into a 524k-capacity map) — 18x the register
step. This probe times each candidate component with device-side slope
loops to locate the cost and to validate the dense-moment-grid design
(scatter-add of per-cell aggregates into a window-resident dense grid).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from tpu_slam.utils.tpu_env import ensure_tpu_compile_env

ensure_tpu_compile_env()

import jax
import jax.numpy as jnp

from bench import _city_scans
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.kernels.voxel_hash import VoxelGridSpec
from tpu_slam.mapping.voxel_map import (build_map_host, insert_cloud,
                                        insert_scan_stats,
                                        insert_scan_stats_incremental,
                                        scan_to_voxel_stats)
from tpu_slam.utils.devtime import slope_time

print(f"devices: {jax.devices()}", flush=True)

world = syn.dense_city(extent=200.0, seed=0)
surf = syn.sample_world_surface(world, spacing=0.15, noise_std=0.01, seed=1)
map_spec = VoxelGridSpec.centered(leaf=0.5, half_extent=128.0)
vmap = build_map_host(surf, map_spec, capacity=524288)

T_pose = syn.se2_pose(-4.0, -4.0, 0.3, z=1.8)
rng = np.random.default_rng(0)
pts, valid = syn.simulate_vlp16_revolution(world, T_pose, n_azimuth=8192,
                                           max_range=75.0, noise_std=0.01,
                                           rng=rng)
cloud = PointCloud.from_points(jnp.asarray(pts[valid]), capacity=131072)
Tw = jnp.asarray(T_pose, jnp.float32)
wcloud = cloud.transform(Tw)
scan = voxel_downsample(cloud,
                        VoxelGridSpec.centered(leaf=0.2, half_extent=102.0),
                        capacity=32768)
wscan = scan.transform(Tw)
print(f"raw={int(cloud.count())} pts (cap {cloud.capacity}), "
      f"ds={int(scan.count())} pts (cap {scan.capacity}), "
      f"map={int(vmap.n_occupied())} vox (cap {vmap.capacity})", flush=True)


def timeit(name, fn, k0=2, k1=12):
    t = slope_time(fn, k0, k1)
    print(f"{name}: {t*1e3:8.2f} ms", flush=True)
    return t


# 1. scan_to_voxel_stats on the raw cloud vs downsampled
@jax.jit
def stats_raw(K):
    def body(i, acc):
        c2 = PointCloud(points=wcloud.points + i.astype(jnp.float32) * 1e-6,
                        mask=wcloud.mask)
        k, c, s, o = scan_to_voxel_stats(c2, map_spec)
        return acc + c[0] + s[0, 0] + o[0, 0, 0] + k[0].astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


timeit("scan_to_voxel_stats raw 131k", stats_raw)


@jax.jit
def stats_ds(K):
    def body(i, acc):
        c2 = PointCloud(points=wscan.points + i.astype(jnp.float32) * 1e-6,
                        mask=wscan.mask)
        k, c, s, o = scan_to_voxel_stats(c2, map_spec)
        return acc + c[0] + s[0, 0] + o[0, 0, 0] + k[0].astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


timeit("scan_to_voxel_stats ds 32k", stats_ds)

# 2. the incremental merge alone (fixed aggregates, map donated through)
keys, cnt, ssum, souter = jax.block_until_ready(
    scan_to_voxel_stats(wcloud, map_spec))


@jax.jit
def merge_inc(K, vm):
    def body(i, vm):
        return insert_scan_stats_incremental(
            vm, keys, cnt, ssum, souter, i.astype(jnp.float32))
    return jax.lax.fori_loop(0, K, body, vm).count[0]


timeit("insert_scan_stats_incremental (raw aggs)",
       lambda K: merge_inc(K, vmap))

kd, cd, sd, od = jax.block_until_ready(scan_to_voxel_stats(wscan, map_spec))


@jax.jit
def merge_inc_ds(K, vm):
    def body(i, vm):
        return insert_scan_stats_incremental(vm, kd, cd, sd, od,
                                             i.astype(jnp.float32))
    return jax.lax.fori_loop(0, K, body, vm).count[0]


timeit("insert_scan_stats_incremental (ds aggs)",
       lambda K: merge_inc_ds(K, vmap))


# 3. full insert_cloud as benched (raw + downsampled)
@jax.jit
def ins_raw(K, vm):
    def body(i, vm):
        c2 = PointCloud(points=wcloud.points + i.astype(jnp.float32) * 1e-6,
                        mask=wcloud.mask)
        return insert_cloud(vm, c2, map_spec, i.astype(jnp.float32))
    return jax.lax.fori_loop(0, K, body, vm).count[0]


timeit("insert_cloud raw (benched path)", lambda K: ins_raw(K, vmap))


@jax.jit
def ins_ds(K, vm):
    def body(i, vm):
        c2 = PointCloud(points=wscan.points + i.astype(jnp.float32) * 1e-6,
                        mask=wscan.mask)
        return insert_cloud(vm, c2, map_spec, i.astype(jnp.float32))
    return jax.lax.fori_loop(0, K, body, vm).count[0]


timeit("insert_cloud ds", lambda K: ins_ds(K, vmap))

# 4. dense-grid candidate: bin points to 10-channel cell aggregates inside
#    a (160,160,32) window and scatter-add into a persistent dense grid
dims = (160, 160, 32)
wx, wy, wz = dims
g = wx * wy * wz
grid = jnp.zeros((g, 10), jnp.float32)
origin_cell = jnp.asarray([-4.0 // 0.5 - wx // 2 + 256,
                           -4.0 // 0.5 - wy // 2 + 256,
                           1.8 // 0.5 - wz // 2 + 256], jnp.int32)
origin_w = (jnp.asarray(map_spec.origin, jnp.float32)
            + origin_cell.astype(jnp.float32) * map_spec.leaf)


def grid_insert(gr, points, mask, shift):
    p = points + shift
    cc = jnp.floor((p - origin_w) / map_spec.leaf).astype(jnp.int32)
    inside = (mask & (cc[:, 0] >= 0) & (cc[:, 0] < wx)
              & (cc[:, 1] >= 0) & (cc[:, 1] < wy)
              & (cc[:, 2] >= 0) & (cc[:, 2] < wz))
    cell = (cc[:, 0] * wy + cc[:, 1]) * wz + cc[:, 2]
    cell = jnp.where(inside, cell, g)
    order = jnp.argsort(cell, stable=True)
    scell = jnp.take(cell, order)
    sp = jnp.take(p, order, axis=0)
    corner = origin_w + jnp.take(cc, order, axis=0).astype(jnp.float32) * 0.5
    local = jnp.where((scell < g)[:, None], sp - corner, 0.0)
    n = points.shape[0]
    w = (scell < g).astype(jnp.float32)
    rows = jnp.concatenate([
        w[:, None], local * w[:, None],
        (local[:, 0] * local)[:, :],            # oxx oxy oxz
        (local[:, 1] * local)[:, 1:],           # oyy oyz
        (local[:, 2] * local)[:, 2:]], axis=1)  # ozz
    from tpu_slam.kernels.voxel_hash import segment_ids_from_sorted_keys
    seg_ids, is_start = segment_ids_from_sorted_keys(scell)
    agg = jax.ops.segment_sum(rows, seg_ids, num_segments=n)
    segk = jax.ops.segment_max(jnp.where(is_start, scell, -1), seg_ids,
                               num_segments=n)
    tgt = jnp.where(segk >= 0, segk, g)
    return gr.at[tgt].add(agg, mode="drop", unique_indices=True)


@jax.jit
def dense_ins(K, gr):
    def body(i, gr):
        return grid_insert(gr, wcloud.points, wcloud.mask,
                           i.astype(jnp.float32) * 1e-6)
    return jax.lax.fori_loop(0, K, body, gr)[0, 0]


timeit("dense grid insert raw 131k (160x160x32)", lambda K: dense_ins(K, grid))


@jax.jit
def dense_ins_ds(K, gr):
    def body(i, gr):
        return grid_insert(gr, wscan.points, wscan.mask,
                           i.astype(jnp.float32) * 1e-6)
    return jax.lax.fori_loop(0, K, body, gr)[0, 0]


timeit("dense grid insert ds 32k", lambda K: dense_ins_ds(K, grid))


# 5. dense field build straight from the grid: 3 separable neighbor passes
#    + closed-form floored inverses + plane transpose (no sparse scatter)
from tpu_slam.core.sym3 import floored_info_sym3_tri
from tpu_slam.kernels.ndt_terms import rows_to_planes
from tpu_slam.registration.ndt import _nbr_moment_pass


def grid_field(gr):
    a = gr.reshape(wx, wy, wz, 10)
    for axis in (2, 1, 0):
        a = _nbr_moment_pass(a, axis, map_spec.leaf)
    a = a.reshape(g, 10)
    cnt = a[:, 0]
    occ = gr[:, 0] > 0.0
    safe = jnp.maximum(cnt, 1.0)
    mean_local = a[:, 1:4] / safe[:, None]
    mx, my, mz = mean_local[:, 0], mean_local[:, 1], mean_local[:, 2]
    inv = 1.0 / safe
    cov_tri = (a[:, 4] * inv - mx * mx, a[:, 5] * inv - mx * my,
               a[:, 6] * inv - mx * mz, a[:, 7] * inv - my * my,
               a[:, 8] * inv - my * mz, a[:, 9] * inv - mz * mz)
    info_tri = floored_info_sym3_tri(cov_tri, 0.01)
    valid = occ & (cnt >= 5.0)
    ci = jnp.arange(g, dtype=jnp.int32)
    cell = jnp.stack([ci // (wy * wz), (ci // wz) % wy, ci % wz], axis=1)
    mean_world = ((cell + origin_cell[None, :]).astype(jnp.float32)
                  * map_spec.leaf
                  + jnp.asarray(map_spec.origin, jnp.float32) + mean_local)
    rows16 = jnp.concatenate(
        [mean_world] + [t[:, None] for t in info_tri]
        + [valid[:, None].astype(jnp.float32),
           jnp.zeros((g, 6), jnp.float32)], axis=1)
    rows16 = jnp.where(valid[:, None], rows16, 0.0)
    return rows_to_planes(rows16, dims)


grid2 = jax.block_until_ready(
    grid_insert(grid, wcloud.points, wcloud.mask, 0.0))


@jax.jit
def field_loop(K):
    def body(i, acc):
        gr = grid2.at[0, 0].add(acc * 1e-12 + 1e-6)
        pl = grid_field(gr)
        return acc + pl[32, 0, 0, 0] + pl[0, 0, 0, 0]
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


timeit("dense grid field build (160x160x32)", lambda K: field_loop(K))


# 6. scroll (traced shift roll + mask)
@jax.jit
def scroll_loop(K):
    def body(i, gr):
        sh = jnp.stack([i % 3 - 1, (i + 1) % 3 - 1, jnp.int32(0)])
        a = gr.reshape(wx, wy, wz, 10)
        for ax in range(3):
            a = jnp.roll(a, -sh[ax], axis=ax)
            n_ax = a.shape[ax]
            pos = jax.lax.broadcasted_iota(jnp.int32, a.shape, ax)
            ok = (pos < n_ax - jnp.maximum(sh[ax], 0)) & (
                pos >= jnp.maximum(-sh[ax], 0))
            a = jnp.where(ok, a, 0.0)
        return a.reshape(g, 10)
    return jax.lax.fori_loop(0, K, body, grid2)[0, 0]


timeit("dense grid scroll (traced shift)", lambda K: scroll_loop(K))
