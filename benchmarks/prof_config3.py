"""Config-3 stage profiler: where do the 44.8 ms per two-level register go?

Times, device-side (utils.devtime.slope_time), on the exact bench workload:
  - full two-level register, coarse-only, fine-only
  - fine raster build, decomposed: argsort / rank / scatter / transpose
  - fine terms pass; coarse terms pass; coarse raster build
Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof_config3.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from tpu_slam.core import se3
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.kernels.downsample import voxel_downsample
    from tpu_slam.kernels.ndt_terms import (_split_dims, build_terms_raster,
                                            ndt_terms_raster)
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.mapping.voxel_map import (build_map_host, coarse_spec_of,
                                            coarsen_map)
    from tpu_slam.registration.ndt import NDTParams, ndt_field, ndt_register
    from tpu_slam.ingest import synthetic as syn
    from tpu_slam.utils.devtime import slope_time

    world = syn.dense_city(extent=200.0, seed=0)
    surf = syn.sample_world_surface(world, spacing=0.15, noise_std=0.01,
                                    seed=1)
    map_spec = VoxelGridSpec.centered(leaf=0.5, half_extent=128.0)
    vmap = build_map_host(surf, map_spec, capacity=524288)

    T_pose = syn.se2_pose(-4.0, -4.0, 0.3, z=1.8)
    rng = np.random.default_rng(0)
    pts, valid = syn.simulate_vlp16_revolution(
        world, T_pose, n_azimuth=8192, max_range=75.0, noise_std=0.01,
        rng=rng)
    cloud = PointCloud.from_points(jnp.asarray(pts[valid]), capacity=131072)
    scan = voxel_downsample(
        cloud, VoxelGridSpec.centered(leaf=0.2, half_extent=102.0),
        capacity=65536)
    n_scan = int(scan.count())
    Tw = jnp.asarray(T_pose, jnp.float32)

    fine_dims = (160, 160, 32)
    fparams = NDTParams(max_iterations=8, coarse_iterations=0,
                        tolerance=3e-4, min_voxel_count=3.0, rebin_iters=8,
                        window_dims=fine_dims)
    cparams = NDTParams(max_iterations=6, coarse_iterations=2,
                        max_corr_dist=4.0, window_dims=(64, 64, 16))
    cspec = coarse_spec_of(map_spec, 4)
    cmap = coarsen_map(vmap, map_spec, 4)
    cfield = ndt_field(cmap, cspec, cparams, center=Tw[:3, 3])
    field = ndt_field(vmap, map_spec, fparams, center=Tw[:3, 3])
    jax.block_until_ready(field.planes)
    print(f"scan {n_scan} pts, fine dims {fine_dims}")

    sane = scan.sanitize()
    dims = fine_dims
    c0 = field.origin_cell
    origin_w = (jnp.asarray(map_spec.origin, jnp.float32)
                + c0.astype(jnp.float32) * map_spec.leaf)
    cc0 = cfield.origin_cell
    corigin_w = (jnp.asarray(cspec.origin, jnp.float32)
                 + cc0.astype(jnp.float32) * cspec.leaf)

    def tloop(fn, lo=3, hi=23):
        @jax.jit
        def loop(K):
            def body(i, carry):
                return fn(i, carry)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        return slope_time(loop, lo, hi)

    # -- full + per-level registers --------------------------------------
    def reg_full(i, acc):
        Ti = Tw.at[0, 3].add(jnp.sin(i.astype(jnp.float32)) * 0.15)
        r0 = ndt_register(scan, cfield, cspec, init_T=Ti, params=cparams)
        r = ndt_register(scan, field, map_spec, init_T=r0.T, params=fparams)
        return acc + r.T[0, 3] + r.score

    def reg_coarse(i, acc):
        Ti = Tw.at[0, 3].add(jnp.sin(i.astype(jnp.float32)) * 0.15)
        r0 = ndt_register(scan, cfield, cspec, init_T=Ti, params=cparams)
        return acc + r0.T[0, 3] + r0.score

    def reg_fine(i, acc):
        Ti = Tw.at[0, 3].add(jnp.sin(i.astype(jnp.float32)) * 0.01)
        r = ndt_register(scan, field, map_spec, init_T=Ti, params=fparams)
        return acc + r.T[0, 3] + r.score

    t_full = tloop(reg_full)
    t_coarse = tloop(reg_coarse)
    t_fine = tloop(reg_fine)
    print(f"register full {t_full*1e3:.2f} ms | coarse {t_coarse*1e3:.2f} "
          f"| fine {t_fine*1e3:.2f}")

    # iterations actually run
    r0 = ndt_register(scan, cfield, cspec, init_T=Tw, params=cparams)
    rf = ndt_register(scan, field, map_spec, init_T=r0.T, params=fparams)
    print(f"iters: coarse {int(r0.iterations)}, fine {int(rf.iterations)}")

    # -- raster build decomposition --------------------------------------
    pts_a, mask_a = sane.points, sane.mask
    n = pts_a.shape[0]
    wx, wy, wz = dims
    g = wx * wy * wz
    q_cap = 4

    def bin_cells(i, acc):
        pw = (pts_a + i.astype(jnp.float32) * 1e-6) @ Tw[:3, :3].T + Tw[:3, 3]
        cc = jnp.floor((pw - origin_w) / map_spec.leaf).astype(jnp.int32)
        inside = (mask_a & (cc[:, 0] >= 0) & (cc[:, 0] < wx)
                  & (cc[:, 1] >= 0) & (cc[:, 1] < wy)
                  & (cc[:, 2] >= 0) & (cc[:, 2] < wz))
        cell = (cc[:, 0] * wy + cc[:, 1]) * wz + cc[:, 2]
        return acc + jnp.sum(jnp.where(inside, cell, 0).astype(jnp.float32))
    t_cells = tloop(bin_cells, 3, 43)

    cellv = jnp.where(mask_a, jnp.arange(n, dtype=jnp.int32) % g, g)

    def srt(i, acc):
        order = jnp.argsort(cellv + i, stable=True)
        return acc + order[0].astype(jnp.float32)
    t_sort = tloop(srt, 3, 43)

    order = jnp.argsort(cellv, stable=True)
    sc = jnp.take(cellv, order)
    sp = jnp.take(pts_a, order, axis=0)
    idx = jnp.arange(n, dtype=jnp.int32)

    def rank_fn(i, acc):
        rank = jnp.zeros((n,), jnp.int32) + i * 0
        for j in range(1, q_cap + 1):
            prev = jnp.where(idx >= j, jnp.take(sc, jnp.maximum(idx - j, 0)),
                             jnp.int32(-1))
            rank = rank + (prev == sc).astype(jnp.int32)
        return acc + jnp.sum(rank).astype(jnp.float32)
    t_rank = tloop(rank_fn, 3, 43)

    total = g * q_cap
    rank0 = jnp.zeros((n,), jnp.int32)
    keep = (sc < g) & (rank0 < q_cap)
    slot = jnp.where(keep, sc * q_cap + rank0, total)
    rows = jnp.concatenate([jnp.where(keep[:, None], sp, 0.0),
                            keep[:, None].astype(jnp.float32)], axis=1)

    def scat(i, acc):
        table = jnp.zeros((total, 4), jnp.float32).at[
            jnp.where(slot < total, slot + i * 0, total)].set(
            rows, mode="drop", unique_indices=True)
        return acc + table[0, 0]
    t_scat = tloop(scat, 3, 23)

    table = jnp.zeros((total, 4), jnp.float32).at[slot].set(
        rows, mode="drop", unique_indices=True)
    _, _, wz8, l8 = _split_dims(dims)

    def trans(i, acc):
        t6 = (table + i.astype(jnp.float32) * 1e-9).reshape(
            wx, wy, wz8, 8, q_cap, 4)
        raster = jnp.transpose(t6, (0, 5, 4, 3, 1, 2)).reshape(
            wx, 4 * q_cap, 8, l8)
        return acc + raster[32, 0, 0, 0]
    t_trans = tloop(trans, 3, 23)

    def build_full(i, acc):
        Ti = Tw.at[0, 3].add(1e-4 * i.astype(jnp.float32))
        r, d = build_terms_raster(pts_a, mask_a, Ti, origin_w,
                                  map_spec.leaf, dims, q_cap)
        return acc + r[32, 0, 0, 0] + d.astype(jnp.float32)
    t_build = tloop(build_full, 3, 23)

    def build_coarse(i, acc):
        Ti = Tw.at[0, 3].add(1e-4 * i.astype(jnp.float32))
        r, d = build_terms_raster(pts_a, mask_a, Ti, corigin_w,
                                  cspec.leaf, (64, 64, 16), q_cap)
        return acc + r[32, 0, 0, 0] + d.astype(jnp.float32)
    t_cbuild = tloop(build_coarse, 3, 23)

    print(f"fine raster build {t_build*1e3:.2f} ms = cells {t_cells*1e3:.2f}"
          f" + sort {t_sort*1e3:.2f} + rank {t_rank*1e3:.2f}"
          f" + scatter {t_scat*1e3:.2f} + transpose {t_trans*1e3:.2f}")
    print(f"coarse raster build {t_cbuild*1e3:.2f} ms")

    raster, _ = build_terms_raster(pts_a, mask_a, Tw, origin_w,
                                   map_spec.leaf, dims, q_cap)
    craster, _ = build_terms_raster(pts_a, mask_a, Tw, corigin_w,
                                    cspec.leaf, (64, 64, 16), q_cap)

    def terms_f(i, acc):
        Ti = Tw.at[0, 3].add(1e-6 * i.astype(jnp.float32))
        H, b, c, m = ndt_terms_raster(raster, field.planes, Ti,
                                      jnp.float32(4.0), 1.0, dims, q_cap)
        return acc + c + H[0, 0] * 1e-9
    t_terms = tloop(terms_f, 10, 110)

    def terms_c(i, acc):
        Ti = Tw.at[0, 3].add(1e-6 * i.astype(jnp.float32))
        H, b, c, m = ndt_terms_raster(craster, cfield.planes, Ti,
                                      jnp.float32(4.0), 4.0, (64, 64, 16),
                                      q_cap)
        return acc + c + H[0, 0] * 1e-9
    t_cterms = tloop(terms_c, 10, 110)
    print(f"terms pass: fine {t_terms*1e3:.3f} ms, coarse "
          f"{t_cterms*1e3:.3f} ms")


if __name__ == "__main__":
    main()
