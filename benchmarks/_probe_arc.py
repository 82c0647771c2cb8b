"""Isolate the arc-turn registration failure on the city workload.

Builds the window grid from scans 0-1 at GT poses, then:
  * evaluates the fine/coarse NDT cost at the TRUE scan-2 pose, at the
    CV-predicted init, and at the 'stay at scan 1' alias;
  * runs the full coarse+fine register from each init and reports where
    it lands.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from tpu_slam.utils.tpu_env import ensure_tpu_compile_env

ensure_tpu_compile_env()

import dataclasses

import jax
import jax.numpy as jnp

from bench import _city_scans
from tpu_slam.core import se3
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.kernels.ndt_terms import build_terms_raster, ndt_terms_raster
from tpu_slam.kernels.voxel_hash import VoxelGridSpec
from tpu_slam.mapping.dense_map import (centered_origin_cell, empty_grid,
                                        grid_coarsen, grid_insert,
                                        grid_ndt_field)
from tpu_slam.mapping.voxel_map import coarse_spec_of
from tpu_slam.pipeline.config import OdometryConfig
from tpu_slam.registration.ndt import NDTParams, ndt_register

print(f"devices: {jax.devices()}", flush=True)
_, clouds, gt = _city_scans(5)

spec = VoxelGridSpec.centered(leaf=0.5, half_extent=128.0)
cspec = coarse_spec_of(spec, 4)
dims = (160, 160, 32)
fparams = NDTParams(max_iterations=12, coarse_iterations=3,
                    window_dims=dims)
cparams = dataclasses.replace(
    fparams, max_iterations=6, coarse_iterations=2,
    max_corr_dist=fparams.max_corr_dist * 4, raster_q=8,
    yaw_candidates=5, yaw_span=0.3,
    window_dims=(40, 40, 8))

T0 = jnp.asarray(gt[0], jnp.float32)
T1 = jnp.asarray(gt[1], jnp.float32)
T2 = jnp.asarray(gt[2], jnp.float32)

c0 = centered_origin_cell(T1[:3, 3], spec, dims, align=4)
grid = empty_grid(dims, c0)
grid = grid_insert(grid, clouds[0].transform(T0), spec)
grid = grid_insert(grid, clouds[1].transform(T1), spec)
print("grid occ:", int(jnp.sum(grid.rows[:, 0] > 0)), flush=True)

field = grid_ndt_field(grid, spec)
cgrid = grid_coarsen(grid, spec, 4)
cfield = grid_ndt_field(cgrid, cspec)

scan_spec = VoxelGridSpec.centered(leaf=0.3, half_extent=128.0)
scan = voxel_downsample(clouds[2], scan_spec, capacity=32768)
cscan_spec = VoxelGridSpec.centered(leaf=1.0, half_extent=128.0)
cscan = voxel_downsample(clouds[2], cscan_spec, capacity=8192)
n_pts = float(jnp.sum(scan.mask))


def eval_cost(T, fld, sp, params, sc):
    c0_ = fld.origin_cell
    origin_w = (jnp.asarray(sp.origin, jnp.float32)
                + c0_.astype(jnp.float32) * sp.leaf)
    r, nd = build_terms_raster(sc.points, sc.mask, T, origin_w, sp.leaf,
                               fld.window_dims, params.raster_q)
    H, b, cost, m = ndt_terms_raster(r, fld.planes, T, jnp.float32(
        params.score_temperature), params.max_corr_dist, fld.window_dims,
        params.raster_q)
    nsc = float(jnp.sum(sc.mask))
    return float(cost), float(m) / nsc, int(nd)


# candidate poses
delta_true = np.asarray(se3.log(se3.inverse(T1) @ T2))
print("true delta xi:", np.round(delta_true, 3), flush=True)
pred = T1.at[:3, 3].add((T2[:3, 3] - T1[:3, 3]) * 0.44)  # ~CV-clamped init
cands = {"true": T2, "cv_init": pred, "stay": T1}
for name, T in cands.items():
    cf, mf, ndf = eval_cost(T, field, spec, fparams, scan)
    cc, mc, ndc = eval_cost(T, cfield, cspec, cparams, cscan)
    print(f"{name:8s}: fine cost={cf:10.1f} frac={mf:.3f} drop={ndf:6d} | "
          f"coarse cost={cc:10.1f} frac={mc:.3f} drop={ndc}", flush=True)

for name, T in cands.items():
    rc = ndt_register(cscan, cfield, cspec, init_T=T, params=cparams)
    rf = ndt_register(scan, field, spec, init_T=rc.T, params=fparams)
    err = se3.log(se3.inverse(T2) @ rf.T)
    errc = se3.log(se3.inverse(T2) @ rc.T)
    print(f"from {name:8s}: coarse err |t|={float(jnp.linalg.norm(errc[:3])):.3f} "
          f"|r|={float(jnp.linalg.norm(errc[3:])):.3f} -> "
          f"final err |t|={float(jnp.linalg.norm(err[:3])):.3f} "
          f"|r|={float(jnp.linalg.norm(err[3:])):.3f} frac={float(rf.matched_fraction):.3f} "
          f"iters={int(rf.iterations)}", flush=True)
