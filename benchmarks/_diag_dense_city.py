"""Per-scan + per-stage diagnosis of the dense engine on the city workload."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from tpu_slam.utils.tpu_env import ensure_tpu_compile_env

ensure_tpu_compile_env()

import jax
import jax.numpy as jnp

from bench import _city_scans
from tpu_slam.pipeline.config import OdometryConfig
from tpu_slam.pipeline.odometry_dense import DenseLidarOdometry
from tpu_slam.registration.ndt import NDTParams

n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 12
print(f"devices: {jax.devices()}", flush=True)
t0 = time.perf_counter()
_, clouds, gt = _city_scans(n_poses)
print(f"scan gen: {time.perf_counter()-t0:.1f}s", flush=True)

cfg = OdometryConfig(
    scan_capacity=32768, downsample_leaf=0.3,
    map_leaf=0.5, map_half_extent=128.0, map_capacity=262144,
    scan_max_range=45.0, insert_downsampled=True,
    ndt=NDTParams(max_iterations=10, coarse_iterations=2,
                  tolerance=3e-4, min_voxel_count=3.0,
                  window_dims=(192, 192, 32)),
    pyramid_factor=4, max_pred_translation=2.0)
odo = DenseLidarOdometry(cfg)
st = odo.init_state(clouds[0], jnp.asarray(gt[0], jnp.float32))
jax.block_until_ready(st.grid.rows)
print(f"grid occ cells after scan0: {int(jnp.sum(st.grid.rows[:,0]>0))}",
      flush=True)
for k in range(1, n_poses):
    t0 = time.perf_counter()
    st = odo.step(st, clouds[k])
    jax.block_until_ready(st.pose)
    wall = time.perf_counter() - t0
    m = np.asarray(st.last_metrics)
    err = np.asarray(st.pose[:3, 3]) - gt[k][:3, 3]
    print(f"scan {k:3d}: err={np.linalg.norm(err):7.3f} "
          f"({err[0]:+7.3f} {err[1]:+7.3f} {err[2]:+7.3f}) "
          f"frac={m[1]:.3f} cfrac={m[4]:.3f} iters={m[0]:3.0f} "
          f"acc={m[2]:.0f} ins={m[3]:.0f} wall={wall*1e3:7.1f} ms "
          f"oc={np.asarray(st.grid.origin_cell)}", flush=True)
