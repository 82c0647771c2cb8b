"""Config4 diagnosis: per-scan drift + loop-closure proposal/accept log."""

import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from tpu_slam.utils.tpu_env import ensure_tpu_compile_env

ensure_tpu_compile_env()

import jax
import jax.numpy as jnp

from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.graph import loop_closure as lc
from tpu_slam.graph.loop_closure import LoopClosureParams
from tpu_slam.ingest import synthetic as syn
from tpu_slam.pipeline.config import OdometryConfig, SLAMConfig
from tpu_slam.pipeline.metrics import ate_rmse
from tpu_slam.pipeline.slam import SLAMSystem
from tpu_slam.registration.icp import ICPParams
from tpu_slam.registration.ndt import NDTParams

n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 160
print(f"devices: {jax.devices()}", flush=True)

world = syn.default_office()
rng = np.random.default_rng(0)
clouds, gt = [], []
for k in range(n_poses):
    a = 2 * math.pi * 2.0 * k / (n_poses - 1)
    T = syn.se2_pose(2.5 * math.cos(a), 2.5 * math.sin(a),
                     a + math.pi / 2, z=1.2)
    pts, valid = syn.simulate_vlp16_revolution(
        world, T, n_azimuth=900, noise_std=0.01, rng=rng)
    clouds.append(PointCloud.from_points_host(pts[valid], capacity=16384))
    gt.append(T)
gt = np.stack(gt)
print("scan gen done", flush=True)

# instrument verification
_orig_verify = lc.verify_candidates


def verify_logged(points, mask, poses, ci, cj, params):
    res, accept = _orig_verify(points, mask, poses, ci, cj, params)
    fr = np.asarray(res.matched_fraction)
    er = np.asarray(res.error)
    ac = np.asarray(accept)
    for k in range(len(ci)):
        print(f"  cand ({int(ci[k])},{int(cj[k])}): frac={fr[k]:.3f} "
              f"err={er[k]:.4f} accept={bool(ac[k])}", flush=True)
    return res, accept


lc.verify_candidates = verify_logged
import tpu_slam.pipeline.slam as slam_mod

slam_mod.verify_candidates = verify_logged

cfg = SLAMConfig(
    odometry=OdometryConfig(scan_capacity=8192, downsample_leaf=0.25,
                            map_leaf=0.5, map_half_extent=16.0,
                            map_capacity=32768,
                            insert_downsampled=True,
                            ndt=NDTParams(max_iterations=12,
                                          coarse_iterations=2,
                                          min_voxel_count=3.0,
                                          window_dims=(48, 48, 16)),
                            pyramid_factor=2),
    odometry_engine="dense",
    keyframe_translation=0.19, keyframe_rotation=0.12,
    keyframe_capacity=192,
    keyframe_cloud_capacity=4096, loop_every=4,
    loop=LoopClosureParams(
        max_distance=2.0, min_index_gap=40, max_candidates=4,
        # acceptance gate calibrated to the keyframe cloud resolution:
        # two 0.25 m-downsampled clouds of the same surface match with
        # mean-squared residuals ~(leaf/2)^2..(2 leaf)^2; the old 0.05
        # gate rejected every true revisit (r4 diag: frac 0.73-0.92,
        # err 0.09-0.2, all rejected)
        max_error=0.06, min_matched_fraction=0.85,
        max_correction_t=1.2, max_correction_r=0.4,
        icp=ICPParams(max_iterations=30, tolerance=5e-4,
                      max_corr_dist=1.0, huber_delta=0.3)),
    edge_capacity=1024,
    rebuild_map_after_loop=('--no-rebuild' not in sys.argv))
class LoggedSLAM(SLAMSystem):
    def _close_loops(self, state):
        pre = np.asarray(state.odom.pose)
        out, n = super()._close_loops(state)
        if n:
            post = np.asarray(out.odom.pose)
            d = np.linalg.norm(post[:3, 3] - pre[:3, 3])
            print(f"  LOOP x{n}: pose correction {d:.3f} m", flush=True)
        return out, n


slam = LoggedSLAM(cfg)
st = slam.init_state(jnp.asarray(gt[0], jnp.float32))
poses = []
for k, c in enumerate(clouds):
    st, m = slam.step(st, c)
    p = np.asarray(st.odom.pose)
    poses.append(p)
    err = p[:3, 3] - gt[k][:3, 3]
    print(f"scan {k:3d}: err={np.linalg.norm(err):6.3f} "
          f"({err[0]:+6.3f} {err[1]:+6.3f} {err[2]:+6.3f}) "
          f"frac={m.matched_fraction:.3f} it={m.iterations:3d} "
          f"kf={st.n_keyframes} loops={st.n_loop_closures}", flush=True)
ate = ate_rmse(np.stack(poses), gt, align=False)
print(f"ATE={ate:.3f} m, kf={st.n_keyframes}, loops={st.n_loop_closures}",
      flush=True)
