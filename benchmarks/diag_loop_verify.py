"""Unit-level repro of the config-4 loop-verify bias.

Builds two VLP-16 keyframe clouds of the office world at a true revisit
(same spot, one lap of yaw progress), downsampled exactly like the SLAM
keyframe store, perturbs the init by a config-4-scale drift, and measures
the verified Z's error vs ground truth — plane vs point flavors.
"""

import math
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PAD_COORD, PointCloud
from tpu_slam.graph.loop_closure import LoopClosureParams, verify_candidates
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.registration.icp import ICPParams
from tpu_slam.registration.normals import estimate_normals


def kf_cloud(world, T, rng, cap=4096, leaf=0.25):
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    pts, valid = syn.simulate_vlp16_revolution(
        world, T, n_azimuth=900, noise_std=0.01, rng=rng)
    c = PointCloud.from_points_host(pts[valid], capacity=16384)
    spec = VoxelGridSpec.centered(leaf=leaf, half_extent=16.0)
    ds = voxel_downsample(c, spec, capacity=cap)
    return ds


def main():
    world = syn.default_office()
    rng = np.random.default_rng(0)
    # config-4 trajectory: circle radius 2.5, two laps over 160 scans
    n_poses = 160

    def pose(k):
        a = 2 * math.pi * 2.0 * k / (n_poses - 1)
        return syn.se2_pose(2.5 * math.cos(a), 2.5 * math.sin(a),
                            a + math.pi / 2, z=1.2)

    # pair geometries: same-spot revisit, near (1.5 m), mid (2.5 m),
    # far-alias (4.6 m — the sc-channel failure mode)
    cases = [("same-spot", 0, 79), ("near-1.5m", 0, 73),
             ("mid-2.5m", 0, 70), ("alias-4.6m", 12, 61)]
    for name, i_scan, j_scan in cases:
        Ti_gt = pose(i_scan).astype(np.float32)
        Tj_gt = pose(j_scan).astype(np.float32)
        ci = kf_cloud(world, Ti_gt, rng)
        cj = kf_cloud(world, Tj_gt, rng)
        sep = np.linalg.norm((np.linalg.inv(Ti_gt) @ Tj_gt)[:3, 3])

        pts = jnp.stack([ci.points, cj.points])
        msk = jnp.stack([ci.mask, cj.mask])
        nrm = jnp.stack([estimate_normals(ci.points, ci.mask),
                         estimate_normals(cj.points, cj.mask)])
        Zgt = np.linalg.inv(Ti_gt) @ Tj_gt

        for drift_t, drift_r in [(0.3, 0.05), (0.9, 0.15)]:
            xi = np.zeros(6, np.float32)
            xi[:2] = drift_t / math.sqrt(2)
            xi[5] = drift_r
            Tj_est = np.asarray(se3.retract(jnp.asarray(Tj_gt),
                                            jnp.asarray(xi)))
            poses = jnp.stack([jnp.asarray(Ti_gt), jnp.asarray(Tj_est)])
            p = LoopClosureParams(
                max_error=0.05, min_matched_fraction=0.85,
                max_correction_t=1.5, max_correction_r=0.6,
                plane_verify=True,
                icp=ICPParams(max_iterations=40, tolerance=5e-4,
                              max_corr_dist=2.0, huber_delta=0.3))
            # forward: j onto i; reverse: i onto j
            res_f, acc_f = verify_candidates(
                pts, msk, poses, np.array([0]), np.array([1]), p,
                clouds_normals=nrm)
            res_r, _ = verify_candidates(
                pts, msk, poses, np.array([1]), np.array([0]), p,
                clouds_normals=nrm)
            Zf = np.asarray(res_f.T[0])
            Zr = np.asarray(res_r.T[0])
            cyc = np.asarray(se3.log(jnp.asarray(Zf @ Zr, jnp.float32)))
            d = np.asarray(se3.log(jnp.asarray(
                np.linalg.inv(Zf) @ Zgt, jnp.float32)))
            print(f"{name} (sep {sep:.2f}) drift {drift_t:.1f}m: "
                  f"t_err {np.linalg.norm(d[:3]):.3f} "
                  f"cyc_t {np.linalg.norm(cyc[:3]):.3f} "
                  f"cyc_r {np.linalg.norm(cyc[3:]):.3f} "
                  f"frac {float(res_f.matched_fraction[0]):.3f} "
                  f"err {float(res_f.error[0]):.4f} "
                  f"acc {bool(acc_f[0])}")


if __name__ == "__main__":
    main()
