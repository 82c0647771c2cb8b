"""Determinism by construction (SURVEY.md §5 race-detection row).

The engine's reductions are sorted segment-sums with fixed order — no
atomics-equivalent nondeterminism anywhere (SURVEY.md §7.3). This is the
sanitizer-analog check: the SAME inputs through the SAME compiled graphs
must produce BIT-IDENTICAL trajectories, twice in-process.
"""

import math

import jax.numpy as jnp
import numpy as np

from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.pipeline.config import OdometryConfig
from tpu_slam.pipeline.odometry import LidarOdometry
from tpu_slam.registration.ndt import NDTParams


def _scans(n=5):
    world = syn.default_office()
    rng = np.random.default_rng(3)
    clouds, gt = [], []
    for k in range(n):
        T = syn.se2_pose(0.2 * k - 0.4, 0.1 * k, 0.05 * k, z=1.2)
        pts, valid = syn.simulate_vlp16_revolution(
            world, T, n_azimuth=240, noise_std=0.01, rng=rng)
        clouds.append(PointCloud.from_points_host(pts[valid], capacity=8192))
        gt.append(T)
    return clouds, np.stack(gt)


def test_odometry_bit_identical_across_runs():
    clouds, gt = _scans()
    cfg = OdometryConfig(scan_capacity=4096, downsample_leaf=0.3,
                         map_leaf=0.5, map_half_extent=16.0,
                         map_capacity=16384,
                         ndt=NDTParams(max_iterations=10))

    def run():
        odo = LidarOdometry(cfg)
        poses, _ = odo.run(clouds, init_pose=jnp.asarray(gt[0], jnp.float32))
        return poses

    a = run()
    b = run()
    # BIT-identical, not approximately equal: any nondeterministic
    # reduction order would show up here
    assert np.array_equal(a, b), np.abs(a - b).max()
    np.testing.assert_array_equal(a.view(np.uint8), b.view(np.uint8))
