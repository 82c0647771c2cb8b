"""Outdoor-scale scenario (BASELINE config-5 analog): city block, VLP-16,
ring-road trajectory, meter-leaf map, NDT pyramid."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.voxel_hash import INVALID_KEY, VoxelGridSpec
from tpu_slam.mapping.voxel_map import (coarse_spec_of, coarsen_map,
                                        empty_map, insert_cloud,
                                        voxel_covariances, voxel_means)
from tpu_slam.pipeline.config import OdometryConfig
from tpu_slam.pipeline.odometry import LidarOdometry
from tpu_slam.registration.ndt import NDTParams

pytestmark = pytest.mark.slow



def _city_world():
    world = syn.outdoor_block(seed=1)
    rng = np.random.default_rng(3)
    # street furniture: poles break the axis-aligned wall degeneracy
    for _ in range(25):
        x, y = rng.uniform(-28, 28, 2)
        if 10 < math.hypot(x, y) < 28:
            w = rng.uniform(0.2, 0.5)
            h = rng.uniform(2.0, 5.0)
            world.patches += syn.make_room(size=(w, w, h),
                                           center=(x, y)).patches[2:]
    return world


def _ring_sequence(world, n=30, radius=15.0, step=0.5, seed=0):
    rng = np.random.default_rng(seed)
    clouds, gt = [], []
    for k in range(n):
        a = step * k / radius
        T = syn.se2_pose(radius * math.cos(a), radius * math.sin(a),
                         a + math.pi / 2, z=1.5)
        pts, valid = syn.simulate_vlp16_revolution(
            world, T, n_azimuth=600, max_range=80, noise_std=0.02, rng=rng)
        clouds.append(PointCloud.from_points(jnp.asarray(pts[valid]),
                                             capacity=24576))
        gt.append(T)
    return clouds, np.stack(gt)


OUTDOOR_CFG = OdometryConfig(
    scan_capacity=8192, downsample_leaf=0.4, map_leaf=1.0,
    map_half_extent=80.0, map_capacity=32768,
    ndt=NDTParams(max_iterations=25, max_corr_dist=2.0))


def test_outdoor_odometry_tracks():
    world = _city_world()
    clouds, gt = _ring_sequence(world, n=25, step=0.5)
    odo = LidarOdometry(OUTDOOR_CFG)
    state = odo.init_state(jnp.asarray(gt[0], jnp.float32))
    worst = 0.0
    for k, c in enumerate(clouds):
        state, m = odo.step(state, c)
        xi = np.asarray(se3.log(jnp.asarray(
            np.linalg.inv(gt[k]) @ np.asarray(state.pose), jnp.float32)))
        worst = max(worst, float(np.linalg.norm(xi[:3])))
    assert worst < 0.5, worst


def test_coarsen_map_equals_direct_insertion():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-14, 14, (5000, 3)).astype(np.float32)
    cloud = PointCloud.from_points(jnp.asarray(pts), capacity=8192)
    spec = VoxelGridSpec.centered(leaf=0.5, half_extent=16.0)
    fine = insert_cloud(empty_map(16384), cloud, spec, 0.0)

    coarse = coarsen_map(fine, spec, 4)
    cspec = coarse_spec_of(spec, 4)
    direct = insert_cloud(empty_map(16384), cloud, cspec, 0.0)

    np.testing.assert_array_equal(np.asarray(coarse.keys),
                                  np.asarray(direct.keys))
    occ = np.asarray(coarse.keys) != int(INVALID_KEY)
    np.testing.assert_allclose(np.asarray(voxel_means(coarse, cspec))[occ],
                               np.asarray(voxel_means(direct, cspec))[occ],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(voxel_covariances(coarse))[occ],
                               np.asarray(voxel_covariances(direct))[occ],
                               atol=1e-5)


def test_pyramid_extends_capture_range():
    """At 1.5 m inter-scan motion the fine field alone diverges; the
    pyramid keeps the trajectory bounded."""
    world = _city_world()
    clouds, gt = _ring_sequence(world, n=12, step=1.5)

    results = {}
    for pf in [0, 4]:
        import dataclasses
        cfg = dataclasses.replace(OUTDOOR_CFG, pyramid_factor=pf)
        odo = LidarOdometry(cfg)
        state = odo.init_state(jnp.asarray(gt[0], jnp.float32))
        worst = 0.0
        for k, c in enumerate(clouds):
            state, m = odo.step(state, c)
            xi = np.asarray(se3.log(jnp.asarray(
                np.linalg.inv(gt[k]) @ np.asarray(state.pose), jnp.float32)))
            worst = max(worst, float(np.linalg.norm(xi[:3])))
        results[pf] = worst
    assert results[4] < 0.5 * results[0], results


def test_scrolling_window_outruns_fixed_grid():
    """Unbounded-world odometry: a trajectory that leaves the (small) map
    window entirely stays locked because the window re-centers on the
    sensor (key-shift rebase, no recompiles); the same config with a
    world-fixed grid loses the map once the sensor exits it."""
    import jax.numpy as jnp

    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.pipeline.metrics import ate_rmse
    from tpu_slam.pipeline.odometry import LidarOdometry
    from tpu_slam.registration.ndt import NDTParams

    # a long hall with dense floor-to-ceiling side pillars (a bare
    # corridor is translation-invariant along its axis — nothing can
    # observe x); aperiodic spacing so the coarse pyramid cannot alias
    rng = np.random.default_rng(0)
    boxes = []
    x = -26.0
    k = 0
    while x < 27.0:                     # APERIODIC pillar spacing: a
        w = 1.0 + 0.5 * (k % 3)        # periodic pattern aliases the
        y0, y1 = (2.0, 3.6) if k % 2 == 0 else (-3.6, -1.8)
        boxes.append((np.array([x, y0, 0.0]), np.array([x + w, y1, 3.0])))
        x += 3.0 + 1.7 * (k % 4)       # coarse NDT by whole periods
        k += 1
    world = syn.make_room(size=(64.0, 8.0, 3.0), boxes=boxes)

    clouds, gt = [], []
    # velocity ramp 0 -> 0.5 m/scan: from rest, the constant-velocity
    # prior locks on immediately (a cold start at full speed would have to
    # escape the zero-motion local optimum every corridor has)
    xs = np.concatenate([np.cumsum(np.linspace(0.05, 0.5, 10)),
                         2.75 + 0.5 * np.arange(1, 65)]) - 18.0 - 2.75
    for k in range(len(xs)):
        T = syn.se2_pose(float(xs[k]), 0.0, 0.0, z=1.3)
        pts, valid = syn.simulate_vlp16_revolution(
            world, T, n_azimuth=360, max_range=14.0, noise_std=0.01,
            rng=rng)
        clouds.append(PointCloud.from_points(jnp.asarray(pts[valid]),
                                             capacity=8192))
        gt.append(T)
    gt = np.stack(gt)

    cfg = dataclasses.replace(
        OUTDOOR_CFG, scan_capacity=4096, downsample_leaf=0.3,
        map_leaf=0.4, map_half_extent=12.8, map_capacity=32768,
        ndt=NDTParams(max_iterations=20), pyramid_factor=0,
        scrolling_window=True, rebase_fraction=0.25)

    odo = LidarOdometry(cfg)
    poses, _ = odo.run(clouds, init_pose=jnp.asarray(gt[0], jnp.float32))
    ate = ate_rmse(poses, gt, align=False)
    assert ate < 0.15, ate
    # the window starts centered on the initial pose
    state = odo.init_state(jnp.asarray(gt[0], jnp.float32))
    assert state.map_offset is not None
    assert abs(state.map_offset[0] - gt[0][0, 3]) < cfg.map_leaf

    # control: the world-fixed grid cannot follow (sensor exits the
    # window, registration starves)
    cfg_fixed = dataclasses.replace(cfg, scrolling_window=False)
    odo_f = LidarOdometry(cfg_fixed)
    poses_f, log_f = odo_f.run(clouds,
                               init_pose=jnp.asarray(gt[0], jnp.float32))
    ate_f = ate_rmse(poses_f, gt, align=False)
    assert ate_f > 5.0 * ate, (ate, ate_f)
