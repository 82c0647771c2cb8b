"""Outdoor-scale scenario (BASELINE config-5 analog): city block, VLP-16,
ring-road trajectory, meter-leaf map, NDT pyramid."""

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
