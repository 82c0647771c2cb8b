import math

import jax.numpy as jnp
import numpy as np

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.ingest.deskew import (deskew_cloud, interpolate_pose,
                                    vlp16_time_fractions)
from tpu_slam.kernels.voxel_hash import VoxelGridSpec
from tpu_slam.mapping.occupancy import (empty_occupancy, occupancy_update,
                                        occupancy_probability, query_occupancy,
                                        ray_evidence)


def test_interpolate_pose_endpoints_and_midpoint():
    T0 = jnp.eye(4)
    xi = jnp.array([1.0, 0.5, 0.0, 0.0, 0.0, 0.6], jnp.float32)
    T1 = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(interpolate_pose(T0, T1,
                                                           jnp.float32(0.0))),
                               np.eye(4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(interpolate_pose(T0, T1,
                                                           jnp.float32(1.0))),
                               np.asarray(T1), atol=1e-5)
    mid = interpolate_pose(T0, T1, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(mid @ mid),
                               np.asarray(T1), atol=1e-5)


def test_deskew_recovers_static_geometry():
    """Simulate a VLP-16 sweep while the base moves; deskewed points must
    match a static capture from the sweep-end pose."""
    world = syn.default_office()
    T_start = syn.se2_pose(0.0, 0.0, 0.0, z=1.2)
    T_end = syn.se2_pose(0.4, 0.1, 0.08, z=1.2)
    xi = np.asarray(se3.log(jnp.asarray(
        np.linalg.inv(T_start) @ T_end, jnp.float32)))

    n_az = 360
    dirs = syn.vlp16_directions(n_az)          # ordered by azimuth
    az = np.arctan2(dirs[:, 1], dirs[:, 0]) % (2 * np.pi)
    frac = az / (2 * np.pi)

    # capture each point from the interpolated pose at its time fraction
    pts = np.zeros((dirs.shape[0], 3), np.float32)
    valid = np.zeros(dirs.shape[0], bool)
    for chunk in range(36):                     # batch by azimuth block
        sel = slice(chunk * 160, (chunk + 1) * 160)
        a = float(np.median(frac[sel]))
        T_a = np.asarray(T_start @ np.asarray(
            se3.exp(jnp.asarray(a * xi, jnp.float32))))
        dw = dirs[sel] @ T_a[:3, :3].T
        o = np.broadcast_to(T_a[:3, 3], dw.shape)
        r = world.raycast(o, dw)
        v = np.isfinite(r)
        pts[sel] = (dirs[sel] * np.where(v, r, 0.0)[:, None]).astype(np.float32)
        valid[sel] = v
        frac[sel] = a

    cloud = PointCloud(points=jnp.asarray(pts), mask=jnp.asarray(valid))
    fixed = deskew_cloud(cloud, jnp.asarray(frac, jnp.float32),
                         jnp.asarray(T_start, jnp.float32),
                         jnp.asarray(T_end, jnp.float32))

    # correctness criterion: mapped through the sweep-end pose, deskewed
    # points must sit ON the world surfaces; raw (distorted) points
    # treated as if captured at T_end are off-surface
    def surface_dist(body_pts):
        w = body_pts[valid] @ T_end[:3, :3].T + T_end[:3, 3]
        o, u, v, nrm = world._arrays()
        d = np.abs(np.einsum("nkd,kd->nk", w[:, None, :] - o[None], nrm))
        return np.median(d.min(axis=1))

    err_deskew = surface_dist(np.asarray(fixed.points))
    err_raw = surface_dist(pts)
    assert err_deskew < 0.05 * err_raw, (err_deskew, err_raw)
    assert err_deskew < 2e-3, err_deskew


def test_vlp16_time_fractions():
    dirs = syn.vlp16_directions(8)
    frac = np.asarray(vlp16_time_fractions(jnp.asarray(
        dirs.astype(np.float32))))
    assert frac.min() >= 0 and frac.max() < 1
    # azimuth 0 block first, monotone by azimuth block
    assert frac[0] < frac[-1]


def test_occupancy_hits_and_freespace():
    spec = VoxelGridSpec.centered(leaf=0.25, half_extent=8.0)
    origin = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    # a wall of endpoints at x = 4
    ys = np.linspace(-2, 2, 50)
    pts = np.stack([np.full(50, 4.0), ys, np.full(50, 1.0)], 1).astype(
        np.float32)
    cloud = PointCloud.from_points(jnp.asarray(pts), capacity=64)

    keys, delta = ray_evidence(origin, cloud, spec, n_steps=64)
    grid = occupancy_update(empty_occupancy(8192), keys, delta)

    # endpoint voxels occupied
    lo_hit = query_occupancy(grid, jnp.asarray(pts), spec)
    assert float(jnp.min(lo_hit)) > 0

    # free space along the ray is negative
    mid = np.stack([np.full(50, 2.0), 0.5 * ys, np.full(50, 1.0)], 1)
    lo_free = query_occupancy(grid, jnp.asarray(mid, jnp.float32), spec)
    assert float(jnp.max(lo_free)) < 0

    # unknown region is exactly 0
    unk = jnp.asarray([[0.0, 0.0, 6.0]], jnp.float32)
    assert float(query_occupancy(grid, unk, spec)[0]) == 0.0

    assert float(jnp.max(occupancy_probability(grid))) <= 1.0


def test_occupancy_accumulates_and_clamps():
    spec = VoxelGridSpec.centered(leaf=0.25, half_extent=8.0)
    origin = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    pts = jnp.asarray([[3.0, 0.0, 1.0]], jnp.float32)
    cloud = PointCloud.from_points(pts, capacity=8)
    grid = empty_occupancy(1024)
    for _ in range(20):
        keys, delta = ray_evidence(origin, cloud, spec, n_steps=64)
        grid = occupancy_update(grid, keys, delta)
    lo = query_occupancy(grid, pts, spec)
    assert float(lo[0]) <= 6.0 + 1e-6   # clamped at max_log


def test_dynamic_object_evicted_from_map():
    """Occupancy in the pipeline (VERDICT r1 next #8): an object present in
    early scans then removed is evicted from the NDT map by free-space
    evidence, while static structure stays."""
    import dataclasses

    from tpu_slam.pipeline.config import OdometryConfig
    from tpu_slam.pipeline.odometry import LidarOdometry
    from tpu_slam.registration.ndt import NDTParams
    from tpu_slam.mapping.voxel_map import voxel_means
    from tpu_slam.kernels.voxel_hash import INVALID_KEY

    box_lo = np.array([1.5, -0.8, 0.0])
    box_hi = np.array([2.6, 0.8, 1.4])
    world_with = syn.make_room(size=(12.0, 9.0, 3.0),
                               boxes=[(box_lo, box_hi)])
    world_without = syn.make_room(size=(12.0, 9.0, 3.0))

    T = np.eye(4); T[:3, 3] = [-2.0, 0.0, 1.3]
    rng = np.random.default_rng(0)

    def scan(world):
        pts, valid = syn.simulate_vlp16_revolution(
            world, T, n_azimuth=360, noise_std=0.005, rng=rng)
        return PointCloud.from_points(jnp.asarray(pts[valid]),
                                      capacity=8192)

    cfg = OdometryConfig(
        scan_capacity=4096, downsample_leaf=0.25, map_leaf=0.4,
        map_half_extent=8.0, map_capacity=16384,
        ndt=NDTParams(max_iterations=15),
        use_occupancy=True, occupancy_capacity=32768,
        occupancy_steps=64, occupancy_max_range=15.0,
        occupancy_evict_below=-1.0,
        min_insert_fraction=0.0)
    odo = LidarOdometry(cfg)
    state = odo.init_state(jnp.asarray(T, jnp.float32))

    for _ in range(2):
        state, _ = odo.step(state, scan(world_with))

    def box_voxels(vmap):
        means = np.asarray(voxel_means(vmap, cfg.map_spec()))
        occ = np.asarray(vmap.keys) != int(INVALID_KEY)
        inside = ((means > box_lo - 0.2) & (means < box_hi + 0.2)).all(1)
        return int(np.sum(occ & inside)), int(np.sum(occ))

    n_box_before, n_total_before = box_voxels(state.vmap)
    assert n_box_before > 10          # the object is in the map

    # object gone: rays see through it. Crossing the eviction threshold
    # takes ceil((2 * 0.85 + 1.0) / 0.4) = 7 miss scans of evidence
    for _ in range(10):
        state, m = odo.step(state, scan(world_without))
        assert m.matched_fraction > 0.5   # registration survives eviction

    n_box_after, n_total_after = box_voxels(state.vmap)
    assert n_box_after < 0.2 * n_box_before, (n_box_before, n_box_after)
    # static structure (walls/floor) survives
    assert n_total_after > 0.6 * n_total_before


def test_dynamic_object_evicted_from_dense_engine():
    """Dense-engine dynamic removal (r4 verdict weak #5): the moment
    window gets free-space evidence via grid_occupancy_update — an object
    present in early scans then removed is cleared from the registration
    map while static structure stays."""
    from tpu_slam.pipeline.config import OdometryConfig
    from tpu_slam.pipeline.odometry_dense import DenseLidarOdometry
    from tpu_slam.registration.ndt import NDTParams

    box_lo = np.array([1.5, -0.8, 0.0])
    box_hi = np.array([2.6, 0.8, 1.4])
    world_with = syn.make_room(size=(12.0, 9.0, 3.0),
                               boxes=[(box_lo, box_hi)])
    world_without = syn.make_room(size=(12.0, 9.0, 3.0))

    T = np.eye(4)
    T[:3, 3] = [-2.0, 0.0, 1.3]
    rng = np.random.default_rng(0)

    def scan(world):
        pts, valid = syn.simulate_vlp16_revolution(
            world, T, n_azimuth=360, noise_std=0.005, rng=rng)
        return PointCloud.from_points(jnp.asarray(pts[valid]),
                                      capacity=8192)

    cfg = OdometryConfig(
        scan_capacity=4096, downsample_leaf=0.25, map_leaf=0.4,
        map_half_extent=8.0, map_capacity=16384,
        ndt=NDTParams(max_iterations=15, window_dims=(32, 32, 16),
                      terms_impl="pallas_interpret"),
        pyramid_factor=2,
        use_occupancy=True, occupancy_steps=64, occupancy_max_range=15.0,
        occupancy_evict_below=-1.0, min_insert_fraction=0.0)
    odo = DenseLidarOdometry(cfg)
    state = odo.init_state(scan(world_with), jnp.asarray(T, jnp.float32))
    state = odo.step(state, scan(world_with))

    spec = cfg.map_spec()

    def box_cells(grid):
        import numpy as _np
        wx, wy, wz = grid.dims
        rows = _np.asarray(grid.rows)
        occ = rows[:, 0] > 0
        idx = _np.arange(rows.shape[0])
        cc = _np.stack([idx // (wy * wz), (idx // wz) % wy, idx % wz], 1)
        origin_w = (_np.asarray(spec.origin)
                    + _np.asarray(grid.origin_cell) * spec.leaf)
        centers = origin_w + (cc + 0.5) * spec.leaf
        inside = ((centers > box_lo - 0.2) & (centers < box_hi + 0.2)).all(1)
        return int(_np.sum(occ & inside)), int(_np.sum(occ))

    n_box_before, n_total_before = box_cells(state.grid)
    assert n_box_before > 10

    for _ in range(10):
        state = odo.step(state, scan(world_without))

    n_box_after, n_total_after = box_cells(state.grid)
    # a few silhouette cells survive — rays graze them without passing
    # through (free-space sampling stops one leaf short of endpoints)
    assert n_box_after <= 0.3 * n_box_before, (n_box_before, n_box_after)
    assert n_total_after > 0.6 * n_total_before
