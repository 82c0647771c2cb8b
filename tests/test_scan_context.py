"""Scan-context place recognition (graph/scan_context.py)."""

import math

import jax.numpy as jnp
import numpy as np

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.graph.scan_context import (ScanContextParams,
                                         propose_sc_candidates, ring_key,
                                         scan_context, sc_distance)
from tpu_slam.ingest import synthetic as syn


def _cloud_at(world, T, n_azimuth=360, capacity=8192, rng=None):
    pts, valid = syn.simulate_vlp16_revolution(
        world, T, n_azimuth=n_azimuth,
        noise_std=0.01 if rng is not None else 0.0, rng=rng)
    return PointCloud.from_points(jnp.asarray(pts[valid]), capacity=capacity)


def test_descriptor_rotation_invariance_and_discrimination():
    world = syn.default_office()
    rng = np.random.default_rng(0)
    T_a = syn.se2_pose(1.0, 0.5, 0.3, z=1.2)
    T_a_rot = syn.se2_pose(1.0, 0.5, 0.3 + 2.1, z=1.2)   # same place, turned
    T_b = syn.se2_pose(-3.5, -2.0, 1.0, z=1.2)           # different place

    params = ScanContextParams(max_range=20.0)
    d_a = scan_context(_cloud_at(world, T_a, rng=rng), params)
    d_a2 = scan_context(_cloud_at(world, T_a_rot, rng=rng), params)
    d_b = scan_context(_cloud_at(world, T_b, rng=rng), params)

    db = jnp.stack([d_a2, d_b])
    dist = np.asarray(sc_distance(d_a, db))
    assert dist[0] < 0.1, dist          # same place, any heading
    assert dist[1] > dist[0] + 0.05     # different place scores worse
    # ring key is rotation-invariant by construction
    np.testing.assert_allclose(np.asarray(ring_key(d_a)),
                               np.asarray(ring_key(d_a2)), atol=0.12)


def test_propose_candidates_finds_drifted_revisit():
    """The appearance channel proposes the revisit even when the pose
    estimate has drifted far beyond any proximity gate."""
    world = syn.default_office()
    rng = np.random.default_rng(1)
    params = ScanContextParams(max_range=20.0)

    # 30 keyframes around a circle; frame 29 is physically back at frame 0
    descs = []
    n = 30
    for k in range(n):
        a = 2 * math.pi * k / (n - 1)
        T = syn.se2_pose(2.5 * math.cos(a), 2.5 * math.sin(a),
                         a + math.pi / 2, z=1.2)
        descs.append(scan_context(_cloud_at(world, T, rng=rng), params))
    db = jnp.stack(descs)

    ci, cj = propose_sc_candidates(db[n - 1], db, n - 1, n,
                                   max_distance=0.25, min_index_gap=8,
                                   top_k=3)
    assert ci.size > 0
    assert 0 in ci or 1 in ci           # the true revisit is proposed


def test_slam_closes_loop_without_proximity_gate():
    """Pipeline integration: with the proximity gate disabled
    (max_distance=0) scan context alone still finds and closes the loop."""
    import dataclasses

    from tests.test_pipeline import _sequence, _slam_cfg
    from tpu_slam.pipeline.metrics import ate_rmse
    from tpu_slam.pipeline.slam import SLAMSystem

    clouds, gt = _sequence(n_poses=40, radius=2.5, n_azimuth=240,
                           arc_fraction=1.0)
    cfg = _slam_cfg()
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(
            cfg.loop, max_distance=0.0, use_scan_context=True,
            sc_max_distance=0.25,
            sc=ScanContextParams(max_range=20.0)))
    slam = SLAMSystem(cfg)
    poses, state = slam.run(clouds, init_pose=jnp.asarray(gt[0], jnp.float32))
    assert state.n_loop_closures > 0     # found purely by appearance
    ate = ate_rmse(poses, gt, align=False)
    assert ate < 0.12, ate
