import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam.core import se3
from tpu_slam.ingest import sick_cola as sc
from tpu_slam.ingest.aggregator import AggregatorConfig, ScanAggregator
from tpu_slam.ingest.dataset import DatasetReader, DatasetWriter, ScanRecord
from tpu_slam.ingest.frames import (Calibration, FrameChain, SensorModel,
                                    encoder_ticks_to_angle)
from tpu_slam.ingest import synthetic as syn


# ---------------------------------------------------------------------------
# SICK CoLa telegrams
# ---------------------------------------------------------------------------

def test_telegram_roundtrip_and_scaling():
    ranges_mm = np.array([1000, 2500, 30000, 0, 65534], np.uint32)
    rssi = np.array([10, 20, 30, 40, 50], np.uint32)
    raw = sc.format_telegram(ranges_mm, rssi=rssi, scale_factor=2.0,
                             start_angle_deg=-45.0, ang_step_deg=0.5)
    frames, rem = sc.extract_frames(raw + b"partial")
    assert len(frames) == 1 and rem == b""

    tg = sc.parse_telegram(frames[0])
    assert tg.command == "LMDscandata"
    assert len(tg.dist_channels) == 1 and len(tg.rssi_channels) == 1
    assert tg.dist_channels[0].scale_factor == 2.0
    np.testing.assert_array_equal(tg.dist_channels[0].data, ranges_mm)

    scan = sc.telegram_to_laser_scan(tg, start_angle_deg=-45.0)
    # range scaling: 0.001 * scale_factor (lms_poller.cpp:84-92)
    np.testing.assert_allclose(scan.ranges,
                               0.002 * ranges_mm.astype(np.float32))
    assert scan.angle_min == pytest.approx(math.radians(-45))
    assert scan.angle_max == pytest.approx(math.radians(45))
    assert scan.angle_increment == pytest.approx(math.radians(0.5), rel=1e-4)


def test_telegram_inversion():
    ranges_mm = np.array([100, 200, 300], np.uint32)
    raw = sc.format_telegram(ranges_mm)
    tg = sc.parse_telegram(sc.extract_frames(raw)[0][0])
    scan = sc.telegram_to_laser_scan(tg, invert=True)
    np.testing.assert_allclose(scan.ranges, [0.3, 0.2, 0.1])


def test_frame_resync_partial_stream():
    raw = sc.format_telegram(np.array([500], np.uint32))
    noisy = b"garbage" + raw + raw[:10]
    frames, rem = sc.extract_frames(noisy)
    assert len(frames) == 1
    assert rem == raw[:10]


def test_laser_scan_to_points():
    scan = sc.LaserScan(angle_min=0.0, angle_max=math.pi / 2,
                        angle_increment=math.pi / 2, range_min=0, range_max=10,
                        ranges=np.array([2.0, 3.0], np.float32),
                        intensities=np.array([100.0, 200.0], np.float32))
    pts, inten = sc.laser_scan_to_points(scan)
    np.testing.assert_allclose(pts, [[2, 0, 0], [0, 3, 0]], atol=1e-6)
    np.testing.assert_allclose(inten, [1.0, 2.0])  # 0.01 scaling


# ---------------------------------------------------------------------------
# Frame chain
# ---------------------------------------------------------------------------

def test_encoder_angle_model():
    # angle = -2*pi*(ticks mod res)/res (driverLib.cpp:202-217)
    res = 4 * 2500
    assert float(encoder_ticks_to_angle(jnp.int32(0), res)) == 0.0
    assert float(encoder_ticks_to_angle(jnp.int32(res // 2), res)) == \
        pytest.approx(-math.pi)
    assert float(encoder_ticks_to_angle(jnp.int32(res + res // 4), res)) == \
        pytest.approx(-math.pi / 2)


def test_calibration_persistence_roundtrip(tmp_path):
    path = str(tmp_path / "m3d_calibration.yaml")
    # load creates identity file when absent (transformBroadcaster.py:25-41)
    c = Calibration.load(path)
    assert c.translation == (0, 0, 0)
    c2 = Calibration(translation=(0.01, -0.02, 0.003),
                     orientation_xyzw=(0, 0, 0.1, 0.995))
    c2.save(path)
    c3 = Calibration.load(path)
    assert c3.translation == c2.translation
    # on-disk format is the reference's [[t],[q]] JSON
    import json
    with open(path) as f:
        m = json.load(f)
    assert m == [list(c2.translation), list(c2.orientation_xyzw)]


def test_frame_chain_batched():
    chain = FrameChain(sensor=SensorModel.by_name("LMS100"),
                       encoder_offset=math.pi)
    angles = jnp.linspace(0.0, 2 * math.pi, 8)
    Ts = chain.base_from_laser(angles)
    assert Ts.shape == (8, 4, 4)
    # rigid: R orthonormal
    R = Ts[0, :3, :3]
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    # rotating the encoder changes the pose
    assert not np.allclose(np.asarray(Ts[0]), np.asarray(Ts[3]), atol=1e-3)


# ---------------------------------------------------------------------------
# Synthetic world
# ---------------------------------------------------------------------------

def test_raycast_room_ranges():
    world = syn.make_room(size=(10.0, 8.0, 3.0))
    origins = np.array([[0.0, 0.0, 1.5]] * 3)
    dirs = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    r = world.raycast(origins, dirs)
    np.testing.assert_allclose(r, [5.0, 4.0, 1.5], atol=1e-6)


def test_simulate_line_scan_hits():
    world = syn.make_room()
    T = np.eye(4)
    T[2, 3] = 1.5
    pts, valid = syn.simulate_line_scan(world, T, n_beams=181, fov_deg=180)
    assert valid.mean() > 0.9
    r = np.linalg.norm(pts[valid], axis=1)
    assert r.max() < 10.0 and r.min() > 1.0


# ---------------------------------------------------------------------------
# Aggregator
# ---------------------------------------------------------------------------

def _capture(n_lines=60, sweep=1.3 * math.pi):
    world = syn.default_office()
    chain = FrameChain(sensor=SensorModel.by_name("LMS100"),
                       encoder_offset=math.pi)
    T_base = syn.se2_pose(0.0, 0.0, 0.0, z=0.5)
    return syn.simulate_rotating_capture(
        world, chain, T_base, n_lines=n_lines, sweep_rad=sweep,
        n_beams=121, fov_deg=180), T_base, world


def test_aggregator_angular_trigger_and_progress():
    cap, _, _ = _capture()
    cfg = AggregatorConfig(capacity=16384, line_length=121)
    agg = ScanAggregator(cfg)
    state = agg.init_state()

    became_ready_at = None
    for i in range(cap.line_points.shape[0]):
        state = agg.add_line(state, jnp.asarray(cap.line_points[i]),
                             jnp.asarray(cap.line_valid[i]),
                             jnp.asarray(cap.line_transforms[i]))
        if became_ready_at is None and bool(agg.ready(state)):
            became_ready_at = i
    # sweep=1.3pi over 60 lines; threshold 1.1pi -> ready near line 51
    assert became_ready_at is not None
    expected = int(60 * 1.1 / 1.3)
    assert abs(became_ready_at - expected) <= 2
    assert float(agg.progress(state)) >= 100.0

    cloud, state2 = agg.emit(state)
    assert int(cloud.count()) > 1000
    # emitted state is re-armed (auto_rearm) and empty
    assert int(state2.write_idx) == 0
    assert float(agg.progress(state2)) == 0.0


def test_aggregator_exclusion_box():
    cap, _, _ = _capture(n_lines=40)
    big_box = AggregatorConfig(capacity=16384, line_length=121,
                               bb_x_up=3.0, bb_x_down=-3.0,
                               bb_y_up=3.0, bb_y_down=-3.0,
                               bb_z_up=3.0, bb_z_down=-3.0)
    small_box = AggregatorConfig(capacity=16384, line_length=121)
    n_pts = {}
    for name, cfg in [("big", big_box), ("small", small_box)]:
        agg = ScanAggregator(cfg)
        state = agg.init_state()
        for i in range(cap.line_points.shape[0]):
            state = agg.add_line(state, jnp.asarray(cap.line_points[i]),
                                 jnp.asarray(cap.line_valid[i]),
                                 jnp.asarray(cap.line_transforms[i]))
        n_pts[name] = int(jnp.sum(state.mask))
        # no kept point may lie inside the exclusion box
        pts = np.asarray(state.points)[np.asarray(state.mask)]
        inside = ((pts[:, 0] <= cfg.bb_x_up) & (pts[:, 0] >= cfg.bb_x_down)
                  & (pts[:, 1] <= cfg.bb_y_up) & (pts[:, 1] >= cfg.bb_y_down)
                  & (pts[:, 2] <= cfg.bb_z_up) & (pts[:, 2] >= cfg.bb_z_down))
        assert not inside.any()
    assert n_pts["big"] < n_pts["small"]


def test_aggregator_disarmed_drops_points():
    cap, _, _ = _capture(n_lines=10)
    agg = ScanAggregator(AggregatorConfig(capacity=4096, line_length=121))
    state = agg.init_state(armed=False)
    for i in range(10):
        state = agg.add_line(state, jnp.asarray(cap.line_points[i]),
                             jnp.asarray(cap.line_valid[i]),
                             jnp.asarray(cap.line_transforms[i]))
    assert int(jnp.sum(state.mask)) == 0
    assert float(agg.progress(state)) == -1.0
    # request re-arms
    state = agg.request(state)
    assert bool(state.creating)


def test_aggregated_cloud_geometry():
    """Aggregated points must land on the simulated world surfaces."""
    cap, T_base, world = _capture(n_lines=80)
    agg = ScanAggregator(AggregatorConfig(capacity=32768, line_length=121))
    state = agg.init_state()
    for i in range(cap.line_points.shape[0]):
        state = agg.add_line(state, jnp.asarray(cap.line_points[i]),
                             jnp.asarray(cap.line_valid[i]),
                             jnp.asarray(cap.line_transforms[i]))
    pts_base = np.asarray(state.points)[np.asarray(state.mask)]
    # transform to world, then verify each point sits on some patch plane
    pts_w = pts_base @ T_base[:3, :3].T + T_base[:3, 3]
    o, u, v, n = world._arrays()
    # distance of each point to each patch plane
    dists = np.abs(np.einsum("nkd,kd->nk", pts_w[:, None, :] - o[None], n))
    assert np.median(dists.min(axis=1)) < 1e-3


# ---------------------------------------------------------------------------
# Dataset replay
# ---------------------------------------------------------------------------

def test_dataset_roundtrip(tmp_path):
    root = str(tmp_path / "seq")
    w = DatasetWriter(root, meta={"sensor": "LMS100"})
    rng = np.random.default_rng(0)
    for i in range(3):
        pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        w.append(ScanRecord(points=pts, mask=np.ones(100, bool),
                            intensity=rng.uniform(0, 1, 100).astype(np.float32),
                            stamp=float(i), gt_pose=np.eye(4)))
    r = DatasetReader(root)
    assert len(r) == 3
    rec = r[1]
    assert rec.points.shape == (100, 3)
    assert rec.gt_pose is not None
    assert r.gt_poses().shape == (3, 4, 4)
    assert r.meta["sensor"] == "LMS100"
