"""Time-interpolated encoder join (reference: m3d_aggregator.cpp:261-262)."""

import math
import socket
import threading
import time

import numpy as np
import pytest

from tpu_slam.ingest import native as nat
from tpu_slam.ingest import sick_cola as sc
from tpu_slam.ingest.frames import EncoderHistory

TICK = 2.0 * math.pi / 4096.0      # one encoder count (res 4x1024)


def test_encoder_history_interpolates_linear_ramp():
    hist = EncoderHistory()
    w = 1.5                         # rad/s
    ts = np.arange(0.0, 2.0, 0.01) + np.random.default_rng(0).uniform(
        0, 0.002, 200)
    for t in ts:
        # encoder convention: angle in (-2pi, 0], wraps
        a = -(w * t % (2 * math.pi))
        hist.push(t, a)
    q = np.random.default_rng(1).uniform(0.05, 1.95, 100)
    for t in q:
        got = hist.at(float(t))
        want = -w * t               # unwrapped ground truth
        assert abs(got - want) < TICK, (t, got, want)


def test_encoder_history_unwraps_seam():
    hist = EncoderHistory()
    hist.push(0.0, -6.2)
    hist.push(0.1, -0.05)           # wrapped past -2pi -> near 0
    a = hist.at(0.05)
    # unwrapped midpoint: -6.2 -> -6.333.. continuing the rotation
    assert a < -6.2


class _FakeSick(threading.Thread):
    def __init__(self, ranges_m, step_deg, line_period_s=0.004):
        super().__init__(daemon=True)
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.ranges_m = ranges_m
        self.step_deg = step_deg
        self.line_period_s = line_period_s

    def run(self):
        conn, _ = self.srv.accept()
        conn.recv(256)
        for k in range(self.ranges_m.shape[0]):
            mm = np.round(self.ranges_m[k] * 1000).astype(np.uint32)
            conn.sendall(sc.format_telegram(mm, scan_no=k,
                                            start_angle_deg=-135.0,
                                            ang_step_deg=self.step_deg))
            time.sleep(self.line_period_s)
        time.sleep(0.3)
        conn.close()
        self.srv.close()


@pytest.mark.skipif(nat.load() is None, reason="native lib not built")
def test_live_pipeline_interpolated_angles_match_profile():
    """Loopback device + continuous angle profile: every line's angle used
    by the pipeline matches the TRUE profile at that line's timestamp to
    within one encoder tick — the reference's TF-interpolation semantics,
    not sample-at-arrival."""
    from tpu_slam.ingest.aggregator import AggregatorConfig
    from tpu_slam.ingest.frames import FrameChain, SensorModel
    from tpu_slam.pipeline.live import LiveConfig, LivePipeline

    n_beams, n_lines = 91, 60
    ranges = np.full((n_lines, n_beams), 3.0, np.float32)
    dev = _FakeSick(ranges, step_deg=270.0 / (n_beams - 1))
    dev.start()

    w = 2.0                          # rad/s unit rotation
    t0 = time.monotonic()

    def angle_source():
        return -(w * (time.monotonic() - t0) % (2 * math.pi))

    chain = FrameChain(sensor=SensorModel.by_name("LMS100"))
    cfg = LiveConfig(sensor_model="LMS100", start_angle_deg=-135.0,
                     range_min=0.05, line_capacity=1024,
                     aggregator=AggregatorConfig(capacity=65536,
                                                 line_length=1024))
    pipe = LivePipeline(cfg, chain=chain)

    lms = nat.NativeLms(cap=1024)
    try:
        lms.connect("127.0.0.1", dev.port)
        lms.start_scan()
        pipe.run(lms, angle_source=angle_source, max_scans=None,
                 max_lines=n_lines, encoder_rate_hz=500.0)
    finally:
        lms.close()
        dev.join(timeout=5)

    assert len(pipe.line_angles) >= n_lines - 2
    errs = []
    for t_arr, a in pipe.line_angles:
        true = -w * (t_arr - t0)     # truth at the line's stamp
        # circular distance: the history unwraps relative to its first
        # (wrapped) sample, so the revolution count is arbitrary
        d = (a - true) % (2 * math.pi)
        errs.append(min(d, 2 * math.pi - d))
    # interpolation must beat one encoder tick on average and stay within
    # a few ticks worst-case (thread scheduling jitter on a busy box)
    assert float(np.mean(errs)) < TICK, np.mean(errs)
    assert float(np.max(errs)) < 8 * TICK, np.max(errs)
