"""CLI end-to-end: make_dataset / pcap_convert -> run_odometry / run_slam /
run_calibration drive the real entry points (the launch-file analog,
SURVEY.md §2.1 #14)."""

import json
import math
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow



def _small_overrides(prefix=""):
    kv = ["scan_capacity=4096", "downsample_leaf=0.3",
          "map_half_extent=16.0", "map_capacity=16384",
          "ndt.max_iterations=15"]
    out = []
    for item in kv:
        out += ["--set", prefix + item]
    return out


@pytest.fixture(scope="module")
def pcap_dataset(tmp_path_factory):
    from tpu_slam.cli.pcap_convert import pcap_to_dataset
    from tpu_slam.ingest import synthetic as syn

    tmp = tmp_path_factory.mktemp("cli")
    world = syn.default_office()
    n = 6
    gt = np.stack([syn.se2_pose(2.5 * math.cos(a), 2.5 * math.sin(a),
                                a + math.pi / 2, z=1.2)
                   for a in [2 * math.pi * 0.2 * k / (n - 1)
                             for k in range(n)]])
    pcap = str(tmp / "seq.pcap")
    syn.synthesize_vlp16_pcap(pcap, world, gt, n_azimuth=360)
    out = str(tmp / "ds")
    assert pcap_to_dataset(pcap, out, gt_poses=gt) == n
    return out


def test_run_odometry_cli(pcap_dataset, tmp_path, capsys):
    from tpu_slam.cli.run_odometry import main

    out = str(tmp_path / "traj.npz")
    main(["--dataset", pcap_dataset, "--out", out, "--json",
          "--input-capacity", "16384"] + _small_overrides())
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_scans"] == 6
    assert rec["ate_rmse_m"] < 0.08, rec
    with np.load(out) as z:
        assert z["poses"].shape == (6, 4, 4)


def test_run_slam_cli_with_checkpoint(pcap_dataset, tmp_path, capsys):
    from tpu_slam.cli.run_slam import main

    ck = str(tmp_path / "ck.npz")
    args = (["--dataset", pcap_dataset, "--json", "--checkpoint", ck,
             "--checkpoint-every", "3", "--input-capacity", "16384",
             "--set", "keyframe_capacity=16",
             "--set", "keyframe_cloud_capacity=2048",
             "--set", "edge_capacity=64"]
            + _small_overrides("odometry."))
    main(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_scans"] == 6
    assert rec["n_keyframes"] >= 1
    assert os.path.exists(ck)

    # resume from the end-of-run checkpoint: a clean no-op continuation
    # that reports the restored state
    main(args + ["--resume"])
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["n_keyframes"] == rec["n_keyframes"]


def test_run_calibration_cli_demo(tmp_path, capsys):
    from tpu_slam.cli.run_calibration import main
    from tpu_slam.ingest.frames import Calibration

    out = str(tmp_path / "m3d_calibration.yaml")
    main(["--demo", "--method", "gradient", "--max-evaluations", "120",
          "--out", out, "--json"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the demo knows its ground truth; the solve must land near it
    got = np.asarray(rec["params5"])
    true = np.asarray(rec["true_params5"])
    assert np.linalg.norm(got[:2] - true[:2]) < 0.02     # ty, tz
    cal = Calibration.load(out)                          # yaml round-trips
    assert len(cal.translation) == 3
