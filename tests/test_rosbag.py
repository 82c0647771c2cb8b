"""rosbag V2.0 reader/writer round-trip + bag->dataset conversion.

Parity target: the reference's offline path is ROS-bag replay through the
node graph (universal_velodyne.launch:49,64); here the bag feeds
run_odometry via ingest.dataset with no ROS installed.
"""

import bz2
import struct

import numpy as np
import pytest

from tpu_slam.ingest import rosbag as rb


def _cloud(n, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 3)).astype(np.float32) * 5.0


def test_pointcloud2_roundtrip(tmp_path):
    path = str(tmp_path / "scan.bag")
    pts0 = _cloud(512, 0)
    pts1 = _cloud(300, 1)
    inten = np.arange(300, dtype=np.float32)
    with rb.BagWriter(path) as w:
        w.write("/m3d_test/cloud", "sensor_msgs/PointCloud2",
                rb.serialize_pointcloud2(pts0, 10.0, "m3d_link"), 10.0)
        w.write("/m3d_test/cloud", "sensor_msgs/PointCloud2",
                rb.serialize_pointcloud2(pts1, 13.5, "m3d_link",
                                         intensity=inten), 13.5)

    with rb.BagReader(path) as bag:
        msgs = list(bag)
        assert bag.topics() == {"/m3d_test/cloud":
                                "sensor_msgs/PointCloud2"}
    assert len(msgs) == 2
    pc0 = rb.parse_pointcloud2(msgs[0].raw)
    assert pc0.frame_id == "m3d_link"
    assert abs(pc0.stamp - 10.0) < 1e-6
    xyz, valid = pc0.xyz()
    assert valid.all()
    np.testing.assert_allclose(xyz, pts0, rtol=0, atol=0)
    pc1 = rb.parse_pointcloud2(msgs[1].raw)
    np.testing.assert_allclose(pc1.field_array("intensity"), inten)


def test_nan_points_masked(tmp_path):
    path = str(tmp_path / "nan.bag")
    pts = _cloud(64, 2)
    pts[10] = np.nan
    pts[20, 2] = np.inf
    with rb.BagWriter(path) as w:
        w.write("/c", "sensor_msgs/PointCloud2",
                rb.serialize_pointcloud2(pts, 0.0), 0.0)
    with rb.BagReader(path) as bag:
        (msg,) = list(bag)
    xyz, valid = rb.parse_pointcloud2(msg.raw).xyz()
    assert not valid[10] and not valid[20]
    assert valid.sum() == 62
    assert np.isfinite(xyz).all()


def test_tf_message_roundtrip(tmp_path):
    path = str(tmp_path / "tf.bag")
    tf = rb.TransformStamped(
        stamp=5.0, frame_id="odom", child_frame_id="m3d_link",
        translation=np.array([1.0, 2.0, 0.5]),
        rotation=np.array([0.0, 0.0, np.sin(0.3), np.cos(0.3)]))
    with rb.BagWriter(path) as w:
        w.write("/tf", "tf2_msgs/TFMessage",
                rb.serialize_tf_message([tf]), 5.0)
    with rb.BagReader(path) as bag:
        (msg,) = list(bag)
    (tf2,) = rb.parse_tf_message(msg.raw)
    assert tf2.child_frame_id == "m3d_link"
    T = tf2.matrix()
    assert np.allclose(T[:3, 3], [1.0, 2.0, 0.5])
    # rotation by 0.6 rad about z
    assert np.allclose(T[0, 0], np.cos(0.6), atol=1e-12)
    assert np.allclose(np.linalg.det(T[:3, :3]), 1.0, atol=1e-12)


def test_bz2_chunk(tmp_path):
    """A bz2-compressed chunk decodes identically (rosbag --bz2)."""
    plain = str(tmp_path / "plain.bag")
    pts = _cloud(128, 3)
    with rb.BagWriter(plain) as w:
        w.write("/c", "sensor_msgs/PointCloud2",
                rb.serialize_pointcloud2(pts, 1.0), 1.0)
    raw = open(plain, "rb").read()

    # recompress the single chunk record as bz2 by rewriting the file
    off = len(rb._MAGIC)
    (hlen,) = struct.unpack_from("<I", raw, off)
    bag_hdr = raw[off:off + 4 + hlen]
    off += 4 + hlen
    (dlen,) = struct.unpack_from("<I", raw, off)
    bag_data = raw[off:off + 4 + dlen]
    off += 4 + dlen
    (chlen,) = struct.unpack_from("<I", raw, off)
    chunk_hdr = rb._parse_header(raw[off + 4:off + 4 + chlen])
    off += 4 + chlen
    (cdlen,) = struct.unpack_from("<I", raw, off)
    chunk_data = raw[off + 4:off + 4 + cdlen]

    chunk_hdr[b"compression"] = b"bz2"
    comp = bz2.compress(chunk_data)
    hdr = rb._encode_header(chunk_hdr)
    out = str(tmp_path / "bz2.bag")
    with open(out, "wb") as f:
        f.write(rb._MAGIC + bag_hdr + bag_data)
        f.write(struct.pack("<I", len(hdr)) + hdr)
        f.write(struct.pack("<I", len(comp)) + comp)

    with rb.BagReader(out) as bag:
        (msg,) = list(bag)
    xyz, _ = rb.parse_pointcloud2(msg.raw).xyz()
    np.testing.assert_allclose(xyz, pts)


def test_laserscan_parse():
    body = bytearray()
    body += struct.pack("<I", 0) + struct.pack("<II", 2, 0)
    fid = b"laser"
    body += struct.pack("<I", len(fid)) + fid
    body += struct.pack("<7f", -np.pi / 2, np.pi / 2, np.pi / 2,
                        0.0, 0.025, 0.1, 20.0)
    ranges = np.array([1.0, 2.0, np.inf], np.float32)
    body += struct.pack("<I", 3) + ranges.tobytes()
    body += struct.pack("<I", 0)
    scan = rb.parse_laserscan(bytes(body))
    assert scan.frame_id == "laser"
    pts, valid = scan.xy()
    assert valid.tolist() == [True, True, False]
    # beam 0 at -pi/2: (0, -1); beam 1 at 0: (2, 0)
    np.testing.assert_allclose(pts[0], [0.0, -1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[1], [2.0, 0.0, 0.0], atol=1e-6)


def test_bag_to_dataset_with_gt(tmp_path):
    from tpu_slam.ingest.dataset import DatasetReader

    path = str(tmp_path / "seq.bag")
    clouds = [_cloud(256, k) for k in range(3)]
    with rb.BagWriter(path) as w:
        for k, pts in enumerate(clouds):
            t = 100.0 + k
            tf = rb.TransformStamped(
                stamp=t - 0.01, frame_id="odom", child_frame_id="velodyne",
                translation=np.array([float(k), 0.0, 0.0]),
                rotation=np.array([0.0, 0.0, 0.0, 1.0]))
            w.write("/tf", "tf2_msgs/TFMessage",
                    rb.serialize_tf_message([tf]), t - 0.01)
            w.write("/velodyne_points", "sensor_msgs/PointCloud2",
                    rb.serialize_pointcloud2(pts, t, "velodyne"), t)

    root = rb.bag_to_dataset(path, str(tmp_path / "ds"), gt_frame="odom")
    ds = DatasetReader(root)
    assert len(ds) == 3
    for k, rec in enumerate(ds):
        np.testing.assert_allclose(rec.points, clouds[k])
        assert rec.mask.all()
        assert rec.gt_pose is not None
        assert rec.gt_pose[0, 3] == float(k)
    gt = ds.gt_poses()
    assert gt.shape == (3, 4, 4)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.bag"
    p.write_bytes(b"#ROSBAG V1.2\n junk")
    with pytest.raises(ValueError):
        rb.BagReader(str(p))


def test_run_odometry_from_bag(tmp_path, capsys):
    """End-to-end: synthetic world -> bag -> run_odometry --bag (the
    reference's bag-replay semantics without ROS)."""
    import json
    import math

    from tpu_slam.cli.run_odometry import main
    from tpu_slam.ingest import synthetic as syn

    world = syn.default_office()
    n = 4
    rng = np.random.default_rng(0)
    path = str(tmp_path / "seq.bag")
    with rb.BagWriter(path) as w:
        for k in range(n):
            a = 2 * math.pi * 0.2 * k / (n - 1)
            T = syn.se2_pose(2.5 * math.cos(a), 2.5 * math.sin(a),
                             a + math.pi / 2, z=1.2)
            pts, valid = syn.simulate_vlp16_revolution(
                world, T, n_azimuth=360, noise_std=0.005, rng=rng)
            t = 100.0 + k
            q = np.array([0.0, 0.0, math.sin((a + math.pi / 2) / 2),
                          math.cos((a + math.pi / 2) / 2)])
            tf = rb.TransformStamped(
                stamp=t - 0.01, frame_id="odom", child_frame_id="velodyne",
                translation=T[:3, 3].copy(), rotation=q)
            w.write("/tf", "tf2_msgs/TFMessage",
                    rb.serialize_tf_message([tf]), t - 0.01)
            w.write("/velodyne_points", "sensor_msgs/PointCloud2",
                    rb.serialize_pointcloud2(pts[valid], t, "velodyne"), t)

    main(["--bag", path, "--bag-gt-frame", "odom", "--json",
          "--input-capacity", "8192",
          "--set", "scan_capacity=4096", "--set", "downsample_leaf=0.3",
          "--set", "map_half_extent=16.0", "--set", "map_capacity=16384",
          "--set", "ndt.max_iterations=15"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_scans"] == n
    assert rec["ate_rmse_m"] < 0.1, rec
