"""Run scan-to-map odometry over a recorded sequence."""

from __future__ import annotations

import argparse

import numpy as np

from tpu_slam.cli.common import add_common_args, apply_overrides, emit
from tpu_slam.ingest.dataset import DatasetReader
from tpu_slam.pipeline.config import OdometryConfig
from tpu_slam.pipeline.metrics import ate_rmse, rpe_rmse
from tpu_slam.pipeline.odometry import LidarOdometry


def _clouds_from_dataset(reader, capacity):
    import jax.numpy as jnp
    from tpu_slam.core.pointcloud import PointCloud
    for rec in reader:
        pts = rec.points[rec.mask]
        yield PointCloud.from_points(jnp.asarray(pts), capacity=capacity)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", default=None, help="trajectory output .npz")
    p.add_argument("--input-capacity", type=int, default=32768)
    add_common_args(p)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    cfg = apply_overrides(OdometryConfig(), args.set)
    reader = DatasetReader(args.dataset)
    odo = LidarOdometry(cfg)

    gt = reader.gt_poses()
    init = jnp.asarray(gt[0], jnp.float32) if gt is not None else None
    poses, log = odo.run(_clouds_from_dataset(reader, args.input_capacity),
                         init_pose=init)

    summary = dict(log.summary())
    if gt is not None:
        summary["ate_rmse_m"] = ate_rmse(poses, gt, align=False)
        rpe_t, rpe_r = rpe_rmse(poses, gt)
        summary["rpe_trans_m"] = rpe_t
        summary["rpe_rot_rad"] = rpe_r
    if args.out:
        np.savez_compressed(args.out, poses=poses,
                            metrics=[m.to_json() for m in log.records])
        summary["trajectory"] = args.out
    emit(summary, args.json)


if __name__ == "__main__":
    main()
