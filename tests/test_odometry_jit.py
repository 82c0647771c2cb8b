import jax.numpy as jnp
import numpy as np

from tests.test_pipeline import ODOM_CFG, _sequence
from tpu_slam.core import se3
from tpu_slam.pipeline.metrics import ate_rmse
from tpu_slam.pipeline.odometry import LidarOdometry
from tpu_slam.pipeline.odometry_jit import JitLidarOdometry


def test_jit_odometry_tracks_like_host_odometry():
    clouds, gt = _sequence(n_poses=8)

    jodo = JitLidarOdometry(ODOM_CFG)
    state = jodo.init_state(clouds[0], jnp.asarray(gt[0], jnp.float32))
    poses = [np.asarray(state.pose)]
    for c in clouds[1:]:
        state = jodo.step(state, c)
        poses.append(np.asarray(state.pose))
    poses = np.stack(poses)
    ate_jit = ate_rmse(poses, gt, align=False)
    assert ate_jit < 0.08, ate_jit

    # metrics carried on-device
    m = np.asarray(state.last_metrics)
    assert m[1] > 0.5          # matched fraction
    assert m[2] == 1.0         # accepted
    assert int(state.scan_index) == 8


def test_jit_odometry_rejects_garbage_scan():
    clouds, gt = _sequence(n_poses=4)
    jodo = JitLidarOdometry(ODOM_CFG)
    state = jodo.init_state(clouds[0], jnp.asarray(gt[0], jnp.float32))
    state = jodo.step(state, clouds[1])
    pose_before = np.asarray(state.pose)
    occ_before = int(state.vmap.n_occupied())

    # a garbage scan far outside the map must be rejected (coast) and
    # must NOT be inserted
    from tpu_slam.core.pointcloud import PointCloud
    rng = np.random.default_rng(0)
    junk = PointCloud.from_points(
        jnp.asarray(rng.uniform(200, 250, (4096, 3)).astype(np.float32)),
        capacity=16384)
    state = jodo.step(state, junk)
    m = np.asarray(state.last_metrics)
    assert m[2] == 0.0 and m[3] == 0.0      # rejected, not inserted
    assert int(state.vmap.n_occupied()) == occ_before
    # pose advanced only by the prediction (no explosion)
    d = np.linalg.norm(np.asarray(state.pose)[:3, 3] - pose_before[:3, 3])
    assert d < 1.0
