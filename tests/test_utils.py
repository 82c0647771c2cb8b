import json
import logging

import jax.numpy as jnp
import numpy as np

from tpu_slam.utils.logging import JsonFormatter, get_logger, log_fields
from tpu_slam.utils.tracing import KernelTimer, time_jitted


def test_time_jitted_measures():
    import jax

    f = jax.jit(lambda x: (x @ x.T).sum())
    x = jnp.ones((64, 64))
    stats = time_jitted(f, x, reps=5, warmup=1)
    assert stats["mean_ms"] > 0
    assert stats["min_ms"] <= stats["p50_ms"] <= stats["mean_ms"] * 5


def test_kernel_timer_accumulates():
    t = KernelTimer(sync=False)
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    t.reset()
    assert t.summary() == {}


def test_json_logging(capsys):
    logger = get_logger("tpu_slam.test_json", level="DEBUG", json_lines=True)
    log_fields(logger, logging.INFO, "scan done", scan_index=3, ate=0.01)
    err = capsys.readouterr().err.strip().splitlines()[-1]
    rec = json.loads(err)
    assert rec["msg"] == "scan done"
    assert rec["scan_index"] == 3
    assert rec["level"] == "INFO"


def test_determinism_same_input_same_map():
    """Deterministic reductions: identical inputs -> bitwise identical maps."""
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.mapping.voxel_map import empty_map, insert_cloud

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (3000, 3)).astype(np.float32)
    cloud = PointCloud.from_points(jnp.asarray(pts), capacity=4096)
    spec = VoxelGridSpec.centered(leaf=0.3, half_extent=8.0)

    m1 = insert_cloud(empty_map(8192), cloud, spec, 0.0)
    m2 = insert_cloud(empty_map(8192), cloud, spec, 0.0)
    np.testing.assert_array_equal(np.asarray(m1.keys), np.asarray(m2.keys))
    np.testing.assert_array_equal(np.asarray(m1.sum_pts),
                                  np.asarray(m2.sum_pts))
    np.testing.assert_array_equal(np.asarray(m1.sum_outer),
                                  np.asarray(m2.sum_outer))
