"""Per-scan diagnostic for the config2 city odometry accuracy collapse.

Runs the exact bench config2 workload through the host odometry loop and
prints, per scan: position error vs ground truth, per-axis error, matched
fraction, iterations, predicted-vs-registered delta, and whether the
insert happened — the instrumentation VERDICT.md round-3 item 1 asks for.

Usage: python benchmarks/_diag_config2.py [n_scans] [--jit]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    use_jit = "--jit" in sys.argv

    from tpu_slam.utils.tpu_env import ensure_tpu_compile_env
    ensure_tpu_compile_env()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _city_scans
    from tpu_slam.pipeline.config import OdometryConfig
    from tpu_slam.pipeline.metrics import ate_rmse
    from tpu_slam.pipeline.odometry import LidarOdometry
    from tpu_slam.registration.ndt import NDTParams

    print(f"devices: {jax.devices()}", flush=True)
    _, clouds, gt = _city_scans(n_poses)
    cfg = OdometryConfig(
        scan_capacity=32768, downsample_leaf=0.3,
        map_leaf=0.5, map_half_extent=128.0, map_capacity=262144,
        ndt=NDTParams(max_iterations=12, coarse_iterations=2,
                      window_dims=(128, 128, 32)),
        pyramid_factor=4)

    if use_jit:
        import dataclasses as dc

        from tpu_slam.pipeline.odometry_jit import JitLidarOdometry
        jodo = JitLidarOdometry(dc.replace(cfg, pyramid_factor=0))
        st = jodo.init_state(clouds[0], jnp.asarray(gt[0], jnp.float32))
        for k, c in enumerate(clouds[1:], start=1):
            st = jodo.step(st, c)
            pos = np.asarray(st.pose[:3, 3])
            err = pos - gt[k][:3, 3]
            m = np.asarray(st.last_metrics)
            print(f"scan {k:3d}: err={np.linalg.norm(err):7.3f} m "
                  f"({err[0]:+7.3f} {err[1]:+7.3f} {err[2]:+7.3f}) "
                  f"iters={m[0]:4.0f} frac={m[1]:.3f} "
                  f"acc={m[2]:.0f} ins={m[3]:.0f}", flush=True)
        return

    odo = LidarOdometry(cfg)
    state = odo.init_state(jnp.asarray(gt[0], jnp.float32))
    poses = []
    t0 = time.perf_counter()
    for k, c in enumerate(clouds):
        state, m = odo.step(state, c)
        pos = np.asarray(state.pose[:3, 3])
        err = pos - gt[k][:3, 3]
        poses.append(np.asarray(state.pose))
        print(f"scan {k:3d}: err={np.linalg.norm(err):7.3f} m "
              f"({err[0]:+7.3f} {err[1]:+7.3f} {err[2]:+7.3f}) "
              f"frac={m.matched_fraction:.3f} iters={m.iterations:3d} "
              f"dt={m.translation_delta:.3f} dr={m.rotation_delta:.3f} "
              f"wall={m.wall_time_s*1e3:6.1f} ms", flush=True)
    dt = time.perf_counter() - t0
    ate = ate_rmse(np.stack(poses), gt, align=False)
    print(f"ATE={ate:.3f} m, {n_poses/dt:.2f} scans/s", flush=True)


if __name__ == "__main__":
    main()
