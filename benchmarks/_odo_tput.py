import time
import numpy as np, jax, jax.numpy as jnp
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.pipeline.config import OdometryConfig
from tpu_slam.pipeline.odometry_jit import JitLidarOdometry
from tpu_slam.registration.ndt import NDTParams

# default-style config (100 m map) — the general case
cfg = OdometryConfig(scan_capacity=8192,
                     ndt=NDTParams(max_iterations=20, coarse_iterations=8))
odo = JitLidarOdometry(cfg)
world = syn.default_office()
rng = np.random.default_rng(0)
# pre-simulate scans on host (sim excluded from timing)
scans = []
gt = []
for k in range(24):
    ang = 0.03 * k
    Tk = np.eye(4); Tk[:3, 3] = [1.5*np.sin(ang*2), 1.2*np.sin(ang), 1.5]
    c, s = np.cos(ang), np.sin(ang)
    Tk[:2, :2] = [[c, -s], [s, c]]
    gt.append(Tk)
    p, v = syn.simulate_vlp16_revolution(world, Tk, n_azimuth=540, noise_std=0.01, rng=rng)
    scans.append(PointCloud.from_points(jnp.asarray(p[v]), capacity=16384))

state = odo.init_state(scans[0], jnp.asarray(gt[0], jnp.float32))
state = odo.step(state, scans[1])   # compile
jax.block_until_ready(state.pose)
t0 = time.perf_counter()
for k in range(2, 24):
    state = odo.step(state, scans[k])
jax.block_until_ready(state.pose)
dt = time.perf_counter() - t0
err = np.linalg.norm(np.asarray(state.pose)[:3,3] - gt[23][:3,3])
print("odometry (100m map, jit step): %.1f scans/s, final err %.3f m" % (22/dt, err))

# per-step sync measurement
state2 = odo.init_state(scans[0], jnp.asarray(gt[0], jnp.float32))
ts = []
for k in range(1, 24):
    t = time.perf_counter()
    state2 = odo.step(state2, scans[k])
    jax.block_until_ready(state2.pose)
    ts.append(time.perf_counter() - t)
ts = np.array(ts[2:]) * 1e3
print("per-step: median %.2f ms  p90 %.2f ms -> %.1f scans/s" % (
    np.median(ts), np.quantile(ts, 0.9), 1000/np.median(ts)))
print("metrics last:", np.asarray(state2.last_metrics))
