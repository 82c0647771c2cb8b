"""Per-op cost of the fused pair-ICP kernel at config1 shapes."""
import sys
sys.path.insert(0, ".")
import numpy as np
from tpu_slam.utils.tpu_env import ensure_tpu_compile_env
ensure_tpu_compile_env()
import jax, jax.numpy as jnp
from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.icp_terms import icp_terms_raster
from tpu_slam.kernels.ndt_terms import build_terms_raster
from tpu_slam.utils.devtime import slope_time

print(f"devices: {jax.devices()}", flush=True)
world = syn.default_office()
T0 = np.eye(4); T0[:3, 3] = [0, 0, 1.5]
pts, valid = syn.simulate_vlp16_revolution(world, T0, n_azimuth=512)
tgt = PointCloud.from_points_host(pts[valid], capacity=8192)
xi = jnp.array([0.15, -0.1, 0.05, 0.02, -0.02, 0.04], jnp.float32)
src = tgt.transform(se3.inverse(se3.exp(xi)))
origin = jnp.asarray([-8.0, -8.0, -4.0], jnp.float32)
eye = jnp.eye(4, dtype=jnp.float32)

for dims, qs in [((32, 32, 16), 8), ((16, 32, 16), 8), ((32, 32, 16), 4)]:
    tr, _ = build_terms_raster(tgt.points, tgt.mask, eye, origin, 0.5,
                               dims, qs)
    sr, _ = build_terms_raster(src.points, src.mask, eye, origin, 0.5,
                               dims, qs)
    jax.block_until_ready(tr)

    @jax.jit
    def pass_loop(K):
        def body(i, carry):
            acc, t = carry
            Ti = eye.at[0, 3].add(1e-6 * i.astype(jnp.float32) + t * 1e-12)
            H, b, err, nm, w = icp_terms_raster(sr, tr, Ti, 1.5, 0.5,
                                                dims, qs, qs)
            return (acc + err + H[0, 0] * 1e-9, t + w * 1e-12)
        acc, t = jax.lax.fori_loop(0, K, body,
                                   (jnp.float32(0), jnp.float32(0)))
        return acc + t

    t_pass = slope_time(pass_loop, 10, 110)

    @jax.jit
    def build_loop(K):
        def body(i, carry):
            acc, t = carry
            Ti = eye.at[0, 3].add(1e-4 * i.astype(jnp.float32) + t * 1e-12)
            r, d = build_terms_raster(src.points, src.mask, Ti, origin,
                                      0.5, dims, qs)
            return (acc + r[1, 0, 0, 0] + d.astype(jnp.float32),
                    t + r[0, 0, 0, 0] * 1e-12 + 0.001)
        acc, t = jax.lax.fori_loop(0, K, body,
                                   (jnp.float32(0), jnp.float32(0)))
        return acc + t

    t_build = slope_time(build_loop, 5, 55)
    print(f"dims={dims} q={qs}: pass={t_pass*1e3:.3f} ms, "
          f"build={t_build*1e3:.3f} ms", flush=True)
