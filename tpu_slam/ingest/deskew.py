"""Motion compensation (deskew) for scans captured under motion.

The reference's aggregator compensates rotation-unit motion by looking up
a TF per scan line (m3d_aggregator.cpp:261-262 time-interpolated lookup);
the equivalent for free-running sensors (a VLP-16 on a moving base) is
per-point pose interpolation: each point carries a time offset within the
sweep, the pose is interpolated on SE(3) between the sweep-start and
sweep-end poses, and points are mapped into the sweep-end frame.

Interpolation is geodesic: T(a) = T0 @ exp(a * log(T0^-1 T1)) — constant
twist across the sweep, the standard LiDAR odometry assumption. One
vmapped exp over the point axis; jit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud


def interpolate_pose(T0: jax.Array, T1: jax.Array, alpha: jax.Array
                     ) -> jax.Array:
    """Geodesic interpolation on SE(3); alpha in [0, 1] (batched ok)."""
    xi = se3.log(se3.compose(se3.inverse(T0), T1))
    if alpha.ndim == 0:
        return se3.compose(T0, se3.exp(alpha * xi))
    return jax.vmap(lambda a: se3.compose(T0, se3.exp(a * xi)))(alpha)


@jax.jit
def deskew_cloud(cloud: PointCloud, time_frac: jax.Array,
                 T_start: jax.Array, T_end: jax.Array) -> PointCloud:
    """Undistort a cloud into the sweep-END body frame.

    Args:
      cloud: points in the (moving) sensor frame as captured.
      time_frac: (N,) in [0, 1] — each point's normalized capture time
        within the sweep (VLP-16: azimuth / 2pi).
      T_start, T_end: world<-body poses at sweep start and end.

    Returns the cloud expressed in the T_end body frame: points captured
    early are carried forward through the interpolated motion.
    """
    xi = se3.log(se3.compose(se3.inverse(T_start), T_end))
    inv_end = se3.inverse(T_end)

    # per-point matrix: M(a) = inv_end @ T_start @ exp(a xi)
    base = se3.compose(inv_end, T_start)

    def one_fast(p, a):
        M = se3.compose(base, se3.exp(a * xi))
        return se3.apply(M, p[None])[0]

    pts = jax.vmap(one_fast)(cloud.points, time_frac)
    pts = jnp.where(cloud.mask[:, None], pts, cloud.points)
    return PointCloud(points=pts, mask=cloud.mask, attrs=cloud.attrs)


def vlp16_time_fractions(points: jax.Array) -> jax.Array:
    """Azimuth-derived time fraction for one VLP-16 revolution.

    The sensor sweeps azimuth linearly in time; fraction = atan2 angle
    normalized to [0, 1). Works directly on the (N, 3) sensor-frame points.
    """
    az = jnp.arctan2(points[:, 1], points[:, 0])      # [-pi, pi)
    return jnp.mod(az, 2.0 * jnp.pi) / (2.0 * jnp.pi)
