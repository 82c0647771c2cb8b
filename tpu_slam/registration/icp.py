"""Point-to-point and point-to-plane ICP as jit-compiled Gauss-Newton on SE(3).

TPU-native replacement for the reference SLAM core's CUDA ICP iteration
kernels (BASELINE.json north_star). Design:

  * the whole solve is one jit program: `lax.while_loop` over GN iterations,
    each iteration = NN correspondence (Pallas brute force or grid-hash) +
    masked residual/Jacobian build + a 6x6 normal-equation reduction;
  * the reduction J^T J / J^T r is a single einsum over the point axis —
    a large batched matmul XLA fuses with the residual computation;
  * no dynamic shapes anywhere: rejected correspondences get weight 0.

Left-multiplicative convention: the update is T <- exp(xi) @ T and the
point Jacobian of exp(xi) @ p is [I | -hat(p)].
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.kernels.nn_search import nearest_neighbors
from tpu_slam.registration.robust import huber_weight


@dataclasses.dataclass(frozen=True)
class ICPParams:
    """Static ICP configuration (hashable -> usable as a jit static arg)."""

    max_iterations: int = 30
    tolerance: float = 1e-4          # stop when ||xi|| drops below this
    max_corr_dist: float = 1.0       # reject correspondences farther than this
    huber_delta: float = 0.5         # robust kernel width (meters)
    point_to_plane: bool = False
    damping: float = 1e-6            # Levenberg-style diagonal damping
    nn_impl: str = "auto"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ICPResult:
    T: jax.Array                 # (4, 4) source -> target transform
    iterations: jax.Array        # int32, GN iterations executed
    error: jax.Array             # mean squared residual over inliers
    matched_fraction: jax.Array  # inliers / valid source points
    converged: jax.Array         # bool


def _gn_step_point_to_point(src_w, tgt_pts, weights):
    """Build H (6,6), b (6,) for r_i = p_i - q_i with J_i = [I | -hat(p_i)].

    With J = [I, -P] (P = hat(p)), the normal equations have closed form:
      H = [[ sum w I      ,  -sum w P      ],
           [ sum w P^T... ]]  — we just build J explicitly per point and
    einsum; at N ~ 1e4-1e5 this is one fused batched matmul on the MXU.
    """
    n = src_w.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src_w.dtype), (n, 3, 3))
    phat = jax.vmap(se3.hat)(src_w)                       # (N, 3, 3)
    J = jnp.concatenate([eye, -phat], axis=2)             # (N, 3, 6)
    r = src_w - tgt_pts                                   # (N, 3)
    w = weights[:, None, None]
    H = jnp.einsum("nij,nik->jk", J * w, J)
    b = jnp.einsum("nij,ni->j", J * w, r)
    err = jnp.sum(weights * jnp.sum(r * r, axis=-1))
    return H, b, err


def _gn_step_point_to_plane(src_w, tgt_pts, tgt_normals, weights):
    """H, b for scalar residuals r_i = n_i . (p_i - q_i), J_i = n_i^T [I | -hat(p)]."""
    phat = jax.vmap(se3.hat)(src_w)                       # (N, 3, 3)
    Jr = -jnp.einsum("ni,nij->nj", tgt_normals, phat)     # (N, 3) rotational part
    J = jnp.concatenate([tgt_normals, Jr], axis=1)        # (N, 6)
    r = jnp.sum(tgt_normals * (src_w - tgt_pts), axis=-1)  # (N,)
    w = weights
    H = jnp.einsum("ni,nj->ij", J * w[:, None], J)
    b = jnp.sum(J * (w * r)[:, None], axis=0)
    err = jnp.sum(w * r * r)
    return H, b, err


@functools.partial(jax.jit, static_argnames=("params",))
def icp(source: PointCloud, target: PointCloud,
        init_T: Optional[jax.Array] = None,
        params: ICPParams = ICPParams(),
        target_normals: Optional[jax.Array] = None) -> ICPResult:
    """Register ``source`` onto ``target``; returns T with T@source ~= target.

    Correspondences are recomputed every iteration via brute-force NN
    (kernels.nn_search). For point-to-plane, pass per-target-point normals.
    """
    if init_T is None:
        init_T = jnp.eye(4, dtype=source.points.dtype)
    if params.point_to_plane and target_normals is None:
        raise ValueError("point_to_plane ICP requires target_normals")

    tgt_pts = target.sanitize().points
    src = source.sanitize()
    n_valid = jnp.maximum(jnp.sum(src.mask.astype(jnp.float32)), 1.0)

    def cond(state):
        T, it, dx, err, frac = state
        return jnp.logical_and(it < params.max_iterations,
                               dx > params.tolerance)

    def body(state):
        T, it, dx, _, _ = state
        src_w = se3.apply(T, src.points)
        idx, dist = nearest_neighbors(src_w, tgt_pts, impl=params.nn_impl)
        matched = jnp.take(tgt_pts, idx, axis=0)
        inlier = jnp.logical_and(src.mask, dist < params.max_corr_dist)
        w = inlier.astype(src_w.dtype) * huber_weight(dist, params.huber_delta)

        if params.point_to_plane:
            nrm = jnp.take(target_normals, idx, axis=0)
            H, b, err = _gn_step_point_to_plane(src_w, matched, nrm, w)
        else:
            H, b, err = _gn_step_point_to_point(src_w, matched, w)

        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        H = H + params.damping * jnp.trace(H) / 6.0 * jnp.eye(6, dtype=H.dtype)
        xi = -jnp.linalg.solve(H, b)
        # Guard against singular systems (too few inliers).
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        T_new = se3.retract(T, xi)
        frac = jnp.sum(inlier.astype(jnp.float32)) / n_valid
        return (T_new, it + 1, jnp.linalg.norm(xi), err / wsum, frac)

    init = (init_T, jnp.int32(0), jnp.float32(jnp.inf), jnp.float32(jnp.inf),
            jnp.float32(0.0))
    T, iters, dx, err, frac = jax.lax.while_loop(cond, body, init)
    return ICPResult(T=T, iterations=iters, error=err,
                     matched_fraction=frac,
                     converged=dx <= params.tolerance)
