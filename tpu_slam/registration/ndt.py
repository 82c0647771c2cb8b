"""NDT (normal-distributions transform) scan-to-map registration.

TPU-native replacement for the reference core's CUDA NDT voxel matching
(SURVEY.md §2.2). Point-to-distribution NDT: each map voxel holds a Gaussian
(mapping.voxel_map moments); each source point is scored against the best
cell in its 3x3x3 neighborhood; the pose is solved by Gauss-Newton on SE(3)
with per-point 3x3 information matrices:

    r_i = p_i - mu(cell_i)            J_i = [I | -hat(p_i)]
    H  = sum J_i^T Lambda_i J_i       b  = sum J_i^T Lambda_i r_i

All correspondence work is gathers over the sorted voxel list (binary
search + 27-neighbor probe, the grid-decomposition pattern of the CUDA
original) and the reduction is one einsum — MXU-friendly, no dynamic shapes,
`lax.while_loop` outer iterations.

Eigenvalue flooring follows standard NDT conditioning (Magnusson 2009):
covariance eigenvalues are clamped below at ``evec_floor_ratio`` times the
largest, keeping Lambda finite on planar/degenerate voxels.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.kernels.voxel_hash import (
    INVALID_KEY,
    VoxelGridSpec,
    neighbor_offsets_keys,
    pack_key,
    cell_coords,
)
from tpu_slam.mapping.voxel_map import (
    VoxelMap,
    voxel_covariances,
    voxel_means,
)
from tpu_slam.registration.robust import huber_weight


@dataclasses.dataclass(frozen=True)
class NDTParams:
    """Static NDT solve configuration."""

    max_iterations: int = 30
    tolerance: float = 1e-4
    min_voxel_count: float = 5.0
    evec_floor_ratio: float = 0.01   # eigenvalue floor vs largest (Magnusson)
    max_corr_dist: float = 1.0       # Euclidean gate on |p - mu| (meters)
    huber_mahalanobis: float = 3.0   # robust width on sqrt(d2) — soft gate;
                                     # a hard chi^2 gate rejects the very
                                     # matches that pull in a displaced init
                                     # (thin planar Gaussians), so NDT uses
                                     # IRLS downweighting instead
    damping: float = 1e-6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NDTField:
    """Solver-ready view of a voxel map: Gaussians with information matrices.

    Built once per map update (ndt_prepare), reused across solves — the
    analog of the CUDA core precomputing voxel stats before ICP/NDT iters.
    """

    keys: jax.Array      # (C,) int32 sorted
    means: jax.Array     # (C, 3) world frame
    info: jax.Array      # (C, 3, 3) Lambda = Sigma^-1 (eigen-floored)
    valid: jax.Array     # (C,) bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NDTResult:
    T: jax.Array
    iterations: jax.Array
    score: jax.Array            # mean exp(-0.5 d2) over matched points
    matched_fraction: jax.Array
    converged: jax.Array


def ndt_field(vmap: VoxelMap, spec: VoxelGridSpec,
              params: NDTParams = NDTParams()) -> NDTField:
    """Build the solver-ready NDT field from a voxel map."""
    means = voxel_means(vmap, spec)
    cov = voxel_covariances(vmap, min_count=params.min_voxel_count,
                            regularization=0.0)
    evals, evecs = jnp.linalg.eigh(cov)
    floor = params.evec_floor_ratio * jnp.maximum(evals[:, 2:3], 1e-9)
    evals_f = jnp.maximum(evals, floor)
    inv_evals = 1.0 / evals_f
    info = jnp.einsum("cij,cj,ckj->cik", evecs, inv_evals, evecs)
    valid = vmap.occupied_mask() & (vmap.count >= params.min_voxel_count)
    return NDTField(keys=vmap.keys, means=means, info=info, valid=valid)


def _ndt_correspond(pts: jax.Array, field: NDTField, spec: VoxelGridSpec):
    """Best Gaussian in each point's 27-neighborhood by Mahalanobis distance.

    Returns (mu (N,3), Lambda (N,3,3), matched (N,) bool, d2 (N,)).
    """
    n = pts.shape[0]
    c = field.keys.shape[0]
    qkeys = pack_key(cell_coords(pts, spec), spec)
    nkeys = neighbor_offsets_keys(qkeys, spec)                # (N, 27)
    pos = jnp.clip(jnp.searchsorted(field.keys, nkeys), 0, c - 1)
    hit = (jnp.take(field.keys, pos) == nkeys) & (nkeys != INVALID_KEY)
    ok = hit & jnp.take(field.valid, pos)
    slots_c = pos
    mus = jnp.take(field.means, slots_c, axis=0)              # (N, 27, 3)
    lams = jnp.take(field.info, slots_c, axis=0)              # (N, 27, 3, 3)
    d = pts[:, None, :] - mus
    d2 = jnp.einsum("nki,nkij,nkj->nk", d, lams, d)
    d2 = jnp.where(ok, d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, best.reshape(n, 1, *([1] * (a.ndim - 2))), axis=1).squeeze(1)
    mu = take(mus)
    lam = take(lams)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    matched = jnp.isfinite(best_d2)
    return mu, lam, matched, best_d2


@functools.partial(jax.jit, static_argnames=("spec", "params"))
def ndt_register(source: PointCloud, field: NDTField, spec: VoxelGridSpec,
                 init_T: Optional[jax.Array] = None,
                 params: NDTParams = NDTParams()) -> NDTResult:
    """Register a source cloud against an NDT field (scan-to-map)."""
    if init_T is None:
        init_T = jnp.eye(4, dtype=source.points.dtype)
    src = source.sanitize()
    n_valid = jnp.maximum(jnp.sum(src.mask.astype(jnp.float32)), 1.0)

    def cond(state):
        _, it, dx, _, _ = state
        return jnp.logical_and(it < params.max_iterations,
                               dx > params.tolerance)

    def body(state):
        T, it, _, _, _ = state
        pts = se3.apply(T, src.points)
        mu, lam, matched, d2 = _ndt_correspond(pts, field, spec)
        r = pts - mu                                          # (N, 3)
        de2 = jnp.sum(r * r, axis=-1)
        gate = matched & src.mask & (de2 < params.max_corr_dist ** 2)
        d2s = jnp.where(gate, d2, 0.0)
        w = gate.astype(pts.dtype) * huber_weight(
            jnp.sqrt(jnp.maximum(d2s, 1e-12)), params.huber_mahalanobis)

        phat = jax.vmap(se3.hat)(pts)                         # (N, 3, 3)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype),
                               (pts.shape[0], 3, 3))
        J = jnp.concatenate([eye, -phat], axis=2)             # (N, 3, 6)
        lam_w = lam * w[:, None, None]
        JtL = jnp.einsum("nij,nik->njk", J, lam_w)            # (N, 6, 3)
        H = jnp.einsum("nij,nik->jk", JtL.transpose(0, 2, 1), J)  # (6, 6)
        b = jnp.einsum("nij,nj->i", JtL, r)                   # (6,)

        H = H + params.damping * jnp.trace(H) / 6.0 * jnp.eye(6, dtype=H.dtype)
        xi = -jnp.linalg.solve(H, b)
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        T_new = se3.retract(T, xi)

        score = jnp.sum(w * jnp.exp(-0.5 * jnp.where(gate, d2, 0.0)))
        frac = jnp.sum(w) / n_valid
        score = score / jnp.maximum(jnp.sum(w), 1.0)
        return (T_new, it + 1, jnp.linalg.norm(xi), score, frac)

    init = (init_T, jnp.int32(0), jnp.float32(jnp.inf), jnp.float32(0.0),
            jnp.float32(0.0))
    T, iters, dx, score, frac = jax.lax.while_loop(cond, body, init)
    return NDTResult(T=T, iterations=iters, score=score,
                     matched_fraction=frac, converged=dx <= params.tolerance)
