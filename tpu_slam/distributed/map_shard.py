"""Spatially-sharded voxel map + distributed NDT registration (TP-analog).

The map is the SLAM engine's "model"; at outdoor scale it outgrows one
chip. Sharding (SURVEY.md §2.3 TP row):

  * voxels are partitioned into **x-slabs** — device d owns cells whose x
    cell-coordinate falls in its contiguous range. Slab sharding keeps each
    device's voxel list sorted and self-contained (packed keys are ordered
    by x first), so per-device insertion is the same merge-sort-reduce as
    the single-chip map;
  * scan insertion: the incoming scan's per-voxel aggregates are computed
    replicated (cheap — one scan), each device filters to its slab and
    merges locally. No all-to-all;
  * NDT registration against the sharded map: H, b, cost are sums over
    (point, Gaussian) pairs, so each device computes the partial over ITS
    Gaussians and one ``psum`` combines them — the LM loop then runs
    replicated. One (6,6)+(6,)+scalars all-reduce per LM iteration rides
    ICI.

Neighborhood moments at slab boundaries use the device-local neighbors
only (an x-boundary voxel sees 18 of its 27 neighbors); a ppermute halo
exchange of boundary planes is the planned refinement.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.kernels.voxel_hash import INVALID_KEY, VoxelGridSpec
from tpu_slam.mapping.voxel_map import (VoxelMap, empty_map,
                                        insert_scan_stats,
                                        neighborhood_moments,
                                        scan_to_voxel_stats, voxel_means,
                                        voxel_covariances)
from tpu_slam.registration.ndt import NDTField, NDTParams, NDTResult, _ndt_terms


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedVoxelMap:
    """Per-device voxel maps stacked on a leading device axis (D, ...)."""

    keys: jax.Array        # (D, C)
    count: jax.Array       # (D, C)
    sum_pts: jax.Array     # (D, C, 3)
    sum_outer: jax.Array   # (D, C, 3, 3)
    stamp: jax.Array       # (D, C)

    @property
    def n_shards(self) -> int:
        return self.keys.shape[0]

    @property
    def shard_capacity(self) -> int:
        return self.keys.shape[1]

    def local(self, d: int) -> VoxelMap:
        return VoxelMap(keys=self.keys[d], count=self.count[d],
                        sum_pts=self.sum_pts[d], sum_outer=self.sum_outer[d],
                        stamp=self.stamp[d])


def empty_sharded_map(n_shards: int, shard_capacity: int) -> ShardedVoxelMap:
    m = empty_map(shard_capacity)
    tile = lambda a: jnp.broadcast_to(a, (n_shards,) + a.shape).copy()
    return ShardedVoxelMap(keys=tile(m.keys), count=tile(m.count),
                           sum_pts=tile(m.sum_pts),
                           sum_outer=tile(m.sum_outer), stamp=tile(m.stamp))


def slab_owner(keys: jax.Array, spec: VoxelGridSpec,
               n_shards: int) -> jax.Array:
    """Device owning each key: contiguous x-slabs of the cell grid."""
    b = spec.dim_bits
    n = spec.cells_per_axis
    ix = (keys >> (2 * b)) & (n - 1)
    cells_per_shard = -(-n // n_shards)
    owner = ix // cells_per_shard
    return jnp.where(keys == INVALID_KEY, -1, owner)


def insert_cloud_sharded(mesh: Mesh, smap: ShardedVoxelMap,
                         cloud: PointCloud, spec: VoxelGridSpec,
                         stamp: float, axis_name: str = "data"
                         ) -> ShardedVoxelMap:
    """Integrate a world-frame cloud into the sharded map."""
    n_shards = mesh.shape[axis_name]
    keys, cnt, ssum, souter = scan_to_voxel_stats(cloud, spec)
    owner = slab_owner(keys, spec, n_shards)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(), P(), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                   P(axis_name)))
    def shard_insert(k_l, c_l, s_l, o_l, st_l, keys_, cnt_, ssum_, souter_):
        d = jax.lax.axis_index(axis_name)
        mine = slab_owner(keys_, spec, n_shards) == d
        k_in = jnp.where(mine, keys_, INVALID_KEY)
        c_in = jnp.where(mine, cnt_, 0.0)
        s_in = jnp.where(mine[:, None], ssum_, 0.0)
        o_in = jnp.where(mine[:, None, None], souter_, 0.0)
        local = VoxelMap(keys=k_l[0], count=c_l[0], sum_pts=s_l[0],
                         sum_outer=o_l[0], stamp=st_l[0])
        merged = insert_scan_stats(local, k_in, c_in, s_in, o_in,
                                   jnp.float32(stamp))
        return (merged.keys[None], merged.count[None],
                merged.sum_pts[None], merged.sum_outer[None],
                merged.stamp[None])

    k, c, s, o, st = shard_insert(smap.keys, smap.count, smap.sum_pts,
                                  smap.sum_outer, smap.stamp,
                                  keys, cnt, ssum, souter)
    return ShardedVoxelMap(keys=k, count=c, sum_pts=s, sum_outer=o, stamp=st)


def _local_field(local: VoxelMap, spec: VoxelGridSpec,
                 params: NDTParams) -> NDTField:
    """Device-local NDT field (same construction as registration.ndt)."""
    if params.use_neighborhood:
        cnt, means, cov = neighborhood_moments(local, spec)
        valid = local.occupied_mask() & (cnt >= params.min_voxel_count)
    else:
        means = voxel_means(local, spec)
        cov = voxel_covariances(local, min_count=params.min_voxel_count,
                                regularization=0.0)
        valid = local.occupied_mask() & (local.count >= params.min_voxel_count)
    evals, evecs = jnp.linalg.eigh(cov)
    floor = params.evec_floor_ratio * jnp.maximum(evals[:, 2:3], 1e-9)
    inv_evals = 1.0 / jnp.maximum(evals, floor)
    info = jnp.einsum("cij,cj,ckj->cik", evecs, inv_evals, evecs)
    return NDTField(keys=local.keys, means=means, info=info, valid=valid)


def ndt_register_sharded(mesh: Mesh, source: PointCloud,
                         smap: ShardedVoxelMap, spec: VoxelGridSpec,
                         init_T: Optional[jax.Array] = None,
                         params: NDTParams = NDTParams(),
                         axis_name: str = "data") -> NDTResult:
    """NDT registration against the sharded map.

    The source cloud is replicated (one scan is small); each device forms
    partial H/b/cost over its slab's Gaussians; psum combines; the LM loop
    runs in lockstep on every device.
    """
    if init_T is None:
        init_T = jnp.eye(4, dtype=source.points.dtype)
    src = source.sanitize()

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()))
    def solve(k_l, c_l, s_l, o_l, st_l, pts, mask, T0):
        local = VoxelMap(keys=k_l[0], count=c_l[0], sum_pts=s_l[0],
                         sum_outer=o_l[0], stamp=st_l[0])
        field = _local_field(local, spec, params)
        cloud = PointCloud(points=pts, mask=mask)

        def terms(T, gamma):
            H, b, cost, frac = _ndt_terms(cloud, T, field, spec, params,
                                          gamma)
            H = jax.lax.psum(H, axis_name)
            b = jax.lax.psum(b, axis_name)
            cost = jax.lax.psum(cost, axis_name)
            # frac: fraction of source points matched on ANY device —
            # psum of per-device indicator overcounts; use max as a bound.
            frac = jax.lax.pmax(frac, axis_name)
            return H, b, cost, frac

        def lm_solve(T00, gamma, max_iters, tol):
            H0, b0, cost0, frac0 = terms(T00, gamma)

            def cond(state):
                T, lam_lm, cost, H, b, frac, it, dx = state
                return (it < max_iters) & (dx > tol) & (lam_lm < 1e6)

            def body(state):
                T, lam_lm, cost, H, b, frac, it, dx = state
                damp = lam_lm * jnp.maximum(jnp.trace(H) / 6.0, 1e-6)
                xi = -jnp.linalg.solve(H + damp * jnp.eye(6, dtype=H.dtype),
                                       b)
                xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
                T_try = se3.retract(T, xi)
                H_t, b_t, cost_t, frac_t = terms(T_try, gamma)
                accept = cost_t < cost
                return (jnp.where(accept, T_try, T),
                        jnp.where(accept, jnp.maximum(lam_lm / 3.0, 1e-7),
                                  lam_lm * 5.0),
                        jnp.where(accept, cost_t, cost),
                        jnp.where(accept, H_t, H),
                        jnp.where(accept, b_t, b),
                        jnp.where(accept, frac_t, frac),
                        it + 1,
                        jnp.where(accept, jnp.linalg.norm(xi), dx))

            init = (T00, jnp.float32(1e-4), cost0, H0, b0, frac0,
                    jnp.int32(0), jnp.float32(jnp.inf))
            return jax.lax.while_loop(cond, body, init)

        gamma_f = jnp.float32(params.score_temperature)
        if (params.coarse_iterations > 0
                and params.coarse_temperature_scale > 1.0):
            T_c, _, _, _, _, _, it_c, _ = lm_solve(
                T0, gamma_f * params.coarse_temperature_scale,
                params.coarse_iterations, 10.0 * params.tolerance)
        else:
            T_c, it_c = T0, jnp.int32(0)
        T, _, cost, _, _, frac, iters, dx = lm_solve(
            T_c, gamma_f, params.max_iterations, params.tolerance)
        return T, iters + it_c, cost, frac, dx

    T, iters, cost, frac, dx = solve(smap.keys, smap.count, smap.sum_pts,
                                     smap.sum_outer, smap.stamp,
                                     src.points, src.mask, init_T)
    n_src = jnp.maximum(jnp.sum(src.mask.astype(jnp.float32)), 1.0)
    return NDTResult(T=T, iterations=iters, score=-cost / n_src,
                     matched_fraction=frac,
                     converged=dx <= params.tolerance)
