"""Data-parallel registration across the mesh.

Independent scan-pair registrations — loop-closure candidate verification,
multi-session alignment, calibration sweeps — are the DP axis of the SLAM
engine (SURVEY.md §2.3): each device registers its shard of pairs with the
same jitted solver; no cross-device traffic during the solve.

Implementation: ``shard_map`` over the leading batch axis + ``jax.vmap`` of
the single-pair ICP inside each shard. Batch sizes are padded to a multiple
of the mesh size; padding pairs are all-invalid clouds whose results are
masked out by the caller.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_slam.core.pointcloud import PAD_COORD, PointCloud
from tpu_slam.registration.icp import ICPParams, ICPResult, icp


def pad_batch(x: jax.Array, multiple: int, fill) -> jax.Array:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = jnp.full((rem,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def sharded_pairwise_icp(
    mesh: Mesh,
    src_points: jax.Array,   # (B, P, 3)
    src_mask: jax.Array,     # (B, P)
    tgt_points: jax.Array,   # (B, P, 3)
    tgt_mask: jax.Array,     # (B, P)
    init_T: jax.Array,       # (B, 4, 4)
    params: ICPParams = ICPParams(),
    axis_name: str = "data",
) -> ICPResult:
    """Register B independent pairs, sharded over ``mesh``.

    Returns a batched ICPResult with leading axis B (original size;
    padding results are stripped).
    """
    b = src_points.shape[0]
    n_dev = mesh.shape[axis_name]
    sp = pad_batch(src_points, n_dev, PAD_COORD)
    sm = pad_batch(src_mask, n_dev, False)
    tp = pad_batch(tgt_points, n_dev, PAD_COORD)
    tm = pad_batch(tgt_mask, n_dev, False)
    t0 = pad_batch(init_T, n_dev, 0.0)
    # padding inits must stay invertible
    if t0.shape[0] != b:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=init_T.dtype),
                               (t0.shape[0] - b, 4, 4))
        t0 = t0.at[b:].set(eye)

    def one(sp_i, sm_i, tp_i, tm_i, T0_i):
        return icp(PointCloud(points=sp_i, mask=sm_i),
                   PointCloud(points=tp_i, mask=tm_i),
                   init_T=T0_i, params=params)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=P(axis_name))
    def run(sp_s, sm_s, tp_s, tm_s, t0_s):
        return jax.vmap(one)(sp_s, sm_s, tp_s, tm_s, t0_s)

    res = run(sp, sm, tp, tm, t0)
    return ICPResult(T=res.T[:b], iterations=res.iterations[:b],
                     error=res.error[:b],
                     matched_fraction=res.matched_fraction[:b],
                     converged=res.converged[:b])
