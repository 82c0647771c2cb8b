"""Fully-jitted odometry: the whole per-scan update as ONE device program.

`pipeline.odometry` keeps decisions on the host (readable, checkpoint-
friendly, but pays a host sync per scan). This variant moves the entire
step — deskew, downsample, NDT registration, divergence gating, map
insertion, field rebuild — into a single jit with donated state:

  * the accept/insert decisions are `jnp.where` masks, not Python ifs;
  * a rejected/low-quality scan inserts a zeroed aggregate (a no-op merge)
    instead of branching — same compiled path every scan;
  * state (pose, map, NDT field) never leaves the device; the host feeds
    raw scans and reads a small metrics vector whenever it wants.

This is the production serving path: per-scan latency is one dispatch, and
async dispatch overlaps the host's scan prep with device compute (the
PP-analog of SURVEY.md §2.3 without any extra machinery).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest.deskew import deskew_cloud, vlp16_time_fractions
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.mapping.voxel_map import (VoxelMap, empty_map,
                                        insert_scan_stats,
                                        scan_to_voxel_stats)
from tpu_slam.pipeline.config import OdometryConfig
from tpu_slam.registration.ndt import NDTField, ndt_field, ndt_register


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JitOdomState:
    """Device-resident odometry state (a single pytree)."""

    pose: jax.Array          # (4, 4)
    last_delta: jax.Array    # (4, 4)
    vmap: VoxelMap
    field: NDTField
    scan_index: jax.Array    # () int32
    last_metrics: jax.Array  # (4,) [iterations, frac, accepted, inserted]


class JitLidarOdometry:
    """One-dispatch-per-scan odometry engine."""

    def __init__(self, config: OdometryConfig = OdometryConfig()):
        if config.method != "ndt":
            raise ValueError("JitLidarOdometry supports method='ndt'")
        self.config = config
        self.map_spec = config.map_spec()
        self.scan_spec = config.scan_spec()
        self._step = jax.jit(self._step_impl, donate_argnums=0)

    def init_state(self, first_cloud: PointCloud,
                   init_pose: Optional[jax.Array] = None) -> JitOdomState:
        """Bootstrap from the first scan (placed at init_pose)."""
        pose = (jnp.eye(4, dtype=jnp.float32) if init_pose is None
                else jnp.asarray(init_pose, jnp.float32))
        vmap = empty_map(self.config.map_capacity)
        world = first_cloud.transform(pose)
        keys, cnt, ssum, souter = scan_to_voxel_stats(world, self.map_spec)
        vmap = insert_scan_stats(vmap, keys, cnt, ssum, souter,
                                 jnp.float32(0.0))
        field = ndt_field(vmap, self.map_spec, self.config.ndt,
                          center=pose[:3, 3])
        return JitOdomState(
            pose=pose, last_delta=jnp.eye(4, dtype=jnp.float32), vmap=vmap,
            field=field, scan_index=jnp.int32(1),
            last_metrics=jnp.zeros((4,), jnp.float32))

    def step(self, state: JitOdomState, cloud: PointCloud) -> JitOdomState:
        """Process one scan; returns the new state (old state is donated)."""
        return self._step(state, cloud)

    # -- the compiled step ------------------------------------------------

    def _clamped_delta(self, delta):
        cfg = self.config
        xi = se3.log(delta)
        t_n = jnp.linalg.norm(xi[:3])
        r_n = jnp.linalg.norm(xi[3:])
        scale = jnp.minimum(
            jnp.minimum(1.0, cfg.max_pred_translation
                        / jnp.maximum(t_n, 1e-9)),
            jnp.minimum(1.0, cfg.max_pred_rotation / jnp.maximum(r_n, 1e-9)))
        return se3.exp(xi * scale)

    def _step_impl(self, state: JitOdomState, cloud: PointCloud
                   ) -> JitOdomState:
        cfg = self.config

        pred = self._clamped_delta(state.last_delta)
        if cfg.deskew:
            frac = vlp16_time_fractions(cloud.points)
            cloud = deskew_cloud(cloud, frac, T_start=se3.inverse(pred),
                                 T_end=jnp.eye(4, dtype=jnp.float32))
        scan = voxel_downsample(cloud, self.scan_spec,
                                capacity=cfg.scan_capacity)

        init_T = state.pose @ pred
        res = ndt_register(scan, state.field, self.map_spec, init_T=init_T,
                           params=cfg.ndt)

        accepted = res.matched_fraction >= cfg.min_accept_fraction
        # f32 composition drift guard (see odometry_dense._step_impl)
        T = se3.orthonormalize(jnp.where(accepted, res.T, init_T))
        delta = se3.inverse(state.pose) @ T

        # conditional insertion without branching: zero the aggregates when
        # the scan doesn't qualify — the merge becomes a no-op
        do_insert = accepted & (res.matched_fraction
                                >= cfg.min_insert_fraction)
        world = cloud.transform(T)
        keys, cnt, ssum, souter = scan_to_voxel_stats(world, self.map_spec)
        from tpu_slam.kernels.voxel_hash import INVALID_KEY
        keys = jnp.where(do_insert, keys, INVALID_KEY)
        cnt = jnp.where(do_insert, cnt, 0.0)
        vmap = insert_scan_stats(state.vmap, keys, cnt, ssum, souter,
                                 state.scan_index.astype(jnp.float32))
        # field rebuild every step keeps the graph branch-free; the dense
        # window is re-centered on the new pose (see _ndt_field_dense)
        field = ndt_field(vmap, self.map_spec, cfg.ndt, center=T[:3, 3])

        metrics = jnp.stack([
            res.iterations.astype(jnp.float32),
            res.matched_fraction,
            accepted.astype(jnp.float32),
            do_insert.astype(jnp.float32),
        ])
        return JitOdomState(pose=T, last_delta=delta, vmap=vmap, field=field,
                            scan_index=state.scan_index + 1,
                            last_metrics=metrics)
