"""Full 6D SLAM: odometry + keyframes + loop closure + pose-graph backend.

The complete TPU-native stand-in for the reference's gpu_6dslam_node
(SURVEY.md §1 L6 [inferred]): keyframe clouds and poses live in fixed-
capacity device arrays; loop closures are verified as one vmapped ICP batch
(graph.loop_closure); the pose graph is optimized with the matrix-free GN
(graph.pose_graph); after an accepted loop the map is rebuilt from the
optimized keyframe poses.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PAD_COORD, PointCloud
from tpu_slam.graph.loop_closure import propose_candidates, verify_candidates
from tpu_slam.graph.pose_graph import (PoseGraph, add_edge, add_node,
                                       empty_graph, optimize_pose_graph)
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.mapping.voxel_map import empty_map, insert_cloud
from tpu_slam.pipeline.config import SLAMConfig
from tpu_slam.pipeline.metrics import MetricsLog, ScanMetrics, Stopwatch
from tpu_slam.pipeline.odometry import LidarOdometry, OdometryState


@dataclasses.dataclass
class SLAMState:
    """Host-side handle onto the full SLAM state."""

    odom: OdometryState
    graph: PoseGraph
    kf_points: jax.Array       # (K, P, 3) keyframe clouds (body frame)
    kf_mask: jax.Array         # (K, P)
    n_keyframes: int
    last_kf_pose: jax.Array    # (4, 4) pose of the newest keyframe
    n_loop_closures: int = 0


class SLAMSystem:
    """The full pipeline. Feed aggregated 3D scans; read poses + map."""

    def __init__(self, config: SLAMConfig = SLAMConfig()):
        self.config = config
        self.odometry = LidarOdometry(config.odometry)
        self.metrics = MetricsLog()

    # -- state ------------------------------------------------------------

    def init_state(self, init_pose: Optional[jax.Array] = None) -> SLAMState:
        cfg = self.config
        K, P = cfg.keyframe_capacity, cfg.keyframe_cloud_capacity
        return SLAMState(
            odom=self.odometry.init_state(init_pose),
            graph=empty_graph(cfg.keyframe_capacity, cfg.edge_capacity),
            kf_points=jnp.full((K, P, 3), PAD_COORD, jnp.float32),
            kf_mask=jnp.zeros((K, P), bool),
            n_keyframes=0,
            last_kf_pose=jnp.eye(4, dtype=jnp.float32),
        )

    # -- keyframe policy --------------------------------------------------

    def _is_keyframe(self, state: SLAMState) -> bool:
        if state.n_keyframes == 0:
            return True
        xi = se3.log(se3.inverse(state.last_kf_pose) @ state.odom.pose)
        t = float(jnp.linalg.norm(xi[:3]))
        r = float(jnp.linalg.norm(xi[3:]))
        return (t >= self.config.keyframe_translation
                or r >= self.config.keyframe_rotation)

    def _store_keyframe(self, state: SLAMState, scan_ds: PointCloud
                        ) -> SLAMState:
        cfg = self.config
        k = state.n_keyframes
        if k >= cfg.keyframe_capacity:
            raise ValueError("keyframe capacity exhausted")
        # re-pad the downsampled cloud to the keyframe cloud capacity
        P = cfg.keyframe_cloud_capacity
        pts = scan_ds.points[:P]
        msk = scan_ds.mask[:P]
        kf_points = state.kf_points.at[k].set(pts)
        kf_mask = state.kf_mask.at[k].set(msk)

        graph, idx = add_node(state.graph, state.odom.pose)
        assert idx == k
        if k > 0:
            Z = se3.inverse(state.graph.poses[k - 1]) @ state.odom.pose
            graph = add_edge(graph, k - 1, k, Z,
                             info=cfg.odom_edge_info
                             * jnp.eye(6, dtype=jnp.float32))
        return dataclasses.replace(state, graph=graph, kf_points=kf_points,
                                   kf_mask=kf_mask, n_keyframes=k + 1,
                                   last_kf_pose=state.odom.pose)

    # -- loop closure -----------------------------------------------------

    def _close_loops(self, state: SLAMState) -> Tuple[SLAMState, int]:
        cfg = self.config
        n = state.n_keyframes
        positions = state.graph.poses[:, :3, 3]
        ci, cj = propose_candidates(positions, n, cfg.loop)
        # drop pairs already connected by an odometry edge
        keep = (cj - ci) >= cfg.loop.min_index_gap
        ci, cj = ci[keep], cj[keep]
        if ci.size == 0:
            return state, 0

        res, accept = verify_candidates(
            state.kf_points, state.kf_mask, state.graph.poses, ci, cj,
            cfg.loop)
        accept_np = np.asarray(accept)
        if not accept_np.any():
            return state, 0

        graph = state.graph
        for k in np.nonzero(accept_np)[0]:
            graph = add_edge(graph, int(ci[k]), int(cj[k]), res.T[k],
                             info=cfg.odom_edge_info
                             * jnp.eye(6, dtype=jnp.float32))
        graph, _ = optimize_pose_graph(graph, cfg.graph)

        # re-anchor odometry at the optimized latest keyframe:
        # current pose = optimized_kf_pose @ (old_kf_pose^-1 @ current)
        old_kf = state.last_kf_pose
        new_kf = graph.poses[n - 1]
        rel = se3.inverse(old_kf) @ state.odom.pose
        new_pose = new_kf @ rel

        odom = state.odom
        if cfg.rebuild_map_after_loop:
            vmap = self._rebuild_map(graph, state.kf_points, state.kf_mask, n)
            # field=None: the cached NDT field is stale after a rebuild
            odom = dataclasses.replace(odom, vmap=vmap, pose=new_pose,
                                       field=None)
        else:
            odom = dataclasses.replace(odom, pose=new_pose)

        state = dataclasses.replace(state, graph=graph, odom=odom,
                                    last_kf_pose=new_kf,
                                    n_loop_closures=state.n_loop_closures
                                    + int(accept_np.sum()))
        return state, int(accept_np.sum())

    def _rebuild_map(self, graph: PoseGraph, kf_points, kf_mask, n: int):
        """Re-integrate every keyframe cloud at its optimized pose."""
        cfg = self.config.odometry
        vmap = empty_map(cfg.map_capacity)
        spec = cfg.map_spec()
        for k in range(n):
            cloud = PointCloud(points=kf_points[k], mask=kf_mask[k])
            world = cloud.transform(graph.poses[k])
            vmap = insert_cloud(vmap, world, spec, stamp=float(k))
        return vmap

    # -- main entry -------------------------------------------------------

    def step(self, state: SLAMState, cloud: PointCloud
             ) -> Tuple[SLAMState, ScanMetrics]:
        cfg = self.config
        with Stopwatch() as sw:
            odom_state, m = self.odometry.step(state.odom, cloud)
            state = dataclasses.replace(state, odom=odom_state)

            n_loops = 0
            if self._is_keyframe(state):
                scan_ds = self.odometry.downsample(cloud)
                state = self._store_keyframe(state, scan_ds)
                m.is_keyframe = True
                if (state.n_keyframes % cfg.loop_every == 0
                        and state.n_keyframes > cfg.loop.min_index_gap):
                    state, n_loops = self._close_loops(state)
        m.wall_time_s = sw.elapsed
        m.n_loop_closures = n_loops
        self.metrics.append(m)
        return state, m

    def run(self, clouds, init_pose: Optional[jax.Array] = None
            ) -> Tuple[np.ndarray, "SLAMState"]:
        state = self.init_state(init_pose)
        poses = []
        for cloud in clouds:
            state, _ = self.step(state, cloud)
            poses.append(np.asarray(state.odom.pose))
        return np.stack(poses), state
