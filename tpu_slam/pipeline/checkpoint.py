"""Checkpoint / resume of SLAM state.

The reference persisted only the calibration extrinsic and the motor homing
offset (SURVEY.md §5 'Checkpoint/resume'); the new framework checkpoints
the full SLAM state — keyframe poses, keyframe clouds, pose-graph edges,
voxel-map arrays, odometry pose — so a run resumes mid-sequence
deterministically (same arrays in, same arrays out).

Format: one .npz with every array leaf + a JSON manifest of scalars. No
framework lock-in; loadable with plain numpy.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from tpu_slam.graph.pose_graph import PoseGraph
from tpu_slam.mapping.voxel_map import VoxelMap
from tpu_slam.pipeline.odometry import OdometryState
from tpu_slam.pipeline.slam import SLAMState

_FORMAT_VERSION = 3  # v3 adds intensity/normals/loop-pair state (v1/v2
                     # load fine; missing arrays come back zeroed/empty)


def save_checkpoint(path: str, state: SLAMState, scan_index: int = -1) -> str:
    """Write the SLAM state to ``path`` (.npz). Returns the path written.

    Both odometry engines are supported: the sparse ``OdometryState``
    (voxel-map arrays) and the dense ``DenseOdomState`` (moment-window
    rows + origin, plus the wide coarse window and the occupancy layer
    when present).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    dense = hasattr(state.odom, "grid")
    if dense:
        arrays = {
            "odom_pose": np.asarray(state.odom.pose),
            "odom_last_delta": np.asarray(state.odom.last_delta),
            "dense_rows": np.asarray(state.odom.grid.rows),
            "dense_origin_cell": np.asarray(state.odom.grid.origin_cell),
            "dense_dims": np.asarray(state.odom.grid.dims, np.int32),
        }
        if state.odom.wide is not None:
            arrays["dense_wide_rows"] = np.asarray(state.odom.wide.rows)
            arrays["dense_wide_origin_cell"] = np.asarray(
                state.odom.wide.origin_cell)
        if state.odom.occ is not None:
            arrays["dense_occ_rows"] = np.asarray(state.odom.occ.rows)
            arrays["dense_occ_origin_cell"] = np.asarray(
                state.odom.occ.origin_cell)
    else:
        arrays = {
            "odom_pose": np.asarray(state.odom.pose),
            "odom_last_delta": np.asarray(state.odom.last_delta),
            "map_keys": np.asarray(state.odom.vmap.keys),
            "map_count": np.asarray(state.odom.vmap.count),
            "map_sum_pts": np.asarray(state.odom.vmap.sum_pts),
            "map_sum_outer": np.asarray(state.odom.vmap.sum_outer),
            "map_stamp": np.asarray(state.odom.vmap.stamp),
        }
    arrays.update({
        "graph_poses": np.asarray(state.graph.poses),
        "graph_edge_i": np.asarray(state.graph.edge_i),
        "graph_edge_j": np.asarray(state.graph.edge_j),
        "graph_edge_T": np.asarray(state.graph.edge_T),
        "graph_edge_info": np.asarray(state.graph.edge_info),
        "graph_edge_mask": np.asarray(state.graph.edge_mask),
        "kf_points": np.asarray(state.kf_points),
        "kf_mask": np.asarray(state.kf_mask),
        "kf_intensity": np.asarray(state.kf_intensity),
        "kf_normals": np.asarray(state.kf_normals),
        "kf_desc": np.asarray(state.kf_desc),
        "last_kf_pose": np.asarray(state.last_kf_pose),
        "archived_poses": (np.stack(state.archived_poses)
                           if state.archived_poses
                           else np.zeros((0, 4, 4), np.float32)),
        "loop_pairs": np.asarray(sorted(state.loop_pairs),
                                 np.int32).reshape(-1, 2),
        "tried_pairs": np.asarray(
            [(i, j, v) for (i, j), v in sorted(state.tried_pairs.items())],
            np.int32).reshape(-1, 3),
    })
    manifest = {
        "format_version": _FORMAT_VERSION,
        "scan_index": int(state.odom.scan_index
                          if scan_index < 0 else scan_index),
        "odom_scan_index": int(state.odom.scan_index),
        "n_nodes": int(state.graph.n_nodes),
        "n_keyframes": int(state.n_keyframes),
        "n_loop_closures": int(state.n_loop_closures),
        "n_evictions": int(state.n_evictions),
    }
    np.savez_compressed(path, manifest=json.dumps(manifest), **arrays)
    return path


def load_checkpoint(path: str) -> Tuple[SLAMState, dict]:
    """Load a checkpoint; returns (SLAMState, manifest dict)."""
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z["manifest"]))
        if manifest["format_version"] not in (1, _FORMAT_VERSION):
            raise ValueError(
                f"checkpoint format {manifest['format_version']} "
                f"!= supported {_FORMAT_VERSION}")
        if "dense_rows" in z.files:
            from tpu_slam.mapping.dense_map import DenseMomentGrid
            from tpu_slam.pipeline.odometry_dense import DenseOdomState
            dims = tuple(int(v) for v in z["dense_dims"])

            def _grid(prefix):
                if f"{prefix}_rows" not in z.files:
                    return None
                return DenseMomentGrid(
                    rows=jnp.asarray(z[f"{prefix}_rows"]),
                    origin_cell=jnp.asarray(z[f"{prefix}_origin_cell"]),
                    dims=dims)

            odom = DenseOdomState(
                pose=jnp.asarray(z["odom_pose"]),
                last_delta=jnp.asarray(z["odom_last_delta"]),
                grid=_grid("dense"),
                scan_index=jnp.int32(manifest["odom_scan_index"]),
                last_metrics=jnp.zeros((5,), jnp.float32),
                wide=_grid("dense_wide"),
                occ=_grid("dense_occ"),
            )
        else:
            vmap = VoxelMap(
                keys=jnp.asarray(z["map_keys"]),
                count=jnp.asarray(z["map_count"]),
                sum_pts=jnp.asarray(z["map_sum_pts"]),
                sum_outer=jnp.asarray(z["map_sum_outer"]),
                stamp=jnp.asarray(z["map_stamp"]),
            )
            odom = OdometryState(
                pose=jnp.asarray(z["odom_pose"]),
                last_delta=jnp.asarray(z["odom_last_delta"]),
                vmap=vmap,
                scan_index=manifest["odom_scan_index"],
            )
        graph = PoseGraph(
            poses=jnp.asarray(z["graph_poses"]),
            n_nodes=jnp.int32(manifest["n_nodes"]),
            edge_i=jnp.asarray(z["graph_edge_i"]),
            edge_j=jnp.asarray(z["graph_edge_j"]),
            edge_T=jnp.asarray(z["graph_edge_T"]),
            edge_info=jnp.asarray(z["graph_edge_info"]),
            edge_mask=jnp.asarray(z["graph_edge_mask"]),
        )
        kf_mask = jnp.asarray(z["kf_mask"])
        if "kf_desc" in z.files:
            kf_desc = jnp.asarray(z["kf_desc"])
        else:                      # v1 checkpoint: rebuildable, start empty
            from tpu_slam.graph.scan_context import ScanContextParams
            sc = ScanContextParams()
            kf_desc = jnp.zeros((kf_mask.shape[0], sc.n_rings,
                                 sc.n_sectors), jnp.float32)
        kf_points = jnp.asarray(z["kf_points"])
        kf_intensity = (jnp.asarray(z["kf_intensity"])
                        if "kf_intensity" in z.files
                        else jnp.zeros(kf_mask.shape, jnp.float32))
        kf_normals = (jnp.asarray(z["kf_normals"])
                      if "kf_normals" in z.files
                      else jnp.zeros(kf_points.shape, jnp.float32))
        state = SLAMState(
            odom=odom,
            graph=graph,
            kf_points=kf_points,
            kf_mask=kf_mask,
            kf_intensity=kf_intensity,
            kf_normals=kf_normals,
            kf_desc=kf_desc,
            n_keyframes=manifest["n_keyframes"],
            last_kf_pose=jnp.asarray(z["last_kf_pose"]),
            n_loop_closures=manifest["n_loop_closures"],
            archived_poses=([a for a in z["archived_poses"]]
                            if "archived_poses" in z.files else []),
            n_evictions=manifest.get("n_evictions", 0),
            loop_pairs=({(int(i), int(j)) for i, j in z["loop_pairs"]}
                        if "loop_pairs" in z.files else set()),
            tried_pairs=({(int(i), int(j)): int(v)
                          for i, j, v in z["tried_pairs"]}
                         if "tried_pairs" in z.files else {}),
        )
    return state, manifest
