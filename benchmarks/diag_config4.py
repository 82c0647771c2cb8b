"""Config-4 loop-closure diagnosis: per-sweep candidate/gate outcomes.

Runs the EXACT bench_full_slam workload with SLAMSystem.collect_loop_debug
on, then dumps: every proposed pair with its gate values, the accepted-loop
set, and per-keyframe trajectory error before/after graph optimization.
Writes benchmarks/diag_config4.json. (r4 verdict next-round item #1.)
"""

import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_poses=160):
    import jax
    import jax.numpy as jnp
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.graph.pose_graph import GraphSolveParams, optimize_pose_graph
    from tpu_slam.ingest import synthetic as syn
    from tpu_slam.pipeline.metrics import ate_rmse
    from tpu_slam.pipeline.slam import SLAMSystem

    import bench

    world, clouds, gt = bench._config4_workload(n_poses)

    cfg = bench._config4_cfg() if hasattr(bench, "_config4_cfg") else None
    if cfg is None:
        # inline copy of the bench config (keep in sync with bench.py)
        from tpu_slam.graph.loop_closure import LoopClosureParams
        from tpu_slam.pipeline.config import OdometryConfig, SLAMConfig
        from tpu_slam.registration.icp import ICPParams
        from tpu_slam.registration.ndt import NDTParams
        cfg = SLAMConfig(
            odometry=OdometryConfig(scan_capacity=8192, downsample_leaf=0.25,
                                    map_leaf=0.5, map_half_extent=16.0,
                                    map_capacity=32768,
                                    insert_downsampled=True,
                                    ndt=NDTParams(max_iterations=12,
                                                  coarse_iterations=2,
                                                  min_voxel_count=3.0,
                                                  window_dims=(48, 48, 16)),
                                    pyramid_factor=2),
            odometry_engine="dense",
            reanchor_after_loop=False, rebuild_map_after_loop=False,
            keyframe_translation=0.19, keyframe_rotation=0.12,
            keyframe_capacity=192,
            keyframe_cloud_capacity=4096, loop_every=4,
            loop=LoopClosureParams(
                max_distance=2.0, min_index_gap=40, max_candidates=4,
                max_error=0.05, min_matched_fraction=0.85,
                max_correction_t=1.5, max_correction_r=0.6,
                icp=ICPParams(max_iterations=40, tolerance=5e-4,
                              max_corr_dist=2.0, huber_delta=0.3)),
            edge_capacity=1024,
            loop_edge_info=400.0)

    slam = SLAMSystem(cfg)
    slam.collect_loop_debug = True
    state = slam.init_state(jnp.asarray(gt[0], jnp.float32))
    poses, kf_scan = [], []
    t0 = time.perf_counter()
    for k, c in enumerate(clouds):
        state, _ = slam.step(state, c)
        poses.append(np.asarray(state.odom.pose))
        if len(kf_scan) < state.n_keyframes:
            kf_scan.append(k)
    poses = np.stack(poses)
    kf_scan = np.asarray(kf_scan)
    dt = time.perf_counter() - t0

    n = state.n_keyframes
    # raw (pre-final-optimize) keyframe poses vs gt
    kf_g = np.asarray(state.graph.poses[:n])
    graph, chi = optimize_pose_graph(state.graph, GraphSolveParams(
        gn_iterations=40, cg_iterations=800, robust_delta=0.15,
        robust_kernel="cauchy", trust_loops=True))
    kf_o = np.asarray(graph.poses[:n])

    gt_kf = gt[kf_scan[:n]]
    per_kf_odo = np.linalg.norm(poses[kf_scan[:n], :3, 3] - gt_kf[:, :3, 3],
                                axis=1)
    per_kf_g = np.linalg.norm(kf_g[:, :3, 3] - gt_kf[:, :3, 3], axis=1)
    per_kf_o = np.linalg.norm(kf_o[:, :3, 3] - gt_kf[:, :3, 3], axis=1)

    # --- edge-level truth check: how accurate are the measurements? -----
    from tpu_slam.core import se3 as _se3
    ei = np.asarray(state.graph.edge_i)
    ej = np.asarray(state.graph.edge_j)
    em = np.asarray(state.graph.edge_mask)
    eT = np.asarray(state.graph.edge_T)
    gt_kf_f = gt_kf.astype(np.float32)
    edge_err = []
    for e in range(len(ei)):
        if not em[e]:
            continue
        i, j = int(ei[e]), int(ej[e])
        if i >= n or j >= n:
            continue
        Zgt = np.linalg.inv(gt_kf_f[i]) @ gt_kf_f[j]
        d = np.asarray(_se3.log(jnp.asarray(
            np.linalg.inv(eT[e]) @ Zgt, np.float32)))
        edge_err.append({"i": i, "j": j, "loop": bool(j - i > 1),
                         "t_err": float(np.linalg.norm(d[:3])),
                         "r_err": float(np.linalg.norm(d[3:]))})
    loops = [e for e in edge_err if e["loop"]]
    odo = [e for e in edge_err if not e["loop"]]
    if loops:
        lt = np.array([e["t_err"] for e in loops])
        print(f"loop edges {len(loops)}: t_err med {np.median(lt):.4f} "
              f"p90 {np.percentile(lt, 90):.4f} max {lt.max():.4f}")
    if odo:
        ot = np.array([e["t_err"] for e in odo])
        print(f"odom edges {len(odo)}: t_err med {np.median(ot):.4f} "
              f"p90 {np.percentile(ot, 90):.4f} max {ot.max():.4f}")

    # --- oracle: replace loop edges with GT relatives, re-optimize ------
    import dataclasses as _dc
    eT_gt = eT.copy()
    for e in range(len(ei)):
        if em[e] and int(ej[e]) - int(ei[e]) > 1 \
                and int(ej[e]) < n and int(ei[e]) < n:
            eT_gt[e] = np.linalg.inv(gt_kf_f[int(ei[e])]) @ gt_kf_f[int(ej[e])]
    g_or = _dc.replace(state.graph, edge_T=jnp.asarray(eT_gt))
    g_or, _ = optimize_pose_graph(g_or, GraphSolveParams(
        gn_iterations=40, cg_iterations=800, robust_delta=0.15,
        robust_kernel="cauchy", trust_loops=True))
    kf_or = np.asarray(g_or.poses[:n])
    oracle_ate = float(ate_rmse(kf_or, gt_kf, align=False))
    print(f"ORACLE (gt loop edges) optimized ATE: {oracle_ate:.4f}")

    np.savez("benchmarks/diag_config4_graph.npz",
             poses=np.asarray(state.graph.poses),
             n_nodes=int(state.graph.n_nodes),
             edge_i=ei, edge_j=ej, edge_T=eT,
             edge_info=np.asarray(state.graph.edge_info),
             edge_mask=em, gt_kf=gt_kf, odom_poses=poses,
             kf_scan=kf_scan)

    out = {
        "n_scans": n_poses, "n_keyframes": int(n),
        "oracle_ate_m": oracle_ate,
        "edge_err": edge_err,
        "n_loop_closures": int(state.n_loop_closures),
        "scans_per_sec": round(n_poses / dt, 2),
        "odometry_ate_m": float(ate_rmse(poses, gt, align=False)),
        "graph_ate_m": float(ate_rmse(kf_g, gt_kf, align=False)),
        "optimized_ate_m": float(ate_rmse(kf_o, gt_kf, align=False)),
        "per_kf_err_odom": [round(float(x), 4) for x in per_kf_odo],
        "per_kf_err_graph": [round(float(x), 4) for x in per_kf_g],
        "per_kf_err_opt": [round(float(x), 4) for x in per_kf_o],
        "sweeps": slam.loop_debug,
    }
    with open("benchmarks/diag_config4.json", "w") as f:
        json.dump(out, f, indent=1)
    n_prop = sum(len(s["pairs"]) for s in slam.loop_debug)
    n_acc = sum(1 for s in slam.loop_debug for p in s["pairs"]
                if p["accepted"])
    print(f"scans/s {out['scans_per_sec']}, kf {n}, "
          f"proposed {n_prop}, accepted {n_acc}")
    print(f"ATE odom {out['odometry_ate_m']:.4f} "
          f"graph {out['graph_ate_m']:.4f} opt {out['optimized_ate_m']:.4f}")
    rej = {}
    for s in slam.loop_debug:
        for p in s["pairs"]:
            if p["accepted"]:
                continue
            why = []
            if p["frac"] < cfg.loop.min_matched_fraction:
                why.append("frac")
            if p["err"] > cfg.loop.max_error:
                why.append("err")
            if p["dev_t"] > cfg.loop.max_correction_t:
                why.append("dev_t")
            if p["dev_r"] > cfg.loop.max_correction_r:
                why.append("dev_r")
            rej["+".join(why) or "?"] = rej.get("+".join(why) or "?", 0) + 1
    print("rejections by gate:", rej)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 160)
