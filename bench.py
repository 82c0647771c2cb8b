"""Benchmark suite: the five BASELINE.json configs at realistic workloads.

The reference publishes no numbers (BASELINE.md; its CUDA core is an empty
submodule). The vs_baseline denominator is the scan-matching rate of
single-GPU CUDA ICP/NDT pipelines of the reference's era, ~10 scans/s.

Configs (BASELINE.md:32-35):
  1. single-pair point-to-point ICP;
  2. sequential frame-to-map odometry, outdoor VLP-16 revolutions
     (>=64k-ray scans), end-to-end scans/s;
  3. NDT scan-to-map registration against a >=100k-voxel outdoor map —
     the HEADLINE metric — with per-stage timings (field build / terms
     pass / map insert) and the roofline accounting of docs/roofline.md;
  4. full 6D SLAM (keyframes + loop closure + pose-graph GN), indoor
     sequence, end-to-end scans/s;
  5. multi-device sharded NDT scaling curve (runs when >1 device is
     visible — the virtual CPU mesh; the driver's single real chip skips
     it with a note).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"configs": {...per-config results...}}. Detail goes to stderr.
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 10.0


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _time(fn, reps, ready):
    """Mean seconds per call; ``ready(out)`` blocks on the result."""
    ready(fn())               # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    ready(out)
    return (time.perf_counter() - t0) / reps


# ---------------------------------------------------------------------------
# Shared workload builders
# ---------------------------------------------------------------------------

def _outdoor_scans(n_poses, n_azimuth=4096, radius=26.0, step=1.0,
                   max_range=75.0, seed=0):
    """VLP-16 revolutions along a ring road in the city-block world.

    n_azimuth=4096 -> 65,536 rays per revolution (>= the 64k-point
    realistic-scan bar; a real VLP-16 at 600 RPM fires ~28.9k/rev, so this
    is ~2.3 revolutions of work per scan). ``step`` is the inter-scan
    motion in meters (1 m/scan = 10 m/s urban driving at 10 Hz); the range
    gate keeps every return inside the benchmark map grid."""
    import jax.numpy as jnp
    import math
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.ingest import synthetic as syn

    world = syn.outdoor_block(n_buildings=10, extent=90.0, seed=3)
    rng = np.random.default_rng(seed)
    clouds, gt = [], []
    for k in range(n_poses):
        a = step * k / radius
        T = syn.se2_pose(radius * math.cos(a), radius * math.sin(a),
                         a + math.pi / 2, z=1.8)
        pts, valid = syn.simulate_vlp16_revolution(
            world, T, n_azimuth=n_azimuth, max_range=max_range,
            noise_std=0.01, rng=rng)
        clouds.append(PointCloud.from_points(jnp.asarray(pts[valid]),
                                             capacity=n_azimuth * 16))
        gt.append(T)
    return clouds, np.stack(gt)


# ---------------------------------------------------------------------------
# Config 1: single-pair point-to-point ICP
# ---------------------------------------------------------------------------

def bench_icp_pair(reps=20):
    import jax
    import jax.numpy as jnp
    from tpu_slam.core import se3
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.ingest import synthetic as syn
    from tpu_slam.registration.icp import ICPParams, icp

    world = syn.default_office()
    T0 = np.eye(4); T0[:3, 3] = [0, 0, 1.5]
    pts, valid = syn.simulate_vlp16_revolution(world, T0, n_azimuth=512)
    tgt = PointCloud.from_points(jnp.asarray(pts[valid]), capacity=8192)
    xi = jnp.array([0.15, -0.1, 0.05, 0.02, -0.02, 0.04], jnp.float32)
    src = tgt.transform(se3.inverse(se3.exp(xi)))
    params = ICPParams(max_iterations=30, max_corr_dist=1.5)

    def run():
        return icp(src, tgt, params=params)

    dt = _time(run, reps, lambda out: jax.block_until_ready(out.T))
    res = run()
    iters = int(res.iterations)
    _log(f"config1 icp: {1/dt:.1f} regs/s, {iters} iters, "
         f"{iters/dt:.0f} iters/s, err={float(res.error):.2e}")
    return {"registrations_per_sec": round(1 / dt, 2),
            "iters_per_sec": round(iters / dt, 1),
            "points": int(tgt.capacity)}


# ---------------------------------------------------------------------------
# Config 2: sequential frame-to-map odometry (outdoor, >=64k-ray scans)
# ---------------------------------------------------------------------------

def bench_odometry(n_poses=24):
    import jax.numpy as jnp
    from tpu_slam.pipeline.config import OdometryConfig
    from tpu_slam.pipeline.metrics import ate_rmse
    from tpu_slam.pipeline.odometry import LidarOdometry
    from tpu_slam.registration.ndt import NDTParams

    clouds, gt = _outdoor_scans(n_poses)
    cfg = OdometryConfig(
        scan_capacity=32768, downsample_leaf=0.3,
        map_leaf=0.5, map_half_extent=128.0, map_capacity=262144,
        ndt=NDTParams(max_iterations=20, coarse_iterations=4),
        pyramid_factor=4)
    odo = LidarOdometry(cfg)
    # warm-up on the first two scans (compiles downsample+register+insert)
    poses, log = odo.run(clouds[:2], init_pose=jnp.asarray(gt[0], jnp.float32))

    odo2 = LidarOdometry(cfg)
    t0 = time.perf_counter()
    poses, log = odo2.run(clouds, init_pose=jnp.asarray(gt[0], jnp.float32))
    dt = time.perf_counter() - t0
    ate = ate_rmse(poses, gt, align=False)
    s = log.summary()
    _log(f"config2 odometry: {n_poses/dt:.1f} scans/s end-to-end, "
         f"ate={ate:.3f} m, mean_frac={s['mean_matched_fraction']:.2f}, "
         f"map={int(odo2.map_spec.cells_per_axis)}^3 cells")

    # PP-analog serving path: one donated-state dispatch per scan, async —
    # the host never syncs mid-stream (pipeline.odometry_jit)
    import dataclasses as _dc

    import jax
    from tpu_slam.pipeline.odometry_jit import JitLidarOdometry

    jodo = JitLidarOdometry(_dc.replace(cfg, pyramid_factor=0))
    jstate = jodo.init_state(clouds[0], jnp.asarray(gt[0], jnp.float32))
    jstate = jodo.step(jstate, clouds[1])         # compile
    jax.block_until_ready(jstate.pose)
    jstate2 = jodo.init_state(clouds[0], jnp.asarray(gt[0], jnp.float32))
    t0 = time.perf_counter()
    for c in clouds[1:]:
        jstate2 = jodo.step(jstate2, c)
    jax.block_until_ready(jstate2.pose)
    jdt = time.perf_counter() - t0
    jerr = float(jnp.linalg.norm(jstate2.pose[:3, 3]
                                 - jnp.asarray(gt[-1][:3, 3], jnp.float32)))
    _log(f"config2 jit-odometry (overlapped): {(n_poses-1)/jdt:.1f} scans/s, "
         f"final position err={jerr:.3f} m")
    return {"scans_per_sec": round(n_poses / dt, 2),
            "jit_overlapped_scans_per_sec": round((n_poses - 1) / jdt, 2),
            "jit_final_position_err_m": round(jerr, 4),
            "ate_m": round(float(ate), 4),
            "n_scans": n_poses,
            "raw_rays_per_scan": 65536,
            "mean_iterations": round(s["mean_iterations"], 1)}


# ---------------------------------------------------------------------------
# Config 3: NDT scan-to-map registration (HEADLINE) + per-stage timings
# ---------------------------------------------------------------------------

def bench_ndt_register(reps=30):
    import functools

    import jax
    import jax.numpy as jnp
    from tpu_slam.core import se3
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.kernels.downsample import voxel_downsample
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.mapping.voxel_map import empty_map, insert_cloud
    from tpu_slam.registration.ndt import (NDTParams, _ndt_terms, ndt_field,
                                           ndt_register)

    # >=100k-voxel outdoor map built from 20 ring poses
    clouds, gt = _outdoor_scans(20, seed=7)
    map_spec = VoxelGridSpec.centered(leaf=0.5, half_extent=128.0)
    vmap = empty_map(262144)
    for c, T in zip(clouds, gt):
        vmap = insert_cloud(vmap, c.transform(jnp.asarray(T, jnp.float32)),
                            map_spec, 0.0)
    n_vox = int(vmap.n_occupied())

    scan_spec = VoxelGridSpec.centered(leaf=0.3, half_extent=128.0)
    scan = voxel_downsample(clouds[0], scan_spec, capacity=32768)
    n_scan = int(scan.count())
    T0 = jnp.asarray(gt[0], jnp.float32)
    center = T0[:3, 3]
    params = NDTParams(max_iterations=20, coarse_iterations=4)

    # stage: field build (window around the sensor)
    field_fn = jax.jit(functools.partial(ndt_field, spec=map_spec,
                                         params=params))
    field = field_fn(vmap, center=center)
    jax.block_until_ready(field.nbr_rows if field.nbr_rows is not None
                          else field.info)
    t_field = _time(lambda: field_fn(vmap, center=center),
                    max(5, reps // 4),
                    lambda out: jax.block_until_ready(out.means))

    # stage: one gradient/Hessian terms pass over all (point, 27) pairs
    terms_fn = jax.jit(lambda pts, mask, f, T: _ndt_terms(
        PointCloud(points=pts, mask=mask), T, f, map_spec, params))
    t_terms = _time(lambda: terms_fn(scan.points, scan.mask, field, T0),
                    reps, lambda out: jax.block_until_ready(out[0]))

    # stage: map insert of a full scan
    ins_fn = jax.jit(functools.partial(insert_cloud, spec=map_spec,
                                       stamp=1.0))
    t_ins = _time(lambda: ins_fn(vmap, clouds[0]), max(5, reps // 4),
                  lambda out: jax.block_until_ready(out.keys))

    # full registration from perturbed inits
    rng = np.random.default_rng(1)
    inits = [jnp.asarray(np.asarray(se3.exp(jnp.asarray(
        np.r_[rng.normal(0, 0.15, 3), rng.normal(0, 0.04, 3)],
        jnp.float32))) @ gt[0], jnp.float32) for _ in range(8)]

    def reg(k=0):
        return ndt_register(scan, field, map_spec, init_T=inits[k % 8],
                            params=params)

    jax.block_until_ready(reg().T)
    t0 = time.perf_counter()
    for k in range(reps):
        res = reg(k)
    jax.block_until_ready(res.T)
    t_reg = (time.perf_counter() - t0) / reps
    iters = int(res.iterations)

    # roofline accounting for the terms pass (docs/roofline.md)
    tier = 9 if (field.nbr_rows is not None
                 and field.nbr_rows.shape[1] == 144) else (
        3 if field.nbr_rows is not None else 0)
    if tier:
        # per point the probe gathers 27 neighbor rows of 16 f32 from the
        # packed table (3 dx-gathers of tier*16 each); see docs/roofline.md
        bytes_moved = scan.capacity * 27 * 16 * 4
        flops = scan.capacity * 27 * 230
        hbm_gbps = 819.0          # v5e HBM bandwidth
        sol_s = bytes_moved / (hbm_gbps * 1e9)
        frac_sol = sol_s / t_terms
    else:
        bytes_moved = flops = 0
        frac_sol = 0.0

    _log(f"config3 ndt: map={n_vox} voxels, scan={n_scan} pts "
         f"(cap {scan.capacity}); field={t_field*1e3:.1f} ms, "
         f"terms={t_terms*1e3:.2f} ms, insert={t_ins*1e3:.1f} ms, "
         f"register={t_reg*1e3:.1f} ms ({iters} iters); terms pass at "
         f"{100*frac_sol:.0f}% of HBM speed-of-light")
    return {"registrations_per_sec": round(1 / t_reg, 2),
            "iters_per_sec": round(iters / t_reg, 1),
            "map_voxels": n_vox,
            "scan_points": n_scan,
            "stage_field_build_ms": round(t_field * 1e3, 2),
            "stage_terms_pass_ms": round(t_terms * 1e3, 3),
            "stage_map_insert_ms": round(t_ins * 1e3, 2),
            "terms_bytes_moved": int(bytes_moved),
            "terms_pct_hbm_speed_of_light": round(100 * frac_sol, 1)}


# ---------------------------------------------------------------------------
# Config 4: full 6D SLAM with loop closure
# ---------------------------------------------------------------------------

def bench_full_slam(n_poses=40):
    import math

    import jax.numpy as jnp
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.graph.loop_closure import LoopClosureParams
    from tpu_slam.ingest import synthetic as syn
    from tpu_slam.pipeline.config import OdometryConfig, SLAMConfig
    from tpu_slam.pipeline.metrics import ate_rmse
    from tpu_slam.pipeline.slam import SLAMSystem
    from tpu_slam.registration.icp import ICPParams
    from tpu_slam.registration.ndt import NDTParams

    world = syn.default_office()
    rng = np.random.default_rng(0)
    clouds, gt = [], []
    for k in range(n_poses):
        a = 2 * math.pi * k / (n_poses - 1)
        T = syn.se2_pose(2.5 * math.cos(a), 2.5 * math.sin(a),
                         a + math.pi / 2, z=1.2)
        pts, valid = syn.simulate_vlp16_revolution(
            world, T, n_azimuth=900, noise_std=0.01, rng=rng)
        clouds.append(PointCloud.from_points(jnp.asarray(pts[valid]),
                                             capacity=16384))
        gt.append(T)
    gt = np.stack(gt)

    cfg = SLAMConfig(
        odometry=OdometryConfig(scan_capacity=8192, downsample_leaf=0.25,
                                map_leaf=0.5, map_half_extent=16.0,
                                map_capacity=32768,
                                ndt=NDTParams(max_iterations=20)),
        keyframe_translation=0.4, keyframe_capacity=64,
        keyframe_cloud_capacity=4096, loop_every=4,
        loop=LoopClosureParams(
            max_distance=1.5, min_index_gap=8, max_candidates=4,
            icp=ICPParams(max_iterations=25, max_corr_dist=1.0,
                          huber_delta=0.3)),
        edge_capacity=256)
    slam = SLAMSystem(cfg)
    # warm-up (compile every stage incl. loop verify + graph solve)
    slam.run(clouds[:10], init_pose=jnp.asarray(gt[0], jnp.float32))

    slam2 = SLAMSystem(cfg)
    t0 = time.perf_counter()
    poses, state = slam2.run(clouds, init_pose=jnp.asarray(gt[0],
                                                           jnp.float32))
    dt = time.perf_counter() - t0
    ate = ate_rmse(poses, gt, align=False)
    _log(f"config4 slam: {n_poses/dt:.1f} scans/s, ate={ate:.3f} m, "
         f"{state.n_keyframes} kf, {state.n_loop_closures} loops")
    return {"scans_per_sec": round(n_poses / dt, 2),
            "ate_m": round(float(ate), 4),
            "n_loop_closures": int(state.n_loop_closures),
            "n_keyframes": int(state.n_keyframes)}


# ---------------------------------------------------------------------------
# Config 5: multi-device sharded NDT scaling (virtual mesh or real slice)
# ---------------------------------------------------------------------------

def bench_multichip(reps=5):
    import jax

    if len(jax.devices()) < 2:
        _log("config5 skipped: 1 device visible (scaling curve runs on the "
             "8-device virtual CPU mesh: JAX_PLATFORMS=cpu XLA_FLAGS="
             "--xla_force_host_platform_device_count=8 python bench.py "
             "--configs 5)")
        return {"skipped": "single device"}

    import jax.numpy as jnp
    from tpu_slam.core import se3
    from tpu_slam.distributed.map_shard import (empty_sharded_map,
                                                insert_cloud_sharded,
                                                ndt_register_sharded)
    from tpu_slam.distributed.mesh import make_mesh
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.registration.ndt import NDTParams

    clouds, gt = _outdoor_scans(2, n_azimuth=1024, seed=7)
    spec = VoxelGridSpec.centered(leaf=0.5, half_extent=128.0)
    xi = jnp.array([0.15, -0.1, 0.05, 0.02, -0.02, 0.04], jnp.float32)
    src = clouds[0].transform(
        se3.compose(jnp.asarray(gt[0], jnp.float32), se3.inverse(se3.exp(xi))))
    params = NDTParams(max_iterations=10, pack_any_backend=True)

    curve = {}
    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    for n in sizes:
        mesh = make_mesh(n)
        smap = empty_sharded_map(n, 131072 // n)
        for c, T in zip(clouds, gt):
            smap = insert_cloud_sharded(
                mesh, smap, c.transform(jnp.asarray(T, jnp.float32)), spec,
                0.0)

        def run():
            return ndt_register_sharded(mesh, src, smap, spec, params=params,
                                        center=jnp.asarray(gt[0][:3, 3],
                                                           jnp.float32))

        jax.block_until_ready(run().T)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = run()
        jax.block_until_ready(res.T)
        curve[str(n)] = round(reps / (time.perf_counter() - t0), 2)
    _log(f"config5 sharded ndt regs/s by device count: {curve}")
    return {"registrations_per_sec_by_devices": curve}


# ---------------------------------------------------------------------------

def main():
    from tpu_slam.utils.tpu_env import ensure_tpu_compile_env
    ensure_tpu_compile_env()   # Mosaic compile helper needs the TPU type

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", default="1,2,3,4,5",
                   help="comma-separated subset to run (headline = 3)")
    args = p.parse_args()
    want = set(args.configs.split(","))

    import jax
    _log(f"devices: {jax.devices()}")

    results = {}
    if "1" in want:
        results["1_icp_pair"] = bench_icp_pair()
    if "2" in want:
        results["2_odometry"] = bench_odometry()
    if "3" in want:
        results["3_ndt_register"] = bench_ndt_register()
    if "4" in want:
        results["4_full_slam"] = bench_full_slam()
    if "5" in want:
        results["5_multichip"] = bench_multichip()

    headline = results.get("3_ndt_register", {}).get(
        "registrations_per_sec", 0.0)
    print(json.dumps({
        "metric": "ndt_scan_to_map_registrations_per_sec",
        "value": headline,
        "unit": "scans/s (1 chip, 32k-pt scan, 100k+-voxel outdoor map)",
        "vs_baseline": round(headline / BASELINE_SCANS_PER_SEC, 3),
        "configs": results,
    }))


if __name__ == "__main__":
    main()
