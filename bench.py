"""Headline benchmark: NDT scan-to-map registrations per second, one chip.

The reference publishes no benchmark numbers (BASELINE.md: "published": {});
its SLAM core is an empty submodule. The honest comparison point from
BASELINE.json's north star is the scan-matching rate of single-GPU
CUDA ICP/NDT pipelines of the reference's era, ~10 scans/s on
registration-sized workloads — used here as the vs_baseline denominator.

Workload (per registration): one simulated VLP-16 revolution (11,520 rays)
voxel-downsampled to a 4,096-point scan, registered against a ~2,500-voxel
NDT field with a perturbed init — the exact hot path of the odometry loop
(pipeline.odometry). Timing excludes compilation (one warm-up), includes
everything else (correspondence probes, LM loop, device sync).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 10.0


def main():
    import jax
    import jax.numpy as jnp

    from tpu_slam.core import se3
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.ingest import synthetic as syn
    from tpu_slam.kernels.downsample import voxel_downsample
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.mapping.voxel_map import empty_map, insert_cloud
    from tpu_slam.registration.ndt import NDTParams, ndt_field, ndt_register

    print(f"# devices: {jax.devices()}", file=sys.stderr)

    world = syn.default_office()
    T0 = np.eye(4)
    T0[:3, 3] = [0, 0, 1.5]
    pts, valid = syn.simulate_vlp16_revolution(world, T0, n_azimuth=720,
                                               noise_std=0.01,
                                               rng=np.random.default_rng(0))
    cloud = PointCloud.from_points(jnp.asarray(pts[valid]), capacity=16384)

    map_spec = VoxelGridSpec.centered(leaf=0.5, half_extent=16.0)
    scan_spec = VoxelGridSpec.centered(leaf=0.2, half_extent=16.0)
    vmap = insert_cloud(empty_map(16384),
                        cloud.transform(jnp.asarray(T0, jnp.float32)),
                        map_spec, 0.0)
    params = NDTParams(max_iterations=20, coarse_iterations=8)
    field = ndt_field(vmap, map_spec, params)
    jax.block_until_ready(field.info)

    scan = voxel_downsample(cloud, scan_spec, capacity=4096)
    print(f"# scan points: {int(scan.count())}, map voxels: "
          f"{int(vmap.n_occupied())}", file=sys.stderr)

    # init perturbations (fixed set, reused)
    rng = np.random.default_rng(1)
    inits = []
    for _ in range(8):
        xi = np.r_[rng.normal(0, 0.1, 3), rng.normal(0, 0.03, 3)]
        inits.append(jnp.asarray(
            np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))) @ T0,
            jnp.float32))

    # warm-up / compile
    res = ndt_register(scan, field, map_spec, init_T=inits[0], params=params)
    jax.block_until_ready(res.T)

    reps = 30
    t0 = time.perf_counter()
    for k in range(reps):
        res = ndt_register(scan, field, map_spec, init_T=inits[k % 8],
                           params=params)
    jax.block_until_ready(res.T)
    dt = time.perf_counter() - t0
    scans_per_sec = reps / dt

    print(f"# {reps} registrations in {dt:.3f}s; last iters="
          f"{int(res.iterations)} frac={float(res.matched_fraction):.3f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "ndt_scan_to_map_registrations_per_sec",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s (1 chip)",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
