import time
import numpy as np, jax, jax.numpy as jnp
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.kernels.voxel_hash import VoxelGridSpec
from tpu_slam.mapping.voxel_map import empty_map, insert_cloud, scan_to_voxel_stats, insert_scan_stats
from tpu_slam.registration.ndt import NDTParams, ndt_field, ndt_register
from tpu_slam.pipeline.config import OdometryConfig

cfg = OdometryConfig(scan_capacity=8192, ndt=NDTParams(max_iterations=20, coarse_iterations=8))
spec = cfg.map_spec(); sspec = cfg.scan_spec()
world = syn.default_office()
T0 = np.eye(4); T0[:3,3] = [0,0,1.5]
p, v = syn.simulate_vlp16_revolution(world, T0, n_azimuth=540, noise_std=0.01, rng=np.random.default_rng(0))
cloud = PointCloud.from_points(jnp.asarray(p[v]), capacity=16384)
vmap = insert_cloud(empty_map(cfg.map_capacity), cloud.transform(jnp.asarray(T0, jnp.float32)), spec, 0.0)
params = cfg.ndt
center = jnp.asarray([0.,0.,1.5], jnp.float32)
field = ndt_field(vmap, spec, params, center=center)
jax.block_until_ready(field.nbr_rows)
scan = voxel_downsample(cloud, sspec, capacity=cfg.scan_capacity)
Tj = jnp.asarray(T0, jnp.float32)

def bench(name, f, *a, reps=20):
    ff = jax.jit(f)
    o = ff(*a); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t = time.perf_counter()
    for _ in range(reps):
        o = ff(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print("%-26s %.2f ms" % (name, (time.perf_counter()-t)/reps*1e3))

bench("downsample 16k->8k", lambda c: voxel_downsample(c, sspec, capacity=cfg.scan_capacity), cloud)
bench("register (8k cap)", lambda s: ndt_register(s, field, spec, init_T=Tj, params=params).T, scan)
bench("scan_to_voxel_stats", lambda c: scan_to_voxel_stats(c, spec), cloud)
stats = jax.jit(lambda c: scan_to_voxel_stats(c, spec))(cloud)
bench("insert_scan_stats", lambda st: insert_scan_stats(
    empty_map(cfg.map_capacity), *st, jnp.float32(1.0)), stats)
bench("field build", lambda: ndt_field(vmap, spec, params, center=center).nbr_rows)
