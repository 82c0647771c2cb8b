import time
import numpy as np, jax, jax.numpy as jnp
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.voxel_hash import VoxelGridSpec
from tpu_slam.mapping.voxel_map import empty_map, insert_cloud, build_dense_lookup, neighborhood_moments, voxel_means, voxel_covariances
from tpu_slam.registration import ndt as N

world = syn.default_office()
T0 = np.eye(4); T0[:3,3] = [0,0,1.5]
pts_, valid = syn.simulate_vlp16_revolution(world, T0, n_azimuth=720, noise_std=0.01, rng=np.random.default_rng(0))
cloud = PointCloud.from_points(jnp.asarray(pts_[valid]), capacity=16384)

for he, cap in ((16.0, 16384), (100.0, 131072)):
    spec = VoxelGridSpec.centered(leaf=0.5, half_extent=he)
    vmap = insert_cloud(empty_map(cap), cloud.transform(jnp.asarray(T0, jnp.float32)), spec, 0.0)
    jax.block_until_ready(vmap.count)
    def t_(name, f, reps=5):
        o = jax.jit(f)(); jax.block_until_ready(o)
        t = time.perf_counter()
        for _ in range(reps): o = jax.jit(f)()
        jax.block_until_ready(o)
        print("  %-28s %.2f ms" % (name, (time.perf_counter()-t)/reps*1e3))
    print("half_extent", he, "cap", cap, "bits", spec.dim_bits)
    t_("neighborhood_moments", lambda: neighborhood_moments(vmap, spec))
    cnt, means, cov = neighborhood_moments(vmap, spec)
    t_("eigh+info", lambda: jnp.linalg.eigh(cov))
