import time
import numpy as np, jax, jax.numpy as jnp
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.kernels.voxel_hash import VoxelGridSpec
from tpu_slam.mapping.voxel_map import empty_map, insert_cloud
from tpu_slam.registration import ndt as N

world = syn.default_office()
T0 = np.eye(4); T0[:3,3] = [0,0,1.5]
pts_, valid = syn.simulate_vlp16_revolution(world, T0, n_azimuth=720, noise_std=0.01, rng=np.random.default_rng(0))
cloud = PointCloud.from_points(jnp.asarray(pts_[valid]), capacity=16384)
# default odometry spec: 100 m half extent, 0.5 leaf -> dim_bits 9
map_spec = VoxelGridSpec.centered(leaf=0.5, half_extent=100.0)
print("dim_bits:", map_spec.dim_bits, "G:", 1 << (3*map_spec.dim_bits))
vmap = insert_cloud(empty_map(131072), cloud.transform(jnp.asarray(T0, jnp.float32)), map_spec, 0.0)
params = N.NDTParams(max_iterations=20, coarse_iterations=8)
field = N.ndt_field(vmap, map_spec, params)
print("lookup:", None if field.lookup is None else field.lookup.shape,
      "nbr_rows:", None if field.nbr_rows is None else field.nbr_rows.shape)
scan = voxel_downsample(cloud, VoxelGridSpec.centered(0.2, 100.0), capacity=32768).sanitize()
print("scan pts:", int(scan.count()), "capacity:", scan.points.shape[0])
Tj = jnp.asarray(T0, jnp.float32)

REPS = 50
@jax.jit
def run(T):
    def body(i, T):
        H, b, cost, frac = N._ndt_terms(scan, T, field, map_spec, params)
        return T + 1e-14 * (jnp.sum(H) + cost)
    return jax.lax.fori_loop(0, REPS, body, T)
o = run(Tj); jax.block_until_ready(o)
t = time.perf_counter()
o = run(Tj); jax.block_until_ready(o)
print("terms @ default spec: %.3f ms" % ((time.perf_counter()-t)/REPS*1e3))

# field build cost at this size
t = time.perf_counter()
for _ in range(5):
    f2 = N.ndt_field(vmap, map_spec, params)
jax.block_until_ready(f2.info)
print("field build: %.2f ms" % ((time.perf_counter()-t)/5*1e3))
