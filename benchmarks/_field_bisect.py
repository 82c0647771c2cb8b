import time
import numpy as np, jax, jax.numpy as jnp
from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.core.sym3 import floored_info_sym3
from tpu_slam.ingest import synthetic as syn
from tpu_slam.kernels.voxel_hash import VoxelGridSpec, INVALID_KEY
from tpu_slam.mapping.voxel_map import empty_map, insert_cloud, decode_corner
from tpu_slam.registration import ndt as N

world = syn.default_office()
T0 = np.eye(4); T0[:3,3] = [0,0,1.5]
pts_, valid = syn.simulate_vlp16_revolution(world, T0, n_azimuth=720, noise_std=0.01, rng=np.random.default_rng(0))
cloud = PointCloud.from_points(jnp.asarray(pts_[valid]), capacity=16384)
spec = VoxelGridSpec.centered(leaf=0.5, half_extent=100.0)
vmap = insert_cloud(empty_map(131072), cloud.transform(jnp.asarray(T0, jnp.float32)), spec, 0.0)
params = N.NDTParams(max_iterations=20, coarse_iterations=8)
center = jnp.asarray([0., 0., 1.5], jnp.float32)
jax.block_until_ready(vmap.count)

def bench(name, f, reps=20):
    o = jax.jit(f)(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t = time.perf_counter()
    for _ in range(reps): o = jax.jit(f)()
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print("%-28s %.2f ms" % (name, (time.perf_counter()-t)/reps*1e3))

bench("full dense field", lambda: N._ndt_field_dense(vmap, spec, params, center))

b = spec.dim_bits; n = spec.cells_per_axis
wb = 6; w = 64; g = 1 << 18
keys = vmap.keys
occ = vmap.occupied_mask()
iu0, iu1 = jnp.triu_indices(3)

def upto_scatter():
    gx = (keys >> (2*b)) & (n-1); gy = (keys >> b) & (n-1); gz = keys & (n-1)
    origin = jnp.asarray(spec.origin, jnp.float32)
    cc = jnp.floor((center - origin) / spec.leaf).astype(jnp.int32)
    c0 = jnp.clip(cc - w//2, 0, n - w)
    lx, ly, lz = gx - c0[0], gy - c0[1], gz - c0[2]
    inside = occ & (lx>=0)&(lx<w)&(ly>=0)&(ly<w)&(lz>=0)&(lz<w)
    lidx = jnp.where(inside, (lx << (2*wb)) | (ly << wb) | lz, g)
    chan = jnp.concatenate([vmap.count[:,None], vmap.sum_pts,
                            vmap.sum_outer[:, iu0, iu1],
                            jnp.ones((vmap.capacity,1), jnp.float32)], 1)
    chan = jnp.where(inside[:,None], chan, 0.0)
    dm = jnp.zeros((g+1, 11), jnp.float32).at[lidx].set(chan, mode="drop")[:g]
    return dm
bench("scatter stage", upto_scatter)

def tri_only():
    return vmap.sum_outer[:, iu0, iu1]
bench("triu gather only", tri_only)

dm = jax.jit(upto_scatter)()
jax.block_until_ready(dm)
def passes():
    a = dm[:, :10].reshape(w, w, w, 10)
    for axis in (2,1,0):
        a = N._nbr_moment_pass(a, axis, spec.leaf)
    return a
bench("moment passes", passes)

a10 = jax.jit(passes)()
jax.block_until_ready(a10)
def stats():
    a = a10.reshape(g, 10)
    cnt = a[:,0]; safe = jnp.maximum(cnt, 1.0)
    mean_local = a[:,1:4]/safe[:,None]
    o = a[:,4:10]/safe[:,None]
    cov = jnp.stack([jnp.stack([o[:,0],o[:,1],o[:,2]],-1),
                     jnp.stack([o[:,1],o[:,3],o[:,4]],-1),
                     jnp.stack([o[:,2],o[:,4],o[:,5]],-1)],-2)
    cov = cov - mean_local[:,:,None]*mean_local[:,None,:]
    return floored_info_sym3(cov, 0.01)
bench("stats+sym3", stats)

rows16 = jnp.zeros((g,16), jnp.float32)
bench("pack rolls", lambda: N._pack_neighbor_rows(rows16, wb, 9))
