from tpu_slam.kernels.voxel_hash import VoxelGridSpec, voxel_keys, sort_by_key
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.kernels.nn_search import nearest_neighbors, nearest_neighbors_hash

__all__ = [
    "VoxelGridSpec",
    "voxel_keys",
    "sort_by_key",
    "voxel_downsample",
    "nearest_neighbors",
    "nearest_neighbors_hash",
]
