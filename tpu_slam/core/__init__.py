from tpu_slam.core import se3
from tpu_slam.core.pointcloud import PointCloud

__all__ = ["se3", "PointCloud"]
