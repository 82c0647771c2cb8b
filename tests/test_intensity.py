"""Intensity data path: aggregation -> downsample -> keyframe -> descriptor.

The reference delivers RSSI as per-point intensity into the aggregated
cloud (m3d_aggregator.cpp:269-286, 0.01 scale); round-3 verdict missing
#5: the channel died at the downsampler. These tests pin the full path.
"""

import jax.numpy as jnp
import numpy as np

from tpu_slam.core.pointcloud import PointCloud
from tpu_slam.graph.scan_context import ScanContextParams, scan_context
from tpu_slam.kernels.downsample import voxel_downsample
from tpu_slam.kernels.voxel_hash import VoxelGridSpec


def _cloud_with_intensity(seed=0, n=500):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                    rng.uniform(0, 2, n)], 1).astype(np.float32)
    inten = rng.uniform(0.1, 2.0, n).astype(np.float32)
    return PointCloud.from_points_host(pts, capacity=1024,
                                       attrs=inten[:, None]), pts, inten


def test_downsample_carries_intensity_mean():
    cloud, pts, inten = _cloud_with_intensity()
    spec = VoxelGridSpec.centered(leaf=0.5, half_extent=8.0)
    out = voxel_downsample(cloud, spec, capacity=1024)
    assert out.attrs is not None
    mask = np.asarray(out.mask)
    o_pts = np.asarray(out.points)[mask]
    o_int = np.asarray(out.attrs)[mask, 0]
    assert len(o_pts) > 100
    # per-voxel mean: check a few voxels directly
    cell = np.floor((pts + 16.0) / 0.5).astype(int)
    key = cell[:, 0] * 10_000_00 + cell[:, 1] * 1000 + cell[:, 2]
    o_cell = np.floor((o_pts + 16.0) / 0.5).astype(int)
    o_key = o_cell[:, 0] * 10_000_00 + o_cell[:, 1] * 1000 + o_cell[:, 2]
    for i in range(0, len(o_pts), 37):
        sel = key == o_key[i]
        assert sel.any()
        np.testing.assert_allclose(o_int[i], inten[sel].mean(), rtol=1e-4)


def test_scan_context_intensity_channel():
    cloud, _, inten = _cloud_with_intensity()
    p0 = ScanContextParams(max_range=8.0)
    p1 = ScanContextParams(max_range=8.0, intensity_weight=1.0)
    d0 = scan_context(cloud, p0)
    d1 = scan_context(cloud, p1)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # zero-intensity cloud: both agree
    z = PointCloud(points=cloud.points, mask=cloud.mask,
                   attrs=jnp.zeros_like(cloud.attrs))
    np.testing.assert_allclose(np.asarray(scan_context(z, p1)),
                               np.asarray(d0), atol=1e-6)


def test_aggregator_to_keyframe_intensity():
    """Lines with intensity -> aggregated cloud -> downsample -> keyframe
    storage keeps the channel alive end to end."""
    import math

    from tpu_slam.ingest.aggregator import AggregatorConfig, ScanAggregator
    from tpu_slam.pipeline.config import OdometryConfig, SLAMConfig
    from tpu_slam.pipeline.slam import SLAMSystem
    from tpu_slam.registration.ndt import NDTParams

    agg = ScanAggregator(AggregatorConfig(capacity=8192, line_length=128,
                                          angular_threshold=1.1 * math.pi))
    state = agg.init_state()
    rng = np.random.default_rng(0)
    for k in range(80):
        ang = -2.0 * math.pi * 1.3 * k / 80
        c, s = math.cos(ang), math.sin(ang)
        T = jnp.asarray([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0.5],
                         [0, 0, 0, 1]], jnp.float32)
        pts = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
        inten = rng.uniform(0.5, 1.5, 128).astype(np.float32)
        state = agg.add_line(state, jnp.asarray(pts),
                             jnp.ones((128,), bool), T, jnp.asarray(inten))
    assert bool(agg.ready(state))
    cloud, state = agg.emit(state)
    assert cloud.attrs is not None
    assert float(jnp.max(cloud.attrs)) > 0.4

    slam = SLAMSystem(SLAMConfig(
        odometry=OdometryConfig(scan_capacity=4096, downsample_leaf=0.3,
                                map_leaf=0.5, map_half_extent=16.0,
                                map_capacity=16384,
                                ndt=NDTParams(max_iterations=5))))
    st = slam.init_state()
    st, _ = slam.step(st, cloud)
    assert st.n_keyframes == 1
    ki = np.asarray(st.kf_intensity[0])
    km = np.asarray(st.kf_mask[0])
    assert km.any()
    assert ki[km].max() > 0.4          # intensity survived to the keyframe
