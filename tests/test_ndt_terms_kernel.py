"""Pallas NDT terms kernel: raster build, kernel-vs-reference parity, and
parity with registration.ndt._ndt_terms at the stage-start pose.

The kernel runs in interpret mode here (CPU conftest backend); the real
Mosaic compile is exercised on the chip by bench.py config 3.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_slam.kernels.ndt_terms import (build_terms_raster, ndt_terms_raster,
                                        ndt_terms_raster_reference,
                                        raster_to_slots, rows_to_planes)

pytestmark = pytest.mark.slow

DIMS = (8, 8, 16)          # Wy*Wz = 128 = one lane tile
Q = 2
LEAF = 0.5


def _synthetic_field(seed=0, occupancy=0.7):
    """Random rows16 over the window: mean near cell center, SPD Lambda."""
    rng = np.random.default_rng(seed)
    wx, wy, wz = DIMS
    g = wx * wy * wz
    cell = np.stack(np.meshgrid(np.arange(wx), np.arange(wy), np.arange(wz),
                                indexing="ij"), -1).reshape(g, 3)
    mean = (cell + 0.5) * LEAF + rng.normal(0, 0.08, (g, 3))
    a = rng.normal(0, 1, (g, 3, 3))
    cov = a @ a.transpose(0, 2, 1) * 0.01 + 0.02 * np.eye(3)
    lam = np.linalg.inv(cov)
    valid = rng.uniform(size=g) < occupancy
    iu = np.triu_indices(3)
    rows = np.zeros((g, 16), np.float32)
    rows[:, 0:3] = mean
    rows[:, 3:9] = lam[:, iu[0], iu[1]]
    rows[:, 9] = valid
    rows[~valid] = 0.0
    return jnp.asarray(rows)


def _scan(n=200, seed=1):
    rng = np.random.default_rng(seed)
    wx, wy, wz = DIMS
    pts = rng.uniform([0.7, 0.7, 0.7],
                      [wx * LEAF - 0.7, wy * LEAF - 0.7, wz * LEAF - 0.7],
                      (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[-20:] = False
    return jnp.asarray(pts), jnp.asarray(mask)


def test_raster_build_places_points():
    pts, mask = _scan(64)
    T0 = jnp.eye(4)
    raster, dropped = build_terms_raster(
        pts, mask, T0, jnp.zeros(3), LEAF, DIMS, Q)
    wx, wy, wz = DIMS
    assert raster.shape == (wx, 4 * Q, 8, wy * wz // 8)
    slots = np.asarray(raster_to_slots(raster, DIMS, Q))
    # every kept point appears exactly once with w=1
    n_placed = int(slots[:, 3].sum())
    assert n_placed + int(dropped) == int(mask.sum())
    # round-trip: collect placed coordinates, compare as sets
    placed = slots[slots[:, 3] > 0.5][:, :3]
    orig = np.asarray(pts)[np.asarray(mask)]
    # with Q=2 some cells may overflow; every placed point must be an
    # original point
    d = np.linalg.norm(placed[:, None, :] - orig[None, :, :], axis=2)
    assert (d.min(axis=1) < 1e-6).all()


def test_raster_respects_pose_binning():
    """Binning happens at T0; the stored coordinates stay source-frame."""
    pts, mask = _scan(32)
    shift = jnp.eye(4).at[0, 3].set(0.9)
    raster, _ = build_terms_raster(pts, mask, shift, jnp.zeros(3), LEAF,
                                   DIMS, Q)
    slots = np.asarray(raster_to_slots(raster, DIMS, Q))
    placed = slots[slots[:, 3] > 0.5][:, :3]
    orig = np.asarray(pts)[np.asarray(mask)]
    d = np.linalg.norm(placed[:, None, :] - orig[None, :, :], axis=2)
    assert (d.min(axis=1) < 1e-6).all()          # source frame preserved
    # the binning used the shifted position: a point near the far x edge
    # at T0 shift falls outside and is dropped
    far = jnp.asarray([[DIMS[0] * LEAF - 0.05, 1.0, 1.0]], jnp.float32)
    r2, dropped2 = build_terms_raster(far, jnp.ones(1, bool), shift,
                                      jnp.zeros(3), LEAF, DIMS, Q)
    assert int(dropped2) == 1


def test_kernel_matches_reference():
    rows = _synthetic_field()
    planes = rows_to_planes(rows, DIMS)
    pts, mask = _scan(300)
    T0 = jnp.eye(4)
    raster, _ = build_terms_raster(pts, mask, T0, jnp.zeros(3), LEAF,
                                   DIMS, Q)
    xi = jnp.asarray([0.03, -0.02, 0.01, 0.02, -0.01, 0.015], jnp.float32)
    from tpu_slam.core import se3
    T = se3.exp(xi)
    gamma = jnp.float32(4.0)

    Hk, bk, ck, mk = ndt_terms_raster(raster, planes, T, gamma, 1.0,
                                      DIMS, Q, interpret=True)
    Hr, br, cr, mr = ndt_terms_raster_reference(raster, planes, T, gamma,
                                                1.0, DIMS, Q)
    np.testing.assert_allclose(np.asarray(Hk), np.asarray(Hr),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(bk), np.asarray(br),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(float(ck), float(cr), rtol=1e-5)
    assert int(mk) == int(mr)
    assert int(mk) > 100                      # the scan actually matched


def test_matches_ndt_terms_at_stage_start():
    """At T == T0 the frozen bins equal the live bins: the raster objective
    must reproduce registration.ndt._ndt_terms on a real dense field."""
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.mapping.voxel_map import empty_map, insert_cloud
    from tpu_slam.registration.ndt import (NDTParams, _ndt_terms, ndt_field)

    rng = np.random.default_rng(3)
    # structured scene: floor + wall patches
    floor = np.stack([rng.uniform(0.5, 7.5, 400), rng.uniform(0.5, 3.5, 400),
                      rng.normal(0.6, 0.02, 400)], 1)
    wall = np.stack([rng.normal(4.0, 0.02, 400), rng.uniform(0.5, 3.5, 400),
                     rng.uniform(0.5, 7.0, 400)], 1)
    pts = jnp.asarray(np.concatenate([floor, wall]), jnp.float32)
    cloud = PointCloud.from_points(pts, capacity=1024)

    spec = VoxelGridSpec(leaf=0.5, origin=(0.0, 0.0, 0.0), dim_bits=4)
    vmap = empty_map(4096)
    vmap = insert_cloud(vmap, cloud, spec, 0.0)
    params = NDTParams(window_bits=4, pack_any_backend=True,
                       min_voxel_count=3.0)
    field = ndt_field(vmap, spec, params)
    assert field.nbr_rows is not None

    scan_pts = pts[::3] + 0.05
    scan = PointCloud.from_points(scan_pts, capacity=512)
    T0 = jnp.eye(4, dtype=jnp.float32)

    H0, b0, c0, frac0 = _ndt_terms(scan.sanitize(), T0, field, spec, params)

    # same objective through the raster path
    from tpu_slam.registration.ndt import _ndt_field_dense
    dims = field.window_dims
    rows16 = _dense_rows_from_field(field, spec, params, vmap)
    planes = rows_to_planes(rows16, dims)
    origin = jnp.asarray(spec.origin, jnp.float32)
    raster, dropped = build_terms_raster(
        scan.sanitize().points, scan.sanitize().mask, T0, origin,
        spec.leaf, dims, 8)
    assert int(dropped) == 0
    Hr, br, cr, mr = ndt_terms_raster_reference(
        raster, planes, T0, jnp.float32(params.score_temperature),
        params.max_corr_dist, dims, 8)

    np.testing.assert_allclose(np.asarray(Hr), np.asarray(H0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(br), np.asarray(b0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(cr), float(c0), rtol=1e-4)
    n_src = float(jnp.sum(scan.sanitize().mask))
    np.testing.assert_allclose(float(mr) / n_src, float(frac0), atol=1e-6)


def _dense_rows_from_field(field, spec, params, vmap):
    """Reconstruct the (G, 16) dense rows from the packed field (the
    nbr_rows center column is exactly rows16)."""
    nbr = field.nbr_rows
    if nbr.shape[1] == 144:
        return nbr[:, 4 * 16:5 * 16]
    return nbr[:, 16:32]


def test_ndt_register_pallas_path_recovers_transform():
    """ndt_register with terms_impl='pallas_interpret' (the integrated
    raster-kernel path) must recover a known perturbation and agree with
    the XLA gather path."""
    import dataclasses

    from tpu_slam.core import se3
    from tpu_slam.core.pointcloud import PointCloud
    from tpu_slam.kernels.voxel_hash import VoxelGridSpec
    from tpu_slam.mapping.voxel_map import empty_map, insert_cloud
    from tpu_slam.registration.ndt import (NDTParams, ndt_field,
                                           ndt_register)

    rng = np.random.default_rng(5)
    floor = np.stack([rng.uniform(0.5, 7.5, 1500),
                      rng.uniform(0.5, 7.5, 1500),
                      rng.normal(0.5, 0.02, 1500)], 1)
    wallx = np.stack([rng.normal(6.0, 0.02, 700),
                      rng.uniform(0.5, 7.5, 700),
                      rng.uniform(0.5, 5.0, 700)], 1)
    wally = np.stack([rng.uniform(0.5, 7.5, 700),
                      rng.normal(6.5, 0.02, 700),
                      rng.uniform(0.5, 5.0, 700)], 1)
    pts = jnp.asarray(np.concatenate([floor, wallx, wally]), jnp.float32)
    cloud = PointCloud.from_points(pts, capacity=4096)

    spec = VoxelGridSpec(leaf=0.5, origin=(0.0, 0.0, 0.0), dim_bits=4)
    vmap = insert_cloud(empty_map(8192), cloud, spec, 0.0)

    xi = jnp.asarray([0.12, -0.09, 0.05, 0.03, -0.02, 0.04], jnp.float32)
    T_true = se3.exp(xi)
    src = cloud.transform(se3.inverse(T_true))

    base = NDTParams(window_bits=4, max_iterations=25, coarse_iterations=5,
                     min_voxel_count=3.0, raster_q=8)
    p_pal = dataclasses.replace(base, terms_impl="pallas_interpret")
    p_xla = dataclasses.replace(base, terms_impl="xla",
                                pack_any_backend=True)

    f_pal = ndt_field(vmap, spec, p_pal)
    assert f_pal.planes is not None and f_pal.nbr_rows is None
    res_pal = ndt_register(src, f_pal, spec, params=p_pal)
    err = se3.log(se3.compose(se3.inverse(T_true), res_pal.T))
    assert float(jnp.linalg.norm(err[:3])) < 0.03, np.asarray(err)
    assert float(jnp.linalg.norm(err[3:])) < 0.02, np.asarray(err)
    assert float(res_pal.matched_fraction) > 0.8

    f_xla = ndt_field(vmap, spec, p_xla)
    res_xla = ndt_register(src, f_xla, spec, params=p_xla)
    d = se3.log(se3.compose(se3.inverse(res_xla.T), res_pal.T))
    # the paths differ by design: raster bins freeze at the register-entry
    # pose while the XLA path re-bins live every pass — they agree to the
    # optimum's basin width, not bit-exactly
    assert float(jnp.linalg.norm(d)) < 0.035, np.asarray(d)
