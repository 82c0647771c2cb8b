import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam.core import se3


def random_xi(rng, scale_t=1.0, scale_r=1.0):
    v = rng.normal(size=3) * scale_t
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0, np.pi * 0.95) * scale_r
    return jnp.asarray(np.concatenate([v, w]), dtype=jnp.float32)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        xi = random_xi(rng)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_exp_zero_is_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(T, jnp.eye(4), atol=1e-6)


def test_small_angle_stability():
    xi = jnp.array([1e-9, -2e-9, 3e-9, 1e-9, 1e-9, -1e-9], dtype=jnp.float32)
    T = se3.exp(xi)
    assert bool(jnp.all(jnp.isfinite(T)))
    np.testing.assert_allclose(T, jnp.eye(4), atol=1e-6)


def test_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = jnp.asarray(axis * (np.pi - 1e-4), dtype=jnp.float32)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.abs(w), np.abs(np.asarray(w2)), atol=1e-2)
    R2 = se3.so3_exp(w2)
    np.testing.assert_allclose(R, R2, atol=1e-3)


def test_inverse_compose():
    rng = np.random.default_rng(1)
    T = se3.exp(random_xi(rng))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(I, jnp.eye(4), atol=1e-5)


def test_apply_matches_matmul():
    rng = np.random.default_rng(2)
    T = se3.exp(random_xi(rng))
    pts = jnp.asarray(rng.normal(size=(100, 3)), dtype=jnp.float32)
    out = se3.apply(T, pts)
    hom = jnp.concatenate([pts, jnp.ones((100, 1))], axis=1)
    expected = (hom @ np.asarray(T).T)[:, :3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        w = rng.normal(size=3)
        R = se3.so3_exp(jnp.asarray(w, dtype=jnp.float32))
        q = se3.quat_from_matrix(R)
        np.testing.assert_allclose(jnp.linalg.norm(q), 1.0, atol=1e-5)
        R2 = se3.quat_to_matrix(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)


def test_quat_angle_between():
    q1 = se3.quat_from_euler(jnp.float32(0), jnp.float32(0), jnp.float32(0))
    q2 = se3.quat_from_euler(jnp.float32(0), jnp.float32(0), jnp.float32(0.5))
    ang = se3.quat_angle_between(q1, q2)
    np.testing.assert_allclose(ang, 0.5, atol=1e-5)


def test_vmap_batching():
    rng = np.random.default_rng(4)
    xis = jnp.asarray(rng.normal(size=(8, 6)) * 0.3, dtype=jnp.float32)
    Ts = se3.exp_batch(xis)
    assert Ts.shape == (8, 4, 4)
    back = se3.log_batch(Ts)
    np.testing.assert_allclose(xis, back, atol=1e-4)


def test_sym3_eigvals_match_eigh():
    from tpu_slam.core.sym3 import eigvals_sym3, inv_sym3, floored_info_sym3
    rng = np.random.default_rng(0)
    # random PSD batch incl. degenerate (planar/linear) spectra
    q, _ = np.linalg.qr(rng.normal(size=(512, 3, 3)))
    lam = np.abs(rng.normal(size=(512, 3))) * 0.1
    lam[:128, 0] = 0.0                       # planar
    lam[128:192, :2] = 0.0                   # linear
    lam[192:224, :] = lam[192:224, 2:3]      # isotropic (repeated)
    cov = np.einsum("nij,nj,nkj->nik", q, lam, q).astype(np.float32)
    got = np.sort(np.asarray(eigvals_sym3(jnp.asarray(cov))), axis=-1)
    want = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=2e-4)

    # closed-form inverse on well-conditioned members
    wc = cov[256:] + 0.01 * np.eye(3, dtype=np.float32)
    inv = np.asarray(inv_sym3(jnp.asarray(wc)))
    np.testing.assert_allclose(inv @ wc, np.broadcast_to(np.eye(3), inv.shape),
                               atol=1e-3)

    # floored info must reproduce the eigh hard-floor chain exactly
    info = np.asarray(floored_info_sym3(jnp.asarray(cov), 0.01))
    assert np.all(np.linalg.eigvalsh(info) > 0)
    w, v = np.linalg.eigh(cov.astype(np.float64))
    f = 0.01 * np.maximum(w[:, 2:3], 1e-9)
    ref = np.einsum("nij,nj,nkj->nik", v, 1.0 / np.maximum(w, f), v)
    rel = (np.abs(info - ref)
           / np.linalg.norm(ref, axis=(1, 2), keepdims=True)).max()
    assert rel < 1e-3, rel
