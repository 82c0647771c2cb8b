"""Verify: does flattening gather indices to 1-D put jnp.take on the fast path?

Round-3 probes: (N,) idx takes run at 70-370 GB/s, but the terms-pass
gathers use (N,3)/(N,27) idx arrays and run at ~10 GB/s. If reshaping fixes
it, registration/ndt.py needs a two-line change, not a kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_flatidx_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 32768
C = 262144
D3 = jnp.array([-1, 0, 1], jnp.int32)


def timeit(name, fn, *args, reps=20):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa
        print(f"{name:56s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} {dt*1e3:9.3f} ms")
    return dt


@jax.jit
def tier9_2d(rows, key):
    starts = key[:, None] + D3 * 4096            # (N, 3)
    r = rows.at[starts].get(mode="promise_in_bounds")
    return jnp.sum(r.reshape(N, 27, 16), axis=(1, 2))


@jax.jit
def tier9_flat(rows, key):
    starts = (key[:, None] + D3 * 4096).reshape(-1)   # (3N,)
    r = rows.at[starts].get(mode="promise_in_bounds")  # (3N, 144)
    return jnp.sum(r.reshape(N, 27, 16), axis=(1, 2))


@jax.jit
def tier0_flat(rows16, key):
    idx = (key[:, None] + jnp.arange(-13, 14, dtype=jnp.int32)).reshape(-1)
    r = rows16.at[idx].get(mode="promise_in_bounds")   # (27N, 16)
    return jnp.sum(r.reshape(N, 27, 16), axis=(1, 2))


@jax.jit
def tier9_flat_full_math(rows, key, pts, mask):
    """Flat gather + the real Mahalanobis/terms math of _ndt_terms."""
    starts = (key[:, None] + D3 * 4096).reshape(-1)
    P = rows.at[starts].get(
        mode="promise_in_bounds").reshape(N, 27, 16)
    mus = P[..., 0:3]
    l00, l01, l02 = P[..., 3], P[..., 4], P[..., 5]
    l11, l12, l22 = P[..., 6], P[..., 7], P[..., 8]
    ok = P[..., 9] > 0.5
    r = pts[:, None, :] - mus
    r0, r1, r2 = r[..., 0], r[..., 1], r[..., 2]
    q0 = l00 * r0 + l01 * r1 + l02 * r2
    q1 = l01 * r0 + l11 * r1 + l12 * r2
    q2 = l02 * r0 + l12 * r1 + l22 * r2
    d2 = q0 * r0 + q1 * r1 + q2 * r2
    de2 = r0 * r0 + r1 * r1 + r2 * r2
    gate = ok & mask[:, None] & (de2 < 1.0)
    s = jnp.where(gate, jnp.exp(-0.5 * jnp.minimum(d2 / 4.0, 30.0)), 0.0)
    y = jnp.stack([jnp.sum(s * q0, 1), jnp.sum(s * q1, 1),
                   jnp.sum(s * q2, 1)], axis=1)
    c00 = jnp.sum(s * l00, 1); c01 = jnp.sum(s * l01, 1)
    c02 = jnp.sum(s * l02, 1); c11 = jnp.sum(s * l11, 1)
    c12 = jnp.sum(s * l12, 1); c22 = jnp.sum(s * l22, 1)
    L = jnp.stack([jnp.stack([c00, c01, c02], 1),
                   jnp.stack([c01, c11, c12], 1),
                   jnp.stack([c02, c12, c22], 1)], axis=1)
    phat = jax.vmap(lambda p: jnp.array([
        [0.0, -p[2], p[1]], [p[2], 0.0, -p[0]], [-p[1], p[0], 0.0]]))(pts)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), (N, 3, 3))
    J = jnp.concatenate([eye, -phat], axis=2)
    H = jnp.einsum("nia,nij,njb->ab", J, L, J)
    b = jnp.einsum("nia,ni->a", J, y)
    return H, b, -jnp.sum(s)


def scat_reps(reps):
    rng = np.random.default_rng(1)
    idxs = jnp.asarray(rng.integers(0, C, 65536), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(65536, 3, 3)), jnp.float32)
    base = jnp.asarray(rng.normal(size=(C, 3, 3)), jnp.float32)

    @jax.jit
    def f(b, i, v):
        return b.at[i].add(v, mode="drop")

    timeit(f"scatter-add (65k,3,3) drop reps={reps}", f, base, idxs, upd,
           reps=reps)

    @jax.jit
    def f14(b, i, v):
        return b.at[i].add(v, mode="drop")

    upd14 = jnp.asarray(rng.normal(size=(65536, 14)), jnp.float32)
    base14 = jnp.asarray(rng.normal(size=(C, 14)), jnp.float32)
    timeit(f"scatter-add (65k,14) drop reps={reps}", f14, base14, idxs,
           upd14, reps=reps)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(C, 144)), jnp.float32)
    rows16 = jnp.asarray(rng.normal(size=(C, 16)), jnp.float32)
    key = jnp.asarray(rng.integers(4096, C - 4096, N), jnp.int32)
    pts = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    mask = jnp.ones((N,), bool)

    timeit("tier9 2-D idx (N,3) promise", tier9_2d, rows, key)
    timeit("tier9 FLAT idx (3N,) promise", tier9_flat, rows, key)
    timeit("tier0 FLAT idx (27N,) promise", tier0_flat, rows16, key)
    timeit("tier9 FLAT + full terms math", tier9_flat_full_math,
           rows, key, pts, mask)
    scat_reps(10)
    scat_reps(50)


if __name__ == "__main__":
    main()
