"""Pin down the XLA gather/scatter performance cliff on the chip.

All jits defined ONCE and reused (re-jitting per call times the compiler).
Questions:
  - where is the take cliff between 65k idx (0.035 ms) and 262k (10.3 ms)?
  - does .at[].get(mode='promise_in_bounds', unique/sorted) dodge it?
  - what do the terms-pass tier-9 / tier-0 gathers cost under each mode?
  - scatter-add/set flavors at insert sizes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_take_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=10):
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
def take_fill(s, i):
    return jnp.take(s, i, axis=0)


@jax.jit
def take_clip(s, i):
    return jnp.take(s, i, axis=0, mode="clip")


@jax.jit
def get_promise(s, i):
    return s.at[i].get(mode="promise_in_bounds")


@jax.jit
def get_promise_sorted(s, i):
    return s.at[i].get(mode="promise_in_bounds", indices_are_sorted=True)


@jax.jit
def get_promise_unique(s, i):
    return s.at[i].get(mode="promise_in_bounds", unique_indices=True)


N = 32768
D3 = jnp.array([-1, 0, 1], jnp.int32)


@jax.jit
def tier9_clip(rows, key):
    starts = jnp.clip(key[:, None] + D3 * 4096, 0, rows.shape[0] - 1)
    r = jnp.take(rows, starts, axis=0)
    return jnp.sum(r.reshape(N, 27, 16), axis=(1, 2))


@jax.jit
def tier9_promise(rows, key):
    starts = key[:, None] + D3 * 4096
    r = rows.at[starts].get(mode="promise_in_bounds")
    return jnp.sum(r.reshape(N, 27, 16), axis=(1, 2))


@jax.jit
def tier0_promise(rows, key):
    idx = key[:, None] + jnp.arange(-13, 14, dtype=jnp.int32)
    r = rows.at[idx].get(mode="promise_in_bounds")
    return jnp.sum(r, axis=(1, 2))


@jax.jit
def scat_add_drop(b, i, v):
    return b.at[i].add(v, mode="drop")


@jax.jit
def scat_add_promise(b, i, v):
    return b.at[i].add(v, mode="promise_in_bounds")


@jax.jit
def scat_set_promise_unique(b, i, v):
    return b.at[i].set(v, mode="promise_in_bounds", unique_indices=True)


@jax.jit
def scat_set_drop(b, i, v):
    return b.at[i].set(v, mode="drop")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    C = 262144
    src33 = jnp.asarray(rng.normal(size=(C, 3, 3)), jnp.float32)
    src16 = jnp.asarray(rng.normal(size=(C, 16)), jnp.float32)
    src144 = jnp.asarray(rng.normal(size=(C, 144)), jnp.float32)

    for n in (65536, 98304, 131072, 196608, 262144):
        idx = jnp.asarray(rng.integers(0, C, n), jnp.int32)
        sidx = jnp.sort(idx)
        timeit(f"take {n//1024}k idx (262k,3,3) fill", take_fill, src33, idx)
        timeit(f"get  {n//1024}k idx promise", get_promise, src33, idx)
        timeit(f"get  {n//1024}k SORTED promise+sorted",
               get_promise_sorted, src33, sidx)

    perm = jnp.asarray(rng.permutation(C), jnp.int32)
    timeit("get 262k PERM promise+unique", get_promise_unique, src33, perm)

    key = jnp.asarray(rng.integers(4096, C - 4096, N), jnp.int32)
    skey = jnp.sort(key)
    timeit("tier9 32k pts clip", tier9_clip, src144, key)
    timeit("tier9 32k pts promise", tier9_promise, src144, key)
    timeit("tier9 32k SORTED promise", tier9_promise, src144, skey)
    timeit("tier0 32k pts x27 promise", tier0_promise, src16, skey)

    S = 65536
    idxs = jnp.asarray(rng.integers(0, C, S), jnp.int32)
    upd33 = jnp.asarray(rng.normal(size=(S, 3, 3)), jnp.float32)
    upd16 = jnp.asarray(rng.normal(size=(S, 16)), jnp.float32)
    timeit("scatter-add (65k,3,3) drop", scat_add_drop, src33, idxs, upd33)
    timeit("scatter-add (65k,3,3) promise", scat_add_promise,
           src33, idxs, upd33)
    timeit("scatter-set (65k,16) promise+unique", scat_set_promise_unique,
           src16, idxs, upd16)
    timeit("scatter-set (65k,16) drop", scat_set_drop, src16, idxs, upd16)


if __name__ == "__main__":
    main()
