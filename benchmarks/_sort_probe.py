"""Microbenchmark: sort / searchsorted / scatter costs on the chip.

The round-2 map insert costs 112.8 ms/scan; it is built from argsorts of
(capacity + scan) keys with full moment payloads. This measures each
primitive at the real sizes so the incremental-insert redesign targets the
actual cost model:

  - jnp.argsort at 65k / 294k int32
  - lax.sort with payload
  - searchsorted: 65k and 8k queries into a 262k sorted array
  - scatter-add of (S, 3, 3) moments at S=65k indices
  - dense cumsum at 262k
  - segment_sum at 65k

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/_sort_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, reps=10):
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    C = 262144
    S = 65536
    NEW = 8192
    k65 = jnp.asarray(rng.integers(0, 1 << 27, S), jnp.int32)
    k294 = jnp.asarray(rng.integers(0, 1 << 27, C + S), jnp.int32)
    kmap = jnp.sort(jnp.asarray(rng.integers(0, 1 << 27, C), jnp.int32))
    q8 = jnp.asarray(rng.integers(0, 1 << 27, NEW), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(S, 3, 3)), jnp.float32)
    pay65 = jnp.asarray(rng.normal(size=(S, 14)), jnp.float32)
    idx65 = jnp.asarray(rng.integers(0, C, S), jnp.int32)
    big = jnp.asarray(rng.normal(size=(C, 3, 3)), jnp.float32)

    timeit("argsort 65k int32", lambda: jax.jit(jnp.argsort)(k65))
    timeit("argsort 294k int32", lambda: jax.jit(jnp.argsort)(k294))
    timeit("sort 65k keys only", lambda: jax.jit(jnp.sort)(k65))

    sort_pay = jax.jit(lambda k, p: jax.lax.sort(
        (k, p), dimension=0, num_keys=1))
    timeit("lax.sort 65k + (65k,14) payload",
           lambda: sort_pay(k65, pay65))

    ss = jax.jit(jnp.searchsorted)
    timeit("searchsorted 65k queries in 262k",
           lambda: ss(kmap, k65))
    timeit("searchsorted 8k queries in 262k",
           lambda: ss(kmap, q8))
    timeit("searchsorted 262k queries in 8k",
           lambda: ss(jnp.sort(q8), kmap))

    scat = jax.jit(lambda b, i, v: b.at[i].add(v, mode="drop"))
    timeit("scatter-add (65k,3,3) into (262k,3,3)",
           lambda: scat(big, idx65, vals))

    scat1 = jax.jit(lambda b, i, v: b.at[i].add(v, mode="drop"))
    timeit("scatter-add (65k,) into (262k,)",
           lambda: scat1(jnp.zeros((C,), jnp.float32), idx65, vals[:, 0, 0]))

    timeit("cumsum 262k f32",
           lambda: jax.jit(jnp.cumsum)(big[:, 0, 0]))

    seg = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=S))
    sidx = jnp.sort(idx65) % S
    timeit("segment_sum (65k,14) -> 65k segs",
           lambda: seg(pay65, sidx))

    tk = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    timeit("take (65k idx) from (262k,3,3)",
           lambda: tk(big, idx65))
    timeit("take (262k idx) from (262k,3,3)",
           lambda: tk(big, jnp.asarray(rng.integers(0, C, C), jnp.int32)))

    # one-hot matmul rank-within-segment alternative for small domains
    timeit("scatter-max 65k keys into 262k",
           lambda: jax.jit(lambda b, i, v: b.at[i].max(v, mode="drop"))(
               jnp.zeros((C,), jnp.int32), idx65, k65))


if __name__ == "__main__":
    main()
