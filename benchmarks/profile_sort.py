"""Microbenchmark: lax.sort variants vs handwritten bitonic on TPU.

The BWT prefix-doubling kernel is built out of large 1-D sorts; this
measures the per-sort floor to pick the primitive.
Run: python benchmarks/profile_sort.py [--n 1048576]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def bench(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def bitonic_sort_pairs(key, payload):
    """Handwritten bitonic sort (ascending) of (key, payload), n = 2^p.

    Every compare-exchange stage is a reshape + elementwise min/max —
    no scatters, no gathers; direction masks come from iota bits.
    """
    import jax.numpy as jnp
    from jax.lax import broadcasted_iota

    n = key.shape[0]
    assert n & (n - 1) == 0
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            kk = key.reshape(n // (2 * j), 2, j)
            pp = payload.reshape(n // (2 * j), 2, j)
            a_k, b_k = kk[:, 0, :], kk[:, 1, :]
            a_p, b_p = pp[:, 0, :], pp[:, 1, :]
            # ascending iff bit log2(k) of global index is 0
            g = broadcasted_iota(jnp.int32, (n // (2 * j), j), 0)
            l = broadcasted_iota(jnp.int32, (n // (2 * j), j), 1)
            idx = g * (2 * j) + l
            asc = (idx & k) == 0
            swap = jnp.where(asc, a_k > b_k, a_k < b_k)
            lo_k = jnp.where(swap, b_k, a_k)
            hi_k = jnp.where(swap, a_k, b_k)
            lo_p = jnp.where(swap, b_p, a_p)
            hi_p = jnp.where(swap, a_p, b_p)
            key = jnp.stack([lo_k, hi_k], axis=1).reshape(n)
            payload = jnp.stack([lo_p, hi_p], axis=1).reshape(n)
            j //= 2
        k *= 2
    return key, payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    n = args.n

    import jax
    import jax.numpy as jnp

    print(f"n={n} backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.int32))
    k2 = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)

    f = jax.jit(lambda a, i: jax.lax.sort((a, i), num_keys=1, is_stable=False))
    dt = bench(f, k1, idx, reps=args.reps)
    print(f"lax.sort 1key 2op unstable: {dt*1e3:9.2f} ms")

    f = jax.jit(lambda a, i: jax.lax.sort((a, i), num_keys=1, is_stable=True))
    dt = bench(f, k1, idx, reps=args.reps)
    print(f"lax.sort 1key 2op stable:   {dt*1e3:9.2f} ms")

    f = jax.jit(
        lambda a, b, i: jax.lax.sort((a, b, i), num_keys=2, is_stable=False)
    )
    dt = bench(f, k1, k2, idx, reps=args.reps)
    print(f"lax.sort 2key 3op unstable: {dt*1e3:9.2f} ms")

    f = jax.jit(
        lambda a, b, i: jax.lax.sort((a, b, i), num_keys=2, is_stable=True)
    )
    dt = bench(f, k1, k2, idx, reps=args.reps)
    print(f"lax.sort 2key 3op stable:   {dt*1e3:9.2f} ms")

    f = jax.jit(
        lambda a, b, c, d, i: jax.lax.sort(
            (a, b, c, d, i), num_keys=4, is_stable=False
        )
    )
    dt = bench(f, k1, k2, k1, k2, idx, reps=args.reps)
    print(f"lax.sort 4key 5op unstable: {dt*1e3:9.2f} ms")

    f = jax.jit(bitonic_sort_pairs)
    dt = bench(f, k1, idx, reps=args.reps)
    print(f"bitonic 1key+payload:       {dt*1e3:9.2f} ms")

    # int64 packed single-key sort (key<<20 | key2 style packing)
    k64 = k1.astype(jnp.int64) << 20 | k2.astype(jnp.int64)
    f = jax.jit(lambda a, i: jax.lax.sort((a, i), num_keys=1, is_stable=False))
    dt = bench(f, k64, idx, reps=args.reps)
    print(f"lax.sort int64 1key 2op:    {dt*1e3:9.2f} ms")

    # gather and scatter floors at this size
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    f = jax.jit(lambda x, p: x[p])
    dt = bench(f, k1, perm, reps=args.reps)
    print(f"random gather n:            {dt*1e3:9.2f} ms")

    f = jax.jit(lambda x, p: jnp.zeros(n, jnp.int32).at[p].set(x))
    dt = bench(f, k1, perm, reps=args.reps)
    print(f"random scatter n:           {dt*1e3:9.2f} ms")

    f = jax.jit(lambda x: jnp.cumsum(x))
    dt = bench(f, k1, reps=args.reps)
    print(f"cumsum n:                   {dt*1e3:9.2f} ms")

    # searchsorted: n queries over 4096 boundaries and vice versa
    b4k = jnp.sort(jnp.asarray(rng.integers(0, 1 << 20, 4096, dtype=np.int32)))
    f = jax.jit(lambda b, q: jnp.searchsorted(b, q))
    dt = bench(f, b4k, k1, reps=args.reps)
    print(f"searchsorted n q over 4k:   {dt*1e3:9.2f} ms")
    srt = jnp.sort(k1)
    f = jax.jit(lambda b, q: jnp.searchsorted(b, q))
    dt = bench(f, srt, b4k, reps=args.reps)
    print(f"searchsorted 4k q over n:   {dt*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
