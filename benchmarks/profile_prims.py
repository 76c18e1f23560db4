"""Second round of primitive costs for the device-path redesign."""

from __future__ import annotations

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


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << 20
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.integers(0, 1 << 28, n, dtype=np.int32))
    k2 = jnp.asarray(rng.integers(0, 1 << 28, n, dtype=np.int32))
    k3 = jnp.asarray(rng.integers(0, 1 << 28, n, dtype=np.int32))
    bp = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))
    bp8 = bp.astype(jnp.uint8)
    idx = jnp.arange(n, dtype=jnp.int32)

    # the BWT fast-path sort: 3 keys + 1 payload
    f = jax.jit(lambda a, b, c, p: jax.lax.sort((a, b, c, p), num_keys=3, is_stable=False))
    print(f"sort 3key+int32 payload 1M:  {bench(f, k1, k2, k3, bp)*1e3:8.2f} ms")
    f = jax.jit(lambda a, b, c, p: jax.lax.sort((a, b, c, p), num_keys=3, is_stable=False))
    print(f"sort 3key+uint8 payload 1M:  {bench(f, k1, k2, k3, bp8)*1e3:8.2f} ms")
    f = jax.jit(lambda a, p: jax.lax.sort((a, p), num_keys=1, is_stable=False))
    print(f"sort 1key+int32 payload 1M:  {bench(f, k1, bp)*1e3:8.2f} ms")

    # batched row sort: 8 x 128k
    k2d = k1.reshape(8, n // 8)
    i2d = jnp.tile(jnp.arange(n // 8, dtype=jnp.int32)[None, :], (8, 1))
    f = jax.jit(lambda a, i: jax.lax.sort((a, i), num_keys=1, is_stable=False, dimension=1))
    print(f"sort (8,131k) rows 1key+pl:  {bench(f, k2d, i2d)*1e3:8.2f} ms")
    k2d64 = k1.reshape(64, n // 64)
    i2d64 = jnp.tile(jnp.arange(n // 64, dtype=jnp.int32)[None, :], (64, 1))
    f = jax.jit(lambda a, i: jax.lax.sort((a, i), num_keys=1, is_stable=False, dimension=1))
    print(f"sort (64,16k) rows 1key+pl:  {bench(f, k2d64, i2d64)*1e3:8.2f} ms")

    # small-table gathers: n lookups from a table of size t
    for t in (256, 2048, 18432):
        tab = jnp.asarray(rng.integers(0, 1 << 20, t, dtype=np.int32))
        q = jnp.asarray(rng.integers(0, t, n, dtype=np.int32))
        f = jax.jit(lambda tab, q: tab[q])
        print(f"gather 1M from {t:6d}-table:  {bench(f, tab, q)*1e3:8.2f} ms")

    # one-hot matmul table lookup: out[i] = tab[q[i]] with q < 256 via
    # take_along_axis on a (n,1) index — vs one-hot dot
    tab = jnp.asarray(rng.integers(0, 1 << 20, 256, dtype=np.int32))
    q = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))

    def onehot_lookup(tab, q):
        oh = jax.nn.one_hot(q.reshape(-1, 128), 256, dtype=jnp.bfloat16)
        return jnp.einsum("rls,s->rl", oh, tab.astype(jnp.bfloat16))

    f = jax.jit(onehot_lookup)
    print(f"one-hot bf16 lookup 256:     {bench(f, tab, q)*1e3:8.2f} ms")

    # cumsum: 1-D vs 2-D reshape trick
    f = jax.jit(lambda x: jnp.cumsum(x))
    print(f"cumsum 1M 1-D:               {bench(f, k1)*1e3:8.2f} ms")

    def cumsum2d(x):
        r = x.reshape(1024, 1024)
        within = jnp.cumsum(r, axis=1)
        carry = jnp.cumsum(within[:, -1]) - within[:, -1]
        return (within + carry[:, None]).reshape(-1)

    f = jax.jit(cumsum2d)
    print(f"cumsum 1M 2-D trick:         {bench(f, k1)*1e3:8.2f} ms")

    def cummax2d(x):
        r = x.reshape(1024, 1024)
        within = jax.lax.cummax(r, axis=1)
        carry = jax.lax.cummax(within[:, -1])
        carry = jnp.concatenate([jnp.full((1,), -(1 << 30), jnp.int32), carry[:-1]])
        return jnp.maximum(within, carry[:, None]).reshape(-1)

    f = jax.jit(cummax2d)
    print(f"cummax 1M 2-D trick:         {bench(f, k1)*1e3:8.2f} ms")

    # roll-based packed-key build: 21 cyclic shifts + shifts/ors
    nn = jnp.int32(n - 37)

    def build_keys(b32):
        i = jnp.arange(n, dtype=jnp.int32)
        keys = []
        acc = jnp.zeros(n, jnp.int32)
        for j in range(21):
            kk = jnp.int32(j)
            lo = jnp.roll(b32, -kk)
            hi = jnp.roll(b32, nn - kk)
            s = jnp.where(i + kk < nn, lo, hi)
            acc = (acc << 4) | (s & 15)
            if j % 7 == 6:
                keys.append(acc)
                acc = jnp.zeros(n, jnp.int32)
        return keys

    f = jax.jit(build_keys)
    print(f"pack 21 syms -> 3 keys:      {bench(f, bp)*1e3:8.2f} ms")

    # argmin/argmax and comparison-count (orig_ptr without idx payload)
    def orig_ptr(a, b, c):
        lt = (a < a[0]) | ((a == a[0]) & ((b < b[0]) | ((b == b[0]) & (c < c[0]))))
        return jnp.sum(lt)

    f = jax.jit(orig_ptr)
    print(f"orig_ptr compare-count:      {bench(f, k1, k2, k3)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
