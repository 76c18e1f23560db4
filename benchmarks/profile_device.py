"""Stage-level profiling of the device encode path on the real chip.

Times each kernel batch-amortized (block_until_ready over repeats, after
a warm-up compile) so the number is device compute, not tunnel latency.
Run: python benchmarks/profile_device.py [--nmax 131072] [--batch 4]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def make_test_block(n: int, seed: int = 0) -> np.ndarray:
    """Synthetic post-RLE1 transformed-BED-like text (digits, tabs, p-lines)."""
    rng = np.random.default_rng(seed)
    parts = []
    total = 0
    while total < n:
        if rng.random() < 0.1:
            line = b"p" + str(rng.integers(1, 2000)).encode() + b"\n"
        else:
            line = str(rng.integers(1, 30000)).encode() + b"\n"
        parts.append(line)
        total += len(line)
    return np.frombuffer(b"".join(parts), dtype=np.uint8)[:n].copy()


def _sync(out):
    """Force completion: download one element (tunnel block_until_ready
    can ack the dispatch without waiting for execution)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmax", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    n_max, B = args.nmax, args.batch
    blocks = np.stack([make_test_block(n_max - 37, seed=i) for i in range(B)])
    pad = np.zeros((B, n_max), dtype=np.uint8)
    pad[:, : n_max - 37] = blocks
    lens = np.full(B, n_max - 37, dtype=np.int32)
    blocks_d = jnp.asarray(pad)
    lens_d = jnp.asarray(lens)

    from starch3_tpu.ops.bwt_jax import bwt_encode_padded

    for ib in (1, 3):
        f = jax.jit(
            jax.vmap(lambda b, n: bwt_encode_padded(b, n, n_max, init_bytes=ib))
        )
        t0 = time.perf_counter()
        dt = bench(f, blocks_d, lens_d, reps=args.reps)
        print(
            f"bwt init_bytes={ib}: {dt*1e3:9.2f} ms/batch "
            f"({B*(n_max)/dt/1e6:8.1f} MB/s) [first-call {time.perf_counter()-t0:.1f}s]"
        )

    # MTF over dense symbols
    from starch3_tpu.ops.mtf_jax import mtf_ranks_padded

    seqs = jnp.asarray(pad.astype(np.int32) % 16)
    f = jax.jit(jax.vmap(lambda s, n: mtf_ranks_padded(s, n, n_max)))
    dt = bench(f, seqs, lens_d, reps=args.reps)
    print(f"mtf xla scan:     {dt*1e3:9.2f} ms/batch ({B*n_max/dt/1e6:8.1f} MB/s)")

    if jax.default_backend() == "tpu":
        from starch3_tpu.ops.mtf_pallas import mtf_ranks_pallas

        def pallas_batch(seqs):
            return jnp.stack(
                [mtf_ranks_pallas(seqs[i], n_max) for i in range(B)]
            )

        f = jax.jit(pallas_batch)
        dt = bench(f, seqs, reps=args.reps)
        print(f"mtf pallas:       {dt*1e3:9.2f} ms/batch ({B*n_max/dt/1e6:8.1f} MB/s)")

    # RLE2
    from starch3_tpu.ops.rle2_jax import rle2_from_ranks_padded

    ranks = jnp.asarray((pad.astype(np.int32) * 7) % 5)
    f = jax.jit(
        jax.vmap(lambda r, n: rle2_from_ranks_padded(r, n, jnp.int32(16), n_max))
    )
    dt = bench(f, ranks, lens_d, reps=args.reps)
    print(f"rle2:             {dt*1e3:9.2f} ms/batch ({B*n_max/dt/1e6:8.1f} MB/s)")

    # fused production step
    from starch3_tpu.parallel.pipeline import (
        _jitted_fused_step,
        _jitted_fused_step_rle2,
    )

    for name, step in (
        ("fused (ranks)", _jitted_fused_step(n_max, False)),
        ("fused+rle2", _jitted_fused_step_rle2(n_max, False)),
    ):
        dt = bench(step, blocks_d, lens_d, reps=args.reps)
        print(f"{name:17s} {dt*1e3:9.2f} ms/batch ({B*n_max/dt/1e6:8.1f} MB/s)")


if __name__ == "__main__":
    main()
