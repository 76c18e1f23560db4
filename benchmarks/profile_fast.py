"""Profile the production fast-path device stages batch-amortized on the
real chip, plus packed-prefix tie-rate sensitivity to context length.

Run: python benchmarks/profile_fast.py [--nmax 458752] [--batch 3]

Used to drive the round-3 kernel work: establishes where per-block
compute goes today (BWT sort / Pallas MTF / XLA RLE2) and how much sort
context the one-sort BWT really needs on representative corpus blocks
(fewer key operands = fewer sort bytes moved).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def make_corpus_blocks(n_max: int, batch: int):
    """Real post-RLE1 transformed-BED blocks from the bench corpus."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_genome_bed

    from starch3_tpu.api import _parse_transform
    from starch3_tpu.codec.rle1 import rle1_split_blocks

    bed = make_genome_bed()
    texts = [tf.text for tf in _parse_transform(bed)]
    datas = []
    for t in texts:
        for blk in rle1_split_blocks(t, 9):
            if len(blk.data) <= n_max:
                datas.append(np.frombuffer(blk.data, dtype=np.uint8))
    datas.sort(key=lambda a: -a.size)
    out = datas[:batch]
    while len(out) < batch:
        out.append(out[len(out) % len(datas)])
    return out


def _sync(out):
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
    ap.add_argument("--nmax", type=int, default=458_752)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ties-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    n_max, B = args.nmax, args.batch
    blocks = make_corpus_blocks(n_max, B)
    print(f"corpus blocks: sizes={[b.size for b in blocks]}")

    # dense remap (the host prologue _dispatch_chunk does)
    seqs = np.zeros((B, n_max), dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    nsyms = np.zeros(B, dtype=np.int32)
    for i, arr in enumerate(blocks):
        used = np.bincount(arr, minlength=256) > 0
        u2s = (np.cumsum(used) - 1).astype(np.int32)
        seqs[i, : arr.size] = u2s[arr]
        lens[i] = arr.size
        nsyms[i] = int(used.sum())
    print(f"alphabet sizes: {nsyms.tolist()}")
    bits = 4 if nsyms.max() <= 16 else 8

    from starch3_tpu.ops.bwt_fast import bwt_sort_fast

    seqs_d = jnp.asarray(seqs)
    lens_d = jnp.asarray(lens)

    # tie-rate sensitivity: context symbols vs blocks with any tie
    f = jax.jit(
        jax.vmap(lambda s, n: bwt_sort_fast(s, n, n_max, bits)),
        static_argnums=(),
    )
    _, _, ties = f(seqs_d, lens_d)
    print(f"ties at full context (bits={bits}): {np.asarray(ties).tolist()}")

    # per-key-count tie rates: emulate shorter context by masking keys
    from starch3_tpu.ops import bwt_fast as bf

    for n_keys_eff in (1, 2, 3):
        spk = 8 if bits == 4 else 4

        def tie_probe(seq, n, nk=n_keys_eff):
            idx = jnp.arange(n_max, dtype=jnp.int32)
            valid = idx < n
            seq = jnp.where(valid, seq, 0)

            def shift(arr, k_static):
                k = jnp.where(
                    k_static >= n,
                    jnp.int32(k_static) % jnp.maximum(n, 1),
                    jnp.int32(k_static),
                )
                return bf._cyclic_shift(arr, k, n, idx)

            acc = seq.astype(jnp.uint32)
            w = bits
            while w * 2 <= spk * bits:
                acc = (acc << w) | shift(acc, w // bits).astype(jnp.uint32)
                w *= 2
            keys = [jnp.where(valid, acc, bf._BIGU)]
            for j in range(1, nk):
                keys.append(
                    jnp.where(valid, shift(acc, j * spk).astype(jnp.uint32), bf._BIGU)
                )
            sorted_ops = jax.lax.sort(tuple(keys), num_keys=nk, is_stable=False)
            eq = jnp.ones(n_max - 1, dtype=bool)
            for ks in sorted_ops[:nk]:
                eq = eq & (ks[1:] == ks[:-1])
            eq = eq & (jnp.arange(n_max - 1, dtype=jnp.int32) < n - 1)
            return eq.sum().astype(jnp.int32)

        t = jax.jit(jax.vmap(tie_probe))(seqs_d, lens_d)
        print(
            f"ties at {n_keys_eff} keys ({n_keys_eff * spk} syms context):"
            f" {np.asarray(t).tolist()}"
        )

    if args.ties_only:
        return

    # stage timings, batch-amortized
    dt = bench(f, seqs_d, lens_d, reps=args.reps)
    print(
        f"bwt_sort_fast (bits={bits}):  {dt*1e3:9.2f} ms/batch "
        f"({B*n_max/dt/1e6:8.1f} MB/s) [{dt/B*1e3:.2f} ms/block]"
    )

    # sort-only floor: N keys + payload
    for ops_n in (2, 3, 4):
        karrs = tuple(
            jnp.asarray(np.random.randint(0, 2**31, (B, n_max), dtype=np.int64).astype(np.uint32))
            for _ in range(ops_n)
        )
        fs = jax.jit(
            lambda *ks: jax.vmap(
                lambda *kk: jax.lax.sort(kk, num_keys=len(kk) - 1, is_stable=False)
            )(*ks)
        )
        dt = bench(fs, *karrs, reps=args.reps)
        print(
            f"raw sort {ops_n} u32 operands: {dt*1e3:9.2f} ms/batch "
            f"({B*n_max/dt/1e6:8.1f} MB/s) [{dt/B*1e3:.2f} ms/block]"
        )

    if jax.default_backend() == "tpu":
        from starch3_tpu.ops.mtf_pallas import mtf_ranks_pallas_batch

        width = 128 if bits == 4 else 256
        fm = jax.jit(
            lambda s: mtf_ranks_pallas_batch(s, n_max, width), static_argnums=()
        )
        dt = bench(fm, seqs_d, reps=args.reps)
        print(
            f"mtf_pallas w{width}:      {dt*1e3:9.2f} ms/batch "
            f"({B*n_max/dt/1e6:8.1f} MB/s) [{dt/B*1e3:.2f} ms/block]"
        )

    from starch3_tpu.ops.rle2_jax import rle2_from_ranks_padded

    ranks = jnp.asarray((seqs * 7) % 5)
    fr = jax.jit(
        jax.vmap(lambda r, n, a: rle2_from_ranks_padded(r, n, a, n_max))
    )
    nsyms_d = jnp.asarray(nsyms)
    dt = bench(fr, ranks, lens_d, nsyms_d, reps=args.reps)
    print(
        f"rle2 (xla):           {dt*1e3:9.2f} ms/batch "
        f"({B*n_max/dt/1e6:8.1f} MB/s) [{dt/B*1e3:.2f} ms/block]"
    )

    # whole chained fast step (what production dispatches)
    from starch3_tpu.parallel.pipeline import _jitted_fused_step_fast

    if bits == 4:
        packed = (seqs[:, 0::2] | (seqs[:, 1::2] << 4)).astype(np.uint8)
        seqs_in = jnp.asarray(packed)
    else:
        seqs_in = jnp.asarray(seqs.astype(np.uint8))
    step = _jitted_fused_step_fast(n_max, bits, jax.default_backend() == "tpu")
    dt = bench(step, seqs_in, lens_d, nsyms_d, reps=args.reps)
    print(
        f"full fast step:       {dt*1e3:9.2f} ms/batch "
        f"({B*n_max/dt/1e6:8.1f} MB/s) [{dt/B*1e3:.2f} ms/block]"
    )


if __name__ == "__main__":
    main()
