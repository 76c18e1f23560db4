"""BWT rotation sort on device: prefix doubling over XLA sorts.

The reference's block sorter (bundled bzip2's blocksort.c, ~1100 lines of
cache-tuned sequential C) defines the required *behavior*: lexicographic
order of all cyclic rotations, with equal rotations left in decreasing
start-index order (codec/bwt.py documents the tie-break evidence).  The
TPU-native method is entirely different: prefix doubling — each round
sorts (rank_i, rank_{i+k mod n}) pairs with a fixed-shape two-key XLA
sort and densely reranks, doubling k until all ranks are distinct.  For a
900 kB block that is <= 20 rounds of n*log(n) device sort, all MXU/VPU-
friendly fixed shapes, batched across blocks with vmap/pjit.

Padded formulation: arrays are padded to ``n_max``; padded slots carry
+inf-like keys so they sort to the tail and never mix with real ranks;
the true length ``n`` is a scalar operand (no dynamic shapes under jit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy scalar: a module-level jnp constant would live on the
# device and stall MLIR constant embedding on remote-tunnel backends
_BIG = np.int32(0x7FFFFFF0)


@functools.partial(jax.jit, static_argnames=("n_max",))
def bwt_encode_padded(block: jax.Array, n: jax.Array, n_max: int):
    """Rotation-sort a padded block.

    Args:
      block: uint8[n_max] (contents beyond ``n`` ignored)
      n: int32 scalar, actual length (1 <= n <= n_max)
      n_max: static padded size
    Returns:
      last: uint8[n_max] BWT last column (valid prefix of length n)
      orig_ptr: int32 scalar, sorted position of rotation 0
    """
    idx = jnp.arange(n_max, dtype=jnp.int32)
    valid = idx < n

    # initial ranks resolve 3 characters at once: pack bytes
    # (b[i],b[i+1],b[i+2]) cyclically as one 24-bit big-endian key (stays
    # positive in int32), then dense-rerank — saves two doubling rounds
    b32 = block.astype(jnp.int32)
    key0 = jnp.zeros(n_max, jnp.int32)
    for off in range(3):
        nxt = b32[jnp.where(valid, (idx + off) % n, 0)]
        key0 = (key0 << 8) | nxt
    key0 = jnp.where(valid, key0, _BIG + 1)
    k0s, order0 = jax.lax.sort((key0, idx), num_keys=1, is_stable=True)
    changed0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (k0s[1:] != k0s[:-1]).astype(jnp.int32)]
    )
    rank = jnp.zeros(n_max, jnp.int32).at[order0].set(jnp.cumsum(changed0))
    rank = jnp.where(valid, rank, _BIG + 1)
    done0 = jnp.max(jnp.where(valid, rank, -1)) == n - 1

    def cyclic_shift(rank, k):
        """rank[(i+k) mod n] for i < n, via two static-size slices
        (contiguous HBM reads) instead of a random gather."""
        k_mod = k % n
        dbl = jnp.concatenate([rank, rank])  # static 2*n_max
        a = jax.lax.dynamic_slice(dbl, (k_mod,), (n_max,))  # rank[i+k_mod]
        zeros_front = jnp.concatenate([jnp.zeros(n_max, rank.dtype), rank])
        b = jax.lax.dynamic_slice(
            zeros_front, (n_max + k_mod - n,), (n_max,)
        )  # rank[i + k_mod - n]
        return jnp.where(idx < n - k_mod, a, b)

    def round_body(state):
        rank, k, _done = state
        rank2 = jnp.where(valid, cyclic_shift(rank, k), _BIG + 1)
        r1s, r2s, order = jax.lax.sort(
            (rank, rank2, idx), num_keys=2, is_stable=True
        )
        changed = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(jnp.int32),
            ]
        )
        new_rank_sorted = jnp.cumsum(changed)
        new_rank = jnp.zeros_like(rank).at[order].set(new_rank_sorted)
        new_rank = jnp.where(valid, new_rank, _BIG + 1)
        # distinct when the max valid rank equals n-1
        done = jnp.max(jnp.where(valid, new_rank, -1)) == n - 1
        return new_rank, k * 2, done

    def cond(state):
        _rank, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < 2 * n)

    rank, _, _ = jax.lax.while_loop(
        cond, round_body, (rank, jnp.int32(3), done0)
    )
    # final order: rank ascending, ties (equal rotations) by index
    # descending — the libbz2-observed order (codec/bwt.py)
    _, _, sa = jax.lax.sort((rank, -idx, idx), num_keys=2, is_stable=False)
    prev = jnp.where(sa > 0, sa - 1, n - 1)
    last = block[prev]
    orig_ptr = jnp.argmax(sa == 0).astype(jnp.int32)
    return last, orig_ptr


def bwt_encode_jax(block_np: np.ndarray, n_max: int | None = None):
    """Host-convenience wrapper mirroring codec.bwt.bwt_encode."""
    n = int(block_np.size)
    if n_max is None:
        n_max = n
    padded = np.zeros(n_max, dtype=np.uint8)
    padded[:n] = block_np
    last, ptr = bwt_encode_padded(jnp.asarray(padded), jnp.int32(n), n_max)
    return np.asarray(last)[:n], int(ptr)
