"""Device RLE2 / zero-run coding: MTF ranks -> bzip2 symbol stream.

Completes the on-device block pipeline (BWT -> MTF -> RLE2 here ->
Huffman costing in ops/huff_jax.py -> bit-pack in ops/bitpack_jax.py):
after this stage the only host work left is the 258-node Huffman length
heap (host by design — its observable tie-breaking is sequential) and
stream splicing.

Fixed-shape formulation of codec/mtf.py mtf_rle2_from_ranks (behavioral
spec + host oracle): zero runs become bijective-base-2 RUNA/RUNB digits
(z+1's binary digits, MSB dropped, LSB-first), rank j -> symbol j+1,
EOB = n_in_use+1 appended.  All steps are cumsum/scatter/gather over
padded arrays:

  - nonzero compaction: target index = cumsum(nonzero) - 1, one scatter;
  - run lengths: gaps between consecutive nonzero positions;
  - digit counts: exact integer bit lengths via a static shift loop
    (float32 log2 is inexact at powers of two on TPU);
  - output offsets: exclusive cumsum of (digits + 1) chunk lengths;
  - digit placement: a static 21-step loop (2^21 > max block size), each
    step scattering digit k of every still-active run;
  - frequencies: scatter-add of ones over the symbol stream.

Outputs are padded to ``n_max + 2`` with the true length as a scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MAX_DIGITS = 21  # bijective-base-2 digits of runs < 2^21 (block <= 901k)


@functools.partial(jax.jit, static_argnames=("n_max",))
def rle2_from_ranks_padded(
    ranks: jax.Array, n: jax.Array, n_in_use: jax.Array, n_max: int
):
    """RLE2-encode MTF ranks on device.

    Args:
      ranks: int32[n_max] MTF ranks (entries beyond ``n`` ignored)
      n: int32 scalar, true length
      n_in_use: int32 scalar, dense alphabet size (EOB = n_in_use + 1)
      n_max: static padded size
    Returns:
      syms: int32[n_max + 2] symbol stream (padded with EOB value beyond m)
      m: int32 scalar, true symbol count (EOB included)
      freq: int32[260] symbol histogram over the first m entries
    """
    idx = jnp.arange(n_max, dtype=jnp.int32)
    valid = idx < n
    nz = valid & (ranks != 0)
    # compact nonzero positions: pos_nz[t] = index of t-th nonzero
    tgt = jnp.cumsum(nz.astype(jnp.int32)) - 1
    n_nz = tgt[-1] + 1  # cumsum-1 is -1 when there are no nonzeros
    pos_nz = jnp.full(n_max + 1, -1, dtype=jnp.int32)
    pos_nz = pos_nz.at[jnp.where(nz, tgt, n_max)].set(
        jnp.where(nz, idx, -1), mode="drop"
    )
    vals_nz = jnp.zeros(n_max + 1, dtype=jnp.int32)
    vals_nz = vals_nz.at[jnp.where(nz, tgt, n_max)].set(
        jnp.where(nz, ranks + 1, 0), mode="drop"
    )

    # run of zeros before each nonzero, plus the tail run before EOB.
    # runs[t] for t < n_nz: pos_nz[t] - pos_nz[t-1] - 1 (pos_nz[-1]=-1);
    # runs[n_nz] (tail): n - last_nz - 1, or n when there are no nonzeros
    t_idx = jnp.arange(n_max + 1, dtype=jnp.int32)
    prev = jnp.where(t_idx == 0, -1, pos_nz[jnp.maximum(t_idx - 1, 0)])
    last_nz = jnp.where(n_nz > 0, pos_nz[jnp.maximum(n_nz - 1, 0)], -1)
    runs = jnp.where(
        t_idx < n_nz,
        pos_nz - prev - 1,
        jnp.where(t_idx == n_nz, n - last_nz - 1, 0),
    )
    live = t_idx <= n_nz  # chunks: one per nonzero + the EOB chunk

    # digit counts d(z) = bit_length(z+1) - 1, computed with exact
    # integer shifts: TPU float32 log2 is inexact at powers of two
    # (log2(32768.f) = 14.999999 -> off-by-one digit, corrupt stream);
    # the host oracle (codec/mtf.py) carries the same warning
    mvals = runs + 1
    dig = jnp.zeros_like(runs)
    for k in range(_MAX_DIGITS):
        dig = dig + ((mvals >> k) >= 2).astype(jnp.int32)
    chunk_lens = jnp.where(live, dig + 1, 0)  # digits + (symbol | EOB)
    ends = jnp.cumsum(chunk_lens)
    offsets = ends - chunk_lens
    m = ends[-1]

    eob = n_in_use + 1
    syms = jnp.full(n_max + 2, eob, dtype=jnp.int32)
    # digits: static loop over digit index k, scatter active runs' bit k
    for k in range(_MAX_DIGITS):
        active = live & ((mvals >> k) >= 2)
        syms = syms.at[jnp.where(active, offsets + k, n_max + 2)].set(
            jnp.where(active, (mvals >> k) & 1, 0), mode="drop"
        )
    # nonzero symbols (rank+1) at each chunk's end; the EOB chunk's slot
    # already holds eob from the fill value
    is_sym = t_idx < n_nz
    syms = syms.at[jnp.where(is_sym, offsets + dig, n_max + 2)].set(
        jnp.where(is_sym, vals_nz, 0), mode="drop"
    )

    out_idx = jnp.arange(n_max + 2, dtype=jnp.int32)
    freq = jnp.zeros(260, dtype=jnp.int32)
    freq = freq.at[jnp.where(out_idx < m, syms, 259)].add(1, mode="drop")
    return syms, m, freq
