"""Inverse RLE2 on device: bzip2 symbol stream -> MTF ranks.

Host behavioral spec: the run/rank split inside codec/mtf.mtf_rle2_decode
(RUNA/RUNB zero-run accumulation; rank j emitted as symbol j+1).  The
sequential run accumulator vectorizes because bijective-base-2 digits are
*additive*: a RUNA/RUNB digit at within-group position k contributes
(sym + 1) << k zeros, so per-symbol output sizes need only a segmented
position (cummax of group starts) and one exclusive cumsum for output
offsets — no sequential state.

In rank space a zero run is simply rank 0 repeated, so the output array
starts as zeros and only the non-run symbols scatter their rank j = sym-1
into place; composing with ops/imtf_jax (where rank 0 = "emit front,
no list change") reproduces the byte stream exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MAX_DIGITS = 21  # runs < 2^21 (block <= 901k); clamp for corrupt input


@functools.partial(jax.jit, static_argnames=("m_max", "n_max"))
def irle2_decode_padded(
    syms: jax.Array, m: jax.Array, m_max: int, n_max: int
):
    """Expand RLE2 symbols (EOB already stripped) into MTF ranks.

    Args:
      syms: int32[m_max] symbol stream (entries past ``m`` ignored)
      m: int32 scalar, true symbol count (EOB excluded)
      m_max: static padded input size
      n_max: static padded output size
    Returns:
      ranks: int32[n_max] MTF ranks (valid prefix of length n)
      n: int32 scalar, decoded length (> n_max means corrupt input —
        the expansion overflowed the block size; callers must check)
    """
    t_idx = jnp.arange(m_max, dtype=jnp.int32)
    valid = t_idx < m
    is_run = valid & (syms <= 1)
    # within-group digit position: distance from the group's first symbol
    group_start = is_run & jnp.concatenate(
        [jnp.ones((1,), bool), ~is_run[:-1]]
    )
    start_pos = jax.lax.cummax(jnp.where(group_start, t_idx, -1))
    k = jnp.clip(t_idx - start_pos, 0, _MAX_DIGITS)
    # output contribution: run digit -> (sym+1) << k zeros; rank -> 1 slot
    contrib = jnp.where(
        is_run,
        (syms + 1) << k,
        jnp.where(valid, 1, 0),
    ).astype(jnp.int32)
    total = jnp.cumsum(contrib)
    n = total[-1]
    out_pos = total - contrib  # exclusive cumsum
    ranks = jnp.zeros(n_max, dtype=jnp.int32)
    is_rank = valid & ~is_run
    ranks = ranks.at[jnp.where(is_rank, out_pos, n_max)].set(
        jnp.where(is_rank, syms - 1, 0), mode="drop"
    )
    return ranks, n


def irle2_decode_jax(syms_np: np.ndarray, n_hint: int | None = None):
    """Host wrapper: RLE2 symbols (no EOB) -> MTF ranks array."""
    m = int(syms_np.size)
    m_max = max(m, 1)
    if n_hint is None:
        n_hint = 100_000 * 9 + 64
    ranks, n = irle2_decode_padded(
        jnp.asarray(syms_np.astype(np.int32)), jnp.int32(m), m_max, n_hint
    )
    n = int(n)
    if n > n_hint:
        raise ValueError("RLE2 expansion exceeds block capacity")
    return np.asarray(ranks)[:n]
