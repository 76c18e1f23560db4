"""MTF ranks on device: scan-of-cummax over (chunk, 256) tiles.

Reformulation (same math as codec/mtf.py, derived there): the MTF rank of
the symbol at position i is the count of symbols whose most recent
occurrence is later than the current symbol's, with never-seen symbols
ordered by initial alphabet position via L0(t) = -1-t.  Last-occurrence
tables are a cumulative max over per-position one-hot position matrices —
a vectorizable scan:

  - within a tile of T positions: occ[t, s] matrix + cummax along T (VPU)
  - across tiles: a (256,) carry — lax.scan over n_max/T steps

The full 256-wide alphabet is used (unused symbols never occur so they
never disturb counts), keeping every shape static and lane-aligned
(256 = 2 lanes of 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 512
# plain numpy scalar: a module-level jnp constant would live on the
# device and stall MLIR constant embedding on remote-tunnel backends
_NEG = np.int32(-(1 << 30))


@functools.partial(jax.jit, static_argnames=("n_max",))
def mtf_ranks_padded(seq: jax.Array, n: jax.Array, n_max: int) -> jax.Array:
    """MTF ranks over the dense-alphabet sequence.

    Args:
      seq: int32[n_max] values in [0, 256) (entries past ``n`` ignored)
      n: int32 scalar actual length
      n_max: static padded size (multiple of the tile size)
    Returns:
      int32[n_max] ranks (valid prefix of length n)
    """
    assert n_max % _TILE == 0
    n_tiles = n_max // _TILE
    seq_t = seq.reshape(n_tiles, _TILE)
    sym_ids = jnp.arange(256, dtype=jnp.int32)
    init_carry = -1 - sym_ids  # L0: initial list order

    def tile_step(carry, tile_vals):
        tile_idx, vals = tile_vals
        pos = tile_idx * _TILE + jnp.arange(_TILE, dtype=jnp.int32)
        onehot_pos = jnp.where(
            vals[:, None] == sym_ids[None, :], pos[:, None], _NEG
        )
        cm = jax.lax.cummax(onehot_pos, axis=0)
        excl = jnp.concatenate([jnp.full((1, 256), _NEG, jnp.int32), cm[:-1]], axis=0)
        last = jnp.maximum(excl, carry[None, :])
        own = jnp.take_along_axis(last, vals[:, None], axis=1)
        ranks = jnp.sum(last > own, axis=1).astype(jnp.int32)
        new_carry = jnp.maximum(carry, cm[-1])
        return new_carry, ranks

    _, ranks = jax.lax.scan(
        tile_step,
        init_carry,
        (jnp.arange(n_tiles, dtype=jnp.int32), seq_t),
    )
    return ranks.reshape(n_max)


def mtf_ranks_jax(seq_np: np.ndarray, n_sym: int) -> np.ndarray:
    """Host wrapper mirroring codec.mtf.mtf_ranks (dense values < n_sym)."""
    n = seq_np.size
    n_max = ((n + _TILE - 1) // _TILE) * _TILE
    padded = np.zeros(n_max, dtype=np.int32)
    padded[:n] = seq_np
    out = mtf_ranks_padded(jnp.asarray(padded), jnp.int32(n), n_max)
    return np.asarray(out)[:n]
