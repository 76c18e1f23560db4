"""Narrow-alphabet MTF ranks: the production Pallas kernel for bits==4.

Starch-transformed BED text has a <=16-symbol dense alphabet (digits,
'-', 'p', tab, newline — reference transform spec:
update_transformation_state, /root/reference/include/starch3api.hpp:
409-557), so the (TILE, 128) one-hot walk of ops/mtf_pallas.py wastes
7/8 of every VPU lane.  This kernel transposes the layout instead:

    sublane s = symbol (16 of 128 used -> (16, 128) int32 = 2 vregs/op)
    lane    l = position within a 128-position row
    row     w walks the block 128 positions at a time

Per row the work is: a (16, 128) one-hot, one masked-roll cumulative max
along lanes (the last-occurrence scan), and two cyclic sublane-roll
reductions over the 16 symbol planes (own extraction + rank count).
Cross-row and cross-tile state is a (16, 128) carry in VMEM scratch.
Same last-occurrence formulation as codec/mtf.py (rank = #symbols whose
most recent occurrence is later than own).

Measured on the v5 chip: ~1.5 ms per 448 kB block vs 4.2 ms for the
width-128 kernel and 5.1 ms for a (TILE, 256) walk — the VPU time is
dominated by per-op dispatch at these array sizes, so wider one-hots
buy nothing for a 16-symbol alphabet (benchmarks/profile_fast.py).

Grid steps run sequentially on TPU, so one carry serves the whole
block; the batch axis is flattened into the grid with per-row carry
re-initialization (same scheme as ops/mtf_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32  # 128-position rows per grid step = 4096 positions
POSITIONS_PER_TILE = ROWS * 128
_NEG = np.int32(-(1 << 30))


def _make_kernel(tiles_per_row: int, width: int):
    def kernel(seq_ref, out_ref, carry_ref):
        srow = jax.lax.broadcasted_iota(jnp.int32, (width, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (width, 128), 1)
        t = pl.program_id(0)
        tr = t % tiles_per_row

        @pl.when(tr == 0)
        def _():
            # initial list order L0(s) = -1 - s
            carry_ref[:, :] = -1 - jax.lax.broadcasted_iota(
                jnp.int32, (width, 128), 0
            )

        base = tr * POSITIONS_PER_TILE
        sub_rolls = []
        sh = 1
        while sh < width:
            sub_rolls.append(sh)
            sh *= 2
        for w in range(ROWS):
            seqrow = seq_ref[w, :][None, :]
            onehot = jnp.broadcast_to(seqrow, (width, 128)) == srow
            pos = base + w * 128 + lane
            occ = jnp.where(onehot, pos, _NEG)
            # inclusive cumulative max along lanes (last occurrence <= l)
            inc = occ
            for sh in (1, 2, 4, 8, 16, 32, 64):
                inc = jnp.maximum(
                    inc, jnp.where(lane >= sh, pltpu.roll(inc, sh, axis=1), _NEG)
                )
            excl = jnp.where(lane >= 1, pltpu.roll(inc, 1, axis=1), _NEG)
            last = jnp.maximum(excl, carry_ref[:, :])
            # own = last[own symbol], broadcast over the symbol planes
            # (cyclic sublane rolls need no masks: width is the full axis)
            own = jnp.where(onehot, last, _NEG)
            for sh in sub_rolls:
                own = jnp.maximum(own, pltpu.roll(own, sh, axis=0))
            rk = (last > own).astype(jnp.int32)
            for sh in sub_rolls:
                rk = rk + pltpu.roll(rk, sh, axis=0)
            out_ref[w, :] = rk[0, :]
            carry_ref[:, :] = jnp.maximum(
                carry_ref[:, :], jnp.broadcast_to(inc[:, 127:128], (width, 128))
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("n_max", "interpret", "width"))
def mtf_ranks_narrow_batch(
    seqs: jax.Array, n_max: int, interpret: bool = False, width: int = 16
) -> jax.Array:
    """Batched narrow-alphabet MTF ranks: int32[B, n_max] (values <
    ``width``, a power of two in 16/32/64) -> int32[B, n_max].  Entries
    past each row's true length produce garbage ranks the caller must
    ignore (padding is only ever a suffix, so it cannot disturb valid
    positions).  width 16 is the bits==4 production kernel; 32/64 serve
    the bits==5/6 mid-width tiers (2/4 more vregs per op, same walk)."""
    b, nm = seqs.shape
    assert nm == n_max and n_max % POSITIONS_PER_TILE == 0
    assert width in (16, 32, 64)
    tpr = n_max // POSITIONS_PER_TILE
    flat = seqs.reshape(b * (n_max // 128), 128)
    out = pl.pallas_call(
        _make_kernel(tpr, width),
        grid=(b * tpr,),
        in_specs=[
            pl.BlockSpec((ROWS, 128), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (ROWS, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * (n_max // 128), 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((width, 128), jnp.int32)],
        interpret=interpret,
    )(flat)
    return out.reshape(b, n_max)


def mtf_ranks_narrow_host(seq_np: np.ndarray) -> np.ndarray:
    """Host wrapper (tests): pads to the tile size, interprets off-TPU."""
    n = seq_np.size
    n_max = (
        (n + POSITIONS_PER_TILE - 1) // POSITIONS_PER_TILE
    ) * POSITIONS_PER_TILE
    padded = np.zeros((1, n_max), dtype=np.int32)
    padded[0, :n] = seq_np
    interpret = jax.default_backend() != "tpu"
    out = mtf_ranks_narrow_batch(jnp.asarray(padded), n_max, interpret)
    return np.asarray(out)[0, :n]
