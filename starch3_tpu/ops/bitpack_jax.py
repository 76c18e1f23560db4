"""Device bit-pack kernel: MSB-first (value, nbits) fields -> bit stream.

The device formulation of codec/bitio.pack_bits (reference behavior: the
bzip2 container's bsW bit writer — sequential in the reference's bundled
bzip2; see codec/bitio.py for the two-pass restatement):

  1. split: any field wider than 16 bits becomes ceil(w/16) sub-fields
     of <= 16 bits (static bound: 4 pieces covers the 48-bit magics), so
     every piece spans at most two 32-bit output words;
  2. place: exclusive cumsum of bit widths gives each piece's absolute
     bit offset; each piece contributes to word i = off >> 5 with a
     right-shift and to word i+1 with a left-shift via two scatter-adds
     (fields never overlap, so add == or).

Everything is fixed-shape: n fields in, ``n_words`` (static) words out;
the true bit length travels as a scalar.  uint32 words avoid the x64
global flag; the MSB-first byte stream is the big-endian byte view of
the word array, truncated to ceil(total_bits/8) on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MAX_PIECES = 4  # ceil(48 / 16): covers the widest bzip2 field (magics)


@functools.partial(jax.jit, static_argnames=("n_words",))
def pack_bits_device(values: jax.Array, nbits: jax.Array, n_words: int):
    """Pack fields into a big-endian bit stream on device.

    Args:
      values: uint32[n] field values, each masked to its width; widths
        above 32 are not representable here — pre-split on the host
        (the codec's in-block fields are all <= 32 bits; only stream
        magics are wider, and those are host-side framing).
      nbits: int32[n] widths in [0, 32] (0 = skip).
      n_words: static output capacity in 32-bit words.
    Returns:
      words: uint32[n_words] (big-endian bit content, MSB-first)
      total_bits: int32 scalar
    """
    n = values.shape[0]
    k = jnp.arange(_MAX_PIECES, dtype=jnp.int32)

    # piece widths: MSB-side first so pieces stay MSB-first in order
    # pieces for a w-bit field: [w - 16*(p-1), 16, 16, ...] where p =
    # ceil(w/16); equivalently width_j = clip(w - 16*j_from_lsb, 0, 16)
    # with j counted from the least-significant piece — emit pieces in
    # MSB->LSB order, so piece j (0-based from MSB) has width:
    p_count = (nbits + 15) // 16  # pieces per field
    # width of MSB piece = w - 16*(p_count-1); later pieces = 16
    w_msb = nbits - 16 * (p_count - 1)
    widths = jnp.where(
        k[None, :] < p_count[:, None],
        jnp.where(k[None, :] == 0, w_msb[:, None], 16),
        0,
    ).astype(jnp.int32)  # [n, 4]
    # shift for piece j: bits remaining to its right within the field
    right = nbits[:, None] - jnp.cumsum(widths, axis=1)
    piece_vals = (
        values[:, None] >> right.clip(0).astype(jnp.uint32)
    ) & ((jnp.uint32(1) << widths.astype(jnp.uint32)) - jnp.uint32(1))

    flat_w = widths.reshape(-1)
    flat_v = piece_vals.reshape(-1)
    ends = jnp.cumsum(flat_w)
    starts = ends - flat_w
    total_bits = ends[-1] if n else jnp.int32(0)

    word = starts >> 5
    off = starts & 31
    # a <=16-bit piece at bit offset `off` in its word: high part shifts
    # right by (off + w - 32) when spilling, else left by (32 - off - w)
    rs = 32 - off - flat_w
    fits = rs >= 0
    contrib_hi = jnp.where(
        fits,
        flat_v << rs.clip(0).astype(jnp.uint32),
        flat_v >> (-rs).clip(0).astype(jnp.uint32),
    )
    contrib_lo = jnp.where(
        fits, jnp.uint32(0), flat_v << (32 + rs).clip(0, 31).astype(jnp.uint32)
    )
    words = jnp.zeros(n_words, dtype=jnp.uint32)
    words = words.at[word].add(contrib_hi, mode="drop")
    words = words.at[(word + 1)].add(contrib_lo, mode="drop")
    return words, total_bits.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_max", "w_cap"))
def emit_coded_padded(
    syms: jax.Array,
    m: jax.Array,
    selectors: jax.Array,
    lut: jax.Array,
    n_max: int,
    w_cap: int,
):
    """Huffman-code a block's RLE2 symbol stream into packed words.

    The device half of the reference's sendMTFValues emit loop (bundled
    compress.c:550-600): per symbol, look up (code, len) in its group's
    table and append MSB-first.  Codes are <= 17 bits wide (encoder
    limit), so each field touches at most two 32-bit words — two
    scatter-adds place everything.

    Args:
      syms: int32[n_max + 2] RLE2 symbols (entries past ``m`` ignored)
      m: int32 scalar, symbol count
      selectors: int32[g_max] table id per 50-symbol group
      lut: int32[6 * 258] packed (code << 5) | len
      n_max: static geometry
      w_cap: static output capacity in words; if the true bit count
        exceeds 32 * w_cap the caller must fall back (total_bits tells)
    Returns:
      words: uint32[w_cap] MSB-first bit content
      total_bits: int32 scalar
    """
    from starch3_tpu.ops.huff_jax import ALPHA_MAX, GROUP_SIZE

    n_pad = n_max + 2
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    valid = idx < m
    # group id per symbol: selectors repeated 50x is a broadcast+reshape,
    # not a gather
    g_max = selectors.shape[0]
    gid = jnp.broadcast_to(
        selectors[:, None], (g_max, GROUP_SIZE)
    ).reshape(g_max * GROUP_SIZE)[:n_pad]
    entry = lut[gid * ALPHA_MAX + jnp.clip(syms, 0, ALPHA_MAX - 1)]
    entry = jnp.where(valid, entry, 0)
    w = entry & 31
    v = (entry >> 5).astype(jnp.uint32)

    ends = jnp.cumsum(w)
    starts = ends - w
    total_bits = ends[-1]
    word = starts >> 5
    off = starts & 31
    rs = 32 - off - w
    hi = jnp.where(
        rs >= 0,
        v << rs.clip(0).astype(jnp.uint32),
        v >> (-rs).clip(0).astype(jnp.uint32),
    )
    lo = jnp.where(
        rs >= 0, jnp.uint32(0), v << (32 + rs).clip(0, 31).astype(jnp.uint32)
    )
    words = jnp.zeros(w_cap, dtype=jnp.uint32)
    words = words.at[jnp.where(valid, word, w_cap)].add(hi, mode="drop")
    words = words.at[jnp.where(valid, word + 1, w_cap)].add(lo, mode="drop")
    return words, total_bits.astype(jnp.int32)


def pack_bits_via_device(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Host convenience wrapper: arbitrary widths up to 64, returns the
    zero-padded byte stream (equivalent to bitio.pack_bits(...)[0] plus
    final padding).  Splits >32-bit fields host-side."""
    values = np.asarray(values, dtype=np.uint64)
    nbits = np.asarray(nbits, dtype=np.int64)
    wide = nbits > 32
    if wide.any():
        # split into (w-32)-bit high + 32-bit low fields
        out_v, out_w = [], []
        for v, w in zip(values.tolist(), nbits.tolist()):
            if w > 32:
                out_v += [v >> 32, v & 0xFFFFFFFF]
                out_w += [w - 32, 32]
            else:
                out_v.append(v)
                out_w.append(w)
        values = np.array(out_v, dtype=np.uint64)
        nbits = np.array(out_w, dtype=np.int64)
    total = int(nbits.sum())
    n_words = total // 32 + 2
    words, total_bits = pack_bits_device(
        jnp.asarray(values.astype(np.uint32)),
        jnp.asarray(nbits.astype(np.int32)),
        n_words,
    )
    assert int(total_bits) == total
    raw = np.asarray(words).astype(">u4").tobytes()
    return raw[: (total + 7) // 8]
