"""MSB-first bit stream writer/reader for the bzip2 container.

bzip2 writes all fields most-significant-bit first and pads the final
partial byte with zero bits.  The writer below buffers into a Python int
register; the vectorized bulk path (pack_bits) packs an array of
(value, nbits) pairs via cumulative offsets, which is the same two-pass
formulation the TPU bit-pack kernel uses.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    __slots__ = ("_out", "_acc", "_nbits")

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0  # bit accumulator, MSB-first
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_bytes_msb(self, data: bytes) -> None:
        for b in data:
            self.write(b, 8)

    def write_array(self, values: np.ndarray, nbits: np.ndarray) -> None:
        """Append many (value, nbits) fields at once (vectorized)."""
        packed_bytes, tail_acc, tail_nbits = pack_bits(
            values, nbits, self._acc, self._nbits
        )
        self._out += packed_bytes
        self._acc = tail_acc
        self._nbits = tail_nbits

    @property
    def bit_length(self) -> int:
        return len(self._out) * 8 + self._nbits

    def getvalue(self) -> bytes:
        """Zero-pad the final partial byte and return the stream."""
        out = bytes(self._out)
        if self._nbits:
            out += bytes([(self._acc << (8 - self._nbits)) & 0xFF])
        return out


def pack_bits(
    values: np.ndarray, nbits: np.ndarray, acc: int = 0, acc_nbits: int = 0
) -> tuple[bytes, int, int]:
    """Pack arrays of MSB-first bit fields into bytes.

    Two-pass algorithm (mirrors the TPU kernel design): compute each field's
    absolute bit offset with a cumulative sum, split each field into its
    constituent bits' target positions, then reduce per output byte.

    Returns (whole_bytes, tail_accumulator, tail_bit_count).
    """
    values = np.asarray(values, dtype=np.uint64)
    nbits = np.asarray(nbits, dtype=np.int64)
    if values.size == 0:
        return b"", acc, acc_nbits
    total_bits = int(acc_nbits + nbits.sum())
    ends = acc_nbits + np.cumsum(nbits)
    starts = ends - nbits
    nbytes = total_bits // 8
    # Expand fields to single bits.  max nbits in bzip2 is 48 (stream magic),
    # but the bulk arrays here are Huffman codes (<= 23 bits).
    max_n = int(nbits.max())
    # bit j (0 = MSB of the field) of field i lands at absolute position
    # starts[i] + j.
    j = np.arange(max_n, dtype=np.int64)
    pos = starts[:, None] + j[None, :]
    bit = (values[:, None] >> (nbits[:, None] - 1 - j[None, :]).clip(min=0).astype(np.uint64)) & np.uint64(1)
    valid = j[None, :] < nbits[:, None]
    pos_flat = pos[valid]
    bit_flat = bit[valid].astype(np.uint8)
    out = np.zeros(nbytes + 8, dtype=np.uint8)
    byte_idx = pos_flat >> 3
    shift = (7 - (pos_flat & 7)).astype(np.uint8)
    np.bitwise_or.at(out, byte_idx, (bit_flat << shift).astype(np.uint8))
    # fold the pre-existing accumulator's bits into the first byte(s)
    if acc_nbits:
        acc_bytes = np.zeros(nbytes + 8, dtype=np.uint8)
        a = acc
        for k in range(acc_nbits):
            b = (a >> (acc_nbits - 1 - k)) & 1
            acc_bytes[k >> 3] |= b << (7 - (k & 7))
        out |= acc_bytes
    whole = out[:nbytes].tobytes()
    tail_nbits = total_bits - nbytes * 8
    # reconstruct tail accumulator from the remaining bits
    tail = 0
    for k in range(tail_nbits):
        p = nbytes * 8 + k
        tail = (tail << 1) | ((int(out[p >> 3]) >> (7 - (p & 7))) & 1)
    return whole, tail, tail_nbits


class BitReader:
    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # absolute bit position

    def read(self, nbits: int) -> int:
        v = 0
        pos = self._pos
        data = self._data
        for _ in range(nbits):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self._pos = pos
        return v

    def read_bit(self) -> int:
        pos = self._pos
        b = (self._data[pos >> 3] >> (7 - (pos & 7))) & 1
        self._pos = pos + 1
        return b

    @property
    def bit_pos(self) -> int:
        return self._pos

    @property
    def bits_remaining(self) -> int:
        return len(self._data) * 8 - self._pos
