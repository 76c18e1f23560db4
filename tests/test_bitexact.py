"""Whole-stream bit-exactness against libbz2 (stdlib bz2).

BASELINE.json demands bit-identical .starch output; the bzip2 payload is
where that is hard.  Guarantee (documented in codec/bwt.py): for any block
whose rotations are all distinct — every real BED block — the stream is
byte-identical to libbz2 at the same level.  For exactly-periodic blocks
the origPtr tie-break may differ from libbz2's sorter internals; the
stream is still the same length, still valid, and libbz2 decodes it to
identical bytes (asserted below).
"""

import bz2

import numpy as np
import pytest

from starch3_tpu.codec.decoder import bz2_decompress
from starch3_tpu.codec.encoder import bz2_compress, bz2_compress_ex

from tests.conftest import make_bed_text


def assert_exact(data: bytes, level: int = 9):
    assert bz2_compress(data, level) == bz2.compress(data, level)


class TestBitExact:
    def test_empty(self):
        assert_exact(b"")

    def test_single_byte(self):
        assert_exact(b"q")

    def test_ascii(self):
        assert_exact(b"The quick brown fox jumps over the lazy dog.\n" * 7)

    def test_all_byte_values(self, rng):
        data = rng.permutation(np.arange(256, dtype=np.uint8)).tobytes() * 3
        assert_exact(data)

    def test_random_uniform(self, rng):
        assert_exact(rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes())

    def test_low_entropy(self, rng):
        assert_exact(rng.integers(0, 3, 100_000, dtype=np.uint8).tobytes())

    def test_long_runs(self, rng):
        parts = []
        for _ in range(100):
            parts.append(bytes([int(rng.integers(0, 256))]) * int(rng.integers(1, 2000)))
        assert_exact(b"".join(parts))

    def test_bed_text(self, rng):
        assert_exact(make_bed_text(rng, n=20_000, with_remainder=True))

    @pytest.mark.parametrize("level", [1, 2, 5, 9])
    def test_levels(self, rng, level):
        data = make_bed_text(rng, n=5_000)
        assert_exact(data, level)

    @pytest.mark.slow
    def test_multiblock(self, rng):
        # > 900k post-RLE1 forces multiple blocks at level 9
        data = make_bed_text(rng, n=60_000, with_remainder=True)
        assert len(data) > 1_800_000
        assert_exact(data)

    def test_multiblock_level1(self, rng):
        data = rng.integers(0, 256, 250_000, dtype=np.uint8).tobytes()
        assert_exact(data, 1)

    def test_block_index_reported(self, rng):
        # the structured replacement for the reference's patched
        # block-close callback (bzlib.h:66-67): per-block bit offsets
        data = rng.integers(0, 256, 250_000, dtype=np.uint8).tobytes()
        enc = bz2_compress_ex(data, 1)
        assert len(enc.block_bit_offsets) == 3
        assert enc.block_bit_offsets[0] == 32
        assert all(b > a for a, b in zip(enc.block_bit_offsets, enc.block_bit_offsets[1:]))

    def test_periodic_blocks_still_valid(self):
        # documented edge: exactly-periodic blocks may differ from libbz2
        # in origPtr only; must stay decodable by libbz2 and same length
        for data in [b"abcdef" * 100, bytes(range(256)) * 10, b"ab" * 5000]:
            mine = bz2_compress(data, 9)
            ref = bz2.compress(data, 9)
            assert len(mine) == len(ref)
            assert bz2.decompress(mine) == data


class TestDecoder:
    def test_roundtrip_own(self, rng):
        data = make_bed_text(rng, n=10_000, with_remainder=True)
        assert bz2_decompress(bz2_compress(data)) == data

    def test_decodes_libbz2_output(self, rng):
        data = make_bed_text(rng, n=5_000)
        assert bz2_decompress(bz2.compress(data, 9)) == data

    def test_crc_validated(self, rng):
        data = make_bed_text(rng, n=2_000)
        stream = bytearray(bz2_compress(data))
        stream[len(stream) // 2] ^= 0xFF
        with pytest.raises(Exception):
            bz2_decompress(bytes(stream))

    def test_empty(self):
        assert bz2_decompress(bz2.compress(b"", 9)) == b""
