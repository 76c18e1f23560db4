"""Native-runtime equivalence: every C++ entry point vs its NumPy oracle.

The native tier must be a pure accelerant — bit-identical outputs.  When
the toolchain is absent these tests skip (the Python tier is then the
production path and is covered everywhere else).
"""

import bz2

import numpy as np
import pytest

from starch3_tpu import runtime
from starch3_tpu.codec import huffman
from starch3_tpu.codec.bwt import bwt_encode
from starch3_tpu.codec.mtf import mtf_ranks
from starch3_tpu.codec.rle1 import rle1_decode

pytestmark = pytest.mark.skipif(
    runtime.get_lib() is None, reason="native runtime not available"
)


class TestNativeBwt:
    @pytest.mark.parametrize("n", [1, 2, 100, 5000])
    def test_random(self, rng, n):
        block = rng.integers(0, 256, n, dtype=np.uint8)
        l1, p1 = bwt_encode(block)
        l2, p2 = runtime.bwt_native(block)
        assert l1.tolist() == l2.tolist() and p1 == p2

    def test_low_entropy_and_runs(self, rng):
        block = np.repeat(rng.integers(0, 3, 500, dtype=np.uint8), rng.integers(1, 50, 500))
        l1, p1 = bwt_encode(block)
        l2, p2 = runtime.bwt_native(block)
        assert l1.tolist() == l2.tolist() and p1 == p2

    def test_periodic_tie_order(self):
        # equal rotations must keep libbz2's descending-index order
        for data in [b"abcdef" * 50, b"ab" * 300, b"xyzxyz" * 7]:
            block = np.frombuffer(data, dtype=np.uint8)
            l1, p1 = bwt_encode(block)
            l2, p2 = runtime.bwt_native(block)
            assert l1.tolist() == l2.tolist() and p1 == p2


class TestNativeMtf:
    def test_matches(self, rng):
        seq = rng.integers(0, 30, 10000).astype(np.int32)
        a = runtime.mtf_ranks_native(seq, 30)
        b = mtf_ranks(seq.astype(np.int64), 30)
        assert a.tolist() == b.tolist()


class TestNativeHuffman:
    def test_matches(self, rng):
        for _ in range(20):
            alpha = int(rng.integers(3, 258))
            freq = rng.integers(0, 5000, alpha).astype(np.int64)
            a = runtime.make_code_lengths_native(freq, alpha, huffman.MAX_CODE_LEN)
            # force the Python tier for the oracle side
            import starch3_tpu.runtime as rt

            saved = rt.make_code_lengths_native
            rt.make_code_lengths_native = lambda *a_, **k_: None
            try:
                b = huffman.make_code_lengths(freq, alpha)
            finally:
                rt.make_code_lengths_native = saved
            assert a.tolist() == b.tolist()


class TestNativePackBits:
    def test_matches(self, rng):
        vals = rng.integers(0, 1 << 20, 1000).astype(np.uint64)
        bits = rng.integers(1, 24, 1000).astype(np.int64)
        vals &= (np.uint64(1) << bits.astype(np.uint64)) - np.uint64(1)
        a = runtime.pack_bits_native(vals, bits, 0b101, 3)
        import starch3_tpu.runtime as rt

        saved = rt.pack_bits_native
        rt.pack_bits_native = lambda *a_, **k_: None
        try:
            from starch3_tpu.codec.bitio import pack_bits

            b = pack_bits(vals, bits, 0b101, 3)
        finally:
            rt.pack_bits_native = saved
        assert a == b


class TestNativeDecoder:
    def test_roundtrip_libbz2(self, rng):
        data = rng.integers(0, 200, 150_000, dtype=np.uint8).tobytes()
        assert runtime.bz2_decompress_native(bz2.compress(data, 9)) == data

    def test_capacity_growth(self):
        data = b"\x00" * 1_000_000  # extreme expansion ratio
        stream = bz2.compress(data, 9)
        assert runtime.bz2_decompress_native(stream) == data

    def test_rle1_decode(self, rng):
        raw = np.repeat(
            rng.integers(0, 4, 200, dtype=np.uint8), rng.integers(1, 300, 200)
        ).tobytes()
        from starch3_tpu.codec.rle1 import rle1_split_blocks

        blk = rle1_split_blocks(raw, 9)[0]
        assert runtime.rle1_decode_native(blk.data) == rle1_decode(blk.data)
