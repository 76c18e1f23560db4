"""Stage-by-stage codec unit tests against independent oracles.

Test strategy per SURVEY.md §4: each bzip2 stage (RLE1 / BWT / MTF / RLE2 /
Huffman / CRC) is validated in isolation so a whole-stream mismatch can be
localized.  The whole-stream oracle is stdlib bz2 (libbz2) in
test_bitexact.py.
"""

import bz2

import numpy as np
import pytest

from starch3_tpu.codec import crc32, huffman, mtf
from starch3_tpu.codec.bitio import BitReader, BitWriter
from starch3_tpu.codec.bwt import bwt_decode, bwt_encode
from starch3_tpu.codec.rle1 import find_runs, rle1_decode, rle1_split_blocks


class TestCrc32:
    def test_empty_stream_crc_is_zero(self):
        # combined CRC of a zero-block stream is 0; libbz2's empty stream
        # ends with 4 zero CRC bytes
        assert bz2.compress(b"", 9)[-4:] == b"\x00\x00\x00\x00"

    def test_known_vector_against_libbz2(self):
        # the block CRC of a 1-block stream is visible right after the
        # 48-bit block magic
        data = b"starch3-tpu crc vector"
        stream = bz2.compress(data, 9)
        br = BitReader(stream)
        br.read(32)  # BZh9
        assert br.read(48) == 0x314159265359
        assert br.read(32) == crc32.crc32_bytes(data)

    def test_fast_matches_serial(self, rng):
        data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
        serial = crc32.crc32_update(crc32.crc32_begin(), data)
        assert crc32.crc32_final(serial) == crc32.crc32_bytes(data)


class TestRle1:
    def test_runs(self):
        v, l = find_runs(np.frombuffer(b"aaabccd", dtype=np.uint8))
        assert v.tolist() == [97, 98, 99, 100]
        assert l.tolist() == [3, 1, 2, 1]

    def test_short_runs_passthrough(self):
        blocks = rle1_split_blocks(b"abcabc")
        assert len(blocks) == 1
        assert blocks[0].data == b"abcabc"

    def test_run_of_four_gets_count_byte(self):
        assert rle1_split_blocks(b"aaaa")[0].data == b"aaaa\x00"
        assert rle1_split_blocks(b"aaaaa")[0].data == b"aaaa\x01"

    def test_run_saturation_at_255(self):
        blocks = rle1_split_blocks(b"a" * 300)
        # 255-chunk then 45-chunk
        assert blocks[0].data == b"aaaa" + bytes([251]) + b"aaaa" + bytes([41])

    def test_roundtrip(self, rng):
        data = rng.integers(0, 4, 10000, dtype=np.uint8).tobytes()
        blocks = rle1_split_blocks(data)
        assert b"".join(rle1_decode(b.data) for b in blocks) == data

    @pytest.mark.parametrize("level", [1, 9])
    def test_block_boundaries_match_libbz2(self, rng, level):
        # boundaries observable through whole-stream equality on an input
        # spanning several blocks
        from starch3_tpu.codec.encoder import bz2_compress

        data = rng.integers(0, 256, 260_000, dtype=np.uint8).tobytes()
        assert bz2_compress(data, level) == bz2.compress(data, level)


class TestBwt:
    def test_banana(self):
        last, ptr = bwt_encode(np.frombuffer(b"banana", dtype=np.uint8))
        assert bwt_decode(last, ptr).tobytes() == b"banana"

    def test_roundtrip_random(self, rng):
        for n in [1, 2, 3, 17, 1000]:
            block = rng.integers(0, 256, n, dtype=np.uint8)
            last, ptr = bwt_encode(block)
            assert bwt_decode(last, ptr).tolist() == block.tolist()

    def test_roundtrip_lowentropy(self, rng):
        block = rng.integers(0, 3, 5000, dtype=np.uint8)
        last, ptr = bwt_encode(block)
        assert bwt_decode(last, ptr).tolist() == block.tolist()

    def test_sorted_rotation_order(self):
        # independently verify against brute-force rotation sort
        block = np.frombuffer(b"abracadabra", dtype=np.uint8)
        n = block.size
        rots = sorted(range(n), key=lambda i: bytes(np.roll(block, -i)))
        last_expect = bytes(block[(np.array(rots) - 1) % n])
        last, ptr = bwt_encode(block)
        assert last.tobytes() == last_expect
        assert rots[ptr] == 0


class TestMtf:
    def test_ranks_against_naive(self, rng):
        n_sym = 8
        seq = rng.integers(0, n_sym, 3000, dtype=np.int64)
        got = mtf.mtf_ranks(seq, n_sym)
        lst = list(range(n_sym))
        for i, s in enumerate(seq.tolist()):
            j = lst.index(s)
            assert got[i] == j, f"pos {i}"
            lst.pop(j)
            lst.insert(0, s)

    def test_zero_run_digits(self):
        assert mtf.encode_zero_run(1) == [0]
        assert mtf.encode_zero_run(2) == [1]
        assert mtf.encode_zero_run(3) == [0, 0]
        assert mtf.encode_zero_run(4) == [1, 0]
        assert mtf.encode_zero_run(5) == [0, 1]

    def test_rle2_roundtrip(self, rng):
        block = rng.integers(0, 5, 4000, dtype=np.uint8)
        res = mtf.mtf_rle2(block)
        # decode (EOB stripped)
        decoded = mtf.mtf_rle2_decode(res.symbols[:-1], res.in_use)
        assert decoded.tolist() == block.tolist()

    def test_all_same_byte(self):
        block = np.full(100, 7, dtype=np.uint8)
        res = mtf.mtf_rle2(block)
        decoded = mtf.mtf_rle2_decode(res.symbols[:-1], res.in_use)
        assert decoded.tolist() == block.tolist()


class TestHuffman:
    def test_group_count_thresholds(self):
        assert huffman.n_groups_for(199) == 2
        assert huffman.n_groups_for(200) == 3
        assert huffman.n_groups_for(599) == 3
        assert huffman.n_groups_for(600) == 4
        assert huffman.n_groups_for(1199) == 4
        assert huffman.n_groups_for(1200) == 5
        assert huffman.n_groups_for(2399) == 5
        assert huffman.n_groups_for(2400) == 6

    def test_lengths_are_prefix_feasible(self, rng):
        freq = rng.integers(0, 1000, 50).astype(np.int64)
        lens = huffman.make_code_lengths(freq, 50)
        assert (lens >= 1).all() and (lens <= huffman.MAX_CODE_LEN).all()
        # Kraft equality for a full binary tree
        assert np.isclose(np.sum(2.0 ** -lens), 1.0)

    def test_length_limit_rescaling(self):
        # exponential frequencies force >17-bit codes without rescaling
        freq = np.array([2**i for i in range(40)], dtype=np.int64)
        lens = huffman.make_code_lengths(freq, 40)
        assert lens.max() <= huffman.MAX_CODE_LEN
        assert np.isclose(np.sum(2.0 ** -lens), 1.0)

    def test_canonical_codes(self):
        lens = np.array([2, 2, 2, 3, 3], dtype=np.int64)
        codes = huffman.assign_codes(lens)
        assert codes.tolist() == [0, 1, 2, 6, 7]


class TestBitIO:
    def test_writer_reader_roundtrip(self, rng):
        fields = [(int(rng.integers(0, 1 << w)), int(w)) for w in rng.integers(1, 24, 200)]
        bw = BitWriter()
        for v, w in fields:
            bw.write(v, w)
        data = bw.getvalue()
        br = BitReader(data)
        for v, w in fields:
            assert br.read(w) == v

    def test_write_array_matches_serial(self, rng):
        vals = rng.integers(0, 1 << 16, 500).astype(np.uint64)
        bits = rng.integers(1, 20, 500).astype(np.int64)
        vals &= (1 << bits.astype(np.uint64)) - 1
        serial = BitWriter()
        serial.write(0b101, 3)  # non-byte-aligned prefix
        for v, w in zip(vals.tolist(), bits.tolist()):
            serial.write(int(v), int(w))
        vec = BitWriter()
        vec.write(0b101, 3)
        vec.write_array(vals, bits)
        assert serial.getvalue() == vec.getvalue()

    def test_append_writer_native_matches_numpy(self, rng):
        """Round 5: append_writer's native bit-splice (runtime.cpp
        s3_append_shifted) must byte-match the NumPy formulation at
        every live-bit offset, fragment size, and tail width."""
        from starch3_tpu import runtime as rt

        if rt.get_lib() is None:
            pytest.skip("needs the native runtime")
        for L in range(0, 8):
            for n in (0, 1, 7, 8, 9, 1000):
                for tail_bits in (0, 1, 5, 7):
                    other = BitWriter()
                    other._out += rng.integers(0, 256, n).astype(np.uint8).tobytes()
                    if tail_bits:
                        other._acc = int(rng.integers(0, 1 << tail_bits))
                        other._nbits = tail_bits
                    base = rng.integers(0, 256, 37).astype(np.uint8).tobytes()

                    def build(disabled):
                        bw = BitWriter()
                        bw._out += base
                        if L:
                            # deterministic: both builds must start equal
                            bw._acc = 0x15 & ((1 << L) - 1)
                            bw._nbits = L
                        if disabled:
                            saved = rt.append_shifted_into
                            rt.append_shifted_into = lambda *a, **k: None
                            try:
                                bw.append_writer(other)
                            finally:
                                rt.append_shifted_into = saved
                        else:
                            bw.append_writer(other)
                        return bw.getvalue(), bw._acc, bw._nbits

                    assert build(False) == build(True), (L, n, tail_bits)

    def test_assemble_stream_prealloc_matches_incremental(self, rng):
        """Round 5: the one-allocation assembler (_assemble_stream's
        native bit-splice path) must produce identical bytes, offsets,
        and CRCs to the incremental BitWriter path."""
        import bz2

        from starch3_tpu import runtime as rt
        from starch3_tpu.parallel import pipeline

        if rt.get_lib() is None:
            pytest.skip("needs the native runtime")
        al = np.frombuffer(b"0123456789p-\t\n", np.uint8)
        texts = [
            al[rng.integers(0, al.size, n)].tobytes()
            for n in (40_000, 1_500_000, 12)
        ]
        fast = pipeline.encode_streams(texts)
        saved = rt.append_shifted_at
        rt.append_shifted_at = lambda *a, **k: None
        try:
            legacy = pipeline.encode_streams(texts)
        finally:
            rt.append_shifted_at = saved
        for t, a, b in zip(texts, fast, legacy):
            assert a.data == b.data == bz2.compress(t, 9)
            assert a.block_bit_offsets == b.block_bit_offsets
            assert a.combined_crc == b.combined_crc
