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


class TestNativeBlockHeader:
    def test_matches_python_writer(self, rng):
        """s3_write_block_header vs the Python BitWriter header: same
        bits for random (used map, tables, selectors) inputs."""
        from starch3_tpu.codec.bitio import BitWriter
        from starch3_tpu.codec.encoder import write_block_header

        for _ in range(15):
            n_in_use = int(rng.integers(1, 256))
            alpha = n_in_use + 2
            used = np.zeros(256, dtype=bool)
            used[rng.choice(256, n_in_use, replace=False)] = True
            ng = int(rng.integers(2, 7))
            lens = rng.integers(1, 18, (ng, alpha)).astype(np.int64)
            n_sel = int(rng.integers(1, 3000))
            sels = rng.integers(0, ng, n_sel).astype(np.int64)
            crc = int(rng.integers(0, 1 << 32))
            ptr = int(rng.integers(0, 900_000))

            got = runtime.write_block_header_native(crc, ptr, used, lens, sels)
            assert got is not None

            # Python oracle: selector MTF + BitWriter
            pos = list(range(ng))
            sel_mtf = np.empty(n_sel, dtype=np.int64)
            for k, s in enumerate(sels.tolist()):
                j = pos.index(s)
                sel_mtf[k] = j
                pos.pop(j)
                pos.insert(0, s)
            bw = BitWriter()
            write_block_header(bw, crc, ptr, used, ng, lens, sel_mtf)
            assert got == (bytes(bw._out), bw._acc, bw._nbits)

    def test_rejects_bad_inputs(self):
        used = np.ones(256, dtype=bool)
        lens = np.full((2, 258), 5, dtype=np.int64)
        sels = np.zeros(10, dtype=np.int64)
        # out-of-range selector id
        bad = sels.copy()
        bad[3] = 2
        assert runtime.write_block_header_native(0, 0, used, lens, bad) is None
        # zero code length
        lens0 = lens.copy()
        lens0[1, 7] = 0
        assert runtime.write_block_header_native(0, 0, used, lens0, sels) is None


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


class TestNativeDensePackWords:
    """s3_dense_pack_words: the mid-width upload pack (30//bits symbols
    per uint32 word) vs a NumPy reconstruction."""

    @pytest.mark.parametrize("bits,nsym", [(5, 17), (5, 32), (6, 33), (6, 64)])
    def test_roundtrip(self, rng, bits, nsym):
        spw = 30 // bits
        alpha = rng.choice(256, nsym, replace=False).astype(np.uint8)
        arr = alpha[rng.integers(0, nsym, 10_001)]
        n_words = (arr.size + spw - 1) // spw
        words = np.zeros(n_words, dtype=np.uint32)
        n_in_use, used = runtime.dense_pack_words_native(arr, bits, words)
        assert n_in_use == nsym
        assert used.tolist() == (np.bincount(arr, minlength=256) > 0).tolist()
        # unpack and compare to the dense remap
        u2s = (np.cumsum(used) - 1).astype(np.uint32)
        mask = (1 << bits) - 1
        syms = np.empty(n_words * spw, dtype=np.uint32)
        for k in range(spw):
            syms[k::spw] = (words >> (bits * k)) & mask
        assert syms[: arr.size].tolist() == u2s[arr].tolist()

    def test_overwide_alphabet_reports_count(self, rng):
        arr = np.arange(80, dtype=np.uint8).repeat(3)
        words = np.zeros(100, dtype=np.uint32)
        n_in_use, _used = runtime.dense_pack_words_native(arr, 6, words)
        assert n_in_use == 80  # > 1<<6: packed output invalid by contract


class TestNativeDecoder:
    def test_roundtrip_libbz2(self, rng):
        data = rng.integers(0, 200, 150_000, dtype=np.uint8).tobytes()
        assert runtime.bz2_decompress_native(bz2.compress(data, 9)) == data

    def test_capacity_growth(self):
        data = b"\x00" * 1_000_000  # extreme expansion ratio
        stream = bz2.compress(data, 9)
        assert runtime.bz2_decompress_native(stream) == data

    def test_stdlib_trailing_semantics(self, rng):
        """Whole-input decode matches stdlib bz2.decompress for every
        valid-stream-plus-trailing-data shape (CPython Lib/bz2.py):
        concatenated streams decode, junk/corrupt trailers after a
        complete stream are ignored, truncation errors anywhere."""
        data = rng.integers(0, 50, 80_000, dtype=np.uint8).tobytes()
        s = bz2.compress(data, 9)
        # concatenated streams -> both decoded
        assert runtime.bz2_decompress_native(s + s) == bz2.decompress(s + s)
        # trailing junk after a complete stream -> ignored
        for junk in (b"garbage!", b"\x00", b"\x00" * 16, b"BZh9junkjunkjunk"):
            assert runtime.bz2_decompress_native(s + junk) == data
            assert bz2.decompress(s + junk) == data
        # corrupt second stream (bad final CRC) -> ignored, like stdlib
        bad = bytearray(s)
        bad[-1] ^= 0xFF
        assert runtime.bz2_decompress_native(s + bytes(bad)) == data
        assert bz2.decompress(s + bytes(bad)) == data
        # truncation -> error, whether first or later stream
        for trunc in (s[: len(s) // 2], s + s[: len(s) // 2], s[:-1]):
            with pytest.raises(ValueError):
                runtime.bz2_decompress_native(trunc)
            with pytest.raises(ValueError):
                bz2.decompress(trunc)
        # first stream corrupt -> error (nothing committed to ignore into)
        with pytest.raises(ValueError):
            runtime.bz2_decompress_native(bytes(bad))

    def test_rle1_decode(self, rng):
        raw = np.repeat(
            rng.integers(0, 4, 200, dtype=np.uint8), rng.integers(1, 300, 200)
        ).tobytes()
        from starch3_tpu.codec.rle1 import rle1_split_blocks

        blk = rle1_split_blocks(raw, 9)[0]
        assert runtime.rle1_decode_native(blk.data) == rle1_decode(blk.data)


class TestNativeBwtAdversarial:
    """The fast rotation sorter (radix + multikey quicksort + induced
    copy) must agree with the SA-IS path and the Python oracle on every
    input shape, including the equal-rotation families that can only be
    ordered correctly via the periodicity gate."""

    def test_fuzz_vs_oracle(self, rng):
        for trial in range(120):
            kind = trial % 5
            n = int(rng.integers(16, 2000))
            if kind == 0:
                d = rng.integers(0, 256, n, dtype=np.uint8)
            elif kind == 1:
                d = rng.integers(0, 2, n, dtype=np.uint8)
            elif kind == 2:
                pat = rng.integers(0, 256, int(rng.integers(1, 8)), dtype=np.uint8)
                d = np.tile(pat, n // len(pat) + 1)[:n]
            elif kind == 3:
                d = np.full(n, 65, dtype=np.uint8)
            else:
                d = np.sort(rng.integers(0, 10, n, dtype=np.uint8))
            l1, p1 = bwt_encode(d)
            l2, p2 = runtime.bwt_native(d)
            assert l1.tolist() == l2.tolist() and p1 == p2, (trial, kind, n)


class TestNativeEncodeBlock:
    def test_fragment_matches_python_path(self, rng):
        from starch3_tpu.codec.bitio import BitWriter
        from starch3_tpu.codec.encoder import write_block
        from starch3_tpu.codec.rle1 import rle1_split_blocks

        for data in [
            rng.integers(0, 200, 80_000, dtype=np.uint8).tobytes(),
            rng.integers(97, 102, 200_000, dtype=np.uint8).tobytes(),
            b"hello starch\n" * 3000,
        ]:
            blk = rle1_split_blocks(data, 9)[0]
            native = runtime.encode_block_native(blk.data, blk.crc)
            assert native is not None
            ref = BitWriter()
            write_block(ref, blk)
            assert native == (bytes(ref._out), ref._acc, ref._nbits)


class TestNativeBedTransform:
    def _rand_bed(self, rng, n, with_rem, unsorted):
        lines = []
        for c in [b"chr1", b"chr2", b"chrX_alt"]:
            starts = np.cumsum(rng.integers(1, 500, n))
            if unsorted:
                rng.shuffle(starts)
            for s in starts.tolist():
                e = s + int(rng.integers(0, 300))
                if with_rem and rng.random() < 0.7:
                    rem = b"\t".join(
                        b"f%d" % int(rng.integers(0, 99))
                        for _ in range(int(rng.integers(1, 4)))
                    )
                    lines.append(b"%s\t%d\t%d\t%s" % (c, s, e, rem))
                else:
                    lines.append(b"%s\t%d\t%d" % (c, s, e))
        return b"\n".join(lines) + (b"\n" if rng.random() < 0.5 else b"")

    def test_fuzz_vs_python_pipeline(self, rng):
        from starch3_tpu.bed.parser import parse_bed
        from starch3_tpu.transform.delta import transform_chrom

        for trial in range(30):
            bed = self._rand_bed(
                rng, int(rng.integers(1, 150)), trial % 2 == 0, trial % 3 == 0
            )
            nat = runtime.bed_transform_native(bed)
            assert nat is not None
            ref = [transform_chrom(b) for b in parse_bed(bed)]
            assert len(nat) == len(ref)
            for t_n, t_r in zip(nat, ref):
                assert t_n[0] == t_r.chrom
                assert t_n[1] == t_r.text
                assert t_n[2] == t_r.line_count
                assert t_n[3] == t_r.base_count_nonunique
                assert t_n[4] == t_r.base_count_unique

    def test_parse_errors_fall_back(self):
        # malformed inputs return None so the NumPy parser raises exact
        # diagnostics
        assert runtime.bed_transform_native(b"chr1\t5\n") is None
        assert runtime.bed_transform_native(b"chr1\tx\t7\n") is None
        assert runtime.bed_transform_native(b"\t5\t7\n") is None


class TestNativeUntransform:
    def test_equivalence_roundtrip(self, rng):
        from starch3_tpu.api import _parse_transform
        from starch3_tpu.bed.writer import write_bed_chrom
        from starch3_tpu.transform.delta import untransform_chrom

        for trial in range(20):
            n = int(rng.integers(1, 300))
            starts = np.cumsum(rng.integers(1, 500, n))
            if trial % 3 == 0:
                rng.shuffle(starts)
            lines = []
            for s in starts.tolist():
                e = s + int(rng.integers(0, 300))
                if trial % 2 and rng.random() < 0.6:
                    lines.append(b"chr9\t%d\t%d\tx\ty" % (s, e))
                else:
                    lines.append(b"chr9\t%d\t%d" % (s, e))
            bed = b"\n".join(lines) + b"\n"
            tf = _parse_transform(bed)[0]
            nat = runtime.untransform_bed_native("chr9", tf.text)
            blk = untransform_chrom("chr9", tf.text)
            assert nat == (write_bed_chrom(blk), blk.n_records)
            assert nat[0] == bed

    def test_malformed_falls_back(self):
        assert runtime.untransform_bed_native("c", b"5x\n") is None
        assert runtime.untransform_bed_native("c", b"5\t7") is None


class TestNativeBlockDecode:
    def test_blocks_concat_to_stream(self, rng):
        from starch3_tpu.codec.encoder import bz2_compress_ex

        data = rng.integers(0, 256, 2_100_000, dtype=np.uint8).tobytes()
        enc = bz2_compress_ex(data, 9)
        assert len(enc.block_bit_offsets) > 1
        parts = [
            runtime.bz2_decode_block_native(enc.data, off, 9)
            for off in enc.block_bit_offsets
        ]
        assert b"".join(p[0] for p in parts) == data
        assert [p[1] for p in parts] == list(enc.block_crcs)

    def test_bad_offset_raises(self, rng):
        from starch3_tpu.codec.encoder import bz2_compress_ex

        enc = bz2_compress_ex(b"hello world " * 100, 9)
        with pytest.raises(ValueError):
            runtime.bz2_decode_block_native(enc.data, 7, 9)


class TestChunkedParseTransform:
    def test_equivalent_to_serial(self, rng):
        from starch3_tpu.api import _parse_transform_chunked

        parts = []
        for c in range(4):
            starts = np.cumsum(rng.integers(1, 400, 1500))
            lines = [b"chr%d\t%d\t%d" % (c, s, s + 9) for s in starts.tolist()]
            if c % 2:
                lines.insert(700, b"")  # empty line inside a chromosome
            parts.append(b"\n".join(lines))
        bed = b"\n".join(parts) + b"\n"
        ref = runtime.bed_transform_native(bed)
        for w in (2, 4, 7):
            got = _parse_transform_chunked(bed, w)
            assert [g[:5] for g in got] == [g[:5] for g in ref]


class TestCountDistinct:
    def test_matches_numpy_bincount(self, rng):
        """s3_count_distinct (feed-time alphabet classing, round 5)
        must equal the NumPy distinct-byte count on every size and
        alphabet, including the unrolled-loop remainders."""
        import numpy as np

        if runtime.get_lib() is None:
            pytest.skip("needs the native runtime")
        for n in (0, 1, 2, 3, 4, 5, 7, 8, 9, 255, 1000, 899_981):
            for hi in (1, 2, 14, 43, 200, 256):
                buf = rng.integers(0, hi, n).astype(np.uint8).tobytes()
                want = (
                    int((np.bincount(
                        np.frombuffer(buf, np.uint8), minlength=256
                    ) > 0).sum())
                    if n
                    else 0
                )
                assert runtime.count_distinct_native(buf) == want, (n, hi)

    def test_full_range(self):
        """All 256 values present."""
        if runtime.get_lib() is None:
            pytest.skip("needs the native runtime")
        assert runtime.count_distinct_native(bytes(range(256)) * 3) == 256


class TestBuildStaleness:
    def test_stamp_tracks_source_and_flags(self, tmp_path, monkeypatch):
        # A stale committed .so restored by git checkout shares its mtime
        # with the source, so staleness must be content-based (the stamp),
        # never mtime-based.  Simulate: stamp matches -> fresh; source
        # edited or flags changed -> stale; missing stamp -> stale.
        src = tmp_path / "runtime.cpp"
        so = tmp_path / "_runtime.so"
        src.write_bytes(b"int x;")
        so.write_bytes(b"\x7fELF-stale")
        monkeypatch.setattr(runtime, "_SRC", str(src))
        monkeypatch.setattr(runtime, "_SO", str(so))
        assert runtime._is_stale()  # no stamp yet
        (tmp_path / "_runtime.so.stamp").write_text(runtime._build_stamp())
        assert not runtime._is_stale()
        src.write_bytes(b"int y;")
        assert runtime._is_stale()
        src.write_bytes(b"int x;")
        assert not runtime._is_stale()
        monkeypatch.setenv("STARCH3_TPU_NO_SIMD", "1")
        assert runtime._is_stale()
