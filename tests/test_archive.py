"""Archive format + end-to-end pipeline tests (SURVEY.md §4 golden-format)."""

import bz2

import numpy as np

import pytest

from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes, list_chromosomes
from starch3_tpu.config import CompressionMethod, EncodeConfig
from starch3_tpu.errors import FormatError
from starch3_tpu.format.archive import (
    ARCHIVE_MAGIC,
    FOOTER_LEN,
    StarchReader,
    StarchWriter,
)

from tests.conftest import make_bed_text


class TestArchiveContainer:
    def test_magic_bytes(self):
        # must match the reference header exactly (starch3api.hpp:907-910)
        assert ARCHIVE_MAGIC == bytes([0xCA, 0x5C, 0xAD, 0x1A])
        w = StarchWriter()
        data = w.finish()
        assert data[:4] == ARCHIVE_MAGIC
        assert data[-4:] == ARCHIVE_MAGIC

    def test_metadata_roundtrip(self):
        w = StarchWriter(note="hello world")
        w.add_stream(
            "chr1", b"STREAMBYTES",
            uncompressed_size=100, line_count=5,
            base_count_nonunique=50, base_count_unique=40,
        )
        r = StarchReader.from_bytes(w.finish())
        assert r.metadata.note == "hello world"
        s = r.metadata.streams[0]
        assert (s.chromosome, s.size, s.line_count) == ("chr1", 11, 5)
        assert r.stream_bytes("chr1") == b"STREAMBYTES"

    def test_corrupt_metadata_detected(self):
        w = StarchWriter()
        w.add_stream(
            "chr1", b"x", uncompressed_size=1, line_count=1,
            base_count_nonunique=1, base_count_unique=1,
        )
        data = bytearray(w.finish())
        data[-FOOTER_LEN - 2] ^= 0xFF  # flip a metadata byte
        with pytest.raises(FormatError):
            StarchReader.from_bytes(bytes(data))

    def test_bad_magic_rejected(self):
        with pytest.raises(FormatError):
            StarchReader.from_bytes(b"nope" + b"\x00" * 200)


class TestEndToEnd:
    def test_roundtrip_3col(self, rng):
        bed = make_bed_text(rng, n=5000)
        archive = compress_bed_bytes(bed)
        assert decompress_starch_bytes(archive) == bed

    def test_roundtrip_remainder(self, rng):
        bed = make_bed_text(rng, n=5000, with_remainder=True)
        archive = compress_bed_bytes(bed)
        assert decompress_starch_bytes(archive) == bed

    def test_streams_are_plain_bzip2(self, rng):
        # each chromosome stream must be an independent, complete bzip2
        # stream (consumable by any bzip2 tool)
        bed = make_bed_text(rng, n=3000, chroms=("chr1", "chr2"))
        reader = StarchReader.from_bytes(compress_bed_bytes(bed))
        for meta, stream in reader.iter_streams():
            assert stream[:3] == b"BZh"
            assert len(bz2.decompress(stream)) == meta.uncompressed_size

    def test_gzip_backend(self, rng):
        bed = make_bed_text(rng, n=2000)
        cfg = EncodeConfig(method=CompressionMethod.GZIP)
        archive = compress_bed_bytes(bed, cfg)
        assert decompress_starch_bytes(archive) == bed

    def test_determinism(self, rng):
        bed = make_bed_text(rng, n=2000)
        assert compress_bed_bytes(bed) == compress_bed_bytes(bed)

    def test_note_in_metadata(self, rng):
        bed = make_bed_text(rng, n=100)
        archive = compress_bed_bytes(bed, EncodeConfig(note="my note"))
        assert StarchReader.from_bytes(archive).metadata.note == "my note"

    def test_list(self, rng):
        bed = make_bed_text(rng, n=900, chroms=("chr1", "chr2", "chr3"))
        rows = list_chromosomes(compress_bed_bytes(bed))
        assert [r["chromosome"] for r in rows] == ["chr1", "chr2", "chr3"]
        assert all(r["lineCount"] == 300 for r in rows)

    def test_empty_input(self):
        archive = compress_bed_bytes(b"")
        assert decompress_starch_bytes(archive) == b""


class TestStreamingFileEncode:
    def test_identical_to_bytes_api(self, tmp_path, rng):
        import io

        from starch3_tpu.api import compress_bed_bytes, compress_bed_file

        parts = []
        for c in ["chr1", "chr10", "chr2"]:
            n = int(rng.integers(200, 2000))
            starts = np.cumsum(rng.integers(1, 400, n))
            parts.append(
                b"".join(
                    b"%s\t%d\t%d\n" % (c.encode(), s, s + int(l))
                    for s, l in zip(starts.tolist(), rng.integers(1, 200, n).tolist())
                )
            )
        bed = b"".join(parts)
        p = tmp_path / "in.bed"
        p.write_bytes(bed)
        want = compress_bed_bytes(bed)
        for chunk in (1 << 12, 1 << 16, 1 << 24):
            fh = io.BytesIO()
            compress_bed_file(str(p), fh, chunk_bytes=chunk)
            assert fh.getvalue() == want

    def test_non_contiguous_raises(self, tmp_path):
        import io

        import pytest

        from starch3_tpu.api import compress_bed_file
        from starch3_tpu.errors import BedParseError

        p = tmp_path / "bad.bed"
        p.write_bytes(b"chr1\t1\t2\nchr2\t1\t2\nchr1\t5\t9\n")
        with pytest.raises(BedParseError):
            compress_bed_file(str(p), io.BytesIO(), chunk_bytes=8)


def test_no_trailing_newline_roundtrip():
    """Inputs whose final line lacks a newline must round-trip
    byte-exactly (metadata finalNewline flag); newline-terminated
    archives are byte-unchanged by the flag (omitted when True)."""
    import io

    from starch3_tpu.api import (
        compress_bed_bytes,
        compress_bed_file,
        decompress_starch_bytes,
        decompress_starch_file,
    )

    bed_nl = b"chr1\t1\t5\nchr2\t9\t12\n"
    bed_no = bed_nl[:-1]
    a_nl = compress_bed_bytes(bed_nl)
    a_no = compress_bed_bytes(bed_no)
    assert decompress_starch_bytes(a_nl) == bed_nl
    assert decompress_starch_bytes(a_no) == bed_no
    assert decompress_starch_bytes(a_no, workers=1) == bed_no
    assert b'"finalNewline":false' in a_no and b"finalNewline" not in a_nl


def test_no_trailing_newline_streaming(tmp_path):
    import io

    from starch3_tpu.api import (
        compress_bed_bytes,
        compress_bed_file,
        decompress_starch_file,
    )

    bed = b"chr1\t1\t5\nchr2\t9\t12"
    p = tmp_path / "in.bed"
    p.write_bytes(bed)
    fh = io.BytesIO()
    compress_bed_file(str(p), fh, chunk_bytes=7)
    assert fh.getvalue() == compress_bed_bytes(bed)
    ap = tmp_path / "a.starch"
    ap.write_bytes(fh.getvalue())
    out = io.BytesIO()
    decompress_starch_file(str(ap), out)
    assert out.getvalue() == bed
