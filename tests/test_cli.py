"""CLI surface tests (reference parity: src/starch3.cpp:72-274)."""

import subprocess
import sys

import pytest

from tests.conftest import make_bed_text

CLI = [sys.executable, "-m", "starch3_tpu.cli"]


def run(args, input_=b"", check=True):
    r = subprocess.run(CLI + args, input=input_, capture_output=True)
    if check:
        assert r.returncode == 0, r.stderr.decode()
    return r


class TestCli:
    def test_encode_decode_roundtrip(self, tmp_path, rng):
        bed = make_bed_text(rng, n=2000, with_remainder=True)
        bed_file = tmp_path / "in.bed"
        bed_file.write_bytes(bed)
        r = run([str(bed_file)])
        assert r.stdout[:4] == bytes([0xCA, 0x5C, 0xAD, 0x1A])
        r2 = run(["--decode"], input_=r.stdout)
        assert r2.stdout == bed

    def test_stdin_encode(self, rng):
        bed = make_bed_text(rng, n=500)
        r = run([], input_=bed)
        assert r.stdout[:4] == bytes([0xCA, 0x5C, 0xAD, 0x1A])

    def test_note(self, tmp_path, rng):
        bed = make_bed_text(rng, n=100)
        r = run(["--note=hello note"], input_=bed)
        r2 = run(["--list"], input_=r.stdout)
        assert b"chromosome" in r2.stdout

    def test_version_works(self):
        # the reference's --version is silently broken (SURVEY.md §3.5);
        # ours must work in both spellings
        for flag in ("--version", "-v"):
            r = run([flag])
            assert b"starch3-tpu" in r.stdout

    def test_help(self):
        r = run(["--help"])
        assert b"Usage" in r.stdout
        assert b"--bzip2" in r.stdout

    def test_two_codecs_rejected(self, rng):
        r = run(["--bzip2", "--gzip"], input_=b"", check=False)
        assert r.returncode != 0
        assert b"one compression method" in r.stderr

    def test_missing_file(self):
        r = run(["/nonexistent/file.bed"], check=False)
        assert r.returncode != 0
        assert b"Error" in r.stderr

    def test_unknown_option(self):
        r = run(["--frobnicate"], check=False)
        assert r.returncode != 0

    def test_output_flag(self, tmp_path, rng):
        bed = make_bed_text(rng, n=300)
        out = tmp_path / "out.starch"
        run(["-o", str(out)], input_=bed)
        r = run(["--decode", str(out)])
        assert r.stdout == bed

    def test_decode_jax_routes_native(self, rng):
        # --jax on decode must not silently route onto the (measured ~35x
        # slower) device decode: the CLI notes it on stderr and uses the
        # native block-parallel path (docs/PERF.md "device decode")
        bed = make_bed_text(rng, n=300)
        r = run([], input_=bed)
        r2 = run(["--decode", "--jax"], input_=r.stdout)
        assert r2.stdout == bed
        assert b"native block-parallel" in r2.stderr

    def test_device_huffman_flag(self, rng):
        # --device-huffman routes through the fast_huff drain; bytes
        # must equal the plain encode (byte-determinism across modes)
        bed = make_bed_text(rng, n=400)
        plain = run([], input_=bed)
        dh = run(["--jax", "--device-huffman", "--platform=cpu"], input_=bed)
        assert dh.stdout == plain.stdout
        r2 = run(["--decode"], input_=dh.stdout)
        assert r2.stdout == bed

    def test_gzip_flag(self, rng):
        bed = make_bed_text(rng, n=300)
        r = run(["--gzip"], input_=bed)
        r2 = run(["--decode"], input_=r.stdout)
        assert r2.stdout == bed

    def test_gzip_segment_flag(self, rng):
        from starch3_tpu.format.archive import StarchReader

        bed = make_bed_text(rng, n=2000)
        r = run(["--gzip", "--gzip-segment=1024"], input_=bed)
        meta = StarchReader.from_bytes(r.stdout).metadata.streams[0]
        assert len(meta.block_bit_offsets) > 1  # genuinely segmented
        r2 = run(["--decode"], input_=r.stdout)
        assert r2.stdout == bed
        r3 = run(["--gzip", "--gzip-segment=-1"], input_=bed, check=False)
        assert r3.returncode != 0


def test_extract_chromosome(tmp_path):
    from starch3_tpu.api import compress_bed_bytes, extract_chromosome
    from starch3_tpu.errors import FormatError
    import pytest

    bed = b"chr1\t1\t5\nchr1\t9\t12\tx\nchr2\t3\t8\n"
    archive = compress_bed_bytes(bed)
    assert extract_chromosome(archive, "chr1") == b"chr1\t1\t5\nchr1\t9\t12\tx\n"
    assert extract_chromosome(archive, "chr2") == b"chr2\t3\t8\n"
    with pytest.raises(FormatError):
        extract_chromosome(archive, "chrZ")


def test_cli_chrom_flag(tmp_path, capsysbinary):
    from starch3_tpu.cli import main

    bed = tmp_path / "in.bed"
    bed.write_bytes(b"chrA\t1\t2\nchrB\t4\t9\n")
    arch = tmp_path / "a.starch"
    assert main([str(bed), "-o", str(arch)]) == 0
    assert main(["--decode", "--chrom", "chrB", str(arch)]) == 0
    assert capsysbinary.readouterr().out == b"chrB\t4\t9\n"


def test_streaming_decode_file_matches(tmp_path):
    import io

    from starch3_tpu.api import (
        compress_bed_bytes,
        decompress_starch_file,
    )

    bed = b"".join(
        b"chr%d\t%d\t%d\n" % (c, i * 7, i * 7 + 5)
        for c in (1, 2, 3)
        for i in range(500)
    )
    arch = tmp_path / "a.starch"
    arch.write_bytes(compress_bed_bytes(bed))
    fh = io.BytesIO()
    decompress_starch_file(str(arch), fh)
    assert fh.getvalue() == bed
