"""Randomized fuzzing of the whole codec chain (slow tier).

Covers the input-shape corners that targeted tests can miss: random run
structures, tiny/huge alphabets, block-boundary straddling, random BED
grammars.  Everything asserts the strongest property available —
byte-equality with libbz2 or byte-exact round-trip.
"""

import bz2

import numpy as np
import pytest

from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes
from starch3_tpu.codec.decoder import bz2_decompress
from starch3_tpu.codec.encoder import bz2_compress


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(12))
def test_fuzz_bitexact(seed):
    rng = np.random.default_rng(seed)
    kind = seed % 4
    n = int(rng.integers(1, 200_000))
    if kind == 0:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    elif kind == 1:
        data = rng.integers(0, int(rng.integers(2, 8)), n, dtype=np.uint8).tobytes()
    elif kind == 2:  # run-heavy
        parts = []
        total = 0
        while total < n:
            ln = int(rng.integers(1, 1000))
            parts.append(bytes([int(rng.integers(0, 256))]) * ln)
            total += ln
        data = b"".join(parts)[:n]
    else:  # text-like
        words = [b"%d" % int(rng.integers(0, 10**9)) for _ in range(n // 8)]
        data = b"\n".join(words)
    assert bz2_compress(data, 9) == bz2.compress(data, 9)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_fuzz_own_decoder(seed):
    rng = np.random.default_rng(100 + seed)
    data = rng.integers(0, 16, int(rng.integers(1, 50_000)), dtype=np.uint8).tobytes()
    assert bz2_decompress(bz2.compress(data, 9)) == data


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_fuzz_bed_roundtrip(seed):
    rng = np.random.default_rng(200 + seed)
    lines = []
    for chrom in [b"chr1", b"chr2", b"chrUn_gl000220"]:
        pos = int(rng.integers(0, 10**6))
        for _ in range(int(rng.integers(1, 2000))):
            pos += int(rng.integers(0, 5000))
            ln = int(rng.integers(1, 10**5))
            rem = b""
            if rng.integers(0, 2):
                rem = b"\t" + bytes(
                    rng.integers(33, 127, int(rng.integers(1, 30))).astype(np.uint8)
                )
            lines.append(b"%s\t%d\t%d%s" % (chrom, pos, pos + ln, rem))
    bed = b"\n".join(lines) + b"\n"
    assert decompress_starch_bytes(compress_bed_bytes(bed)) == bed


def test_corrupt_archive_never_crashes(rng):
    """Any byte-level corruption must surface as StarchError — no
    crashes, no hangs, no silently wrong output (the native decoder is C:
    bounds discipline is load-bearing)."""
    import numpy as np

    from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes
    from starch3_tpu.errors import StarchError

    parts = []
    for c in (1, 2):
        starts = np.cumsum(rng.integers(1, 400, 2000))
        parts.append(
            b"".join(
                b"chr%d\t%d\t%d\n" % (c, s, s + int(l))
                for s, l in zip(starts.tolist(), rng.integers(1, 200, 2000).tolist())
            )
        )
    # chr3: large enough to span multiple bzip2 blocks, exercising the
    # block-parallel decode path (block index + combined-CRC check)
    starts = np.cumsum(rng.integers(1, 400, 60_000))
    parts.append(
        b"".join(
            b"chr3\t%d\t%d\t%s\n" % (s, s + int(l), bytes([65 + s % 26]) * 40)
            for s, l in zip(starts.tolist(), rng.integers(1, 200, 60_000).tolist())
        )
    )
    bed = b"".join(parts)
    archive = bytearray(compress_bed_bytes(bed))
    for trial in range(60):
        a = bytearray(archive)
        mode = trial % 4
        if mode == 0:
            a[int(rng.integers(0, len(a)))] ^= 1 << int(rng.integers(0, 8))
        elif mode == 1:
            cut = int(rng.integers(0, len(a) - 50))
            del a[cut : cut + int(rng.integers(1, 50))]
        elif mode == 2:
            pos = int(rng.integers(0, len(a)))
            a[pos:pos] = bytes(
                rng.integers(0, 256, int(rng.integers(1, 20)), dtype=np.uint8)
            )
        else:
            a = a[: int(rng.integers(0, len(a)))]
        try:
            out = decompress_starch_bytes(bytes(a))
            assert out == bed  # corruption landed in dead slack only
        except StarchError:
            pass


def test_all_paths_soak(rng, tmp_path):
    """Cross-path byte-identity soak: bytes API == streaming file API ==
    device path; decode via bytes/parallel/serial/file; random levels,
    remainders, unsorted starts, missing final newline."""
    import io

    from starch3_tpu.api import (
        compress_bed_bytes,
        compress_bed_file,
        decompress_starch_bytes,
        decompress_starch_file,
    )
    from starch3_tpu.config import EncodeConfig

    for trial in range(6):
        parts = []
        for c in range(int(rng.integers(1, 5))):
            n = int(rng.integers(1, 1500))
            starts = np.cumsum(rng.integers(0, 600, n))
            if rng.random() < 0.3:
                rng.shuffle(starts)
            lines = []
            for s in starts.tolist():
                e = s + int(rng.integers(0, 400))
                if rng.random() < 0.4:
                    lines.append(b"c%d\t%d\t%d\tx%d" % (c, s, e, s % 17))
                else:
                    lines.append(b"c%d\t%d\t%d" % (c, s, e))
            parts.append(b"\n".join(lines))
        bed = b"\n".join(parts) + (b"\n" if trial % 2 else b"")
        cfg = EncodeConfig(block_size_100k=int(rng.integers(1, 10)))
        a = compress_bed_bytes(bed, cfg)
        assert decompress_starch_bytes(a) == bed
        assert decompress_starch_bytes(a, workers=1) == bed
        p = tmp_path / f"in{trial}.bed"
        p.write_bytes(bed)
        fh = io.BytesIO()
        compress_bed_file(str(p), fh, cfg, chunk_bytes=int(rng.integers(64, 1 << 14)))
        assert fh.getvalue() == a
        ap = tmp_path / f"a{trial}.starch"
        ap.write_bytes(a)
        out = io.BytesIO()
        decompress_starch_file(str(ap), out)
        assert out.getvalue() == bed


def test_fuzz_native_symbol_decoder_never_crashes(rng):
    """runtime.cpp s3_read_block_symbols on corrupted streams: every
    bit-flip of a valid stream must either decode or raise cleanly —
    never crash, hang, or read out of bounds (the entry feeds
    decode_streams with attacker-controllable archive bytes)."""
    import bz2

    import pytest

    from starch3_tpu.runtime import get_lib, read_block_symbols_native

    if get_lib() is None:
        pytest.skip("native runtime unavailable")
    from tests.conftest import make_bed_text

    data = bytes(make_bed_text(rng, n=400))
    stream = bz2.compress(data, 9)

    # the valid stream parses
    res = read_block_symbols_native(stream, 32, 9)
    assert res is not None and res[3].size > 0

    flips = rng.integers(4, len(stream), 400)  # past the BZh9 header
    for pos in flips.tolist():
        bad = bytearray(stream)
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            read_block_symbols_native(bytes(bad), 32, 9)
        except ValueError:
            pass  # clean rejection

    # truncations at every byte boundary of the first 200
    for cut in range(4, min(len(stream), 200)):
        try:
            read_block_symbols_native(stream[:cut], 32, 9)
        except ValueError:
            pass
