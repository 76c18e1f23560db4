"""Transform unit tests against a literal oracle of the reference spec.

The oracle below is a straight-line Python rendering of
``update_transformation_state`` (reference include/starch3api.hpp:428-504)
— p-line on coord_diff change, delta vs absolute start on last_stop, per-
chromosome reset — used to property-test the vectorized columnar
implementation (SURVEY.md §4 "transform unit tests").
"""

import numpy as np
import pytest

from starch3_tpu.bed.parser import ChromBlock, parse_bed
from starch3_tpu.bed.writer import write_bed, write_bed_chrom
from starch3_tpu.transform.delta import transform_chrom, untransform_chrom

from tests.conftest import make_bed_text


def oracle_transform(starts, stops, rems):
    """Literal implementation of starch3api.hpp:428-504 per chromosome."""
    out = bytearray()
    last_coord_diff = 0
    last_stop = 0
    for start, stop, rem in zip(starts, stops, rems):
        coord_diff = stop - start
        if coord_diff != last_coord_diff:
            last_coord_diff = coord_diff
            out += b"p%d\n" % coord_diff
        if last_stop != 0:
            if rem:
                out += b"%d\t%s\n" % (start - last_stop, rem)
            else:
                out += b"%d\n" % (start - last_stop)
        else:
            if rem:
                out += b"%d\t%s\n" % (start, rem)
            else:
                out += b"%d\n" % start
        last_stop = stop
    return bytes(out)


def make_block(starts, stops, rems, chrom="chrT"):
    rems = [r or b"" for r in rems]
    blob = b"".join(rems)
    offsets = np.concatenate(([0], np.cumsum([len(r) for r in rems])))
    return ChromBlock(
        chrom=chrom,
        starts=np.asarray(starts, dtype=np.int64),
        stops=np.asarray(stops, dtype=np.int64),
        rem_blob=blob,
        rem_offsets=offsets.astype(np.int64),
    )


class TestTransformVsOracle:
    def test_basic(self):
        starts = [100, 200, 300]
        stops = [150, 250, 350]
        rems = [b"", b"", b""]
        blk = make_block(starts, stops, rems)
        assert transform_chrom(blk).text == oracle_transform(starts, stops, rems)

    def test_first_record_absolute(self):
        blk = make_block([5000], [5100], [b""])
        assert transform_chrom(blk).text == b"p100\n5000\n"

    def test_p_only_on_diff_change(self):
        starts = [0, 100, 200, 300]
        stops = [50, 150, 275, 375]
        rems = [b""] * 4
        text = transform_chrom(make_block(starts, stops, rems)).text
        assert text == oracle_transform(starts, stops, rems)
        assert text.count(b"p") == 2  # p50 then p75

    def test_remainders(self):
        starts = [10, 20]
        stops = [15, 30]
        rems = [b"id1\t0.5", b"id2\t0.7\t+"]
        blk = make_block(starts, stops, rems)
        assert transform_chrom(blk).text == oracle_transform(starts, stops, rems)

    def test_overlapping_negative_delta(self):
        starts = [100, 120]
        stops = [200, 220]
        rems = [b"", b""]
        text = transform_chrom(make_block(starts, stops, rems)).text
        assert b"\n-80\n" in text  # 120 - 200
        assert text == oracle_transform(starts, stops, rems)

    def test_property_random(self, rng):
        for trial in range(20):
            n = int(rng.integers(1, 200))
            starts = np.cumsum(rng.integers(0, 1000, n)).astype(np.int64)
            stops = starts + rng.integers(1, 500, n)
            rems = [
                bytes(rng.integers(33, 127, int(rng.integers(0, 10))).astype(np.uint8))
                for _ in range(n)
            ]
            blk = make_block(starts, stops, rems)
            got = transform_chrom(blk).text
            want = oracle_transform(starts.tolist(), stops.tolist(), rems)
            assert got == want, f"trial {trial}"

    def test_stats(self):
        # intervals [0,10) [5,15) [20,30): nonunique 30, union 25
        blk = make_block([0, 5, 20], [10, 15, 30], [b""] * 3)
        tf = transform_chrom(blk)
        assert tf.base_count_nonunique == 30
        assert tf.base_count_unique == 25
        assert tf.line_count == 3


class TestUntransform:
    def test_roundtrip(self, rng):
        for _ in range(10):
            n = int(rng.integers(1, 300))
            starts = np.cumsum(rng.integers(0, 1000, n)).astype(np.int64)
            stops = starts + rng.integers(1, 500, n)
            rems = [
                bytes(rng.integers(33, 127, int(rng.integers(0, 8))).astype(np.uint8))
                for _ in range(n)
            ]
            blk = make_block(starts, stops, rems)
            back = untransform_chrom("chrT", transform_chrom(blk).text)
            assert back.starts.tolist() == starts.tolist()
            assert back.stops.tolist() == stops.tolist()
            assert back.rem_blob == blk.rem_blob
            assert back.rem_offsets.tolist() == blk.rem_offsets.tolist()

    def test_empty(self):
        blk = untransform_chrom("chrN", b"")
        assert blk.n_records == 0


class TestBedParser:
    def test_basic(self):
        blocks = parse_bed(b"chr1\t10\t20\nchr1\t30\t40\nchr2\t5\t9\n")
        assert [b.chrom for b in blocks] == ["chr1", "chr2"]
        assert blocks[0].starts.tolist() == [10, 30]
        assert blocks[0].stops.tolist() == [20, 40]
        assert blocks[1].starts.tolist() == [5]

    def test_remainder_passthrough(self):
        blocks = parse_bed(b"chr1\t10\t20\tid\t5\t+\textra\n")
        assert blocks[0].remainder(0) == b"id\t5\t+\textra"

    def test_no_trailing_newline(self):
        blocks = parse_bed(b"chr1\t10\t20")
        assert blocks[0].stops.tolist() == [20]

    def test_bad_field_count(self):
        with pytest.raises(Exception):
            parse_bed(b"chr1\t10\n")

    def test_non_numeric(self):
        with pytest.raises(Exception):
            parse_bed(b"chr1\tten\t20\n")

    def test_non_contiguous_chrom_rejected(self):
        with pytest.raises(Exception):
            parse_bed(b"chr1\t1\t2\nchr2\t1\t2\nchr1\t3\t4\n")

    def test_writer_roundtrip(self, rng):
        text = make_bed_text(rng, n=3000, with_remainder=True)
        assert write_bed(parse_bed(text)) == text

    def test_writer_roundtrip_3col(self, rng):
        text = make_bed_text(rng, n=3000, with_remainder=False)
        assert write_bed(parse_bed(text)) == text


def test_empty_remainder_canonicalizes():
    """A trailing tab (empty remainder) canonicalizes to the 3-column
    form — matching the reference's conditional emission
    (starch3api.hpp:470-475: '\\t'+rem written only when rem_len > 0)."""
    from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes

    bed = b"chr1\t1\t5\t\nchr1\t9\t12\tkeep\n"
    out = decompress_starch_bytes(compress_bed_bytes(bed))
    assert out == b"chr1\t1\t5\nchr1\t9\t12\tkeep\n"
