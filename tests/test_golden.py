"""Format-freeze golden test.

tests/golden.starch is a committed archive of a fixed 4-record BED; any
unintentional change to the on-disk contract (format/SPEC.md) — transform
text, bzip2 payload, metadata serialization, footer — trips the byte
comparison.  Intentional format changes must bump FORMAT_VERSION and
regenerate the fixture.
"""

import os

from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes
from starch3_tpu.config import EncodeConfig

GOLDEN_BED = (
    b"chr1\t100\t200\tfeature-a\t13\t+\n"
    b"chr1\t250\t350\tfeature-b\t99\t-\n"
    b"chr2\t5\t42\n"
    b"chr2\t42\t99\tx\n"
)
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden.starch")


def test_archive_bytes_frozen():
    golden = open(GOLDEN_PATH, "rb").read()
    assert compress_bed_bytes(GOLDEN_BED, EncodeConfig(note="golden")) == golden


def test_golden_decodes():
    golden = open(GOLDEN_PATH, "rb").read()
    assert decompress_starch_bytes(golden) == GOLDEN_BED
