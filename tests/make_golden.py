"""Regenerate the golden-format fixtures (run from the repo root).

Intentional format changes must bump FORMAT_VERSION, rerun this, and
commit the new fixtures; test_golden.py trips on anything else.
"""

import json
import os

import numpy as np

from starch3_tpu.api import compress_bed_bytes
from starch3_tpu.config import CompressionMethod, EncodeConfig
from starch3_tpu.format.archive import build_footer, FOOTER_LEN

HERE = os.path.dirname(os.path.abspath(__file__))

GOLDEN_BED = (
    b"chr1\t100\t200\tfeature-a\t13\t+\n"
    b"chr1\t250\t350\tfeature-b\t99\t-\n"
    b"chr2\t5\t42\n"
    b"chr2\t42\t99\tx\n"
)


def multiblock_bed() -> bytes:
    """Deterministic BED whose chr1 transformed text spans 3+ blocks at
    block_size_100k=1 (100 kB blocks)."""
    rng = np.random.default_rng(42)
    starts = 1000 + np.cumsum(rng.integers(1, 5000, 30_000))
    lens = rng.integers(1, 3000, 30_000)
    return b"".join(
        b"chr1\t%d\t%d\n" % (s, s + int(l))
        for s, l in zip(starts.tolist(), lens.tolist())
    )


def downgrade_to_v10(archive: bytes) -> bytes:
    """Rewrite an archive's metadata as version 1.0: no block_bit_offsets
    (the field metadata 1.1 added); readers must default it to empty."""
    foot = archive[-FOOTER_LEN:]
    meta_off = int(foot[:20].decode())
    meta = json.loads(archive[meta_off:-FOOTER_LEN].decode())
    meta["version"] = {"major": 1, "minor": 0, "revision": 0}
    for s in meta["streams"]:
        s.pop("block_bit_offsets", None)
    meta_bytes = json.dumps(
        meta, sort_keys=True, separators=(",", ":")
    ).encode()
    return archive[:meta_off] + meta_bytes + build_footer(meta_off, meta_bytes)


def main() -> None:
    fixtures = {
        "golden.starch": compress_bed_bytes(
            GOLDEN_BED, EncodeConfig(note="golden")
        ),
        "golden_gzip.starch": compress_bed_bytes(
            GOLDEN_BED, EncodeConfig(note="golden", method=CompressionMethod.GZIP)
        ),
        "golden_multiblock.starch": compress_bed_bytes(
            multiblock_bed(), EncodeConfig(note="golden", block_size_100k=1)
        ),
        "golden_nofinal.starch": compress_bed_bytes(
            GOLDEN_BED[:-1], EncodeConfig(note="golden")
        ),
    }
    fixtures["golden_v10.starch"] = downgrade_to_v10(fixtures["golden.starch"])
    for name, data in fixtures.items():
        path = os.path.join(HERE, name)
        with open(path, "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
