#!/usr/bin/env python3
"""Benchmark: end-to-end Starch encode throughput vs the libbz2 floor.

Workload: BASELINE.json config 1 — a chr21-scale sorted BED (~100K
intervals, 3-column) encoded to a .starch archive through the full
pipeline (parse -> transform -> bzip2 -> archive).

Baseline: the reference cannot run end-to-end (its flush stage is a stub,
reference include/starch3api.hpp:393-407), so per SURVEY.md §6 the floor
is stock libbz2 -9 compressing the same transformed text single-threaded
— exactly the codec work the reference's intended pipeline would do.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}
"""

import bz2 as stdlib_bz2
import json
import sys
import time

import numpy as np


def make_chr21_bed(n_intervals: int = 100_000, seed: int = 21) -> bytes:
    rng = np.random.default_rng(seed)
    gaps = rng.integers(1, 900, n_intervals)
    starts = 5_010_000 + np.cumsum(gaps)
    lens = rng.integers(20, 400, n_intervals)
    stops = starts + lens
    lines = []
    for s, e in zip(starts.tolist(), stops.tolist()):
        lines.append(b"chr21\t%d\t%d" % (s, e))
    return b"\n".join(lines) + b"\n"


def main() -> int:
    use_jax = "--no-jax" not in sys.argv
    bed = make_chr21_bed()

    from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes
    from starch3_tpu.config import EncodeConfig
    from starch3_tpu.transform.delta import transform_chrom
    from starch3_tpu.bed.parser import parse_bed

    # baseline: libbz2 -9 over the transformed text (the codec work the
    # reference pipeline would do), single-threaded C
    tf_text = transform_chrom(parse_bed(bed)[0]).text
    t0 = time.perf_counter()
    baseline_stream = stdlib_bz2.compress(tf_text, 9)
    baseline_dt = time.perf_counter() - t0
    baseline_mbps = len(bed) / baseline_dt / 1e6

    config = EncodeConfig(use_jax=use_jax)
    # warm-up run: compiles every device program for the real geometry
    # off the clock (first TPU compile is tens of seconds, cached after)
    compress_bed_bytes(bed, config)
    t0 = time.perf_counter()
    archive = compress_bed_bytes(bed, config)
    dt = time.perf_counter() - t0
    mbps = len(bed) / dt / 1e6

    # correctness gates: round-trip + payload matches libbz2 bit-exactly
    assert decompress_starch_bytes(archive) == bed, "round-trip failed"
    from starch3_tpu.format.archive import StarchReader

    stream = StarchReader.from_bytes(archive).stream_bytes("chr21")
    assert stream == baseline_stream, "stream not bit-identical to libbz2"

    print(
        json.dumps(
            {
                "metric": "starch encode throughput (chr21 100K intervals, end-to-end)",
                "value": round(mbps, 3),
                "unit": "MB/s",
                "vs_baseline": round(mbps / baseline_mbps, 3),
                "detail": {
                    "input_bytes": len(bed),
                    "archive_bytes": len(archive),
                    "encode_seconds": round(dt, 3),
                    "baseline_libbz2_mb_s": round(baseline_mbps, 3),
                    "jax": use_jax,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
