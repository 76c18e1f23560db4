#!/usr/bin/env python3
"""Benchmark: end-to-end Starch encode throughput vs the libbz2 floor.

Workload: BASELINE.json config 1 — a chr21-scale sorted BED (~100K
intervals, 3-column) encoded to a .starch archive through the full
pipeline (parse -> transform -> bzip2 -> archive).

Baseline: the reference cannot run end-to-end (its flush stage is a stub,
reference include/starch3api.hpp:393-407), so per SURVEY.md §6 the floor
is stock libbz2 -9 compressing the same transformed text single-threaded
— exactly the codec work the reference's intended pipeline would do.

Two measured paths, best reported:
  - host path (native SA-IS BWT + C++ runtime residue) — always runs;
  - JAX/TPU path, attempted in a subprocess with a timeout, because this
    environment's AOT helper can take many minutes to compile the BWT
    while-loop program (see docs/DESIGN.md); on a directly-attached chip
    the compile is one-time and the device path wins.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}
"""

import bz2 as stdlib_bz2
import json
import os
import subprocess
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


def measure(bed: bytes, use_jax: bool, reps: int = 3) -> tuple[float, bytes]:
    from starch3_tpu.api import compress_bed_bytes
    from starch3_tpu.config import EncodeConfig

    config = EncodeConfig(use_jax=use_jax)
    archive = compress_bed_bytes(bed, config)  # warm-up / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        archive = compress_bed_bytes(bed, config)
        best = min(best, time.perf_counter() - t0)
    return best, archive


def main() -> int:
    if "--jax-worker" in sys.argv:
        # subprocess mode: attempt the device path, print seconds
        bed = make_chr21_bed()
        dt, archive = measure(bed, use_jax=True)
        sys.stdout.write(json.dumps({"seconds": dt, "n": len(archive)}) + "\n")
        return 0

    bed = make_chr21_bed()

    from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes
    from starch3_tpu.bed.parser import parse_bed
    from starch3_tpu.transform.delta import transform_chrom

    # baseline: libbz2 -9 over the transformed text, single-threaded C
    tf_text = transform_chrom(parse_bed(bed)[0]).text
    t0 = time.perf_counter()
    baseline_stream = stdlib_bz2.compress(tf_text, 9)
    baseline_dt = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        stdlib_bz2.compress(tf_text, 9)
        baseline_dt = min(baseline_dt, time.perf_counter() - t0)
    baseline_mbps = len(bed) / baseline_dt / 1e6

    host_dt, archive = measure(bed, use_jax=False)
    host_mbps = len(bed) / host_dt / 1e6

    jax_mbps = None
    if "--no-jax" not in sys.argv:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--jax-worker"],
                capture_output=True,
                timeout=480,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if r.returncode == 0:
                out = json.loads(r.stdout.decode().strip().splitlines()[-1])
                jax_mbps = len(bed) / out["seconds"] / 1e6
        except (subprocess.TimeoutExpired, Exception):
            jax_mbps = None

    # correctness gates: round-trip + payload matches libbz2 bit-exactly
    assert decompress_starch_bytes(archive) == bed, "round-trip failed"
    from starch3_tpu.format.archive import StarchReader

    stream = StarchReader.from_bytes(archive).stream_bytes("chr21")
    assert stream == baseline_stream, "stream not bit-identical to libbz2"

    mbps = max(host_mbps, jax_mbps or 0.0)
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
                    "host_path_mb_s": round(host_mbps, 3),
                    "jax_path_mb_s": round(jax_mbps, 3) if jax_mbps else None,
                    "baseline_libbz2_mb_s": round(baseline_mbps, 3),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
