#!/usr/bin/env python3
"""Benchmark: end-to-end Starch encode throughput vs the libbz2 floor.

Primary workload: BASELINE.json config 2 — a whole-genome sorted BED
(24 chromosomes, ~1.08M intervals, ~25 MB) encoded to a .starch archive
through the full pipeline (parse -> transform -> bzip2 -> archive).
Per-chromosome streams and 900 KB blocks are independent, so this is the
configuration where the framework's block-parallel design engages; the
single-stream chr21 config (config 1) is reported in detail.

Baseline: the reference cannot run end-to-end (its flush stage is a stub,
reference include/starch3api.hpp:393-407), so per SURVEY.md §6 the floor
is stock libbz2 -9 compressing the same transformed texts single-threaded
— exactly the codec work the reference's intended pipeline would do.

Also attempted: the JAX/TPU device path in a subprocess with a timeout
(this environment's tunneled chip can take minutes to compile the BWT
while-loop program; on a directly-attached chip the compile is one-time).
Correctness gates: archive round-trips byte-exactly and every stream is
bit-identical to libbz2.

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


def make_genome_bed(n_per: int = 45_000, seed: int = 5) -> bytes:
    rng = np.random.default_rng(seed)
    parts = []
    for c in list(range(1, 23)) + ["X", "Y"]:
        name = f"chr{c}".encode()
        gaps = rng.integers(1, 2000, n_per)
        starts = 10_000 + np.cumsum(gaps)
        lens = rng.integers(20, 500, n_per)
        stops = starts + lens
        parts.append(
            b"\n".join(
                b"%s\t%d\t%d" % (name, s, e)
                for s, e in zip(starts.tolist(), stops.tolist())
            )
        )
    return b"\n".join(parts) + b"\n"


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


def measure_encode(bed: bytes, use_jax: bool, reps: int = 3) -> tuple[float, bytes]:
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
        # subprocess mode: the device path on a 150K-interval chr21 slice
        # (true 901 120-element geometry bucket).  After the scatter->sort
        # /gather->roll kernel rework this compiles in ~100 s on the
        # tunneled backend (was >10 min); steady-state remains tunnel-
        # dispatch-latency bound (~0.3 s/round trip), not kernel bound
        # (the BWT itself measures ~0.4 ms per 131k block on-chip).
        bed = make_chr21_bed(150_000)
        dt, archive = measure_encode(bed, use_jax=True)
        sys.stdout.write(
            json.dumps({"seconds": dt, "n": len(archive), "in": len(bed)}) + "\n"
        )
        return 0

    from starch3_tpu.api import _parse_transform, decompress_starch_bytes

    bed = make_genome_bed()
    texts = [tf.text for tf in _parse_transform(bed)]

    # baseline: libbz2 -9 over the transformed texts, single-threaded C
    baseline_streams = [stdlib_bz2.compress(t, 9) for t in texts]
    baseline_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for t in texts:
            stdlib_bz2.compress(t, 9)
        baseline_dt = min(baseline_dt, time.perf_counter() - t0)
    baseline_mbps = len(bed) / baseline_dt / 1e6

    host_dt, archive = measure_encode(bed, use_jax=False)
    host_mbps = len(bed) / host_dt / 1e6

    # correctness gates: byte-exact round-trip + streams match libbz2
    decode_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        decoded = decompress_starch_bytes(archive)
        decode_dt = min(decode_dt, time.perf_counter() - t0)
    decode_mbps = len(bed) / decode_dt / 1e6
    assert decoded == bed, "round-trip failed"
    from starch3_tpu.format.archive import StarchReader

    reader = StarchReader.from_bytes(archive)
    for meta, want in zip(reader.metadata.streams, baseline_streams):
        got = reader.stream_bytes(meta.chromosome)
        assert got == want, f"{meta.chromosome}: stream not bit-identical to libbz2"

    # single-stream chr21 detail (config 1)
    bed21 = make_chr21_bed()
    chr21_dt, archive21 = measure_encode(bed21, use_jax=False)
    chr21_mbps = len(bed21) / chr21_dt / 1e6

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
                jax_mbps = out["in"] / out["seconds"] / 1e6
        except (subprocess.TimeoutExpired, Exception):
            jax_mbps = None

    mbps = host_mbps  # device-path detail is a different (small) workload
    print(
        json.dumps(
            {
                "metric": "starch encode throughput (whole-genome 1.08M intervals, 24 chroms, end-to-end)",
                "value": round(mbps, 3),
                "unit": "MB/s",
                "vs_baseline": round(mbps / baseline_mbps, 3),
                "detail": {
                    "input_bytes": len(bed),
                    "archive_bytes": len(archive),
                    "workers": os.cpu_count(),
                    "baseline_libbz2_1core_mb_s": round(baseline_mbps, 3),
                    "decode_mb_s": round(decode_mbps, 3),
                    "chr21_single_stream_mb_s": round(chr21_mbps, 3),
                    "jax_path_mb_s_901k_tunnel_latency_bound": round(jax_mbps, 3) if jax_mbps else None,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
