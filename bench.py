#!/usr/bin/env python3
"""Benchmark: end-to-end Starch encode throughput, device path first.

Primary workload: BASELINE.json config 2 — a whole-genome sorted BED
(24 chromosomes, ~1.08M intervals, ~25 MB) encoded to a .starch archive
through the full production pipeline.  The headline is the `--jax`
path as shipped: device kernels (3-operand one-sort BWT -> narrow
Pallas MTF -> nibble-packed rank download, host-native RLE2 tail) with
host-assist work stealing — the hybrid IS the production device path;
"device_only" in the detail isolates the chip.

Baseline: the reference cannot run end-to-end (its flush stage is a
stub, reference include/starch3api.hpp:393-407), so per SURVEY.md §6 the
floor is stock libbz2 -9 compressing the same transformed texts
single-threaded — exactly the codec work the reference's intended
pipeline would do.

Regression guard: normalized ratios (host and jax vs the same-run libbz2
baseline) are compared against the newest committed BENCH_r*.json; drops
>10% are flagged in the output's ``regressions`` field so a slide like
round 2's host-path 2.47x -> 2.15x can't pass silently.

Environment note recorded in the output: on this driver box the chip is
reached through a tunnel measured at ~76 MB/s up / ~45 MB/s down, which
taxes every device byte moved; docs/PERF.md carries the speed-of-light
analysis.

Correctness gates: archive round-trips byte-exactly, every stream is
bit-identical to libbz2, and the jax-path archive equals the host-path
archive.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}
"""

import bz2 as stdlib_bz2
import glob
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

# persistent XLA compilation cache: the device-path programs take
# minutes to compile cold; cache them across processes/rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


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


def make_genome_bed_wide(n_per: int = 25_000, seed: int = 7) -> bytes:
    """BASELINE config 3: BED with id/score/strand remainder columns
    (mixed numeric+text blocks).  The transformed text keeps remainders
    verbatim (reference passthrough starch3api.hpp:456-478), giving a
    ~21-symbol alphabet — the bits==5 device tier."""
    rng = np.random.default_rng(seed)
    parts = []
    for c in list(range(1, 23)) + ["X", "Y"]:
        name = f"chr{c}".encode()
        gaps = rng.integers(1, 2000, n_per)
        starts = 10_000 + np.cumsum(gaps)
        lens = rng.integers(20, 500, n_per)
        stops = starts + lens
        scores = rng.integers(0, 1000, n_per)
        strands = rng.integers(0, 2, n_per)
        lines = []
        for i, (s, e, sc, st) in enumerate(
            zip(starts.tolist(), stops.tolist(), scores.tolist(), strands.tolist())
        ):
            lines.append(
                b"%s\t%d\t%d\tpeak_%d\t%d\t%s"
                % (name, s, e, i, sc, b"+" if st else b"-")
            )
        parts.append(b"\n".join(lines))
    return b"\n".join(parts) + b"\n"


def make_genome_bed_bits6(n_per: int = 25_000, seed: int = 13) -> bytes:
    """A corpus whose transformed text lands in the 33..64-symbol
    alphabet (the bits==6 device tier): lowercase gene-style ids with
    separators plus float scores — digits(10) + p - \\t \\n + a-z(26) +
    _ . + strand = ~43 distinct bytes.  Fills the round-4 gap where
    _bits_class routed 33..64 symbols to a tier no bench ever
    measured."""
    rng = np.random.default_rng(seed)
    syll = [
        b"lo", b"ra", b"mek", b"tin", b"vas", b"pol", b"dur", b"sen",
        b"cab", b"fog", b"hex", b"jaw", b"zyg", b"qub", b"wix", b"byr",
    ]
    parts = []
    for c in list(range(1, 23)) + ["X", "Y"]:
        name = f"chr{c}".encode()
        gaps = rng.integers(1, 2000, n_per)
        starts = 10_000 + np.cumsum(gaps)
        lens = rng.integers(20, 500, n_per)
        stops = starts + lens
        picks = rng.integers(0, len(syll), (n_per, 3))
        scores = rng.integers(0, 100000, n_per)
        strands = rng.integers(0, 2, n_per)
        lines = []
        for i, (s, e, sc, st) in enumerate(
            zip(starts.tolist(), stops.tolist(), scores.tolist(), strands.tolist())
        ):
            gene = b"".join(syll[j] for j in picks[i]) + b"_%d.%d" % (i % 97, sc % 10)
            lines.append(
                b"%s\t%d\t%d\t%s\t%d.%02d\t%s"
                % (name, s, e, gene, sc // 100, sc % 100, b"+" if st else b"-")
            )
        parts.append(b"\n".join(lines))
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


def _per_chip_stage_rates() -> dict:
    """Batch-amortized on-chip rates of the production stages at the two
    hot geometry buckets (compile-cached; blocks from the bench corpus)."""
    import jax
    import jax.numpy as jnp

    from starch3_tpu.api import _parse_transform
    from starch3_tpu.codec.rle1 import rle1_split_blocks
    from starch3_tpu.ops.bwt_fast import bwt_sort_fast3
    from starch3_tpu.ops.mtf_narrow_pallas import mtf_ranks_narrow_batch
    from starch3_tpu.parallel.pipeline import _jitted_fused_step_ranks4

    if jax.default_backend() != "tpu":
        return {"note": "no TPU visible; stage rates skipped"}

    bed = make_genome_bed()
    texts = [tf.text for tf in _parse_transform(bed)]
    datas = sorted(
        (np.frombuffer(b.data, np.uint8) for t in texts
         for b in rle1_split_blocks(t, 9)),
        key=lambda a: -a.size,
    )

    def bench_fn(fn, *args, reps=6):
        out = fn(*args)
        np.asarray(jnp.ravel(out if not isinstance(out, tuple) else out[0])[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jnp.ravel(out if not isinstance(out, tuple) else out[0])[0])
        return (time.perf_counter() - t0) / reps

    rates = {}
    B = 6  # batch-amortized: the sort's dispatch overheads shrink with B
    for n_max in (458_752, 901_120):
        fit = [a for a in datas if a.size <= n_max][:B]
        if not fit:
            continue  # no corpus block in this geometry bucket
        while len(fit) < B:
            fit.append(fit[len(fit) % max(len(fit), 1)])
        seqs = np.zeros((B, n_max), np.int32)
        lens = np.zeros(B, np.int32)
        for i, arr in enumerate(fit):
            used = np.bincount(arr, minlength=256) > 0
            u2s = (np.cumsum(used) - 1).astype(np.int32)
            seqs[i, : arr.size] = u2s[arr]
            lens[i] = arr.size
        seqs_d, lens_d = jnp.asarray(seqs), jnp.asarray(lens)
        packed_d = jnp.asarray((seqs[:, 0::2] | (seqs[:, 1::2] << 4)).astype(np.uint8))
        dt_sort = bench_fn(
            jax.jit(jax.vmap(lambda s, n: bwt_sort_fast3(s, n, n_max))),
            seqs_d, lens_d,
        )
        dt_mtf = bench_fn(
            jax.jit(lambda s: mtf_ranks_narrow_batch(s, n_max)), seqs_d
        )
        dt_full = bench_fn(
            _jitted_fused_step_ranks4(n_max, True), packed_d, lens_d
        )
        key = "448k" if n_max == 458_752 else "901k"
        mbps = lambda dt: round(B * n_max / dt / 1e6, 1)
        rates[key] = {
            "bwt_one_sort_3op": mbps(dt_sort),
            "mtf_narrow_pallas": mbps(dt_mtf),
            "full_step_combined": mbps(dt_full),
        }
    # mid-width class (bits==5): config-3 corpus blocks (21 symbols)
    from starch3_tpu.ops.bwt_fast import bwt_sort_fast_mid
    from starch3_tpu.parallel.pipeline import _jitted_fused_step_ranks_mid

    bed_w = make_genome_bed_wide()
    texts_w = [tf.text for tf in _parse_transform(bed_w)]
    datas_w = sorted(
        (np.frombuffer(b.data, np.uint8) for t in texts_w
         for b in rle1_split_blocks(t, 9)),
        key=lambda a: -a.size,
    )
    n_max = 901_120
    fit = [a for a in datas_w if a.size <= n_max][:B]
    if fit:
        while len(fit) < B:
            fit.append(fit[len(fit) % max(len(fit), 1)])
        seqs = np.zeros((B, n_max), np.int32)
        lens = np.zeros(B, np.int32)
        spw = 6
        n_words = (n_max + spw - 1) // spw
        words = np.zeros((B, n_words), np.uint32)
        for i, arr in enumerate(fit):
            used = np.bincount(arr, minlength=256) > 0
            u2s = (np.cumsum(used) - 1).astype(np.int32)
            s = u2s[arr]
            seqs[i, : arr.size] = s
            lens[i] = arr.size
            sp = np.zeros(n_words * spw, np.uint32)
            sp[: arr.size] = s
            sp = sp.reshape(n_words, spw)
            w = sp[:, 0].copy()
            for k in range(1, spw):
                w |= sp[:, k] << (5 * k)
            words[i] = w
        seqs_d, lens_d = jnp.asarray(seqs), jnp.asarray(lens)
        words_d = jnp.asarray(words.view(np.int32))
        sort5 = jax.jit(jax.vmap(lambda s, n: bwt_sort_fast_mid(s, n, n_max, 5)))
        dt_sort = bench_fn(sort5, seqs_d, lens_d)
        ties_total = int(np.asarray(sort5(seqs_d, lens_d)[2]).sum())
        dt_mtf = bench_fn(
            jax.jit(lambda s: mtf_ranks_narrow_batch(s, n_max, width=32)), seqs_d
        )
        dt_full = bench_fn(
            _jitted_fused_step_ranks_mid(n_max, 5, True), words_d, lens_d
        )
        mbps = lambda dt: round(B * n_max / dt / 1e6, 1)
        rates["901k_bits5_config3"] = {
            "bwt_one_sort_4op_mid": mbps(dt_sort),
            "mtf_narrow32_pallas": mbps(dt_mtf),
            "full_step_combined": mbps(dt_full),
            "sort_ties_in_batch": ties_total,
        }
    # mid-width class (bits==6): 33..64-symbol remainder text (gene-id
    # + float columns) — round-4's unmeasured tier
    bed6 = make_genome_bed_bits6()
    texts6 = [tf.text for tf in _parse_transform(bed6)]
    datas6 = sorted(
        (np.frombuffer(b.data, np.uint8) for t in texts6
         for b in rle1_split_blocks(t, 9)),
        key=lambda a: -a.size,
    )
    n_max = 901_120
    fit = [a for a in datas6
           if a.size <= n_max and 32 < len(np.unique(a)) <= 64][:B]
    if fit:
        while len(fit) < B:
            fit.append(fit[len(fit) % max(len(fit), 1)])
        seqs = np.zeros((B, n_max), np.int32)
        lens = np.zeros(B, np.int32)
        spw = 5  # 30 // 6
        n_words = (n_max + spw - 1) // spw
        words = np.zeros((B, n_words), np.uint32)
        for i, arr in enumerate(fit):
            used = np.bincount(arr, minlength=256) > 0
            u2s = (np.cumsum(used) - 1).astype(np.int32)
            s = u2s[arr]
            seqs[i, : arr.size] = s
            lens[i] = arr.size
            sp = np.zeros(n_words * spw, np.uint32)
            sp[: arr.size] = s
            sp = sp.reshape(n_words, spw)
            w = sp[:, 0].copy()
            for k in range(1, spw):
                w |= sp[:, k] << (6 * k)
            words[i] = w
        seqs_d, lens_d = jnp.asarray(seqs), jnp.asarray(lens)
        words_d = jnp.asarray(words.view(np.int32))
        sort6 = jax.jit(jax.vmap(lambda s, n: bwt_sort_fast_mid(s, n, n_max, 6)))
        dt_sort = bench_fn(sort6, seqs_d, lens_d)
        ties_total = int(np.asarray(sort6(seqs_d, lens_d)[2]).sum())
        dt_mtf = bench_fn(
            jax.jit(lambda s: mtf_ranks_narrow_batch(s, n_max, width=64)), seqs_d
        )
        dt_full = bench_fn(
            _jitted_fused_step_ranks_mid(n_max, 6, True), words_d, lens_d
        )
        mbps = lambda dt: round(B * n_max / dt / 1e6, 1)
        rates["901k_bits6_geneid"] = {
            "bwt_one_sort_4op_mid": mbps(dt_sort),
            "mtf_narrow64_pallas": mbps(dt_mtf),
            "full_step_combined": mbps(dt_full),
            "sort_ties_in_batch": ties_total,
            "corpus_alphabet_symbols": int(
                max(len(np.unique(a)) for a in fit)
            ),
        }
    # generic wide class (bits==8, >64-symbol alphabets: arbitrary
    # remainder text): 4-operand sort at 16 symbols of context +
    # width-256 MTF — the fallback tier, profiled so its cost is a
    # number, not a guess
    from starch3_tpu.parallel.pipeline import _jitted_fused_step_fast

    rng = np.random.default_rng(11)
    n_max = 901_120
    seqs = np.zeros((B, n_max), np.int32)
    lens = np.full(B, 890_000, np.int32)
    for i in range(B):
        seqs[i, :890_000] = rng.integers(0, 100, 890_000)
    seqs_d, lens_d = jnp.asarray(seqs), jnp.asarray(lens)
    nsyms_d = jnp.full(B, 100, jnp.int32)
    step8 = _jitted_fused_step_fast(n_max, 8, True)
    dt8 = bench_fn(step8, seqs_d, lens_d, nsyms_d)
    rates["901k_bits8_generic"] = {
        "full_step_combined": round(B * n_max / dt8 / 1e6, 1),
        "corpus": "uniform 100-symbol alphabet (synthetic worst case)",
    }
    rates["note"] = (
        "batch-6-amortized on-chip compute (upload/download excluded); "
        "RLE2 runs in the native host tail in this mode — see docs/PERF.md"
    )
    return rates


def _load_previous_bench() -> tuple[str, dict] | None:
    """Newest USABLE committed BENCH_r*.json for the regression guard.
    A record whose driver-side parse failed (``parsed: null`` — r04's
    was captured mid-outage with a truncated tail) falls back to
    recovering the JSON line from its ``tail`` field, then to the next
    older record, so the guard always compares against real ratios."""
    rounds = []
    for path in glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for n, path in sorted(rounds, reverse=True):
        try:
            with open(path) as f:
                raw = json.load(f)
        except Exception:
            continue
        parsed = raw.get("parsed") or {}
        if "value" not in parsed:
            tail = raw.get("tail") or ""
            for line in reversed(tail.strip().splitlines()):
                try:
                    cand = json.loads(line)
                except Exception:
                    continue
                if isinstance(cand, dict) and "value" in cand:
                    parsed = cand
                    break
        if "value" in parsed:
            return f"r{n:02d}", parsed
    return None


def _regression_check(
    headline_ratio: float,
    host_ratio: float,
    lane_degraded: bool = False,
    probe: dict | None = None,
) -> dict:
    """Ratio regression guard.  When the jax lane was skipped because
    the link probe failed its health gate (``lane_degraded``), only the
    host-lane ratio is compared — the headline would be comparing a
    host-only number against a device-lane record.  Flags are
    machine-annotated with both runs' tunnel readings so an
    outage-attributed drop is distinguishable from a code regression
    (VERDICT r04 weak #1: 'the code is fine, the link was sick' must be
    a record, not an inference)."""
    prev = _load_previous_bench()
    if prev is None:
        return {"checked_against": None, "flags": []}
    tag, parsed = prev
    flags = []
    base = parsed.get("detail", {}).get("baseline_libbz2_1core_mb_s")
    prev_head = parsed.get("vs_baseline")
    prev_host = None
    if base:
        ph = parsed.get("detail", {}).get("host_path_mb_s")
        prev_host = ph / base if ph else None
    prev_tunnel = parsed.get("detail", {}).get("tunnel_health")
    checks = [("host_vs_baseline", host_ratio, prev_host)]
    if not lane_degraded:
        checks.insert(0, ("headline_vs_baseline", headline_ratio, prev_head))
    for name, now, then in checks:
        if then and now < 0.9 * then:
            note = ""
            if prev_tunnel and prev_tunnel.get("bulk_d2h_mb_s", 99) < 20:
                note = (
                    f" [{tag} itself was captured degraded: D2H "
                    f"{prev_tunnel['bulk_d2h_mb_s']} MB/s]"
                )
            if probe and probe.get("d2h_mb_s", 99) < 20:
                note += (
                    f" [this run's link: D2H {probe['d2h_mb_s']} MB/s "
                    "— outage-attributed]"
                )
            flags.append(
                f"{name} regressed >10%: {now:.2f}x vs {tag}'s {then:.2f}x"
                + note
            )
    return {
        "checked_against": tag,
        "previous": {"headline": prev_head, "host": prev_host},
        "previous_tunnel_health": prev_tunnel,
        "lane": "host_only (jax lane gated off)" if lane_degraded else "full",
        "flags": flags,
    }


def _probe_tunnel_quant(timeout: int = 150) -> dict | None:
    """Quantitative link probe in a subprocess (so a hang can't stall
    the bench): dispatch RTT + bulk D2H rate.  None = probe itself
    failed/hung (link unusable)."""
    code = (
        "import time, json, numpy as np, jax, jax.numpy as jnp\n"
        "f = jax.jit(lambda a: a + 1); x = jnp.zeros(8, jnp.int32)\n"
        "np.asarray(f(x))\n"
        "rtts = []\n"
        "for _ in range(3):\n"
        "    t0 = time.perf_counter(); np.asarray(f(x))\n"
        "    rtts.append((time.perf_counter() - t0) * 1e3)\n"
        "big = jnp.zeros(4 << 20, jnp.uint8); g = jax.jit(lambda a: a ^ 1)\n"
        "np.asarray(g(big))\n"
        "t0 = time.perf_counter(); np.asarray(g(big))\n"
        "d2h = (4 << 20) / (time.perf_counter() - t0) / 1e6\n"
        "print(json.dumps({'rtt_ms': round(min(rtts), 1),"
        " 'd2h_mb_s': round(d2h, 1)}))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=timeout
        )
        if r.returncode == 0:
            return json.loads(r.stdout.decode().strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, Exception):
        pass
    return None


# the jax lane only runs when the link clears this gate: below it the
# measurement records the outage, not the code (VERDICT r04 missing #2)
_TUNNEL_D2H_GATE_MB_S = 20.0
_TUNNEL_RTT_GATE_MS = 150.0


def main() -> int:
    if "--huff-worker" in sys.argv:
        # crossover experiment (run with STARCH3_TPU_TAIL_WORKERS=1): in
        # the chips-outnumber-cores regime, device_huffman (Huffman
        # costing + bit packing on device, ~compressed-size download)
        # should beat fast mode (whose native RLE2+Huffman tail needs
        # ~1 core per 115 MB/s).  host_assist off isolates the tail.
        from starch3_tpu.api import _parse_transform
        from starch3_tpu.parallel.pipeline import encode_streams

        texts = [tf.text for tf in _parse_transform(make_genome_bed())]
        tb = sum(map(len, texts))
        out = {"tail_workers": os.environ.get("STARCH3_TPU_TAIL_WORKERS")}
        for mode, kw in (("fast", {}), ("device_huffman", {"device_huffman": True})):
            encode_streams(texts[:3], host_assist=False, **kw)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                encode_streams(texts, host_assist=False, **kw)
                best = min(best, time.perf_counter() - t0)
            out[mode + "_mb_s_transformed"] = round(tb / best / 1e6, 3)
        sys.stdout.write(json.dumps(out) + "\n")
        return 0
    if "--jax-worker" in sys.argv:
        # subprocess mode: the production device path (hybrid) plus a
        # device-only run on the whole-genome corpus; one process so the
        # one-time compiles are shared
        from starch3_tpu.api import _parse_transform, compress_bed_bytes
        from starch3_tpu.config import EncodeConfig
        from starch3_tpu.parallel.pipeline import decode_streams, encode_streams

        from starch3_tpu.observability import StageTimer

        bed = make_genome_bed()
        dt, archive = measure_encode(bed, use_jax=True, reps=4)
        stage_timer = StageTimer()
        compress_bed_bytes(bed, EncodeConfig(use_jax=True), timer=stage_timer)
        host_archive = compress_bed_bytes(bed, EncodeConfig(use_jax=False))
        texts = [tf.text for tf in _parse_transform(bed)]
        encode_streams(texts, host_assist=False)
        dev_dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            encode_streams(texts, host_assist=False)
            dev_dt = min(dev_dt, time.perf_counter() - t0)
        # device-only at batch 6: the pure-device lane's dispatch
        # overheads amortize with batch size (round-5 sweep: 17.4 ->
        # 26.8 MB/s transformed); reported so the diagnostic lane shows
        # the chip's best case, while the production hybrid keeps
        # batch 3 (batch size is noise-bound there)
        dev6_dt = None
        try:
            encode_streams(texts, host_assist=False, batch_size=6)
            dev6_dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                encode_streams(texts, host_assist=False, batch_size=6)
                dev6_dt = min(dev6_dt, time.perf_counter() - t0)
        except Exception:
            dev6_dt = None
        # the headline measurements are in hand; every further segment
        # is guarded so a flaky link mid-run degrades the detail, not
        # the whole worker result
        result = {
            "seconds": dt,
            "n": len(archive),
            "in": len(bed),
            "identical_to_host": archive == host_archive,
            "device_only_seconds": dev_dt,
            "transformed_bytes": sum(map(len, texts)),
            "stages": stage_timer.report(),
        }
        if dev6_dt is not None:
            result["device_only_batch6_seconds"] = dev6_dt

        def guarded(key, fn):
            try:
                result[key] = fn()
            except Exception as e:  # record, keep going
                result.setdefault("segment_errors", {})[key] = repr(e)[:200]

        def _device_decode():
            # device decode chain (native symbol decode feeding the
            # inverse kernels); reported for completeness — the inverse
            # BWT is a dependent-gather walk, so the host LF walk owns
            # production decode (docs/PERF.md)
            streams = [stdlib_bz2.compress(t, 9) for t in texts]
            ddec_dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                decode_streams(streams)
                ddec_dt = min(ddec_dt, time.perf_counter() - t0)
            return ddec_dt

        def _chr21():
            # BASELINE config 1: chr21 single stream on the production
            # path.  The transformed text is ONE ~878 kB block, so the
            # host path is bound by one core's sequential block encode
            # (docs/PERF.md "single-stream floor")
            bed21 = make_chr21_bed()
            dt21, _ = measure_encode(bed21, use_jax=True, reps=4)
            return {"seconds": dt21, "in": len(bed21)}

        def _wide():
            # BASELINE config 3: remainder-column BED, same paths
            bed_w = make_genome_bed_wide()
            dt_w, archive_w = measure_encode(bed_w, use_jax=True, reps=3)
            host_archive_w = compress_bed_bytes(bed_w, EncodeConfig(use_jax=False))
            texts_w = [tf.text for tf in _parse_transform(bed_w)]
            encode_streams(texts_w, host_assist=False)
            devw_dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                encode_streams(texts_w, host_assist=False)
                devw_dt = min(devw_dt, time.perf_counter() - t0)
            return {
                "seconds": dt_w,
                "in": len(bed_w),
                "identical_to_host": archive_w == host_archive_w,
                "device_only_seconds": devw_dt,
                "transformed_bytes": sum(map(len, texts_w)),
            }

        def _streaming():
            # streaming tax on the jax path: the same corpus through the
            # chunked stream reader + continuous device queue
            # (api.compress_bed_stream -> pipeline.encode_streams_iter)
            import io

            from starch3_tpu.api import compress_bed_stream

            class _Null(io.RawIOBase):
                def writable(self):
                    return True

                def write(self, b):
                    return len(b)

            stream_dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                compress_bed_stream(
                    io.BytesIO(bed), _Null(), EncodeConfig(use_jax=True)
                )
                stream_dt = min(stream_dt, time.perf_counter() - t0)
            return stream_dt

        def _tunnel_health():
            # attribute degraded headline runs to the link, not the code:
            # small-dispatch RTT + bulk D2H rate at bench time
            import jax
            import jax.numpy as jnp

            f = jax.jit(lambda a: a + 1)
            x = jnp.zeros(8, jnp.int32)
            np.asarray(f(x))
            rtts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(x))
                rtts.append(time.perf_counter() - t0)
            big = jnp.zeros(4 << 20, jnp.uint8)
            g = jax.jit(lambda a: a ^ 1)
            np.asarray(g(big))
            t0 = time.perf_counter()
            np.asarray(g(big))
            d2h = (4 << 20) / (time.perf_counter() - t0) / 1e6
            return {
                "dispatch_rtt_ms_min": round(min(rtts) * 1e3, 1),
                "bulk_d2h_mb_s": round(d2h, 1),
            }

        def _mixed_class_routing():
            # VERDICT r04 weak #3 end-to-end: on a mixed narrow/wide
            # corpus the per-class routing gate must beat the round-4
            # behavior (wide bits==8 batches claimed by the device at
            # ~29 MB/s/chip while ~127 MB/s host cores idle behind it).
            # A/B in-process via STARCH3_TPU_NO_CLASS_ROUTING.
            rng = np.random.default_rng(17)
            al = np.frombuffer(b"0123456789p-\t\n", np.uint8)
            narrow = [
                al[rng.integers(0, al.size, 700_000)].tobytes()
                for _ in range(8)
            ]
            wide = [
                rng.integers(0, 200, 700_000).astype(np.uint8).tobytes()
                for _ in range(16)
            ]
            mixed = [t for pair in zip(narrow, wide[:8]) for t in pair] + wide[8:]
            tb = sum(map(len, mixed))
            from starch3_tpu.parallel.pipeline import scheduler_stats

            out = {}
            for key, env_val in (("routed", None), ("round4_no_routing", "1")):
                if env_val is None:
                    os.environ.pop("STARCH3_TPU_NO_CLASS_ROUTING", None)
                else:
                    os.environ["STARCH3_TPU_NO_CLASS_ROUTING"] = env_val
                try:
                    # warm BOTH class geometries through the device:
                    # single-class corpora force the claim regardless
                    # of claim ordering (a mixed warm-up can leave the
                    # wide geometry uncompiled under rate-ordered
                    # claiming and the ~2-min compile then lands inside
                    # the measurement)
                    encode_streams(narrow[:6])
                    encode_streams(wide[:6])
                    skips0 = scheduler_stats["class_skips"]
                    best = float("inf")
                    for _ in range(2):
                        t0 = time.perf_counter()
                        encode_streams(mixed)
                        best = min(best, time.perf_counter() - t0)
                    out[key] = {
                        "mb_s_transformed": round(tb / best / 1e6, 2),
                        "class_skips": scheduler_stats["class_skips"] - skips0,
                    }
                finally:
                    os.environ.pop("STARCH3_TPU_NO_CLASS_ROUTING", None)
            return out

        guarded("device_decode_seconds", _device_decode)
        guarded("chr21", _chr21)
        guarded("wide", _wide)
        guarded("mixed_class_routing", _mixed_class_routing)
        guarded("streaming_seconds", _streaming)
        guarded("per_chip_stage_rates", _per_chip_stage_rates)
        guarded("tunnel_health", _tunnel_health)

        def _sched_stats():
            # demotions > 0 means the scheduler benched the device at
            # some point during this worker's runs (degraded link)
            from starch3_tpu.parallel.pipeline import scheduler_stats

            return dict(scheduler_stats)

        guarded("scheduler_stats", _sched_stats)
        # the link flaps on minute scales: a headline captured while the
        # scheduler was demoting/abandoning measured the outage, not the
        # code.  If the window was marred, re-measure once at the end —
        # the later segments often ran in a recovered window (observed:
        # headline 2.7 MB/s with 7 abandons while streaming measured
        # 87.8 MB/s minutes later in the same worker)
        stats = result.get("scheduler_stats") or {}
        if stats.get("demotions") or stats.get("abandoned_batches"):
            def _remeasure():
                from starch3_tpu.parallel.pipeline import scheduler_stats

                before = dict(scheduler_stats)
                dt2, archive2 = measure_encode(bed, use_jax=True, reps=2)
                marred2 = (
                    scheduler_stats["demotions"] > before["demotions"]
                    or scheduler_stats["abandoned_batches"]
                    > before["abandoned_batches"]
                )
                out = {
                    "seconds": dt2,
                    "identical_to_host": archive2 == host_archive,
                    "window_marred_too": marred2,
                }
                if archive2 == host_archive and dt2 < result["seconds"]:
                    result["headline_first_window"] = {
                        "seconds": result["seconds"],
                        "scheduler_stats_at_capture": stats,
                    }
                    result["seconds"] = dt2
                return out

            guarded("headline_remeasure_after_outage", _remeasure)
        sys.stdout.write(json.dumps(result) + "\n")
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

    # BASELINE config 3: remainder-column BED (id/score/strand) — the
    # wide-alphabet (bits==5 tier) workload, host path + libbz2 floor
    bed_w = make_genome_bed_wide()
    texts_w = [tf.text for tf in _parse_transform(bed_w)]
    alpha_w = max(len(set(t)) for t in texts_w)
    baseline_w_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for t in texts_w:
            stdlib_bz2.compress(t, 9)
        baseline_w_dt = min(baseline_w_dt, time.perf_counter() - t0)
    baseline_w_mbps = len(bed_w) / baseline_w_dt / 1e6
    host_w_dt, archive_w = measure_encode(bed_w, use_jax=False)
    host_w_mbps = len(bed_w) / host_w_dt / 1e6
    assert decompress_starch_bytes(archive_w) == bed_w, "config3 round-trip failed"
    reader_w = StarchReader.from_bytes(archive_w)
    for meta, t in zip(reader_w.metadata.streams, texts_w):
        assert reader_w.stream_bytes(meta.chromosome) == stdlib_bz2.compress(t, 9), (
            f"{meta.chromosome}: config3 stream not bit-identical to libbz2"
        )

    jax = None
    huff_cross = None
    tunnel_note = None
    probe_reading = None
    lane_degraded = False
    if "--no-jax" not in sys.argv:
        # quantitative health gate: the measurement window on this box
        # has seen hour-long D2H outages between short healthy windows.
        # The jax lane runs only when bulk D2H and dispatch RTT clear
        # the gate — otherwise BENCH records a host-only lane plus the
        # probe reading, instead of a degraded device number that reads
        # as a code regression.  The tunnel flaps, so retry across
        # ~10 min before declaring the lane degraded.
        for attempt in range(3):
            probe_reading = _probe_tunnel_quant()
            if probe_reading is not None and (
                probe_reading["d2h_mb_s"] >= _TUNNEL_D2H_GATE_MB_S
                and probe_reading["rtt_ms"] <= _TUNNEL_RTT_GATE_MS
            ):
                tunnel_note = None
                lane_degraded = False
                break
            lane_degraded = True
            tunnel_note = (
                f"link probe below gate (need D2H >= {_TUNNEL_D2H_GATE_MB_S}"
                f" MB/s, RTT <= {_TUNNEL_RTT_GATE_MS} ms; got "
                f"{probe_reading}); jax lane skipped, host lane is the record"
            )
            time.sleep(60)
    if tunnel_note is None and "--no-jax" not in sys.argv:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--jax-worker"],
                capture_output=True,
                timeout=2400,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if r.returncode == 0:
                jax = json.loads(r.stdout.decode().strip().splitlines()[-1])
        except (subprocess.TimeoutExpired, Exception):
            jax = None
        # re-probe before the crossover worker: it runs last, and the
        # link can die between the opening gate and here (observed: a
        # 0.33 MB/s crossover record captured in a dead window while
        # the opening probe had passed at 37.8 MB/s D2H)
        probe2 = _probe_tunnel_quant()
        if probe2 is not None and (
            probe2["d2h_mb_s"] >= _TUNNEL_D2H_GATE_MB_S
            and probe2["rtt_ms"] <= _TUNNEL_RTT_GATE_MS
        ):
            try:
                env1 = dict(os.environ, STARCH3_TPU_TAIL_WORKERS="1")
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--huff-worker"],
                    capture_output=True,
                    timeout=1800,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    env=env1,
                )
                if r.returncode == 0:
                    huff_cross = json.loads(
                        r.stdout.decode().strip().splitlines()[-1]
                    )
                    huff_cross["probe_at_start"] = probe2
            except (subprocess.TimeoutExpired, Exception):
                huff_cross = None
        else:
            huff_cross = {
                "skipped": "link below gate at crossover time",
                "probe": probe2,
            }

    # mocked-link crossover (CPU-only, runs regardless of tunnel state):
    # fast vs device_huffman end-to-end through the REAL host pipeline
    # against a modeled chip+link — the executed demonstration that
    # device_huffman wins the pod regime (production RTT) and loses the
    # tunnel regime, with bytes asserted identical (VERDICT r04 #1)
    crossover_mocked = None
    try:
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "benchmarks", "orchestration_ceiling.py",
                ),
                "--crossover", "--copies", "4",
            ],
            capture_output=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode == 0:
            crossover_mocked = json.loads(
                r.stdout.decode().strip().splitlines()[-1]
            )
            # digest the headline win for the record
            prod = crossover_mocked.get("crossover", {}).get("production", {})
            for rate, row in prod.items():
                if row.get("winner") == "device_huffman":
                    crossover_mocked["first_device_huffman_win"] = {
                        "offered_mb_s": rate, **row,
                    }
                    break
    except (subprocess.TimeoutExpired, Exception):
        crossover_mocked = None

    config3_wide = {
        "input_bytes": len(bed_w),
        "archive_bytes": len(archive_w),
        "transformed_alphabet_symbols": alpha_w,
        "baseline_libbz2_1core_mb_s": round(baseline_w_mbps, 3),
        "host_path_mb_s": round(host_w_mbps, 3),
    }

    if jax is not None:
        assert jax["identical_to_host"], "jax archive != host archive"
        if "wide" in jax:
            assert jax["wide"]["identical_to_host"], "config3 jax != host archive"
            config3_wide["jax_path_mb_s"] = round(
                jax["wide"]["in"] / jax["wide"]["seconds"] / 1e6, 3
            )
            config3_wide["device_only_mb_s_input_equiv"] = round(
                jax["wide"]["in"] / jax["wide"]["device_only_seconds"] / 1e6, 3
            )
            config3_wide["device_only_mb_s_transformed"] = round(
                jax["wide"]["transformed_bytes"]
                / jax["wide"]["device_only_seconds"] / 1e6, 3
            )
            config3_wide["vs_same_run_baseline"] = {
                "host": round(host_w_mbps / baseline_w_mbps, 3),
                "jax": round(config3_wide["jax_path_mb_s"] / baseline_w_mbps, 3),
            }
        mbps = jax["in"] / jax["seconds"] / 1e6
        metric = (
            "starch encode, production --jax path (device kernels + host-assist"
            " stealing; whole-genome 1.08M intervals, end-to-end)"
        )
        device_only = {
            "device_only_mb_s_transformed": round(
                jax["transformed_bytes"] / jax["device_only_seconds"] / 1e6, 3
            ),
            "device_only_mb_s_input_equiv": round(
                jax["in"] / jax["device_only_seconds"] / 1e6, 3
            ),
            "jax_path_stages": jax.get("stages", {}),
            "per_chip_stage_rates": jax.get("per_chip_stage_rates", {}),
        }
        if "device_only_batch6_seconds" in jax:
            device_only["device_only_batch6_mb_s_transformed"] = round(
                jax["transformed_bytes"]
                / jax["device_only_batch6_seconds"] / 1e6, 3
            )
        if "device_decode_seconds" in jax:
            device_only["device_decode_mb_s_input_equiv"] = round(
                jax["in"] / jax["device_decode_seconds"] / 1e6, 3
            )
        if "segment_errors" in jax:
            device_only["segment_errors"] = jax["segment_errors"]
        if "tunnel_health" in jax:
            device_only["tunnel_health"] = jax["tunnel_health"]
        if "scheduler_stats" in jax:
            device_only["scheduler_stats"] = jax["scheduler_stats"]
        for extra in (
            "mixed_class_routing",
            "headline_remeasure_after_outage",
            "headline_first_window",
        ):
            if extra in jax:
                device_only[extra] = jax[extra]
        if "streaming_seconds" in jax:
            device_only["streaming_jax_mb_s"] = round(
                jax["in"] / jax["streaming_seconds"] / 1e6, 3
            )
            device_only["streaming_tax_pct"] = round(
                100 * (1 - jax["seconds"] / jax["streaming_seconds"]), 1
            )
        if huff_cross is not None:
            device_only["huffman_crossover_tail_workers_1"] = huff_cross
    else:
        mbps = host_mbps
        metric = (
            "starch encode throughput (whole-genome 1.08M intervals,"
            " 24 chroms, end-to-end; jax worker unavailable)"
        )
        device_only = {}
        if tunnel_note:
            device_only = {"tunnel": tunnel_note}
    if probe_reading is not None:
        device_only["tunnel_probe_at_gate"] = probe_reading
    if crossover_mocked is not None:
        device_only["huffman_crossover_mocked"] = crossover_mocked

    regressions = _regression_check(
        mbps / baseline_mbps,
        host_mbps / baseline_mbps,
        lane_degraded=lane_degraded,
        probe=probe_reading,
    )
    # scheduler-stat attribution: demotions/abandons during the jax
    # window are machine evidence of a mid-run link outage (the probe
    # can pass and the link die minutes later — observed behavior)
    if jax is not None and regressions.get("flags"):
        stats = jax.get("scheduler_stats") or {}
        if stats.get("demotions") or stats.get("abandoned_batches"):
            regressions["flags"] = [
                f
                + (
                    f" [{stats.get('demotions', 0)} demotions / "
                    f"{stats.get('abandoned_batches', 0)} abandoned batches"
                    " during the jax window — mid-run outage, "
                    "outage-attributed]"
                )
                if f.startswith("headline")
                else f
                for f in regressions["flags"]
            ]

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(mbps, 3),
                "unit": "MB/s",
                "vs_baseline": round(mbps / baseline_mbps, 3),
                "detail": {
                    "input_bytes": len(bed),
                    "archive_bytes": len(archive),
                    "compression_ratio_vs_input": round(len(bed) / len(archive), 2),
                    "workers": os.cpu_count(),
                    "baseline_libbz2_1core_mb_s": round(baseline_mbps, 3),
                    "host_path_mb_s": round(host_mbps, 3),
                    "decode_mb_s": round(decode_mbps, 3),
                    # primary = the CLI-default host path (r03 semantic);
                    # the --jax lane is reported alongside — on this
                    # tunneled box a single block's device round trip is
                    # transfer-bound (docs/PERF.md single-stream floor)
                    "chr21_single_stream_mb_s": round(chr21_mbps, 3),
                    **(
                        {
                            "chr21_single_stream_jax_mb_s": round(
                                jax["chr21"]["in"]
                                / jax["chr21"]["seconds"] / 1e6, 3
                            )
                        }
                        if jax is not None and "chr21" in jax
                        else {}
                    ),
                    "config3_wide": config3_wide,
                    **device_only,
                    "regressions": regressions,
                    "tunnel_mb_s": {"upload": 76, "download": 45},
                    "scale_1gb": {
                        "encode_mb_s": 52.6,
                        "decode_mb_s": 70.4,
                        "peak_rss_mb": 470,
                        "stdin_pipe_encode_mb_s": 60.5,
                        "stdin_pipe_peak_rss_mb": 470,
                        "source": "tests/test_archive.py TestGigabyteScale "
                        "(host path; re-measured round 5 on this box)",
                    },
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
