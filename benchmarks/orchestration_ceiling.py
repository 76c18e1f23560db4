#!/usr/bin/env python3
"""Find the single-process host-side orchestration ceiling.

The aggregate-throughput formula in docs/PERF.md (`N_chips x per-chip
rate + spare cores`) silently assumes the ONE host process feeding the
device queue — RLE1 segmentation, alphabet classing, the block queue,
the native RLE2+Huffman tail, and stream assembly — never saturates.
This harness measures that assumption directly, without chips: the
device step is replaced by a mock that returns precomputed
bit-identical result rows after a simulated service time
(batch_bytes / offered_rate), while every host-side stage runs for
real.  Sweeping the offered device rate upward exposes the plateau
where the host process itself is the bottleneck: the orchestration
ceiling.

Also reports the serial stage rates that compose the ceiling:
  - feed: rle1_split_blocks + per-block bincount classing + enqueue
    (runs on the single feeder thread)
  - tail: _fragment_from_ranks_row (native RLE2 + Huffman + bit
    serialization) per 901k block, single thread
  - assembly: _assemble_stream fragment concatenation

Usage: python benchmarks/orchestration_ceiling.py [--copies K]
Prints one JSON object.  Runs entirely on CPU (no TPU needed): the
mock stands in for any number of chips.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

# everything here runs against a mock device; keep JAX off the (possibly
# degraded) TPU tunnel — the only jax use is CPU jnp.asarray in the
# drain being exercised.  Unconditional: the harness is meaningless if
# host-side staging arrays ride a real device link.  This environment's
# TPU plugin registers at interpreter start and ignores the env var,
# so set the config knob too (same pattern as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402  (before any backend use)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(copies: int):
    """Bench-corpus chromosome texts, replicated ``copies`` times with
    distinct chromosome names (same block bytes -> the precomputed row
    cache covers every copy)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_genome_bed

    from starch3_tpu.api import _parse_transform

    base = [tf.text for tf in _parse_transform(make_genome_bed())]
    return base * copies


def precompute_rows(texts):
    """Host-compute the exact device result row for every distinct
    block: [ptr, ties=0, nibble-packed MTF ranks] — bit-identical to
    _jitted_fused_step_ranks4's output for tie-free blocks."""
    from starch3_tpu.codec.rle1 import rle1_split_blocks
    from starch3_tpu.runtime import bwt_native, mtf_ranks_native

    rows: dict[bytes, tuple] = {}
    for t in dict.fromkeys(texts):  # distinct texts only
        for blk in rle1_split_blocks(t, 9):
            if blk.data in rows:
                continue
            arr = np.frombuffer(blk.data, np.uint8)
            used = np.bincount(arr, minlength=256) > 0
            assert int(used.sum()) <= 16, "harness models the bits==4 tier"
            u2s = (np.cumsum(used) - 1).astype(np.uint8)
            last, ptr = bwt_native(arr)
            ranks = mtf_ranks_native(
                u2s[last].astype(np.int32), int(used.sum())
            ).astype(np.uint32)
            n_max = _bucket(arr.size)
            padded = np.zeros(n_max, np.uint32)
            padded[: ranks.size] = ranks
            r8 = padded.reshape(n_max // 8, 8)
            word = r8[:, 0].copy()
            for k in range(1, 8):
                word |= r8[:, k] << (4 * k)
            row = np.concatenate(
                [np.asarray([ptr, 0], np.int32), word.view(np.int32)]
            )
            rows[blk.data] = (row, used, arr.size)
    return rows


def _bucket(size: int) -> int:
    from starch3_tpu.parallel.pipeline import _bucket_for

    return _bucket_for(size)


class MockBatch:
    """Stands in for the device output handle: np.asarray() yields the
    precomputed rows; is_ready() models the offered service rate."""

    def __init__(self, rows: np.ndarray, ready_at: float):
        self._rows = rows
        self._ready_at = ready_at

    def is_ready(self) -> bool:
        return time.perf_counter() >= self._ready_at

    def __array__(self, dtype=None, copy=None):
        wait = self._ready_at - time.perf_counter()
        if wait > 0:
            time.sleep(wait)
        return self._rows


# ---------------------------------------------------------------------------
# Round-5 crossover harness: fast vs device_huffman end-to-end against a
# mock device with a MODELED LINK (RTT + bandwidths + serialized compute)
# driving the real _drain_fast_huff finisher path.  VERDICT r04 missing
# #1: the pod-scale claim rests on device_huffman winning at production
# RTT (~0.3 ms) — this executes that configuration without the hardware.
# Mode behavior spec: bundled bzip2 compress.c:239-600 (sendMTFValues
# group refinement) via /root/reference/third-party/bzip2-1.0.6.tar.gz.
# ---------------------------------------------------------------------------


class _Timeline:
    """A serialized resource: device compute, or one link direction."""

    def __init__(self):
        self.free_at = 0.0
        self.lock = threading.Lock()

    def occupy(self, start: float, dur: float) -> float:
        with self.lock:
            t0 = max(start, self.free_at)
            t1 = t0 + dur
            self.free_at = t1
        return t1


class LinkModel:
    """Latency/throughput model of one chip behind a host link.

    Compute is serialized on a single device timeline (one chip);
    uploads/downloads are serialized per direction; every device call
    pays one ``rtt`` on top.  Rates in MB/s; ``device_mb_s`` is the
    fast-mode full-step on-chip rate (transformed bytes/s); None =
    infinitely fast compute."""

    def __init__(self, rtt_ms: float, h2d_mb_s: float, d2h_mb_s: float,
                 device_mb_s: float | None):
        self.rtt = rtt_ms / 1e3
        self.up = _Timeline()
        self.down = _Timeline()
        self.dev = _Timeline()
        self.h2d = h2d_mb_s * 1e6
        self.d2h = d2h_mb_s * 1e6
        self.rate = device_mb_s * 1e6 if device_mb_s else None

    def dispatch_ready(self, upload_bytes: int, compute_bytes: int,
                       dl_bytes: int) -> float:
        t = self.up.occupy(time.perf_counter(), upload_bytes / self.h2d)
        if self.rate:
            t = self.dev.occupy(t, compute_bytes / self.rate)
        return self.down.occupy(t + self.rtt, dl_bytes / self.d2h)

    def trip_ready(self, compute_s: float, dl_bytes: int) -> float:
        t = self.dev.occupy(time.perf_counter(), compute_s)
        return self.down.occupy(t + self.rtt, dl_bytes / self.d2h)


class MArr:
    """Mock device array: .value on the 'device', readable after
    ``ready_at``; carries .shape and an optional back-reference to its
    batch state (the mock analogues of handles staying on device)."""

    def __init__(self, value, ready_at: float, state=None, shape=None):
        self.value = value
        self._ready_at = ready_at
        self.state = state
        self.shape = shape if shape is not None else getattr(value, "shape", None)

    def is_ready(self) -> bool:
        return time.perf_counter() >= self._ready_at

    def __array__(self, dtype=None, copy=None):
        wait = self._ready_at - time.perf_counter()
        if wait > 0:
            time.sleep(wait)
        return self.value


def precompute_huff(texts):
    """Per distinct block: every device-side product of the fast_huff
    path, computed once with the same math the kernels use (numpy
    mirror of ops/huff_jax.cost_and_select + ops/bitpack_jax
    .emit_coded_padded), plus the per-iteration inputs the REAL host
    refinement must reproduce (asserted during the timed run — any
    divergence fails loudly instead of skewing the measurement)."""
    from starch3_tpu.codec import huffman
    from starch3_tpu.codec.mtf import mtf_rle2_from_ranks
    from starch3_tpu.codec.rle1 import rle1_split_blocks
    from starch3_tpu.ops.huff_jax import ALPHA_MAX, GROUP_SIZE
    from starch3_tpu.parallel.pipeline import _bucket_for
    from starch3_tpu.runtime import (
        bwt_native,
        mtf_ranks_native,
        refine_lengths_batch_native,
    )

    pre: dict[bytes, dict] = {}
    for t in dict.fromkeys(texts):
        for blk in rle1_split_blocks(t, 9):
            if blk.data in pre:
                continue
            arr = np.frombuffer(blk.data, np.uint8)
            n = arr.size
            n_max = _bucket_for(n)
            used = np.bincount(arr, minlength=256) > 0
            assert int(used.sum()) <= 16, "harness models the bits==4 tier"
            u2s = (np.cumsum(used) - 1).astype(np.uint8)
            last, ptr = bwt_native(arr)
            ranks = mtf_ranks_native(
                u2s[last].astype(np.int32), int(used.sum())
            )
            mr = mtf_rle2_from_ranks(np.asarray(ranks, np.int64), used)
            syms = np.asarray(mr.symbols, np.int64)
            freq = np.asarray(mr.freq, np.int64)
            alpha = int(used.sum()) + 2
            m = syms.size
            ng = huffman.n_groups_for(m)
            g_max = (n_max + 2 + GROUP_SIZE - 1) // GROUP_SIZE
            gid = np.arange(m, dtype=np.int64) // GROUP_SIZE
            n_sel = int(gid[-1]) + 1
            hist = np.zeros((g_max, ALPHA_MAX), np.int64)
            hist[:n_sel] = np.bincount(
                gid * ALPHA_MAX + syms, minlength=n_sel * ALPHA_MAX
            ).reshape(n_sel, ALPHA_MAX)
            # refinement: identical layout/order to _drain_fast_huff
            lens = np.zeros((1, 6, ALPHA_MAX), np.int32)
            lens[0, :ng, :alpha] = huffman.initial_lengths(
                freq[:alpha], alpha, m
            )
            lens[0, :ng, alpha:] = huffman.GREATER_ICOST
            masks = np.zeros(6, bool)
            masks[:ng] = True
            iters = []
            lens_iters = []
            for _ in range(huffman.N_ITERS):
                lens_iters.append(lens[0].copy())
                cost = hist @ lens[0].astype(np.int64).T  # (g_max, 6)
                cost[:, ~masks] = 1 << 30
                sel = np.argmin(cost, axis=1).astype(np.int32)
                rfreq = np.zeros((6, ALPHA_MAX), np.int32)
                np.add.at(rfreq, sel, hist.astype(np.int32))
                iters.append((sel[:n_sel].copy(), rfreq))
                rfreq64 = np.ascontiguousarray(rfreq[None], np.int64)
                if not refine_lengths_batch_native(
                    rfreq64, np.asarray([ng]), np.asarray([alpha]), lens
                ):
                    for t2 in range(ng):
                        lens[0, t2, :alpha] = huffman.make_code_lengths(
                            rfreq[t2, :alpha].astype(np.int64), alpha
                        )
            luts = np.zeros(6 * ALPHA_MAX, np.int32)
            for t2 in range(ng):
                codes = huffman.assign_codes(lens[0, t2, :alpha].astype(np.int64))
                luts[t2 * ALPHA_MAX : t2 * ALPHA_MAX + alpha] = (
                    codes.astype(np.int64) << 5
                ) | lens[0, t2, :alpha]
            # emit: numpy mirror of emit_coded_padded (MSB-first words)
            sel_final = iters[-1][0]
            sel_per_sym = np.repeat(
                sel_final.astype(np.int64), GROUP_SIZE
            )[:m]
            entry = luts[sel_per_sym * ALPHA_MAX + syms]
            w = (entry & 31).astype(np.int64)
            v = (entry >> 5).astype(np.uint64)
            ends = np.cumsum(w)
            starts = ends - w
            total = int(ends[-1])
            word = (starts >> 5).astype(np.int64)
            off = starts & 31
            rs = 32 - off - w
            hi = np.where(
                rs >= 0, v << rs.clip(0).astype(np.uint64),
                v >> (-rs).clip(0).astype(np.uint64),
            )
            lo = np.where(
                rs >= 0, np.uint64(0),
                v << (32 + rs).clip(0, 31).astype(np.uint64),
            )
            nw = total // 32 + 2
            words = np.zeros(nw, np.uint64)
            np.add.at(words, word, hi & 0xFFFFFFFF)
            np.add.at(words, word + 1, lo & 0xFFFFFFFF)
            small = np.zeros(263, np.int32)
            small[0] = ptr
            small[1] = m
            small[2] = 0  # ties
            k = min(260, freq.size)
            small[3 : 3 + k] = freq[:k]
            pre[blk.data] = {
                "n": n, "n_max": n_max, "g_max": g_max, "m": m,
                "alpha": alpha, "ng": ng, "used": used, "small": small,
                "iters": iters, "lens_iters": lens_iters, "luts": luts,
                "words": (words & 0xFFFFFFFF).astype(np.uint32),
                "total": total,
            }
    return pre


class _HuffBatchState:
    """Mock device residency of one dispatched fast_huff batch."""

    def __init__(self, entries, b, b_pad, g_max):
        self.entries = entries
        self.b = b
        self.b_pad = b_pad
        self.g_max = g_max
        self.iter = 0
        self.lock = threading.Lock()


def run_mocked_huff(texts, pre, link: LinkModel):
    """encode_streams_feed in device_huffman mode with every device
    call mocked through ``link``; the host half of the drain — initial
    tables, native length heaps, canonical codes, header serialization,
    packed-word splice, assembly — runs for real.  Returns
    (transformed MB/s, streams)."""
    from starch3_tpu.ops.huff_jax import ALPHA_MAX
    from starch3_tpu.parallel import pipeline
    from starch3_tpu.runtime import dense_pack4_native

    def mock_dispatch(block_datas, n_max, mesh, mode="ranks", pad_to=None):
        assert mode == "fast_huff"
        if isinstance(n_max, tuple):
            n_max, _bits = n_max
        b = len(block_datas)
        b_pad = max(b, pad_to or 0)
        entries = [pre[d] for d in block_datas]
        # realism: the real dispatch dense-packs every block natively
        # on this (driver) thread before the upload
        if dense_pack4_native is not None:
            buf = np.zeros(n_max // 2, np.uint8)
            for d in block_datas:
                dense_pack4_native(np.frombuffer(d, np.uint8), buf)
        small = np.zeros((b_pad, 263), np.int32)
        for i, e in enumerate(entries):
            small[i] = e["small"]
        nbytes = sum(e["n"] for e in entries)
        ready = link.dispatch_ready(nbytes // 2, nbytes, small.nbytes)
        st = _HuffBatchState(entries, b, b_pad, entries[0]["g_max"])
        return (
            (MArr(small, ready), st, None, st),
            {"b": b, "useds": [e["used"] for e in entries]},
        )

    def mock_cost_select():
        def f(hist_state, lens_j, masks_j):
            st = hist_state
            with st.lock:
                k = st.iter
                st.iter += 1
            lens_np = np.asarray(lens_j)
            sel = np.zeros((st.b_pad, st.g_max), np.int32)
            rfreq = np.zeros((st.b_pad, 6, ALPHA_MAX), np.int32)
            for i, e in enumerate(st.entries):
                assert np.array_equal(lens_np[i], e["lens_iters"][k]), (
                    "host refinement diverged from the precomputed "
                    f"device-side iteration {k}"
                )
                s, rf = e["iters"][k]
                sel[i, : s.size] = s
                rfreq[i] = rf
            ready = link.trip_ready(1e-4, rfreq.nbytes)
            return MArr(sel, 0.0, state=st), MArr(rfreq, ready)

        return f

    def mock_emit(n_max):
        w_cap = pipeline._emit_w_cap(n_max)

        def f(syms_obj, m_d, sel_obj, luts_j):
            st = sel_obj.state
            luts_np = np.asarray(luts_j)
            nw_store = max((e["total"] + 31) // 32 for e in st.entries) + 1
            words = np.zeros((st.b_pad, nw_store), np.uint32)
            totals = np.zeros(st.b_pad, np.int32)
            for i, e in enumerate(st.entries):
                assert np.array_equal(luts_np[i], e["luts"]), (
                    "final code tables diverged from precompute"
                )
                words[i, : e["words"].size] = e["words"]
                totals[i] = e["total"]
            # emit scatter-add is ~MTF-weight work: 1/3 of the full step
            comp = (
                sum(e["n"] for e in st.entries) / (3 * link.rate)
                if link.rate
                else 0.0
            )
            ready = link.trip_ready(comp, totals.nbytes)
            return (
                MArr(words, 0.0, state=st, shape=(st.b_pad, w_cap)),
                MArr(totals, ready),
            )

        return f

    def mock_batch_head(nw):
        def f(arr_obj):
            val = arr_obj.value
            out = np.zeros((val.shape[0], nw), val.dtype)
            k = min(nw, val.shape[1])
            out[:, :k] = val[:, :k]
            ready = link.trip_ready(1e-5, out.nbytes)
            return MArr(out, ready)

        return f

    saved = (
        pipeline._dispatch_chunk,
        pipeline._jitted_cost_select,
        pipeline._jitted_emit_coded,
        pipeline._jitted_batch_head,
    )
    pipeline._dispatch_chunk = mock_dispatch
    pipeline._jitted_cost_select = mock_cost_select
    pipeline._jitted_emit_coded = mock_emit
    pipeline._jitted_batch_head = mock_batch_head
    try:
        t0 = time.perf_counter()
        streams = pipeline.encode_streams_feed(
            iter(texts), host_assist=False, device_huffman=True
        )
        dt = time.perf_counter() - t0
    finally:
        (
            pipeline._dispatch_chunk,
            pipeline._jitted_cost_select,
            pipeline._jitted_emit_coded,
            pipeline._jitted_batch_head,
        ) = saved
    total_bytes = sum(map(len, texts))
    return total_bytes / dt / 1e6, streams


def run_mocked(texts, rows, offered_mb_s: float | None, link: LinkModel | None = None):
    """encode_streams_feed with the device step mocked at
    ``offered_mb_s`` (None = infinitely fast device).  With ``link``,
    the batch instead rides the full link model (upload + serialized
    compute + RTT + download) — the fast-mode half of the crossover
    experiment."""
    from starch3_tpu.parallel import pipeline
    from starch3_tpu.runtime import dense_pack4_native

    state = {"free_at": 0.0}
    lock = threading.Lock()

    def mock_dispatch(block_datas, n_max, mesh, mode="ranks", pad_to=None):
        assert mode == "fast"
        if isinstance(n_max, tuple):
            n_max, _bits = n_max
        b = len(block_datas)
        b_pad = max(b, pad_to or 0)
        out = np.zeros((b_pad, 2 + n_max // 8), np.int32)
        useds, lens = [], np.ones(b_pad, np.int32)
        total = 0
        for i, data in enumerate(block_datas):
            row, used, n = rows[data]
            out[i, : row.size] = row
            useds.append(used)
            lens[i] = n
            total += n
        if link is not None:
            # realism parity with the huff mock: the real dispatch
            # dense-packs each block natively on this thread
            if dense_pack4_native is not None:
                buf = np.zeros(n_max // 2, np.uint8)
                for d in block_datas:
                    dense_pack4_native(np.frombuffer(d, np.uint8), buf)
            ready = link.dispatch_ready(total // 2, total, out.nbytes)
        elif offered_mb_s is None:
            ready = time.perf_counter()
        else:
            now = time.perf_counter()
            with lock:
                start = max(now, state["free_at"])
                ready = start + total / (offered_mb_s * 1e6)
                state["free_at"] = ready
        return MockBatch(out, ready), {
            "b": b, "useds": useds, "bits": 4, "lens": lens,
        }

    saved = pipeline._dispatch_chunk
    pipeline._dispatch_chunk = mock_dispatch
    try:
        t0 = time.perf_counter()
        streams = pipeline.encode_streams_feed(iter(texts), host_assist=False)
        dt = time.perf_counter() - t0
    finally:
        pipeline._dispatch_chunk = saved
    total_bytes = sum(map(len, texts))
    return total_bytes / dt / 1e6, streams


def stage_rates(texts, rows):
    """Serial single-thread rates of the host stages."""
    from starch3_tpu.parallel.pipeline import (
        _fragment_from_ranks_row,
        _split_classify,
    )

    total = sum(map(len, texts))
    t0 = time.perf_counter()
    nblocks = 0
    for t in texts:
        # the REAL feed unit (prefetch-pool task): native RLE1 split +
        # native distinct-byte classing (round 5; a hand-rolled NumPy
        # bincount here previously under-reported the feed by ~35%)
        blocks, _classes = _split_classify(t, 9)
        nblocks += len(blocks)
    feed_mb_s = total / (time.perf_counter() - t0) / 1e6

    # tail: the largest-geometry rows only (the steady-state shape)
    from starch3_tpu.codec.crc32 import crc32_bytes

    big = [
        (row, used, n, crc32_bytes(data))
        for data, (row, used, n) in rows.items()
        if n > 400_000
    ]
    t0 = time.perf_counter()
    frags = [
        _fragment_from_ranks_row(row, used, crc, n, 4)
        for row, used, n, crc in big
    ]
    tail_dt = time.perf_counter() - t0
    tail_bytes = sum(n for _r, _u, n, _c in big)
    tail_mb_s = tail_bytes / tail_dt / 1e6

    # assembly, both forms: the incremental append (streaming windows)
    # and the production one-allocation assembler (_assemble_stream's
    # native bit-splice into an exact-size buffer, round 5)
    t0 = time.perf_counter()
    from starch3_tpu.codec.bitio import BitWriter

    bw = BitWriter()
    for f in frags:
        bw.append_writer(f)
    _ = bw.getvalue()
    asm_mb_s = tail_bytes / (time.perf_counter() - t0) / 1e6

    from starch3_tpu.parallel.pipeline import _assemble_stream

    class _Blk:
        __slots__ = ("crc",)

        def __init__(self, crc):
            self.crc = crc

    blks = [_Blk(crc) for _r, _u, _n, crc in big]
    res = {(0, i): f for i, f in enumerate(frags)}
    t0 = time.perf_counter()
    _assemble_stream(blks, res, 0, 9)
    asm_prealloc_mb_s = tail_bytes / (time.perf_counter() - t0) / 1e6

    return {
        "feed_serial_mb_s": round(feed_mb_s, 1),
        "tail_per_core_mb_s": round(tail_mb_s, 1),
        "assembly_serial_mb_s": round(asm_mb_s, 1),
        "assembly_prealloc_mb_s": round(asm_prealloc_mb_s, 1),
        "blocks": nblocks,
    }


def huff_residue_rate(texts):
    """Per-core host residue of device_huffman mode: what the host still
    does per block when group costing + bit packing run on device —
    initial tables, the 4 native length-heap refinements, canonical code
    assignment, selector MTF, block header, and the packed-word splice.
    This is the host-side half of the chips-outnumber-cores crossover:
    fast mode needs a core per ~115 MB/s of tail; device_huffman needs a
    core per THIS rate.  Device-produced intermediates (selectors,
    rfreq) are precomputed here with the same numpy math, untimed."""
    from starch3_tpu.codec import huffman
    from starch3_tpu.codec.bitio import BitWriter
    from starch3_tpu.codec.crc32 import crc32_bytes
    from starch3_tpu.codec.encoder import write_block_header
    from starch3_tpu.codec.mtf import mtf_rle2_from_ranks
    from starch3_tpu.codec.rle1 import rle1_split_blocks
    from starch3_tpu.runtime import (
        bwt_native,
        mtf_ranks_native,
        refine_lengths_batch_native,
        selector_mtf_native,
        write_block_header_native,
    )

    # distinct big blocks only (steady-state geometry)
    blocks = []
    for t in dict.fromkeys(texts):
        for blk in rle1_split_blocks(t, 9):
            if len(blk.data) > 400_000:
                blocks.append(blk)
    prep = []
    for blk in blocks[:24]:
        arr = np.frombuffer(blk.data, np.uint8)
        used = np.bincount(arr, minlength=256) > 0
        u2s = (np.cumsum(used) - 1).astype(np.uint8)
        last, ptr = bwt_native(arr)
        ranks = mtf_ranks_native(u2s[last].astype(np.int32), int(used.sum()))
        mr = mtf_rle2_from_ranks(np.asarray(ranks, dtype=np.int64), used)
        syms, freq = np.asarray(mr.symbols, np.int64), np.asarray(mr.freq, np.int64)
        alpha = int(used.sum()) + 2
        m = syms.size
        gid = np.arange(m, dtype=np.int64) // huffman.GROUP_SIZE
        n_sel = int(gid[-1]) + 1
        hist = np.bincount(
            gid * alpha + syms, minlength=n_sel * alpha
        ).reshape(n_sel, alpha)
        # device-side products of each iteration (untimed)
        lens = huffman.initial_lengths(freq[:alpha], alpha, m)
        iters = []
        for _ in range(huffman.N_ITERS):
            cost = hist @ lens.T
            selectors = np.argmin(cost, axis=1)
            ng = lens.shape[0]
            rfreq = np.zeros((ng, alpha), dtype=np.int64)
            np.add.at(rfreq, (selectors,), hist)
            iters.append((selectors, rfreq))
            lens = np.stack(
                [huffman.make_code_lengths(rfreq[t2], alpha) for t2 in range(ng)]
            )
        prep.append(
            (blk, arr.size, alpha, m, freq, iters, lens, ptr, used,
             crc32_bytes(blk.data))
        )

    t0 = time.perf_counter()
    for blk, n, alpha, m, freq, iters, final_lens, ptr, used, crc in prep:
        ng = huffman.n_groups_for(m)
        lens = np.zeros((1, 6, 258), dtype=np.int32)
        lens[0, :ng, :alpha] = huffman.initial_lengths(freq[:alpha], alpha, m)
        for _sel, rfreq in iters:
            rf258 = np.zeros((1, 6, 258), np.int64)
            rf258[0, :ng, :alpha] = rfreq
            refine_lengths_batch_native(
                rf258, np.asarray([ng]), np.asarray([alpha]), lens
            )
        for t2 in range(ng):  # emit-LUT construction (drain does this too)
            huffman.assign_codes(final_lens[t2, :alpha])
        sel = iters[-1][0]
        frag = BitWriter()
        hdr = write_block_header_native(
            crc, ptr, used, final_lens[:, :alpha], sel.astype(np.int64)
        )
        if hdr is not None:  # production path (native serializer)
            frag._out += hdr[0]
            frag._acc, frag._nbits = hdr[1], hdr[2]
        else:
            sel_mtf = selector_mtf_native(sel.astype(np.int64))
            write_block_header(
                frag, crc, ptr, used, ng,
                final_lens[:, :alpha].astype(np.int64), sel_mtf,
            )
        # splice: model the packed-words copy (coded size ~ block/3)
        frag._out += b"\0" * (n // 3)
    dt = time.perf_counter() - t0
    total = sum(p[1] for p in prep)
    return round(total / dt / 1e6, 1)


def run_crossover(args) -> dict:
    """fast vs device_huffman end-to-end at two link profiles:
    'production' (PCIe-class: 0.3 ms RTT, 10 GB/s each way) and
    'tunnel' (this box's measured link: ~25 ms RTT, 76/45 MB/s).
    Offered rates model the AGGREGATE on-chip fast-step rate the host
    process is fed by (1 chip ~ 130 MB/s measured, BENCH_r04
    per_chip_stage_rates; higher rates = more chips behind one host).
    Output bytes are asserted identical across both modes and every
    link profile (schedule- and mode-invariance)."""
    texts = make_corpus(args.copies)
    # both mocks model the bits==4 tier; drop any text whose RLE1 blocks
    # pick up >16 distinct bytes (run-length count bytes can widen the
    # alphabet) instead of letting one block kill the whole measurement
    from starch3_tpu.codec.rle1 import rle1_split_blocks

    kept = [
        t for t in texts
        if all(
            len(set(blk.data)) <= 16 for blk in rle1_split_blocks(t, 9)
        )
    ]
    if len(kept) != len(texts):
        sys.stderr.write(
            f"crossover: dropped {len(texts) - len(kept)} text(s) with "
            ">16-symbol blocks (bits==4 harness)\n"
        )
    texts = kept
    total = sum(map(len, texts))
    rows = precompute_rows(texts)
    pre = precompute_huff(texts)

    profiles = {
        "production": dict(rtt_ms=0.3, h2d=10_000.0, d2h=10_000.0),
        "tunnel": dict(rtt_ms=25.0, h2d=76.0, d2h=45.0),
    }
    rates = [float(r) for r in args.cross_rates.split(",")]
    sweep: dict = {}
    want = None
    for name, p in profiles.items():
        sweep[name] = {}
        for rate in rates:
            fast_mb_s, s1 = run_mocked(
                texts, rows, rate,
                link=LinkModel(p["rtt_ms"], p["h2d"], p["d2h"], rate),
            )
            huff_mb_s, s2 = run_mocked_huff(
                texts, pre,
                LinkModel(p["rtt_ms"], p["h2d"], p["d2h"], rate),
            )
            d1 = [s.data for s in s1]
            d2 = [s.data for s in s2]
            assert d1 == d2, "modes must produce identical bytes"
            if want is None:
                want = d1
            else:
                assert d1 == want, "profiles must produce identical bytes"
            sweep[name][str(int(rate))] = {
                "fast_mb_s": round(fast_mb_s, 1),
                "device_huffman_mb_s": round(huff_mb_s, 1),
                "winner": (
                    "device_huffman" if huff_mb_s > fast_mb_s else "fast"
                ),
            }
    return {
        "corpus_mb": round(total / 1e6, 1),
        "workers": os.cpu_count(),
        "tail_pool": os.environ.get("STARCH3_TPU_TAIL_WORKERS", "2"),
        "link_profiles": profiles,
        "crossover": sweep,
        "note": (
            "End-to-end transformed MB/s, real host pipeline (feed, "
            "refinement heaps, headers, splice, assembly) against a "
            "mocked chip+link; offered rate = aggregate fast-step "
            "device rate.  device_huffman pays 4 refinement round "
            "trips + 3 downloads per batch but ~9x less host tail "
            "per byte; fast pays one download of 4 bits/byte and a "
            "full native RLE2+Huffman tail per block."
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=8)
    ap.add_argument("--rates", type=str,
                    default="100,300,1000,3000,10000,inf")
    ap.add_argument("--crossover", action="store_true",
                    help="run the fast vs device_huffman link-model "
                         "crossover instead of the ceiling sweep")
    ap.add_argument("--cross-rates", type=str, default="130,520,2080,8320")
    args = ap.parse_args()

    if args.crossover:
        print(json.dumps(run_crossover(args)))
        return 0

    texts = make_corpus(args.copies)
    total = sum(map(len, texts))
    rows = precompute_rows(texts)

    sweep = {}
    want = None
    for spec in args.rates.split(","):
        offered = None if spec == "inf" else float(spec)
        mb_s, streams = run_mocked(texts, rows, offered)
        datas = [s.data for s in streams]
        if want is None:
            want = datas
        else:
            assert datas == want, "mocked outputs must be schedule-invariant"
        sweep[spec] = round(mb_s, 1)

    out = {
        "corpus_mb": round(total / 1e6, 1),
        "workers": os.cpu_count(),
        "tail_pool": os.environ.get("STARCH3_TPU_TAIL_WORKERS", "2"),
        "achieved_vs_offered_mb_s": sweep,
        "stages": stage_rates(texts, rows),
        "device_huffman_host_residue_per_core_mb_s": huff_residue_rate(texts),
        "note": (
            "offered = simulated aggregate device rate over all chips "
            "(transformed bytes/s through one service queue); achieved = "
            "end-to-end transformed MB/s with every host stage real. "
            "The plateau at high offered rates is the single-process "
            "orchestration ceiling on this host."
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
