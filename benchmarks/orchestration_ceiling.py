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


def run_mocked(texts, rows, offered_mb_s: float | None):
    """encode_streams_feed with the device step mocked at
    ``offered_mb_s`` (None = infinitely fast device)."""
    from starch3_tpu.parallel import pipeline

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
        now = time.perf_counter()
        if offered_mb_s is None:
            ready = now
        else:
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
    from starch3_tpu.codec.rle1 import rle1_split_blocks
    from starch3_tpu.parallel.pipeline import (
        _bits_class,
        _fragment_from_ranks_row,
    )

    total = sum(map(len, texts))
    t0 = time.perf_counter()
    nblocks = 0
    for t in texts:
        for blk in rle1_split_blocks(t, 9):
            _bits_class(
                int((np.bincount(
                    np.frombuffer(blk.data, np.uint8), minlength=256
                ) > 0).sum())
            )
            nblocks += 1
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

    # assembly: concatenating finished fragments into streams
    t0 = time.perf_counter()
    from starch3_tpu.codec.bitio import BitWriter

    bw = BitWriter()
    for f in frags:
        bw.append_writer(f)
    _ = bw.getvalue()
    asm_mb_s = tail_bytes / (time.perf_counter() - t0) / 1e6

    return {
        "feed_serial_mb_s": round(feed_mb_s, 1),
        "tail_per_core_mb_s": round(tail_mb_s, 1),
        "assembly_serial_mb_s": round(asm_mb_s, 1),
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=8)
    ap.add_argument("--rates", type=str,
                    default="100,300,1000,3000,10000,inf")
    args = ap.parse_args()

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
