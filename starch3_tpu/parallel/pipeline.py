"""Sharded block-encode pipeline: host segmentation -> device kernels ->
host bit assembly.

Per-stream flow (the TPU rebuild of the reference's 4-thread pipeline,
SURVEY.md §2 parallelism table):

  host:    RLE1 segmentation into <= 900 kB blocks (sequential by nature,
           codec/rle1.py) + per-block dense symbol remap
  device:  batched BWT rotation sort + MTF ranks (ops/bwt_jax.py,
           ops/mtf_jax.py), batch axis sharded over the chip mesh
  host:    RLE2 + Huffman planning + bit packing (codec/*) and stream
           concatenation in block order (deterministic: partitioning is
           input-derived, never topology-derived)

The device step is compiled once per (n_max, batch) geometry; blocks are
padded to fixed shapes, lengths travel as scalars.
"""

from __future__ import annotations

import functools

import numpy as np

from starch3_tpu.codec.bitio import BitWriter
from starch3_tpu.codec.crc32 import combine_block_crc
from starch3_tpu.codec.encoder import (
    STREAM_END_MAGIC,
    write_block_from_device_syms,
    write_block_from_ranks,
)
from starch3_tpu.codec.rle1 import rle1_split_blocks

# padded device block size: fits any level-9 block (nblockMAX 899_981 + 4
# overshoot), multiple of the MTF tile (512)
N_MAX_BLOCK = 901_120


@functools.lru_cache(maxsize=8)
def _jitted_device_step(n_max: int):
    """Batched (vmapped) BWT-sort step, jitted once per geometry."""
    import jax

    from starch3_tpu.ops.bwt_jax import bwt_encode_padded

    def step(blocks, lens):
        return jax.vmap(lambda b, n: bwt_encode_padded(b, n, n_max))(blocks, lens)

    return jax.jit(step)


@functools.lru_cache(maxsize=8)
def _jitted_mtf_step(n_max: int):
    import jax

    from starch3_tpu.ops.mtf_jax import mtf_ranks_padded

    def step(seqs, lens):
        return jax.vmap(lambda s, n: mtf_ranks_padded(s, n, n_max))(seqs, lens)

    return jax.jit(step)


def _block_to_ranks(block, n, n_max):
    """Shared device prologue: BWT -> used-byte map -> dense remap -> MTF
    ranks (both fused steps call this)."""
    import jax.numpy as jnp

    from starch3_tpu.ops.bwt_jax import bwt_encode_padded
    from starch3_tpu.ops.mtf_jax import mtf_ranks_padded

    last, ptr = bwt_encode_padded(block, n, n_max)
    idx = jnp.arange(n_max, dtype=jnp.int32)
    valid = idx < n
    used = jnp.zeros(256, jnp.int32).at[jnp.where(valid, last, 0)].max(
        valid.astype(jnp.int32)
    )
    u2s = jnp.cumsum(used) - 1  # dense remap (codec/mtf.py symbol_map)
    seq = jnp.where(valid, u2s[last], 0).astype(jnp.int32)
    ranks = mtf_ranks_padded(seq, n, n_max)
    return ptr, used, ranks


@functools.lru_cache(maxsize=8)
def _jitted_fused_step(n_max: int):
    """BWT -> on-device dense symbol remap -> MTF, one dispatch per batch.

    Fusing keeps the 900 kB intermediate (BWT last column) in HBM instead
    of round-tripping it to the host between stages — on a tunneled
    single chip that halves wall time; on a pod it halves PCIe traffic.
    """
    import jax
    import jax.numpy as jnp

    def one(block, n):
        ptr, used, ranks = _block_to_ranks(block, n, n_max)
        # MTF ranks are < 256: pack 4 per int32 so the host download is
        # 1 byte/rank (sub-int32 dtypes fetch pathologically slowly over
        # remote tunnels, and the BWT column itself never leaves HBM)
        r4 = ranks.reshape(n_max // 4, 4).astype(jnp.uint32)
        packed = jax.lax.bitcast_convert_type(
            r4[:, 0] | (r4[:, 1] << 8) | (r4[:, 2] << 16) | (r4[:, 3] << 24),
            jnp.int32,
        )
        # single output array per block -> single host transfer per batch:
        # [orig_ptr, in_use[256], packed_ranks[n_max//4]]
        return jnp.concatenate([ptr[None], used, packed])

    def step(blocks, lens):
        return jax.vmap(one)(blocks, lens)

    return jax.jit(step)


@functools.lru_cache(maxsize=8)
def _jitted_fused_step_rle2(n_max: int):
    """BWT -> remap -> MTF -> RLE2, one dispatch per batch: the download
    is the coded symbol stream + frequencies (ops/rle2_jax.py), leaving
    only Huffman planning and bit emission on the host."""
    import jax
    import jax.numpy as jnp

    from starch3_tpu.ops.rle2_jax import rle2_from_ranks_padded

    n_pairs = (n_max + 2 + 1) // 2

    def one(block, n):
        ptr, used, ranks = _block_to_ranks(block, n, n_max)
        n_in_use = used.sum()
        syms, m, freq = rle2_from_ranks_padded(ranks, n, n_in_use, n_max)
        # symbols < 2^16: pack 2 per int32 word for the download
        sp = jnp.concatenate([syms, jnp.zeros(n_pairs * 2 - syms.size, jnp.int32)])
        sp = sp.reshape(n_pairs, 2)
        packed = sp[:, 0] | (sp[:, 1] << 16)
        return jnp.concatenate([ptr[None], m[None], used, freq, packed])

    def step(blocks, lens):
        return jax.vmap(one)(blocks, lens)

    return jax.jit(step)


def _unpack_results_rle2(out_d, b):
    out = np.asarray(out_d)  # one transfer for the whole batch
    res = []
    for i in range(b):
        row = out[i]
        ptr = int(row[0])
        m = int(row[1])
        used = row[2:258].astype(bool)
        freq = row[258:518]
        packed = row[518:]
        syms = np.empty(packed.size * 2, dtype=np.int32)
        syms[0::2] = packed & 0xFFFF
        syms[1::2] = (packed >> 16) & 0xFFFF
        res.append((used, ptr, syms[:m], freq))
    return res


def device_encode_blocks(
    block_datas: list[bytes], n_max: int = N_MAX_BLOCK, mesh=None
) -> list[tuple[np.ndarray, int, np.ndarray]]:
    """Run the device stages for a batch of post-RLE1 blocks.

    Returns per block: (in_use bool[256], orig_ptr, mtf ranks uint8).
    When ``mesh`` is given, the batch axis is sharded across its devices.
    """
    import jax
    import jax.numpy as jnp

    from starch3_tpu.parallel.mesh import block_sharding, pad_batch

    b = len(block_datas)
    if b == 0:
        return []
    n_dev = 1
    if mesh is not None:
        n_dev = mesh.devices.size
    b_pad = pad_batch(b, n_dev)
    lens = np.ones(b_pad, dtype=np.int32)
    batch = np.zeros((b_pad, n_max), dtype=np.uint8)
    for i, data in enumerate(block_datas):
        arr = np.frombuffer(data, dtype=np.uint8)
        if arr.size > n_max:
            raise ValueError(f"block {i} exceeds n_max ({arr.size} > {n_max})")
        batch[i, : arr.size] = arr
        lens[i] = arr.size

    if mesh is not None:
        sharding = block_sharding(mesh)
        batch_d = jax.device_put(jnp.asarray(batch), sharding)
        lens_d = jax.device_put(jnp.asarray(lens), sharding)
    else:
        batch_d = jnp.asarray(batch)
        lens_d = jnp.asarray(lens)

    out_d = _jitted_fused_step(n_max)(batch_d, lens_d)
    return _unpack_results(out_d, lens, b, n_max)


def _unpack_results(out_d, lens, b, n_max):
    out = np.asarray(out_d)  # one transfer for the whole batch
    ptrs = out[:, 0]
    used = out[:, 1:257].astype(bool)
    ranks = out[:, 257:].view(np.uint8).reshape(out.shape[0], n_max)
    return [
        (used[i], int(ptrs[i]), ranks[i, : lens[i]]) for i in range(b)
    ]


# geometry buckets: one compiled program per bucket, shared by every
# stream/chromosome (a per-input n_max would recompile per geometry)
_N_MAX_BUCKETS = (16_384, 131_072, N_MAX_BLOCK)


def _bucket_for(size: int) -> int:
    for b in _N_MAX_BUCKETS:
        if size <= b:
            return b
    raise ValueError(f"block size {size} exceeds {N_MAX_BLOCK}")


def encode_streams(
    texts: list[bytes],
    level: int = 9,
    mesh=None,
    batch_size: int = 8,
    device_rle2: bool = False,
) -> list:  # list[codec.encoder.EncodedStream]
    """Compress many independent streams with one global device queue.

    All streams' blocks are flattened into shared batches (one geometry
    bucket per batch), dispatched software-pipelined, and reassembled per
    stream in order — so 24 chromosomes with one block each cost ~3
    device dispatches, not 24 (the cross-stream analogue of the
    reference's single-stream sequential loop).
    """
    per_stream_blocks = [rle1_split_blocks(t, level) for t in texts]
    flat: list[tuple[int, int]] = []  # (stream_idx, block_idx)
    for si, blocks in enumerate(per_stream_blocks):
        for bi in range(len(blocks)):
            flat.append((si, bi))
    # group by geometry bucket, preserving order within each bucket
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for si, bi in flat:
        nb = _bucket_for(len(per_stream_blocks[si][bi].data))
        by_bucket.setdefault(nb, []).append((si, bi))

    results: dict[tuple[int, int], tuple] = {}
    for n_max, items in by_bucket.items():
        pending = []
        for lo in range(0, len(items), batch_size):
            chunk = items[lo : lo + batch_size]
            datas = [per_stream_blocks[si][bi].data for si, bi in chunk]
            pending.append(
                (chunk, *_dispatch_chunk(datas, n_max, mesh, device_rle2))
            )
            if len(pending) > 1:
                _drain_into(
                    results, per_stream_blocks, pending.pop(0), n_max, device_rle2
                )
        while pending:
            _drain_into(
                results, per_stream_blocks, pending.pop(0), n_max, device_rle2
            )

    streams = []
    for si, blocks in enumerate(per_stream_blocks):
        bw = BitWriter()
        bw.write_bytes_msb(b"BZh")
        bw.write(0x30 + level, 8)
        combined = 0
        offsets = []
        crcs = []
        for bi, blk in enumerate(blocks):
            res = results[(si, bi)]
            offsets.append(bw.bit_length)
            crcs.append(blk.crc)
            combined = combine_block_crc(combined, blk.crc)
            if len(res) == 4:  # device-RLE2: (used, ptr, symbols, freq)
                in_use, ptr, syms, freq = res
                write_block_from_device_syms(bw, blk.crc, ptr, syms, freq, in_use)
            else:
                in_use, ptr, ranks = res
                write_block_from_ranks(bw, blk.crc, ptr, ranks, in_use)
        bw.write(STREAM_END_MAGIC, 48)
        bw.write(combined, 32)
        from starch3_tpu.codec.encoder import EncodedStream

        streams.append(
            EncodedStream(
                data=bw.getvalue(),
                block_bit_offsets=tuple(offsets),
                block_crcs=tuple(crcs),
                combined_crc=combined,
            )
        )
    return streams


def _drain_into(results, per_stream_blocks, item, n_max, device_rle2=False):
    chunk, out_d, lens, b = item
    unpacked = (
        _unpack_results_rle2(out_d, b)
        if device_rle2
        else _unpack_results(out_d, lens, b, n_max)
    )
    for (si, bi), res in zip(chunk, unpacked):
        results[(si, bi)] = res


def jax_bz2_compress(data: bytes, config=None, mesh=None, n_max: int | None = None) -> bytes:
    """bzip2-compatible compression with the heavy stages on device."""
    level = config.block_size_100k if config is not None else 9
    batch_size = getattr(config, "blocks_per_batch", 8) if config else 8
    return encode_streams(
        [data],
        level=level,
        mesh=mesh,
        batch_size=batch_size,
        device_rle2=getattr(config, "device_rle2", False),
    )[0].data


def _dispatch_chunk(block_datas, n_max, mesh, device_rle2=False):
    """Upload + launch one batch asynchronously; returns device handles."""
    import jax
    import jax.numpy as jnp

    from starch3_tpu.parallel.mesh import block_sharding, pad_batch

    b = len(block_datas)
    n_dev = mesh.devices.size if mesh is not None else 1
    b_pad = pad_batch(b, n_dev)
    lens = np.ones(b_pad, dtype=np.int32)
    batch = np.zeros((b_pad, n_max), dtype=np.uint8)
    for i, data in enumerate(block_datas):
        arr = np.frombuffer(data, dtype=np.uint8)
        batch[i, : arr.size] = arr
        lens[i] = arr.size
    if mesh is not None:
        sharding = block_sharding(mesh)
        batch_d = jax.device_put(jnp.asarray(batch), sharding)
        lens_d = jax.device_put(jnp.asarray(lens), sharding)
    else:
        batch_d, lens_d = jnp.asarray(batch), jnp.asarray(lens)
    step = _jitted_fused_step_rle2(n_max) if device_rle2 else _jitted_fused_step(n_max)
    return step(batch_d, lens_d), lens, b


def _drain_one(bw, item, combined, n_max):
    chunk, out_d, lens, b = item
    results = _unpack_results(out_d, lens, b, n_max)
    for blk, (in_use, ptr, ranks) in zip(chunk, results):
        combined = combine_block_crc(combined, blk.crc)
        write_block_from_ranks(bw, blk.crc, ptr, ranks, in_use)
    return combined
