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
from starch3_tpu.codec.encoder import STREAM_END_MAGIC, write_block_from_bwt
from starch3_tpu.codec.mtf import symbol_map
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


def device_encode_blocks(
    block_datas: list[bytes], n_max: int = N_MAX_BLOCK, mesh=None
) -> list[tuple[np.ndarray, int, np.ndarray]]:
    """Run the device stages for a batch of post-RLE1 blocks.

    Returns per block: (bwt last column, orig_ptr, mtf ranks).
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

    sharding = None
    if mesh is not None:
        sharding = block_sharding(mesh)
        batch_d = jax.device_put(jnp.asarray(batch), sharding)
        lens_d = jax.device_put(jnp.asarray(lens), sharding)
    else:
        batch_d = jnp.asarray(batch)
        lens_d = jnp.asarray(lens)

    last_d, ptr_d = _jitted_device_step(n_max)(batch_d, lens_d)
    last = np.asarray(last_d)
    ptrs = np.asarray(ptr_d)

    # dense symbol remap on host (cheap), then device MTF ranks
    seqs = np.zeros((b_pad, n_max), dtype=np.int32)
    maps = []
    for i, data in enumerate(block_datas):
        n = lens[i]
        in_use, u2s, n_in = symbol_map(last[i, :n])
        maps.append((in_use, n_in))
        seqs[i, :n] = u2s[last[i, :n]]
    if mesh is not None:
        seqs_d = jax.device_put(jnp.asarray(seqs), sharding)
    else:
        seqs_d = jnp.asarray(seqs)
    ranks_d = _jitted_mtf_step(n_max)(seqs_d, lens_d)
    ranks = np.asarray(ranks_d)

    return [
        (last[i, : lens[i]], int(ptrs[i]), ranks[i, : lens[i]])
        for i in range(b)
    ]


def jax_bz2_compress(data: bytes, config=None, mesh=None, n_max: int | None = None) -> bytes:
    """bzip2-compatible compression with the heavy stages on device."""
    level = config.block_size_100k if config is not None else 9
    batch_size = getattr(config, "blocks_per_batch", 8) if config else 8
    blocks = rle1_split_blocks(data, level)
    if n_max is None:
        # smallest padded geometry that fits the largest block (tile
        # multiple) — small inputs compile a small program
        biggest = max((len(b.data) for b in blocks), default=1)
        n_max = min(N_MAX_BLOCK, ((biggest + 511) // 512) * 512)
    bw = BitWriter()
    bw.write_bytes_msb(b"BZh")
    bw.write(0x30 + level, 8)
    combined = 0
    for lo in range(0, len(blocks), batch_size):
        chunk = blocks[lo : lo + batch_size]
        results = device_encode_blocks(
            [blk.data for blk in chunk], n_max=n_max, mesh=mesh
        )
        for blk, (last, ptr, ranks) in zip(chunk, results):
            combined = combine_block_crc(combined, blk.crc)
            write_block_from_bwt(bw, blk.crc, last, ptr, ranks=ranks)
    bw.write(STREAM_END_MAGIC, 48)
    bw.write(combined, 32)
    return bw.getvalue()
