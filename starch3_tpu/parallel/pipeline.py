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
from starch3_tpu.codec.encoder import STREAM_END_MAGIC, write_block_from_ranks
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


@functools.lru_cache(maxsize=8)
def _jitted_fused_step(n_max: int):
    """BWT -> on-device dense symbol remap -> MTF, one dispatch per batch.

    Fusing keeps the 900 kB intermediate (BWT last column) in HBM instead
    of round-tripping it to the host between stages — on a tunneled
    single chip that halves wall time; on a pod it halves PCIe traffic.
    """
    import jax
    import jax.numpy as jnp

    from starch3_tpu.ops.bwt_jax import bwt_encode_padded
    from starch3_tpu.ops.mtf_jax import mtf_ranks_padded

    def one(block, n):
        last, ptr = bwt_encode_padded(block, n, n_max)
        idx = jnp.arange(n_max, dtype=jnp.int32)
        valid = idx < n
        used = jnp.zeros(256, jnp.int32).at[jnp.where(valid, last, 0)].max(
            valid.astype(jnp.int32)
        )
        u2s = jnp.cumsum(used) - 1  # dense remap (codec/mtf.py symbol_map)
        seq = jnp.where(valid, u2s[last], 0).astype(jnp.int32)
        ranks = mtf_ranks_padded(seq, n, n_max)
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
    # software pipeline: dispatch batch i+1 (async) before downloading and
    # bit-assembling batch i, overlapping device compute with host residue
    chunks = [blocks[lo : lo + batch_size] for lo in range(0, len(blocks), batch_size)]
    pending = []  # (chunk, out_device, lens, b)
    for chunk in chunks:
        pending.append(
            (chunk, *_dispatch_chunk([blk.data for blk in chunk], n_max, mesh))
        )
        if len(pending) > 1:
            combined = _drain_one(bw, pending.pop(0), combined, n_max)
    while pending:
        combined = _drain_one(bw, pending.pop(0), combined, n_max)
    bw.write(STREAM_END_MAGIC, 48)
    bw.write(combined, 32)
    return bw.getvalue()


def _dispatch_chunk(block_datas, n_max, mesh):
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
    return _jitted_fused_step(n_max)(batch_d, lens_d), lens, b


def _drain_one(bw, item, combined, n_max):
    chunk, out_d, lens, b = item
    results = _unpack_results(out_d, lens, b, n_max)
    for blk, (in_use, ptr, ranks) in zip(chunk, results):
        combined = combine_block_crc(combined, blk.crc)
        write_block_from_ranks(bw, blk.crc, ptr, ranks, in_use)
    return combined
