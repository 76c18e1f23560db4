"""Multi-host orchestration (DCN tier).

The reference is strictly single-process (SURVEY.md §2: no MPI/NCCL/
sockets anywhere).  The rebuild's multi-host story, per BASELINE.json
config 5:

  - ``jax.distributed.initialize`` connects one process per host; the
    global mesh spans every chip in the slice;
  - the corpus is sharded by chromosome across hosts with a deterministic
    round-robin over the *input order* (never topology-order), so any
    host count yields the same per-chromosome streams;
  - each host encodes its share through the standard pipeline
    (parallel/pipeline.py) over its local chips;
  - assembly is an ordered gather: host 0 concatenates streams in input
    order (parallel/assemble.py).  The only cross-host data needed is
    per-stream (bytes, stats) — gathered over DCN via
    ``jax.experimental.multihost_utils`` when in a real slice, or via the
    manifest directory when running as independent processes.

On a single host this degrades gracefully to the local pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np


def maybe_initialize(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Initialize jax.distributed when multi-host coordinates are given."""
    if coordinator is None:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_chromosomes(chrom_names: list[str], num_hosts: int, host_id: int) -> list[int]:
    """Deterministic input-order round-robin assignment of chromosome
    indices to hosts (input-derived, never topology-derived)."""
    return [i for i in range(len(chrom_names)) if i % num_hosts == host_id]


def corpus_fingerprint(per_chrom_texts: list[bytes]) -> str:
    """Stable id for a resume manifest namespace."""
    h = hashlib.sha256()
    for t in per_chrom_texts:
        h.update(len(t).to_bytes(8, "little"))
        h.update(hashlib.sha256(t).digest())
    return h.hexdigest()[:16]


def encode_corpus_multihost(
    chrom_blocks,
    config=None,
    num_hosts: int = 1,
    host_id: int = 0,
    manifest_dir: str | None = None,
):
    """Encode this host's chromosome share; returns {chrom: (stream, stats)}.

    Full-slice orchestration (gather to host 0) happens in the caller via
    assemble.assemble_ordered once all hosts' manifests are present.
    """
    from starch3_tpu.api import _compress_stream_ex
    from starch3_tpu.config import EncodeConfig
    from starch3_tpu.transform.delta import transform_chrom

    config = config or EncodeConfig()
    mine = shard_chromosomes([b.chrom for b in chrom_blocks], num_hosts, host_id)
    results = {}
    for i in mine:
        block = chrom_blocks[i]
        tf = transform_chrom(block)
        stream, offsets = _compress_stream_ex(tf.text, config)
        results[block.chrom] = (
            stream,
            dict(
                uncompressed_size=len(tf.text),
                line_count=tf.line_count,
                base_count_nonunique=tf.base_count_nonunique,
                base_count_unique=tf.base_count_unique,
                block_bit_offsets=offsets,
            ),
        )
    return results
