"""Multi-host integration: separate OS processes, manifest handoff,
host-0 assembly (SURVEY.md §4 "multi-host tests without a cluster").

Each "host" is a real subprocess encoding its chromosome share and
persisting streams + manifest to a shared directory; the assembler then
builds the archive in input order.  Asserts the full multi-process
archive is byte-identical to the single-process one.
"""

import json
import subprocess
import sys

from starch3_tpu.api import compress_bed_bytes, decompress_starch_bytes

from tests.conftest import make_bed_text

WORKER = r"""
import sys, json, os, hashlib
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from starch3_tpu.bed.parser import parse_bed
from starch3_tpu.parallel.distributed import encode_corpus_multihost

host_id, n_hosts, bed_path, out_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
bed = open(bed_path, "rb").read()
blocks = parse_bed(bed)
results = encode_corpus_multihost(blocks, num_hosts=n_hosts, host_id=host_id)
manifest = {{}}
for chrom, (stream, stats) in results.items():
    path = os.path.join(out_dir, f"{{chrom}}.stream")
    open(path, "wb").write(stream)
    manifest[chrom] = {{"path": path, "stats": stats}}
open(os.path.join(out_dir, f"host{{host_id}}.json"), "w").write(json.dumps(manifest))
"""


def test_two_process_encode_matches_single(tmp_path, rng):
    bed = make_bed_text(rng, n=1200, chroms=("chr1", "chr2", "chr3", "chr4", "chrM"))
    bed_path = tmp_path / "in.bed"
    bed_path.write_bytes(bed)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo="/root/repo"))

    n_hosts = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(h), str(n_hosts), str(bed_path), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for h in range(n_hosts)
    ]
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()

    # host-0 assembly: gather manifests, order by input
    from starch3_tpu.bed.parser import parse_bed
    from starch3_tpu.parallel.assemble import assemble_ordered

    order = [b.chrom for b in parse_bed(bed)]
    results = {}
    for h in range(n_hosts):
        manifest = json.loads((tmp_path / f"host{h}.json").read_text())
        for chrom, entry in manifest.items():
            stream = open(entry["path"], "rb").read()
            results[chrom] = (stream, entry["stats"])
    assert set(results) == set(order)
    archive = assemble_ordered(order, results)

    assert archive == compress_bed_bytes(bed)
    assert decompress_starch_bytes(archive) == bed
