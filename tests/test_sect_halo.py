"""sect with the halo-exchange sequence-parallel path (forced via
KAT_TPU_SHARD + a low threshold) must produce byte-identical artifacts to
the host-chunked path."""

import os
import random

import pytest

from kat_tpu.tools.sect import Sect


def _write_fasta(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f">{name}\n{s}\n")


@pytest.fixture
def files(tmp_path):
    rng = random.Random(8)
    reads = ["".join(rng.choice("ACGT") for _ in range(60))
             for _ in range(30)]
    # long contig (several k-windows per span on an 8-device mesh) + short
    contig = "".join(rng.choice(reads) for _ in range(40))
    targets = [("long_contig", contig), ("short", reads[0])]
    reads_fa = tmp_path / "reads.fa"
    target_fa = tmp_path / "target.fa"
    _write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    _write_fasta(target_fa, targets)
    return str(reads_fa), str(target_fa)


def _run(tmp_path, files, name, halo):
    reads_fa, target_fa = files
    env = dict(KAT_TPU_SHARD="1", KAT_TPU_HALO_MIN="256") if halo else \
        dict(KAT_TPU_NO_SHARD="1")
    old = {k: os.environ.get(k) for k in
           ("KAT_TPU_SHARD", "KAT_TPU_NO_SHARD", "KAT_TPU_HALO_MIN")}
    os.environ.update(env)
    try:
        s = Sect([reads_fa], target_fa)
        s.quiet = True
        s.output_prefix = str(tmp_path / name)
        s.input.mer_len = 13
        s.input.hash_size = 4096
        s.output_gc_stats = True
        s.execute()
        s.save()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return {suffix: open(str(tmp_path / name) + suffix).read()
            for suffix in ("-counts.cvg", "-counts.gc", "-stats.tsv")}


def test_sect_halo_path_identical(tmp_path, files):
    plain = _run(tmp_path, files, "plain", halo=False)
    halo = _run(tmp_path, files, "halo", halo=True)
    assert halo == plain
