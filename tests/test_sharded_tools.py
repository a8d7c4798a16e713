"""End-to-end tool runs over the mesh-sharded counting path (KAT_TPU_SHARD
forced): sharded and single-device counting must produce identical
artifacts."""

import os
import random

import pytest

from kat_tpu.tools.hist import Histogram


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")


@pytest.fixture
def fasta(tmp_path):
    rng = random.Random(21)
    seqs = ["".join(rng.choice("ACGT") for _ in range(rng.randint(40, 90)))
            for _ in range(60)]
    fa = tmp_path / "in.fa"
    _write_fasta(fa, seqs)
    return str(fa)


def _run_hist(tmp_path, fasta, name, shard):
    env_key = "KAT_TPU_SHARD" if shard else "KAT_TPU_NO_SHARD"
    os.environ[env_key] = "1"
    try:
        h = Histogram([fasta], low=1, high=100)
        h.quiet = True
        h.input.mer_len = 13
        h.input.hash_size = 4096
        h.output_prefix = str(tmp_path / name)
        h.execute()
        h.save()
    finally:
        os.environ.pop(env_key, None)
    return open(str(tmp_path / name)).read()


def test_sharded_hist_matches_single_device(tmp_path, fasta):
    single = _run_hist(tmp_path, fasta, "single", shard=False)
    sharded = _run_hist(tmp_path, fasta, "sharded", shard=True)
    assert sharded == single
