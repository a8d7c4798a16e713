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


@pytest.fixture
def fasta2(tmp_path):
    rng = random.Random(37)
    seqs = ["".join(rng.choice("ACGT") for _ in range(rng.randint(50, 120)))
            for _ in range(40)]
    fa = tmp_path / "in2.fa"
    _write_fasta(fa, seqs)
    return str(fa)


def _artifacts(prefix):
    import glob

    out = {}
    for p in sorted(glob.glob(prefix + "*")):
        with open(p, "rb") as f:
            out[os.path.basename(p)[len(os.path.basename(prefix)):]] = \
                f.read()
    return out


def _with_env(shard):
    return ("KAT_TPU_SHARD", "1") if shard else ("KAT_TPU_NO_SHARD", "1")


def _run_comp(tmp_path, fasta, fasta2, name, shard):
    from kat_tpu.tools.comp import Comp

    key, val = _with_env(shard)
    os.environ[key] = val
    try:
        c = Comp([fasta], [fasta2])
        c.quiet = True
        c.set_mer_len(13)
        for inp in c.inputs:
            inp.hash_size = 4096
        c.output_prefix = str(tmp_path / name)
        c.execute()
        c.save()
        if shard:
            # the whole analysis ran on mesh shards — no host merge
            assert all(i.table is None for i in c.inputs[:2])
    finally:
        os.environ.pop(key, None)
    return _artifacts(str(tmp_path / name))


def test_sharded_comp_artifacts_identical(tmp_path, fasta, fasta2):
    single = _run_comp(tmp_path, fasta, fasta2, "c_single", shard=False)
    sharded = _run_comp(tmp_path, fasta, fasta2, "c_shard", shard=True)
    assert set(sharded) == set(single)
    for name in single:
        assert sharded[name] == single[name], name


def _run_gcp(tmp_path, fasta, name, shard):
    from kat_tpu.tools.gcp import Gcp

    key, val = _with_env(shard)
    os.environ[key] = val
    try:
        g = Gcp([fasta])
        g.quiet = True
        g.input.mer_len = 13
        g.input.hash_size = 4096
        g.output_prefix = str(tmp_path / name)
        g.execute()
        g.save()
        if shard:
            assert g.input.table is None
    finally:
        os.environ.pop(key, None)
    return open(str(tmp_path / name) + ".mx").read()


def test_sharded_gcp_artifact_identical(tmp_path, fasta):
    single = _run_gcp(tmp_path, fasta, "g_single", shard=False)
    sharded = _run_gcp(tmp_path, fasta, "g_shard", shard=True)
    assert sharded == single


def _run_sect(tmp_path, fasta, fasta2, name, shard):
    from kat_tpu.tools.sect import Sect

    key, val = _with_env(shard)
    os.environ[key] = val
    try:
        s = Sect([fasta2], fasta)
        s.quiet = True
        s.input.mer_len = 13
        s.input.hash_size = 4096
        s.output_prefix = str(tmp_path / name)
        s.execute()
        if shard:
            assert s.input.table is None
    finally:
        os.environ.pop(key, None)
    return _artifacts(str(tmp_path / name))


def test_sharded_sect_artifacts_identical(tmp_path, fasta, fasta2):
    single = _run_sect(tmp_path, fasta, fasta2, "s_single", shard=False)
    sharded = _run_sect(tmp_path, fasta, fasta2, "s_shard", shard=True)
    assert set(sharded) == set(single)
    for name in single:
        assert sharded[name] == single[name], name
