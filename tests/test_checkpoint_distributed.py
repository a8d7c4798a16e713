"""Checkpoint round-trips and multi-host helper tests."""

import random

import numpy as np
import pytest

import oracle
from kat_tpu.core import counting
from kat_tpu.io import checkpoint
from kat_tpu.parallel import distributed


@pytest.fixture
def table():
    rng = random.Random(13)
    seqs = ["".join(rng.choice("ACGT") for _ in range(80))
            for _ in range(20)]
    hc = oracle.count_seqs(seqs, 11)
    keys = np.fromiter(hc.keys(), np.uint64, len(hc))
    counts = np.fromiter(hc.values(), np.uint32, len(hc))
    return counting.table_from_numpy(keys, counts, capacity=2048), hc


@pytest.mark.parametrize("n_shards", [1, 4])
def test_checkpoint_roundtrip(tmp_path, table, n_shards):
    t, hc = table
    checkpoint.save_table(str(tmp_path / "ck"), t, k=11, canonical=True,
                          n_shards=n_shards)
    loaded, manifest = checkpoint.load_table(str(tmp_path / "ck"))
    assert manifest["k"] == 11
    assert manifest["canonical"] is True
    assert manifest["n_shards"] == n_shards
    assert manifest["n_unique"] == len(hc)
    keys, counts = counting.table_to_numpy(loaded)
    assert dict(zip(keys.tolist(), counts.tolist())) == dict(hc)


def test_checkpoint_shards_are_disjoint(tmp_path, table):
    t, hc = table
    checkpoint.save_table(str(tmp_path / "ck"), t, k=11, canonical=True,
                          n_shards=4)
    seen = set()
    total = 0
    for s in range(4):
        keys, _counts = checkpoint.load_shard(str(tmp_path / "ck"), s)
        ks = set(keys.tolist())
        assert not (seen & ks)
        seen |= ks
        total += len(ks)
    assert total == len(hc)


def test_checkpoint_rejects_other_dirs(tmp_path):
    (tmp_path / "manifest.json").write_text('{"format": "other"}')
    with pytest.raises(ValueError):
        checkpoint.load_manifest(str(tmp_path))


def test_shard_files_balanced(tmp_path):
    paths = []
    for i, size in enumerate([100, 90, 50, 40, 30, 10]):
        p = tmp_path / f"f{i}.fa"
        p.write_text("x" * size)
        paths.append(str(p))
    s0 = distributed.shard_files(paths, index=0, count=2)
    s1 = distributed.shard_files(paths, index=1, count=2)
    assert sorted(s0 + s1) == sorted(paths)
    assert not (set(s0) & set(s1))
    # balanced by size rank: each host gets 3 files
    assert len(s0) == len(s1) == 3


def test_shard_files_single_process(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text("x")
    assert distributed.shard_files([str(p)], index=0, count=1) == [str(p)]


def test_global_mesh_cpu():
    mesh = distributed.global_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8  # conftest forces 8


@pytest.fixture
def wide_table():
    from kat_tpu.core import wide as wide_mod

    rng = random.Random(29)
    seqs = ["".join(rng.choice("ACGT") for _ in range(120))
            for _ in range(12)]
    k = 41
    hc = oracle.count_seqs(seqs, k)
    words = wide_mod.ints_to_words(list(hc.keys()))
    counts = np.fromiter(hc.values(), np.uint32, len(hc))
    return wide_mod.table_from_words(words, counts, capacity=2048), hc, k


@pytest.mark.parametrize("n_shards", [1, 4])
def test_wide_checkpoint_roundtrip(tmp_path, wide_table, n_shards):
    from kat_tpu.core import wide as wide_mod

    t, hc, k = wide_table
    checkpoint.save_table(str(tmp_path / "ck"), t, k=k, canonical=True,
                          n_shards=n_shards)
    loaded, manifest = checkpoint.load_table(str(tmp_path / "ck"))
    assert manifest["key_words"] == 4
    assert manifest["n_unique"] == len(hc)
    keys, counts = wide_mod.table_to_numpy(loaded)
    assert dict(zip(keys, counts.tolist())) == dict(hc)


def test_wide_checkpoint_shards_disjoint(tmp_path, wide_table):
    t, hc, k = wide_table
    checkpoint.save_table(str(tmp_path / "ck"), t, k=k, canonical=True,
                          n_shards=4)
    total = 0
    seen = set()
    for s in range(4):
        words, _counts = checkpoint.load_shard(str(tmp_path / "ck"), s)
        ks = {tuple(row) for row in words.tolist()}
        assert not (seen & ks)
        seen |= ks
        total += len(ks)
    assert total == len(hc)


def test_shard_dest_matches_mesh_ownership(tmp_path, table):
    """Checkpoint shard placement must equal the mesh's owner_shard —
    i.e. hash the CANONICAL key form — for canonical AND raw-key tables
    (ADVICE r2: raw-key tables previously hashed raw keys)."""
    import jax.numpy as jnp

    from kat_tpu.parallel.sharded import owner_shard

    t, hc = table
    n_shards = 4
    for canonical in (True, False):
        path = str(tmp_path / f"ck_{canonical}")
        checkpoint.save_table(path, t, k=11, canonical=canonical,
                              n_shards=n_shards)
        for s in range(n_shards):
            keys, _counts = checkpoint.load_shard(path, s)
            if not len(keys):
                continue
            hi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
            lo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(
                np.uint32))
            mesh_dest = np.asarray(owner_shard((hi, lo), 11, n_shards))
            assert (mesh_dest == s).all()


def test_wide_shard_dest_matches_mesh_ownership(tmp_path, wide_table):
    import jax.numpy as jnp

    from kat_tpu.parallel.sharded import owner_shard

    t, hc, k = wide_table
    n_shards = 4
    checkpoint.save_table(str(tmp_path / "ck"), t, k=k, canonical=True,
                          n_shards=n_shards)
    for s in range(n_shards):
        words, _counts = checkpoint.load_shard(str(tmp_path / "ck"), s)
        if not len(words):
            continue
        wt = tuple(jnp.asarray(words[:, i]) for i in range(words.shape[1]))
        mesh_dest = np.asarray(owner_shard(wt, k, n_shards))
        assert (mesh_dest == s).all()


def test_canonical_keys_np_matches_oracle():
    from kat_tpu.core import kmers
    from kat_tpu.io.checkpoint import _canonical_keys_np

    rng = random.Random(7)
    for k in (5, 11, 27, 31):
        keys = np.array([rng.randrange(0, 1 << (2 * k)) for _ in range(200)],
                        np.uint64)
        got = _canonical_keys_np(keys, k)
        want = np.array([kmers.canonical_int(int(v), k) for v in keys],
                        np.uint64)
        assert (got == want).all()


def test_canonical_words_np_matches_oracle():
    from kat_tpu.core import kmers, wide as wide_mod
    from kat_tpu.io.checkpoint import _canonical_words_np

    rng = random.Random(9)
    for k in (41, 63, 64, 95, 127):
        nw = kmers.words_for_k(k)
        ints = [rng.randrange(0, 1 << (2 * k)) for _ in range(100)]
        words = wide_mod.ints_to_words(ints, n_words=nw)
        got = _canonical_words_np(words, k)
        want_ints = [kmers.canonical_int(v, k) for v in ints]
        want = wide_mod.ints_to_words(want_ints, n_words=nw)
        assert (got == want).all()


def test_sharded_counter_checkpoint_roundtrip(tmp_path):
    """Save a live mesh counter shard-by-shard (no host merge), resume
    with direct per-device placement, and keep counting: tables,
    histograms and routed lookups must match the uninterrupted run."""
    from kat_tpu.io.checkpoint import (load_sharded_counter,
                                       save_sharded_counter)
    from kat_tpu.parallel.analysis import ShardedLookup
    from kat_tpu.parallel.sharded import ShardedCounter, make_mesh

    rng = random.Random(91)
    seqs = ["".join(rng.choice("ACGT") for _ in range(90))
            for _ in range(30)]
    from kat_tpu.io import fastx

    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    batches = list(fastx.encode_batches(iter(recs), 13,
                                        target_codes=1 << 12))
    mesh = make_mesh(8)

    # uninterrupted reference run
    ref = ShardedCounter(mesh, 13, shard_capacity=1 << 12,
                         route_slack=8.0)
    for b in batches:
        ref.add_codes(b)
    ref_hist = ref.histogram(1, 101, 1, 102)
    ref_keys, ref_counts = counting.table_to_numpy(ref.finish())

    # first half -> checkpoint -> resume -> second half
    half = len(batches) // 2
    c1 = ShardedCounter(mesh, 13, shard_capacity=1 << 12,
                        route_slack=8.0)
    for b in batches[:half]:
        c1.add_codes(b)
    save_sharded_counter(str(tmp_path / "ck"), c1)

    c2 = load_sharded_counter(str(tmp_path / "ck"), mesh,
                              route_slack=8.0)
    for b in batches[half:]:
        c2.add_codes(b)
    np.testing.assert_array_equal(c2.histogram(1, 101, 1, 102), ref_hist)
    keys, counts = counting.table_to_numpy(c2.finish())
    assert dict(zip(keys.tolist(), counts.tolist())) == \
        dict(zip(ref_keys.tolist(), ref_counts.tolist()))

    # routed lookups against the resumed counter answer correctly
    svc = ShardedLookup(c2)
    import jax.numpy as jnp

    qhi = ref_keys[:64] >> np.uint64(32)
    qlo = ref_keys[:64] & np.uint64(0xFFFFFFFF)
    got = svc.lookup([qhi.astype(np.uint32), qlo.astype(np.uint32)])
    np.testing.assert_array_equal(got, ref_counts[:64])


def test_sharded_counter_checkpoint_wide(tmp_path):
    from kat_tpu.core import wide as wide_mod
    from kat_tpu.io import fastx
    from kat_tpu.io.checkpoint import (load_sharded_counter,
                                       save_sharded_counter)
    from kat_tpu.parallel.sharded import ShardedCounter, make_mesh

    rng = random.Random(92)
    seqs = ["".join(rng.choice("ACGT") for _ in range(120))
            for _ in range(12)]
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    k = 41
    batches = list(fastx.encode_batches(iter(recs), k,
                                        target_codes=1 << 12))
    mesh = make_mesh(8)
    c1 = ShardedCounter(mesh, k, shard_capacity=1 << 11, route_slack=8.0)
    for b in batches:
        c1.add_codes(b)
    save_sharded_counter(str(tmp_path / "ckw"), c1)
    c2 = load_sharded_counter(str(tmp_path / "ckw"), mesh)
    keys, counts = wide_mod.table_to_numpy(c2.finish())
    assert dict(zip(keys, counts.tolist())) == \
        dict(oracle.count_seqs(seqs, k))


def test_host_checkpoint_loads_into_mesh(tmp_path, table):
    """A host-side save_table checkpoint (canonical-hash partitioned)
    places directly onto a same-size mesh."""
    from kat_tpu.io.checkpoint import load_sharded_counter
    from kat_tpu.parallel.sharded import make_mesh

    t, hc = table
    checkpoint.save_table(str(tmp_path / "ck8"), t, k=11, canonical=True,
                          n_shards=8)
    mesh = make_mesh(8)
    sc = load_sharded_counter(str(tmp_path / "ck8"), mesh)
    keys, counts = counting.table_to_numpy(sc.finish())
    assert dict(zip(keys.tolist(), counts.tolist())) == dict(hc)
