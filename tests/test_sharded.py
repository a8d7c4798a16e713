"""Sharded counting determinism: the mesh-sharded all_to_all counter must
produce byte-identical tables/histograms to the single-device engine for any
mesh shape (SURVEY §4: 'same input -> identical tables across shardings')."""

import random

import numpy as np
import pytest

import oracle
from kat_tpu.core import counting, kmers
from kat_tpu.io import fastx
from kat_tpu.parallel.sharded import ShardedCounter, make_mesh, shard_hash


@pytest.fixture(scope="module")
def batches():
    rng = random.Random(11)
    seqs = []
    for _ in range(64):
        n = rng.randint(30, 120)
        seqs.append("".join(
            rng.choice("ACGTN" if rng.random() < 0.05 else "ACGT")
            for _ in range(n)))
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    return seqs, list(fastx.encode_batches(iter(recs), 13,
                                           target_codes=1 << 12))


def _oracle_counts(seqs, k):
    return oracle.count_seqs(seqs, k)


@pytest.mark.parametrize("mesh_spec", [
    ((8,), ("shards",)),
    ((2, 4), ("dp", "kp")),
])
def test_sharded_counts_match_oracle(batches, mesh_spec):
    seqs, code_batches = batches
    shape, names = mesh_spec
    mesh = make_mesh(8, shape=shape, axis_names=names)
    sc = ShardedCounter(mesh, k=13, canonical=True, shard_capacity=1 << 12,
                        route_slack=8.0)
    for b in code_batches:
        sc.add_codes(b)
    table = sc.finish()
    keys, counts = counting.table_to_numpy(table)
    want = _oracle_counts(seqs, 13)
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(want)


def test_sharded_histogram_matches_single_device(batches):
    seqs, code_batches = batches
    mesh = make_mesh(8)
    sc = ShardedCounter(mesh, k=13, shard_capacity=1 << 12, route_slack=8.0)
    for b in code_batches:
        sc.add_codes(b)
    hist = sc.histogram(base=1, ceil=101, inc=1, nb_buckets=102)

    single = counting.StreamingCounter(initial_capacity=1 << 12)
    for b in code_batches:
        single.add(*kmers.extract_kmers(np.asarray(b), 13, True))
    from kat_tpu.core import stats
    want = np.asarray(stats.hist_from_counts(
        single.finish().counts, 1, 101, 1, 102), np.uint64)
    np.testing.assert_array_equal(hist, want)


def test_shard_hash_spreads():
    """Counts per shard should be roughly balanced for structured keys."""
    import jax.numpy as jnp
    n = 1 << 14
    # Structured keys: consecutive k-mer-like integers (low entropy).
    lo = jnp.arange(n, dtype=jnp.uint32)
    hi = jnp.zeros(n, jnp.uint32)
    dest = np.asarray(shard_hash(hi, lo) % np.uint32(8))
    freq = np.bincount(dest, minlength=8) / n
    assert freq.max() < 0.25, freq  # perfect would be 0.125


def test_sharded_wide_counts_match_oracle(batches):
    """Wide keys (k > 31) through the sharded all_to_all path."""
    seqs, _ = batches
    k = 33
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    code_batches = list(fastx.encode_batches(iter(recs), k,
                                             target_codes=1 << 12))
    mesh = make_mesh(8)
    sc = ShardedCounter(mesh, k=k, canonical=True, shard_capacity=1 << 12,
                        route_slack=8.0)
    for b in code_batches:
        sc.add_codes(b)
    table = sc.finish()
    from kat_tpu.core import wide as wide_mod

    keys, counts = wide_mod.table_to_numpy(table)
    got = dict(zip(keys, counts.tolist()))
    want = oracle.count_seqs(seqs, k)
    assert got == dict(want)


def test_route_overflow_recovers_in_place(batches):
    """A hopeless route_slack drops k-mers on the first attempt; the
    deferred-flush replay doubles the slack IN PLACE (no recount) until
    nothing drops — final counts exact."""
    seqs, code_batches = batches
    mesh = make_mesh(8)
    sc = ShardedCounter(mesh, k=13, shard_capacity=1 << 12,
                        route_slack=0.01)
    for b in code_batches:
        sc.add_codes(b)
    sc.check()
    assert sc.route_slack > 0.01  # grew
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(_oracle_counts(seqs, 13))


def test_capacity_overflow_recovers_in_place(batches):
    seqs, code_batches = batches
    mesh = make_mesh(8)
    sc = ShardedCounter(mesh, k=13, shard_capacity=1 << 4,
                        route_slack=8.0)
    for b in code_batches:
        sc.add_codes(b)
    sc.check()
    assert sc.shard_capacity > 1 << 4  # grew in place
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(_oracle_counts(seqs, 13))


def test_disable_grow_raises(batches):
    seqs, code_batches = batches
    mesh = make_mesh(8)
    sc = ShardedCounter(mesh, k=13, shard_capacity=1 << 4,
                        route_slack=8.0, disable_grow=True)
    with pytest.raises(RuntimeError, match="overflow"):
        for b in code_batches:
            sc.add_codes(b)
        sc.check()
