"""The sharded counter's kernel flush — the SAME Pallas program structure
the TPU runs (dest-keyed Pallas sort, dynamic-slice bucket routing,
bitonic run merge of the all_to_all arrivals, merge-kernel table join,
streaming reduce) — exercised in interpret mode on the 8-virtual-device
CPU mesh against the pure-Python oracle.

Covers both dest representations: FOLDED (shard id in spare high key
bits; k=27 x 8 shards) and the extra-plane path (k=13 narrow whose key
is under 32 bits, and wide keys), plus the run-merge fallback for
non-pow2 geometries.
"""

import random

import numpy as np
import pytest

import oracle
from kat_tpu.core import counting, wide as wide_mod
from kat_tpu.io import fastx
from kat_tpu.parallel.sharded import ShardedCounter, _fold_shift, make_mesh


pytestmark = pytest.mark.kernel_interpret

@pytest.fixture(scope="module")
def seqs():
    rng = random.Random(23)
    out = []
    for _ in range(48):
        n = rng.randint(40, 140)
        out.append("".join(
            rng.choice("ACGTN" if rng.random() < 0.04 else "ACGT")
            for _ in range(n)))
    return out


def _batches(seqs, k):
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    return list(fastx.encode_batches(iter(recs), k, target_codes=1 << 12))


def _count_kernel(seqs, k, mesh_shape=((8,), ("shards",)),
                  canonical=True, flush_batches=16):
    shape, names = mesh_shape
    mesh = make_mesh(8, shape=shape, axis_names=names)
    sc = ShardedCounter(mesh, k=k, canonical=canonical,
                        shard_capacity=1 << 12, route_slack=8.0,
                        flush_batches=flush_batches, use_kernel=True)
    for b in _batches(seqs, k):
        sc.add_codes(b)
    return sc


def test_fold_shift_rules():
    assert _fold_shift(27, 8) == 22       # 10 spare bits, 8 shards fit
    assert _fold_shift(27, 512) == 22     # boundary: dest top bit stays 0
    assert _fold_shift(27, 513) is None   # would risk sentinel collision
    assert _fold_shift(31, 2) == 30      # 2 spare bits: 2 shards still fit
    assert _fold_shift(31, 3) is None    # ...but 3 would set the top bit
    assert _fold_shift(13, 8) is None     # key under 32 bits: extra plane
    assert _fold_shift(16, 8) == 0        # 2k == 32 exactly
    assert _fold_shift(33, 8) is None     # wide path


def test_kernel_flush_folded_dest_matches_oracle(seqs):
    """k=27, 8 shards: dest folded into spare high bits (2-plane sort)."""
    sc = _count_kernel(seqs, 27)
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(oracle.count_seqs(seqs, 27))


def test_kernel_flush_extra_plane_matches_oracle(seqs):
    """k=13: key < 32 bits -> dest rides as an extra sort plane."""
    sc = _count_kernel(seqs, 13)
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(oracle.count_seqs(seqs, 13))


def test_kernel_flush_wide_matches_oracle(seqs):
    """Wide keys (k=33, 4-word) through the kernel flush."""
    sc = _count_kernel(seqs, 33)
    keys, counts = wide_mod.table_to_numpy(sc.finish())
    got = dict(zip(keys, counts.tolist()))
    assert got == dict(oracle.count_seqs(seqs, 33))


def test_kernel_flush_2d_mesh_matches_oracle(seqs):
    sc = _count_kernel(seqs, 27, mesh_shape=((2, 4), ("dp", "kp")))
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(oracle.count_seqs(seqs, 27))


def test_kernel_flush_non_canonical(seqs):
    sc = _count_kernel(seqs, 27, canonical=False)
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(oracle.count_seqs(seqs, 27, canonical=False))


def test_kernel_flush_incremental_flushes(seqs):
    """Multiple LSM flushes (flush_batches=1) must accumulate exactly."""
    sc = _count_kernel(seqs, 27, flush_batches=1)
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(oracle.count_seqs(seqs, 27))


def test_kernel_histogram_matches_xla_path(seqs):
    sk = _count_kernel(seqs, 27)
    hk = sk.histogram(1, 101, 1, 102)
    mesh = make_mesh(8)
    sx = ShardedCounter(mesh, k=27, shard_capacity=1 << 12,
                        route_slack=8.0, use_kernel=False)
    for b in _batches(seqs, 27):
        sx.add_codes(b)
    np.testing.assert_array_equal(hk, sx.histogram(1, 101, 1, 102))


def test_overflow_across_flushes_recovers_in_place():
    """A mid-stream flush overflow replays IN PLACE at doubled capacity
    (deferred one flush, like the single-chip optimistic commit); with
    growth disabled it raises instead of silently truncating."""
    rng = np.random.default_rng(5)
    mesh = make_mesh(8)
    cap = 1 << 7
    codes = rng.integers(0, 4, size=(64, 80), dtype=np.uint8)

    sc = ShardedCounter(mesh, k=19, shard_capacity=cap, route_slack=8.0,
                        flush_batches=1, use_kernel=False)
    sc.add_codes(codes)
    sc.flush()
    sc.add_codes(codes)  # settles + replays flush 1 before flush 2
    sc.check()
    assert sc.shard_capacity > cap
    # counts exact: every window of the doubled data counted twice
    keys, counts = counting.table_to_numpy(sc.finish())
    from kat_tpu.core.kmers import unpack_string
    want = oracle.count_seqs(
        ["".join("ACGT"[c] for c in row) for row in codes], 19)
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == {k: 2 * v for k, v in want.items()}

    sc2 = ShardedCounter(mesh, k=19, shard_capacity=cap, route_slack=8.0,
                         flush_batches=1, use_kernel=False,
                         disable_grow=True)
    with pytest.raises(RuntimeError, match="overflow"):
        sc2.add_codes(codes)
        sc2.flush()
        sc2.add_codes(codes)
        sc2.check()


def test_verify_kernels_wide_structure():
    """The wide attestation itself (sort/merge/reduce at 4 and 16 planes,
    non-pow2 merge splits) must PASS in interpret mode — the same code
    the chip attestation runs (k=63 and k=255 key shapes)."""
    from kat_tpu.ops.verify import verify_kernels_wide

    for nw in (4, 16):
        r = verify_kernels_wide(n_words=nw, n=1 << 13, interpret=True)
        assert (r["sort"], r["merge"], r["reduce"]) == ("PASS",) * 3, r
