"""Sequence-parallel (halo-exchange) coverage must equal single-device
coverage for any contig length, including lengths not divisible by the
span and contigs containing Ns."""

import random

import numpy as np
import pytest

import oracle
from kat_tpu.core import coverage, counting, kmers
from kat_tpu.io import fastx
from kat_tpu.parallel.longseq import sharded_window_counts
from kat_tpu.parallel.sharded import make_mesh


@pytest.fixture(scope="module")
def table():
    rng = random.Random(3)
    reads = ["".join(rng.choice("ACGT") for _ in range(70))
             for _ in range(30)]
    hc = oracle.count_seqs(reads, 13)
    keys = np.fromiter(hc.keys(), np.uint64, len(hc))
    counts = np.fromiter(hc.values(), np.uint32, len(hc))
    return counting.table_from_numpy(keys, counts, capacity=4096), reads


@pytest.mark.parametrize("L", [500, 1024, 1037])
def test_halo_coverage_matches_single_device(table, L):
    t, reads = table
    k = 13
    rng = random.Random(L)
    # Contig stitched from read fragments (so lookups hit) + noise + Ns
    contig = "".join(rng.choice(reads)[:40] for _ in range(L // 40 + 1))[:L]
    contig = contig[:50] + "N" + contig[51:]
    codes = fastx.encode_ascii(
        np.frombuffer(contig.encode(), np.uint8))

    mesh = make_mesh(8)
    got = sharded_window_counts(t, codes, k, True, mesh)

    import jax.numpy as jnp
    want, _gc, _v = coverage.window_counts(
        t, jnp.asarray(codes)[None], k, True)
    np.testing.assert_array_equal(got, np.asarray(want)[0])
    assert got.shape[0] == L - k + 1
    assert got.sum() > 0  # lookups actually hit


def test_short_sequence(table):
    t, _ = table
    mesh = make_mesh(8)
    out = sharded_window_counts(t, np.zeros(5, np.uint8), 13, True, mesh)
    assert out.shape == (0,)
