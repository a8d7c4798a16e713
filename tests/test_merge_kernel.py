"""Pallas bitonic-merge kernel (ops/merge_kernel.py): interpret-mode
parity vs numpy mergesort, mirroring test_merge.py for the XLA version."""

import numpy as np
import pytest

import jax.numpy as jnp

from kat_tpu.core.kmers import SENTINEL
from kat_tpu.ops.merge_kernel import merge_sorted_kernel

S = int(SENTINEL)


pytestmark = pytest.mark.kernel_interpret

def _sorted_stream(rng, n, n_words, kmax=1 << 20):
    keys = rng.integers(0, kmax, (n, n_words), dtype=np.uint64).astype(
        np.uint32)
    order = np.lexsort(tuple(keys[:, j] for j in reversed(range(n_words))))
    keys = keys[order]
    w = rng.integers(1, 100, n).astype(np.uint32)
    return [keys[:, j].copy() for j in range(n_words)], w


def _merge_oracle(a_cols, aw, b_cols, bw):
    allc = [np.concatenate([a, b]) for a, b in zip(a_cols, b_cols)]
    w = np.concatenate([aw, bw])
    order = np.lexsort(tuple(reversed(allc)))
    return [c[order] for c in allc], w[order]


@pytest.mark.parametrize("na,nb", [(0, 7), (100, 300), (1024, 1024),
                                   (2048, 1500), (1, 4096)])
@pytest.mark.parametrize("n_words", [2, 4])
def test_merge_kernel_parity(na, nb, n_words):
    rng = np.random.default_rng(na * 13 + nb + n_words)
    a_cols, aw = _sorted_stream(rng, na, n_words)
    b_cols, bw = _sorted_stream(rng, nb, n_words)
    words, (w,) = merge_sorted_kernel(
        tuple(jnp.asarray(c) for c in a_cols), (jnp.asarray(aw),),
        tuple(jnp.asarray(c) for c in b_cols), (jnp.asarray(bw),),
        block_rows=8, interpret=True)
    want_cols, want_w = _merge_oracle(a_cols, aw, b_cols, bw)
    n = na + nb
    got = [np.asarray(c)[:n] for c in words]
    for j in range(n_words):
        np.testing.assert_array_equal(got[j], want_cols[j])
    got_pairs = sorted(zip(*[c.tolist() for c in got],
                           np.asarray(w)[:n].tolist()))
    want_pairs = sorted(zip(*[c.tolist() for c in want_cols],
                            want_w.tolist()))
    assert got_pairs == want_pairs
    tail = np.asarray(words[0])[n:]
    assert (tail == S).all()
    assert (np.asarray(w)[n:] == 0).all()


def test_merge_kernel_bigger_blocks():
    """Exercise >2 blocks and multiple cross-block stages (nb=8)."""
    rng = np.random.default_rng(77)
    a_cols, aw = _sorted_stream(rng, 3000, 2)
    b_cols, bw = _sorted_stream(rng, 5192, 2)
    words, (w,) = merge_sorted_kernel(
        tuple(jnp.asarray(c) for c in a_cols), (jnp.asarray(aw),),
        tuple(jnp.asarray(c) for c in b_cols), (jnp.asarray(bw),),
        block_rows=8, interpret=True)
    want_cols, want_w = _merge_oracle(a_cols, aw, b_cols, bw)
    n = 8192
    for j in range(2):
        np.testing.assert_array_equal(np.asarray(words[j])[:n],
                                      want_cols[j])


@pytest.mark.parametrize("na,nb", [(1100, 1900), (7000, 6000),
                                   (15 * 1024 - 10, 5)])
def test_merge_kernel_non_pow2_blocks(na, nb):
    """Non-power-of-two REAL block counts (3, 13, 15 blocks at br=8):
    exercises the virtual +inf block gating — strided and tail passes
    must skip pairs/blocks beyond the real length and still produce the
    exact ascending merge."""
    rng = np.random.default_rng(na + nb)
    a_cols, aw = _sorted_stream(rng, na, 2)
    b_cols, bw = _sorted_stream(rng, nb, 2)
    words, (w,) = merge_sorted_kernel(
        tuple(jnp.asarray(c) for c in a_cols), (jnp.asarray(aw),),
        tuple(jnp.asarray(c) for c in b_cols), (jnp.asarray(bw),),
        block_rows=8, interpret=True)
    n_out = words[0].shape[0]
    assert n_out % 1024 == 0 and (n_out // 1024) & (n_out // 1024 - 1), \
        "expected a non-pow2 block count for this geometry"
    want_cols, want_w = _merge_oracle(a_cols, aw, b_cols, bw)
    n = na + nb
    for j in range(2):
        np.testing.assert_array_equal(np.asarray(words[j])[:n],
                                      want_cols[j])
    got_pairs = sorted(zip(np.asarray(words[0])[:n].tolist(),
                           np.asarray(words[1])[:n].tolist(),
                           np.asarray(w)[:n].tolist()))
    want_pairs = sorted(zip(want_cols[0].tolist(), want_cols[1].tolist(),
                            want_w.tolist()))
    assert got_pairs == want_pairs
    assert (np.asarray(words[0])[n:] == S).all()


def test_merge_kernel_duplicates_across_streams():
    a = np.array([1, 1, 5, 9], np.uint32)
    b = np.array([1, 5, 5, 7, 11], np.uint32)
    az = np.zeros_like(a)
    bz = np.zeros_like(b)
    aw = np.array([10, 20, 30, 40], np.uint32)
    bw = np.array([1, 2, 3, 4, 5], np.uint32)
    words, (w,) = merge_sorted_kernel(
        (jnp.asarray(az), jnp.asarray(a)), (jnp.asarray(aw),),
        (jnp.asarray(bz), jnp.asarray(b)), (jnp.asarray(bw),),
        block_rows=8, interpret=True)
    lo = np.asarray(words[1])[:9]
    np.testing.assert_array_equal(lo, [1, 1, 1, 5, 5, 5, 7, 9, 11])
    assert int(np.asarray(w).sum()) == int(aw.sum()) + int(bw.sum())
