"""Pallas bitonic full-sort kernel (ops/sort_kernel.py) — interpret-mode
correctness against numpy lexsort, including payload transport, sentinel
padding, and the wide-key plane counts used by k>31 paths."""

import collections

import numpy as np
import pytest

import jax.numpy as jnp

from kat_tpu.core.kmers import SENTINEL
from kat_tpu.ops.sort_kernel import bitonic_sort_planes, sort_planes_padded


pytestmark = pytest.mark.kernel_interpret

def _np_u64(hi, lo):
    return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)


@pytest.mark.parametrize("n,br", [(2048, 8), (4096, 8), (1 << 14, 16)])
def test_sort_matches_lexsort(n, br):
    rng = np.random.default_rng(n)
    hi = rng.integers(0, 37, n).astype(np.uint32)  # heavy ties
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    out = bitonic_sort_planes(
        (jnp.asarray(hi), jnp.asarray(lo)), 2, block_rows=br,
        interpret=True)
    order = np.lexsort((lo, hi))
    assert np.array_equal(np.asarray(out[0]), hi[order])
    assert np.array_equal(np.asarray(out[1]), lo[order])


def test_payload_travels_with_key():
    rng = np.random.default_rng(7)
    n = 4096
    hi = rng.integers(0, 11, n).astype(np.uint32)
    lo = rng.integers(0, 5, n).astype(np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    out = bitonic_sort_planes(
        (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay)), 2,
        block_rows=8, interpret=True)
    ohi, olo, op = (np.asarray(o) for o in out)
    assert np.array_equal(_np_u64(ohi, olo), np.sort(_np_u64(hi, lo)))
    # ties make order non-unique; compare (key, payload) multisets
    m_in = collections.Counter(zip(_np_u64(hi, lo).tolist(), pay.tolist()))
    m_out = collections.Counter(zip(_np_u64(ohi, olo).tolist(),
                                    op.tolist()))
    assert m_in == m_out


def test_wide_key_planes():
    rng = np.random.default_rng(3)
    n = 2048
    words = [rng.integers(0, 7, n).astype(np.uint32) for _ in range(4)]
    out = bitonic_sort_planes(
        tuple(jnp.asarray(w) for w in words), 4, block_rows=8,
        interpret=True)
    order = np.lexsort(tuple(words[::-1]))
    for w, o in zip(words, out):
        assert np.array_equal(np.asarray(o), w[order])


def test_padded_arbitrary_length_with_sentinels():
    rng = np.random.default_rng(5)
    n = 3001
    hi = rng.integers(0, 1 << 22, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    # sprinkle real sentinels (invalid windows) — they must sort last and
    # survive the pad/slice round trip
    sent = rng.choice(n, 50, replace=False)
    hi[sent] = SENTINEL
    lo[sent] = SENTINEL
    out = sort_planes_padded((jnp.asarray(hi), jnp.asarray(lo)), 2,
                             block_rows=8, interpret=True)
    order = np.lexsort((lo, hi))
    assert np.array_equal(np.asarray(out[0]), hi[order])
    assert np.array_equal(np.asarray(out[1]), lo[order])
