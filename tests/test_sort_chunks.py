"""Chunked bitonic sort mode (ops/sort_kernel.bitonic_sort_chunks):
each aligned chunk sorts independently ascending in one pass."""

import numpy as np
import pytest

import jax.numpy as jnp

from kat_tpu.core.kmers import SENTINEL
from kat_tpu.ops.sort_kernel import bitonic_sort_chunks

pytestmark = pytest.mark.kernel_interpret


def _np_u64(hi, lo):
    return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)


@pytest.mark.parametrize("n,chunk,br", [
    (8192, 1024, 8),        # chunk == block
    (8192, 2048, 8),        # chunk = 2 blocks
    (1 << 14, 4096, 8),     # chunk = 4 blocks
    (1 << 14, 1 << 14, 8),  # single chunk == whole array
])
def test_chunks_sort_independently(n, chunk, br):
    rng = np.random.default_rng(n + chunk)
    hi = rng.integers(0, 9, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    out = bitonic_sort_chunks(
        (jnp.asarray(hi), jnp.asarray(lo)), 2, chunk, block_rows=br,
        interpret=True)
    ohi, olo = np.asarray(out[0]), np.asarray(out[1])
    for c in range(n // chunk):
        s = slice(c * chunk, (c + 1) * chunk)
        order = np.lexsort((lo[s], hi[s]))
        assert np.array_equal(ohi[s], hi[s][order]), c
        assert np.array_equal(olo[s], lo[s][order]), c


def test_chunk_sentinels_sort_to_chunk_tail():
    rng = np.random.default_rng(5)
    n, chunk = 8192, 2048
    hi = rng.integers(0, 5, n).astype(np.uint32)
    lo = rng.integers(0, 50, n).astype(np.uint32)
    sent = rng.random(n) < 0.3
    hi[sent] = SENTINEL
    lo[sent] = SENTINEL
    out = bitonic_sort_chunks(
        (jnp.asarray(hi), jnp.asarray(lo)), 2, chunk, block_rows=8,
        interpret=True)
    ohi, olo = np.asarray(out[0]), np.asarray(out[1])
    for c in range(n // chunk):
        s = slice(c * chunk, (c + 1) * chunk)
        k = _np_u64(ohi[s], olo[s])
        assert np.all(np.diff(k.astype(object)) >= 0)
        n_sent = int(sent[s].sum())
        if n_sent:
            assert np.all(ohi[s][chunk - n_sent:] == SENTINEL)


def test_payload_plane_rides_along():
    rng = np.random.default_rng(11)
    n, chunk = 4096, 1024
    hi = rng.integers(0, 7, n).astype(np.uint32)
    lo = rng.integers(0, 7, n).astype(np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    out = bitonic_sort_chunks(
        (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay)), 2, chunk,
        block_rows=8, interpret=True)
    ohi, olo, op = (np.asarray(o) for o in out)
    import collections
    for c in range(n // chunk):
        s = slice(c * chunk, (c + 1) * chunk)
        assert np.array_equal(_np_u64(ohi[s], olo[s]),
                              np.sort(_np_u64(hi[s], lo[s])))
        m_in = collections.Counter(zip(_np_u64(hi[s], lo[s]).tolist(),
                                       pay[s].tolist()))
        m_out = collections.Counter(zip(_np_u64(ohi[s], olo[s]).tolist(),
                                        op[s].tolist()))
        assert m_in == m_out


def test_geometry_validation():
    x = jnp.zeros((4096,), jnp.uint32)
    with pytest.raises(ValueError):
        bitonic_sort_chunks((x, x), 2, 1000, block_rows=8, interpret=True)
    with pytest.raises(ValueError):
        bitonic_sort_chunks((x[:3000], x[:3000]), 2, 2048, block_rows=8,
                            interpret=True)
