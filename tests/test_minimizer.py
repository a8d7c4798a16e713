"""Unit tests for the minimizer-bucketed key transform
(kat_tpu/core/minimizer.py) against the pure-int oracle."""

import numpy as np
import pytest

from kat_tpu.core import kmers, minimizer
from kat_tpu.core.kmers import SENTINEL

import oracle


def _rand_kmers(k, n, seed):
    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(n):
        v = 0
        for _ in range(k):
            v = (v << 2) | int(rng.integers(0, 4))
        vals.append(min(v, oracle.revcomp(v, k)))
    return vals


def test_mix26_bijective_and_matches_oracle():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 26, size=4096, dtype=np.uint32)
    mixed = minimizer.mix26(xs)
    back = minimizer.unmix26(mixed)
    np.testing.assert_array_equal(back, xs)
    for x in xs[:64]:
        assert int(minimizer.mix26(int(x))) == oracle.mix26_oracle(int(x))
    # int and array paths agree
    np.testing.assert_array_equal(
        mixed[:64], np.array([minimizer.mix26(int(x)) for x in xs[:64]],
                             np.uint32))


@pytest.mark.parametrize("k", [14, 17, 21, 27, 29])
def test_encode_matches_oracle(k):
    import jax.numpy as jnp

    m = minimizer.M_DEFAULT
    vals = _rand_kmers(k, 300, seed=k)
    hi = jnp.asarray([v >> 32 for v in vals], jnp.uint32)
    lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], jnp.uint32)
    khi, klo = minimizer.encode_keys(hi, lo, k, m)
    got = (np.asarray(khi).astype(np.uint64) << 32) | np.asarray(
        klo).astype(np.uint64)
    want = np.array([oracle.encode_keyp(v, k, m) for v in vals], np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [14, 17, 27, 29])
def test_decode_round_trip(k):
    import jax.numpy as jnp

    m = minimizer.M_DEFAULT
    vals = _rand_kmers(k, 300, seed=100 + k)
    hi = jnp.asarray([v >> 32 for v in vals], jnp.uint32)
    lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], jnp.uint32)
    khi, klo = minimizer.encode_keys(hi, lo, k, m)
    dhi, dlo = minimizer.decode_keys(khi, klo, k, m)
    np.testing.assert_array_equal(np.asarray(dhi), np.asarray(hi))
    np.testing.assert_array_equal(np.asarray(dlo), np.asarray(lo))


def test_sentinel_passthrough():
    import jax.numpy as jnp

    k = 27
    s = jnp.full((8,), SENTINEL, jnp.uint32)
    khi, klo = minimizer.encode_keys(s, s, k)
    assert np.all(np.asarray(khi) == SENTINEL)
    assert np.all(np.asarray(klo) == SENTINEL)
    dhi, dlo = minimizer.decode_keys(khi, klo, k)
    assert np.all(np.asarray(dhi) == SENTINEL)
    # real keys stay strictly below the sentinel
    vals = _rand_kmers(k, 64, seed=5)
    hi = jnp.asarray([v >> 32 for v in vals], jnp.uint32)
    lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], jnp.uint32)
    rhi, _ = minimizer.encode_keys(hi, lo, k)
    assert np.asarray(rhi).max() < SENTINEL


def test_keyp_preserves_equality_and_counts():
    """key' is a bijection: distinct kmers get distinct key', equal get
    equal (the counting invariant)."""
    k, m = 27, minimizer.M_DEFAULT
    vals = _rand_kmers(k, 500, seed=9)
    enc = [oracle.encode_keyp(v, k, m) for v in vals]
    assert len(set(enc)) == len(set(vals))
    d = {}
    for v, e in zip(vals, enc):
        assert d.setdefault(v, e) == e


@pytest.mark.parametrize("k", [17, 27])
def test_expand_records(k):
    """Device record expansion reproduces the oracle windows + keys."""
    import jax.numpy as jnp

    m = minimizer.M_DEFAULT
    S = minimizer.rec_windows(k)
    F = 2 * (k - 1 + S)
    rng = np.random.default_rng(77)
    recs, want_rows = [], []
    for _ in range(100):
        ln = int(rng.integers(0, S + 1))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4,
                                                      size=k - 1 + ln))
        packed = oracle.pack(seq) if ln else 0
        # left-align the k-1+ln used bases within the F-bit field
        rec = (ln << 61) | (packed << (F - 2 * (k - 1 + ln)) if ln else 0)
        recs.append(rec)
        row = []
        for j in range(S):
            if j < ln:
                v = oracle.pack(seq[j:j + k])
                v = min(v, oracle.revcomp(v, k))
                row.append(oracle.encode_keyp(v, k, m))
            else:
                row.append(None)
        want_rows.append(row)
    rhi = jnp.asarray([r >> 32 for r in recs], jnp.uint32)
    rlo = jnp.asarray([r & 0xFFFFFFFF for r in recs], jnp.uint32)
    # output is window-major: [S, n]
    khi, klo, valid = minimizer.expand_records(rhi, rlo, k, m)
    khi, klo, valid = np.asarray(khi), np.asarray(klo), np.asarray(valid)
    for i, row in enumerate(want_rows):
        for j, w in enumerate(row):
            if w is None:
                assert not valid[j, i]
                assert khi[j, i] == SENTINEL and klo[j, i] == SENTINEL
            else:
                assert valid[j, i]
                got = (int(khi[j, i]) << 32) | int(klo[j, i])
                assert got == w, (i, j)


def test_bucket_prefix_consistency():
    """bucket_of_keyp equals the top bits of the oracle key'."""
    import jax.numpy as jnp

    k, m, bb = 27, minimizer.M_DEFAULT, 12
    vals = _rand_kmers(k, 200, seed=3)
    hi = jnp.asarray([v >> 32 for v in vals], jnp.uint32)
    lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], jnp.uint32)
    khi, klo = minimizer.encode_keys(hi, lo, k, m)
    b = np.asarray(minimizer.bucket_of_keyp(khi, klo, k, m, bb))
    kb = minimizer.keyp_bits(k, m)
    want = np.array([oracle.encode_keyp(v, k, m) >> (kb - bb)
                     for v in vals], np.uint32)
    np.testing.assert_array_equal(b, want)
