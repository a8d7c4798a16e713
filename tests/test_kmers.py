"""Core encoding/extraction vs the pure-Python oracle."""

import numpy as np
import pytest

import oracle
from kat_tpu.core import kmers


def _random_seq(rng, n, with_n=False):
    alpha = "ACGTN" if with_n else "ACGT"
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return "".join(rng.choice(list(alpha), size=n, p=p))


def _extract_np(seq: str, k: int, canonical: bool):
    codes = kmers.encode_ascii(
        np.frombuffer(seq.encode(), np.uint8))[None, :]
    hi, lo, valid = kmers.extract_kmers(codes, k, canonical)
    return (np.asarray(hi)[0], np.asarray(lo)[0], np.asarray(valid)[0])


@pytest.mark.parametrize("k", [1, 5, 13, 16, 17, 27, 31])
@pytest.mark.parametrize("canonical", [True, False])
def test_extract_matches_oracle(k, canonical):
    rng = np.random.default_rng(42 + k)
    seq = _random_seq(rng, 200, with_n=True)
    hi, lo, valid = _extract_np(seq, k, canonical)
    expect = []
    for i in range(len(seq) - k + 1):
        v = oracle.pack(seq[i:i + k])
        if v is not None and canonical:
            v = min(v, oracle.revcomp(v, k))
        expect.append(v)
    assert len(expect) == len(valid)
    for i, v in enumerate(expect):
        if v is None:
            assert not valid[i]
            assert hi[i] == kmers.SENTINEL and lo[i] == kmers.SENTINEL
        else:
            assert valid[i]
            got = (int(hi[i]) << 32) | int(lo[i])
            assert got == v, f"window {i}: {got:x} != {v:x}"


def test_pack_unpack_roundtrip():
    s = "AGCTTTTCATTCTGACTGCAACGGGCA"
    v = kmers.pack_string(s)
    assert kmers.unpack_string(v, len(s)) == s
    assert oracle.pack(s) == v


@pytest.mark.parametrize("k", [3, 16, 27, 31])
def test_reverse_complement(k):
    rng = np.random.default_rng(7)
    vals = [oracle.pack(_random_seq(rng, k)) for _ in range(50)]
    hi = np.array([v >> 32 for v in vals], np.uint32)
    lo = np.array([v & 0xFFFFFFFF for v in vals], np.uint32)
    rhi, rlo = kmers.reverse_complement(hi, lo, k)
    for i, v in enumerate(vals):
        got = (int(rhi[i]) << 32) | int(rlo[i])
        assert got == oracle.revcomp(v, k)


@pytest.mark.parametrize("k", [4, 16, 27, 31])
def test_gc_count(k):
    rng = np.random.default_rng(3)
    vals = [oracle.pack(_random_seq(rng, k)) for _ in range(100)]
    hi = np.array([v >> 32 for v in vals], np.uint32)
    lo = np.array([v & 0xFFFFFFFF for v in vals], np.uint32)
    gc = np.asarray(kmers.gc_count(hi, lo))
    for i, v in enumerate(vals):
        assert gc[i] == oracle.gc_of_packed(v, k)


def test_padding_windows_invalid():
    seq = "ACGTACGTAC"
    arr = np.full((1, 20), 255, np.uint8)
    arr[0, :10] = np.frombuffer(seq.encode(), np.uint8)
    codes = kmers.encode_ascii(arr)
    hi, lo, valid = kmers.extract_kmers(codes, 5, True)
    v = np.asarray(valid)[0]
    assert v[:6].all()       # windows fully inside the sequence
    assert not v[6:].any()   # windows touching padding
