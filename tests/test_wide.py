"""Wide-key (k > 31) engine tests against the pure-Python oracle, which
handles arbitrary k with native ints."""

import random

import numpy as np
import pytest

import oracle
from kat_tpu.core import wide
from kat_tpu.core.kmers import (N_WORDS_WIDE, extract_kmers_wide,
                                gc_count_words, pack_string_words,
                                reverse_complement_words, words_to_int)
from kat_tpu.io import fastx


@pytest.fixture(scope="module")
def seqs():
    rng = random.Random(99)
    out = []
    for _ in range(30):
        n = rng.randint(60, 150)
        out.append("".join(
            rng.choice("ACGTN" if rng.random() < 0.05 else "ACGT")
            for _ in range(n)))
    return out


def _codes(s):
    return fastx.encode_ascii(np.frombuffer(s.encode(), np.uint8))


@pytest.mark.parametrize("k", [33, 45, 63])
def test_extract_wide_matches_oracle(seqs, k):
    for s in seqs[:10]:
        if len(s) < k:
            continue
        words, valid = extract_kmers_wide(_codes(s)[None], k, True)
        got = [words_to_int([w[0, i] for w in words])
               for i in range(words[0].shape[1])
               if bool(valid[0, i])]
        want = oracle.kmers_of(s, k, True)
        assert got == want, (k, s)


@pytest.mark.parametrize("k", [33, 63])
def test_extract_wide_non_canonical(seqs, k):
    s = next(x for x in seqs if len(x) >= k and "N" not in x)
    words, valid = extract_kmers_wide(_codes(s)[None], k, False)
    got = [words_to_int([w[0, i] for w in words])
           for i in range(words[0].shape[1]) if bool(valid[0, i])]
    want = oracle.kmers_of(s, k, False)
    assert got == want


def test_reverse_complement_words():
    k = 41
    s = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTA"
    assert len(s) == k
    import jax.numpy as jnp

    words = tuple(jnp.asarray([w], jnp.uint32)
                  for w in pack_string_words(s))
    rcw = reverse_complement_words(words, k)
    got = words_to_int([w[0] for w in rcw])
    want = oracle.revcomp(oracle.pack(s), k)
    assert got == want


def test_gc_count_words():
    s = "GGGCCCAAATTTGCGCGCGCATATATATGGGCC"
    k = len(s)
    import jax.numpy as jnp

    words = tuple(jnp.asarray([w], jnp.uint32)
                  for w in pack_string_words(s))
    assert int(gc_count_words(words)[0]) == sum(
        1 for ch in s if ch in "GC")


@pytest.mark.parametrize("k", [33, 63])
def test_wide_counting_matches_oracle(seqs, k):
    sc = wide.WideCodeStreamingCounter(k, canonical=True,
                                       initial_capacity=1 << 12,
                                       flush_batches=4)
    for s in seqs:
        if len(s) >= k:
            sc.add_codes(_codes(s)[None])
    t = sc.finish()
    keys, counts = wide.table_to_numpy(t)
    got = dict(zip(keys, counts.tolist()))
    want = oracle.count_seqs(seqs, k)
    assert got == dict(want)


def test_wide_lookup(seqs):
    k = 41
    sc = wide.WideCodeStreamingCounter(k, canonical=True,
                                       initial_capacity=1 << 12)
    for s in seqs:
        if len(s) >= k:
            sc.add_codes(_codes(s)[None])
    t = sc.finish()
    want = oracle.count_seqs(seqs, k)

    import jax.numpy as jnp

    from kat_tpu.core.kmers import words_for_k

    nw = words_for_k(k)
    assert nw == 3  # k=41 rides the 3-word path
    present = list(want.keys())[:50]
    absent = [(kk ^ 0x5A5A) for kk in present[:10]
              if (kk ^ 0x5A5A) not in want]
    queries = present + absent
    qw = [jnp.asarray([(q >> (32 * (nw - 1 - wi))) & 0xFFFFFFFF
                       for q in queries], jnp.uint32)
          for wi in range(nw)]
    got = np.asarray(wide.lookup_wide(t, tuple(qw)))
    for i, q in enumerate(present):
        assert got[i] == want[q]
    for i in range(len(present), len(queries)):
        assert got[i] == 0


def test_jf_round_trip_three_word(tmp_path, seqs):
    """.jf export/import at a 3-word k (odd word count zero-extends to
    64-bit key packing)."""
    k = 47
    sc = wide.WideCodeStreamingCounter(k, canonical=True,
                                       initial_capacity=1 << 12)
    for s in seqs:
        if len(s) >= k:
            sc.add_codes(_codes(s)[None])
    t = sc.finish()
    keys, counts = wide.table_to_numpy(t)
    want = oracle.count_seqs(seqs, k)
    assert dict(zip(keys, counts.tolist())) == dict(want)

    from kat_tpu.io import jellyfish

    p = tmp_path / "wide3.jf"
    jellyfish.write_jf(str(p), keys, counts, mer_len=k, canonical=True)
    hdr2, keys2, counts2 = jellyfish.read_jf(str(p))
    assert hdr2.mer_len == k
    assert dict(zip(keys2, counts2.tolist())) == dict(want)
