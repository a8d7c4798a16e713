"""k > 63 (6- and 8-word wide keys, k up to 127): oracle parity for
extraction/counting, lookup, revcomp/canonicalize, .jf round-trip and
sharded counting — VERDICT round-1 item 6 (reference mer_dna.hpp supports
unbounded k via word arrays)."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

import oracle
from kat_tpu.core import wide
from kat_tpu.core.kmers import (MAX_K_WIDE, canonicalize_words,
                                extract_kmers_wide, gc_count_words,
                                pack_string_words, reverse_complement_words,
                                words_for_k, words_to_int)
from kat_tpu.io import fastx, jellyfish


def _seqs(seed, n, lo, hi):
    rng = random.Random(seed)
    return ["".join(rng.choice("ACGTN" if rng.random() < 0.02 else "ACGT")
                    for _ in range(rng.randint(lo, hi)))
            for _ in range(n)]


def test_words_for_k_ranges():
    assert words_for_k(31) == 2
    # (31, 47]: 3-word path (2k <= 94 < 96 keeps the sentinel unique)
    assert words_for_k(32) == 3
    assert words_for_k(47) == 3
    assert words_for_k(48) == 4
    assert words_for_k(63) == 4
    # k=64 fills 128 bits exactly: a poly-T key would equal the sentinel
    # in 4 words, so 6 are used (one spare high bit guaranteed)
    assert words_for_k(64) == 6
    assert words_for_k(95) == 6
    assert words_for_k(96) == 8
    assert words_for_k(127) == 8
    # beyond 127: generic 2*(k//32+1) word path (mer_dna parity)
    assert words_for_k(128) == 10
    assert words_for_k(159) == 10
    assert words_for_k(163) == 12
    assert words_for_k(255) == 16
    with pytest.raises(ValueError):
        words_for_k(256)


@pytest.mark.parametrize("k", [64, 95, 127])
def test_counting_matches_oracle(k):
    seqs = _seqs(k, 16, k + 5, k + 200)
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    sc = wide.WideCodeStreamingCounter(k, True, initial_capacity=1 << 12,
                                       flush_batches=2)
    for b in fastx.encode_batches(iter(recs), k, target_codes=1 << 12):
        sc.add_codes(np.asarray(b))
    t = sc.finish()
    keys, counts = wide.table_to_numpy(t)
    want = oracle.count_seqs(seqs, k)
    assert dict(zip(keys, counts.tolist())) == dict(want)
    assert t.n_words == words_for_k(k)


@pytest.mark.parametrize("k", [64, 95, 127])
def test_revcomp_and_canonical_match_oracle(k):
    rng = random.Random(k * 3)
    for _ in range(20):
        s = "".join(rng.choice("ACGT") for _ in range(k))
        nw = words_for_k(k)
        wds = tuple(jnp.asarray([w], jnp.uint32)
                    for w in pack_string_words(s, nw))
        rc = reverse_complement_words(wds, k)
        got_rc = words_to_int([int(w[0]) for w in rc])
        v = oracle.pack(s)
        assert got_rc == oracle.revcomp(v, k)
        can = canonicalize_words(wds, k)
        got_can = words_to_int([int(w[0]) for w in can])
        assert got_can == min(v, oracle.revcomp(v, k))
        gc = int(gc_count_words(wds)[0])
        assert gc == oracle.gc_of_packed(v, k)


@pytest.mark.parametrize("k", [95, 127])
def test_lookup_wide(k):
    seqs = _seqs(k + 1, 10, k + 10, k + 120)
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    sc = wide.WideCodeStreamingCounter(k, True, initial_capacity=1 << 11,
                                       flush_batches=2)
    for b in fastx.encode_batches(iter(recs), k, target_codes=1 << 12):
        sc.add_codes(np.asarray(b))
    t = sc.finish()
    keys, counts = wide.table_to_numpy(t)
    nw = words_for_k(k)
    some = keys[::3][:20]
    q = wide.ints_to_words(some, nw)
    got = wide.lookup_wide(t, tuple(jnp.asarray(q[:, i])
                                    for i in range(nw)))
    want = [dict(zip(keys, counts.tolist()))[x] for x in some]
    assert np.asarray(got).tolist() == want
    # absent key -> 0
    absent = wide.ints_to_words([(1 << (2 * k)) - 5], nw)
    g0 = wide.lookup_wide(t, tuple(jnp.asarray(absent[:, i])
                                   for i in range(nw)))
    dd = dict(zip(keys, counts.tolist()))
    assert int(np.asarray(g0)[0]) == dd.get((1 << (2 * k)) - 5, 0)


@pytest.mark.parametrize("k", [95, 127])
def test_jf_roundtrip(k, tmp_path):
    seqs = _seqs(k + 2, 8, k + 5, k + 90)
    want = oracle.count_seqs(seqs, k)
    keys = list(want.keys())
    counts = np.asarray(list(want.values()), np.uint32)
    p = str(tmp_path / f"t.jf{k}")
    jellyfish.write_jf(p, keys, counts, k, True)
    hdr, rkeys, rcounts = jellyfish.read_jf(p)
    assert hdr.mer_len == k
    assert dict(zip(rkeys, rcounts.tolist())) == dict(want)


def test_sharded_counting_k127():
    from kat_tpu.parallel.sharded import ShardedCounter, make_mesh

    k = 127
    seqs = _seqs(5, 12, k + 10, k + 150)
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    mesh = make_mesh(8)
    sc = ShardedCounter(mesh, k=k, canonical=True, shard_capacity=1 << 11,
                        route_slack=8.0)
    for b in fastx.encode_batches(iter(recs), k, target_codes=1 << 12):
        sc.add_codes(b)
    t = sc.finish()
    keys, counts = wide.table_to_numpy(t)
    want = oracle.count_seqs(seqs, k)
    assert dict(zip(keys, counts.tolist())) == dict(want)


def test_max_k_rejected():
    with pytest.raises(ValueError):
        extract_kmers_wide(jnp.zeros((1, 300), jnp.uint8), MAX_K_WIDE + 1)


@pytest.mark.parametrize("k", [128, 163])
def test_counting_matches_oracle_past_127(k):
    """VERDICT r2 item 8: k beyond the old 127 cap (10/12-word keys)
    through extraction, streaming counting and the .jf round-trip."""
    seqs = _seqs(k * 7, 10, k + 5, k + 150)
    recs = [fastx.Record(f"s{i}", s.encode()) for i, s in enumerate(seqs)]
    sc = wide.WideCodeStreamingCounter(k, True, initial_capacity=1 << 11,
                                       flush_batches=2)
    for b in fastx.encode_batches(iter(recs), k, target_codes=1 << 12):
        sc.add_codes(np.asarray(b))
    t = sc.finish()
    keys, counts = wide.table_to_numpy(t)
    want = oracle.count_seqs(seqs, k)
    assert dict(zip(keys, counts.tolist())) == dict(want)
    assert t.n_words == words_for_k(k)


@pytest.mark.parametrize("k", [128, 163])
def test_extraction_property_past_127(k):
    rng = random.Random(k)
    s = "".join(rng.choice("ACGT") for _ in range(k + 40))
    from kat_tpu.core.kmers import encode_ascii
    codes = encode_ascii(np.frombuffer(s.encode(), np.uint8))[None]
    words, valid = extract_kmers_wide(jnp.asarray(codes), k, True)
    assert bool(valid.all())
    got = [words_to_int([int(w[0, i]) for w in words])
           for i in range(len(s) - k + 1)]
    want = oracle.kmers_of(s, k, canonical=True)
    assert got == want


def test_jf_roundtrip_past_127(tmp_path):
    k = 163
    seqs = _seqs(999, 6, k + 5, k + 80)
    hc = oracle.count_seqs(seqs, k)
    path = str(tmp_path / "wide.jf")
    jellyfish.write_jf(path, list(hc.keys()),
                       np.fromiter(hc.values(), np.uint32, len(hc)),
                       k, True)
    hdr, keys, counts = jellyfish.read_jf(path)
    assert hdr.mer_len == k
    assert dict(zip(keys, np.asarray(counts).tolist())) == dict(hc)
