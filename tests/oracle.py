"""Trusted, slow, pure-Python k-mer oracle used to validate the JAX engine.

Implements exactly the semantics of jellyfish's mer_iterator + mer_dna
(canonical = min(fwd, revcomp), non-ACGT bases invalidate every window that
contains them) without any shared code with the device implementation.
"""

from __future__ import annotations

from collections import Counter

CODE = {"A": 0, "C": 1, "G": 2, "T": 3,
        "a": 0, "c": 1, "g": 2, "t": 3}


def pack(s: str) -> int | None:
    v = 0
    for ch in s:
        c = CODE.get(ch)
        if c is None:
            return None
        v = (v << 2) | c
    return v


def revcomp(v: int, k: int) -> int:
    r = 0
    for _ in range(k):
        r = (r << 2) | (3 - (v & 3))
        v >>= 2
    return r


def kmers_of(seq: str, k: int, canonical: bool = True) -> list[int]:
    out = []
    for i in range(len(seq) - k + 1):
        v = pack(seq[i:i + k])
        if v is None:
            continue
        if canonical:
            v = min(v, revcomp(v, k))
        out.append(v)
    return out


def count_seqs(seqs: list[str], k: int, canonical: bool = True) -> Counter:
    c: Counter = Counter()
    for s in seqs:
        if len(s) >= k:
            c.update(kmers_of(s, k, canonical))
    return c


def gc_of_packed(v: int, k: int) -> int:
    g = 0
    for _ in range(k):
        if (v & 3) in (1, 2):
            g += 1
        v >>= 2
    return g


# ---------------------------------------------------------------------------
# Minimizer-bucketed key transform oracle (core/minimizer.py spec), written
# against the SPEC with plain ints -- no shared code with the device path.
# The mix constants are part of the on-disk/on-wire spec, so they are the
# same numbers; everything else (extraction, scanning, packing) is
# independent.
# ---------------------------------------------------------------------------

MINI_A = 41474379
MINI_B = 56006713
_M26 = (1 << 26) - 1


def mix26_oracle(x: int) -> int:
    x ^= x >> 13
    x = (x * MINI_A) & _M26
    x ^= x >> 13
    x = (x * MINI_B) & _M26
    x ^= x >> 13
    return x


def minimizer_of(kmer: int, k: int, m: int) -> tuple[int, int, int]:
    """(min canonical m-mer value, leftmost position, strand) over a
    packed canonical k-mer; strand=1 iff the canonical m-mer at pos is
    the rc of the forward substring (m odd, so never equal)."""
    best, best_pos, best_strand = 1 << 62, 0, 0
    for j in range(k - m + 1):
        sub = (kmer >> (2 * (k - j - m))) & ((1 << (2 * m)) - 1)
        rc = revcomp(sub, m)
        c = min(sub, rc)
        if c < best:
            best, best_pos, best_strand = c, j, 1 if rc < sub else 0
    return best, best_pos, best_strand


def encode_keyp(kmer: int, k: int, m: int) -> int:
    """key' = [mix26(minimizer) | pos(5) | strand(1) | rest] per spec."""
    mv, pos, strand = minimizer_of(kmer, k, m)
    rb = 2 * (k - m)
    top = kmer >> (2 * (k - pos))          # bases [0, pos)
    bot_bits = 2 * (k - m - pos)
    bot = kmer & ((1 << bot_bits) - 1)     # bases [pos+m, k)
    rest = (top << bot_bits) | bot
    return (((((mix26_oracle(mv) << 5) | pos) << 1) | strand) << rb) | rest
