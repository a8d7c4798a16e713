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
