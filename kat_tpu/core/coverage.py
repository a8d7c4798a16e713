"""Per-base k-mer coverage lookups: the device kernel behind sect/cold and
filter seq (reference src/sect.cc:490-602 processSeq, src/cold.cc:303-407,
src/filter_sequence.cc:330-368 getProfile).

The reference walks each sequence base-by-base, building a mer_dna per
window and probing the shared hash (sect.cc:527-541).  Here a whole batch of
sequence chunks becomes one [rows, W] window extraction + vectorized
binary-search gather against the sorted count table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import kmers
from .counting import CountTable, lookup


@functools.partial(jax.jit, static_argnames=("k", "canonical"))
def window_counts(table: CountTable, codes: jax.Array, k: int,
                  canonical: bool):
    """Counts + GC per window of each row.

    Returns (counts [.., W] uint32 — 0 for invalid windows,
             gc [.., W] int32 — -1 for invalid windows (sect.cc:530),
             valid [.., W] bool).
    Queries are canonicalized when the hash was counted canonically
    (JellyfishHelper::getCount semantics, jellyfish_helper.cc:189-194).
    """
    hi, lo, valid = kmers.extract_kmers(codes, k, canonical=False)
    if canonical:
        qh, ql = kmers.canonicalize(hi, lo, k)
    else:
        qh, ql = hi, lo
    counts = lookup(table, qh, ql)
    counts = jnp.where(valid, counts, 0)
    gc = jnp.where(valid, kmers.gc_count(hi, lo).astype(jnp.int32), -1)
    return counts, gc, valid
