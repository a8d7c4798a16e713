"""Per-base k-mer coverage lookups: the device kernel behind sect/cold and
filter seq (reference src/sect.cc:490-602 processSeq, src/cold.cc:303-407,
src/filter_sequence.cc:330-368 getProfile).

The reference walks each sequence base-by-base, building a mer_dna per
window and probing the shared hash (sect.cc:527-541).  Here a whole batch of
sequence chunks becomes one [rows, W] window extraction + vectorized
binary-search gather against the sorted count table.  Generic over narrow
(k <= 31) and wide (k <= 63) tables via core/tables.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import tables


@functools.partial(jax.jit, static_argnames=("k", "canonical"))
def window_hit_counts(table, codes: jax.Array, k: int, canonical: bool):
    """Per-row (valid windows with count>0, valid windows) — the
    device-reduced form of `window_counts` for consumers that only need
    per-record hit ratios (filter seq, src/filter_sequence.cc:330-368).
    Fetching two [rows] vectors instead of [rows, W] count planes keeps
    host<->device traffic off the profile loop."""
    counts, _gc, valid = window_counts(table, codes, k, canonical)
    hits = jnp.sum(((counts > 0) & valid).astype(jnp.int32), axis=-1)
    nwin = jnp.sum(valid.astype(jnp.int32), axis=-1)
    return hits, nwin


@functools.partial(jax.jit, static_argnames=("k", "canonical"))
def window_counts(table, codes: jax.Array, k: int, canonical: bool):
    """Counts + GC per window of each row.

    Returns (counts [.., W] uint32 — 0 for invalid windows,
             gc [.., W] int32 — -1 for invalid windows (sect.cc:530),
             valid [.., W] bool).
    Queries are canonicalized when the hash was counted canonically
    (JellyfishHelper::getCount semantics, jellyfish_helper.cc:189-194).
    """
    words, valid = tables.extract(codes, k, canonical=False)
    q = tables.canonicalize(words, k) if canonical else words
    counts = tables.lookup(table, q)
    counts = jnp.where(valid, counts, 0)
    gc = jnp.where(valid, tables.gc_count(words).astype(jnp.int32), -1)
    return counts, gc, valid
