"""Uniform operations over narrow (CountTable, k<=31) and wide (WideTable,
k<=63) count tables, so tool engines stay single-source."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import counting, kmers, wide


def is_wide(table) -> bool:
    return isinstance(table, wide.WideTable)


def key_words(table):
    """Big-first uint32 word tuple of the table's keys."""
    if is_wide(table):
        return table.words
    return (table.keys_hi, table.keys_lo)


def real_mask(table) -> jax.Array:
    """True for slots holding a real key (non-sentinel)."""
    m = None
    for w in key_words(table):
        s = w != kmers.SENTINEL
        m = s if m is None else (m | s)
    return m


def lookup(table, qwords) -> jax.Array:
    """Counts for query keys given as a word tuple matching the table."""
    if is_wide(table):
        return wide.lookup_wide(table, qwords)
    return counting.lookup(table, qwords[0], qwords[1])


def canonicalize(qwords, k: int):
    """min(key, revcomp) over a word tuple (sentinel-preserving)."""
    if len(qwords) == 2:
        return kmers.canonicalize(qwords[0], qwords[1], k)
    return kmers.canonicalize_words(qwords, k)


def gc_count(qwords) -> jax.Array:
    if len(qwords) == 2:
        return kmers.gc_count(qwords[0], qwords[1])
    return kmers.gc_count_words(qwords)


def extract(codes, k: int, canonical: bool):
    """(words, valid) for any supported k."""
    if k <= kmers.MAX_K:
        hi, lo, valid = kmers.extract_kmers(codes, k, canonical)
        return (hi, lo), valid
    words, valid = kmers.extract_kmers_wide(codes, k, canonical)
    return words, valid


def counts_array(table) -> jax.Array:
    return table.counts


def gc_of_keys(table) -> jax.Array:
    """GC count per table slot (garbage at sentinel slots; mask with
    real_mask)."""
    return gc_count(key_words(table))


def n_unique(table) -> jax.Array:
    return table.n_unique


def where_real(table, values, fill=0):
    return jnp.where(real_mask(table), values, fill)
