"""Uniform operations over narrow (CountTable, k<=31) and wide (WideTable,
k<=63) count tables, so tool engines stay single-source."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

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


def _join_policy(m: int, cap: int, n_words: int) -> bool:
    """Route a bulk lookup through the sort-merge join (ops/join.py)?

    The join's streaming passes cost ~O(cap + m); the binary search costs
    ~log2(cap) x 2 random gathers PER query (hundreds of ns each on TPU,
    docs/PERFORMANCE.md).  The join wins once the query batch is within a
    couple orders of magnitude of the table, and only the Pallas-kernel
    backends make its sorts fast — so: kernels on AND m large enough.
    KAT_TPU_JOIN=0 forces the binary search, =1 forces the join.

    Safety override on both paths: with kernels DISABLED the join falls
    back to variadic lax.sort with n_words+1 operands, and a TPU backend
    compiles variadic sorts past 8 operands pathologically (minutes;
    CLAUDE.md) — so wide keys + no kernels + a TPU backend always use
    the binary search, even when the env forces the join.
    """
    env = os.environ.get("KAT_TPU_JOIN")
    if env == "0":
        return False
    if (not counting.kernels_enabled() and n_words + 1 > 8
            and jax.default_backend() in ("tpu", "axon")):
        return False
    if env == "1":
        return True
    if not counting.kernels_enabled():
        return False
    min_m = int(os.environ.get("KAT_TPU_JOIN_MIN", str(1 << 16)))
    return m >= max(min_m, cap // 256)


def lookup(table, qwords, assume_sorted: bool = False) -> jax.Array:
    """Counts for query keys given as a word tuple matching the table.

    Bulk queries on kernel-capable backends go through the sort-merge
    join (streaming passes, ops/join.py); small batches and plain-XLA
    backends use the vectorized binary search.

    assume_sorted=True promises the flattened queries are already in
    ascending key order (e.g. they are another sorted table's keys) —
    the join then skips its query-sort and un-permute passes.  Ignored
    by the binary-search path, which is order-independent.
    """
    m = int(np.prod(qwords[0].shape)) if qwords[0].ndim else 1
    if _join_policy(m, table.counts.shape[0], len(qwords)):
        from ..ops.join import counts_join

        return counts_join(
            key_words(table), table.counts, tuple(qwords),
            use_kernel=counting.kernels_enabled(),
            interpret=counting._kernel_interpret(),
            queries_sorted=assume_sorted)
    if is_wide(table):
        return wide.lookup_wide(table, qwords)
    return counting.lookup(table, qwords[0], qwords[1])


def lookup_dual(t_a, t_b):
    """Counts of each table's keys in the OTHER table through one merge
    (ops/join.counts_join_dual) — comp's pass-1/2 cross probes fused.

    Returns (b_counts_for_a_keys, a_counts_for_b_keys) aligned with each
    table's capacity, or None when the join policy would not engage for
    either direction (callers fall back to two independent lookups)."""
    cap_a = t_a.counts.shape[0]
    cap_b = t_b.counts.shape[0]
    n_words = len(key_words(t_a))
    if not (_join_policy(cap_a, cap_b, n_words)
            and _join_policy(cap_b, cap_a, n_words)):
        return None
    from ..ops.join import counts_join_dual

    return counts_join_dual(
        key_words(t_a), t_a.counts, key_words(t_b), t_b.counts,
        use_kernel=counting.kernels_enabled(),
        interpret=counting._kernel_interpret())


def compact(table, min_capacity: int = 1 << 17):
    """Host-side shrink of a FINISHED table to the smallest pow2 capacity
    holding its real entries (sorted layout: real rows are a prefix).

    The analysis phase pays O(capacity) streaming work per bulk lookup,
    so probing a table whose capacity doubled past its final fill wastes
    up to 2x; tools call this once before their lookup loops."""
    n = int(table.n_unique)
    cap = table.counts.shape[0]
    tgt = max(min_capacity, 1 << max(0, int(np.ceil(np.log2(max(n, 1))))))
    if tgt >= cap:
        return table
    if is_wide(table):
        return wide.WideTable(tuple(w[:tgt] for w in table.words),
                              table.counts[:tgt], table.n_unique)
    return counting.CountTable(table.keys_hi[:tgt], table.keys_lo[:tgt],
                               table.counts[:tgt], table.n_unique)


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
