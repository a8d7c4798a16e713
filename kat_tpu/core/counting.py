"""Sort + segment-reduce k-mer counting: the TPU-native replacement for
jellyfish's lock-free CAS hash (reference:
deps/jellyfish-2.2.0/include/jellyfish/large_hash_array.hpp `add`/`claim_key`
and hash_counter.hpp `cooperative::hash_counter`).

Design: a count table is a *sorted* (by 64-bit key, as (hi, lo) uint32 pairs)
fixed-capacity array of unique keys plus uint32 counts.  Building it is a
`lax.sort` (num_keys=2, carries the weight operand) followed by a
segment-scatter; merging two tables (or a table and a fresh batch) is the same
op on the concatenation.  Deterministic, functional, static-shape — XLA maps
the sort onto fused vector compare/select networks and every other step is a
single scatter/gather pass.

Capacity policy: the reference doubles its hash cooperatively when full
(hash_counter.hpp:204-244); here the host wrapper doubles the static capacity
and re-runs the (cached-per-capacity) jitted merge when `n_unique` exceeds
capacity — same observable behaviour, no device-side mutation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import SENTINEL


class CountTable(NamedTuple):
    """Sorted unique-key count table.

    keys_hi/keys_lo: [capacity] uint32, ascending by (hi, lo); padding slots
      (beyond n_unique) hold the SENTINEL key.
    counts: [capacity] uint32, 0 in padding slots.
    n_unique: scalar int32 — number of real entries.
    """
    keys_hi: jax.Array
    keys_lo: jax.Array
    counts: jax.Array
    n_unique: jax.Array

    @property
    def capacity(self) -> int:
        return self.keys_hi.shape[0]


def empty_table(capacity: int) -> CountTable:
    return CountTable(
        keys_hi=jnp.full((capacity,), SENTINEL, jnp.uint32),
        keys_lo=jnp.full((capacity,), SENTINEL, jnp.uint32),
        counts=jnp.zeros((capacity,), jnp.uint32),
        n_unique=jnp.zeros((), jnp.int32),
    )


def _unique_reduce(hi, lo, w, out_size: int):
    """Sort flat (hi, lo, w) and reduce duplicate keys by summing weights.

    Returns a CountTable-shaped tuple of size `out_size`.  Sentinel keys sort
    last; their weights must be 0 so the (single) sentinel segment reduces to
    count 0 and is indistinguishable from padding.
    """
    hi_s, lo_s, w_s = jax.lax.sort((hi, lo, w), num_keys=2)
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
    ])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    ukeys_hi = jnp.full((out_size,), SENTINEL, jnp.uint32).at[seg].set(
        hi_s, mode="drop")
    ukeys_lo = jnp.full((out_size,), SENTINEL, jnp.uint32).at[seg].set(
        lo_s, mode="drop")
    counts = jnp.zeros((out_size,), jnp.uint32).at[seg].add(w_s, mode="drop")
    # Number of real (non-sentinel) unique keys: segments whose key is not
    # the sentinel.  The sentinel segment, if present, is the last one.
    has_sentinel = (hi_s[-1] == SENTINEL) & (lo_s[-1] == SENTINEL)
    n_seg = seg[-1] + 1
    n_unique = jnp.where(has_sentinel, n_seg - 1, n_seg).astype(jnp.int32)
    return ukeys_hi, ukeys_lo, counts, n_unique


@functools.partial(jax.jit, static_argnames=("out_size",))
def count_batch(hi: jax.Array, lo: jax.Array, valid: jax.Array,
                out_size: int | None = None) -> CountTable:
    """Count one batch of extracted k-mers into a fresh table.

    hi/lo/valid: any (matching) shape; flattened internally.  out_size
    defaults to the number of windows (worst case all-distinct).
    """
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    w = valid.reshape(-1).astype(jnp.uint32)
    out = out_size or hi.shape[0]
    return CountTable(*_unique_reduce(hi, lo, w, out))


@functools.partial(jax.jit, static_argnames=("capacity",))
def merge_tables(a: CountTable, b: CountTable,
                 capacity: int | None = None) -> CountTable:
    """Merge two count tables; output capacity defaults to capA + capB.

    The caller must check `n_unique <= capacity` afterwards (host-side grow
    policy lives in StreamingCounter).
    """
    cap = capacity or (a.capacity + b.capacity)
    hi = jnp.concatenate([a.keys_hi, b.keys_hi])
    lo = jnp.concatenate([a.keys_lo, b.keys_lo])
    w = jnp.concatenate([a.counts, b.counts])
    return CountTable(*_unique_reduce(hi, lo, w, cap))


@functools.partial(jax.jit, static_argnames=("capacity",))
def absorb_batch(table: CountTable, hi: jax.Array, lo: jax.Array,
                 valid: jax.Array, capacity: int) -> CountTable:
    """table <- table + one batch of raw k-mers, output capacity `capacity`."""
    bhi = hi.reshape(-1)
    blo = lo.reshape(-1)
    bw = valid.reshape(-1).astype(jnp.uint32)
    chi = jnp.concatenate([table.keys_hi, bhi])
    clo = jnp.concatenate([table.keys_lo, blo])
    cw = jnp.concatenate([table.counts, bw])
    return CountTable(*_unique_reduce(chi, clo, cw, capacity))


class TableFullError(RuntimeError):
    pass


class StreamingCounter:
    """Host-side streaming accumulator with capacity doubling.

    Mirrors the observable behaviour of jellyfish's cooperative resize
    (hash_counter.hpp:204-244): when a merge would exceed capacity, capacity
    doubles and the merge re-runs (allowed unless `disable_grow`).
    """

    def __init__(self, initial_capacity: int = 1 << 20,
                 max_capacity: int = 1 << 30, disable_grow: bool = False):
        self.capacity = int(initial_capacity)
        self.max_capacity = int(max_capacity)
        self.disable_grow = disable_grow
        self.table = empty_table(self.capacity)

    def _grow(self):
        if self.disable_grow or self.capacity * 2 > self.max_capacity:
            raise TableFullError(
                f"Count table full at capacity {self.capacity}")
        self.capacity *= 2
        self.table = merge_tables(self.table, empty_table(0),
                                  capacity=self.capacity)

    def add(self, hi, lo, valid):
        while True:
            new = absorb_batch(self.table, hi, lo, valid, self.capacity)
            n = int(new.n_unique)
            if n <= self.capacity:
                self.table = new
                return
            self._grow()

    def finish(self) -> CountTable:
        return self.table


# ---------------------------------------------------------------------------
# Lookup: vectorized lower-bound binary search over the sorted table.  This is
# the analogue of large_hash_array.hpp:404-476 `get_key_id` random probing,
# but as log2(capacity) dense gather rounds (TPU-friendly, no pointer chasing).
# ---------------------------------------------------------------------------

@jax.jit
def lookup(table: CountTable, qhi: jax.Array, qlo: jax.Array) -> jax.Array:
    """Counts for query keys (0 where absent). Shapes of qhi/qlo preserved."""
    shape = qhi.shape
    qh = qhi.reshape(-1)
    ql = qlo.reshape(-1)
    cap = table.capacity
    steps = int(np.ceil(np.log2(max(cap, 2)))) + 1

    lo_idx = jnp.zeros(qh.shape, jnp.int32)
    hi_idx = jnp.full(qh.shape, cap, jnp.int32)

    def body(_, carry):
        lo_i, hi_i = carry
        mid = (lo_i + hi_i) // 2
        mh = table.keys_hi[mid]
        ml = table.keys_lo[mid]
        less = (mh < qh) | ((mh == qh) & (ml < ql))
        return jnp.where(less, mid + 1, lo_i), jnp.where(less, hi_i, mid)

    lo_idx, hi_idx = jax.lax.fori_loop(0, steps, body, (lo_idx, hi_idx))
    pos = jnp.minimum(lo_idx, cap - 1)
    found = (table.keys_hi[pos] == qh) & (table.keys_lo[pos] == ql) & (
        lo_idx < cap)
    out = jnp.where(found, table.counts[pos], 0).astype(jnp.uint32)
    return out.reshape(shape)


def table_to_numpy(table: CountTable):
    """(keys u64, counts u32) as host numpy arrays, real entries only."""
    n = int(table.n_unique)
    hi = np.asarray(table.keys_hi[:n], np.uint64)
    lo = np.asarray(table.keys_lo[:n], np.uint64)
    counts = np.asarray(table.counts[:n], np.uint32)
    return (hi << np.uint64(32)) | lo, counts


def table_from_numpy(keys: np.ndarray, counts: np.ndarray,
                     capacity: int | None = None) -> CountTable:
    """Build a device table from host (u64 keys, counts); keys need not be
    sorted or unique (duplicates are summed)."""
    keys = np.asarray(keys, np.uint64)
    counts = np.asarray(counts, np.uint32)
    cap = capacity or max(1, len(keys))
    hi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    return CountTable(*_unique_reduce(
        hi, lo, jnp.asarray(counts), cap))
