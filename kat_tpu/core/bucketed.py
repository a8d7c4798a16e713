"""Minimizer-bucketed streaming counter: the chunked counting flush.

The classic flush (counting.CodeStreamingCounter) pays a full 2^26
bitonic sort per flush — 351 compare-exchange rounds, the measured
roofline wall (docs/PERFORMANCE.md).  Here the native supermer router
(io/native.SupermerRouter + native/fastxio.cpp) delivers each flush
pre-grouped into minimizer-hash buckets that are a PREFIX of the
transformed key order (core/minimizer.py), so the device:

  1. expands supermer records to per-window transformed keys
     (minimizer.expand_records — pure VPU ops, no gathers),
  2. sorts each chunk independently in ONE window-kernel HBM pass with
     phases capped at the chunk size (ops/sort_kernel.bitonic_sort_chunks),
  3. merges the few hot-bucket chunk groups the router reports
     (bitonic_merge_runs on a dynamic slice),
  4. reduces the whole chunk stream in one streaming pass — interior
     sentinel gaps between chunks are legal for reduce_compact_sorted
     (sentinel runs are never emitted) and all copies of one k-mer land
     in one bucket, so this collapses the ~coverage-fold multiplicity
     BEFORE the table merge,
  5. bitonic-merges the reduced fresh uniques with the resident table
     (itself kept in key'-space) and reduces again.

finish() decodes the table back to plain canonical keys and re-sorts
once, returning a standard counting.CountTable — nothing downstream
(analysis, lookups, export) sees key'-space.

Reference role: replaces the same jellyfish hash fill as the classic
flush (deps/jellyfish-2.2.0/include/jellyfish/hash_counter.hpp), via the
KMC2 signature-partition idea (PAPERS.md) recast for fixed TPU shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .counting import (CountTable, TableFullError, _kernel_interpret,
                       empty_table, kernels_enabled)
from .kmers import SENTINEL
from . import minimizer


def _pad_table(t: CountTable, capacity: int):
    pad = capacity - t.keys_hi.shape[0]
    if pad <= 0:
        return t.keys_hi, t.keys_lo, t.counts, t.n_unique
    s = jnp.full((pad,), SENTINEL, jnp.uint32)
    return (jnp.concatenate([t.keys_hi, s]),
            jnp.concatenate([t.keys_lo, s]),
            jnp.concatenate([t.counts, jnp.zeros((pad,), jnp.uint32)]),
            t.n_unique)


def _as_planes(chunks: np.ndarray):
    rhi = (chunks >> np.uint64(32)).astype(np.uint32)
    rlo = (chunks & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return rhi, rlo


@functools.partial(jax.jit, static_argnames=("g", "chunk_slots",
                                             "interpret"))
def _merge_group(hi, lo, start_chunk, g: int, chunk_slots: int,
                 interpret: bool):
    """Merge an aligned group of g sorted chunk-runs (one hot bucket)
    in place within the flat sorted stream."""
    from ..ops.sort_kernel import bitonic_merge_runs

    n = g * chunk_slots
    off = start_chunk * chunk_slots
    sl = [jax.lax.dynamic_slice(p, (off,), (n,)) for p in (hi, lo)]
    mh, ml = bitonic_merge_runs(tuple(sl), 2, chunk_slots,
                                interpret=interpret)
    hi = jax.lax.dynamic_update_slice(hi, mh, (off,))
    lo = jax.lax.dynamic_update_slice(lo, ml, (off,))
    return hi, lo


class BucketedCodeCounter:
    """Streaming counter over routed supermer chunk flushes.

    Feed with add_flush(chunks, groups) using the router's output shape
    [max_chunks, rec_per_chunk] (pad short flushes with zero records);
    finish() returns a standard key-space CountTable.
    """

    def __init__(self, k: int, m: int = minimizer.M_DEFAULT,
                 initial_capacity: int = 1 << 20,
                 max_capacity: int = 1 << 30,
                 disable_grow: bool = False):
        if not minimizer.supports(k, m):
            raise ValueError(f"bucketed counter unsupported for k={k}, "
                             f"m={m} (needs m < k <= m+16)")
        self.k = k
        self.m = m
        self.capacity = int(initial_capacity)
        self.max_capacity = int(max_capacity)
        self.disable_grow = disable_grow
        self.table = empty_table(self.capacity)  # KEY'-SPACE keys
        self._fns: dict = {}
        self._unchecked: tuple | None = None
        # deferred-runs mode: accumulate N pre-reduced fresh runs and
        # merge them into the table every N flushes (the table merge is
        # the residual per-flush overhead once flushes are large)
        self.runs_mode = int(os.environ.get("KAT_TPU_BUCKETED_RUNS",
                                            "0"))
        self._runs: list = []

    # -- flush program -----------------------------------------------------

    def _stage_a(self, n_chunks: int, rec_per_chunk: int):
        key = ("a", n_chunks, rec_per_chunk)
        if key not in self._fns:
            from ..ops.sort_kernel import bitonic_sort_chunks

            k, m = self.k, self.m
            S = minimizer.rec_windows(k)
            chunk_slots = rec_per_chunk * S
            interp = _kernel_interpret()

            @jax.jit
            def stage_a(rhi, rlo):
                # window-major expansion on the [chunks, records] tiling;
                # the swap to chunk-major slots is a cheap major-dim
                # block copy (minor dim unchanged)
                khi, klo, _valid = minimizer.expand_records(rhi, rlo, k,
                                                            m)
                khi = jnp.swapaxes(khi, 0, 1).reshape(-1)
                klo = jnp.swapaxes(klo, 0, 1).reshape(-1)
                return bitonic_sort_chunks(
                    (khi, klo), 2, chunk_slots, interpret=interp)

            self._fns[key] = stage_a
        return self._fns[key]

    def _stage_b(self, n_slots: int, cap: int):
        key = ("b", n_slots, cap)
        if key not in self._fns:
            from ..ops.merge_kernel import merge_sorted_kernel
            from ..ops.reduce_kernel import reduce_compact_sorted

            interp = _kernel_interpret()

            @jax.jit
            def stage_b(shi, slo, thi, tlo, tc):
                w = (~((shi == SENTINEL)
                       & (slo == SENTINEL))).astype(jnp.uint32)
                # chunk-local dedup: every copy of a k-mer shares a
                # bucket, so the reduced stream is the flush's distinct
                # keys — the table merge then runs at table scale, not
                # stream scale
                fh, fl, fc, fnu = reduce_compact_sorted(
                    (shi, slo), w, cap, interpret=interp)
                (mh, ml), (mc,) = merge_sorted_kernel(
                    (thi, tlo), (tc,), (fh, fl), (fc,),
                    interpret=interp)
                n_real = thi.shape[0] + fh.shape[0]
                out = reduce_compact_sorted(
                    (mh[:n_real], ml[:n_real]), mc[:n_real], cap,
                    interpret=interp)
                return (*out, fnu)

            self._fns[key] = stage_b
        return self._fns[key]

    def _fused_fn(self, n_chunks: int, rec_per_chunk: int, cap: int):
        """No-hot-groups flush as ONE jit (expand + chunked sort +
        chunk-local dedup reduce + table merge + reduce): a single
        dispatch per flush — over the dev tunnel each extra dispatch
        costs ~21ms, which is material at ~200ms/flush."""
        key = ("f", n_chunks, rec_per_chunk, cap)
        if key not in self._fns:
            from ..ops.merge_kernel import merge_sorted_kernel
            from ..ops.reduce_kernel import reduce_compact_sorted
            from ..ops.sort_kernel import bitonic_sort_chunks

            k, m = self.k, self.m
            S = minimizer.rec_windows(k)
            chunk_slots = rec_per_chunk * S
            interp = _kernel_interpret()

            @jax.jit
            def fused(rhi, rlo, thi, tlo, tc):
                khi, klo, _valid = minimizer.expand_records(rhi, rlo, k,
                                                            m)
                khi = jnp.swapaxes(khi, 0, 1).reshape(-1)
                klo = jnp.swapaxes(klo, 0, 1).reshape(-1)
                shi, slo = bitonic_sort_chunks(
                    (khi, klo), 2, chunk_slots, interpret=interp)
                w = (~((shi == SENTINEL)
                       & (slo == SENTINEL))).astype(jnp.uint32)
                fh, fl, fc, fnu = reduce_compact_sorted(
                    (shi, slo), w, cap, interpret=interp)
                (mh, ml), (mc,) = merge_sorted_kernel(
                    (thi, tlo), (tc,), (fh, fl), (fc,), interpret=interp)
                n_real = thi.shape[0] + fh.shape[0]
                out = reduce_compact_sorted(
                    (mh[:n_real], ml[:n_real]), mc[:n_real], cap,
                    interpret=interp)
                return (*out, fnu)

            self._fns[key] = fused
        return self._fns[key]

    def _run_flush(self, table: CountTable, rhi, rlo, groups,
                   n_chunks: int, rec_per_chunk: int):
        if not groups:
            f = self._fused_fn(n_chunks, rec_per_chunk, self.capacity)
            nhi, nlo, nc, n_unique, fnu = f(
                rhi, rlo, table.keys_hi, table.keys_lo, table.counts)
            return CountTable(nhi, nlo, nc, n_unique), fnu
        a = self._stage_a(n_chunks, rec_per_chunk)
        shi, slo = a(rhi, rlo)
        interp = _kernel_interpret()
        S = minimizer.rec_windows(self.k)
        chunk_slots = rec_per_chunk * S
        for start, lg in groups:
            shi, slo = _merge_group(shi, slo, jnp.int32(int(start)),
                                    1 << int(lg), chunk_slots, interp)
        b = self._stage_b(shi.shape[0], self.capacity)
        nhi, nlo, nc, n_unique, fnu = b(
            shi, slo, table.keys_hi, table.keys_lo, table.counts)
        return CountTable(nhi, nlo, nc, n_unique), fnu

    # -- deferred-runs mode (KAT_TPU_BUCKETED_RUNS > 0) --------------------

    def _run_only_fn(self, n_chunks: int, rec_per_chunk: int, cap: int):
        """Fresh-stream-only flush (expand + chunked sort + dedup
        reduce, NO table merge) — the deferred-runs mode's per-flush
        program: reduced runs are ~distinct-sized, so the table merge
        amortizes over KAT_TPU_BUCKETED_RUNS flushes in _consolidate."""
        key = ("r", n_chunks, rec_per_chunk, cap)
        if key not in self._fns:
            from ..ops.reduce_kernel import reduce_compact_sorted
            from ..ops.sort_kernel import bitonic_sort_chunks

            k, m = self.k, self.m
            S = minimizer.rec_windows(k)
            chunk_slots = rec_per_chunk * S
            interp = _kernel_interpret()

            @jax.jit
            def run_only(rhi, rlo):
                khi, klo, _valid = minimizer.expand_records(rhi, rlo, k,
                                                            m)
                khi = jnp.swapaxes(khi, 0, 1).reshape(-1)
                klo = jnp.swapaxes(klo, 0, 1).reshape(-1)
                shi, slo = bitonic_sort_chunks(
                    (khi, klo), 2, chunk_slots, interpret=interp)
                w = (~((shi == SENTINEL)
                       & (slo == SENTINEL))).astype(jnp.uint32)
                return reduce_compact_sorted((shi, slo), w, cap,
                                             interpret=interp)

            self._fns[key] = run_only
        return self._fns[key]

    def _reduce_only_fn(self, n_slots: int, cap: int):
        key = ("ro", n_slots, cap)
        if key not in self._fns:
            from ..ops.reduce_kernel import reduce_compact_sorted

            interp = _kernel_interpret()

            @jax.jit
            def reduce_only(shi, slo):
                w = (~((shi == SENTINEL)
                       & (slo == SENTINEL))).astype(jnp.uint32)
                return reduce_compact_sorted((shi, slo), w, cap,
                                             interpret=interp)

            self._fns[key] = reduce_only
        return self._fns[key]

    def _consol_fn(self, lens: tuple, cap: int):
        """Merge the resident table + R reduced runs: pad each to cap,
        bitonic-merge the runs (log2 phases), reduce once."""
        key = ("c", lens, cap)
        if key not in self._fns:
            from ..ops.reduce_kernel import reduce_compact_sorted
            from ..ops.sort_kernel import (bitonic_merge_runs,
                                           merge_runs_supported,
                                           sort_planes_padded)

            interp = _kernel_interpret()
            R = len(lens)
            Rp = 1 << max(0, int(np.ceil(np.log2(R))))
            supported = merge_runs_supported(Rp * cap, cap)

            @jax.jit
            def consol(*flat):
                his, los, cs = [], [], []
                for i in range(R):
                    h, l, c = flat[3 * i:3 * i + 3]
                    pad = cap - h.shape[0]
                    if pad:
                        h = jnp.concatenate(
                            [h, jnp.full((pad,), SENTINEL, jnp.uint32)])
                        l = jnp.concatenate(
                            [l, jnp.full((pad,), SENTINEL, jnp.uint32)])
                        c = jnp.concatenate(
                            [c, jnp.zeros((pad,), jnp.uint32)])
                    his.append(h)
                    los.append(l)
                    cs.append(c)
                for _ in range(Rp - R):  # pow2-pad with sentinel runs
                    his.append(jnp.full((cap,), SENTINEL, jnp.uint32))
                    los.append(jnp.full((cap,), SENTINEL, jnp.uint32))
                    cs.append(jnp.zeros((cap,), jnp.uint32))
                hi = jnp.concatenate(his)
                lo = jnp.concatenate(los)
                c = jnp.concatenate(cs)
                if supported:
                    mh, ml, mc = bitonic_merge_runs((hi, lo, c), 2, cap,
                                                    interpret=interp)
                else:
                    mh, ml, mc = sort_planes_padded((hi, lo, c), 2,
                                                    interpret=interp)
                return reduce_compact_sorted((mh, ml), mc, cap,
                                             interpret=interp)

            self._fns[key] = consol
        return self._fns[key]

    def _add_flush_runs(self, rhi, rlo, groups, n_chunks: int,
                        rec_per_chunk: int) -> None:
        interp = _kernel_interpret()
        S = minimizer.rec_windows(self.k)
        chunk_slots = rec_per_chunk * S
        while True:
            if groups:
                a = self._stage_a(n_chunks, rec_per_chunk)
                shi, slo = a(rhi, rlo)
                for start, lg in groups:
                    shi, slo = _merge_group(
                        shi, slo, jnp.int32(int(start)), 1 << int(lg),
                        chunk_slots, interp)
                out = self._reduce_only_fn(shi.shape[0],
                                           self.capacity)(shi, slo)
            else:
                out = self._run_only_fn(n_chunks, rec_per_chunk,
                                        self.capacity)(rhi, rlo)
            fh, fl, fc, fnu = out
            # run overflow is checked synchronously: one scalar fetch
            # per ~190M-window flush is noise, and it keeps the replay
            # protocol trivial (re-run THIS flush at doubled capacity)
            if int(fnu) <= self.capacity:
                break
            self._grow()
        self._runs.append((fh, fl, fc))
        if len(self._runs) >= self.runs_mode:
            self._consolidate()

    def _consolidate(self) -> None:
        if not self._runs:
            return
        runs = self._runs
        self._runs = []
        prev = self.table
        while True:
            arrays = [(prev.keys_hi, prev.keys_lo, prev.counts)]
            arrays += runs
            lens = tuple(a[0].shape[0] for a in arrays)
            flat = [x for a in arrays for x in a]
            out = self._consol_fn(lens, self.capacity)(*flat)
            if int(out[3]) <= self.capacity:
                break
            self._grow()
            prev = CountTable(*_pad_table(prev, self.capacity))
        self.table = CountTable(*out)

    # -- streaming protocol ------------------------------------------------

    def add_flush(self, chunks, groups) -> None:
        """One router flush: chunks [n_chunks, rec_per_chunk] u64 records
        (zero-padded), groups [(start_chunk, log2_chunks), ...].  chunks
        may also be a PRE-STAGED (rhi, rlo) device-array pair (bench
        staging)."""
        if isinstance(chunks, tuple):
            rhi, rlo = chunks
        else:
            rhi, rlo = _as_planes(np.ascontiguousarray(chunks))
            rhi = jax.device_put(rhi)
            rlo = jax.device_put(rlo)
        n_chunks, rec_per_chunk = rhi.shape
        groups = [(int(a), int(b)) for a, b in np.asarray(
            groups).reshape(-1, 2)] if len(groups) else []
        if self.runs_mode > 0:
            self._add_flush_runs(rhi, rlo, groups, n_chunks,
                                 rec_per_chunk)
            return
        self._check_overflow()
        prev = self.table
        self.table, fnu = self._run_flush(prev, rhi, rlo, groups,
                                          n_chunks, rec_per_chunk)
        # optimistic commit (same protocol as CodeStreamingCounter): the
        # overflow check defers one flush so the host never blocks on the
        # scalar mid-stream
        self._unchecked = (prev, rhi, rlo, groups, n_chunks,
                           rec_per_chunk, fnu)
        try:
            self.table.n_unique.copy_to_host_async()
        except AttributeError:
            pass

    def _grow(self) -> None:
        if self.disable_grow or self.capacity * 2 > self.max_capacity:
            raise TableFullError(
                f"Count table full at capacity {self.capacity}")
        self.capacity *= 2

    def _check_overflow(self) -> None:
        if self._unchecked is None:
            return
        prev, rhi, rlo, groups, n_chunks, rec_per_chunk, fnu = \
            self._unchecked
        self._unchecked = None
        while (int(self.table.n_unique) > self.capacity
               or int(fnu) > self.capacity):
            self._grow()
            from .counting import merge_tables

            prev = merge_tables(prev, empty_table(0),
                                capacity=self.capacity)
            self.table, fnu = self._run_flush(
                prev, rhi, rlo, groups, n_chunks, rec_per_chunk)

    def device_sync(self) -> int:
        return int(self.table.n_unique)

    def finish(self) -> CountTable:
        """Settle deferred work, decode key' -> canonical keys, re-sort
        ONCE, and return a standard-order CountTable."""
        self._check_overflow()
        self._consolidate()
        key = ("finish", self.capacity)
        if key not in self._fns:
            from ..ops.sort_kernel import sort_planes_padded

            k, m = self.k, self.m
            interp = _kernel_interpret()

            @jax.jit
            def fin(khi, klo, counts):
                dhi, dlo = minimizer.decode_keys(khi, klo, k, m)
                return sort_planes_padded((dhi, dlo, counts), 2,
                                          interpret=interp)

            self._fns[key] = fin
        dhi, dlo, dc = self._fns[key](
            self.table.keys_hi, self.table.keys_lo, self.table.counts)
        return CountTable(dhi, dlo, dc, self.table.n_unique)


def count_paths_bucketed(paths, k: int, m: int = minimizer.M_DEFAULT,
                         trim5=None,
                         max_chunks: int = 2048,
                         rec_per_chunk: int | None = None,
                         bucket_bits: int | None = None,
                         initial_capacity: int = 1 << 20,
                         max_capacity: int = 1 << 30,
                         disable_grow: bool = False) -> CountTable:
    """Count canonical k-mers of FASTX paths through the bucketed flush.

    Defaults give ~2^17-slot chunks and 2048-chunk (~268M-slot,
    ~190M-window) flushes — chip-swept optimum: per-flush table-merge
    and dispatch overheads amortize with flush size (672 chunks ->
    1.19x classic, 1024 -> 1.33x, 2048 -> 1.37x, 4096 COLLAPSES to
    0.45x under HBM pressure).  Chunk counts need not be pow2 (virtual
    blocks cover the tail window).  Tune with KAT_TPU_SMR_CHUNKS."""
    from ..io import native

    S = minimizer.rec_windows(k)
    if rec_per_chunk is None:
        slots_log = int(os.environ.get("KAT_TPU_SMR_SLOTS_LOG", "17"))
        rec_per_chunk = (1 << slots_log) // S
    if bucket_bits is None:
        # ~16 buckets per chunk: first-fit packing wastes ~half a bucket
        # per chunk boundary, so smaller buckets pack chunks tighter
        # (measured: 2048 buckets / 512 chunks -> 0.80 record fill, 8192
        # -> ~0.96)
        import math

        bucket_bits = min(14, max(6, int(math.log2(max_chunks * 16))))
    max_chunks = int(os.environ.get("KAT_TPU_SMR_CHUNKS", max_chunks))
    sc = BucketedCodeCounter(k, m, initial_capacity=initial_capacity,
                             max_capacity=max_capacity,
                             disable_grow=disable_grow)
    for chunks, groups, _nw in native.route_flushes(
            list(paths), k, m, bucket_bits, max_chunks, rec_per_chunk,
            trim5=trim5,
            threads=native.reader_threads_default(len(paths))):
        n = chunks.shape[0]
        # pad SHORT flushes (range-worker tails, EOF) to the next pow2
        # chunk count, not the full grid: the device sorts every padded
        # chunk, and log-many compiled shapes are cheap
        tgt = min(max_chunks, 1 << max(3, int(np.ceil(np.log2(n)))))
        if n < tgt:
            chunks = np.vstack([
                chunks, np.zeros((tgt - n, rec_per_chunk), np.uint64)])
        sc.add_flush(chunks, groups)
    return sc.finish()
