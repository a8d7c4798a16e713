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
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import SENTINEL


@functools.cache
def kernels_enabled() -> bool:
    """Use Pallas TPU kernels for the post-sort reduce?  On by default on
    TPU-class backends; KAT_TPU_NO_KERNEL=1 disables, KAT_TPU_KERNEL=1
    forces interpret-mode kernels on CPU (slow; for debugging only)."""
    if os.environ.get("KAT_TPU_NO_KERNEL"):
        return False
    if os.environ.get("KAT_TPU_KERNEL"):
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def _kernel_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


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


def _segmented_cumsum(v: jax.Array, is_first: jax.Array) -> jax.Array:
    """Inclusive prefix sum restarting at each segment start.

    Hillis-Steele doubling with the segmented-scan operator
    (v, f) ⊕ rule: an element absorbs its left neighbour's partial sum only
    if no segment boundary lies between them.  log2(n) passes of pure
    elementwise ops — deliberately NOT jnp.cumsum/associative_scan, whose
    TPU lowerings compile pathologically for this use (see _unique_reduce).
    """
    n = v.shape[0]
    f = is_first
    d = 1
    while d < n:
        zv = jnp.zeros((d,), v.dtype)
        zf = jnp.ones((d,), jnp.bool_)  # out-of-range counts as boundary
        pv = jnp.concatenate([zv, v[:-d]])
        pf = jnp.concatenate([zf, f[:-d]])
        v = jnp.where(f, v, v + pv)
        f = f | pf
        d *= 2
    return v


def _unique_reduce(hi, lo, w, out_size: int, use_kernel: bool | None = None):
    """Sort flat (hi, lo, w) and reduce duplicate keys by summing weights.

    Returns a CountTable-shaped tuple of size `out_size`.  Sentinel keys sort
    last; their weights must be 0 so they are indistinguishable from padding.

    Scatter-free formulation: on TPU a random scatter costs more than a full
    sort pass (~180ms vs ~90ms at 16M elements on v5e), so instead of
    scatter-adding per-segment sums we compute run totals with a segmented
    prefix scan and *compact* the run-last entries to the front with a
    second sort whose key is the element key for run-lasts and the sentinel
    for everything else (stable, so key order is preserved).  Net: 2 sorts
    + 1 scan, zero scatters/gathers.  The scan is a hand-rolled
    Hillis-Steele loop in uint32 because XLA's built-in cumsum /
    associative_scan on 64-bit operands compile pathologically slowly for
    TPU (minutes at 1M elements via the remote compiler).
    """
    n = hi.shape[0]
    hi_s, lo_s, w_s = jax.lax.sort((hi, lo, w), num_keys=2)

    if use_kernel is None:
        use_kernel = kernels_enabled()
    if use_kernel:
        from ..ops.reduce_kernel import reduce_compact_sorted

        return reduce_compact_sorted((hi_s, lo_s), w_s, out_size,
                                     interpret=_kernel_interpret())

    nxt_same = (hi_s[:-1] == hi_s[1:]) & (lo_s[:-1] == lo_s[1:])
    is_last = jnp.concatenate([~nxt_same, jnp.ones((1,), jnp.bool_)])
    is_first = jnp.concatenate([jnp.ones((1,), jnp.bool_), ~nxt_same])

    run_total = _segmented_cumsum(w_s.astype(jnp.uint32), is_first)

    real = ~((hi_s == SENTINEL) & (lo_s == SENTINEL))
    keep = is_last & real
    chi = jnp.where(keep, hi_s, SENTINEL)
    clo = jnp.where(keep, lo_s, SENTINEL)
    cw = jnp.where(keep, run_total, 0).astype(jnp.uint32)

    chi, clo, cw = jax.lax.sort((chi, clo, cw), num_keys=2)
    n_unique = jnp.sum(keep.astype(jnp.int32))

    if out_size == n:
        return chi, clo, cw, n_unique
    if out_size < n:
        return chi[:out_size], clo[:out_size], cw[:out_size], n_unique
    pad = out_size - n
    return (jnp.concatenate([chi, jnp.full((pad,), SENTINEL, jnp.uint32)]),
            jnp.concatenate([clo, jnp.full((pad,), SENTINEL, jnp.uint32)]),
            jnp.concatenate([cw, jnp.zeros((pad,), jnp.uint32)]),
            n_unique)


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


class CodeStreamingCounter:
    """Streaming counter over raw 2-bit code batches with a fully fused
    flush: window extraction + canonical pack + sort + segmented reduce run
    as ONE jitted program per ~16 batches.

    Compared to StreamingCounter (which extracts per batch), this removes
    per-batch dispatch latency — significant over remote device transports
    — and lets XLA fuse extraction into the sort's first pass.  Batches
    must share one [rows, length] shape (the native reader emits uniform
    batches); the stack is padded to the next power-of-two batch count so
    compiled shapes stay few.

    INVARIANT: `.table` is only guaranteed valid after `finish()` (or
    `current_table()`).  Between flushes the overflow check of the LAST
    flush is deliberately deferred (optimistic commit, see `_flush`), so
    mid-stream `.table` may be silently truncated if that flush
    overflowed capacity; `current_table()` is the checked accessor for
    mid-stream readers.
    """

    def __init__(self, k: int, canonical: bool = True,
                 initial_capacity: int = 1 << 20,
                 max_capacity: int = 1 << 30, disable_grow: bool = False,
                 flush_batches: int = 16, lsm_runs: int | None = None,
                 flush_windows: int | None = None):
        self.k = k
        self.canonical = canonical
        self.capacity = int(initial_capacity)
        self.max_capacity = int(max_capacity)
        self.disable_grow = disable_grow
        self.flush_batches = int(flush_batches)
        # Windows-based flush sizing: when set (ideally a power of two,
        # e.g. 1<<26), the per-shape batch budget becomes
        # flush_windows // windows_per_batch, so the flush fills its
        # padded pow2 sort geometry to >= 1 - w/flush_windows regardless
        # of the reader's batch shape (a fixed batch COUNT can waste up
        # to ~2x sort bandwidth on sentinel padding).
        self.flush_windows = (int(flush_windows) if flush_windows
                              else None)
        self._fb_eff = self.flush_batches
        if lsm_runs is None:
            env = os.environ.get("KAT_TPU_LSM_RUNS")
            if env is not None:
                lsm_runs = int(env)
            else:
                # Chip-measured A/B (TPU_VALIDATION_r03): deferring the
                # table merge into a 4-run consolidation is a net LOSS
                # (197.7M vs 213.7M kmers/s at lsm_runs=0) — the pow2
                # consolidation sort over 4x the flush length costs more
                # than the per-flush merge+reduce it replaces.  Default
                # off; KAT_TPU_LSM_RUNS re-enables for experiments.
                lsm_runs = 0
        self.lsm_runs = int(lsm_runs)
        self.table = empty_table(self.capacity)
        self._codes: list = []
        self._shape: tuple | None = None
        self._flush_fns: dict = {}
        # Deferred overflow check: (pre-flush table, stack, target_b, rows,
        # length) of the one flush whose n_unique has not been fetched yet.
        self._unchecked: tuple | None = None
        # LSM mode: sorted per-flush runs pending consolidation, each a
        # (hi, lo, counts, n_unique, replay_stack_info) tuple
        self._runs: list = []
        self._run_fns: dict = {}
        self._consol_fns: dict = {}
        # inputs of the last consolidation, kept until its n_unique has
        # been fetched (growth replay)
        self._consol_unchecked: tuple | None = None

    def add_codes(self, codes) -> None:
        if not isinstance(codes, jax.Array):
            codes = np.asarray(codes, np.uint8)
        if codes.ndim != 2:
            raise ValueError("expected [rows, length] code batch")
        if self._shape is not None and codes.shape[1] != self._shape[1]:
            self._flush()
        if self._shape is None or codes.shape[0] != self._shape[0]:
            # Row-pad to the first batch's row count (255 = invalid code).
            if self._shape is not None:
                rows = self._shape[0]
                if codes.shape[0] > rows:
                    self._flush()
                    self._set_shape(codes.shape)
                else:
                    codes = jnp.concatenate([
                        jnp.asarray(codes),
                        jnp.full((rows - codes.shape[0], codes.shape[1]),
                                 255, jnp.uint8)])
            else:
                self._set_shape(codes.shape)
        self._codes.append(jax.device_put(codes))
        if len(self._codes) >= self._fb_eff:
            self._flush()

    def _set_shape(self, shape) -> None:
        """Adopt a new slab geometry and recompute the flush budget for
        it.  EVERY shape change must come through here: the budget is
        slabs-per-flush, so carrying a budget computed for a small first
        slab (parallel range readers often yield a short batch first)
        onto full-size slabs would stack flush_windows x (old/new slab
        ratio) of HBM into one flush — a 25GB OOM in the wild."""
        self._shape = shape
        if self.flush_windows:
            w = shape[0] * (shape[1] - self.k + 1)
            self._fb_eff = max(1, self.flush_windows // max(w, 1))
        else:
            self._fb_eff = self.flush_batches

    def _flush_fn(self, b: int, rows: int, length: int, cap: int):
        key = (b, rows, length, cap)
        if key not in self._flush_fns:
            from .kmers import extract_kmers

            k = self.k
            canonical = self.canonical

            if kernels_enabled():
                # Kernel flush: the resident table is always sorted, so
                # only the fresh windows go through lax.sort (keys only —
                # fresh weights are implicitly 1, sentinels 0).  The table
                # joins via the memory-bounded Pallas bitonic merge
                # (ops/merge_kernel.py; the XLA formulation OOMs because
                # buffer assignment materializes every stage), and the
                # streaming reduce kernel compacts in one pass.
                from ..ops.merge_kernel import merge_sorted_kernel
                from ..ops.reduce_kernel import reduce_compact_sorted
                from ..ops.sort_kernel import sort_planes_padded

                interp = _kernel_interpret()
                use_sort_kernel = not os.environ.get(
                    "KAT_TPU_NO_SORT_KERNEL")

                @jax.jit
                def fused(thi, tlo, tc, codes):
                    hi, lo, _valid = extract_kmers(
                        codes.reshape(-1, length), k, canonical)
                    if use_sort_kernel:
                        # Pallas bitonic full sort: bandwidth-bound passes
                        # instead of lax.sort's ~4.3 ns/elt comparator
                        # network (the dominant flush cost).
                        fhi, flo = sort_planes_padded(
                            (hi.reshape(-1), lo.reshape(-1)), 2,
                            interpret=interp)
                    else:
                        fhi, flo = jax.lax.sort(
                            (hi.reshape(-1), lo.reshape(-1)), num_keys=2)
                    fw = (~((fhi == SENTINEL)
                            & (flo == SENTINEL))).astype(jnp.uint32)
                    (mhi, mlo), (mw,) = merge_sorted_kernel(
                        (thi, tlo), (tc,), (fhi, flo), (fw,),
                        interpret=interp)
                    # beyond table+windows the merged stream is all
                    # sentinel padding — don't feed it to the kernel
                    n_real = thi.shape[0] + fhi.shape[0]
                    return reduce_compact_sorted(
                        (mhi[:n_real], mlo[:n_real]), mw[:n_real], cap,
                        interpret=interp)
            else:

                @jax.jit
                def fused(thi, tlo, tc, codes):
                    hi, lo, valid = extract_kmers(
                        codes.reshape(-1, length), k, canonical)
                    chi = jnp.concatenate([thi, hi.reshape(-1)])
                    clo = jnp.concatenate([tlo, lo.reshape(-1)])
                    cw = jnp.concatenate(
                        [tc, valid.reshape(-1).astype(jnp.uint32)])
                    return _unique_reduce(chi, clo, cw, cap)

            self._flush_fns[key] = fused
        return self._flush_fns[key]

    def _run_fn(self, b: int, rows: int, length: int, cap: int):
        """LSM mode: extract + sort + reduce of the fresh windows ONLY —
        the resident table is NOT touched per flush (its merge is
        amortized over lsm_runs flushes by _consolidate)."""
        key = (b, rows, length, cap)
        if key not in self._run_fns:
            from ..ops.reduce_kernel import reduce_compact_sorted
            from ..ops.sort_kernel import sort_planes_padded
            from .kmers import extract_kmers

            k = self.k
            canonical = self.canonical
            interp = _kernel_interpret()
            use_sort_kernel = not os.environ.get("KAT_TPU_NO_SORT_KERNEL")

            @jax.jit
            def run(codes):
                hi, lo, _valid = extract_kmers(
                    codes.reshape(-1, length), k, canonical)
                if use_sort_kernel:
                    fhi, flo = sort_planes_padded(
                        (hi.reshape(-1), lo.reshape(-1)), 2,
                        interpret=interp)
                else:
                    fhi, flo = jax.lax.sort(
                        (hi.reshape(-1), lo.reshape(-1)), num_keys=2)
                fw = (~((fhi == SENTINEL)
                        & (flo == SENTINEL))).astype(jnp.uint32)
                return reduce_compact_sorted((fhi, flo), fw, cap,
                                             interpret=interp)

            self._run_fns[key] = run
        return self._run_fns[key]

    def _merge_runs(self, table: CountTable, runs: list,
                    cap: int) -> CountTable:
        """Consolidate the resident table + pending sorted runs into one
        table: every input is a sorted sentinel-padded (keys, counts)
        array, so the whole merge is log2(R) bitonic phases
        (ops/sort_kernel.bitonic_merge_runs with the counts riding as
        payload) + one streaming reduce — instead of one merge+reduce
        per flush (the ~60ms/flush the round-2 decomposition charged to
        the table join)."""
        arrays = [(table.keys_hi, table.keys_lo, table.counts)]
        arrays += [(r[0], r[1], r[2]) for r in runs]
        lens = tuple(a[0].shape[0] for a in arrays)
        key = (lens, cap)
        if key not in self._consol_fns:
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

            self._consol_fns[key] = consol
        flat = [a for r in arrays for a in r]
        return CountTable(*self._consol_fns[key](*flat))

    def _flush(self) -> None:
        if not self._codes:
            return
        rows, length = self._shape
        b = len(self._codes)
        # Steady-state flushes (b == the effective batch budget) keep
        # their exact batch count — one standing compiled shape, and a
        # budget chosen so the window count lands just under a power of
        # two wastes no sort/merge bandwidth.  Only the final partial
        # flush pads to a power of two (log-many residual shapes).
        if b == self._fb_eff:
            target_b = b
        else:
            target_b = min(1 << max(0, int(np.ceil(np.log2(b)))),
                           self._fb_eff)
        pad = [jnp.full((rows, length), 255, jnp.uint8)] * (target_b - b)
        stack = jnp.stack(self._codes + pad)
        self._codes = []
        self._shape = None
        self._check_overflow()
        if self.lsm_runs > 0 and kernels_enabled():
            fn = self._run_fn(target_b, rows, length, self.capacity)
            rhi, rlo, rc, r_nu = fn(stack)
            self._runs.append((rhi, rlo, rc, r_nu))
            # Optimistic commit (see below): the run's overflow check is
            # deferred one flush; the replay stack is kept until then.
            self._unchecked = ("run", stack, target_b, rows, length)
            try:
                r_nu.copy_to_host_async()
            except AttributeError:
                pass
            if len(self._runs) >= self.lsm_runs:
                self._consolidate()
            return
        fn = self._flush_fn(target_b, rows, length, self.capacity)
        nhi, nlo, nc, n_unique = fn(
            self.table.keys_hi, self.table.keys_lo, self.table.counts,
            stack)
        # Optimistic commit: fetching n_unique here would idle the device
        # for a full dispatch round-trip per flush (the host can't run
        # ahead while it blocks on the scalar).  The overflow check is
        # deferred to the NEXT flush/finish, by which point the scalar is
        # already computed; on overflow the flush replays from the kept
        # pre-flush table at doubled capacity.
        self._unchecked = ("table", self.table, stack, target_b, rows,
                           length)
        self.table = CountTable(nhi, nlo, nc, n_unique)
        # start the scalar's device->host trip now: by the time the
        # deferred check reads it, the (slow, ~30ms over the dev tunnel)
        # transfer has already overlapped with the next flush's work
        try:
            n_unique.copy_to_host_async()
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
        kind, *rest = self._unchecked
        self._unchecked = None
        if kind == "run":
            stack, target_b, rows, length = rest
            while int(self._runs[-1][3]) > self.capacity:
                self._grow()
                fn = self._run_fn(target_b, rows, length, self.capacity)
                self._runs[-1] = tuple(fn(stack))
            return
        prev, stack, target_b, rows, length = rest
        while int(self.table.n_unique) > self.capacity:
            self._grow()
            prev = merge_tables(prev, empty_table(0),
                                capacity=self.capacity)
            fn = self._flush_fn(target_b, rows, length, self.capacity)
            nhi, nlo, nc, n_unique = fn(
                prev.keys_hi, prev.keys_lo, prev.counts, stack)
            self.table = CountTable(nhi, nlo, nc, n_unique)

    def _consolidate(self) -> None:
        """Merge pending runs + resident table (LSM mode)."""
        self._check_overflow()
        if not self._runs:
            return
        self._check_consol()
        runs = self._runs
        self._runs = []
        prev_table = self.table
        self.table = self._merge_runs(prev_table, runs, self.capacity)
        # consolidation inputs kept until its n_unique is fetched: on
        # overflow the merge replays at doubled capacity
        self._consol_unchecked = (prev_table, runs)
        try:
            self.table.n_unique.copy_to_host_async()
        except AttributeError:
            pass

    def _check_consol(self) -> None:
        if self._consol_unchecked is None:
            return
        prev_table, runs = self._consol_unchecked
        self._consol_unchecked = None
        while int(self.table.n_unique) > self.capacity:
            self._grow()
            self.table = self._merge_runs(prev_table, runs, self.capacity)

    def device_sync(self) -> int:
        """Block until this counter's most recently scheduled device work
        completes by fetching its newest scalar (block_until_ready does
        not block over the remote tunnel).  Returns that scalar."""
        if self._runs:
            return int(self._runs[-1][3])
        return int(self.table.n_unique)

    def current_table(self) -> CountTable:
        """The resident table with all deferred work settled — the safe
        mid-stream accessor (plain `.table` may be transiently truncated
        right after an overflowing flush, and in LSM mode excludes
        pending runs)."""
        self._check_overflow()
        self._consolidate()
        self._check_consol()
        return self.table

    def finish(self) -> CountTable:
        self._flush()
        self._check_overflow()
        self._consolidate()
        self._check_consol()
        return self.table


class StreamingCounter:
    """Host-side streaming accumulator with capacity doubling.

    Mirrors the observable behaviour of jellyfish's cooperative resize
    (hash_counter.hpp:204-244): when a merge would exceed capacity, capacity
    doubles and the merge re-runs (allowed unless `disable_grow`).

    Batches are buffered on device and the (expensive) sort+reduce against
    the resident table runs once per `flush_windows` k-mers instead of once
    per batch — the log-structured-merge idea, amortising the table's sort
    cost across many batches.  Buffers are padded to power-of-2 sizes so
    the number of distinct compiled shapes stays logarithmic.
    """

    def __init__(self, initial_capacity: int = 1 << 20,
                 max_capacity: int = 1 << 30, disable_grow: bool = False,
                 flush_windows: int = 1 << 25):
        self.capacity = int(initial_capacity)
        self.max_capacity = int(max_capacity)
        self.disable_grow = disable_grow
        self.flush_windows = int(flush_windows)
        self.table = empty_table(self.capacity)
        self._pending: list = []
        self._pending_n = 0

    def _grow(self):
        if self.disable_grow or self.capacity * 2 > self.max_capacity:
            raise TableFullError(
                f"Count table full at capacity {self.capacity}")
        self.capacity *= 2
        self.table = merge_tables(self.table, empty_table(0),
                                  capacity=self.capacity)

    def add(self, hi, lo, valid):
        hi = hi.reshape(-1)
        lo = lo.reshape(-1)
        w = valid.reshape(-1).astype(jnp.uint32)
        if self._pending_n + hi.shape[0] > self.flush_windows:
            self._flush()
        self._pending.append((hi, lo, w))
        self._pending_n += int(hi.shape[0])
        if self._pending_n >= self.flush_windows:
            self._flush()

    def _flush(self):
        if not self._pending_n:
            return
        target = 1 << max(1, int(np.ceil(np.log2(self._pending_n))))
        target = min(target, max(self.flush_windows, self._pending_n))
        pad = target - self._pending_n
        parts = self._pending
        if pad:
            parts = parts + [(
                jnp.full((pad,), SENTINEL, jnp.uint32),
                jnp.full((pad,), SENTINEL, jnp.uint32),
                jnp.zeros((pad,), jnp.uint32))]
        hi = jnp.concatenate([p[0] for p in parts])
        lo = jnp.concatenate([p[1] for p in parts])
        w = jnp.concatenate([p[2] for p in parts])
        self._pending = []
        self._pending_n = 0
        while True:
            new = absorb_batch(self.table, hi, lo, w, self.capacity)
            n = int(new.n_unique)
            if n <= self.capacity:
                self.table = new
                return
            self._grow()

    def finish(self) -> CountTable:
        self._flush()
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
