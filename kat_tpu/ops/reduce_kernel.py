"""Streaming reduce-by-key + compaction Pallas kernel.

Replaces the two most expensive steps of core/counting._unique_reduce — the
26-pass segmented Hillis-Steele scan and the full-size compaction sort —
with ONE bandwidth-bound pass over the sorted key stream.  This is the TPU
kernel counterpart of jellyfish's hash-array scan-and-emit (reference
deps/jellyfish-2.2.0/include/jellyfish/large_hash_iterator.hpp region
iterators), redesigned for a sorted-stream world.

Algorithm (sequential grid over tiles, carry state in SMEM):
  1. run detection: is_first[i] = key[i] != key[i-1] (cross-tile predecessor
     carried in SMEM).
  2. segmented inclusive scan of weights within the tile (log2(T) flat-shift
     rounds; the carry run's partial sum is absorbed by element 0).
  3. emission AT RUN STARTS: when key changes at i, the *previous* run
     (key[i-1], inclusive_sum[i-1]) is complete — emitting the predecessor
     makes the cross-tile carry uniform and means sentinel padding
     automatically flushes the final real run.
  4. compaction: emitted elements route to dest = staging_offset + rank via
     LSB->MSB conditional log-shifts.  Because move distances are monotone
     non-decreasing, the routing is collision-free (verified exhaustively in
     tests) — this is the scatter-free data-dependent permutation primitive
     the TPU lacks natively.
  5. the staging tile (full 128-lane rows) DMAs to HBM at a row cursor with
     deliberate tail overlap: garbage past the cursor is overwritten by the
     next tile's DMA, and the final tail is masked out by the XLA wrapper.

Everything is uint32 vector ops on [rows, 128] tiles: no gathers, no
scatters, no matmuls, no per-element loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.kmers import SENTINEL

LANES = 128


def _flat_iota(rows: int) -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + l


def _lane_iota(rows: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)


def _flat_prev(x: jax.Array, s: int) -> jax.Array:
    """y[i] = x[i - s] in row-major flat order (wraps; caller masks)."""
    if x.dtype == jnp.bool_:  # Mosaic cannot rotate i1 vectors
        return _flat_prev(x.astype(jnp.int32), s) != 0
    if s % LANES == 0:
        return pltpu.roll(x, s // LANES, axis=0)
    a = pltpu.roll(x, s, axis=1)
    b = pltpu.roll(a, 1, axis=0)
    return jnp.where(_lane_iota(x.shape[0]) >= s, a, b)


def _flat_next(x: jax.Array, s: int) -> jax.Array:
    """y[i] = x[i + s] in row-major flat order (wraps; caller masks)."""
    if x.dtype == jnp.bool_:  # Mosaic cannot rotate i1 vectors
        return _flat_next(x.astype(jnp.int32), s) != 0
    rows = x.shape[0]
    if s % LANES == 0:
        return pltpu.roll(x, rows - (s // LANES) % rows, axis=0)
    a = pltpu.roll(x, LANES - s, axis=1)
    b = pltpu.roll(a, rows - 1, axis=0)
    return jnp.where(_lane_iota(rows) < LANES - s, a, b)


def _prev1_with_carry(x: jax.Array, carry_scalar) -> jax.Array:
    """x shifted down by one flat position; element 0 takes carry_scalar."""
    p = _flat_prev(x, 1)
    first = _flat_iota(x.shape[0]) == 0
    return jnp.where(first, jnp.full_like(x, carry_scalar), p)


def _seg_inclusive_scan(w: jax.Array, is_first: jax.Array) -> jax.Array:
    """Segmented inclusive sum over the flat tile (boundaries = is_first)."""
    rows = w.shape[0]
    n = rows * LANES
    fi = _flat_iota(rows)
    s = w
    f = is_first
    d = 1
    while d < n:
        sv = _flat_prev(s, d)
        fv = _flat_prev(f, d)
        oob = fi < d
        sv = jnp.where(oob, jnp.uint32(0), sv)
        fv = oob | fv
        s = jnp.where(f, s, s + sv)
        f = f | fv
        d *= 2
    return s


def _exclusive_rank(m: jax.Array) -> jax.Array:
    """Exclusive prefix count of a 0/1 mask over the flat tile (int32)."""
    rows = m.shape[0]
    n = rows * LANES
    fi = _flat_iota(rows)
    c = m.astype(jnp.int32)
    d = 1
    while d < n:
        cv = _flat_prev(c, d)
        c = c + jnp.where(fi < d, jnp.int32(0), cv)
        d *= 2
    return c - m.astype(jnp.int32)


def _route_compact(planes, mask, dest, window_rows: int):
    """Collision-free monotone routing: element at flat position p with
    mask set moves to dest[p] (dest strictly increasing over set elements,
    dest[p] <= p).  Returns routed planes on a [window_rows, 128] window.

    planes/mask/dest must already live on the window layout.  LSB->MSB
    conditional shifts; monotonicity of distances makes rounds conflict-free
    (see module docstring).
    """
    fi = _flat_iota(window_rows)
    dist = jnp.where(mask, fi - dest, jnp.int32(0))
    vs = list(planes)
    m = mask
    s = 1
    nwin = window_rows * LANES
    while s < nwin:
        moves = m & ((dist & s) != 0)
        recv = _flat_next(moves, s)
        recv = recv & (fi < nwin - s)
        vs = [jnp.where(recv, _flat_next(v, s), v) for v in vs]
        dist = jnp.where(recv, _flat_next(dist, s) - s, dist)
        m = recv | (m & ~moves)
        s *= 2
    return vs, m


def _reduce_kernel(*refs, n_key_words: int, rt: int, nr: int, n_tiles: int,
                   ablate_level: int = 0):
    """Grid step: one [rt, 128] tile of the sorted (key..., w) stream.

    ablate_level is a cost-bisection aid (results are WRONG above 0):
    1 drops the output DMA, 2 additionally drops the staging blend+roll,
    3 additionally drops widen+route, 5 drops everything but the input
    pipeline + one SMEM touch.  Level 4 (scan/rank) is ablated by
    monkeypatching in benchmarks/profile_reduce_kernel.py.
    """
    in_refs = refs[:n_key_words + 1]
    out_ref, state_out = refs[n_key_words + 1:n_key_words + 3]
    stage, smem, sem = refs[n_key_words + 3:]

    pid = pl.program_id(0)
    n_planes = n_key_words + 1
    nw = n_key_words
    sr = rt + 2  # staging rows: rt tile rows + partial + slack
    # SMEM layout: [0..nw-1] carry key words, [nw] carry run sum,
    # [nw+1] staging offset (0..127), [nw+2] output row cursor,
    # [nw+3] total emitted.

    @pl.when(pid == 0)
    def _init():
        for j in range(n_key_words):
            smem[0, j] = SENTINEL
        for j in range(4):
            smem[0, nw + j] = jnp.uint32(0)
        stage[...] = jnp.zeros((n_planes, sr, LANES), jnp.uint32)

    kw = [r[...] for r in in_refs[:n_key_words]]
    w = in_refs[n_key_words][...]

    if ablate_level >= 5:  # pipeline floor: consume input, no compute
        smem[0, nw + 3] = kw[0][0, 0] + w[0, 0]

        @pl.when(pid == n_tiles - 1)
        def _finish_floor():
            state_out[0, 0] = smem[0, nw + 3]
            for j in range(n_key_words + 3):
                state_out[0, 1 + j] = jnp.uint32(0)
        return

    carry_kw = [smem[0, j] for j in range(n_key_words)]
    carry_sum = smem[0, nw]
    off = smem[0, nw + 1].astype(jnp.int32)
    grow = smem[0, nw + 2].astype(jnp.int32)
    emitted = smem[0, nw + 3]

    prev_kw = [_prev1_with_carry(x, c) for x, c in zip(kw, carry_kw)]

    same_prev = jnp.ones(kw[0].shape, jnp.bool_)
    for x, p in zip(kw, prev_kw):
        same_prev = same_prev & (x == p)
    is_first = ~same_prev

    # absorb the carried partial sum into element 0 if it continues the run
    first_pos = _flat_iota(rt) == 0
    w = jnp.where(first_pos & same_prev, w + carry_sum, w)

    s = _seg_inclusive_scan(w, is_first)

    prev_real = jnp.zeros(kw[0].shape, jnp.bool_)
    for p in prev_kw:
        prev_real = prev_real | (p != SENTINEL)
    emit = is_first & prev_real
    prev_s = _prev1_with_carry(s, carry_sum)

    rank = _exclusive_rank(emit)

    # ---- route emitted (prev_key, prev_sum) onto the staging window ----
    # window = [sr, 128]; tile element i sits at window position 128 + i,
    # destination = off + rank (monotone, <= source position).
    zpad = jnp.zeros((1, LANES), jnp.uint32)

    def widen_u32(x):
        return jnp.concatenate([zpad, x, zpad], axis=0)

    def widen_bool(x):  # Mosaic cannot concatenate i1 vectors
        return widen_u32(
            jnp.where(x, jnp.uint32(1), jnp.uint32(0))) != jnp.uint32(0)

    if ablate_level < 3:
        planes = [widen_u32(jnp.where(emit, p, jnp.uint32(0)))
                  for p in prev_kw]
        planes.append(widen_u32(jnp.where(emit, prev_s, jnp.uint32(0))))
        wmask = widen_bool(emit)
        wdest = widen_u32((off + rank).astype(jnp.uint32)).astype(jnp.int32)

        routed, rmask = _route_compact(planes, wmask, wdest, sr)

        if ablate_level < 2:
            # blend into staging: only positions that received an element
            # change; everything else (incl. lanes < off of row 0) keeps
            # prior content.
            for j in range(n_planes):
                stage[j] = jnp.where(rmask, routed[j], stage[j])

    # total emitted = last exclusive rank + last emit flag (jnp.sum /
    # lax.reduce route through int64 under x64, which Mosaic cannot lower)
    n_emit = (rank[rt - 1, LANES - 1]
              + emit.astype(jnp.int32)[rt - 1, LANES - 1]).astype(jnp.uint32)
    new_t = off + n_emit.astype(jnp.int32)
    full_rows = new_t // LANES

    # ---- ship staging to HBM (fixed-size DMA, tail overlap by design) ----
    if ablate_level < 1:
        grow_c = jnp.minimum(grow, nr - (rt + 1))
        cp = pltpu.make_async_copy(
            stage.at[:, 0:rt + 1, :],
            out_ref.at[:, pl.ds(grow_c, rt + 1), :],
            sem)
        cp.start()
        cp.wait()

    if ablate_level < 2:
        # roll the partial row back to staging row 0 for the next tile
        partial = stage[:, pl.ds(full_rows, 1), :]
        stage[:, 0:1, :] = partial

    # ---- update carry state ----
    for j in range(n_key_words):
        smem[0, j] = kw[j][rt - 1, LANES - 1]
    smem[0, nw] = s[rt - 1, LANES - 1]
    smem[0, nw + 1] = (new_t % LANES).astype(jnp.uint32)
    smem[0, nw + 2] = (grow + full_rows).astype(jnp.uint32)
    smem[0, nw + 3] = emitted + n_emit

    @pl.when(pid == n_tiles - 1)
    def _finish():
        state_out[0, 0] = emitted + n_emit
        for j in range(n_key_words):
            state_out[0, 1 + j] = kw[j][rt - 1, LANES - 1]
        state_out[0, 1 + nw] = s[rt - 1, LANES - 1]
        state_out[0, 2 + nw] = (grow + full_rows).astype(jnp.uint32)
        state_out[0, 3 + nw] = (new_t % LANES).astype(jnp.uint32)


def _compact_kernel(*refs, n_planes: int, rt: int, nr: int, n_tiles: int):
    """Grid step for compact_flagged: one [rt, 128] tile.  Same staging /
    monotone-routing / chained-DMA machinery as _reduce_kernel, but the
    emit predicate is a caller-provided flag and elements ship as-is (no
    runs, no scan, no carries beyond the output cursor)."""
    in_refs = refs[:n_planes + 1]
    out_ref, state_out = refs[n_planes + 1:n_planes + 3]
    stage, smem, sem = refs[n_planes + 3:]

    pid = pl.program_id(0)
    sr = rt + 2
    # SMEM layout: [0] staging offset (0..127), [1] output row cursor,
    # [2] total emitted.

    @pl.when(pid == 0)
    def _init():
        for j in range(3):
            smem[0, j] = jnp.uint32(0)
        stage[...] = jnp.zeros((n_planes, sr, LANES), jnp.uint32)

    planes = [r[...] for r in in_refs[:n_planes]]
    emit = in_refs[n_planes][...] != 0

    off = smem[0, 0].astype(jnp.int32)
    grow = smem[0, 1].astype(jnp.int32)
    emitted = smem[0, 2]

    rank = _exclusive_rank(emit)

    zpad = jnp.zeros((1, LANES), jnp.uint32)

    def widen_u32(x):
        return jnp.concatenate([zpad, x, zpad], axis=0)

    def widen_bool(x):  # Mosaic cannot concatenate i1 vectors
        return widen_u32(
            jnp.where(x, jnp.uint32(1), jnp.uint32(0))) != jnp.uint32(0)

    wplanes = [widen_u32(jnp.where(emit, p, jnp.uint32(0)))
               for p in planes]
    wmask = widen_bool(emit)
    wdest = widen_u32((off + rank).astype(jnp.uint32)).astype(jnp.int32)
    routed, rmask = _route_compact(wplanes, wmask, wdest, sr)
    for j in range(n_planes):
        stage[j] = jnp.where(rmask, routed[j], stage[j])

    n_emit = (rank[rt - 1, LANES - 1]
              + emit.astype(jnp.int32)[rt - 1, LANES - 1]).astype(jnp.uint32)
    new_t = off + n_emit.astype(jnp.int32)
    full_rows = new_t // LANES

    grow_c = jnp.minimum(grow, nr - (rt + 1))
    cp = pltpu.make_async_copy(
        stage.at[:, 0:rt + 1, :],
        out_ref.at[:, pl.ds(grow_c, rt + 1), :],
        sem)
    cp.start()
    cp.wait()

    partial = stage[:, pl.ds(full_rows, 1), :]
    stage[:, 0:1, :] = partial

    smem[0, 0] = (new_t % LANES).astype(jnp.uint32)
    smem[0, 1] = (grow + full_rows).astype(jnp.uint32)
    smem[0, 2] = emitted + n_emit

    @pl.when(pid == n_tiles - 1)
    def _finish():
        state_out[0, 0] = emitted + n_emit


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "rows_per_tile", "interpret"))
def compact_flagged(planes, flag, out_size: int, rows_per_tile: int = 64,
                    interpret: bool = False):
    """Stable stream compaction: elements whose flag != 0 move to the
    front, order preserved — ONE bandwidth pass (the TPU-native
    replacement for a full sort when only a subset must be extracted;
    the join uses it to pull query rows out of the merged stream before
    the small un-permute sort).

    planes: tuple of uint32 arrays [n]; flag: uint32/bool [n];
    out_size: static output length (the caller must guarantee the
    flagged count fits — the join knows it exactly).
    Returns (*compacted_planes [out_size], n_kept int32); positions
    beyond n_kept are zero.
    """
    n_planes = len(planes)
    rt = rows_per_tile
    tile = rt * LANES
    n = planes[0].shape[0]
    n_pad = int(np.ceil(max(n, 1) / tile)) * tile
    ps = [_pad_to(p.astype(jnp.uint32), n_pad, 0) for p in planes]
    fl = _pad_to(flag.astype(jnp.uint32), n_pad, 0)
    n_tiles = n_pad // tile
    nr = int(np.ceil(out_size / LANES)) + rt + 2

    kernel = functools.partial(
        _compact_kernel, n_planes=n_planes, rt=rt, nr=nr, n_tiles=n_tiles)

    in_specs = [pl.BlockSpec((rt, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_planes + 1)]
    with jax.enable_x64(False):
        out, state = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_planes, nr, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((1, 1), jnp.uint32),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_planes, rt + 2, LANES), jnp.uint32),
                pltpu.SMEM((1, 3), jnp.uint32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(*[x.reshape(-1, LANES) for x in ps], fl.reshape(-1, LANES))

    n_kept = state[0, 0].astype(jnp.int32)
    flat = out.reshape(n_planes, nr * LANES)
    idx = jnp.arange(out_size, dtype=jnp.int32)
    valid = idx < n_kept
    outs = tuple(jnp.where(valid, flat[j, :out_size], 0)
                 for j in range(n_planes))
    return (*outs, n_kept)


def _pad_to(x: jax.Array, n: int, fill) -> jax.Array:
    if x.shape[0] == n:
        return x
    return jnp.concatenate(
        [x, jnp.full((n - x.shape[0],), fill, x.dtype)])


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "rows_per_tile", "interpret",
                     "ablate_level"))
def reduce_compact_sorted(key_words, w, out_size: int,
                          rows_per_tile: int = 64,
                          interpret: bool = False,
                          ablate_level: int = 0):
    """Reduce a SORTED key stream to (unique keys, summed counts).

    Args:
      key_words: tuple of uint32 arrays [n] (lexicographic significance
        order, 2 for narrow keys / 4 for wide); sentinel keys (all words ==
        SENTINEL) must sort last and carry zero weights.
      w: uint32 weights [n].
      out_size: static output capacity.  If the number of unique keys
        exceeds it, `n_unique` reports the true count and the caller must
        grow and re-run (same contract as counting._unique_reduce).

    Returns: (*unique_words, counts, n_unique) — arrays of length out_size,
      sentinel/zero padded, plus the int32 unique count.
    """
    n_key_words = len(key_words)
    rt = rows_per_tile
    tile = rt * LANES
    n = key_words[0].shape[0]
    n_pad = int(np.ceil(max(n, 1) / tile)) * tile
    kw = [_pad_to(x, n_pad, SENTINEL) for x in key_words]
    wv = _pad_to(w.astype(jnp.uint32), n_pad, 0)
    n_tiles = n_pad // tile

    out_rows = int(np.ceil(out_size / LANES)) + rt + 2
    nr = out_rows

    kernel = functools.partial(
        _reduce_kernel, n_key_words=n_key_words, rt=rt, nr=nr,
        n_tiles=n_tiles, ablate_level=ablate_level)

    in_specs = [pl.BlockSpec((rt, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_key_words + 1)]
    # Trace the kernel with x64 off: under x64 dynamic-slice starts are
    # upcast to int64 scalars, which the Mosaic lowering cannot demote.
    with jax.enable_x64(False):
        out, state = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_key_words + 1, nr, LANES),
                                     jnp.uint32),
                jax.ShapeDtypeStruct((1, n_key_words + 4), jnp.uint32),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_key_words + 1, rt + 2, LANES), jnp.uint32),
                pltpu.SMEM((1, n_key_words + 4), jnp.uint32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(*[x.reshape(-1, LANES) for x in kw], wv.reshape(-1, LANES))

    emitted = state[0, 0].astype(jnp.int32)
    carry_kw = [state[0, 1 + j] for j in range(n_key_words)]
    carry_sum = state[0, 1 + n_key_words]
    carry_real = jnp.zeros((), jnp.bool_)
    for c in carry_kw:
        carry_real = carry_real | (c != SENTINEL)
    n_unique = emitted + carry_real.astype(jnp.int32)

    flat = out.reshape(n_key_words + 1, nr * LANES)
    idx = jnp.arange(out_size, dtype=jnp.int32)
    valid = idx < n_unique
    outs = []
    for j in range(n_key_words):
        col = flat[j, :out_size]
        col = col.at[jnp.minimum(emitted, out_size - 1)].set(
            jnp.where((emitted < out_size) & carry_real, carry_kw[j],
                      col[jnp.minimum(emitted, out_size - 1)]))
        outs.append(jnp.where(valid, col, SENTINEL))
    cnt = flat[n_key_words, :out_size]
    cnt = cnt.at[jnp.minimum(emitted, out_size - 1)].set(
        jnp.where((emitted < out_size) & carry_real, carry_sum,
                  cnt[jnp.minimum(emitted, out_size - 1)]))
    outs.append(jnp.where(valid, cnt, jnp.uint32(0)))
    return (*outs, n_unique)
