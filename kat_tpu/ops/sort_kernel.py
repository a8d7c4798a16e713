"""Memory-bounded Pallas bitonic full sort over HBM-resident plane lists.

`lax.sort` costs ~4.3 ns/elt at scale on v5e and dominates the counting
flush (the fresh-window sort).  A bitonic sorting network, blocked so that
every stage streams HBM through VMEM, is bandwidth-bound instead:

  pass count = 1 (local block sort) + sum over phases p of
               (cross stages (p - B) + 1 intra pass)

with B = log2(block elements).  At n = 2^26, br = 4096 (B = 19): 36
read+write passes of 8 bytes/plane/elt — far under lax.sort's cost even
before overlap.

Structure (direction-aware generalization of ops/merge_kernel.py, which
is the ascending special case of the final phase) — one window kernel
in three scalar-selected modes:

  1. build pass (S=1, do_build): all run-building rounds (phases 1..B)
     on each block — a fori_loop over the phase q emits the B static-
     stride round bodies ONCE, gated on `r < q` — then phases
     B+1..B+log2(W) entirely in-window.  The whole build costs ONE HBM
     read+write pass.
  2. strided cross passes (S>1): the window holds blocks S apart, so one
     pass executes the log2(W) cross stages with block strides
     S*W/2..S of a later phase.
  3. tail pass (S=1): a phase's last strides W/2..1 + every intra-block
     merge tail.

One compiled binary (mode arrives as SMEM scalars), ~O(log^2 n /
log^2 W) full HBM read+write passes instead of the textbook
one-pass-per-round O(log^2 n), while traced-phase gating keeps the
per-kernel unroll at the block size the remote Mosaic toolchain is
known to handle (monolithic 4096-row kernels and 136-round static
unrolls both OOM it).  Directions are everywhere computed from bits of
the global element index, so block/phase/stride boundaries need no
special cases.

Everything is in place via input_output_aliasing; VMEM per grid step is
bounded by the window (~8MB).

Direction rule: a compare-exchange at stride 2^r inside phase q orders
element i ascending iff bit q of the global element index is 0 — carrying
the global index (int32; n <= 2^31) makes every direction computation
uniform, with no special cases at block or phase boundaries.

Reference role: replaces the radix/CAS organisation of jellyfish's
hash_counter fill (deps/jellyfish-2.2.0/include/jellyfish/
large_hash_array.hpp) — here the sorted-stream world's equivalent is the
fresh-window sort feeding merge + streaming reduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.kmers import SENTINEL
from .merge_kernel import _cmpx_blocks, _lex_less

LANES = 128

# Build phases q <= this run STATICALLY UNROLLED and VALUE-CARRIED per
# block (36 rounds at 8): the block's planes load from VMEM once, all
# early-phase compare-exchange rounds chain through registers, and the
# result stores once — instead of a VMEM read-modify-write per round.
# Phases above it keep the traced-phase-gated RMW loop that bounds the
# compiled size (the remote Mosaic toolchain OOMs on full static
# unrolls).  KAT_TPU_SORT_STATIC_Q overrides (0 disables) for on-chip
# A/B.
import os as _os  # noqa: E402

STATIC_BUILD_Q = int(_os.environ.get("KAT_TPU_SORT_STATIC_Q", "8"))


def _xor(a, b):
    # i1 xor: Mosaic lowers &,|,~ on i1 vectors but not select/rotate.
    return (a & ~b) | (~a & b)


def _cmpx_roll(planes, s, axis, size, idx, n_key_words, dmi, br):
    """XOR-partner compare-exchange at stride s along `axis` (roll-based;
    the reshape/interleave formulation lowers to costlier relayouts).

    The pair decision is computed ONCE from the +s neighbour and rolled
    to the high slots — saving a second full lexicographic compare.
    dmi: [br, LANES] int32 0/1 descending-direction mask; it is constant
    across each compare pair (both elements share bit q), so folding it
    into the integer decision BEFORE the roll (one int xor) replaces the
    3-op i1 xor after it."""
    is_low = (idx & s) == 0
    fwd = [pltpu.roll(p, size - s, axis=axis) for p in planes]  # x[i+s]
    bwd = [pltpu.roll(p, s, axis=axis) for p in planes]         # x[i-s]
    # d[i] (valid at low slots): x[i+s] < x[i]
    d = _lex_less(fwd[:n_key_words], planes[:n_key_words])
    di = jnp.where(d, jnp.int32(1), jnp.int32(0)) ^ dmi
    take = jnp.where(is_low, di, pltpu.roll(di, s, axis=axis)) != 0
    partners = [jnp.where(is_low, f, b) for f, b in zip(fwd, bwd)]
    return [jnp.where(take, pv, x) for pv, x in zip(partners, planes)]


# Row-stride rounds whose stride is a multiple of the (8, 128) sublane
# tile run as reshape-SELECT pairs instead of rolls: a [br/(2s), 2, s,
# LANES] view pairs rows without any cross-lane/sublane data movement,
# the comparator runs on HALF the elements, and the write-back is a
# tile-aligned interleave.  Chip-measured (benchmarks/profile_roll.py):
# 0.0009 ns/elt/round vs 0.0088 for the same round as a sublane roll —
# ~10x — while sub-tile strides (1/2/4) lower to interleaving relayouts
# that are WORSE than rolls (0.026 at stride 1), so those stay rolls.
# KAT_TPU_ROWSEL sets the minimum reshape-select row stride (0 disables).
ROWSEL_MIN = int(_os.environ.get("KAT_TPU_ROWSEL", "8"))


def _cmpx_rowsel(planes, sr, n_key_words, br, dmi):
    """Compare-exchange rows at tile-aligned stride sr via reshape-select
    (see ROWSEL_MIN).  dmi: [br, LANES] int32 0/1 descending mask,
    constant across each pair (both elements share bit q)."""
    g = br // (2 * sr)
    sh = [p.reshape(g, 2, sr, LANES) for p in planes]
    top = [p[:, 0] for p in sh]
    bot = [p[:, 1] for p in sh]
    d = _lex_less(bot[:n_key_words], top[:n_key_words])
    dm = dmi.reshape(g, 2, sr, LANES)[:, 0] != 0
    swap = d ^ dm
    out = []
    for t, b in zip(top, bot):
        lo = jnp.where(swap, b, t)
        hi = jnp.where(swap, t, b)
        out.append(jnp.stack([lo, hi], axis=1).reshape(br, LANES))
    return out


def _round_dyn_q(planes, q, r, n_key_words, br, fi_global):
    """One compare-exchange round at STATIC stride 2^r: ascending where
    bit q of the global element index is 0, with q a TRACED scalar.

    Static strides keep the Mosaic lowering to constant rolls (a fully
    dynamic-stride formulation blows up the compiler); the direction mask
    is an elementwise shift of the global flat iota by the traced q,
    which lowers fine.  fi_global: [br, LANES] int32 global element
    indices of this block (n <= 2^31)."""
    dmi = (fi_global >> q) & 1
    if r < 7:
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
        return _cmpx_roll(planes, 1 << r, 1, LANES, lane, n_key_words,
                          dmi, br)
    sr = 1 << (r - 7)
    if ROWSEL_MIN and sr >= ROWSEL_MIN:
        return _cmpx_rowsel(planes, sr, n_key_words, br, dmi)
    row = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
    return _cmpx_roll(planes, sr, 0, br, row, n_key_words,
                      dmi, br)


def _intra_tail(planes, n_key_words, br, desc):
    """Bitonic merge tail (strides bs/2..1) with uniform traced direction
    `desc`, static unrolled, all rounds roll-based."""
    dmi = jnp.full((br, LANES), jnp.where(desc, jnp.int32(1),
                                          jnp.int32(0)))
    row = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
    sr = br // 2
    while sr >= 1:
        if ROWSEL_MIN and sr >= ROWSEL_MIN:
            planes = _cmpx_rowsel(planes, sr, n_key_words, br, dmi)
        else:
            planes = _cmpx_roll(planes, sr, 0, br, row, n_key_words, dmi,
                                br)
        sr //= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    s = LANES // 2
    while s >= 1:
        planes = _cmpx_roll(planes, s, 1, LANES, lane, n_key_words, dmi,
                            br)
        s //= 2
    return planes


def _window_kernel(*refs, n_planes: int, n_key_words: int, br: int,
                   W: int):
    """Run a RANGE of bitonic work inside a W-block VMEM window: grid
    (nb // W,).

    One binary, four SMEM scalars [do_build, ps_lo, ps_hi, S].  Window j
    holds the W blocks {(j//S)*S*W + (j%S) + w*S : w < W} — CONTIGUOUS
    blocks when S == 1, a strided spread otherwise.

      S == 1: with do_build set, first run every run-building round
        (phases q=1..B, strides 2^(q-1)..1) on each block — a fori_loop
        over q emits the B static-stride round bodies once, gated on
        `r < q`, keeping the compiled size at ~B rounds (full 136-round
        unrolls OOM the remote Mosaic toolchain).  Then phases
        ps_lo..ps_hi: cross-block stages (strides W/2..1 gated on
        `stride < 2^ps`) + the intra-block merge tails.
      S > 1 (ps_lo == ps_hi == ps): one GROUP of phase-ps cross stages —
        window-local stride s is global block stride S*s, so one HBM
        pass executes the log2(W) stages with strides S*W/2 .. S (gated
        to [W, 2^(ps-1)]; strides < W belong to the final S == 1 pass).
        No build, no tail.

    A full sort is then: 1 build+local pass, and per later phase
    ceil((ps - log2 W)/log2 W) strided passes + 1 tail pass — the
    strided grouping is what turns the former one-pass-per-cross-stage
    schedule into O(log^2 n / log^2 W) passes.  Directions are uniform
    in the global element index (bit q / bit p), so block/phase/stride
    boundaries need no special cases.
    """
    hbm_in = refs[:n_planes]
    scal = refs[n_planes]
    hbm_out = refs[n_planes + 1:2 * n_planes + 1]
    out_dummy = refs[2 * n_planes + 1]
    vmem, sem_in, sem_out = refs[2 * n_planes + 2:]

    j = pl.program_id(0)
    do_build = scal[0, 0]
    ps_lo = scal[0, 1]
    ps_hi = scal[0, 2]
    S = scal[0, 3]
    nbr = scal[0, 4]  # real block count; blocks >= nbr are VIRTUAL
    emask = scal[0, 5]  # element-index mask for DIRECTION computation:
    #                     0x7FFFFFFF for a full sort; chunk_elems-1 for
    #                     the chunked sort, which makes bit C (C = log2
    #                     chunk) of every masked index 0, so phase C of
    #                     each aligned chunk orders ascending and all
    #                     chunks sort independently ascending.
    #                   (conceptual +inf sentinel blocks that make a
    #                   non-pow2 length bitonic: pairs touching them are
    #                   no-ops and are skipped, and they have no backing
    #                   memory, so every DMA / stage / tail is gated on
    #                   blk_id < nbr)
    rows = W * br
    bB = int(np.log2(br * LANES))

    # first block of this window, in global block ids (reduces to j*W
    # when S == 1; lax.div/rem avoid jnp's int64-promoting sign logic)
    wb = jax.lax.div(j, S) * (S * W) + jax.lax.rem(j, S)

    def blk_id(w):
        return wb + w * S

    @pl.when((S == 1) & (wb + W <= nbr))
    def _load_contig():
        cps = [pltpu.make_async_copy(
            hbm_in[p].at[pl.ds(wb * br, rows), :], vmem.at[p],
            sem_in.at[p]) for p in range(n_planes)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    @pl.when((S != 1) | (wb + W > nbr))
    def _load_strided():
        for w in range(W):
            @pl.when(blk_id(w) < nbr)
            def _ld(w=w):
                cps = [pltpu.make_async_copy(
                    hbm_in[p].at[pl.ds(blk_id(w) * br, br), :],
                    vmem.at[p, pl.ds(w * br, br), :],
                    sem_in.at[w * n_planes + p])
                    for p in range(n_planes)]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()

    def blk(p, w):
        return vmem[p, pl.ds(w * br, br), :]

    def set_blk(p, w, val):
        vmem[p, pl.ds(w * br, br), :] = val

    fi_local = (jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1))
    bmask = emask >> bB  # block-index mask (directions at block level)

    q0 = min(STATIC_BUILD_Q, bB)

    @pl.when(do_build != 0)
    def _build():
        if q0 > 0:
            # phases 1..q0: static unroll, value-carried — one VMEM
            # load/store per block instead of one per round
            def per_block_static(w, c2):
                fi_global = (blk_id(w) * (br * LANES) + fi_local) & emask
                planes = [blk(p, w) for p in range(n_planes)]
                for q in range(1, q0 + 1):
                    for r in range(q - 1, -1, -1):
                        planes = _round_dyn_q(planes, q, r, n_key_words,
                                              br, fi_global)
                for p in range(n_planes):
                    set_blk(p, w, planes[p])
                return c2

            jax.lax.fori_loop(0, W, per_block_static, jnp.int32(0))

        def per_q(q, carry):
            def per_block(w, c2):
                fi_global = (blk_id(w) * (br * LANES) + fi_local) & emask
                for r in range(bB - 1, -1, -1):
                    @pl.when(r < q)
                    def _round(r=r):
                        planes = [blk(p, w) for p in range(n_planes)]
                        planes = _round_dyn_q(planes, q, r, n_key_words,
                                              br, fi_global)
                        for p in range(n_planes):
                            set_blk(p, w, planes[p])
                return c2

            jax.lax.fori_loop(0, W, per_block, jnp.int32(0))
            return carry

        jax.lax.fori_loop(q0 + 1, bB + 1, per_q, jnp.int32(0))

    def per_phase(ps, carry):
        s = W // 2
        while s >= 1:
            gs = S * s  # global block stride of this stage
            @pl.when((gs < (jnp.int32(1) << ps))
                     & ((S == 1) | (gs >= W)))
            def _stage(s=s):
                def body(i, c2):
                    w1 = ((i & ~(s - 1)) << 1) | (i & (s - 1))
                    w2 = w1 + s

                    @pl.when(blk_id(w2) < nbr)
                    def _pair():
                        desc = (((blk_id(w1) & bmask) >> ps) & 1) != 0
                        v1 = [blk(p, w1) for p in range(n_planes)]
                        v2 = [blk(p, w2) for p in range(n_planes)]
                        lo, hi = _cmpx_blocks(v1, v2, n_key_words)
                        dm = jnp.full((br, LANES), desc)
                        for p in range(n_planes):
                            set_blk(p, w1, jnp.where(dm, hi[p], lo[p]))
                            set_blk(p, w2, jnp.where(dm, lo[p], hi[p]))
                    return c2

                jax.lax.fori_loop(0, W // 2, body, jnp.int32(0))
            s //= 2

        @pl.when(S == 1)
        def _tails():
            def tail(w, c2):
                @pl.when(blk_id(w) < nbr)
                def _t():
                    desc = (((blk_id(w) & bmask) >> ps) & 1) != 0
                    planes = [blk(p, w) for p in range(n_planes)]
                    planes = _intra_tail(planes, n_key_words, br, desc)
                    for p in range(n_planes):
                        set_blk(p, w, planes[p])
                return c2

            jax.lax.fori_loop(0, W, tail, jnp.int32(0))
        return carry

    jax.lax.fori_loop(ps_lo, ps_hi + 1, per_phase, jnp.int32(0))

    @pl.when((S == 1) & (wb + W <= nbr))
    def _store_contig():
        cps = [pltpu.make_async_copy(
            vmem.at[p], hbm_out[p].at[pl.ds(wb * br, rows), :],
            sem_out.at[p]) for p in range(n_planes)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    @pl.when((S != 1) | (wb + W > nbr))
    def _store_strided():
        for w in range(W):
            @pl.when(blk_id(w) < nbr)
            def _st(w=w):
                cps = [pltpu.make_async_copy(
                    vmem.at[p, pl.ds(w * br, br), :],
                    hbm_out[p].at[pl.ds(blk_id(w) * br, br), :],
                    sem_out.at[w * n_planes + p])
                    for p in range(n_planes)]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
    out_dummy[0, 0] = jnp.int32(0)


def _inplace_call(kernel, grid, n_planes, n, br, vmem_shape, interpret,
                  n_scalars=0, n_sems=None):
    """pallas_call wrapper: n_planes aliased HBM planes (+ optional SMEM
    scalar input right after them), SMEM marker output, given VMEM
    scratch."""
    if n_sems is None:
        n_sems = 2 * n_planes
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
            + [pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 if n_scalars
                                                         else 0)),
        out_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_shape=(
            [jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32)
             for _ in range(n_planes)]
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]),
        input_output_aliases={p: p for p in range(n_planes)},
        scratch_shapes=[
            pltpu.VMEM(vmem_shape, jnp.uint32),
            pltpu.SemaphoreType.DMA((n_sems,)),
            pltpu.SemaphoreType.DMA((n_sems,)),
        ],
        interpret=interpret,
    )


# Scoped-VMEM cost model, calibrated on a real v5e (round 3): Mosaic's
# stack for one window launch is the W-block scratch PLUS ~3.4 extra
# block-slices PER PLANE of round temporaries (rolled copies / pair
# decisions), i.e.  n_planes * (W + ~3.4) * br * LANES * 4 bytes.  Fit
# (all +-2%): 11 planes W4 br512 -> 20.58M FAIL, 13 planes W2 -> 17.65M
# FAIL, 17 planes W2 -> 22.90M FAIL, 5 planes W8 -> PASS, 9 planes W2 ->
# PASS (hard limit 16M).  C=3.5 and a 14.5M budget keep every
# chip-proven geometry (2pl W16 / 3pl W8 / 5pl W8 / 7pl W4) EXACTLY as
# it has always run, and give wide-key plane counts a feasible (W, br).
_VMEM_BUDGET = 14.5 * 1024 * 1024
_TEMP_BLOCKS = 3.5


def _window_cost(n_planes: int, w: int, br: int) -> float:
    return n_planes * (w + _TEMP_BLOCKS) * br * LANES * 4


def _shrink_br_planes(n_planes: int, br: int) -> int:
    """Halve block_rows until even a W=2 window fits the VMEM model —
    the escape hatch for very wide keys (>= 11 planes at br=512)."""
    while br > 8 and _window_cost(n_planes, 2, br) > _VMEM_BUDGET:
        br //= 2
    return br


def _pick_window(n_planes: int, br: int, nb: int) -> int:
    """Largest pow2 window whose modeled scoped-VMEM cost fits."""
    w = 16
    while w > 2 and _window_cost(n_planes, w, br) > _VMEM_BUDGET:
        w //= 2
    while w > nb:
        w //= 2
    return max(w, 1)


@functools.partial(jax.jit,
                   static_argnames=("n_key_words", "block_rows",
                                    "interpret"))
def bitonic_sort_planes(planes, n_key_words: int, block_rows: int = 512,
                        interpret: bool = False):
    """Full ascending sort of a plane list (first n_key_words planes are
    the lexicographic key, the rest payload).  Length must be a power of
    two and a multiple of 2 * block_rows * 128 (the caller pads with
    SENTINEL keys / zero payloads; sentinels sort last)."""
    n_planes = len(planes)
    n = planes[0].shape[0]
    br = _shrink_br_planes(n_planes, block_rows)
    while br > 8 and n < 2 * br * LANES:
        br //= 2
    bs = br * LANES
    if n % bs or (n // bs) & ((n // bs) - 1) or n // bs < 2:
        raise ValueError(f"n={n} must be a pow2 multiple of 2*{bs}")
    nb = n // bs
    bB = int(np.log2(bs))
    pP = int(np.log2(n))

    W = _pick_window(n_planes, br, nb)
    mW = int(np.log2(W))
    window = functools.partial(
        _window_kernel, n_planes=n_planes, n_key_words=n_key_words,
        br=br, W=W)

    def window_call(arrs, do_build, ps_lo, ps_hi, S=1, emask=0x7FFFFFFF):
        scal = jnp.array([[do_build, ps_lo, ps_hi, S, nb, emask]],
                         jnp.int32)
        outs = _inplace_call(
            window, (nb // W,), n_planes, n, br,
            (n_planes, W * br, LANES), interpret, n_scalars=1,
            n_sems=W * n_planes)(*arrs, scal)
        return list(outs[:n_planes])

    arrs = [p.reshape(-1, LANES) for p in planes]
    with jax.enable_x64(False):
        # one pass: all run-building rounds + the first phases that fit
        # entirely inside the window
        local_hi = min(mW, pP - bB)
        arrs = window_call(arrs, 1, 1, local_hi)
        for p in range(bB + local_hi + 1, pP + 1):
            ps = p - bB
            # strided window passes run log2(W) cross stages each (block
            # strides T..max(2T/W, W)); the final S=1 pass finishes
            # strides W/2..1 + the tails.
            T = 1 << (ps - 1)
            while T >= W:
                S = max(2, (2 * T) // W)
                arrs = window_call(arrs, 0, ps, ps, S)
                T = S // 2
            arrs = window_call(arrs, 0, ps, ps, 1)
    return tuple(a.reshape(-1) for a in arrs)


@functools.partial(jax.jit,
                   static_argnames=("n_key_words", "chunk_elems",
                                    "block_rows", "interpret"))
def bitonic_sort_chunks(planes, n_key_words: int, chunk_elems: int,
                        block_rows: int = 512, interpret: bool = False):
    """Sort every aligned `chunk_elems` span of the plane list ascending,
    INDEPENDENTLY, in ONE window-kernel pass.

    This is the device half of the minimizer-bucketed flush
    (core/minimizer.py): the host router delivers the stream pre-grouped
    into buckets that are a prefix of the key order, so each chunk only
    needs bitonic phases up to log2(chunk_elems) — 136 rounds at 2^16 vs
    a full 2^26 sort's 351 — and because a chunk fits the VMEM window,
    the whole sort is a single HBM read+write pass.

    Mechanics: phases run 1..C (C = log2 chunk_elems) with the direction
    index masked to chunk_elems-1 (`emask`), which zeroes bit C of every
    masked index so each chunk's final phase orders ascending; chunks
    never straddle windows because chunk blocks divide W.

    Requirements: chunk_elems a pow2 multiple of the block size with
    chunk_blocks <= W (the picker's window), n a multiple of chunk_elems.
    """
    n_planes = len(planes)
    n = planes[0].shape[0]
    br = _shrink_br_planes(n_planes, block_rows)
    while br > 8 and chunk_elems < br * LANES:
        br //= 2
    bs = br * LANES
    if chunk_elems % bs or chunk_elems & (chunk_elems - 1):
        raise ValueError(
            f"chunk_elems={chunk_elems} must be a pow2 multiple of {bs}")
    if n % chunk_elems:
        raise ValueError(f"n={n} must be a multiple of chunk_elems")
    nb = n // bs
    cB = int(np.log2(chunk_elems))
    bB = int(np.log2(bs))

    W = _pick_window(n_planes, br, nb)
    if chunk_elems // bs > W:
        raise ValueError(
            f"chunk_elems={chunk_elems} exceeds the window ({W} blocks of "
            f"{bs}) — shrink the chunk or widen the window")
    window = functools.partial(
        _window_kernel, n_planes=n_planes, n_key_words=n_key_words,
        br=br, W=W)

    arrs = [p.reshape(-1, LANES) for p in planes]
    with jax.enable_x64(False):
        scal = jnp.array([[1, 1, cB - bB, 1, nb, chunk_elems - 1]],
                         jnp.int32)
        outs = _inplace_call(
            window, ((nb + W - 1) // W,), n_planes, n, br,
            (n_planes, W * br, LANES), interpret, n_scalars=1,
            n_sems=W * n_planes)(*arrs, scal)
        arrs = list(outs[:n_planes])
    return tuple(a.reshape(-1) for a in arrs)


@functools.partial(jax.jit,
                   static_argnames=("n_key_words", "block_rows",
                                    "interpret"))
def bitonic_final_phase(planes, n_key_words: int, block_rows: int = 512,
                        interpret: bool = False):
    """Run ONLY the final bitonic phase (merge a bitonic plane list into
    fully ascending order) through the window kernel.  This is the
    merge-kernel operation (ops/merge_kernel.bitonic_merge_planes
    delegates here).

    The block count does NOT need to be a power of two: appending
    virtual +inf blocks to a [descending | ascending] layout keeps it
    bitonic, every compare-exchange touching a virtual block is provably
    a no-op under ascending direction (min(x, inf) = x stays low), and
    the kernel gates DMA/stages/tails on the real block count — so a
    merge of table+windows costs passes over its REAL length, not the
    next power of two (which padded up to ~2x).  Direction is uniformly
    ascending because bit P of any index < 2^P is 0."""
    n_planes = len(planes)
    n = planes[0].shape[0]
    br = _shrink_br_planes(n_planes, block_rows)
    while br > 8 and n < 2 * br * LANES:
        br //= 2
    bs = br * LANES
    if n % bs or n // bs < 2:
        raise ValueError(f"n={n} must be a multiple of {bs}, >= 2 blocks")
    nb = n // bs
    ps = int(np.ceil(np.log2(nb)))

    W = _pick_window(n_planes, br, nb)
    window = functools.partial(
        _window_kernel, n_planes=n_planes, n_key_words=n_key_words,
        br=br, W=W)

    def window_call(arrs, ps_, S):
        if S == 1:
            grid = ((nb + W - 1) // W,)
        else:
            grid = (((nb + S * W - 1) // (S * W)) * S,)
        scal = jnp.array([[0, ps_, ps_, S, nb, 0x7FFFFFFF]], jnp.int32)
        outs = _inplace_call(
            window, grid, n_planes, n, br,
            (n_planes, W * br, LANES), interpret, n_scalars=1,
            n_sems=W * n_planes)(*arrs, scal)
        return list(outs[:n_planes])

    arrs = [p.reshape(-1, LANES) for p in planes]
    with jax.enable_x64(False):
        T = 1 << (ps - 1)
        while T >= W:
            S = max(2, (2 * T) // W)
            arrs = window_call(arrs, ps, S)
            T = S // 2
        arrs = window_call(arrs, ps, 1)
    return tuple(a.reshape(-1) for a in arrs)


@functools.partial(jax.jit,
                   static_argnames=("n_key_words", "run_len", "block_rows",
                                    "interpret"))
def bitonic_merge_runs(planes, n_key_words: int, run_len: int,
                       block_rows: int = 512, interpret: bool = False):
    """Merge `n/run_len` ascending sorted runs (concatenated in the flat
    planes) into one fully ascending order.

    This is the multi-run counterpart of `bitonic_final_phase`, built for
    the sharded counter's post-`all_to_all` arrival buffers: every source
    shard contributes one key-sorted run, so finishing the sort needs only
    the bitonic phases ABOVE the run size — for 8 runs that is 3 phases
    (each a few streaming passes) instead of a full re-sort's ~28.

    Requirements: n and run_len powers of two, run_len a multiple of the
    block size (the caller falls back to `sort_planes_padded` otherwise).
    Odd runs are first reversed — all-ascending runs become the
    alternating ascending/descending layout that makes each 2*run_len
    segment bitonic, which is exactly the state the sort kernel's phase
    q0+1 (q0 = log2 run_len) expects; directions derive from global index
    bits as everywhere else.
    """
    n_planes = len(planes)
    n = planes[0].shape[0]
    if run_len >= n:
        return tuple(planes)
    n_runs = n // run_len
    br, ok = _runs_geometry(n, run_len,
                            _shrink_br_planes(n_planes, block_rows))
    bs = br * LANES
    if not ok:
        raise ValueError(
            f"n={n}, run_len={run_len} must be pow2 multiples of {bs}")
    nb = n // bs
    bB = int(np.log2(bs))
    pP = int(np.log2(n))
    q0 = int(np.log2(run_len))

    odd = (jnp.arange(n_runs) % 2 == 1)[:, None]
    arrs = []
    for p in planes:
        x = p.reshape(n_runs, run_len)
        arrs.append(jnp.where(odd, x[:, ::-1], x).reshape(-1, LANES))

    W = _pick_window(n_planes, br, nb)
    mW = int(np.log2(W))
    window = functools.partial(
        _window_kernel, n_planes=n_planes, n_key_words=n_key_words,
        br=br, W=W)

    def window_call(arrs, ps_lo, ps_hi, S=1):
        scal = jnp.array([[0, ps_lo, ps_hi, S, nb, 0x7FFFFFFF]], jnp.int32)
        outs = _inplace_call(
            window, (nb // W,), n_planes, n, br,
            (n_planes, W * br, LANES), interpret, n_scalars=1,
            n_sems=W * n_planes)(*arrs, scal)
        return list(outs[:n_planes])

    with jax.enable_x64(False):
        p = q0 + 1
        # phases whose cross strides all fit inside one window run batched
        # in a single pass (the run-build counterpart of the sort's
        # build+local pass)
        local_hi = min(bB + mW, pP)
        if p <= local_hi:
            arrs = window_call(arrs, p - bB, local_hi - bB)
            p = local_hi + 1
        for p in range(p, pP + 1):
            ps = p - bB
            T = 1 << (ps - 1)
            while T >= W:
                S = max(2, (2 * T) // W)
                arrs = window_call(arrs, ps, ps, S)
                T = S // 2
            arrs = window_call(arrs, ps, ps, 1)
    return tuple(a.reshape(-1) for a in arrs)


def _runs_geometry(n: int, run_len: int,
                   block_rows: int) -> tuple[int, bool]:
    """(shrunk block_rows, geometry ok) for an n-element stream of
    run_len-sized runs — the single source of truth shared by
    bitonic_merge_runs and merge_runs_supported."""
    br = block_rows
    while br > 8 and (n < 2 * br * LANES or run_len < br * LANES):
        br //= 2
    bs = br * LANES
    ok = not (n % bs or run_len % bs or n & (n - 1)
              or run_len & (run_len - 1))
    return br, ok


def merge_runs_supported(n: int, run_len: int, block_rows: int = 512
                         ) -> bool:
    """Can `bitonic_merge_runs` handle this geometry (else the caller
    full-sorts)?"""
    if run_len >= n:
        return True
    return _runs_geometry(n, run_len, block_rows)[1]


def sort_planes_padded(planes, n_key_words: int, block_rows: int = 512,
                       interpret: bool = False):
    """Sort arbitrary-length planes: pads to the kernel's pow2 geometry
    with sentinel keys, sorts, and slices back to the input length (the
    dropped tail is all sentinels, which sort last)."""
    n = planes[0].shape[0]
    br = block_rows
    while br > 8 and n < 2 * br * LANES:
        br //= 2
    bs = br * LANES
    tgt = max(2 * bs, 1 << int(np.ceil(np.log2(max(n, 1)))))
    padded = []
    for i, p in enumerate(planes):
        fill = SENTINEL if i < n_key_words else 0
        padded.append(jnp.concatenate(
            [p, jnp.full((tgt - n,), fill, p.dtype)]) if tgt != n else p)
    outs = bitonic_sort_planes(tuple(padded), n_key_words,
                               block_rows=block_rows, interpret=interpret)
    return tuple(o[:n] for o in outs)
