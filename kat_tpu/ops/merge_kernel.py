"""Memory-bounded Pallas bitonic merge: in-place HBM compare-exchange.

The XLA formulation (ops/merge.py) is correct but its 26 stages are all
materialized by XLA's buffer assignment (36GB at 2^26), so it cannot run
inside the fused flush.  This kernel performs the same bitonic merge with
exactly TWO live blocks per step:

  grid = (cross_stages + 1, n_blocks / 2), executed sequentially on TPU
  (stage-major).  A cross-block stage with block-stride sb pairs block
  b1 = ((j & ~(sb-1)) << 1) | (j & (sb-1)) with b2 = b1 + sb, DMAs both
  in, writes min lexicographically to b1 / max to b2 (in place via
  input_output_aliasing).  The final grid stage runs every remaining
  stride inside VMEM: row-level strides via [g, 2, s, 128] reshapes,
  lane-level strides via XOR-partner rolls.

Keys are tuples of uint32 word planes (lexicographic significance order)
with an arbitrary number of uint32 payload planes riding along.

Bandwidth: (log2(n_blocks) + 1) * (read + write) passes — ~25ms at 2^26
x 3 planes on v5e vs ~330ms for re-sorting through lax.sort.

Reference role: jellyfish's hash merge during cooperative resize
(deps/jellyfish-2.2.0/include/jellyfish/hash_counter.hpp) — here the
periodic consolidation of the sorted resident table with a sorted fresh
batch.
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


def _lex_less(a_words, b_words):
    less = jnp.zeros(a_words[0].shape, jnp.bool_)
    eq = jnp.ones(a_words[0].shape, jnp.bool_)
    for a, b in zip(a_words, b_words):
        less = less | (eq & (a < b))
        eq = eq & (a == b)
    return less


def _cmpx_blocks(v1, v2, n_key_words):
    """(min, max) of two equal-shape plane lists, ordered by the first
    n_key_words planes lexicographically; payload planes follow keys."""
    less2 = _lex_less(v2[:n_key_words], v1[:n_key_words])
    lo = [jnp.where(less2, b, a) for a, b in zip(v1, v2)]
    hi = [jnp.where(less2, a, b) for a, b in zip(v1, v2)]
    return lo, hi


def _intra_block(planes, n_key_words, br):
    """All strides < br*LANES on a [br, LANES] block, in VMEM."""
    # row-level strides: br/2 .. 1 rows
    sr = br // 2
    while sr >= 1:
        shaped = [p.reshape(-1, 2, sr, LANES) for p in planes]
        top = [p[:, 0] for p in shaped]
        bot = [p[:, 1] for p in shaped]
        lo, hi = _cmpx_blocks(top, bot, n_key_words)
        planes = [
            jnp.concatenate([a[:, None], b[:, None]], axis=1).reshape(
                br, LANES)
            for a, b in zip(lo, hi)]
        sr //= 2
    # lane-level strides: 64 .. 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    s = LANES // 2
    while s >= 1:
        is_low = (lane & s) == 0
        partners = [
            jnp.where(is_low, pltpu.roll(p, LANES - s, axis=1),
                      pltpu.roll(p, s, axis=1))
            for p in planes]
        pk = partners[:n_key_words]
        xk = planes[:n_key_words]
        # no jnp.where over bool operands (i1 select doesn't lower)
        take = ((is_low & _lex_less(pk, xk))
                | (~is_low & _lex_less(xk, pk)))
        planes = [jnp.where(take, pv, x)
                  for pv, x in zip(partners, planes)]
        s //= 2
    return planes


def _merge_kernel(*refs, n_planes: int, n_key_words: int, br: int,
                  nb: int, n_cross: int):
    hbm_in = refs[:n_planes]             # ANY memory space
    hbm_out = refs[n_planes:2 * n_planes]  # aliased to hbm_in
    out_dummy = refs[2 * n_planes]       # (1,1) SMEM marker output
    vmem, sem_in, sem_out = refs[2 * n_planes + 1:]

    g = pl.program_id(0)
    j = pl.program_id(1)

    def block_ids():
        sb = (nb // 2) >> g
        sb = jnp.maximum(sb, 1)
        b1 = ((j & ~(sb - 1)) << 1) | (j & (sb - 1))
        return b1, b1 + sb

    is_cross = g < n_cross
    sb_b1, sb_b2 = block_ids()
    # final stage: blocks 2j and 2j+1, handled independently
    b1 = jnp.where(is_cross, sb_b1, 2 * j)
    b2 = jnp.where(is_cross, sb_b2, 2 * j + 1)

    # Stage 0 reads the inputs; later stages read the (aliased) outputs —
    # interpret mode does not identify the two buffers, and on hardware
    # this also keeps every read's provenance explicit.
    def load(src):
        for i, (half, blk) in enumerate(((0, b1), (1, b2))):
            cps = [pltpu.make_async_copy(
                src[p].at[pl.ds(blk * br, br), :],
                vmem.at[p, half], sem_in.at[i * n_planes + p])
                for p in range(n_planes)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

    @pl.when(g == 0)
    def _load_first():
        load(hbm_in)

    @pl.when(g != 0)
    def _load_rest():
        load(hbm_out)

    v1 = [vmem[p, 0] for p in range(n_planes)]
    v2 = [vmem[p, 1] for p in range(n_planes)]

    @pl.when(is_cross)
    def _cross():
        lo, hi = _cmpx_blocks(v1, v2, n_key_words)
        for p in range(n_planes):
            vmem[p, 0] = lo[p]
            vmem[p, 1] = hi[p]

    @pl.when(~is_cross)
    def _intra():
        o1 = _intra_block(v1, n_key_words, br)
        o2 = _intra_block(v2, n_key_words, br)
        for p in range(n_planes):
            vmem[p, 0] = o1[p]
            vmem[p, 1] = o2[p]

    for i, (half, blk) in enumerate(((0, b1), (1, b2))):
        cps = [pltpu.make_async_copy(
            vmem.at[p, half],
            hbm_out[p].at[pl.ds(blk * br, br), :],
            sem_out.at[i * n_planes + p])
            for p in range(n_planes)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    out_dummy[0, 0] = jnp.int32(0)


@functools.partial(jax.jit,
                   static_argnames=("n_key_words", "block_rows",
                                    "interpret"))
def bitonic_merge_planes(planes, n_key_words: int, block_rows: int = 512,
                         interpret: bool = False):
    """In-place bitonic merge of a bitonic plane list.

    planes: tuple of equal-length uint32 arrays, length a power of two and
    a multiple of block_rows*128, laid out as [ascending | descending].
    The first n_key_words planes are the lexicographic key.  Returns the
    fully ascending planes.
    """
    n_planes = len(planes)
    n = planes[0].shape[0]
    br = block_rows
    # at least two blocks so the paired-step grid is well-formed
    while br > 8 and n < 2 * br * LANES:
        br //= 2
    bs = br * LANES
    if n % bs or (n // bs) & ((n // bs) - 1) or n // bs < 2:
        raise ValueError(f"n={n} must be a pow2 multiple of 2*{bs}")
    nb = n // bs
    n_cross = int(np.log2(nb))  # block strides nb/2 .. 1

    kernel = functools.partial(
        _merge_kernel, n_planes=n_planes, n_key_words=n_key_words,
        br=br, nb=nb, n_cross=n_cross)

    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(n_cross + 1, nb // 2),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
            out_specs=(
                [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
                + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
            out_shape=(
                [jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32)
                 for _ in range(n_planes)]
                + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]),
            input_output_aliases={p: p for p in range(n_planes)},
            scratch_shapes=[
                pltpu.VMEM((n_planes, 2, br, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2 * n_planes,)),
                pltpu.SemaphoreType.DMA((2 * n_planes,)),
            ],
            interpret=interpret,
        )(*[p.reshape(-1, LANES) for p in planes])
    return tuple(o.reshape(-1) for o in outs[:n_planes])


def merge_sorted_kernel(a_words, a_payload, b_words, b_payload,
                        block_rows: int = 512, interpret: bool = False):
    """Kernel-backed drop-in for ops.merge.merge_sorted: merge two sorted
    sentinel-padded streams; returns (words, payload) of pow2 length."""
    n_words = len(a_words)
    na, nb_len = a_words[0].shape[0], b_words[0].shape[0]
    n = 1 << int(np.ceil(np.log2(max(na + nb_len, 2))))
    n = max(n, 16 * LANES)  # >= two 8-row blocks
    pad_b = n - na - nb_len
    planes = []
    for i, (a, b) in enumerate(zip(list(a_words) + list(a_payload),
                                   list(b_words) + list(b_payload))):
        fill = SENTINEL if i < n_words else 0
        bp = jnp.concatenate(
            [b, jnp.full((pad_b,), fill, b.dtype)]) if pad_b else b
        planes.append(jnp.concatenate([a, bp[::-1]]))
    outs = bitonic_merge_planes(tuple(planes), n_words,
                                block_rows=block_rows,
                                interpret=interpret)
    return outs[:n_words], outs[n_words:]
