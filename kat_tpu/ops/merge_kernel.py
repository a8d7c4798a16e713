"""Memory-bounded Pallas bitonic merge: in-place HBM compare-exchange.

The XLA formulation (ops/merge.py) is correct but its 26 stages are all
materialized by XLA's buffer assignment (36GB at 2^26), so it cannot run
inside the fused flush.  A bitonic merge is exactly the FINAL PHASE of
the bitonic sort, so this module is now a thin wrapper over the shared
cross-stage + W-block window kernels in ops/sort_kernel.py: cross-block
stages at strides >= W run as paired-block in-place passes, and the last
log2(W) strides plus every intra-block merge tail collapse into one
VMEM window pass.

Keys are tuples of uint32 word planes (lexicographic significance order)
with an arbitrary number of uint32 payload planes riding along.

Bandwidth: (log2(n_blocks / W) + 1) * (read + write) passes — ~25ms at
2^26 x 3 planes on v5e for the pre-window schedule, less now, vs ~330ms
for re-sorting through lax.sort.

Reference role: jellyfish's hash merge during cooperative resize
(deps/jellyfish-2.2.0/include/jellyfish/hash_counter.hpp) — here the
periodic consolidation of the sorted resident table with a sorted fresh
batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

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


def bitonic_merge_planes(planes, n_key_words: int, block_rows: int = 512,
                         interpret: bool = False):
    """In-place bitonic merge of a bitonic plane list.

    planes: tuple of equal-length uint32 arrays, length a power of two and
    a multiple of block_rows*128, laid out as [ascending | descending].
    The first n_key_words planes are the lexicographic key.  Returns the
    fully ascending planes.

    Runs through the shared cross-stage + window kernels in
    ops/sort_kernel.py (a bitonic merge is exactly the final phase of the
    bitonic sort, uniformly ascending); the window pass cuts the HBM
    pass count from log2(n_blocks)+1 to log2(n_blocks/W)+1.
    """
    from .sort_kernel import bitonic_final_phase

    return bitonic_final_phase(planes, n_key_words,
                               block_rows=block_rows, interpret=interpret)


def merge_sorted_kernel(a_words, a_payload, b_words, b_payload,
                        block_rows: int = 512, interpret: bool = False):
    """Kernel-backed drop-in for ops.merge.merge_sorted: merge two sorted
    sentinel-padded streams; returns (words, payload) padded to a block
    multiple (NOT a power of two — the final-phase kernel's virtual
    +inf blocks make non-pow2 bitonic merges legal, so table+windows
    merges stop paying for up-to-2x pow2 padding).

    Layout [reversed(b) | a | pad]: descending-then-ascending is bitonic
    and APPENDING sentinels keeps it so (the [a | reversed(b)] layout
    would not survive end-padding)."""
    from .sort_kernel import bitonic_final_phase

    n_words = len(a_words)
    na, nb_len = a_words[0].shape[0], b_words[0].shape[0]
    br = block_rows
    total = na + nb_len
    while br > 8 and total < 2 * br * LANES:
        br //= 2
    bs = br * LANES
    n = max(2 * bs, ((total + bs - 1) // bs) * bs)
    pad = n - total
    planes = []
    for i, (a, b) in enumerate(zip(list(a_words) + list(a_payload),
                                   list(b_words) + list(b_payload))):
        fill = SENTINEL if i < n_words else 0
        parts = [b[::-1], a]
        if pad:
            parts.append(jnp.full((pad,), fill, a.dtype))
        planes.append(jnp.concatenate(parts))
    outs = bitonic_final_phase(tuple(planes), n_words,
                               block_rows=block_rows,
                               interpret=interpret)
    return outs[:n_words], outs[n_words:]
