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
