"""Sequence parallelism for very long contigs: halo-exchanged window
coverage over a device mesh.

The reference streams multi-Mbp contigs through 4KB chunks with a
(k-1)-char seam so no window is lost
(mer_overlap_sequence_parser.hpp:44-52) and interlaces sequences over
threads (sect.cc:480-486).  The TPU-native analogue (SURVEY §2.5 P8 /
§5 long-context): a contig's base stream is split into contiguous spans,
one per device; each device receives the first (k-1) bases of the NEXT span
via `ppermute` (the seam reborn as a ring halo exchange), extracts its
windows, and queries a replicated count table locally.  Per-span coverage
vectors concatenate into the contig's full per-base profile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import kmers
from ..core.counting import CountTable, lookup


@functools.partial(jax.jit, static_argnames=("k", "canonical", "mesh"))
def _halo_counts(table: CountTable, codes: jax.Array, k: int,
                 canonical: bool, mesh: Mesh):
    axis = mesh.axis_names[0]
    n = int(np.prod(mesh.devices.shape))
    span = codes.shape[0] // n

    def body(codes_l, thi, tlo, tc):
        table_l = CountTable(thi, tlo, tc, jnp.zeros((), jnp.int32))
        # Ring halo: my left edge goes to my left neighbour, so every
        # device receives the first (k-1) bases of the NEXT span.  The last
        # span receives span 0's edge (wrapped); its affected windows fall
        # beyond L-k+1 and are sliced off by the caller.
        edge = jax.lax.slice_in_dim(codes_l.reshape(-1), 0, k - 1)
        halo = jax.lax.ppermute(
            edge, axis, perm=[(i, (i - 1) % n) for i in range(n)])
        ext = jnp.concatenate([codes_l.reshape(-1), halo])
        hi, lo, valid = kmers.extract_kmers(ext[None], k, canonical=False)
        if canonical:
            qh, ql = kmers.canonicalize(hi, lo, k)
        else:
            qh, ql = hi, lo
        counts = lookup(table_l, qh, ql)
        counts = jnp.where(valid, counts, 0)
        gc = jnp.where(valid, kmers.gc_count(hi, lo).astype(jnp.int32), -1)
        return counts.reshape(1, -1), gc.reshape(1, -1)

    spec = P(axis, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec, P(), P(), P()),
        out_specs=(spec, spec),
        check_vma=False)
    return fn(codes.reshape(n, span), table.keys_hi, table.keys_lo,
              table.counts)


def sharded_window_profile(table: CountTable, codes: np.ndarray, k: int,
                           canonical: bool, mesh: Mesh
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Per-window (counts, gc) of one long 2-bit-coded sequence, computed
    with one span per mesh device and a (k-1) ring halo.

    codes: [L] uint8 codes (>=4 invalid).  Returns two [L - k + 1] arrays:
    uint32 counts (0 for invalid windows) and int32 GC (-1 for invalid).
    """
    codes = np.asarray(codes, np.uint8)
    L = codes.shape[0]
    if L < k:
        return np.zeros(0, np.uint32), np.zeros(0, np.int32)
    n = int(np.prod(mesh.devices.shape))
    span = -(-L // n)  # ceil
    pad = n * span - L
    padded = np.concatenate([codes, np.full(pad, 255, np.uint8)])
    counts, gc = _halo_counts(table, jnp.asarray(padded), k, canonical,
                              mesh)
    nw = L - k + 1
    return (np.asarray(counts).reshape(-1)[:nw],
            np.asarray(gc).reshape(-1)[:nw])


def sharded_window_counts(table: CountTable, codes: np.ndarray, k: int,
                          canonical: bool, mesh: Mesh) -> np.ndarray:
    """Counts-only convenience wrapper over sharded_window_profile."""
    return sharded_window_profile(table, codes, k, canonical, mesh)[0]
