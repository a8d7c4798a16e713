"""Device-side reductions over count tables: histogram binning, GC-vs-coverage
matrices, spectra.  These replace the reference's per-thread hash-slice scans
merged at the end (histogram.cc:183-199, gcp.cc:179-197, P3/P4 in SURVEY §2.5)
with single scatter-add passes; under a mesh they run per-shard and merge with
`psum`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .counting import CountTable
from .kmers import gc_count


@functools.partial(jax.jit, static_argnames=("base", "ceil", "inc",
                                              "nb_buckets"))
def hist_from_counts(counts: jax.Array, base: int, ceil: int, inc: int,
                     nb_buckets: int) -> jax.Array:
    """Occurrence histogram with KAT's bucket rules (histogram.cc:188-196):
    val < base -> bucket 0; val > ceil -> last bucket; else (val-base)/inc.
    Padding entries (count 0 in a table) are excluded — jellyfish hashes
    never store zero counts.
    """
    c = counts.astype(jnp.int64)
    bucket = jnp.where(c < base, 0,
                       jnp.where(c > ceil, nb_buckets - 1,
                                 (c - base) // inc)).astype(jnp.int32)
    w = (c > 0).astype(jnp.uint64)
    return jnp.zeros((nb_buckets,), jnp.uint64).at[bucket].add(w)


@functools.partial(jax.jit, static_argnames=("mer_len", "cvg_bins"))
def gcp_matrix(table: CountTable, mer_len: int, cvg_bins: int,
               cvg_scale: float = 1.0) -> jax.Array:
    """GC-count x coverage matrix of distinct k-mers (gcp.cc:179-197).

    Returns [mer_len + 1, cvg_bins + 1] uint64; rows indexed by GC count
    (0..mer_len), columns by scaled coverage (clamped to cvg_bins).  Note the
    reference allocates `width = mer_len` and silently drops GC == mer_len
    entries at merge/print (SURVEY §5.1.3) — the writer applies that quirk.
    Generic over narrow/wide tables.
    """
    from . import tables as _tables

    gc = _tables.gc_of_keys(table).astype(jnp.int32)
    c = table.counts.astype(jnp.float64)
    cvg_pos = jnp.where(table.counts == 0, 0,
                        jnp.ceil(c * cvg_scale)).astype(jnp.int64)
    cvg_pos = jnp.minimum(cvg_pos, cvg_bins).astype(jnp.int32)
    w = (table.counts > 0).astype(jnp.uint64)
    out = jnp.zeros((mer_len + 1, cvg_bins + 1), jnp.uint64)
    return out.at[gc, cvg_pos].add(w, mode="drop")


@functools.partial(jax.jit, static_argnames=("nb_bins",))
def spectrum(counts: jax.Array, weights: jax.Array, nb_bins: int) -> jax.Array:
    """CompCounters::updateSpectrum (comp_counters.cc:130-140): count<=0 ->
    bin 0, count>=nb_bins -> last bin, else bin=count.  `weights` masks which
    entries participate (and can carry multiplicity)."""
    c = counts.astype(jnp.int64)
    b = jnp.where(c <= 0, 0,
                  jnp.where(c >= nb_bins, nb_bins - 1, c)).astype(jnp.int32)
    return jnp.zeros((nb_bins,), jnp.uint64).at[b].add(
        weights.astype(jnp.uint64))
