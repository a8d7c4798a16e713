"""K-mer-space sharded counting over a `jax.sharding.Mesh`.

This is the TPU-native replacement for jellyfish's single shared CAS hash
(reference deps/jellyfish-2.2.0/include/jellyfish/hash_counter.hpp
`cooperative::hash_counter` + large_hash_array.hpp `add`/`claim_key`; SURVEY
§2.5 P2/P3/P9): instead of N pthreads CAS-inserting into one mmap'd array,
every device

  1. extracts k-mers from its slice of the read batch (data parallelism —
     the reference's cooperative input pool, P1),
  2. routes each k-mer to its *owner shard* `mix(key) % n_devices` with a
     tiled `all_to_all` over the mesh (the moral equivalent of TP/EP
     sharding),
  3. sort+segment-reduces arrivals into its resident shard table
     (deterministic, functional — no CAS, no barriers).

Low-dimensional results (histograms, GC matrices, comp counters) are then
per-shard reductions merged with `psum` (P4).  Tables never need a
cooperative resize barrier (P7): capacity is static per shard and overflow
is reported to the host, which re-launches at 2x — the observable behaviour
of hash_counter.hpp:204-244's size doubling.

Works on any mesh shape (multi-axis meshes route over the flattened device
space) and for both narrow (k <= 31, 2-word) and wide (k <= 127,
4/6/8-word) keys.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import wide as wide_mod
from ..core.counting import CountTable, _unique_reduce, table_from_numpy
from ..core.kmers import MAX_K, SENTINEL, words_for_k
from ..core.tables import extract
from ..core.wide import WideTable, _unique_reduce_wide


@functools.lru_cache(maxsize=None)
def _cached_mesh(n: int, shape: tuple, axis_names: tuple) -> Mesh:
    devs = jax.devices()
    arr = np.asarray(devs[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def make_mesh(n_devices: int | None = None,
              shape: Sequence[int] | None = None,
              axis_names: Sequence[str] = ("shards",)) -> Mesh:
    """Mesh over the first n devices; default 1D axis "shards".  Cached so
    co-partitioned counters (comp's inputs) share one Mesh object."""
    n = n_devices or len(jax.devices())
    shape = tuple(shape) if shape is not None else (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return _cached_mesh(n, shape, tuple(axis_names))


def shard_hash(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """32-bit finalizer-style mixer over a packed (hi, lo) key.

    Plays the role of jellyfish's random GF(2) matrix hash
    (rectangular_binary_matrix.hpp:138-146) for shard ownership: k-mer keys
    are highly structured (low entropy in high bits), so counts would skew
    badly under a plain modulo.  murmur3-fmix32 over the mixed words.
    """
    return shard_hash_words((hi, lo))


def shard_hash_words(words) -> jax.Array:
    x = words[0] ^ jnp.uint32(0x9E3779B9)
    for w in words:
        x = (x ^ w) * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def owner_shard(words, k: int, n_dest: int) -> jax.Array:
    """Shard ownership of a key: hash of its CANONICAL form.

    Owning by canonical hash (not raw hash) guarantees that a key, its
    reverse complement, and any canonicalized probe of it land on the same
    shard — the property that makes the whole analysis phase (comp's
    cross-hash probes, sect/cold lookups) local joins on co-partitioned
    shards (SURVEY §7 step 6; reference src/comp.cc:447 canonicalizes
    pass-2 probes unconditionally)."""
    from ..core import tables

    cwords = tables.canonicalize(words, k)
    return (shard_hash_words(cwords) % jnp.uint32(n_dest)).astype(jnp.int32)


def _route_local(words, w, n_dest: int, cap: int, k: int):
    """Bucket local k-mers by destination shard into [n_dest, cap] buffers.

    Zero-weight (invalid/padding) entries are parked in a virtual overflow
    destination so they can't flood a real bucket.  Returns word buffers, a
    weight buffer, and the number of *real* k-mers dropped because a bucket
    overflowed (host checks and re-launches with bigger cap).
    """
    W = words[0].shape[0]
    dest = owner_shard(words, k, n_dest)
    dest = jnp.where(w > 0, dest, n_dest)  # park padding
    d_s, *ws_s, w_s = jax.lax.sort(
        (dest, *words, w.astype(jnp.uint32)), num_keys=1)

    idx = jnp.arange(W, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                d_s[1:] != d_s[:-1]])
    # Forward-propagated segment start via a manual Hillis-Steele max loop
    # (jnp.cummax / associative_scan compile pathologically on TPU).
    seg_start = jnp.where(is_first, idx, 0)
    d = 1
    while d < W:
        seg_start = jnp.maximum(
            seg_start,
            jnp.concatenate([jnp.zeros((d,), jnp.int32), seg_start[:-d]]))
        d *= 2
    pos = idx - seg_start

    in_range = (pos < cap) & (d_s < n_dest)
    target = jnp.where(in_range, d_s * cap + pos, n_dest * cap)
    bufs = [jnp.full((n_dest * cap,), SENTINEL, jnp.uint32).at[target].set(
        wd, mode="drop").reshape(n_dest, cap) for wd in ws_s]
    buf_w = jnp.zeros((n_dest * cap,), jnp.uint32).at[target].set(
        w_s, mode="drop").reshape(n_dest, cap)
    dropped = jnp.sum(jnp.where((~in_range) & (d_s < n_dest), w_s, 0),
                      dtype=jnp.uint64)
    return bufs, buf_w, dropped


def _count_step_local(codes, *table_arrays, k: int, canonical: bool,
                      n_dest: int, route_cap: int, table_cap: int,
                      axis_names: tuple[str, ...], n_words: int,
                      use_kernel: bool):
    """Per-device body: extract -> route (all_to_all) -> absorb."""
    twords = table_arrays[:n_words]
    tc = table_arrays[n_words]
    codes = codes.reshape(-1, codes.shape[-1])
    words, valid = extract(codes, k, canonical)
    words = tuple(wd.reshape(-1) for wd in words)
    w = valid.reshape(-1).astype(jnp.uint32)

    bufs, bw, dropped = _route_local(words, w, n_dest, route_cap, k)
    rwords = [jax.lax.all_to_all(b, axis_names, 0, 0, tiled=True)
              for b in bufs]
    rw = jax.lax.all_to_all(bw, axis_names, 0, 0, tiled=True)

    cat = tuple(jnp.concatenate([tw.reshape(-1), rwd.reshape(-1)])
                for tw, rwd in zip(twords, rwords))
    cw = jnp.concatenate([tc.reshape(-1), rw.reshape(-1)])
    if n_words == 2:
        out = _unique_reduce(cat[0], cat[1], cw, table_cap,
                             use_kernel=use_kernel)
    else:
        out = _unique_reduce_wide(cat, cw, table_cap,
                                  use_kernel=use_kernel)
    *nwords, nc, n_unique = out

    dropped = jax.lax.psum(dropped, axis_names)
    return (*(wd[None] for wd in nwords), nc[None], n_unique[None], dropped)


class ShardedCounter:
    """Streaming k-mer counter whose table lives sharded across a mesh.

    Local shard tables are [1, capacity] slices of [n_devices, capacity]
    global word/count arrays.  `add_codes` absorbs one [rows, L] uint8 code
    batch (rows padded to a multiple of n_devices).  `finish` returns a
    host-merged CountTable (k <= 31) or WideTable (k <= 127); `histogram`
    reduces on device and `psum`s.
    """

    def __init__(self, mesh: Mesh, k: int, canonical: bool = True,
                 shard_capacity: int = 1 << 18,
                 route_slack: float = 2.0):
        self.mesh = mesh
        self.axis_names = tuple(mesh.axis_names)
        self.k = k
        self.canonical = canonical
        self.n = int(np.prod(mesh.devices.shape))
        self.n_words = words_for_k(k)
        self.shard_capacity = int(shard_capacity)
        self.route_slack = float(route_slack)
        self.dropped = 0

        spec = P(self.axis_names if len(self.axis_names) > 1
                 else self.axis_names[0], None)
        self._tspec = spec
        self._tsharding = NamedSharding(mesh, spec)
        self._nsharding = NamedSharding(mesh, P(spec[0]))
        self.multiprocess = jax.process_count() > 1

        def filled(shape, sharding, fill, dtype):
            # make_array_from_callback works in single- AND multi-process
            # runs (device_put of a full array requires every device to be
            # addressable, which fails across hosts)
            def piece(idx):
                pshape = tuple(
                    len(range(*s.indices(d))) for s, d in zip(idx, shape))
                return np.full(pshape, fill, dtype)

            return jax.make_array_from_callback(shape, sharding, piece)

        cap_shape = (self.n, self.shard_capacity)
        self.twords = [filled(cap_shape, self._tsharding, SENTINEL,
                              np.uint32) for _ in range(self.n_words)]
        self.tc = filled(cap_shape, self._tsharding, 0, np.uint32)
        self.n_unique = filled((self.n,), self._nsharding, 0, np.int32)
        self._steps: dict = {}

    def _step_fn(self, rows: int, length: int):
        key = (rows, length)
        if key not in self._steps:
            windows = (rows // self.n) * (length - self.k + 1)
            route_cap = int(min(
                windows,
                np.ceil(windows / self.n * self.route_slack)))
            route_cap = max(route_cap, 1)
            spec = self._tspec
            nspec = P(spec[0])
            nw = self.n_words
            # Pallas kernel only when the mesh actually sits on TPU
            # devices (the default backend can be TPU while a virtual CPU
            # mesh is in use, e.g. dryruns)
            mesh_platform = self.mesh.devices.flat[0].platform
            body = functools.partial(
                _count_step_local, k=self.k, canonical=self.canonical,
                n_dest=self.n, route_cap=route_cap,
                table_cap=self.shard_capacity, axis_names=self.axis_names,
                n_words=nw,
                use_kernel=mesh_platform in ("tpu", "axon")
                and not os.environ.get("KAT_TPU_NO_KERNEL"))
            fn = shard_map(
                body, mesh=self.mesh,
                in_specs=(spec,) + (spec,) * (nw + 1),
                out_specs=(spec,) * (nw + 1) + (nspec, P()))
            self._steps[key] = jax.jit(
                fn, donate_argnums=tuple(range(1, nw + 2)))
        return self._steps[key]

    def add_codes(self, codes) -> None:
        """Absorb one [rows, L] uint8 code batch.

        In a multi-process run every process passes its OWN rows (the same
        row count everywhere — pad short batches); the global batch is the
        process-major concatenation."""
        codes = np.asarray(codes, np.uint8)
        rows, length = codes.shape
        if self.multiprocess:
            n_local = jax.local_device_count()
            if rows % n_local:
                pad = n_local - rows % n_local
                codes = np.concatenate(
                    [codes, np.full((pad, length), 255, np.uint8)])
                rows += pad
            rows *= jax.process_count()
            codes = jax.make_array_from_process_local_data(
                self._tsharding, codes, (rows, length))
        else:
            if rows % self.n:
                pad = self.n - rows % self.n
                codes = np.concatenate(
                    [codes, np.full((pad, length), 255, np.uint8)])
                rows += pad
            codes = jax.device_put(jnp.asarray(codes), self._tsharding)
        fn = self._step_fn(rows, length)
        *outs, self.n_unique, dropped = fn(codes, *self.twords, self.tc)
        self.twords = list(outs[:self.n_words])
        self.tc = outs[self.n_words]
        self.dropped += int(dropped)

    def _host_array(self, arr) -> np.ndarray:
        """Full host copy of a mesh-sharded array (allgather across
        processes when the mesh spans hosts)."""
        if self.multiprocess:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(arr, tiled=True))
        return np.asarray(arr)

    def check(self) -> None:
        if self.dropped:
            raise RuntimeError(
                f"{self.dropped} k-mers dropped in routing; increase "
                "route_slack")
        n_u = self._host_array(self.n_unique)
        if (n_u > self.shard_capacity).any():
            raise RuntimeError(
                f"shard table overflow: {n_u.max()} unique keys > capacity "
                f"{self.shard_capacity}")

    def finish(self) -> CountTable | WideTable:
        """Merge shard tables into one host-side sorted table."""
        self.check()
        n_u = self._host_array(self.n_unique)
        c = self._host_array(self.tc).astype(np.uint32)
        words = [self._host_array(tw).astype(np.uint64)
                 for tw in self.twords]
        parts_c = [c[i, :n_u[i]] for i in range(self.n)]
        all_c = np.concatenate(parts_c) if parts_c else np.zeros(0, np.uint32)
        cap = 1 << max(1, int(np.ceil(np.log2(max(len(all_c), 2)))))
        if self.n_words == 2:
            keys = (words[0] << np.uint64(32)) | words[1]
            parts_k = [keys[i, :n_u[i]] for i in range(self.n)]
            all_k = np.concatenate(parts_k) if parts_k else \
                np.zeros(0, np.uint64)
            return table_from_numpy(all_k, all_c, capacity=cap)
        parts_w = [np.stack([wd[i, :n_u[i]] for wd in words], axis=1)
                   for i in range(self.n)]
        all_w = (np.concatenate(parts_w) if parts_w else
                 np.zeros((0, self.n_words), np.uint64))
        return wide_mod.table_from_words(all_w.astype(np.uint32), all_c,
                                         capacity=cap)

    def histogram(self, base: int, ceil: int, inc: int,
                  nb_buckets: int) -> np.ndarray:
        """Sharded histogram: per-shard bincount + psum (SURVEY P3/P4)."""
        self.check()
        spec = self._tspec

        def local_hist(counts):
            c = counts.reshape(-1).astype(jnp.int64)
            bucket = jnp.where(c < base, 0,
                               jnp.where(c > ceil, nb_buckets - 1,
                                         (c - base) // inc)).astype(jnp.int32)
            w = (c > 0).astype(jnp.uint64)
            h = jnp.zeros((nb_buckets,), jnp.uint64).at[bucket].add(w)
            return jax.lax.psum(h, self.axis_names)

        fn = shard_map(local_hist, mesh=self.mesh, in_specs=(spec,),
                       out_specs=P())
        return np.asarray(jax.jit(fn)(self.tc), np.uint64)
