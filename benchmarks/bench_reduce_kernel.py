"""Microbenchmark: Pallas reduce-compact kernel vs the XLA scan+sort path.

Run on the real TPU (one process at a time!):
    python benchmarks/bench_reduce_kernel.py [n_log2] [rt]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from kat_tpu.core.counting import _segmented_cumsum
from kat_tpu.core.kmers import SENTINEL
from kat_tpu.ops.reduce_kernel import reduce_compact_sorted


def sync(x):
    return float(np.asarray(x).ravel()[0])  # tunnel-safe sync


def xla_post_sort(hi_s, lo_s, w_s, out_size):
    """The post-sort part of counting._unique_reduce (scan + compact sort)."""
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
    return chi[:out_size], clo[:out_size], cw[:out_size], n_unique


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rt = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n = 1 << n_log2
    out_size = n // 2
    print(f"devices: {jax.devices()}  n={n}  rt={rt}")

    rng = np.random.default_rng(0)
    nk = n // 8  # ~8x multiplicity like 8-16x coverage reads
    keys = rng.integers(0, nk, n)
    uniq = rng.integers(0, 1 << 54, nk, dtype=np.uint64)
    k64 = np.sort(uniq[keys])
    hi = (k64 >> np.uint64(32)).astype(np.uint32)
    lo = (k64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    w = np.ones(n, np.uint32)

    dhi = jax.device_put(jnp.asarray(hi))
    dlo = jax.device_put(jnp.asarray(lo))
    dw = jax.device_put(jnp.asarray(w))

    # --- pallas kernel ---
    fn = jax.jit(lambda a, b, c: reduce_compact_sorted(
        (a, b), c, out_size, rows_per_tile=rt))
    t0 = time.time()
    out = fn(dhi, dlo, dw)
    nu = sync(out[-1])
    print(f"pallas compile+run: {time.time() - t0:.2f}s  n_unique={nu}")
    times = []
    for _ in range(5):
        t0 = time.time()
        out = fn(dhi, dlo, dw)
        sync(out[-1])
        times.append(time.time() - t0)
    tp = min(times)
    print(f"pallas best: {tp*1e3:.1f}ms  ({tp/n*1e9:.3f} ns/elt)")

    # --- xla scan + sort ---
    fx = jax.jit(lambda a, b, c: xla_post_sort(a, b, c, out_size))
    t0 = time.time()
    out = fx(dhi, dlo, dw)
    nu2 = sync(out[-1])
    print(f"xla compile+run: {time.time() - t0:.2f}s  n_unique={nu2}")
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fx(dhi, dlo, dw)
        sync(out[-1])
        times.append(time.time() - t0)
    tx = min(times)
    print(f"xla best: {tx*1e3:.1f}ms  ({tx/n*1e9:.3f} ns/elt)")
    print(f"speedup: {tx/tp:.2f}x   (nu match: {nu == nu2})")


if __name__ == "__main__":
    main()
