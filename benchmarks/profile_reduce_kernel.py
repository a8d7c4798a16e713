"""Component profile of the reduce kernel: run ablated variants on the
TPU to find where the 2.07 ns/elt goes (scan vs rank vs routing vs DMA).

Usage: python benchmarks/profile_reduce_kernel.py [n_log2]
Ablations change RESULTS (they are not correct reductions) — this is a
cost probe only.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from kat_tpu.ops import reduce_kernel as rk


def timed(fn, args, label, n):
    out = fn(*args)
    _ = int(np.asarray(out[-1]))
    ts = []
    for _i in range(5):
        t0 = time.time()
        out = fn(*args)
        _ = int(np.asarray(out[-1]))
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{label:24s} {t*1e3:7.1f}ms  {t/n*1e9:.3f} ns/elt", flush=True)
    return t


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << n_log2
    out_size = n // 2
    rng = np.random.default_rng(0)
    nk = n // 8
    keys = rng.integers(0, nk, n)
    uniq = rng.integers(0, 1 << 54, nk, dtype=np.uint64)
    k64 = np.sort(uniq[keys])
    hi = jax.device_put(jnp.asarray((k64 >> np.uint64(32)).astype(np.uint32)))
    lo = jax.device_put(jnp.asarray(
        (k64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    w = jax.device_put(jnp.ones(n, jnp.uint32))

    fn = jax.jit(lambda a, b, c: rk.reduce_compact_sorted.__wrapped__(
        (a, b), c, out_size, rows_per_tile=64))
    timed(fn, (hi, lo, w), "full", n)

    orig_route = rk._route_compact
    orig_scan = rk._seg_inclusive_scan
    orig_rank = rk._exclusive_rank

    def no_route(planes, mask, dest, window_rows):
        return list(planes), mask

    rk._route_compact = no_route
    fn2 = jax.jit(lambda a, b, c: rk.reduce_compact_sorted.__wrapped__(
        (a, b), c, out_size, rows_per_tile=64))
    # out_size differs to defeat the jit cache keyed on call identity
    timed(fn2, (hi, lo, w), "no-route", n)
    rk._route_compact = orig_route

    rk._seg_inclusive_scan = lambda v, f: v
    fn3 = jax.jit(lambda a, b, c: rk.reduce_compact_sorted.__wrapped__(
        (a, b), c, out_size, rows_per_tile=64))
    timed(fn3, (hi, lo, w), "no-scan", n)
    rk._seg_inclusive_scan = orig_scan

    rk._exclusive_rank = lambda m: jnp.zeros(m.shape, jnp.int32)
    fn4 = jax.jit(lambda a, b, c: rk.reduce_compact_sorted.__wrapped__(
        (a, b), c, out_size, rows_per_tile=64))
    timed(fn4, (hi, lo, w), "no-rank", n)
    rk._exclusive_rank = orig_rank

    rk._route_compact = no_route
    rk._seg_inclusive_scan = lambda v, f: v
    rk._exclusive_rank = lambda m: jnp.zeros(m.shape, jnp.int32)
    fn5 = jax.jit(lambda a, b, c: rk.reduce_compact_sorted.__wrapped__(
        (a, b), c, out_size, rows_per_tile=64))
    timed(fn5, (hi, lo, w), "dma+detect only", n)
    rk._route_compact = orig_route
    rk._seg_inclusive_scan = orig_scan
    rk._exclusive_rank = orig_rank


if __name__ == "__main__":
    main()
