"""Measure lax.sort scaling on the TPU: flat vs batched, sizes 2^20..2^26.

Decides the fresh-window sort strategy: if smaller/batched sorts are
cheaper per element, a Pallas direction-aware merge tree over
lax.sort-generated runs wins; if not, a full Pallas bitonic sort (local
block sort + cross-block passes) is needed to beat the flat sort.

All numbers include a ~29ms dispatch round-trip over the dev tunnel
(printed first as the noop floor; subtract it).

Usage: python benchmarks/profile_sort.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, args, label, n):
    t0 = time.time()
    out = fn(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    tc = time.time() - t0
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{label:36s} {t*1e3:8.1f}ms  {t/n*1e9:6.3f} ns/elt"
          f"   (compile+first {tc:.0f}s)", flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    nmax = 1 << 26
    hi_h = rng.integers(0, 1 << 22, nmax, dtype=np.uint32)
    lo_h = rng.integers(0, 1 << 32, nmax, dtype=np.uint32)
    hi = jax.device_put(jnp.asarray(hi_h))
    lo = jax.device_put(jnp.asarray(lo_h))

    noop = jax.jit(lambda a: a[:8] + 1)
    timed(noop, (hi,), "dispatch floor (noop)", 1)

    def sort2(a, b):
        return lax.sort((a, b), num_keys=2)

    # flat sizes
    for lg in (20, 22, 24, 25, 26):
        n = 1 << lg
        f = jax.jit(lambda a, b, n=n: sort2(a[:n], b[:n]))
        timed(f, (hi, lo), f"flat 2-op 2^{lg}", n)

    # batched: [rows, cols] sort along last axis, total 2^26
    for rows_lg in (1, 2, 3, 4, 6, 10):
        rows = 1 << rows_lg
        cols = nmax // rows
        f = jax.jit(lambda a, b, r=rows, c=cols: lax.sort(
            (a.reshape(r, c), b.reshape(r, c)), dimension=1, num_keys=2))
        timed(f, (hi, lo), f"batched 2-op [{rows}, 2^{26-rows_lg}]", nmax)

    if "--u64" in sys.argv:
        # single-operand u64 sort (compile-time risk: run last, guarded)
        with jax.experimental.enable_x64():
            k = jax.device_put(
                (hi_h.astype(np.uint64) << np.uint64(32))
                | lo_h.astype(np.uint64))
            f = jax.jit(jnp.sort)
            timed(f, (k,), "flat 1-op u64 2^26", nmax)


if __name__ == "__main__":
    main()
